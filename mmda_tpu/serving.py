"""Batched serving: a compiled predictor around an exported checkpoint.

The reference has no serving surface at all (its inference.py is a TODO stub).
`Predictor` loads a best-on-dev export, compiles one prediction program per
bucket shape, and serves ragged host requests:

  * requests are padded to the nearest bucket (one XLA program per bucket -
    no recompiles at serving time after warmup);
  * short batches pad with zero rows and are trimmed on return;
  * returns scores, binarized labels, ConfidNet confidence, and the fused
    hidden representation per utterance.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmda_tpu.config import Config
from mmda_tpu.models import Batch, get_model
from mmda_tpu.models.bert import BertConfig
from mmda_tpu.train import checkpoint as ckpt


class Predictor:
    def __init__(
        self,
        cfg: Config,
        params=None,
        bert_cfg: Optional[BertConfig] = None,
        visual_size: Optional[int] = None,
        acoustic_size: Optional[int] = None,
        vocab_size: Optional[int] = None,
        max_batch: int = 64,
    ):
        self.cfg = cfg
        self.bert_cfg = bert_cfg or (BertConfig.base() if cfg.use_bert else None)
        self.max_batch = max_batch
        init_fn, self.forward_fn = get_model(cfg.model)
        if params is None:
            template = init_fn(
                jax.random.PRNGKey(0), cfg,
                visual_size=visual_size, acoustic_size=acoustic_size,
                vocab_size=vocab_size, bert_cfg=self.bert_cfg)
            name = ckpt.best_model_name(cfg)
            params = ckpt.load_checkpoint(cfg.ckpt_dir, name, template)
        self.params = params
        self._stats = {"requests": 0, "utterances": 0, "seconds": 0.0}

        @jax.jit
        def predict(params, batch: Batch):
            out = self.forward_fn(params, cfg, batch, bert_cfg=self.bert_cfg,
                                  deterministic=True)
            hidden = (
                jnp.concatenate(
                    [out.private_t, out.private_v, out.private_a,
                     out.shared_t, out.shared_v, out.shared_a], axis=1)
                if out.shared_t is not None else out.scores
            )
            return {"scores": out.scores, "labels": out.labels,
                    "tcp": out.tcp, "hidden": hidden}

        self._predict = predict

    def _bucket(self, n: int) -> int:
        for b in sorted(self.cfg.bucket_sizes):
            if n <= b:
                return b
        return max(self.cfg.bucket_sizes)

    def __call__(self, requests: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        """requests: list of per-utterance dicts with keys text (L,), visual
        (L, Dv), acoustic (L, Da), bert_ids/bert_type/bert_mask (L+2,).
        Returns stacked result arrays trimmed to len(requests)."""
        t0 = time.perf_counter()
        n = len(requests)
        t = self._bucket(max(len(r["text"]) for r in requests))
        B = self.max_batch

        def pad_to(x, shape):
            out = np.zeros(shape, x.dtype)
            sl = tuple(slice(0, min(a, b)) for a, b in zip(x.shape, shape))
            out[sl] = x[sl]
            return out

        dv = requests[0]["visual"].shape[-1]
        da = requests[0]["acoustic"].shape[-1]
        arrays = {
            "text": np.stack([pad_to(r["text"], (t,)) for r in requests]),
            "visual": np.stack([pad_to(r["visual"], (t, dv)) for r in requests]),
            "acoustic": np.stack([pad_to(r["acoustic"], (t, da)) for r in requests]),
            "lengths": np.asarray([min(len(r["text"]), t) for r in requests], np.int32),
            "bert_ids": np.stack([pad_to(r["bert_ids"], (t + 2,)) for r in requests]),
            "bert_type": np.stack([pad_to(r["bert_type"], (t + 2,)) for r in requests]),
            "bert_mask": np.stack([pad_to(r["bert_mask"], (t + 2,)) for r in requests]),
        }
        # fixed batch dim: pad rows to max_batch
        if n < B:
            for k, v in arrays.items():
                pad = np.zeros((B - n,) + v.shape[1:], v.dtype)
                if k == "lengths":
                    pad[:] = 1
                if k == "bert_mask":
                    pad[:, :1] = 1
                arrays[k] = np.concatenate([v, pad])
        batch = Batch(
            **arrays,
            sentiment=np.zeros(B, np.float32),
            emo_label=np.zeros((B, self.cfg.num_classes), np.float32),
            sample_weight=(np.arange(B) < n).astype(np.float32),
        )
        out = self._predict(self.params, batch)
        result = {k: np.asarray(v)[:n] for k, v in out.items()}
        dt = time.perf_counter() - t0
        self._stats["requests"] += 1
        self._stats["utterances"] += n
        self._stats["seconds"] += dt
        return result

    @property
    def stats(self) -> Dict[str, float]:
        s = dict(self._stats)
        if s["seconds"] > 0:
            s["utterances_per_sec"] = s["utterances"] / s["seconds"]
        return s
