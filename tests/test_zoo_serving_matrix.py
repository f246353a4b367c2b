"""Registry x serving matrix: every registered model family builds, runs a
deterministic forward through the Predictor's ragged-request path, and
returns finite scores.  Guards the zoo-wide serving contract (each family
individually has deeper tests; this pins the cross product)."""

import numpy as np
import jax
import pytest

from mmda_tpu.config import Config
from mmda_tpu.models import get_model
from mmda_tpu.models.bert import BertConfig
from mmda_tpu.serving import Predictor

RNG = np.random.default_rng(11)

FAMILIES = ["MISA", "EF_LSTM", "LF_DNN", "MULT", "LMF", "TFN", "MAG_BERT",
            "MMIM"]
# MAG_BERT has no GloVe tower - it only exists with a BERT backbone
BERT_ONLY = {"MAG_BERT"}


def _req(L, bert=True):
    r = {
        "text": RNG.integers(2, 64, size=L).astype(np.int32),
        "visual": RNG.normal(size=(L, 5)).astype(np.float32),
        "acoustic": RNG.normal(size=(L, 6)).astype(np.float32),
    }
    if bert:
        r.update({
            "bert_ids": RNG.integers(3, 64, size=L + 2).astype(np.int32),
            "bert_type": np.zeros(L + 2, np.int32),
            "bert_mask": np.ones(L + 2, np.int32),
        })
    return r


@pytest.mark.parametrize("family", FAMILIES)
def test_family_serves_finite_scores(family):
    use_bert = family in BERT_ONLY
    cfg = Config(model=family, use_bert=use_bert, hidden_size=16,
                 num_classes=6, visual_size=5, acoustic_size=6,
                 vocab_size=64, embedding_size=8, compute_dtype="float32",
                 batch_size=8, bucket_sizes=(4, 8), max_seq_len=8,
                 log_sinks=(), data="synthetic",
                 mult_d=8, mult_heads=2, mult_layers=1)
    bert_cfg = BertConfig.tiny(vocab_size=64) if use_bert else None
    init_fn, _ = get_model(family)
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    pred = Predictor(cfg, params=params, bert_cfg=bert_cfg, max_batch=8)

    out = pred([_req(3, bert=use_bert), _req(7, bert=use_bert)])
    scores = np.asarray(out["scores"][:2])
    assert scores.shape == (2, 6)
    assert np.isfinite(scores).all(), family
