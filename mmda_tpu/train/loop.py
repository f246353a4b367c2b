"""Trainer: the engine that replaces the reference Solver
(reference src/solver.py:42-462) with a TPU-native loop.

Key differences by design (SURVEY.md §3.3):
  * the whole step body is one jit'd, donated function - no per-batch H2D
    copies, no .item() syncs (the reference does 8 H2D + 6 D2H per batch and
    runs with CUDA_LAUNCH_BLOCKING=1);
  * train losses stay on device until the epoch ends;
  * eval binarization/metrics run host-side with exact reference semantics
    (they are the parity numbers);
  * checkpoints hold the full TrainState (resume works, unlike the reference
    where optimizer state is saved but never restored);
  * early stopping mirrors the commented-out reference logic behind
    cfg.enable_early_stop (default off == reference effective behavior:
    all n_epoch epochs run, no LR decay).
"""

from __future__ import annotations

import os
import signal
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmda_tpu.config import Config, DataMeta
from mmda_tpu.data.loader import ArrayLoader
from mmda_tpu.models import Batch, get_model
from mmda_tpu.models.bert import BertConfig, frozen_mask, load_hf_weights
from mmda_tpu.parallel import mesh as pmesh
from mmda_tpu.train import checkpoint as ckpt
from mmda_tpu.train.state import (
    TrainState,
    create_train_state,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
    trainable_param_count,
)
from mmda_tpu.train.step import (
    make_eval_epoch,
    make_eval_step,
    make_train_epoch,
    make_train_step,
)
from mmda_tpu.utils.logging import MetricLogger
from mmda_tpu.utils.metrics import get_accuracy, get_metrics, select_by_eval_mode
from mmda_tpu.utils.sentiment_metrics import eval_binary, eval_mosei_senti


def task_metrics(task: str, truths: np.ndarray, preds: np.ndarray) -> dict:
    """Task-appropriate eval metrics: multilabel (src/utils/eval.py), sentiment
    regression (src/utils/eval_metrics.py:37-78), or binary (:83-92)."""
    if task == "regression":
        return eval_mosei_senti(preds, truths)
    if task == "binary":
        return eval_binary(preds.reshape(-1) > 0.5, truths.reshape(-1) > 0.5)
    return get_metrics(truths, preds)


class Trainer:
    """Builds the model/optimizer/mesh and runs train/eval.

    data: {"train"|"dev"|"test": dict of arrays} (ETL output or synthetic).
    """

    def __init__(
        self,
        cfg: Config,
        data: Dict[str, Dict[str, np.ndarray]],
        bert_cfg: Optional[BertConfig] = None,
        pretrained_emb: Optional[np.ndarray] = None,
        use_mesh: bool = True,
        logger: Optional[MetricLogger] = None,
    ):
        self.task = cfg.resolved_task()
        if self.task in ("regression", "binary") and cfg.num_classes != 1:
            cfg = cfg.replace(num_classes=1)
        if self.task == "binary":
            # binary humor label lives in column 0 (ETL packs it there)
            data = {
                k: {**v, "emo_label": v["emo_label"][:, :1]}
                for k, v in data.items()
            }
        if cfg.bucket_sizes and str(cfg.bucket_sizes[0]) == "auto":
            # --bucket_sizes auto[,K]: padding-optimal boundaries from the
            # TRAIN length distribution (data/loader.py::auto_bucket_sizes);
            # resolved once so the run config persists concrete buckets and
            # serving sees the same shapes
            from mmda_tpu.data.loader import auto_bucket_sizes

            k = (int(cfg.bucket_sizes[1]) if len(cfg.bucket_sizes) > 1
                 else 3)
            cfg = cfg.replace(bucket_sizes=auto_bucket_sizes(
                data["train"]["lengths"], k))
        self.cfg = cfg
        self.data = data
        self.bert_cfg = bert_cfg or (BertConfig.base() if cfg.use_bert else None)
        if (cfg.fast_dropout and self.bert_cfg is not None
                and jax.default_backend() == "tpu"):
            # uint8 dropout draws + recompute-in-backward (cfg.fast_dropout)
            import dataclasses

            self.bert_cfg = dataclasses.replace(
                self.bert_cfg, dropout_bits=8, dropout_recompute=True)
        if cfg.fused_ln_dropout and self.bert_cfg is not None:
            # fused Pallas LN(x + dropout(h)) sites, in-kernel mask drawing
            # (ops/pallas/layernorm.py) — measured A/B flag, off by default
            import dataclasses

            self.bert_cfg = dataclasses.replace(
                self.bert_cfg, fused_ln_dropout=True)
        if cfg.moe_experts > 0:
            # Switch-MoE BERT FFN (ops/moe.py); net-new vs the dense reference
            import dataclasses

            if not cfg.use_bert:
                raise ValueError("moe_experts > 0 replaces the BERT FFNs; "
                                 "use_bert=False has no MoE site")
            if cfg.pp_size > 1:
                raise ValueError("moe_experts > 0 does not compose with "
                                 "pp_size > 1 (pipelined encoder)")
            if cfg.tp_size > 1 and cfg.moe_experts % cfg.tp_size:
                raise ValueError(
                    f"moe_experts={cfg.moe_experts} must be divisible by "
                    f"tp_size={cfg.tp_size} for expert parallelism")
            self.bert_cfg = dataclasses.replace(
                self.bert_cfg, moe_experts=cfg.moe_experts,
                moe_capacity_factor=cfg.moe_capacity_factor,
                moe_top_k=cfg.moe_top_k)
        self.pretrained_emb = pretrained_emb
        self.logger = logger or MetricLogger(cfg.log_sinks, run_name=cfg.name)

        sample = data["train"]
        self.meta = DataMeta(
            visual_size=sample["visual"].shape[-1],
            acoustic_size=sample["acoustic"].shape[-1],
            vocab_size=int(sample["text"].max()) + 1,
            num_train=len(sample["lengths"]),
            num_dev=len(data["dev"]["lengths"]),
            num_test=len(data["test"]["lengths"]),
        )

        # hardware PRNG for dropout masks: -1.15 ms/fwd vs threefry at the
        # bench shape (benchmarks/RESULTS.md); must be set before any key in
        # the TrainState is created.  Set explicitly BOTH ways - the config
        # update is process-global and would otherwise stick across Trainers.
        use_rbg = cfg.fast_rng and jax.default_backend() == "tpu"
        jax.config.update("jax_default_prng_impl",
                          "rbg" if use_rbg else "threefry2x32")

        self.mesh = None
        # Process-global encode-override hooks installed below are recorded
        # here and removed by close() (ADVICE r3 low: a second Trainer or a
        # Predictor built later in the same process must not silently route
        # bert_encode through a stale pipelined/sharded path bound to a dead
        # mesh).  cli/train calls close() after the run; tests may use the
        # Trainer as a context manager.
        self._hook_uninstallers = []
        # Any failure below (validated-error raises, _build) must
        # uninstall already-installed process-global hooks — an
        # aborted constructor otherwise leaks a pipelined/sharded
        # bert_encode into every later model call in the process
        # (round-4 full-suite failure: test_fsdp's pp_size=2
        # validated-error left the pipeline hook installed).
        try:
            if cfg.pp_size > 1:
                # pipeline parallelism: ('data','pipe') mesh, BERT layers staged
                # over 'pipe' (parallel/pipeline.py), installed process-globally
                # via the encode-override hook so the model forward is untouched
                from mmda_tpu.parallel import pipeline as ppipe

                if not cfg.use_bert:
                    raise ValueError("pp_size > 1 pipelines the BERT tower; "
                                     "use_bert=False has no pipelined stage")
                if cfg.tp_size > 1:
                    raise ValueError("pp_size and tp_size are mutually exclusive "
                                     "(dp x pp or dp x tp meshes)")
                n = len(jax.devices())
                dp = cfg.dp_size if cfg.dp_size > 0 else max(n // cfg.pp_size, 1)
                micro = cfg.pp_microbatches or cfg.pp_size
                if cfg.batch_size % micro:
                    raise ValueError(
                        f"pp_microbatches={micro} must divide "
                        f"batch_size={cfg.batch_size}")
                self.mesh = ppipe.make_pipe_mesh(pp=cfg.pp_size, dp=dp)
                ppipe.install_pipeline_encoder(self.mesh, micro)
                self._hook_uninstallers.append(ppipe.uninstall_pipeline_encoder)
            elif use_mesh and (len(jax.devices()) > 1 or cfg.tp_size > 1):
                self.mesh = pmesh.make_mesh(dp=cfg.dp_size, tp=cfg.tp_size)
                if cfg.sp:
                    # sequence parallelism rides on TP: residual-stream S axis
                    # sharded over the same 'model' devices (parallel/sequence.py)
                    from mmda_tpu.parallel import sequence as psq

                    if cfg.tp_size <= 1:
                        raise ValueError("sp=True needs tp_size > 1 (S is "
                                         "sharded over the TP 'model' axis)")
                    psq.install_sequence_sharding(self.mesh)
                    self._hook_uninstallers.append(psq.uninstall_sequence_sharding)
                if cfg.moe_experts > 0 and cfg.tp_size > 1:
                    # expert parallelism over the same 'model' devices
                    from mmda_tpu.parallel import expert as pexp

                    pexp.install_expert_sharding(self.mesh)
                    self._hook_uninstallers.append(pexp.uninstall_expert_sharding)
            elif cfg.sp:
                raise ValueError("sp=True needs a mesh with a 'model' axis "
                                 "(tp_size > 1)")
            if cfg.fsdp:
                # validated-error coverage, same stance as MoE x PP below
                if cfg.pp_size > 1:
                    raise ValueError(
                        "fsdp does not compose with pp_size>1: the pipeline "
                        "stage-stacks BERT layer params over 'pipe' "
                        "(parallel/pipeline.py), which conflicts with FSDP's "
                        "per-leaf 'data' sharding")
                if self.mesh is None or pmesh.DATA_AXIS not in self.mesh.axis_names:
                    raise ValueError(
                        "fsdp=True needs a mesh with a 'data' axis (>1 device, "
                        "or explicit dp_size); a 1-device FSDP run would shard "
                        "nothing while paying the layout constraints")

            from mmda_tpu.ops import pallas as pallas_flags

            pallas_flags.set_enabled(cfg.use_pallas and jax.default_backend() == "tpu")

            self._build()
        except BaseException:
            self.close()
            raise

    # ------------------------------------------------------------------
    def _build(self) -> None:
        cfg = self.cfg
        init_fn, self.forward_fn = get_model(cfg.model)
        key = jax.random.PRNGKey(cfg.seed)
        k_model, k_state = jax.random.split(key)

        bert_params = None
        if cfg.use_bert and cfg.bert_model_dir:
            bert_params = load_hf_weights(cfg.bert_model_dir, self.bert_cfg)

        params = init_fn(
            k_model, cfg,
            visual_size=self.meta.visual_size,
            acoustic_size=self.meta.acoustic_size,
            vocab_size=self.meta.vocab_size,
            bert_cfg=self.bert_cfg,
            bert_params=bert_params,
            pretrained_emb=self.pretrained_emb,
        )

        # Freezing rules (reference src/solver.py:69-86)
        frozen = None
        if cfg.use_bert and "bert" in params:
            frozen = jax.tree_util.tree_map(lambda _: False, params)
            if cfg.data.startswith("mosei"):
                frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=8)
                if cfg.freeze_bert_embeddings:
                    frozen["bert"]["embeddings"] = jax.tree_util.tree_map(
                        lambda _: True, params["bert"]["embeddings"])
            elif cfg.data == "ur_funny":
                frozen["bert"] = jax.tree_util.tree_map(lambda _: True, params["bert"])
        if (not cfg.use_bert and self.pretrained_emb is not None
                and cfg.freeze_embeddings):
            # GloVe table frozen as the reference INTENDS (src/solver.py:83-86;
            # its requires_grad=False is a Module-level no-op - see
            # Config.freeze_embeddings)
            frozen = frozen or jax.tree_util.tree_map(lambda _: False, params)
            frozen["embed"] = True

        self.frozen = frozen
        steps_per_epoch = None
        if cfg.lr_schedule in ("exponential", "cosine"):
            steps_per_epoch = max(len(self._loader("train", shuffle=False)), 1)
        self.tx = make_optimizer(cfg, frozen, steps_per_epoch)
        self.state = create_train_state(cfg, params, k_state, frozen, tx=self.tx)

        self.state = self._place_on_mesh(self.state)

        self.train_step = make_train_step(cfg, self.tx, self.forward_fn,
                                          self.bert_cfg, frozen=frozen)
        self.eval_step = make_eval_step(cfg, self.forward_fn, self.bert_cfg)
        self.epoch_step = (
            make_train_epoch(cfg, self.tx, self.forward_fn, self.bert_cfg,
                             frozen=frozen)
            if cfg.compiled_epoch else None
        )
        self.eval_epoch = (
            make_eval_epoch(cfg, self.forward_fn, self.bert_cfg)
            if cfg.compiled_eval else None
        )

        counts = trainable_param_count(self.state.params, frozen)
        self.logger.log({"params_total": counts["total"],
                         "params_trainable": counts["trainable"]})

        # reproducibility artifact: the exact resolved config of this run;
        # reload with --config_json (explicit CLI flags still override)
        try:
            import dataclasses as _dc
            import json as _json

            os.makedirs(cfg.ckpt_dir, exist_ok=True)
            with open(os.path.join(cfg.ckpt_dir,
                                   f"{cfg.name}_config.json"), "w") as f:
                _json.dump(_dc.asdict(cfg), f, indent=2, default=str)
        except OSError:
            pass  # read-only ckpt_dir: config dump is best-effort

        if cfg.resume:
            loaded = self._load_resume_ckpt()
            if loaded is not None:
                if loaded.rng.shape != self.state.rng.shape:
                    # checkpoint saved under a different PRNG impl (threefry
                    # (2,) vs rbg (4,) keys - cfg.fast_rng or a backend
                    # change).  The raw key is not portable; rebuild one
                    # deterministically from seed+step so the resumed run
                    # continues (new dropout stream).
                    self.logger.log({"resume_rng_impl_mismatch": 1.0})
                    loaded = loaded._replace(rng=jax.random.fold_in(
                        jax.random.PRNGKey(cfg.seed), int(loaded.step)))
                # re-place on the mesh: a loaded checkpoint holds host/
                # uncommitted arrays, and assigning it directly would
                # silently drop the TP/ZeRO-1 shardings the initial build
                # chose (jit would then run params-replicated — correct but
                # an OOM/memory regression at real scale)
                self.state = self._place_on_mesh(loaded)
                self.logger.log({"resumed_at_step": int(self.state.step)})

    def close(self) -> None:
        """Remove the process-global encode-override hooks this Trainer
        installed (pipeline/SP/EP).  Idempotent.  After close(), bert_encode
        falls back to the dense path, so Predictors and later Trainers in the
        same process see clean module state."""
        while self._hook_uninstallers:
            self._hook_uninstallers.pop()()

    def __enter__(self) -> "Trainer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    @property
    def eval_params(self):
        """Parameters eval/serving should read: the EMA shadow when
        cfg.ema_decay > 0 (standard polyak-averaged eval), else the live
        params."""
        if self.cfg.ema_decay > 0 and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def _place_on_mesh(self, state: TrainState) -> TrainState:
        """Place a (possibly host-side) TrainState onto the active mesh:
        params per param_partition_specs (TP-aware), optimizer state ZeRO-1-
        sharded when cfg.zero1, scalars/rng replicated.  Shared by the
        initial build and the resume path so both get identical layouts."""
        if self.mesh is None:
            return state
        place_params = (pmesh.shard_params_fsdp if self.cfg.fsdp
                        else pmesh.shard_params)
        if self.cfg.fsdp and pmesh.DATA_AXIS in self.mesh.axis_names:
            # ZeRO-3/FSDP: Adam m/v mirrors sharded like their params
            opt_state = pmesh.shard_opt_state_fsdp(state.opt_state, self.mesh)
        elif self.cfg.zero1 and pmesh.DATA_AXIS in self.mesh.axis_names:
            # ZeRO-1: Adam m/v sharded 1/dp over 'data'
            # (parallel/mesh.py::zero1_opt_specs); XLA SPMD derives the
            # reduce-scatter/all-gather pair around the update
            opt_state = pmesh.shard_opt_state_zero1(state.opt_state, self.mesh)
        else:
            opt_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, pmesh.replicated(self.mesh)),
                state.opt_state,
            )
        return TrainState(
            step=jax.device_put(state.step, pmesh.replicated(self.mesh)),
            params=place_params(state.params, self.mesh),
            opt_state=opt_state,
            rng=jax.device_put(state.rng, pmesh.replicated(self.mesh)),
            ema_params=(place_params(state.ema_params, self.mesh)
                        if state.ema_params is not None else None),
        )

    # ------------------------------------------------------------------
    def _save_resume_ckpt(self, epoch_idx: int, valid_loss: float):
        """Dispatch the last_* (resume) snapshot to the configured backend:

          * orbax  - sharded/elastic (each host writes its addressable
            shards; restore may retarget the mesh), async;
          * msgpack incremental (default when any leaf is frozen) - one-time
            content-addressed frozen base + per-interval trainable delta
            (VERDICT r2 weak #5: full saves re-serialized frozen BERT);
          * msgpack full - when nothing is frozen or ckpt_incremental=False.
        """
        cfg = self.cfg
        meta = {"epoch": epoch_idx, "valid_loss": valid_loss}
        name = f"last_{cfg.name}"
        if cfg.ckpt_backend == "orbax":
            from mmda_tpu.train import checkpoint_sharded as cks

            cks.save_sharded(os.path.join(cfg.ckpt_dir, f"{name}.orbax"),
                             self.state, use_async=True)
            return None   # joined via cks.wait_for_saves at loop exit
        if cfg.ckpt_incremental and self.frozen is not None:
            return ckpt.save_checkpoint_incremental(
                cfg.ckpt_dir, name, self.state, self.frozen, meta,
                async_write=True)
        return ckpt.save_checkpoint(cfg.ckpt_dir, name, self.state, meta,
                                    async_write=True)

    def _load_resume_ckpt(self) -> Optional[TrainState]:
        cfg = self.cfg
        name = f"last_{cfg.name}"
        orbax_path = os.path.join(cfg.ckpt_dir, f"{name}.orbax")
        if cfg.ckpt_backend == "orbax" and os.path.exists(orbax_path):
            from mmda_tpu.train import checkpoint_sharded as cks

            return cks.restore_sharded(orbax_path, self.state)
        if (self.frozen is not None
                and ckpt.incremental_checkpoint_exists(cfg.ckpt_dir, name)):
            return ckpt.load_checkpoint_incremental(
                cfg.ckpt_dir, name, self.state, self.frozen)
        if ckpt.checkpoint_exists(cfg.ckpt_dir, name):
            return ckpt.load_checkpoint(cfg.ckpt_dir, name, self.state)
        return None

    def _loader(self, split: str, shuffle: bool) -> ArrayLoader:
        return ArrayLoader(
            self.data[split],
            batch_size=self.cfg.batch_size,
            shuffle=shuffle,
            drop_last=(split == "train"),
            bucket_sizes=self.cfg.bucket_sizes,
            seed=self.cfg.seed,
            mesh=self.mesh,
            prefetch=self.cfg.prefetch,
        )

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        cfg = self.cfg
        train_loader = self._loader("train", shuffle=True)
        best_valid_loss = float("inf")
        best_results = best_truths = None
        best_epoch = -1
        curr_patience = cfg.patience
        num_trials = 1
        plateau_wait = 0
        history = []
        pending = []  # async checkpoint writer threads

        # preemption handling (SURVEY.md §5 failure-detection row): SIGTERM/
        # SIGINT set a flag; the loop checkpoints and exits cleanly at the
        # next epoch boundary instead of dying mid-write.
        preempted = {"flag": False}

        def _on_signal(signum, frame):
            preempted["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:   # non-main thread
                pass
        eval_values: Dict[str, float] = {}
        start_epoch = int(self.state.step) // max(len(train_loader), 1)

        for e in range(start_epoch, cfg.n_epoch):
            t0 = time.perf_counter()
            epoch_losses = []
            if self.epoch_step is not None:
                epoch_losses = self._run_compiled_epoch(train_loader)
            else:
                for batch in train_loader:
                    self.state, losses = self.train_step(self.state, batch)
                    epoch_losses.append(losses)
            # one host sync per epoch
            jax.block_until_ready(self.state.params)
            epoch_time = time.perf_counter() - t0
            if not epoch_losses:
                raise ValueError(
                    f"epoch {e} produced no batches: the train split has "
                    f"{self.meta.num_train} rows but batch_size="
                    f"{cfg.batch_size} with drop_last — shrink batch_size "
                    "or grow the dataset")
            # ONE batched device->host transfer for the whole epoch's loss
            # pytree.  Per-array np.asarray here cost ~32 ms EACH through
            # the relay — ~253 steps x ~10 keys ~= 68 s/epoch, found by the
            # round-5 phase timers as the gap between train end and dev
            # eval (bench_epoch_phases.log; same lesson as the round-2
            # serving fix, benchmarks/RESULTS.md).
            epoch_losses = jax.device_get(epoch_losses)
            keys = set(epoch_losses[0])
            for l in epoch_losses[1:]:
                keys &= set(l)
            stacked = {
                k: float(np.mean(np.concatenate(
                    [np.asarray(l[k]).ravel() for l in epoch_losses])))
                for k in keys
            }
            train_avg_loss = round(stacked["total"], 4)

            t_eval0 = time.perf_counter()
            valid_loss, valid_acc, preds, truths = self.evaluate("dev")
            eval_time = time.perf_counter() - t_eval0
            t_ckpt0 = time.perf_counter()

            # resume checkpoint: every ckpt_interval epochs AND on every loop
            # exit (final epoch, preemption, early stop - see save_last calls
            # at those breaks), async, atomic.  Serializing the full
            # TrainState is host CPU-bound (~minutes for bert-base+Adam on a
            # 1-core host), so the interval lets long jobs amortize it.
            def save_last(epoch_idx, vloss):
                self._last_saved_epoch = epoch_idx
                pending.append(self._save_resume_ckpt(epoch_idx, vloss))

            if (e + 1) % cfg.ckpt_interval == 0 or e == cfg.n_epoch - 1:
                save_last(e, valid_loss)

            # ReduceLROnPlateau semantics (reference creates-but-never-steps,
            # src/solver.py:100: factor 0.5, patience 5, min_lr 1e-6)
            if cfg.lr_schedule == "plateau":
                if valid_loss <= best_valid_loss:
                    plateau_wait = 0
                else:
                    plateau_wait += 1
                    if plateau_wait > cfg.lr_plateau_patience:
                        cur = get_learning_rate(self.state.opt_state)
                        if cur is not None:
                            new_lr = max(cur * cfg.lr_decay_rate, cfg.min_lr)
                            self.state = self.state._replace(
                                opt_state=set_learning_rate(
                                    self.state.opt_state, new_lr))
                            self.logger.log({"lr_reduced_to": new_lr, "epoch": e})
                        plateau_wait = 0

            improved = valid_loss <= best_valid_loss
            if improved:
                best_valid_loss = valid_loss
                best_results, best_truths, best_epoch = preds, truths, e
                # with EMA on, the weights that were just evaluated (and won)
                # are the EMA shadow - save THOSE as the serving artifact
                pending.append(ckpt.save_checkpoint(
                    cfg.ckpt_dir, ckpt.best_model_name(cfg), self.eval_params,
                    {"epoch": e, "valid_loss": valid_loss}, async_write=True))
                eval_values = task_metrics(self.task, best_truths, best_results)
                curr_patience = cfg.patience
            elif cfg.enable_early_stop:
                # reference's commented-out logic (src/solver.py:233-242):
                # on patience exhaustion reload the best model and decay
                curr_patience -= 1
                if curr_patience <= -1:
                    num_trials -= 1
                    curr_patience = cfg.patience
                    name = ckpt.best_model_name(cfg)
                    if ckpt.checkpoint_exists(cfg.ckpt_dir, name):
                        best_params = ckpt.load_checkpoint(
                            cfg.ckpt_dir, name, self.state.params)
                        self.state = self.state._replace(params=best_params)
                    if num_trials <= 0:
                        self.logger.log({"early_stop_epoch": e})
                        if getattr(self, "_last_saved_epoch", -1) != e:
                            save_last(e, valid_loss)   # don't lose interval epochs
                        break

            # epoch_time_s covers the TRAIN loop only; epoch_total_time_s is
            # wall time from epoch start through dev eval + checkpoint
            # dispatch (the end-to-end number benchmarks report)
            epoch_total = time.perf_counter() - t0
            payload = {
                "epoch": e,
                "train_loss": train_avg_loss,
                "valid_loss": valid_loss,
                "valid_acc": valid_acc,
                "epoch_time_s": round(epoch_time, 3),
                "epoch_total_time_s": round(epoch_total, 3),
                # phase attribution (round 5, VERDICT #2): dev eval +
                # metrics vs checkpoint DISPATCH (saves are async; their
                # host serialization contends with the NEXT epoch on
                # 1-core hosts) vs everything else
                "eval_time_s": round(eval_time, 3),
                "post_eval_time_s": round(time.perf_counter() - t_ckpt0, 3),
                "utterances_per_s": round(
                    len(train_loader) * cfg.batch_size / max(epoch_time, 1e-9), 1),
                **{f"train_{k}": v for k, v in stacked.items() if k != "total"},
            }
            if eval_values and self.task == "classification":
                payload.update(select_by_eval_mode(eval_values, cfg.eval_mode))
            elif eval_values:
                payload.update({f"dev_{k}": v for k, v in eval_values.items()})
            self.logger.log(payload, step=int(self.state.step))
            history.append(payload)

            if preempted["flag"]:
                self.logger.log({"preempted_at_epoch": e})
                if getattr(self, "_last_saved_epoch", -1) != e:
                    # the preemption guarantee: never lose interval epochs
                    save_last(e, valid_loss)
                break

        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        for t in pending:
            if t is not None:
                t.join()
        if cfg.ckpt_backend == "orbax":
            from mmda_tpu.train import checkpoint_sharded as cks

            cks.wait_for_saves()

        # final test with the best-on-dev params (src/solver.py:295,323-325)
        if best_epoch >= 0:
            best_params = ckpt.load_checkpoint(
                cfg.ckpt_dir, ckpt.best_model_name(cfg), self.state.params)
            test_loss, test_acc, test_preds, test_truths = self.evaluate(
                "test", params=best_params)
        else:
            test_loss, test_acc, test_preds, test_truths = self.evaluate("test")
        test_metrics = task_metrics(self.task, test_truths, test_preds)

        # stage 2: ConfidNet head-only training on frozen backbone
        if cfg.use_confidNet and cfg.confid_two_stage and best_epoch >= 0:
            self._train_confidnet_stage2(train_loader)
            test_loss, test_acc, test_preds, test_truths = self.evaluate("test")
            test_metrics = task_metrics(self.task, test_truths, test_preds)

        summary = {
            "best_epoch": best_epoch,
            "best_valid_loss": best_valid_loss,
            "test_loss": test_loss,
            "test_acc": test_acc,
            **{f"test_{k}": v for k, v in test_metrics.items()},
            "history": history,
        }
        # ConfidNet confidence QUALITY on the final test pass (VERDICT r2
        # weak #8: stage-2 training existed but nothing measured whether the
        # head's confidence means anything): TCP calibration MSE +
        # failure-prediction AUPR/FPR@95TPR per the ConfidNet paper.
        if (cfg.use_confidNet and self.task == "classification"
                and getattr(self, "_last_eval_confidence", None)):
            from mmda_tpu.utils.confidence_metrics import confidence_metrics

            conf = confidence_metrics(
                self._last_eval_confidence["scores"],
                self._last_eval_confidence["tcp"],
                test_preds, test_truths)
            summary.update({f"conf_{k}": v for k, v in conf.items()})
        if eval_values:
            summary["best_dev_metrics"] = eval_values
        self.logger.log({k: v for k, v in summary.items() if k != "history"})
        return summary

    # ------------------------------------------------------------------
    def _data_axis_size(self) -> int:
        if self.mesh is None:
            return 1
        return int(np.prod([self.mesh.shape[a] for a in ("replica", "data")
                            if a in self.mesh.axis_names]))

    def _place_batch(self, host_arrays: Dict[str, np.ndarray]) -> Batch:
        """One host batch -> device Batch (DP-sharded under a mesh when the
        batch divides the data axes)."""
        b = Batch(**host_arrays)
        if (self.mesh is not None
                and b.emo_label.shape[0] % self._data_axis_size() == 0):
            return pmesh.shard_batch(b, self.mesh)
        return jax.tree_util.tree_map(jnp.asarray, b)

    def _place_stack(self, chunk: list) -> Batch:
        """Stack same-shape host batches on HOST (one transfer per field; a
        device-side stack costs len(chunk) transfers + a concat dispatch per
        field through the relay) and place with the scan axis replicated,
        batch axis DP-sharded under a mesh."""
        use_sh = (self.mesh is not None
                  and chunk[0]["emo_label"].shape[0]
                  % self._data_axis_size() == 0)
        sh = pmesh.stacked_batch_sharding(self.mesh) if use_sh else None

        def put(k):
            if chunk[0][k] is None:
                return None
            stacked = np.stack([a[k] for a in chunk])
            return jax.device_put(stacked, sh) if sh is not None else (
                jnp.asarray(stacked))

        return Batch(**{k: put(k) for k in chunk[0]})

    def _run_compiled_epoch(self, train_loader):
        """Scan-over-batches epoch: group same-shape batches, stack chunks of
        cfg.scan_chunk HOST-side, and run each chunk as ONE device dispatch
        (ROADMAP #11: the round-2 version stacked already-device-put batches
        per chunk - len(chunk) transfers + a concat dispatch per field).
        Remainder batches run through the per-step path.  jit caches one
        program per (bucket shape) - chunk size is fixed, so no per-epoch
        recompiles."""
        cfg = self.cfg
        chunk = max(cfg.scan_chunk, 1)
        losses_out = []
        for _, batches in sorted(train_loader.host_batches_grouped().items()):
            for i in range(0, len(batches) - chunk + 1, chunk):
                stacked = self._place_stack(batches[i : i + chunk])
                self.state, losses = self.epoch_step(self.state, stacked)
                losses_out.append(losses)   # each value has leading chunk axis
            for arrays in batches[len(batches) - len(batches) % chunk:]:
                self.state, losses = self.train_step(
                    self.state, self._place_batch(arrays))
                losses_out.append(losses)
        return losses_out

    # ------------------------------------------------------------------
    def _train_confidnet_stage2(self, train_loader) -> None:
        """ConfidNet stage 2: start from best-on-dev params, freeze everything
        except the confidence head, optimize the conf loss alone."""
        cfg = self.cfg
        best_params = ckpt.load_checkpoint(
            cfg.ckpt_dir, ckpt.best_model_name(cfg), self.state.params)
        frozen = jax.tree_util.tree_map(lambda _: True, best_params)
        frozen["confidence"] = jax.tree_util.tree_map(
            lambda _: False, best_params["confidence"])
        tx2 = make_optimizer(cfg, frozen,
                             steps_per_epoch=max(len(train_loader), 1))
        state = create_train_state(cfg, best_params, self.state.rng, frozen)
        step2 = make_train_step(cfg, tx2, self.forward_fn, self.bert_cfg,
                                conf_only=True, frozen=frozen)
        for e in range(cfg.n_epoch_stage2):
            conf_losses = []
            for batch in train_loader:
                state, losses = step2(state, batch)
                conf_losses.append(losses["conf"])
            self.logger.log({
                "stage2_epoch": e,
                # one batched readback (per-array np.asarray is ~32 ms each
                # through the relay — the round-5 epoch_losses lesson)
                "stage2_conf_loss": float(np.mean(
                    jax.device_get(conf_losses))),
            })
        self.state = state
        pending = ckpt.save_checkpoint(
            cfg.ckpt_dir, ckpt.best_model_name(cfg), state.params,
            {"stage2_epochs": cfg.n_epoch_stage2}, async_write=True)
        if pending is not None:
            pending.join()

    # ------------------------------------------------------------------
    def evaluate(self, mode: str, params=None) -> tuple:
        """Eval pass with exact reference aggregation (src/solver.py:311-370):
        eval_loss = mean over batches of (sum over classes of batch-mean BCE),
        accuracy = multilabel Jaccard over all rows.  For regression the loss
        is L1 and preds/truths are (sentiment_pred, sentiment_true)."""
        params = params if params is not None else self.eval_params
        loader = self._loader(mode, shuffle=False)
        losses, preds, truths = [], [], []
        tcps, raw_scores = [], []   # ConfidNet confidence evaluation inputs

        def accumulate(out_i, host_batch):
            w = np.asarray(host_batch["sample_weight"]) > 0
            bce = out_i["bce"][w]                       # (real_rows, C)
            losses.append(float(np.sum(np.mean(bce, axis=0))))
            if self.task == "regression":
                preds.append(out_i["scores"][w][:, 0])
                truths.append(np.asarray(host_batch["sentiment"])[w])
            else:
                preds.append(out_i["labels"][w])
                truths.append(np.asarray(host_batch["emo_label"])[w])
                if out_i.get("tcp") is not None:
                    tcps.append(out_i["tcp"][w])
                    raw_scores.append(out_i["scores"][w])

        def eval_one_host_batch(host_batch):
            accumulate(jax.device_get(
                self.eval_step(params, self._place_batch(host_batch))),
                host_batch)

        if self.eval_epoch is not None:
            # compiled eval epoch: stack same-shape batches and scan them in
            # FIXED-length chunks of scan_chunk — one dispatch + one readback
            # per chunk (each per-batch dispatch+readback costs ~60-90 ms
            # through the relay).  The fixed chunk length keeps the compiled
            # program count bounded at one per (bucket, scan_chunk) even when
            # splits have different batch counts (the scan length is baked
            # into the XLA program); remainder batches reuse the per-batch
            # eval step.  This path COMPOSES with the mesh (round 3): the
            # stacked batch is placed with the scan axis replicated and the
            # batch axis sharded over the data axes (_place_stack), so on a
            # real v5e-8 the dev/test eval runs DP-sharded scans instead of
            # falling back to per-batch dispatch+readback (VERDICT r2 #3).
            C = max(self.cfg.scan_chunk, 1)
            for group in loader.host_batches_grouped().values():
                for i0 in range(0, len(group) - len(group) % C, C):
                    chunk = group[i0:i0 + C]
                    outs = jax.device_get(
                        self.eval_epoch(params, self._place_stack(chunk)))
                    for i, host_batch in enumerate(chunk):
                        accumulate({k: v[i] for k, v in outs.items()},
                                   host_batch)
                for host_batch in group[len(group) - len(group) % C:]:
                    eval_one_host_batch(host_batch)
        else:
            for batch in loader:
                out = self.eval_step(params, batch)
                # ONE batched readback per batch (each separate np.asarray is
                # a ~32 ms relay round trip, benchmarks/RESULTS.md)
                out, sw, sent, emo = jax.device_get(
                    (out, batch.sample_weight, batch.sentiment,
                     batch.emo_label))
                accumulate(out, {"sample_weight": sw, "sentiment": sent,
                                 "emo_label": emo})
        eval_loss = float(np.mean(losses))
        # stash per-cell confidence for evaluate-then-score flows (ConfidNet
        # quality metrics read the LAST evaluate()'s tcp/scores)
        self._last_eval_confidence = (
            {"tcp": np.concatenate(tcps, axis=0),
             "scores": np.concatenate(raw_scores, axis=0)}
            if tcps else None)
        y_pred = np.concatenate(preds, axis=0)
        y_true = np.concatenate(truths, axis=0)
        if self.task == "regression":
            acc = float(np.mean((y_pred >= 0) == (y_true >= 0)))  # acc2 w/ zeros
        else:
            acc = get_accuracy(y_true, y_pred)
        return eval_loss, acc, y_pred, y_true
