"""Configuration system for mmda_tpu.

A single frozen dataclass replaces the reference's argparse->Config attribute bag
(reference: src/config.py:99-170).  Every knob in the reference parser is kept with
its name and default so command lines written for the reference keep working.

Design differences from the reference (deliberate, documented):

* The reference re-parses argv four times per run (src/train.py:39,54-56) and once
  per `to_gpu` call (src/utils/convert.py:8-10) and mutates the config from the
  data layer (src/data_loader.py:35-39).  Here the config is parsed once and is
  immutable; data-derived fields (visual/acoustic feature sizes, vocab) live in a
  separate `DataMeta` record produced by the data pipeline.
* Optimizer / activation names map to *registries* of pure JAX functions instead
  of torch classes (reference src/config.py:24-27).
* The reference silently never uses `weight_decay` (parsed at src/config.py:143,
  never passed to the optimizer at src/solver.py:97-99).  We reproduce the
  effective behavior by default (`weight_decay` is kept as a flag but only applied
  when `apply_weight_decay=True`).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def str2bool(v) -> bool:
    """String to boolean, accepting the same spellings as the reference
    (src/config.py:61-68)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


# ---------------------------------------------------------------------------
# Registries (name -> constructor).  Reference: src/config.py:24-27.
# ---------------------------------------------------------------------------

ACTIVATIONS = (
    "elu",
    "hardshrink",
    "hardtanh",
    "leakyrelu",
    "prelu",
    "relu",
    "rrelu",
    "tanh",
)

OPTIMIZERS = ("Adam", "RMSprop", "AdamW", "SGD")

DATASETS = ("mosi", "mosei", "ur_funny", "synthetic")

EVAL_MODES = ("macro", "micro", "weighted")

# Per-dataset hyper-parameter presets (reference src/config.py:40-59; the
# reference defines but never applies them - apply with --apply_dataset_hp).
MOSI_HP = {
    "activation": "relu",
    "batch_size": 64,
    "sim_weight": 1.0,     # alpha
    "diff_weight": 0.3,    # beta
    "recon_weight": 1.0,   # gamma
    "dropout": 0.5,
}

MOSEI_HP = {
    "activation": "leakyrelu",
    "batch_size": 16,
    "sim_weight": 0.7,
    "diff_weight": 0.3,
    "recon_weight": 0.7,
    "dropout": 0.1,
    "embedding_size": 300,
    "visual_size": 35,
    "acoustic_size": 74,
}

DATASET_HP = {"mosi": MOSI_HP, "mosei": MOSEI_HP}

# Reference surface parity (src/config.py:29-38)
output_dim_dict = {"mosi": 1, "mosei_senti": 1}
criterion_dict = {"mosi": "L1Loss", "iemocap": "CrossEntropyLoss",
                  "ur_funny": "CrossEntropyLoss"}


@dataclass(frozen=True)
class Config:
    """Frozen run configuration.  Field names mirror the reference parser
    (src/config.py:106-158)."""

    # Mode
    mode: str = "train"
    runs: int = 5
    use_confidNet: bool = False
    confid_two_stage: bool = False    # ConfidNet-paper recipe: after the main
                                      # loop, freeze the backbone and train the
                                      # confidence head alone (net-new; the
                                      # reference's train_confid.sh only adds
                                      # conf to the joint objective)
    n_epoch_stage2: int = 10
    device: str = "tpu"           # reference default 'cuda'; here a JAX platform
    eval_mode: str = "macro"

    # Bert
    use_bert: bool = True
    use_cmd_sim: bool = True

    # Data
    data: str = "mosei"

    # Train
    name: str = "run"
    num_classes: int = 6
    batch_size: int = 64
    eval_batch_size: int = 10
    n_epoch: int = 40
    patience: int = 6

    diff_weight: float = 0.3      # beta
    sim_weight: float = 0.7       # alpha
    sp_weight: float = 0.0        # vestigial in the reference (never added to loss)
    recon_weight: float = 0.7     # gamma
    conf_weight: float = 0.3

    learning_rate: float = 1e-4
    optimizer: str = "Adam"
    grad_accum_steps: int = 1     # microbatching via optax.MultiSteps
    lr_schedule: str = "none"     # none|exponential|plateau|cosine.  The reference
                                  # CREATES ReduceLROnPlateau + ExponentialLR
                                  # but never steps either (src/solver.py:100,
                                  # 122); 'none' replicates that effective
                                  # behavior, the others make them real.
    lr_decay_rate: float = 0.5    # per-epoch decay factor (exponential) /
                                  # plateau factor (reference factor=0.5)
    lr_plateau_patience: int = 5  # epochs (reference patience=5)
    min_lr: float = 1e-6          # reference min_lr=1e-6
    warmup_steps: int = 0         # linear LR warmup steps (cosine schedule)
    clip: float = 1.0
    weight_decay: float = 0.1     # parsed but unused by the reference; see module doc
    apply_weight_decay: bool = False

    extractor: str = "lstm"       # one of {lstm, transformer}
    rnncell: str = "lstm"         # one of {lstm, gru}
    embedding_size: int = 300
    hidden_size: int = 128
    dropout: float = 0.1
    reverse_grad_weight: float = 1.0
    activation: str = "leakyrelu"
    threshold: float = 0.35

    # Model
    model: str = "MISA"
    apply_dataset_hp: bool = False    # apply MOSI_HP/MOSEI_HP presets
    use_label_decoder: bool = False   # TAILOR-style label-attention decoder
                                      # head (the reference's TODO at
                                      # src/models.py:144-147): learned label
                                      # embeddings attend over the 6 fused
                                      # shared/private tokens
    # MulT family (models/mult.py; only read when model == "MULT")
    mult_d: int = 40              # common cross-modal dim (paper: 30-40)
    mult_layers: int = 4          # cross-modal stack depth
    mult_heads: int = 5           # attention heads (must divide mult_d, and
                                  # hence 2*mult_d for the self stacks)
    mult_conv_kernel: int = 3     # temporal conv width of the projections
    lmf_rank: int = 4             # LMF family: rank of the fusion factors
    tfn_post_dim: int = 16        # TFN family: per-modality post-fusion dim D
                                  # (fused tensor has (D+1)^3 coordinates)
    # MAG_BERT family (models/mag_bert.py; only read when model == "MAG_BERT")
    mag_inject_layer: int = 1     # encoder layer receiving the adaptation gate
                                  # (official MAG injection_index; 0 = on the
                                  # embedding output)
    mag_beta: float = 1.0         # beta_shift cap on the injection magnitude
    mag_dropout: float = 0.5      # dropout on the scaled nonverbal shift
    task: str = "auto"            # auto|classification|regression|binary
                                  # auto: mosei/synthetic -> 6-way multilabel
                                  # classification; mosi -> sentiment regression
                                  # (reference criterion_dict 'mosi': L1Loss,
                                  # src/config.py:34-38); ur_funny -> binary humor

    # ---- new framework knobs (not in the reference) ----
    seed: int = 336               # reference seeds torch/numpy with 336 (src/train.py:46-51)
    # Data / shapes
    data_dir: str = "./datasets"
    word_emb_path: Optional[str] = None
    sdk_dir: Optional[str] = None
    bert_model_dir: Optional[str] = None  # local HF bert-base-uncased dir (optional)
    max_seq_len: int = 64         # fixed text-length cap (bucketed; XLA static shapes)
    bucket_sizes: Tuple[int, ...] = (16, 32, 64)
    prefetch: int = 2             # device-prefetch depth (data/loader.py);
                                  # 0 = synchronous device_put in the consumer
    ckpt_interval: int = 1        # save the resume (last_*) checkpoint every
                                  # k epochs.  The full-TrainState msgpack is
                                  # ~1 GB for bert-base + Adam; on weak hosts
                                  # serialization is minutes of CPU, so bulk
                                  # jobs may amortize it (best-on-dev exports
                                  # are unaffected and always saved).
    ckpt_incremental: bool = True # resume (last_*) snapshots save only the
                                  # TRAINABLE leaves + opt state + step/rng;
                                  # frozen leaves (e.g. BERT layers <= 8 on
                                  # mosei) are written ONCE to a content-
                                  # addressed base file.  Cuts the measured
                                  # 24-62 s/save (benchmarks/RESULTS.md) by
                                  # skipping ~60% of the bytes every interval.
    ckpt_backend: str = "msgpack" # msgpack|orbax.  orbax = sharded/elastic
                                  # checkpointing (train/checkpoint_sharded.py):
                                  # each host writes only its addressable
                                  # shards; restore may target a different
                                  # mesh shape.
    # Serving (cli/serve.py)
    port: int = 8321              # HTTP serving port
    vocab_file: Optional[str] = None  # BERT vocab.txt for raw-text requests
    visual_size: int = 35         # MOSEI FACET default; overridden by DataMeta
    acoustic_size: int = 74       # MOSEI COVAREP default; overridden by DataMeta
    vocab_size: int = 32000

    # Numerics / behavior flags
    compute_dtype: str = "bfloat16"   # activations; params & cell state stay fp32
    freeze_bert_embeddings: bool = False  # ALSO freeze BERT's embedding tables.
                                      # The reference freezes encoder layers
                                      # <= 8 but leaves embeddings trainable
                                      # (src/solver.py:69-73), which forces the
                                      # backward pass through ALL 12 layers.
                                      # True lets XLA prune backward through
                                      # the frozen stack (faster steps).
    freeze_embeddings: bool = True    # freeze the GloVe table when use_bert=False.
                                      # NOTE: the reference INTENDS this but its
                                      # `model.embed.requires_grad = False`
                                      # (src/solver.py:86) targets the Module,
                                      # not the Parameter - a no-op, so the
                                      # reference actually trains its GloVe
                                      # table.  False replicates that behavior.
    fix_conf_loss: bool = False   # True -> sane per-class BCE-style conf loss
                                  # False -> replicate reference soft-target CE
                                  # over the batch axis (src/solver.py:451-462)
    missing_modality: str = "none"    # none|visual|acoustic|both: zero streams
    missing_modality_prob: float = 0.0  # train-time random modality dropout prob

    # Parallelism
    dp_size: int = -1             # -1: all devices on the 'data' axis
    tp_size: int = 1              # 'model' axis size (BERT weight sharding)
    pp_size: int = 1              # 'pipe' axis size: BERT encoder layers
                                  # split into pp stages, microbatches flow
                                  # via ppermute (parallel/pipeline.py)
    pp_microbatches: int = 0      # 0 -> pp_size; must divide batch_size
    sp: bool = False              # sequence parallelism: shard the BERT
                                  # residual stream's S axis over the TP
                                  # 'model' devices (needs tp_size > 1;
                                  # parallel/sequence.py)
    moe_experts: int = 0          # > 0: replace every BERT FFN with a
                                  # Switch-style top-1 MoE of this many
                                  # experts (ops/moe.py); experts shard over
                                  # the 'model' axis (expert parallelism,
                                  # parallel/expert.py) when tp_size > 1
    moe_capacity_factor: float = 1.25  # per-expert token capacity multiplier
    moe_top_k: int = 1            # 1 = Switch top-1; 2 = GShard top-2
    moe_aux_weight: float = 0.01  # Switch load-balance loss weight
    moe_z_weight: float = 0.001   # router z-loss weight

    ema_decay: float = 0.0        # > 0: keep an EMA shadow of the params
                                  # (ema <- d*ema + (1-d)*params per step);
                                  # eval + the best-on-dev artifact use the
                                  # shadow (polyak-averaged weights)
    zero1: bool = False           # ZeRO-1: shard optimizer state (Adam m/v)
                                  # over the DP 'data' axis instead of
                                  # replicating (parallel/mesh.py::
                                  # zero1_opt_specs); 1/dp optimizer memory
                                  # per device, same collective volume
    fsdp: bool = False            # ZeRO-3/FSDP: shard params (and their Adam
                                  # m/v mirrors) over the DP 'data' axis —
                                  # XLA SPMD derives all-gather-on-use and
                                  # grad reduce-scatter (parallel/mesh.py::
                                  # fsdp_param_specs); ~1/dp param+grad+opt
                                  # memory per device, composes with TP

    # MMIM (models/mmim.py) MI-term weights (paper's alpha/beta)
    mmim_alpha: float = 0.1       # Barber-Agakov NLL (low-level MI) weight
    mmim_beta: float = 0.1        # CPC/InfoNCE (high-level MI) weight

    # Engine
    export_dir: str = ""          # cli/export.py: write StableHLO serving
                                  # artifacts here (mmda_tpu/serving_export.py)
    ckpt_dir: str = "checkpoints"
    resume: bool = False
    enable_early_stop: bool = False   # the reference's patience logic is
                                      # commented out (src/solver.py:233-242);
                                      # True re-enables it (reload best + halve lr)
    log_every: int = 50
    log_sinks: Tuple[str, ...] = ("stdout",)
    profile_dir: Optional[str] = None
    compiled_epoch: bool = False  # scan-over-batches training: chunks of
                                  # scan_chunk steps run as ONE device dispatch.
                                  # Off by default: free-running async per-step
                                  # dispatches pipeline BETTER through the
                                  # relay than chunked scans with their
                                  # device-side batch stacking (measured:
                                  # 8.9-9.4 vs 11-12.5 s MOSEI-sized epochs,
                                  # benchmarks/bench_epoch.py); the scan wins
                                  # where dispatch is synchronous/expensive.
    scan_chunk: int = 8
    compiled_eval: bool = True    # scanned eval epoch: same-bucket eval
                                  # batches in ONE dispatch + ONE readback
                                  # (~1 s vs 2-3 s per dev eval at MOSEI
                                  # sizes; exact-equivalence tested)
    use_pallas: bool = True       # fused Pallas recurrence kernels for the
                                  # towers — ON by default since round 2; the
                                  # Trainer gates it to TPU backends (LSTM
                                  # ops/pallas/lstm.py; GRU ops/pallas/gru.py
                                  # since round 4; fused XLA scan elsewhere).
                                  # Measured 1.9x tower-pair fwd+bwd vs the
                                  # round-1 scans (benchmarks/bench_towers.py;
                                  # the round-1 per-layer rejection reversed
                                  # at the full-tower level).
    use_flash_attention: bool = False   # Pallas blockwise flash attention in
                                  # the BERT tower.  Off by default: at MOSEI
                                  # S<=66 plain XLA attention is faster (the
                                  # (S,S) logits fit in VMEM); wins at long S -
                                  # see benchmarks/RESULTS.md flash section.
    attn_impl: str = "auto"       # BERT attention core: "auto" | "xla" |
                                  # "fused" (Pallas short-seq kernel,
                                  # ops/pallas/short_attention.py) | "flash"
                                  # (long-seq blockwise kernel with in-kernel
                                  # dropout + O(S) backward).  "auto" picks
                                  # from the measured v5e crossover
                                  # (benchmarks/RESULTS.md long-seq tables):
                                  # flash for TRAINING at S>=512 (-35% at 512,
                                  # -50% at 1024 vs XLA's S^2 probs/mask
                                  # traffic) and for inference at S>1024;
                                  # XLA otherwise (wins the S=50 headline and
                                  # fwd-only to S=1024, where it ties).
                                  # Falls back to xla off TPU automatically
                                  # (kernels interpret-run only in tests).
    fast_dropout: bool = True     # on TPU, run BERT dropout with uint8 draws
                                  # (keep-prob quantized to k/256, exactly
                                  # inverse-scaled => unbiased) and masks
                                  # regenerated in the backward from the PRNG
                                  # key instead of saved.  ~1 ms/step of the
                                  # measured ~5.9 ms dropout cost at B=64/T=48
                                  # (benchmarks/RESULTS.md round-3); False
                                  # restores float-draw torch-style dropout.
    export_weights_dtype: Optional[str] = None  # cli/export: bake the BERT
                                  # tower at this storage dtype — 'int8'
                                  # (weight-only per-channel quantization,
                                  # ~4x smaller artifact) or 'bfloat16';
                                  # None keeps checkpoint dtypes
    fused_ln_dropout: bool = False  # route the BERT LN(x + dropout(h)) sites
                                  # through the fused Pallas kernel with
                                  # in-kernel mask drawing
                                  # (ops/pallas/layernorm.py).  Hash-based
                                  # dropout draws (statistically equivalent,
                                  # not bit-identical).  Off until the TPU
                                  # A/B accepts it (round-4 experiment).
    adam_mu_dtype: str = "float32"  # storage dtype for Adam/AdamW's FIRST
                                  # moment (optax mu_dtype): 'bfloat16' halves
                                  # its HBM traffic (part of the measured
                                  # ~1.3 ms/step Adam-state term).  The second
                                  # moment stays f32 on purpose: with b2=0.999
                                  # its per-step increment (~1e-3 relative) is
                                  # below bf16's ~4e-3 ulp, so a bf16 nu EMA
                                  # simply stops accumulating.  m's b1=0.9
                                  # increments (~0.1 relative) are safely
                                  # above the ulp.
    fast_rng: bool = True         # on TPU, use the rbg hardware PRNG for
                                  # dropout masks instead of threefry
                                  # (measured -1.15 ms/fwd at B=64/T=48,
                                  # benchmarks/RESULTS.md RNG section); still
                                  # deterministic per key, but the stream
                                  # differs from threefry.
    use_wandb: bool = False
    debug_nans: bool = False      # jax_debug_nans: raise on the op producing a
                                  # NaN (TPU-native CUDA_LAUNCH_BLOCKING analog)
    disable_jit: bool = False     # op-by-op execution for debugging

    def resolved_attn_impl(self, training: bool = False,
                           seq_len: Optional[int] = None) -> str:
        """Effective BERT attention implementation; use_flash_attention is the
        back-compat alias for attn_impl='flash'.

        attn_impl='auto' (the default) selects from the measured v5e
        crossover (benchmarks/RESULTS.md long-seq tables): training is
        bandwidth-bound on the S^2 attention-probs/mask tensors, which the
        flash kernel never materializes.  With the round-5 bf16-operand +
        ragged-Q kernels the measured training crossover moved down to
        S>=256 (full step 139.09 flash vs 143.71 XLA at T=256/B=64;
        T=512/B=32 143.42 vs 210.71; bench_flash_r5.log) while XLA still
        wins the short-S headline (S=48: 29.34 flash vs 18.25 XLA) and
        fwd-only inference through S=1024 (flash's sequential k-loop
        serializes what XLA runs batch-parallel at fwd-only arithmetic
        intensity).  `seq_len` defaults to cfg.max_seq_len; model call
        sites pass the actual static token length.
        """
        if self.attn_impl == "auto":
            if self.use_flash_attention:
                return "flash"
            s = self.max_seq_len if seq_len is None else seq_len
            if (training and s >= 256) or (not training and s > 1024):
                return "flash"
            return "xla"
        if self.attn_impl == "xla" and self.use_flash_attention:
            return "flash"
        return self.attn_impl

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def resolved_task(self) -> str:
        if self.task != "auto":
            return self.task
        if self.data == "mosi":
            return "regression"
        if self.data == "ur_funny":
            return "binary"
        return "classification"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    def __post_init__(self):
        if self.activation not in ACTIVATIONS:
            raise ValueError(f"activation must be one of {ACTIVATIONS}, got {self.activation!r}")
        if self.optimizer not in OPTIMIZERS:
            raise ValueError(f"optimizer must be one of {OPTIMIZERS}, got {self.optimizer!r}")
        if self.eval_mode not in EVAL_MODES:
            raise ValueError(f"eval_mode must be one of {EVAL_MODES}, got {self.eval_mode!r}")
        if self.rnncell not in ("lstm", "gru"):
            raise ValueError(f"rnncell must be lstm|gru, got {self.rnncell!r}")
        if self.missing_modality not in ("none", "visual", "acoustic", "both"):
            raise ValueError(f"bad missing_modality {self.missing_modality!r}")
        if self.task not in ("auto", "classification", "regression", "binary"):
            raise ValueError(f"bad task {self.task!r}")
        if self.attn_impl not in ("auto", "xla", "fused", "flash"):
            raise ValueError(
                f"attn_impl must be auto|xla|fused|flash, got {self.attn_impl!r}")
        if self.mult_d % self.mult_heads != 0:
            raise ValueError(
                f"mult_heads={self.mult_heads} must divide mult_d={self.mult_d}")
        if self.mult_d % 2 != 0:
            raise ValueError(
                f"mult_d={self.mult_d} must be even (sinusoidal positions)")
        if self.ckpt_interval < 1:
            raise ValueError(f"ckpt_interval must be >= 1, got {self.ckpt_interval}")
        if self.ckpt_backend not in ("msgpack", "orbax"):
            raise ValueError(f"bad ckpt_backend {self.ckpt_backend!r}")
        if self.lr_schedule not in ("none", "exponential", "plateau", "cosine"):
            raise ValueError(f"bad lr_schedule {self.lr_schedule!r}")
        if self.adam_mu_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"bad adam_mu_dtype {self.adam_mu_dtype!r}")

    def __str__(self) -> str:
        # Pretty-print like the reference Config.__str__ (src/config.py:92-96)
        return "Configurations\n" + self.to_json()


@dataclass(frozen=True)
class DataMeta:
    """Data-derived facts the reference wrote back into its Config
    (src/data_loader.py:35-39).  Kept separate so Config stays immutable."""

    visual_size: int
    acoustic_size: int
    vocab_size: int
    num_train: int = 0
    num_dev: int = 0
    num_test: int = 0
    label_dim: int = 7            # MOSEI: sentiment + 6 emotions
    has_pretrained_emb: bool = False


def build_parser() -> argparse.ArgumentParser:
    """Argparse front-end mirroring the reference flags (src/config.py:106-158)
    plus the new framework flags."""
    p = argparse.ArgumentParser(description="mmda_tpu trainer")
    fields = {f.name: f for f in dataclasses.fields(Config)}
    for name, f in fields.items():
        default = f.default
        if f.type in ("bool", bool) or isinstance(default, bool):
            p.add_argument(f"--{name}", type=str2bool, default=default)
        elif isinstance(default, tuple):
            p.add_argument(f"--{name}", type=lambda s: tuple(
                int(x) if x.isdigit() else x for x in s.split(",")), default=default)
        elif isinstance(default, int):
            p.add_argument(f"--{name}", type=int, default=default)
        elif isinstance(default, float):
            p.add_argument(f"--{name}", type=float, default=default)
        else:
            p.add_argument(f"--{name}", type=str, default=default)
    return p


def get_config(parse: bool = True, argv=None, **optional_kwargs) -> Config:
    """Build a Config, mirroring the reference entry (src/config.py:99-170):
    parse argv, then override with explicit kwargs.

    --config_json FILE loads a saved run config (Trainer writes one per run
    to <ckpt_dir>/<name>_config.json) as the BASE values; flags the user
    explicitly passed on the command line still win — including a flag
    explicitly set to its default value (ADVICE r3 low: detected via a
    SUPPRESS-defaults re-parse, not by comparing to parser defaults)."""
    if parse:
        parser = build_parser()
        parser.add_argument("--config_json", type=str, default="")
        ns = parser.parse_args(argv)
        kw = vars(ns)
        cfg_path = kw.pop("config_json", "")
        if cfg_path:
            with open(cfg_path) as f:
                saved = json.load(f)
            # Which flags did the user ACTUALLY type?  A parse where every
            # action defaults to SUPPRESS yields a namespace containing only
            # explicitly-passed flags, so `--dropout 0.5` survives a saved
            # config even when 0.5 happens to be the parser default.
            probe = build_parser()
            probe.add_argument("--config_json", type=str)
            for action in probe._actions:
                action.default = argparse.SUPPRESS
            explicit = set(vars(probe.parse_args(argv)))
            defaults = {f.name: f.default for f in dataclasses.fields(Config)}
            for k, v in saved.items():
                if k in defaults and k not in explicit:
                    # tuples serialize as lists; restore the field type
                    if isinstance(defaults[k], tuple) and isinstance(v, list):
                        v = tuple(v)
                    kw[k] = v
    else:
        kw = {}
    kw.update(optional_kwargs)
    # Normalize None-like strings coming from the CLI
    for k in ("word_emb_path", "sdk_dir", "bert_model_dir", "profile_dir",
              "export_weights_dtype"):
        if kw.get(k) in ("", "None", "none"):
            kw[k] = None
    if kw.get("apply_dataset_hp") and kw.get("data") in DATASET_HP:
        kw = {**kw, **DATASET_HP[kw["data"]]}
    return Config(**kw)
