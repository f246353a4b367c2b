"""mmda_tpu: TPU-native multimodal multi-label dynamic adaptation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of SoyeonHH/MMDA
(MISA-style shared/private multimodal sentiment + emotion models on
MOSI/MOSEI/UR_FUNNY), designed for TPU from the start:

  * one fully-fused jit'd train step (forward + objective + grad + Adam),
    donated state, no per-batch host syncs;
  * fixed-shape, length-bucketed input pipeline with pre-tokenized features
    and double-buffered device prefetch (C++ host runtime for the hot paths);
  * masked-scan bi-LSTM towers with packed-sequence parity, optional fused
    Pallas recurrence kernel; functional BERT encoder in bf16;
  * ('data','model') device mesh: DP over ICI via XLA SPMD, Megatron-style TP
    hooks for the BERT tower;
  * exact-parity losses/metrics validated against torch oracles.

Layer map (mirrors SURVEY.md §1's target design):
  config     - frozen dataclass + registries (L1)
  data       - ETL -> .npz splits; synthetic generator; host loader (L2, L3)
  models     - model zoo + registry: MISA, bilstm towers, BERT (L4)
  ops        - losses, pure ops, Pallas kernels (under L4)
  train      - objective, state, steps, Trainer engine, checkpoints (L5)
  parallel   - mesh/sharding layer (new; the reference has none)
  utils      - metrics, logging, timing/profiling, transfers (L6)
  cli        - train/infer/etl entry points (L7)
"""

__version__ = "0.1.0"

from mmda_tpu.config import Config, DataMeta, get_config

__all__ = ["Config", "DataMeta", "get_config", "__version__"]
