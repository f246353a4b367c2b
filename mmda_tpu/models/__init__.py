"""Model zoo + registry.

The reference resolves models by name via `getattr(models, config.model)`
(reference src/solver.py:63); here it's an explicit registry of
(init_fn, forward_fn) pairs.
"""

from mmda_tpu.models.misa import Batch, MISAOutput, init_misa_params, misa_forward
from mmda_tpu.models.ef_lstm import ef_lstm_forward, init_ef_lstm_params
from mmda_tpu.models.lf_dnn import init_lf_dnn_params, lf_dnn_forward
from mmda_tpu.models.mult import init_mult_params, mult_forward
from mmda_tpu.models.lmf import init_lmf_params, lmf_forward
from mmda_tpu.models.tfn import init_tfn_params, tfn_forward
from mmda_tpu.models.mag_bert import init_mag_bert_params, mag_bert_forward
from mmda_tpu.models.mmim import init_mmim_params, mmim_forward

_REGISTRY = {
    "MISA": (init_misa_params, misa_forward),
    "EF_LSTM": (init_ef_lstm_params, ef_lstm_forward),
    "LF_DNN": (init_lf_dnn_params, lf_dnn_forward),
    "MULT": (init_mult_params, mult_forward),
    "LMF": (init_lmf_params, lmf_forward),
    "TFN": (init_tfn_params, tfn_forward),
    "MAG_BERT": (init_mag_bert_params, mag_bert_forward),
    "MMIM": (init_mmim_params, mmim_forward),
}


def register_model(name, init_fn, forward_fn):
    _REGISTRY[name] = (init_fn, forward_fn)


def get_model(name):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(_REGISTRY)}")


__all__ = [
    "Batch",
    "MISAOutput",
    "init_misa_params",
    "misa_forward",
    "register_model",
    "get_model",
]
