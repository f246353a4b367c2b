"""Pure ops: activations, gradient reversal, binarizer, losses.
(Replaces reference src/utils/functions.py - SURVEY.md C10.)"""

from mmda_tpu.ops.functions import (
    ACTIVATION_FNS,
    binarize,
    get_activation,
    length_mask,
    masked_mean,
    reverse_grad,
)
from mmda_tpu.ops.losses import (
    bce,
    bce_sum_over_classes,
    cmd_loss,
    cmd_loss_total,
    conf_loss,
    diff_loss,
    diff_loss_total,
    domain_loss,
    mse,
    recon_loss_total,
    simse,
    softmax_cross_entropy_int,
)

__all__ = [
    "ACTIVATION_FNS", "binarize", "get_activation", "length_mask",
    "masked_mean", "reverse_grad",
    "bce", "bce_sum_over_classes", "cmd_loss", "cmd_loss_total", "conf_loss",
    "diff_loss", "diff_loss_total", "domain_loss", "mse", "recon_loss_total",
    "simse", "softmax_cross_entropy_int",
]
