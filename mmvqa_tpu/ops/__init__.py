from mmvqa_tpu.ops.activations import serf, gelu_erf
from mmvqa_tpu.ops.losses import (
    masked_mlm_nll,
    cross_entropy,
    asl_single_label,
    label_smoothing_loss,
    smoothed_soft_target_ce,
    mse_distillation,
)
from mmvqa_tpu.ops.supcon import supcon_loss

__all__ = [
    "serf",
    "gelu_erf",
    "masked_mlm_nll",
    "cross_entropy",
    "asl_single_label",
    "label_smoothing_loss",
    "smoothed_soft_target_ce",
    "mse_distillation",
    "supcon_loss",
]
