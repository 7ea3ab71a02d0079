from mmvqa_tpu.train.state import TrainState, create_train_state, make_optimizer
from mmvqa_tpu.train.steps import (
    make_mlm_steps,
    make_distill_steps,
    make_supcon_steps,
    make_vqa_steps,
)
from mmvqa_tpu.train.plateau import ReduceLROnPlateau, EarlyStopping
from mmvqa_tpu.train.trainer import mlm_epoch, supcon_epoch, vqa_epoch
from mmvqa_tpu.train.category_smoothing import build_category_smoothing_table
from mmvqa_tpu.train import checkpoint

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_mlm_steps",
    "make_distill_steps",
    "make_supcon_steps",
    "make_vqa_steps",
    "ReduceLROnPlateau",
    "EarlyStopping",
    "mlm_epoch",
    "supcon_epoch",
    "vqa_epoch",
    "build_category_smoothing_table",
    "checkpoint",
]
