from mmvqa_tpu.evaluation.metrics import (
    bleu_score,
    per_category_accuracy,
    per_category_bleu,
    write_predictions,
    write_submission,
)

__all__ = [
    "bleu_score",
    "per_category_accuracy",
    "per_category_bleu",
    "write_predictions",
    "write_submission",
]
