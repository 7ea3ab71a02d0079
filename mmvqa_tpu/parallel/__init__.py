from mmvqa_tpu.parallel.pipeline import (
    PipelinedBertEncoder,
    PipelinedRealFormerEncoder,
    stack_bert_encoder_params,
    stack_realformer_params,
    unstack_bert_encoder_params,
    unstack_realformer_params,
)
from mmvqa_tpu.parallel.sharding import (
    infer_param_shardings,
    place_batch,
    place_state,
)

__all__ = [
    "PipelinedBertEncoder",
    "PipelinedRealFormerEncoder",
    "infer_param_shardings",
    "place_batch",
    "place_state",
    "stack_bert_encoder_params",
    "stack_realformer_params",
    "unstack_bert_encoder_params",
    "unstack_realformer_params",
]
