from mmvqa_tpu.parallel.sharding import (
    infer_param_shardings,
    place_batch,
    place_state,
)

__all__ = ["infer_param_shardings", "place_batch", "place_state"]
