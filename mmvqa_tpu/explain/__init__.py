from mmvqa_tpu.explain.gradcam import (
    grad_cam_activations,
    grad_cam_heatmap,
    overlay_heatmap,
)
from mmvqa_tpu.explain.cam_zoo import CAM_METHODS

__all__ = [
    "grad_cam_activations",
    "grad_cam_heatmap",
    "overlay_heatmap",
    "CAM_METHODS",
]
