from mmvqa_tpu.explain.gradcam import grad_cam_heatmap, overlay_heatmap

__all__ = ["grad_cam_heatmap", "overlay_heatmap"]
