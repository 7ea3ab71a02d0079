from mmvqa_tpu.utils.logging import MetricSink, seed_everything

__all__ = ["MetricSink", "seed_everything"]
