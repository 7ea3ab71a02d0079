from mmvqa_tpu.similarity.calculators import SimilarityCalculator, build_mask

__all__ = ["SimilarityCalculator", "build_mask"]
