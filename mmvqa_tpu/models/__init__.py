from mmvqa_tpu.models.mmbert import MMBert, mean_pooling
from mmvqa_tpu.models.embeddings import BertEmbeddings
from mmvqa_tpu.models.transformer import BertEncoder
from mmvqa_tpu.models.realformer import RealFormerEncoder
from mmvqa_tpu.models.feedback import FeedbackEncoder
from mmvqa_tpu.models.visual_tokens import VisualTokenizer
from mmvqa_tpu.models.resnet import ResNetFeatures
from mmvqa_tpu.models.effnetv2 import EffNetV2Features

__all__ = [
    "MMBert",
    "mean_pooling",
    "BertEmbeddings",
    "BertEncoder",
    "RealFormerEncoder",
    "FeedbackEncoder",
    "VisualTokenizer",
    "ResNetFeatures",
    "EffNetV2Features",
]
