from mmvqa_tpu.data.tokenizer import WordPieceTokenizer
from mmvqa_tpu.data.text_encoding import (
    encode_text_mlm,
    encode_text_vqa,
    mask_word,
    flatten_keywords,
)
from mmvqa_tpu.data.datasets import (
    ROCODataset,
    VQADataset,
    load_mlm_data,
    load_vqa_data,
    build_answer_vocab,
    get_keywords,
)
from mmvqa_tpu.data.loader import BatchLoader
from mmvqa_tpu.data.images import (
    load_image,
    process_batch,
    AugmentSpec,
    PRETRAIN_AUG,
    FINETUNE_AUG,
)

__all__ = [
    "WordPieceTokenizer",
    "encode_text_mlm",
    "encode_text_vqa",
    "mask_word",
    "flatten_keywords",
    "ROCODataset",
    "VQADataset",
    "load_mlm_data",
    "load_vqa_data",
    "build_answer_vocab",
    "get_keywords",
    "BatchLoader",
    "load_image",
    "process_batch",
    "AugmentSpec",
    "PRETRAIN_AUG",
    "FINETUNE_AUG",
]
