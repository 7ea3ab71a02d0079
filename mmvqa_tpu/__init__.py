"""mmvqa_tpu — a TPU-native (JAX/Flax/XLA/Pallas) medical-VQA framework.

A from-scratch rebuild of the capabilities of DannielSilva/MM-VQA (an
MMBERT-style multimodal encoder for radiology VQA): ROCO masked-language-model
pretraining (optionally joint with SimCLR/SupCon contrastive learning),
VQA-Med 2019 fine-tuning and evaluation, multi-scale CNN visual tokens
(ResNet152 / EfficientNetV2-M), interchangeable transformer encoders
(pre-norm BERT, RealFormer, Feedback Transformer), the SERF activation,
asymmetric (ASL) loss, Grad-CAM explanations, plateau LR scheduling,
checkpoint/resume, and early stopping.

The design is TPU-first: jit-compiled train steps over a
``jax.sharding.Mesh`` (data / model axes), bf16 MXU matmuls, fused Pallas
attention kernels, device-side batched image augmentation, and Orbax
checkpointing. Nothing is ported line-by-line from the reference; reference
file:line citations in docstrings mark behavioral parity points only.
"""

__version__ = "0.1.0"
