from mmvqa_tpu.core.config import Config, pretrain_config, supcon_config, vqa_config
from mmvqa_tpu.core.mesh import make_mesh, MeshSpec

__all__ = [
    "Config",
    "pretrain_config",
    "supcon_config",
    "vqa_config",
    "make_mesh",
    "MeshSpec",
]
