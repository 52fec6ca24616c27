from atomnas_tpu.models.arch import (
    BlockArch,
    ModelArch,
    arch_summary,
    make_divisible,
    supernet_arch,
)
from atomnas_tpu.models.supernet import forward, init_masks, init_params

__all__ = [
    "BlockArch",
    "ModelArch",
    "arch_summary",
    "make_divisible",
    "supernet_arch",
    "forward",
    "init_masks",
    "init_params",
]
