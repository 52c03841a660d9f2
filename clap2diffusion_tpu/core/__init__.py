from clap2diffusion_tpu.core.config import (
    Config,
    load_config,
)
from clap2diffusion_tpu.core.dtypes import DTypePolicy
from clap2diffusion_tpu.core.mesh import make_mesh

__all__ = ["Config", "load_config", "DTypePolicy", "make_mesh"]
