"""TPU-native JAX framework for physics-informed neural-network solutions of
quantum wavefunctions and eigenvalue surfaces (H2+ molecular ion).

A ground-up rebuild of the capabilities of
``slitvinov/PINN_for_quantum_wavefunction_surfaces`` (arXiv:2211.04607),
designed for TPU/XLA: fused forward-Laplacian residuals, jit-compiled
`lax.scan` training, mesh-sharded collocation and quadrature, and parity
readers for the reference's ``.pt`` / ``model.bin`` checkpoints.
"""

from . import config
from .config import Config, ModelConfig, DomainConfig, TrainConfig
from .config import paper_config, minimal_config, finetune_config, smoke_config

__version__ = "0.1.0"

__all__ = [
    "config", "Config", "ModelConfig", "DomainConfig", "TrainConfig",
    "paper_config", "minimal_config", "finetune_config", "smoke_config",
]
