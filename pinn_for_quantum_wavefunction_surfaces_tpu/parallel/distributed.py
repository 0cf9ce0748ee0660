"""Multi-host (multi-process) initialisation for pod-scale runs.

The reference is single-process/single-GPU (SURVEY.md section 5:
"Distributed communication backend: none"). This framework's mesh code
(parallel/mesh.py) is topology-agnostic: on a multi-host pod the SAME
`shard_map`/pjit step runs unchanged once `jax.distributed.initialize` has
stitched the hosts together — gradient/quadrature reductions ride ICI within
a slice and DCN across slices, scheduled by XLA.

This module is a thin, explicit veneer so launchers have one entry point:

    from pinn_for_quantum_wavefunction_surfaces_tpu.parallel import distributed
    distributed.initialize()           # env-driven (TPU pods auto-detect)
    mesh = distributed.global_mesh()   # 1-D data mesh over ALL devices

On Cloud TPU pods `initialize()` needs no arguments; on GPU/CPU clusters
pass coordinator_address/num_processes/process_id explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (no-op if already initialised)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialised
        if "already" not in str(e).lower():
            raise


def global_mesh(axis: str = "data"):
    """1-D mesh over every device in the job (all hosts)."""
    from .mesh import make_mesh
    return make_mesh(axis=axis)


def is_coordinator() -> bool:
    """True on process 0 — gate checkpoint writes / logging to one host."""
    return jax.process_index() == 0
