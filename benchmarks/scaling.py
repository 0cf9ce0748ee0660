"""Multi-chip scaling curve on the virtual CPU mesh (1/2/4/8 devices), for
both parallel paths (GSPMD sharding-constraint jit and explicit shard_map),
plus a sharded big-grid quadrature demo.

Virtual CPU devices share the same physical cores, so this measures the
SHAPE of the scaling (collective overhead, sharding correctness at size),
not absolute TPU numbers — see RESULTS.md. Run:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py [--n 65536] [--steps 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--quad-n", type=int, default=192,
                    help="per-axis size of the sharded quadrature demo grid")
    args = ap.parse_args()

    import jax
    import numpy as np
    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    from pinn_for_quantum_wavefunction_surfaces_tpu.parallel import mesh as pmesh
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine

    n_avail = len(jax.devices())
    rows = []
    for nd in (1, 2, 4, 8):
        if nd > n_avail:
            break
        cfg = pqs.Config(dtype="float32")
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, n_train=args.n,
                                           epochs=10 ** 9,
                                           scan_chunk=args.steps))
        mesh = pmesh.make_mesh(nd)
        opt = engine.make_optimizer(cfg)
        row = {"devices": nd}
        for path in ("gspmd", "shard_map"):
            state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)
            state = pmesh.shard_state(state, mesh)
            if path == "gspmd":
                step = engine.make_step(cfg, opt, mesh=mesh)
            else:
                step, _ = pmesh.make_shardmap_step(cfg, opt, mesh)

            def chunk(state, k):
                return jax.lax.scan(step, state, None, length=k)

            chunk = jax.jit(chunk, static_argnums=1)
            state, hist = chunk(state, args.steps)           # compile+warm
            jax.block_until_ready(hist)
            t0 = time.perf_counter()
            state, hist = chunk(state, args.steps)
            jax.block_until_ready(hist)
            dt = time.perf_counter() - t0
            row[path + "_points_per_sec"] = round(args.n * args.steps / dt, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # sharded quadrature demo: the reference's ">32 GB at 250^3" case
    # (poc/main.py:1461-1462) — a big grid Rayleigh quotient, slab-streamed
    # AND sharded over the mesh
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
    import jax.numpy as jnp
    cfg = pqs.Config(dtype="float32")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float32)
    mesh = pmesh.make_mesh(min(8, n_avail))
    t0 = time.perf_counter()
    e = aen.rayleigh_quotient_sharded(params, cfg, 1.0, mesh, n=args.quad_n)
    dt = time.perf_counter() - t0
    print(json.dumps({"sharded_quadrature_n": args.quad_n,
                      "points": args.quad_n ** 3,
                      "E_int": float(e), "seconds": round(dt, 2)}))


if __name__ == "__main__":
    main()
