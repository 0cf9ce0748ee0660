"""A/B microbenchmark: Pallas fused psi+lap kernel vs the XLA fwdlap path.

Forward-only workload shaped like a quadrature slab sweep (the E(R)
extraction hot path). Run on the TPU-attached environment:

    python benchmarks/pallas_ab.py [--n 1048576] [--reps 20]

Prints a small JSON report (not the driver bench line — see ../bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
    from pinn_for_quantum_wavefunction_surfaces_tpu.ops.pallas_residual import \
        psi_lap_pallas

    cfg = pqs.Config(dtype="float32")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float32)
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    n = args.n
    x = jax.random.uniform(k[0], (n,), jnp.float32, -18, 18)
    y = jax.random.uniform(k[1], (n,), jnp.float32, -18, 18)
    z = jax.random.uniform(k[2], (n,), jnp.float32, -18, 18)
    r = jnp.full((n,), 2.0, jnp.float32)

    def xla_once(params, x, y, z, r):
        s, _ = ansatz.psi_fwdlap(params, cfg.model, x, y, z, r)
        return s.v[..., 0], s.l[..., 0]

    def pallas_once(params, x, y, z, r):
        return psi_lap_pallas(params, cfg.model, x, y, z, r)

    # The remote-PJRT per-call dispatch overhead (~25 ms) would swamp a
    # single-kernel timing, so iterate INSIDE one executable: scan the op
    # with a data dependence between iterations (x shifted by the previous
    # psi mean, preventing CSE) and amortise the call overhead away.
    iters = 20

    def looped(once):
        @jax.jit
        def run(params, x, y, z, r):
            def body(carry, _):
                psi, lap = once(params, x + carry * 1e-12, y, z, r)
                return jnp.mean(psi) + jnp.mean(lap) * 0, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c
        return run

    report = {"n": n, "iters_per_call": iters}
    runners = {"xla_fwdlap": looped(xla_once),
               "pallas_fused": looped(pallas_once)}
    for name, fn in runners.items():
        try:
            float(np.asarray(fn(params, x, y, z, r)))  # compile+warm
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(np.asarray(fn(params, x, y, z, r)))
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times)) / iters
            report[name] = {"ms": round(dt * 1e3, 3),
                            "points_per_sec": round(n / dt, 1)}
        except Exception as exc:  # pragma: no cover
            report[name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"{name} failed: {exc}", file=sys.stderr)
    # correctness cross-check on a slice
    try:
        ref = jax.jit(xla_once)(params, x[:4096], y[:4096], z[:4096],
                                r[:4096])
        got = pallas_once(params, x[:4096], y[:4096], z[:4096], r[:4096])
        report["max_abs_diff"] = max(
            float(jnp.max(jnp.abs(ref[0] - got[0]))),
            float(jnp.max(jnp.abs(ref[1] - got[1]))))
    except Exception as exc:  # pragma: no cover
        report["check_error"] = str(exc)
    if ("xla_fwdlap" in report and "pallas_fused" in report
            and "ms" in report.get("pallas_fused", {})):
        report["speedup_pallas_vs_xla"] = round(
            report["xla_fwdlap"]["ms"] / report["pallas_fused"]["ms"], 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
