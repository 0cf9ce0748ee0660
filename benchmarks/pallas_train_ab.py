"""A/B benchmark on the real TPU: fused Pallas TRAINING kernel (custom VJP)
vs the XLA fwdlap autodiff step, on the FLAGSHIP model (alpha + GZ heads).

Run: python benchmarks/pallas_train_ab.py [--n 100000] [--steps 50]
Prints one JSON line with points/s for both kernels and the speedup.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--model", default="flagship",
                    choices=["flagship", "parity"])
    args = ap.parse_args()

    import jax
    import numpy as np
    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine

    def sync(x):
        return float(np.asarray(x))

    results = {}
    for kernel in ("xla", "pallas"):
        mcfg = (pqs.ModelConfig(gz=True, trainable_exponent=True)
                if args.model == "flagship" else pqs.ModelConfig())
        cfg = pqs.Config(model=mcfg, dtype="float32")
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, n_train=args.n, epochs=10 ** 9,
                scan_chunk=args.steps, kernel=kernel))
        opt = engine.make_optimizer(cfg)
        state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)
        step = engine.make_step(cfg, opt)

        def chunk(state, k):
            return jax.lax.scan(step, state, None, length=k)

        chunk = jax.jit(chunk, static_argnums=1)
        t0 = time.perf_counter()
        state, hist = chunk(state, args.steps)
        l_warm = sync(hist.l_tot[-1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, hist = chunk(state, args.steps)
        l_last = sync(hist.l_tot[-1])
        dt = time.perf_counter() - t0
        results[kernel] = {
            "points_per_sec": args.n * args.steps / dt,
            "ms_per_step": 1e3 * dt / args.steps,
            "compile_s": round(compile_s, 1),
            "loss_last": l_last,
        }
        print(kernel, json.dumps(results[kernel]), flush=True)

    speed = results["pallas"]["points_per_sec"] / results["xla"]["points_per_sec"]
    # the two paths run the same math in different orders; losses after 2x
    # steps from the same seed must agree to f32 noise
    rel = abs(results["pallas"]["loss_last"] - results["xla"]["loss_last"]) / (
        abs(results["xla"]["loss_last"]) + 1e-30)
    print(json.dumps({
        "model": args.model, "n": args.n,
        "pallas_points_per_sec": round(results["pallas"]["points_per_sec"], 1),
        "xla_points_per_sec": round(results["xla"]["points_per_sec"], 1),
        "pallas_over_xla": round(speed, 3),
        "loss_rel_dev": rel,
    }))


if __name__ == "__main__":
    main()
