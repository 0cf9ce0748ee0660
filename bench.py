"""Benchmark: collocation-point throughput of the fused training step.

Prints ONE JSON line:
    {"metric": "collocation_points_per_sec", "value": N, "unit": "points/s",
     "vs_baseline": R}

The reference publishes no throughput numbers (BASELINE.md), so the baseline
is measured in-situ: the reference-style training step (six chained
``torch.autograd.grad`` passes for the Laplacian, float64, Adam) on this
host's CPU via torch, scaled per point. The result is cached in
``bench_baseline.json`` so repeated runs don't re-measure it. ``vs_baseline``
is ours / baseline on that basis; the absolute points/s value is the headline.

Run on the TPU-attached environment (default backend). Options:
    python bench.py [--n N] [--steps K] [--dtype float32] [--no-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def measure_ours(n: int, steps: int, dtype: str,
                 arch: str = "symmetric", repeats: int = 3,
                 kernel: str = "xla", remat: bool = False) -> dict:
    import jax
    import dataclasses
    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine

    cfg = pqs.Config(dtype=dtype, model=pqs.ModelConfig(arch=arch))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_train=n,
                                       epochs=10 ** 9, scan_chunk=steps,
                                       kernel=kernel, remat=remat))
    opt = engine.make_optimizer(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)
    step = engine.make_step(cfg, opt)

    def chunk(state, k):
        return jax.lax.scan(step, state, None, length=k)

    chunk = jax.jit(chunk, static_argnums=1)

    def sync(x):
        # block_until_ready is lazy on remote PJRT backends; a host transfer
        # is a reliable completion barrier
        import numpy as np
        return float(np.asarray(x))

    # compile + warmup with the SAME scan length (each length is a separate
    # executable and remote compiles are expensive)
    state, hist = chunk(state, steps)
    sync(hist.l_tot[-1])
    # best-of-k with spread: single timed chunks proved noisy round-over-
    # round (r01 88.8M vs r02 81.6M on identical code — axon host noise);
    # the BEST chunk is the hardware number, the spread qualifies it
    times = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        state, hist = chunk(state, steps)
        sync(hist.l_tot[-1])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    dev = jax.devices()[0]
    # roofline: prefer the compiler's own FLOP count for the whole scan
    # executable; fall back to the analytic estimate
    flops_per_point, flops_src = None, "none"
    try:
        ca = chunk.lower(state, steps).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and ca.get("flops"):
            # XLA's static count includes the scan BODY once (not x steps),
            # so flops/point-step = flops / n. Cross-checked against the
            # analytic count below: within 2% on the default model.
            flops_per_point = float(ca["flops"]) / n
            flops_src = "xla_cost_analysis"
    except Exception:
        pass
    if flops_per_point is None:
        flops_per_point = analytic_flops_per_point(cfg)
        flops_src = "analytic"
    return {
        "points_per_sec": n * steps / dt,
        "points_per_sec_median": n * steps / sorted(times)[len(times) // 2],
        "points_per_sec_worst": n * steps / max(times),
        "timed_chunks": len(times),
        "steps_per_sec": steps / dt,
        "n": n, "steps": steps, "dtype": dtype,
        "device": f"{dev.platform}:{dev.device_kind}",
        "final_loss": float(hist.l_tot[-1]),
        "flops_per_point": flops_per_point,
        "flops_source": flops_src,
        "kernel": kernel,
    }


def analytic_flops_per_point(cfg) -> float:
    """Analytic FLOPs per collocation point for one fused TRAIN step
    (forward-Laplacian pass + reverse-mode backward ~ 2x forward + Adam).

    Forward counts (symmetric arch, width H, E-head He, gate Hg), per point:
    4 orbital envelopes ~30 each; correction MLP propagating the
    (v, gx, gy, gz, l) 5-tuple through 2->H->H->1 twice (mirrored branch);
    R-heads; residual/loss assembly. Multiply-add counted as 2 FLOPs.
    """
    h = cfg.model.hidden
    he, hg = cfg.model.hidden_e, cfg.model.hidden_gate
    env = 4 * 30
    layer1 = 2 * h * 46            # 2 branches: per-unit 5-comp FMA + sig123
    layer2 = 2 * h * (10 * h + 26)
    out = 2 * 10 * h
    gate = hg * 8
    ehead = he * 6 + 2 * he * he + 2 * he
    fwd = env + layer1 + layer2 + out + gate + ehead + 30
    return 3.0 * fwd + 18.0        # bwd ~ 2x fwd; Adam ~ 18 flops/param<<n


# Roofline denominator. This width-16 model is VPU-bound (elementwise chains
# on (8,128) vregs; the MXU is idle), so the relevant ceiling is the VECTOR
# unit. Round 4's ESTIMATED ceiling (~1024 lanes x FMA x ~1.7 GHz = 3.5e12)
# produced peak_fraction 1.03 in the driver capture — the denominator was
# wrong, so round 5 MEASURES it on the same chip with the same sync
# discipline (measure_vpu_ceilings below): a pure dependent-FMA chain gives
# the f32 FMA ceiling, a pure tanh chain the transcendental ceiling. The
# numerator convention is XLA's cost model (a transcendental counts as 1
# FLOP though it costs multiple VPU cycles), so peak_fraction vs the FMA
# ceiling UNDERSTATES true utilisation on transcendental-heavy steps — both
# ceilings are reported so the reader can bound it. Override with
# BENCH_PEAK_FLOPS; used as a fallback when the ceiling can't be measured.
PEAK_FLOPS_F32_VPU_FALLBACK = float(os.environ.get("BENCH_PEAK_FLOPS", 3.5e12))


def measure_vpu_ceilings(n: int = 1 << 20, iters: int = 2048,
                         unroll_fma: int = 128, unroll_tanh: int = 16,
                         repeats: int = 3) -> dict:
    """Empirical VPU ceilings on the attached chip (VERDICT r4 weak #1).

    Elementwise chains over an n-element f32 array inside one jitted
    fori_loop. The loop body UNROLLS ``unroll`` dependent steps so XLA
    fuses them into one kernel: each HBM round trip (8 B/elem) then
    carries 2*unroll FLOP/elem — arithmetic intensity 32 FLOP/B at
    unroll=128, an order of magnitude past the HBM roofline knee, so the
    chain is compute-bound (the first cut did ONE op per round trip and
    measured HBM bandwidth, not the VPU: 140 GFLOP/s = 560 GB/s).
    Dependent per element, pipelined across vregs — latency hides;
    runtime operands so nothing folds. ``iters`` is sized so one run is
    hundreds of ms of device compute: the remote-PJRT dispatch round
    trip is ~20 ms, which at the first cut's 5 ms of compute dominated
    the measurement (579 GF/s, BELOW the train step's own achieved
    3.59 TF/s).

    - ``fma``: x <- x*a + b, 2 FLOP/elem/step -> the f32 FMA ceiling, the
      roofline denominator for XLA-cost-model numerators.
    - ``tanh``: x <- tanh(x*a), 1 transcendental/elem/step -> the
      transcendental-op ceiling (ops/s, NOT FLOPs/s).

    Same sync discipline as the train-step timing (device->host transfer of
    a scalar; block_until_ready is lazy on remote PJRT backends).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def time_chain(body, unroll):
        def step(x, a, b):
            for _ in range(unroll):
                x = body(x, a, b)
            return x

        @jax.jit
        def run(x, a, b):
            x = jax.lax.fori_loop(0, iters, lambda i, x: step(x, a, b), x)
            return x.ravel()[0]

        x = jnp.ones((n,), jnp.float32)
        a = jnp.float32(0.9999)
        b = jnp.float32(1e-6)
        float(np.asarray(run(x, a, b)))  # compile + warmup
        times = []
        for _ in range(max(repeats, 1)):
            t0 = time.perf_counter()
            float(np.asarray(run(x, a, b)))
            times.append(time.perf_counter() - t0)
        return min(times)

    dt_fma = time_chain(lambda x, a, b: x * a + b, unroll_fma)
    dt_tanh = time_chain(lambda x, a, b: jnp.tanh(x * a), unroll_tanh)
    return {
        "fma_flops_per_sec": 2.0 * n * iters * unroll_fma / dt_fma,
        "tanh_ops_per_sec": float(n) * iters * unroll_tanh / dt_tanh,
        "n": n, "iters": iters, "unroll_fma": unroll_fma,
        "unroll_tanh": unroll_tanh,
    }


def measure_torch_baseline(n: int = 10_000, steps: int = 3) -> dict:
    """Reference-style step on CPU torch: float64, nested autograd Laplacian.

    This is NOT the reference's unrecorded GPU number — it is the only
    measurable baseline in this environment, labeled as such.
    """
    import numpy as np
    import torch

    torch.manual_seed(0)
    torch.set_default_dtype(torch.float64)

    def mk(shape_in, shape_out):
        b = 1.0 / shape_in ** 0.5
        w = torch.empty(shape_in, shape_out).uniform_(-b, b).requires_grad_()
        bias = torch.empty(shape_out).uniform_(-b, b).requires_grad_()
        return w, bias

    h1 = mk(2, 16); h2 = mk(16, 16); out = mk(16, 1)
    g1 = mk(1, 10); g2 = mk(10, 1)
    e1 = mk(1, 32); e2 = mk(32, 32); e3 = mk(32, 1)
    params = [t for pair in (h1, h2, out, g1, g2, e1, e2, e3) for t in pair]
    optim = torch.optim.Adam(params, lr=8e-3)

    def second(f, v):
        d1 = torch.autograd.grad(f.sum(), v, create_graph=True)[0]
        return torch.autograd.grad(d1.sum(), v, create_graph=True)[0]

    times = []
    for _ in range(steps + 1):
        t0 = time.perf_counter()
        optim.zero_grad()
        x = (torch.rand(n, 1) * 36 - 18).requires_grad_()
        y = (torch.rand(n, 1) * 36 - 18).requires_grad_()
        z = (torch.rand(n, 1) * 36 - 18).requires_grad_()
        R = torch.rand(n, 1) * 3.8 + 0.2
        r1 = torch.sqrt((x - R) ** 2 + y ** 2 + z ** 2)
        r2 = torch.sqrt((x + R) ** 2 + y ** 2 + z ** 2)
        f1, f2 = torch.exp(-r1), torch.exp(-r2)
        h = torch.sigmoid(torch.cat([f1, f2], 1) @ h1[0] + h1[1])
        h = torch.sigmoid(h @ h2[0] + h2[1])
        nn = (2 * h) @ out[0] + out[1]
        gate = torch.sigmoid(R @ g1[0] + g1[1]) @ g2[0] + g2[1]
        e = torch.sigmoid(R @ e1[0] + e1[1])
        e = torch.sigmoid(e @ e2[0] + e2[1]) @ e3[0] + e3[1]
        psi = f1 + f2 + nn * gate
        lap = second(psi, x) + second(psi, y) + second(psi, z)
        res = -0.5 * lap + (-1 / r1 - 1 / r2 - e) * psi
        loss = (res ** 2).mean() + (psi[r1 > 17.5] ** 2).mean()
        loss.backward()
        optim.step()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times[1:]))
    return {"points_per_sec": n / dt, "n": n, "device": "cpu-torch-f64"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    # enough steps per jit call to amortise the remote-PJRT dispatch
    # (~25 ms/call vs ~1.4 ms/step of real work)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--arch", default=None,
                    choices=["symmetric", "minimal", "separable"],
                    help="model family for the measured train step. Default: "
                         "measure BOTH the reference-parity symmetric family "
                         "(the round-over-round comparable headline) and the "
                         "separable flagship, in one JSON line")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed chunks per arch; best is reported, "
                         "median/worst recorded as dispersion")
    ap.add_argument("--kernel", default="xla", choices=["xla", "pallas"],
                    help="residual kernel for the measured train step")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the fwdlap pass (HBM-bound large-n "
                         "regime; see TrainConfig.remat)")
    ap.add_argument("--no-baseline", action="store_true")
    args = ap.parse_args()

    ours = measure_ours(args.n, args.steps, args.dtype,
                        args.arch or "symmetric", repeats=args.repeats,
                        kernel=args.kernel, remat=args.remat)
    flagship = None
    if args.arch is None:
        flagship = measure_ours(args.n, args.steps, args.dtype, "separable",
                                repeats=args.repeats, kernel=args.kernel,
                                remat=args.remat)

    # measured roofline denominator (same chip, same sync discipline);
    # falls back to the documented estimate if the microbench fails
    try:
        ceilings = measure_vpu_ceilings()
        peak_flops = ceilings["fma_flops_per_sec"]
        peak_src = "measured_fma_chain"
    except Exception as exc:
        print(f"ceiling microbench failed: {exc}", file=sys.stderr)
        ceilings = None
        peak_flops = PEAK_FLOPS_F32_VPU_FALLBACK
        peak_src = "estimate_fallback"

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_baseline.json")
    baseline = None
    if not args.no_baseline:
        if os.path.exists(cache):
            with open(cache) as f:
                baseline = json.load(f)
        else:
            try:
                # the torch step runs on the HOST CPU: a concurrent
                # training job halves it and silently doubles vs_baseline
                # (observed: 57.2k contended vs 110.3k idle). Measure
                # anyway, but only CACHE a measurement taken on an idle
                # host — a tainted cache would poison every later run.
                # threshold 0.5: this is a ONE-core host, so a single
                # competing process reads ~1.0-1.3 — anything above "the
                # machine is basically idle" means contention
                load = os.getloadavg()[0]
                baseline = measure_torch_baseline()
                if load < 0.5:
                    with open(cache, "w") as f:
                        json.dump(baseline, f)
                else:
                    print(f"host loadavg {load:.1f} > 1.5: baseline "
                          "measured under contention, NOT cached "
                          "(vs_baseline may be inflated this run)",
                          file=sys.stderr)
            except Exception as exc:  # torch missing etc.
                print(f"baseline measurement failed: {exc}", file=sys.stderr)

    vs = (ours["points_per_sec"] / baseline["points_per_sec"]
          if baseline else 1.0)
    achieved = ours["points_per_sec"] * ours["flops_per_point"]
    out = {
        "metric": "collocation_points_per_sec",
        "value": round(ours["points_per_sec"], 1),
        "unit": "points/s",
        "vs_baseline": round(vs, 2),
        # roofline: this width-16 model is VPU-bound (see RESULTS.md);
        # peak_fraction is vs the MEASURED f32 FMA-chain ceiling on this
        # chip (peak_source; transcendentals count as 1 FLOP in the
        # numerator per XLA's cost model, so transcendental-heavy steps
        # UNDERSTATE true utilisation — see ceiling_tanh_gops for the
        # other bound), not the headline MXU number
        "flops_per_point": round(ours["flops_per_point"], 1),
        "flops_source": ours["flops_source"],
        "achieved_gflops": round(achieved / 1e9, 2),
        "peak_fraction": round(achieved / peak_flops, 4),
        "peak_source": peak_src,
        "ceiling_fma_gflops": (round(ceilings["fma_flops_per_sec"] / 1e9, 1)
                               if ceilings else None),
        "ceiling_tanh_gops": (round(ceilings["tanh_ops_per_sec"] / 1e9, 1)
                              if ceilings else None),
        "kernel": ours.get("kernel", "xla"),
        # dispersion over the timed chunks (value = best)
        "value_median": round(ours["points_per_sec_median"], 1),
        "value_worst": round(ours["points_per_sec_worst"], 1),
        "timed_chunks": ours["timed_chunks"],
    }
    if flagship is not None:
        fl_achieved = (flagship["points_per_sec"]
                       * flagship["flops_per_point"])
        out["separable"] = {
            "points_per_sec": round(flagship["points_per_sec"], 1),
            "points_per_sec_median": round(
                flagship["points_per_sec_median"], 1),
            "flops_per_point": round(flagship["flops_per_point"], 1),
            "achieved_gflops": round(fl_achieved / 1e9, 2),
            "peak_fraction": round(fl_achieved / peak_flops, 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
