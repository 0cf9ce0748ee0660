"""Command-line interface for the framework.

The reference has no CLI (research scripts only, SURVEY.md section 5); this
provides the end-to-end workflows as subcommands:

    pinn-h2p train     — stage-1 training (paper schedule by default)
    pinn-h2p finetune  — stage-2: freeze base+gate, train the E head
    pinn-h2p energy    — E(R) surface extraction -> pickle + figure
    pinn-h2p analyze   — gate / psi-cut / forces / loss figures
    pinn-h2p export    — convert checkpoints (native npz <-> model.bin; read .pt)
    pinn-h2p bench     — collocation-throughput microbenchmark
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
import sys

import numpy as np


def _build_cfg(args) -> "object":
    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    # subcommands without an --arch flag (evaluate, energy, ...) infer
    # separable from --m-abs (the only arch supporting pi/delta sectors);
    # the actual forward dispatch is params-keyed anyway
    arch = getattr(args, "arch",
                   "separable" if getattr(args, "m_abs", 0) else "symmetric")
    cfg = pqs.minimal_config() if arch == "minimal" else pqs.Config()
    model = dataclasses.replace(
        cfg.model, arch=arch,
        inversion_symmetry=1 if args.state == "gerade" else -1)
    train = dataclasses.replace(
        cfg.train,
        **{k: v for k, v in (("n_train", getattr(args, "n_train", None)),
                             ("epochs", getattr(args, "epochs", None)),
                             ("lr", getattr(args, "lr", None)),
                             ("seed", getattr(args, "seed", None)),
                             ("lr_schedule",
                              getattr(args, "lr_schedule", None)),
                             ("resample_frac",
                              getattr(args, "resample_frac", None)),
                             ("sc_step", getattr(args, "sc_step", None)),
                             ("sc_decay", getattr(args, "sc_decay", None)),
                             ("ema_decay", getattr(args, "ema_decay", None)),
                             ("residual_weight",
                              getattr(args, "residual_weight", None)),
                             ("scale_invariant",
                              getattr(args, "scale_invariant", None) or None),
                             ("correction_reg",
                              getattr(args, "correction_reg", None)),
                             ("kernel", getattr(args, "kernel", None)),
                             ("remat",
                              getattr(args, "remat", False) or None))
           if v is not None})
    domain = cfg.domain
    if getattr(args, "dom_r_lo", None) is not None:
        domain = dataclasses.replace(domain, r_lo=args.dom_r_lo)
    if getattr(args, "dom_r_hi", None) is not None:
        domain = dataclasses.replace(domain, r_hi=args.dom_r_hi)
    if getattr(args, "fixed_r", None) is not None:
        domain = dataclasses.replace(domain, fixed_r=args.fixed_r)
    if getattr(args, "xi_span", None) is not None:
        domain = dataclasses.replace(domain, xi_span=args.xi_span)
    if getattr(args, "r_cluster", None):
        domain = dataclasses.replace(domain, r_cluster=args.r_cluster)
    if getattr(args, "sampler", None):
        domain = dataclasses.replace(domain, sampler=args.sampler)
    for k in ("focus_frac", "focus_scale", "focus_floor"):
        if getattr(args, k, None) is not None:
            domain = dataclasses.replace(domain, **{k: getattr(args, k)})
    if getattr(args, "hidden", None):
        model = dataclasses.replace(model, hidden=args.hidden)
    if getattr(args, "trainable_exponent", False):
        model = dataclasses.replace(model, trainable_exponent=True)
    if getattr(args, "r_input", False):
        model = dataclasses.replace(model, r_input=True)
    if getattr(args, "gz", False):
        model = dataclasses.replace(model, gz=True)
    if getattr(args, "xi_node", False):
        model = dataclasses.replace(model, xi_node=True)
    if getattr(args, "xi_node2", False):
        model = dataclasses.replace(model, xi_node=True, xi_node2=True)
    if getattr(args, "eta_node", False):
        model = dataclasses.replace(model, eta_node=True)
    if getattr(args, "m_abs", 0):
        model = dataclasses.replace(model, m_abs=args.m_abs)
    if getattr(args, "wide_alpha", False):
        model = dataclasses.replace(model, wide_alpha=True)
    return dataclasses.replace(cfg, model=model, train=train, domain=domain,
                               dtype=args.dtype)


def _load_params(path: str):
    from .io import checkpoint, modelbin, torch_pt
    if path.endswith(".pt"):
        return torch_pt.load_reference_checkpoint(path)
    if path.endswith(".bin"):
        return modelbin.load_params(path)
    params, _ = checkpoint.load_params(path)
    return params.get("params", params)


def _add_common(p, train=False):
    p.add_argument("--kernel", choices=["xla", "pallas"],
                   help="residual kernel for the train step: XLA fwdlap "
                        "autodiff (default) or the fused Pallas custom-VJP "
                        "kernel (symmetric family, f32)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the fwdlap pass (recompute instead "
                        "of storing residuals; helps only HBM-bound large "
                        "batches, n >= ~1M)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64", "bfloat16"])
    p.add_argument("--state", default="gerade",
                   choices=["gerade", "ungerade"],
                   help="ENVELOPE inversion parity: gerade=1s sigma_g "
                        "ground state, ungerade=2p sigma_u excited state "
                        "(for --m-abs > 0 the total state parity is "
                        "envelope * (-1)^m: 2p pi_u = gerade envelope)")
    p.add_argument("--m-abs", type=int, default=0, dest="m_abs",
                   help="|m| of the target sector (0 sigma, 1 pi, 2 "
                        "delta): the separable ansatz gains the harmonic "
                        "transverse factor Re[(y+iz)^m] — e.g. "
                        "'--m-abs 1' targets 2p pi_u, '--m-abs 1 --state "
                        "ungerade' 3d pi_g, '--m-abs 2' 3d delta_g")
    p.add_argument("--r-lo", type=float, dest="dom_r_lo",
                   help="half-distance domain lower edge (default 0.2)")
    p.add_argument("--r-hi", type=float, dest="dom_r_hi",
                   help="half-distance domain upper edge (default 4.0; "
                        "extend for excited-state wells, which sit near "
                        "D = 2R ~ 8-18)")
    p.add_argument("--xi-span", type=float, dest="xi_span",
                   help="prolate-spheroidal quadrature extent in bohr "
                        "(default 20; diffuse wide-alpha states — n >= 4 "
                        "shells — need ~40 for variationally honest "
                        "quotients, see DomainConfig.xi_span)")
    p.add_argument("--r-cluster", dest="r_cluster",
                   choices=["uniform", "log"],
                   help="R-row layout of the variational objective: 'log' "
                        "clusters (and so up-weights) rows toward the "
                        "united-atom end where the surface curvature "
                        "concentrates the error (DomainConfig.r_cluster)")
    if train:
        p.add_argument("--arch", default="symmetric",
                       choices=["symmetric", "minimal", "separable"])
        p.add_argument("--wide-alpha", action="store_true",
                       dest="wide_alpha",
                       help="orbital exponent alpha(R) in (0.3, 2.25) "
                            "instead of (0.75, 2.25) — excited manifolds "
                            "dissociating to H(n>=2) need alpha = 1/n "
                            "tails (separable arch)")
        p.add_argument("--n-train", type=int, dest="n_train")
        p.add_argument("--epochs", type=int,
               help="TOTAL schedule length; a resumed run trains the remaining\n epochs - start_step steps")
        p.add_argument("--lr", type=float)
        p.add_argument("--seed", type=int)
        p.add_argument("--fixed-r", type=float, dest="fixed_r",
                       help="train at a single half-distance R "
                            "(per-R legacy mode)")
        p.add_argument("--sampler", choices=["uniform", "mixed"],
                       help="mixed = nucleus-focused importance sampling")
        p.add_argument("--focus-frac", type=float, dest="focus_frac")
        p.add_argument("--focus-scale", type=float, dest="focus_scale")
        p.add_argument("--focus-floor", type=float, dest="focus_floor")
        p.add_argument("--sc-step", type=int, dest="sc_step")
        p.add_argument("--sc-decay", type=float, dest="sc_decay")
        p.add_argument("--ema-decay", type=float, dest="ema_decay",
                       help="Polyak averaging decay (e.g. 0.999; 0 = off)")
        p.add_argument("--residual-weight", choices=["none", "lcao"],
                       dest="residual_weight",
                       help="lcao = local-energy-variance weighting")
        p.add_argument("--scale-invariant", action="store_true",
                       dest="scale_invariant",
                       help="normalise the loss by mean(psi^2) — removes "
                            "the amplitude-collapse mode in long runs")
        p.add_argument("--correction-reg", type=float,
                       dest="correction_reg",
                       help="penalty keeping the neural correction small "
                            "relative to LCAO (e.g. 1e-3)")
        p.add_argument("--hidden", type=int,
                       help="correction-MLP width (default 16)")
        p.add_argument("--trainable-exponent", action="store_true",
                       dest="trainable_exponent",
                       help="learn the orbital exponent alpha(R)")
        p.add_argument("--r-input", action="store_true", dest="r_input",
                       help="feed R into the correction MLP (lifts the "
                            "rank-1-in-R restriction of the reference ansatz)")
        p.add_argument("--gz", action="store_true",
                       help="Guillemin-Zener physics part e^{-a r1 - b r2} "
                            "with trainable b(R) (LCAO is b=0)")
        p.add_argument("--lr-schedule", choices=["none", "step"],
                       dest="lr_schedule",
                       help="step = exponential decay (sc_step/sc_decay)")
        p.add_argument("--resample-frac", type=float, dest="resample_frac")
        p.add_argument("--mesh", type=int, default=0,
                       help="shard the collocation batch over N devices")


def _log(step, metrics):
    # 9 significant digits: variational polish progress is sub-mHa on an
    # O(1) Ha objective — 3 digits cannot show it
    print(f"{step:8d}: " + " ".join(f"{k}={v:.9e}" for k, v in
                                    metrics.items()), flush=True)


def cmd_train(args) -> None:
    import jax
    from .io import checkpoint
    from .training import engine
    from .utils.metrics import MetricLogger
    cfg = _build_cfg(args)
    mesh = None
    if args.mesh:
        from .parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
    os.makedirs(args.out, exist_ok=True)
    log = MetricLogger(os.path.join(args.out, "metrics.jsonl"))

    def ckpt_cb(state, step):
        checkpoint.save(os.path.join(args.out, "best.npz"),
                        {"params": jax.tree.map(np.asarray,
                                                state.best_params)},
                        meta={"step": step,
                              "best_loss": float(state.best_loss)})
        # full training state (params + Adam moments) for exact resume
        checkpoint.save(os.path.join(args.out, "state.npz"),
                        {"params": jax.tree.map(np.asarray, state.params),
                         "opt": jax.tree.map(np.asarray, state.opt_state)},
                        meta={"step": step})

    params = opt_state = None
    start_step = 0
    if args.resume:
        if args.resume.endswith("state.npz"):
            # exact resume: rebuild the optimizer state via the template
            optimizer = engine.make_optimizer(cfg)
            p0 = _load_params(args.resume)
            template = {"params": p0,
                        "opt": optimizer.init(
                            jax.tree.map(lambda a: np.asarray(a, cfg.dtype),
                                         p0))}
            tree, meta = checkpoint.load(args.resume, template)
            params, opt_state = tree["params"], tree["opt"]
            start_step = int(meta.get("step", 0))
        else:
            params = _load_params(args.resume)
    if args.profile:
        from .utils.profiling import trace
        with trace(args.profile):
            res = engine.train(cfg, params=params, opt_state=opt_state,
                               start_step=start_step, mesh=mesh, log_cb=log,
                               checkpoint_cb=ckpt_cb)
    else:
        res = engine.train(cfg, params=params, opt_state=opt_state,
                           start_step=start_step, mesh=mesh, log_cb=log,
                           checkpoint_cb=ckpt_cb)
    checkpoint.save(os.path.join(args.out, "final.npz"),
                    {"params": res.params},
                    meta={"best_loss": res.best_loss,
                          "runtime_s": res.runtime_s})
    checkpoint.save(os.path.join(args.out, "best.npz"),
                    {"params": res.best_params},
                    meta={"best_loss": res.best_loss})
    if cfg.train.ema_decay > 0:
        checkpoint.save(os.path.join(args.out, "ema.npz"),
                        {"params": res.ema_params}, meta={})
    with open(os.path.join(args.out, "history.pkl"), "wb") as f:
        pickle.dump(res.history, f)
    print(json.dumps({"best_loss": res.best_loss,
                      "runtime_s": round(res.runtime_s, 2),
                      "points_per_sec": round(res.points_per_sec, 1)}))


def cmd_finetune(args) -> None:
    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    from .io import checkpoint
    from .training import engine
    cfg = pqs.finetune_config(_build_cfg(args))
    if args.epochs:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs))
    params = _load_params(args.checkpoint)
    params = {k: {kk: np.asarray(vv, cfg.dtype) for kk, vv in v.items()}
              for k, v in params.items()}
    os.makedirs(args.out, exist_ok=True)
    res = engine.finetune(cfg, params=params, log_cb=_log)
    checkpoint.save(os.path.join(args.out, "finetune.npz"),
                    {"params": res.best_params},
                    meta={"best_loss": res.best_loss})
    with open(os.path.join(args.out, "history_finetune.pkl"), "wb") as f:
        pickle.dump(res.history, f)
    print(json.dumps({"best_loss": res.best_loss}))


def cmd_energy(args) -> None:
    from .analysis import energy as aen
    cfg = _build_cfg(args)
    params = _load_params(args.checkpoint)
    params = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
              for k, v in params.items()}
    surf = aen.surface(params, cfg, n=args.n_test, lcao=not args.no_lcao,
                       grid=args.grid,
                       progress=lambda i, n, ri: print(
                           f"R={ri:.1f} ({i + 1}/{n})", file=sys.stderr))
    aen.save_surface(args.out, surf)
    exact = aen.exact_energy(surf["R"], oracle=args.oracle)
    err = 1e3 * np.abs(surf["E_net"] - exact)
    print(json.dumps({"surface": args.out,
                      "oracle": args.oracle,
                      "max_err_mHa": round(float(err.max()), 3),
                      "mean_err_mHa": round(float(err.mean()), 3)}))
    if args.figure:
        from .analysis import plots
        print(plots.surface_figure(surf, args.figure))


def cmd_analyze(args) -> None:
    from .analysis import plots
    cfg = _build_cfg(args)
    params = _load_params(args.checkpoint)
    params = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
              for k, v in params.items()}
    outdir = args.out
    if args.paper_set:
        hist = None
        if args.history:
            with open(args.history, "rb") as f:
                hist = pickle.load(f)
        paths = plots.paper_set(params, cfg, outdir, history=hist,
                                n_test=args.n_test, grid=args.grid,
                                hf_points=args.hf_points)
        print(json.dumps({"figures": paths}))
        return
    paths = [plots.energy_curve_figure(params, cfg,
                                       os.path.join(outdir, "energy.png")),
             plots.gate_figure(params, cfg, os.path.join(outdir, "gate.pdf"))]
    expfig = plots.exponent_figure(params, cfg,
                                   os.path.join(outdir, "exponents.pdf"))
    if expfig:
        paths.append(expfig)
    for ri in args.r_cuts:
        paths.append(plots.psi_cut_figure(
            params, cfg, ri, os.path.join(outdir, f"R{ri:g}.png")))
        paths.append(plots.psi_cut_figure(
            params, cfg, ri, os.path.join(outdir, f"R{ri:g}e.png"), diff=True))
    if args.forces:
        paths.append(plots.forces_figure(
            params, cfg, path=os.path.join(outdir, "forces.pdf")))
    if args.history:
        with open(args.history, "rb") as f:
            hist = pickle.load(f)
        paths.append(plots.loss_figure(
            hist, os.path.join(outdir, "loss_figure.jpg")))
    print(json.dumps({"figures": paths}))


def cmd_distill(args) -> None:
    """Fit the E(R) head to the Rayleigh quotient of the trained psi."""
    from .io import checkpoint
    from .training import distill
    cfg = _build_cfg(args)
    params = _load_params(args.checkpoint)
    params = {k: {kk: np.asarray(vv, cfg.dtype) for kk, vv in v.items()}
              for k, v in params.items()}
    new_params, info = distill.distill(params, cfg, n=args.n_test,
                                       steps=args.steps)
    checkpoint.save(args.out, {"params": new_params},
                    meta={"fit_rms": info["fit_rms"]})
    print(json.dumps({"out": args.out,
                      "fit_rms_mHa": round(1e3 * info["fit_rms"], 4)}))


def cmd_variational(args) -> None:
    """Variational (Rayleigh-quotient) refinement of a checkpoint."""
    from .io import checkpoint
    from .training import variational
    cfg = _build_cfg(args)
    params = None
    if args.checkpoint:
        params = _load_params(args.checkpoint)
        params = {k: {kk: np.asarray(vv, cfg.dtype) for kk, vv in v.items()}
                  for k, v in params.items()}
    if args.spheroidal and not (args.lbfgs or args.adam_warmup):
        raise SystemExit("--spheroidal is the deterministic objective: give "
                         "it an optimisation budget (--lbfgs N and/or "
                         "--adam-warmup N)")
    if args.adam_warmup and not args.spheroidal:
        raise SystemExit("--adam-warmup belongs to the --spheroidal polish "
                         "(the MC trainer is already Adam)")
    deflate_params = None
    if getattr(args, "deflate", None):
        if not args.spheroidal:
            raise SystemExit("--deflate needs the deterministic objective: "
                             "add --spheroidal (MC deflation is not "
                             "implemented)")
        deflate_params = [
            {k: {kk: np.asarray(vv, cfg.dtype) for kk, vv in v.items()}
             for k, v in _load_params(path).items()}
            for path in args.deflate]
    os.makedirs(args.out, exist_ok=True)
    if args.lbfgs or (args.spheroidal and args.adam_warmup):
        if args.spheroidal:
            mesh = None
            if getattr(args, "mesh", 0):
                if cfg.domain.fixed_r is not None:
                    # the dual-grid batch has exactly 2 R-rows at fixed R, so
                    # there is nothing to shard along the R axis — a larger
                    # mesh would crash in device_put (rows not divisible)
                    raise SystemExit("--mesh shards the polish over R rows; "
                                     "with --fixed-r there is only one R — "
                                     "drop --mesh")
                from .parallel.mesh import make_mesh
                mesh = make_mesh(args.mesh)
            polished = variational.polish_spheroidal(
                params, cfg, n_r=args.n_r, n_xi=args.n_xi, n_eta=args.n_eta,
                steps=args.lbfgs, adam_steps=args.adam_warmup,
                warmup_save=os.path.join(args.out, "warmup.npz"),
                best_save=os.path.join(args.out, "best_sofar.npz"),
                mesh=mesh, log_cb=_log, deflate_params=deflate_params,
                memory_size=args.lbfgs_memory)
        else:
            polished = variational.polish_lbfgs(
                params, cfg, n_r=args.n_r, n_pts=args.n_pts,
                steps=args.lbfgs, log_cb=_log)
        if not args.spheroidal:
            polish = "lbfgs"
        elif args.lbfgs:
            polish = "spheroidal-lbfgs"
        else:
            polish = "spheroidal-adam"   # pure warmup run, no L-BFGS phase
        meta = {"polish": polish}
        if cfg.domain.xi_span != 20.0:
            # non-default quadrature extent is part of the objective —
            # record it so `cli evaluate` scores on the same (honest) box
            meta["xi_span"] = cfg.domain.xi_span
        if cfg.domain.r_cluster != "uniform":
            meta["r_cluster"] = cfg.domain.r_cluster
        if (cfg.domain.r_lo, cfg.domain.r_hi) != (0.2, 4.0):
            # extended-well runs: the trained R domain is part of the
            # artifact's identity (evaluate re-scores on it by default)
            meta["r_lo"] = cfg.domain.r_lo
            meta["r_hi"] = cfg.domain.r_hi
        # known states per (|m|, envelope parity) sector, lowest first —
        # k deflated references target the (k+1)-th state
        # NOTE the (0,-1) entry stops being a pure energy ordering past the
        # 4psu/4fsu crossing at R = 1.933 (test_exact), and the (1,1) one
        # past the 3ppu/4fpiu crossing at R = 4.115 (just outside the
        # default box) — for such runs the explicit --target-state
        # override below is authoritative
        sector = {(0, 1): ["1ssg", "2ssg", "3dsg", "3ssg"],
                  (0, -1): ["2psu", "3psu", "4psu", "4fsu"],
                  (1, 1): ["2ppu", "3ppu", "4fpiu", "4ppu"],
                  (1, -1): ["3dpg", "4dpg"],
                  (2, 1): ["3ddg", "4ddg"], (2, -1): ["4fdu"],
                  (3, 1): ["4fpu"]}.get(
            (cfg.model.m_abs, cfg.model.inversion_symmetry), [])
        if cfg.model.m_abs:
            meta["m_abs"] = cfg.model.m_abs
            if not deflate_params and sector:
                # pi/delta sector minima need no deflation; record the
                # target so `cli evaluate` scores the right oracle state
                meta["target_state"] = sector[0]
        if deflate_params is not None:
            meta["deflated"] = ",".join(os.path.basename(p)
                                        for p in args.deflate)
            # record which state k deflated references target, so `cli
            # evaluate` scores against the right oracle by default
            if len(deflate_params) < len(sector):
                meta["target_state"] = sector[len(deflate_params)]
        if getattr(args, "target_state", None):
            # explicit override — authoritative where same-sector curve
            # crossings break the counting inference (n=4 sigma_u)
            meta["target_state"] = args.target_state
        checkpoint.save(os.path.join(args.out, "variational.npz"),
                        {"params": polished}, meta=meta)
        print(json.dumps({"out": args.out, "polish": polish,
                          "lbfgs_steps": args.lbfgs,
                          "adam_warmup_steps": args.adam_warmup,
                          "deflated": deflate_params is not None,
                          "spheroidal": bool(args.spheroidal)}))
        return
    res = variational.train_variational(
        cfg, params=params, n_r=args.n_r, n_pts=args.n_pts,
        epochs=args.epochs or cfg.train.epochs, lr=args.lr,
        antithetic=args.antithetic, stratified=args.stratified_r,
        log_cb=_log)
    checkpoint.save(os.path.join(args.out, "variational.npz"),
                    {"params": res.ema_params}, meta={})
    checkpoint.save(os.path.join(args.out, "variational_raw.npz"),
                    {"params": res.params}, meta={})
    print(json.dumps({"E_mean_final": float(res.history["Energy"][-1]),
                      "runtime_s": round(res.runtime_s, 2),
                      "points_per_sec": round(res.points_per_sec, 1)}))


def cmd_evaluate(args) -> None:
    """Score a checkpoint: distill the E head onto the Rayleigh quotient of
    psi, extract the E(R) surface on the adapted grid, report errors vs the
    exact Wind (1965) energies."""
    from .analysis import energy as aen
    from .io import checkpoint
    from .training import distill
    cfg = _build_cfg(args)
    params = _load_params(args.checkpoint)
    params = {k: {kk: np.asarray(vv, cfg.dtype) for kk, vv in v.items()}
              for k, v in params.items()}
    state = getattr(args, "target_state", None)
    if args.checkpoint.endswith(".npz"):
        # deflated / pi-sector checkpoints record which state they target
        # (meta set by cmd_variational) — score against the right oracle
        # and rebuild the right ansatz by default
        try:
            _, ck_meta = checkpoint.load_params(args.checkpoint)
        except Exception:
            ck_meta = None
        if state is None:
            state = (ck_meta or {}).get("target_state")
        if not cfg.model.m_abs and (ck_meta or {}).get("m_abs"):
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, arch="separable",
                    m_abs=int(ck_meta["m_abs"])))
        if getattr(args, "xi_span", None) is None \
                and (ck_meta or {}).get("xi_span"):
            # score on the checkpoint's own (honest) quadrature box
            cfg = dataclasses.replace(
                cfg, domain=dataclasses.replace(
                    cfg.domain, xi_span=float(ck_meta["xi_span"])))
        if getattr(args, "dom_r_lo", None) is None \
                and getattr(args, "dom_r_hi", None) is None \
                and (ck_meta or {}).get("r_hi"):
            # extended-well artifacts re-score on their own R domain
            cfg = dataclasses.replace(
                cfg, domain=dataclasses.replace(
                    cfg.domain, r_lo=float(ck_meta.get("r_lo", 0.2)),
                    r_hi=float(ck_meta["r_hi"])))
    if state is None:
        if cfg.model.m_abs:
            state = {(1, 1): "2ppu", (1, -1): "3dpg", (2, 1): "3ddg",
                     (3, 1): "4fpu"}[
                (cfg.model.m_abs, cfg.model.inversion_symmetry)]
        else:
            state = "2psu" if cfg.model.inversion_symmetry < 0 else "1ssg"
    # scoring a state IMPLIES its envelope parity — derive it rather than
    # trust the --state flag (field-tested failure: evaluating an
    # ungerade-envelope pi run without --state ungerade rebuilt a gerade
    # ansatz around ungerade-trained params and scored a garbage mixed
    # trial 120 mHa below the sector minimum)
    # envelope parity = the oracle's parity index (STATE_INDEX[state][1]):
    # for m > 0 the TOTAL state parity is envelope * (-1)^m
    from .analysis.exact import STATE_INDEX as _SI
    env_parity = _SI[state][1] if state in _SI else None
    if env_parity is not None \
            and cfg.model.inversion_symmetry != env_parity:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           inversion_symmetry=env_parity))
    new_params, info = distill.distill(params, cfg, n=args.n_test,
                                       steps=args.steps)
    out_dir = args.out or os.path.dirname(os.path.abspath(args.checkpoint))
    os.makedirs(out_dir, exist_ok=True)
    tree = {"params": new_params}
    table = None
    if args.table_knots:
        # dense spline table of per-R Rayleigh quotients: the exported E(R)
        # surface inherits psi's accuracy instead of the MLP head's ~0.007
        # mHa fit floor (analysis.etab)
        from .analysis import etab
        table = etab.build_table(new_params, cfg, n_knots=args.table_knots)
        tree["e_table"] = table
    eval_meta = {"fit_rms": info["fit_rms"],
                 "table_knots": args.table_knots,
                 "target_state": state}
    if cfg.model.m_abs:
        # keep the sector tag on the evaluated artifact too, so it is
        # self-describing for re-evaluation / warm starts
        eval_meta["m_abs"] = cfg.model.m_abs
    if cfg.domain.xi_span != 20.0:
        # non-default quadrature box (diffuse n >= 4 tails): without this
        # a re-evaluation would silently re-score on the span-20 box
        eval_meta["xi_span"] = cfg.domain.xi_span
    if (cfg.domain.r_lo, cfg.domain.r_hi) != (0.2, 4.0):
        # extended-well artifacts must carry their own R domain
        eval_meta["r_lo"] = cfg.domain.r_lo
        eval_meta["r_hi"] = cfg.domain.r_hi
    checkpoint.save(os.path.join(out_dir, "evaluated.npz"), tree,
                    meta=eval_meta)
    surf = aen.surface(new_params, cfg, n=args.n_test, lcao=False,
                       grid="spheroidal")
    aen.save_surface(os.path.join(out_dir, "energy_eval.pkl"), surf)
    oracle = args.oracle
    if state != "1ssg":
        # only the ODE oracle covers non-ground states (the Wind table is
        # the gerade ground state)
        exact = aen.exact_energy_ode(surf["R"], state=state)
        oracle = f"ode:{state}"
    else:
        exact = aen.exact_energy(surf["R"], oracle=args.oracle)
    err = 1e3 * np.abs(surf["E_net"] - exact)
    err_int = 1e3 * (surf["E_int"] - exact)   # signed: must be >= 0
    sel = surf["R"] >= 0.5
    out = {
        "checkpoint": args.checkpoint,
        "oracle": oracle,
        "fit_rms_mHa": round(1e3 * info["fit_rms"], 3),
        "mean_err_mHa": round(float(err.mean()), 3),
        "max_err_mHa": round(float(err.max()), 3),
        "mean_err_mHa_R>=0.5": round(float(err[sel].mean()), 3),
        "max_err_mHa_R>=0.5": round(float(err[sel].max()), 3),
        "err_R=0.2": round(float(err[0]), 3),
        # the honest variational metric: quadrature Rayleigh quotient of psi
        # (signed; positivity certifies a true upper bound at every R)
        "int_mean_err_mHa": round(float(np.abs(err_int).mean()), 4),
        "int_max_err_mHa": round(float(np.abs(err_int).max()), 4),
        "int_min_signed_mHa": round(float(err_int.min()), 4),
    }
    if getattr(args, "contam_vs", None):
        # excited-state certificate: norm fraction of psi inside the span
        # of the deflated lower states, on the independent evaluation grid
        from .training import variational
        refs = [{k: {kk: np.asarray(vv, cfg.dtype) for kk, vv in v.items()}
                 for k, v in _load_params(p).items()}
                for p in args.contam_vs]
        frac = variational.contamination_curve(new_params, refs, cfg,
                                               surf["R"])
        out["contam_max_frac"] = float(frac.max())
        out["contam_mean_frac"] = float(frac.mean())
    if table is not None:
        # the exported spline table scored as E_net — on the standard grid
        # AND at off-knot points (half-spacing offsets), so the number
        # reflects interpolation quality, not table lookup
        from .analysis import etab
        e_tab = etab.energy_from_table(table, surf["R"])
        terr = 1e3 * np.abs(e_tab - exact)
        # probe at the LOCAL knot-interval midpoints (knots are
        # log-clustered, so a single global half-spacing taken from the
        # first interval lands nearly on-knot at large R and underreports
        # interpolation error there)
        tab_r = np.asarray(table["R"], np.float64)
        mid = 0.5 * (tab_r[:-1] + tab_r[1:])
        mid = mid[(mid >= surf["R"].min()) & (mid <= surf["R"].max())]
        # subsample to bound the oracle cost (~1 s per uncached root)
        r_off = mid[np.unique(np.linspace(0, len(mid) - 1, 48).astype(int))]
        ex_off = aen.exact_energy_ode(r_off, state=state)
        terr_off = 1e3 * np.abs(etab.energy_from_table(table, r_off) - ex_off)
        out.update({
            "tab_mean_err_mHa": round(float(terr.mean()), 4),
            "tab_max_err_mHa": round(float(terr.max()), 4),
            "tab_offknot_mean_err_mHa": round(float(terr_off.mean()), 4),
            "tab_offknot_max_err_mHa": round(float(terr_off.max()), 4),
        })
    print(json.dumps(out))


def cmd_sweep(args) -> None:
    """Per-R multi-model family (legacy mode): vmapped across the sweep."""
    from .training import sweep
    cfg = _build_cfg(args)
    rs = args.r_values or list(np.round(np.arange(
        cfg.domain.r_lo, cfg.domain.r_hi + 1e-9, args.r_step), 2))
    if args.polish:
        if args.mesh:
            raise SystemExit("--polish runs per-R single-row quotients and "
                             "does not shard over a mesh; drop --mesh")
        out = sweep.polish_per_r(cfg, rs, steps=args.polish)
    else:
        mesh = None
        if args.mesh:
            from .parallel.mesh import make_mesh
            mesh = make_mesh(args.mesh)
        out = sweep.train_per_r_vmapped(cfg, rs, mesh=mesh)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".",
                exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump({"R": out["R"], "E_net": out["E_net"],
                     "best_loss": out["best_loss"]}, f)
    print(json.dumps({"out": args.out,
                      "R": list(map(float, out["R"])),
                      "E_net": [round(float(e), 6) for e in out["E_net"]]}))


def cmd_vibrations(args) -> None:
    """Nuclear (vibrational/rotational) levels on the electronic surface
    (analysis.vibration): from an evaluated artifact's spline E(R) table,
    or from the exact ODE oracle as the ruler (--oracle STATE)."""
    from .analysis import etab, vibration
    from .io import checkpoint
    state = args.vib_state
    if args.oracle:
        table = vibration.oracle_table(args.oracle, r_lo=args.r_lo,
                                       r_hi=args.r_hi)
        source = f"oracle:{args.oracle}"
        state = state or args.oracle
    else:
        if not args.checkpoint:
            raise SystemExit("give an evaluated .npz artifact (with an "
                             "e_table subtree) or --oracle STATE")
        table = etab.load_table(args.checkpoint)
        if table is None:
            raise SystemExit(f"{args.checkpoint} carries no e_table "
                             "subtree — run `cli evaluate` first")
        source = args.checkpoint
        if state is None:
            # evaluated artifacts record which oracle state they score
            # against — that fixes the dissociation asymptote for D0
            _, ck_meta = checkpoint.load_params(args.checkpoint)
            state = (ck_meta or {}).get("target_state", "1ssg")
    if args.j_max is not None:
        # full E(v, J) rovibrational grid artifact (analysis.vibration.
        # rovibrational_table): band origins + B_v constants + D0
        out = {"source": source}
        out.update(vibration.rovibrational_table(
            table, state, n_v=args.n_levels, j_max=args.j_max))
        if args.vib_out:
            with open(args.vib_out, "w") as fh:
                json.dump(out, fh, indent=1)
        print(json.dumps(out))
        return
    levels = vibration.levels_from_table(table, n_levels=args.n_levels,
                                         j=args.j)
    out = {"source": source, "J": args.j, "state": state}
    out.update(vibration.summarize(
        levels, asymptote=vibration.dissociation_asymptote(state)))
    print(json.dumps(out))


def cmd_export(args) -> None:
    from .io import checkpoint, modelbin, torch_pt
    if args.output.endswith(".csv"):
        # standalone E(R) table export (the spline knots from cli evaluate):
        # R,E_electronic,E_total rows for non-Python consumers
        from .analysis import etab
        table = etab.load_table(args.input)
        if table is None:
            raise SystemExit(f"{args.input} carries no e_table subtree — "
                             "run `cli evaluate` first (--table-knots)")
        with open(args.output, "w") as f:
            f.write("R,E_electronic,E_total\n")
            for r, e in zip(table["R"], table["E"]):
                f.write(f"{r:.12g},{e:.15g},{e + 0.5 / r:.15g}\n")
        print(json.dumps({"written": args.output,
                          "knots": len(table["R"])}))
        return
    params = _load_params(args.input)
    if args.output.endswith(".bin"):
        modelbin.save_params(args.output, params)
    elif args.output.endswith(".pt"):
        torch_pt.save_reference_checkpoint(args.output, params)
    else:
        checkpoint.save(args.output, {"params": params}, meta={})
    print(json.dumps({"written": args.output}))


def cmd_bench(args) -> None:
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(root, "bench.py")]
    if args.n:
        cmd += ["--n", str(args.n)]
    raise SystemExit(subprocess.call(cmd))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="pinn-h2p", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="stage-1 training")
    _add_common(p, train=True)
    p.add_argument("--out", default="runs/stage1")
    p.add_argument("--resume",
                   help="checkpoint to warm-start from (params-only), or a "
                        "state.npz for exact resume incl. optimizer state")
    p.add_argument("--profile",
                   help="capture a jax.profiler trace of the run into DIR "
                        "(view in TensorBoard/Perfetto)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("finetune", help="stage-2 E-head fine-tune")
    _add_common(p, train=True)
    p.add_argument("checkpoint")
    p.add_argument("--out", default="runs/stage2")
    p.set_defaults(fn=cmd_finetune)

    p = sub.add_parser("energy", help="E(R) surface extraction")
    _add_common(p)
    p.add_argument("checkpoint")
    p.add_argument("--out", default="energy_R_ion.pkl")
    p.add_argument("--n-test", type=int, default=80, dest="n_test")
    p.add_argument("--no-lcao", action="store_true")
    p.add_argument("--grid", default="uniform",
                   choices=["uniform", "adapted", "spheroidal"],
                   help="adapted = nucleus-clustered Cartesian nodes; "
                        "spheroidal = prolate-spheroidal Gauss quadrature "
                        "(machine precision for this problem)")
    p.add_argument("--oracle", default="wind", choices=["wind", "ode"],
                   help="error ruler: the reference's 4-decimal Wind table "
                        "(parity) or the in-repo exact ODE solver (~1e-11)")
    p.add_argument("--figure", help="also write the surface figure here")
    p.set_defaults(fn=cmd_energy)

    p = sub.add_parser("analyze", help="figures: gate, psi cuts, forces")
    _add_common(p)
    p.add_argument("checkpoint")
    p.add_argument("--out", default="figures")
    p.add_argument("--r-cuts", type=float, nargs="*", default=[1.0, 2.0])
    p.add_argument("--forces", action="store_true")
    p.add_argument("--history", help="history.pkl for the loss figure")
    p.add_argument("--paper-set", action="store_true", dest="paper_set",
                   help="emit the reference's exact named figure set "
                        "(fig2/3/4.pdf, fig_R1/2/3.pdf, loss_figure.pdf, "
                        "energy.png, R{1,2}{,e}.png)")
    p.add_argument("--n-test", type=int, default=80, dest="n_test")
    p.add_argument("--grid", default="spheroidal",
                   choices=["uniform", "adapted", "spheroidal"])
    p.add_argument("--hf-points", type=int, default=9, dest="hf_points",
                   help="Hellmann-Feynman sample count in the force panel")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("distill",
                       help="fit E(R) head to the Rayleigh quotient of psi")
    _add_common(p)
    p.add_argument("checkpoint")
    p.add_argument("--out", default="runs/distill/distilled.npz")
    p.add_argument("--n-test", type=int, default=80, dest="n_test")
    p.add_argument("--steps", type=int, default=5000)
    p.set_defaults(fn=cmd_distill)

    p = sub.add_parser("variational",
                       help="Rayleigh-quotient (variational) refinement")
    _add_common(p, train=True)
    p.add_argument("checkpoint", nargs="?",
                   help="warm-start checkpoint (recommended)")
    p.add_argument("--out", default="runs/variational")
    p.add_argument("--n-r", type=int, default=32, dest="n_r")
    p.add_argument("--n-pts", type=int, default=32768, dest="n_pts")
    p.add_argument("--lbfgs", type=int, default=0,
                   help="run N full-batch L-BFGS polish steps instead of Adam")
    p.add_argument("--antithetic", action="store_true",
                   help="pair every sample with its inversion image "
                        "(exact odd-error cancellation in the quotient)")
    p.add_argument("--stratified-r", action="store_true", dest="stratified_r",
                   help="one R draw per stratum of the R range per step")
    p.add_argument("--spheroidal", action="store_true",
                   help="DETERMINISTIC objective: exact per-R Rayleigh "
                        "quotients on prolate-spheroidal Gauss grids "
                        "(noise-free; requires --lbfgs)")
    p.add_argument("--n-xi", type=int, default=48, dest="n_xi")
    p.add_argument("--n-eta", type=int, default=48, dest="n_eta")
    p.add_argument("--adam-warmup", type=int, default=0, dest="adam_warmup",
                   help="deterministic-Adam steps before the L-BFGS polish "
                        "(1 eval/step vs ~15 for cold L-BFGS linesearch)")
    p.add_argument("--lbfgs-memory", type=int, default=15,
                   dest="lbfgs_memory",
                   help="L-BFGS curvature-memory size (the stiff excited "
                        "node-factor families benefit from 30-50)")
    p.add_argument("--xi-node", action="store_true", dest="xi_node",
                   help="trainable radial node factor (xi - xi0(R)) on the "
                        "separable ansatz — radially excited states "
                        "(2s sigma_g / 3p sigma_u)")
    p.add_argument("--xi-node2", action="store_true", dest="xi_node2",
                   help="second radial node factor (implies --xi-node) — "
                        "doubly radially excited states (3s sigma_g)")
    p.add_argument("--eta-node", action="store_true", dest="eta_node",
                   help="trainable angular node factor (eta^2 - eta0^2(R)) "
                        "on the separable ansatz — angularly excited sigma "
                        "states (3d sigma_g)")
    p.add_argument("--deflate", metavar="CKPT", action="append",
                   help="frozen reference-state checkpoint (same symmetry "
                        "sector): minimise the DEFLATED quotient — the "
                        "quotient of psi's component orthogonal to it — "
                        "targeting the sector's next state up. Repeat to "
                        "deflate k states and target the (k+1)-th "
                        "(e.g. 1ssg + 2ssg -> 3d sigma_g). Requires "
                        "--spheroidal")
    p.add_argument("--target-state", dest="target_state",
                   help="record THIS oracle state in the checkpoint meta "
                        "instead of the sector inference 'k references -> "
                        "(k+1)-th state'. Needed where same-sector curve "
                        "crossings break the counting rule (the n=4 "
                        "sigma_u pair: re-polishing 4psu against "
                        "{2psu,3psu,4fsu} is k=3 but targets the THIRD "
                        "radial state, not the branch-1 4fsu)")
    p.set_defaults(fn=cmd_variational)

    p = sub.add_parser("evaluate",
                       help="distill + adapted-grid surface + error report")
    _add_common(p)
    p.add_argument("checkpoint")
    p.add_argument("--out")
    p.add_argument("--n-test", type=int, default=80, dest="n_test")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--oracle", default="ode", choices=["wind", "ode"],
                   help="error ruler (default: the exact ODE solver — the "
                        "honest ruler for sub-0.1 mHa claims)")
    p.add_argument("--table-knots", type=int, default=153, dest="table_knots",
                   help="knot count for the exported spline E(R) table "
                        "(per-R spheroidal Rayleigh quotients; bypasses the "
                        "MLP head's fit floor; 0 disables)")
    p.add_argument("--contam-vs", metavar="CKPT", action="append",
                   dest="contam_vs",
                   help="report the norm fraction of psi inside the span of "
                        "these frozen lower-state checkpoints (excited-state "
                        "certificate; repeatable)")
    from .analysis.exact import STATES as _ORACLE_STATES
    p.add_argument("--target-state", dest="target_state",
                   choices=list(_ORACLE_STATES),
                   help="exact-oracle state to score against (default: "
                        "inferred from --state: gerade -> 1ssg, ungerade -> "
                        "2psu; deflation-trained excited checkpoints score "
                        "against 2ssg / 3psu). Choices come from the "
                        "oracle's own index (analysis.exact.STATES) so new "
                        "sectors are scoreable the day they enter the "
                        "oracle — a hand-kept list went stale at 4fpiu")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("sweep", help="per-R multi-model family (legacy mode)")
    _add_common(p, train=True)
    p.add_argument("--r-values", type=float, nargs="*", dest="r_values")
    p.add_argument("--r-step", type=float, default=0.5, dest="r_step")
    p.add_argument("--out", default="runs/sweep/energy_sweep.pkl")
    p.add_argument("--polish", type=int, default=0,
                   help="per-R DETERMINISTIC spheroidal L-BFGS polish with "
                        "this many steps instead of residual training "
                        "(exact per-R family optima)")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("export", help="convert checkpoint formats")
    p.add_argument("input", help=".npz | .pt | .bin")
    p.add_argument("output", help=".npz | .bin | .pt")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("vibrations",
                       help="nuclear vibrational/rotational levels on the "
                            "tabulated E(R) surface (BO spectroscopy)")
    p.add_argument("checkpoint", nargs="?",
                   help="evaluated .npz artifact carrying an e_table")
    p.add_argument("--oracle", metavar="STATE",
                   help="use the exact ODE oracle's curve instead "
                        "(e.g. 1ssg) — the exact-BO ruler")
    p.add_argument("--n-levels", type=int, default=4, dest="n_levels")
    p.add_argument("--j", type=int, default=0,
                   help="rotational quantum number J")
    p.add_argument("--j-max", type=int, default=None, dest="j_max",
                   help="emit the full E(v<=n_levels-1, J<=j_max) "
                        "rovibrational grid (band origins, B_v, D0) "
                        "instead of one J ladder")
    p.add_argument("--out", dest="vib_out",
                   help="with --j-max: also write the grid as JSON here")
    p.add_argument("--state", dest="vib_state",
                   help="electronic state label for the dissociation "
                        "asymptote (default: the artifact's target_state "
                        "meta / the --oracle state; excited curves "
                        "dissociate to H(n>=2))")
    p.add_argument("--r-lo", type=float, default=0.2, dest="r_lo",
                   help="oracle-table R domain lower edge (half distance)")
    p.add_argument("--r-hi", type=float, default=4.0, dest="r_hi",
                   help="oracle-table R domain upper edge — excited wells "
                        "sit near D ~ 8-18, extend past 4 for them")
    p.set_defaults(fn=cmd_vibrations)

    p = sub.add_parser("bench", help="throughput microbenchmark")
    p.add_argument("--n", type=int)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    if getattr(args, "dtype", None) == "float64":
        import jax
        jax.config.update("jax_enable_x64", True)
    args.fn(args)


if __name__ == "__main__":
    main()
