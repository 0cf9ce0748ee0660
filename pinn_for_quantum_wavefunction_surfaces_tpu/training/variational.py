"""Variational (Rayleigh-quotient) training: minimise <psi|H|psi>/<psi|psi>.

A capability beyond the reference, motivated by a round-1 finding: the
PDE-residual loss |(H - E)psi|^2 with a FREE eigenvalue head has its global
minimum away from the physical ground state (amplitude collapse under the
plain loss; eigenstate drift toward diffuse box states under normalised
losses — strong optimisers like L-BFGS reduce the loss 1000x while energies
degrade by hundreds of mHa). The Rayleigh quotient has neither mode: it is
bounded below BY the ground-state energy within the symmetry class, E is not
a free parameter, and amplitude cancels exactly.

Design:
- each step draws ``n_r`` half-distances R and, per R, ``n_pts`` importance
  samples with EXACT mixture density (ops.sampling.sample_importance), so the
  per-R quotient  E_r = sum(w psi H psi) / sum(w psi^2)  is a low-variance
  unbiased-ratio estimate over R^3;
- loss = mean_R E_r  (each R's quotient is independently minimised at its
  ground state) + an MSE term distilling the E(R) head onto stop-grad(E_r),
  so the head trains alongside psi for free;
- psi and lap psi come from the same fused forward-Laplacian pass as the
  residual path; the whole step is one jit/scan like the residual engine.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import ansatz
from ..ops import operators
from ..ops.sampling import sample_importance
from . import engine, losses


class VBatch(NamedTuple):
    x: jax.Array   # (n_r, n_pts)
    y: jax.Array
    z: jax.Array
    w: jax.Array   # importance weights 1/q
    r: jax.Array   # (n_r,)


def sample_vbatch(key: jax.Array, cfg: Config, n_r: int, n_pts: int,
                  dtype=None, antithetic: bool = False,
                  stratified: bool = False) -> VBatch:
    """Draw the (R, points) batch for the quotient estimator.

    Variance reduction (both exact — they change no expectation):
    - ``stratified``: the n_r half-distances come one-per-stratum of the R
      range instead of iid uniform — every step sees the whole surface.
    - ``antithetic``: the shell component's radial draws come in
      negatively-correlated Gamma(3) pairs (ops.sampling.sample_importance;
      inversion pairing would be a no-op — the symmetrised ansatz makes the
      integrands exactly inversion-even).
    """
    kr, kp = jax.random.split(key)
    dtype = jnp.dtype(cfg.dtype) if dtype is None else jnp.dtype(dtype)
    dom = cfg.domain
    if dom.fixed_r is not None:
        r = jnp.full((n_r,), dom.fixed_r, dtype)
    elif stratified:
        u = jax.random.uniform(kr, (n_r,), dtype)
        edges = (jnp.arange(n_r, dtype=dtype) + u) / n_r
        r = dom.r_lo + (dom.r_hi - dom.r_lo) * edges
    else:
        r = jax.random.uniform(kr, (n_r,), dtype, dom.r_lo, dom.r_hi)
    keys = jax.random.split(kp, n_r)
    x, y, z, w = jax.vmap(
        lambda k, ri: sample_importance(k, cfg, ri, n_pts, dtype,
                                        antithetic=antithetic))(keys, r)
    return VBatch(x, y, z, w, r)


def quotient_loss(params: dict, cfg: Config, vb: VBatch,
                  head_weight: float = 1.0):
    """(loss, aux): mean Rayleigh quotient over the R draw + head MSE."""
    n_r, n_pts = vb.x.shape
    rr = jnp.broadcast_to(vb.r[:, None], (n_r, n_pts)).reshape(-1)
    if cfg.train.kernel == "pallas" and "lam1" in params \
            and losses._pallas_or_fallback(params, cfg.model):
        # fused separable training kernel on the quotient hot path too, so
        # the flagship (variational) recipe can run through it; uncovered
        # families (m_abs, node factors) warn + fall to the XLA path via
        # the shared guard in losses.py
        from ..ops.pallas_separable import psi_lap_train_separable
        psi_f, lap_f, _ = psi_lap_train_separable(
            params, cfg.model, vb.x.reshape(-1), vb.y.reshape(-1),
            vb.z.reshape(-1), rr, interpret=jax.default_backend() == "cpu")
        psi = psi_f.reshape(n_r, n_pts)
        lap = lap_f.reshape(n_r, n_pts)
    else:
        s, _ = ansatz.psi_fwdlap(params, cfg.model, vb.x.reshape(-1),
                                 vb.y.reshape(-1), vb.z.reshape(-1), rr)
        psi = s.v[..., 0].reshape(n_r, n_pts)
        lap = s.l[..., 0].reshape(n_r, n_pts)
    v = operators.potential(cfg.model, vb.x, vb.y, vb.z,
                            vb.r[:, None])
    hpsi = -0.5 * lap + v * psi
    num = jnp.sum(vb.w * psi * hpsi, axis=1)
    den = jnp.sum(vb.w * psi * psi, axis=1)
    e_r = num / den
    e_head = ansatz.energy(params, vb.r)
    l_head = jnp.mean((e_head - jax.lax.stop_gradient(e_r)) ** 2)
    loss = jnp.mean(e_r) + head_weight * l_head
    return loss, {"e_mean": jnp.mean(e_r), "l_head": l_head,
                  "e_r": e_r}


# Weight on the span{phi_i}-contamination term of the deflated loss, in Ha
# per unit norm fraction. Must exceed the largest spectral gap
# E_target - E_1 on the surface (gerade 1ssg->2ssg at R = 0.2 is ~1.44 Ha;
# margin on top): near zero contamination BOTH the energy gain from mixing
# in a lower state and the penalty are LINEAR in the contamination, so for
# W > gap the penalty dominates and the optimum sits at EXACTLY zero
# contamination — no bias, no trade-off.
OVERLAP_PENALTY = 4.0


def quotient_loss_deflated(params: dict, cfg: Config, vb: VBatch,
                           psi0: jax.Array, hpsi0: jax.Array,
                           head_weight: float = 1.0):
    """(loss, aux): PENALTY-DEFLATED Rayleigh quotient per R row —
    plain quotient + OVERLAP_PENALTY * contamination, targeting the lowest
    state of the sector ORTHOGONAL to the frozen references phi_i
    (capability beyond the reference, which has no excited-state machinery
    at all beyond the P = -1 sector choice):

        q_r     = <psi H psi> / <psi psi>
        contam  = sum_i <psi, phi_i>^2 / (<phi_i phi_i> <psi psi>)
        loss    = mean(q_r) + W * mean(contam) + head term

    Near contam = 0 both the energy gain from mixing a lower state into
    psi and the penalty are LINEAR in contam, so for W > E_target - E_1
    the optimum has EXACTLY zero contamination and value E_target — no
    bias, no trade-off (with the µHa-accurate frozen references the
    residual bias is O(|phi - exact|^2) ~ 1e-12 Ha).

    Two rejected designs, both field-tested to failure:

    1. PROJECTION-ONLY deflation (the textbook min over psi perp phi):
       invariant to span{phi_i} components, so psi drifted to mostly
       ground state on a 39-R surface (plain quotient 660 mHa below the
       excited oracle) while the projected objective looked converged.
    2. Projected quotient PLUS mean-contamination penalty: the projected
       quotient divides by the PERP norm, so a single near-collapsed row
       is ill-conditioned — quadrature noise amplifies without bound and
       e_row can sink arbitrarily far below the spectrum, out-earning any
       linear penalty (observed with L-BFGS memory 50: E_obj dove 70 mHa
       below the exact mean in one linesearch jump, E_int garbage). The
       plain quotient here is floored at ~E_1 on any grid (same gaming
       guards as the ground-state objective: bounded log-correction,
       dual grids, best-iterate), and the penalty term has no division by
       a vanishing quantity — the runaway basin does not exist.

    psi0, hpsi0: (n_rows, n_pts) — or (k, n_rows, n_pts) for k reference
    states — the frozen reference(s) on the SAME quadrature rows as ``vb``
    (zero-weight padding points contribute nothing; multiple references
    must be row-orthogonalised, which reference_states_on_batch does —
    the contamination sum assumes an orthogonal stack). hpsi0 is accepted
    for API stability (the projection variant needed it) but unused.
    """
    del hpsi0
    n_r, n_pts = vb.x.shape
    rr = jnp.broadcast_to(vb.r[:, None], (n_r, n_pts)).reshape(-1)
    s, _ = ansatz.psi_fwdlap(params, cfg.model, vb.x.reshape(-1),
                             vb.y.reshape(-1), vb.z.reshape(-1), rr)
    psi = s.v[..., 0].reshape(n_r, n_pts)
    lap = s.l[..., 0].reshape(n_r, n_pts)
    v = operators.potential(cfg.model, vb.x, vb.y, vb.z, vb.r[:, None])
    hpsi = -0.5 * lap + v * psi
    if psi0.ndim == 2:
        psi0 = psi0[None]                         # (k=1, rows, pts)
    w = vb.w
    n_ = jnp.sum(w * psi * psi, axis=1)
    s_ = jnp.sum(w * psi * hpsi, axis=1)
    o = jnp.sum(w * psi * psi0, axis=2)           # (k, rows) <psi, phi_i>
    n0 = jnp.sum(w * psi0 * psi0, axis=2)         # (k, rows)
    q_r = s_ / n_
    contam = jnp.sum(o * o / n0, axis=0) / n_     # (rows,) in [0, 1]
    e_head = ansatz.energy(params, vb.r)
    l_head = jnp.mean((e_head - jax.lax.stop_gradient(q_r)) ** 2)
    loss = (jnp.mean(q_r) + head_weight * l_head
            + OVERLAP_PENALTY * jnp.mean(contam))
    return loss, {"e_mean": jnp.mean(q_r), "l_head": l_head, "e_r": q_r,
                  "perp_frac": jnp.min(1.0 - contam),
                  "contam": jnp.max(contam)}


def reference_state_on_batch(params0: dict, cfg: Config,
                             vb: VBatch) -> tuple[jax.Array, jax.Array]:
    """(psi0, hpsi0) of a frozen reference state on the batch's quadrature
    rows — the constant inputs of quotient_loss_deflated. Dispatch is
    params-keyed (ansatz.psi_fwdlap), so params0 may be any architecture of
    the same symmetry sector (e.g. the separable ground-state flagship
    deflating a xi_node excited run)."""
    n_r, n_pts = vb.x.shape
    rr = jnp.broadcast_to(vb.r[:, None], (n_r, n_pts)).reshape(-1)
    s, _ = ansatz.psi_fwdlap(params0, cfg.model, vb.x.reshape(-1),
                             vb.y.reshape(-1), vb.z.reshape(-1), rr)
    psi0 = s.v[..., 0].reshape(n_r, n_pts)
    lap0 = s.l[..., 0].reshape(n_r, n_pts)
    v = operators.potential(cfg.model, vb.x, vb.y, vb.z, vb.r[:, None])
    hpsi0 = -0.5 * lap0 + v * psi0
    return (jax.lax.stop_gradient(psi0), jax.lax.stop_gradient(hpsi0))


def reference_states_on_batch(params_list, cfg: Config,
                              vb: VBatch) -> tuple[jax.Array, jax.Array]:
    """Stacked (k, rows, pts) reference states, ROW-ORTHOGONALISED by
    Gram-Schmidt in the quadrature inner product (H phi follows by
    linearity), so quotient_loss_deflated's denominator has no cross
    terms. Targets the (k+1)-th state of the sector — e.g. 3d sigma_g by
    deflating against both the 1s sigma_g and 2s sigma_g artifacts."""
    ps, hs = zip(*(reference_state_on_batch(p, cfg, vb)
                   for p in params_list))
    ps, hs = list(ps), list(hs)
    for i in range(1, len(ps)):
        for j in range(i):
            coef = (jnp.sum(vb.w * ps[i] * ps[j], axis=1)
                    / jnp.sum(vb.w * ps[j] * ps[j], axis=1))[:, None]
            ps[i] = ps[i] - coef * ps[j]
            hs[i] = hs[i] - coef * hs[j]
    return jnp.stack(ps), jnp.stack(hs)


def contamination_curve(params: dict, refs, cfg: Config, r_values,
                        n_xi: int = 64, n_eta: int = 64) -> np.ndarray:
    """Per-R norm fraction of psi inside span{refs} — the excited-state
    certificate that the overlap penalty actually worked (computed on an
    INDEPENDENT finer quadrature grid than training's, like cli evaluate's
    energy scoring). refs: list of frozen parameter pytrees."""
    vb = spheroidal_vbatch(cfg, n_xi=n_xi, n_eta=n_eta,
                           r_values=np.asarray(r_values, np.float64))
    ps, _ = reference_states_on_batch(refs, cfg, vb)
    n_r, n_pts = vb.x.shape
    rr = jnp.broadcast_to(vb.r[:, None], (n_r, n_pts)).reshape(-1)
    psi, _ = ansatz.psi(params, cfg.model, vb.x.reshape(-1),
                        vb.y.reshape(-1), vb.z.reshape(-1), rr)
    psi = psi.reshape(n_r, n_pts)
    n_ = jnp.sum(vb.w * psi * psi, axis=1)
    o = jnp.sum(vb.w * psi * ps, axis=2)
    n0 = jnp.sum(vb.w * ps * ps, axis=2)
    return np.asarray(jnp.sum(o * o / n0, axis=0) / n_)


def spheroidal_vbatch(cfg: Config, n_r: int = 77, n_xi: int = 48,
                      n_eta: int = 48, xi_span: float | None = None,
                      dtype=None, r_values=None) -> VBatch:
    """DETERMINISTIC quadrature batch: per-R prolate-spheroidal Gauss grids.

    Same construction as analysis.energy.rayleigh_quotient_spheroidal (the
    machine-precision evaluation grid), stacked over a linspace of
    half-distances. With these (nodes, weights) in a VBatch, quotient_loss
    computes the EXACT per-R Rayleigh quotients — no Monte-Carlo noise at
    all — so strong optimisers converge to the ansatz family's true
    variational optimum instead of the MC noise floor. Sigma symmetry makes
    the azimuthal integral analytic (the ansatz depends on (r1, r2, R)
    only), so n_xi x n_eta 2-D grids suffice.
    """
    from ..analysis.energy import spheroidal_grid

    if cfg.model.ry or cfg.model.rz:
        raise NotImplementedError(
            "spheroidal quadrature assumes the nuclei on the x-axis")
    dtype = jnp.dtype(cfg.dtype) if dtype is None else jnp.dtype(dtype)
    if xi_span is None:
        xi_span = getattr(cfg.domain, "xi_span", 20.0)
    dom = cfg.domain
    if r_values is None:
        if dom.fixed_r is not None:
            # one row suffices — duplicating the identical grid n_r times
            # would multiply every optimisation step's cost for nothing
            r_values = np.asarray([dom.fixed_r])
        elif getattr(dom, "r_cluster", "uniform") == "log":
            # log(R + 0.3)-clustered rows (the etab knot layout): denser
            # AND higher-weighted toward the united-atom end, where the
            # surface curvature ~(R + 0.3)^-5 concentrates the error
            t = np.linspace(np.log(dom.r_lo + 0.3),
                            np.log(dom.r_hi + 0.3), n_r)
            r_values = np.exp(t) - 0.3
            r_values[0], r_values[-1] = dom.r_lo, dom.r_hi
        else:
            r_values = np.linspace(dom.r_lo, dom.r_hi, n_r)
    r_values = np.asarray(r_values, float)
    xs, ys, ws = [], [], []
    for c in r_values:
        x1, rho1, w1 = spheroidal_grid(float(c), n_xi, n_eta, xi_span)
        xs.append(x1)
        ys.append(rho1)
        ws.append(w1)
    x = jnp.asarray(np.stack(xs), dtype)
    y = jnp.asarray(np.stack(ys), dtype)
    return VBatch(x, y, jnp.zeros_like(x), jnp.asarray(np.stack(ws), dtype),
                  jnp.asarray(r_values, dtype))


def _lbfgs_minimize(params: dict, cfg: Config, vb: VBatch, steps: int,
                    head_weight: float, log_cb=None,
                    loss_fn=None, memory_size: int = 15,
                    val_fn=None, restart_margin: float = 1e-3,
                    best_save: Optional[str] = None) -> dict:
    """Shared L-BFGS driver on ``loss_fn`` (default quotient_loss) over a
    fixed batch.

    Returns the BEST iterate, not the last: late L-BFGS steps can blow up
    (observed in f32: a final linesearch overshoot erased 4000 steps of
    descent), and on a deterministic objective the lowest value IS the best
    model — the train.py best-snapshot policy (reference train.py:58-60)
    applied to the polish.

    ``val_fn`` (params -> scalar): when given, the best iterate is selected
    by this INDEPENDENT-grid value instead of the training objective.
    Rationale (field-tested on the 3p sigma_u node-factor run): a stiff
    excited family found spike modes underpriced by BOTH training grids —
    the train objective jumped 15 mHa below the exact spectrum and kept the
    gamed iterate as "best". Gaming a quadrature does not transfer to an
    unseen third grid, so validation-tracked selection keeps only honest
    progress (the standard early-stopping argument, applied per iterate).

    ``restart_margin`` (with val_fn): when the validation value drifts this
    far (Ha) ABOVE the running best, the optimiser has left the honest
    basin (observed: a gamed linesearch jump sent val +27 mHa in 25 steps
    and L-BFGS then oscillated uselessly for hundreds of steps — its
    curvature memory was poisoned). Restart from the best iterate with a
    FRESH L-BFGS state: selection alone only caps the damage, the restart
    converts the remaining budget back into honest descent.

    ``best_save``: checkpoint the running best to this path every 100 steps
    (polish runs are hours on this host — a crash should not lose them)."""
    loss_fn = quotient_loss if loss_fn is None else loss_fn

    def f(p):
        return loss_fn(p, cfg, vb, head_weight)[0]

    # memory_size: optax default 15 suits the ground-state family; the
    # excited (node-factor) families are stiffer — larger curvature memory
    # measurably accelerates their slow large-R tail
    opt = optax.lbfgs(memory_size=memory_size)
    state = opt.init(params)
    value_and_grad = optax.value_and_grad_from_state(f)

    @jax.jit
    def step(p, state, best_p, best_v):
        value, grad = value_and_grad(p, state=state)
        better = value < best_v
        best_p = jax.tree.map(
            lambda b, c: jnp.where(better, c, b), best_p, p)
        best_v = jnp.where(better, value, best_v)
        updates, state = opt.update(grad, state, p, value=value, grad=grad,
                                    value_fn=f)
        return optax.apply_updates(p, updates), state, value, best_p, best_v

    if val_fn is not None:
        val_fn = jax.jit(val_fn)

    def _save_best(best_p):
        if best_save is not None:
            from ..io import checkpoint
            checkpoint.save(best_save, {"params": best_p},
                            meta={"polish": "best-so-far"})

    best_p, best_v = params, jnp.asarray(jnp.inf, jnp.dtype(cfg.dtype))
    n_restarts = 0
    for i in range(steps):
        if val_fn is not None:
            # selection on the validation value of the CURRENT iterate
            # (before the update), so the returned params are exactly the
            # iterate that scored best_v
            v = float(val_fn(params))
            if v < float(best_v):
                best_p = jax.tree.map(np.asarray, params)
                best_v = jnp.asarray(v, best_v.dtype)
            elif (np.isfinite(float(best_v))
                  and v > float(best_v) + restart_margin):
                # gamed basin: drop the poisoned curvature memory and
                # resume honest descent from the best-known iterate
                params = jax.tree.map(jnp.asarray, best_p)
                state = opt.init(params)
                n_restarts += 1
                v = float(best_v)
            params, state, value, _, _ = step(params, state, params,
                                              jnp.asarray(-jnp.inf,
                                                          best_v.dtype))
            if log_cb is not None and i % 25 == 0:
                log_cb(i, {"E_obj": float(value), "E_val": v,
                           "E_best": float(best_v),
                           "restarts": n_restarts})
        else:
            params, state, value, best_p, best_v = step(params, state,
                                                        best_p, best_v)
            if log_cb is not None and i % 25 == 0:
                log_cb(i, {"E_obj": float(value), "E_best": float(best_v)})
        if best_save is not None and i % 100 == 99:
            _save_best(jax.tree.map(np.asarray, best_p))
    # the loop scores iterates 0..steps-1; score the final iterate too (a
    # monotone descent's best point is the one the loop never saw)
    if steps:
        v = float(val_fn(params) if val_fn is not None
                  else jax.jit(f)(params))
        if v < float(best_v):
            best_p = jax.tree.map(np.asarray, params)
    return jax.tree.map(np.asarray, best_p)


def polish_lbfgs(params: dict, cfg: Config, n_r: int = 64,
                 n_pts: int = 32768, steps: int = 300,
                 key: Optional[jax.Array] = None,
                 head_weight: float = 1.0, log_cb=None) -> dict:
    """Full-batch L-BFGS on the variational objective.

    The round-1 experiments showed L-BFGS on the PDE-residual loss finds its
    unphysical global minima 1000x faster than Adam — but the Rayleigh
    quotient is bounded below by the ground state, so strong optimisation is
    SAFE here. A fixed importance-sampled batch (n_r half-distances spread
    evenly over the R range x n_pts weighted points) makes the objective
    deterministic; with ~2k parameters against millions of sample points the
    finite-sample minimum tracks the true functional.
    """
    key = jax.random.PRNGKey(cfg.train.seed + 7) if key is None else key
    dtype = jnp.dtype(cfg.dtype)
    if params is None:
        params = ansatz.init_params(jax.random.PRNGKey(cfg.train.seed),
                                    cfg.model, dtype)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    dom = cfg.domain
    r = jnp.linspace(dom.r_lo, dom.r_hi, n_r, dtype=dtype)
    keys = jax.random.split(key, n_r)
    x, y, z, w = jax.vmap(
        lambda k, ri: sample_importance(k, cfg, ri, n_pts, dtype))(keys, r)
    vb = VBatch(x, y, z, w, r)
    return _lbfgs_minimize(params, cfg, vb, steps, head_weight, log_cb)


def _adam_minimize(params: dict, cfg: Config, vb: VBatch, steps: int,
                   head_weight: float, lr: float = 3e-3,
                   chunk: int = 100, log_cb=None, loss_fn=None) -> dict:
    """Deterministic-Adam warmup on ``loss_fn`` (default quotient_loss)
    over a fixed batch.

    One gradient evaluation per step (vs L-BFGS's ~15 linesearch evals per
    step far from the optimum), scan-chunked so remote dispatch amortises.
    Hands over to L-BFGS near the basin, where its linesearch is cheap."""
    loss_fn = quotient_loss if loss_fn is None else loss_fn
    sched = optax.exponential_decay(lr, transition_steps=max(steps // 4, 1),
                                    decay_rate=0.5, staircase=True)
    opt = optax.adam(sched)

    def step(carry, _):
        p, st = carry
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, cfg, vb, head_weight)
        updates, st = opt.update(g, st, p)
        return (optax.apply_updates(p, updates), st), l

    @functools.partial(jax.jit, static_argnums=1)
    def run_chunk(carry, k):
        return jax.lax.scan(step, carry, None, length=k)

    carry = (params, opt.init(params))
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        carry, ls = run_chunk(carry, k)
        done += k
        if log_cb is not None:
            log_cb(done, {"E_adam": float(ls[-1])})
    return carry[0]


def _coprime_size(n: int, offset: int) -> int:
    """Smallest m >= n + offset with gcd(n, m) == 1.

    The dual-grid objective's anti-aliasing argument needs the two grids'
    node sets to share no common sub-lattice; a fixed offset alone does not
    guarantee that (n=17 -> 34 shares every node family), so the second size
    is bumped to true coprimality. For the defaults (48 -> 65, 48 -> 61)
    this is the identity."""
    import math
    m = n + offset
    while math.gcd(n, m) != 1:
        m += 1
    return m


def polish_spheroidal(params: dict, cfg: Config, n_r: int = 77,
                      n_xi: int = 48, n_eta: int = 48, steps: int = 400,
                      xi_span: float | None = None, head_weight: float = 1.0,
                      dual_grid: bool = True, adam_steps: int = 0,
                      warmup_save: Optional[str] = None,
                      mesh=None, log_cb=None,
                      deflate_params: Optional[dict] = None,
                      memory_size: int = 15,
                      val_grid: bool = True,
                      best_save: Optional[str] = None) -> dict:
    """L-BFGS on the EXACT (quadrature) variational objective.

    Replaces the MC estimator entirely: each step sees the true Rayleigh
    quotient of every R on a machine-precision spheroidal grid, so the only
    remaining error at convergence is the ansatz family's variational gap —
    the MC noise floor that limited round 1 (CLAUDE.md) is gone. The per-R
    quotients are independently bounded below by the exact eigenvalues, so
    (unlike the residual loss) aggressive optimisation cannot find an
    unphysical minimum — of the CONTINUOUS functional. A fixed grid has one
    loophole: spike modes between the nodes that the quadrature cannot see
    (observed once, see models/ansatz.LOG_CORR_CAP). ``dual_grid`` closes
    it: the objective averages quotients over TWO coprime-sized grids per R,
    and a spike invisible to one grid is seen (and priced) by the other.

    ``deflate_params``: frozen reference-state params (same symmetry
    sector) — switches the objective to quotient_loss_deflated, targeting
    the SECOND state of the sector (2s sigma_g / 3p sigma_u with a xi_node
    ansatz).

    ``val_grid``: best-iterate selection on a THIRD, unseen grid (sizes
    coprime to both training grids) instead of the training objective —
    see _lbfgs_minimize. On by default: it costs one forward pass per
    L-BFGS step and removes the last quadrature-gaming channel (an iterate
    that games both training grids still cannot be SELECTED).
    """
    dtype = jnp.dtype(cfg.dtype)
    if params is None:
        params = ansatz.init_params(jax.random.PRNGKey(cfg.train.seed),
                                    cfg.model, dtype)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    if mesh is not None and cfg.domain.fixed_r is None:
        # row-sharding needs the R-row count divisible by the mesh axis
        # (each of the dual grids contributes n_r rows) — round UP: a few
        # extra R values only densify the surface, never change its optimum
        d = mesh.size
        n_r = -(-n_r // d) * d
    if dtype == jnp.float32 and steps:
        import warnings
        warnings.warn(
            "f32 L-BFGS on the quotient objective diverges after ~1k steps "
            "(linesearch noise poisons the curvature memory — CLAUDE.md); "
            "best-iterate tracking limits the damage, but polish in f64 "
            "for production runs", stacklevel=2)
    vb = spheroidal_vbatch(cfg, n_r=n_r, n_xi=n_xi, n_eta=n_eta,
                           xi_span=xi_span, dtype=dtype)
    if dual_grid:
        vb2 = spheroidal_vbatch(cfg, n_r=n_r,
                                n_xi=_coprime_size(n_xi, 17),
                                n_eta=_coprime_size(n_eta, 13),
                                xi_span=xi_span, dtype=dtype)
        # ragged second grid: pad along the point axis is unnecessary —
        # keep the two batches separate R-rows by padding the SMALLER one
        # with zero-weight points (zero weights contribute nothing to
        # either sum of the quotient)
        pts1, pts2 = vb.x.shape[1], vb2.x.shape[1]
        pad = pts2 - pts1
        pz = lambda a: jnp.pad(a, ((0, 0), (0, pad)))
        # pad coordinates with 1s (not 0s: x=y=z=0 sits between the nuclei
        # where 1/r is finite, but keep clear of r=0 regardless)
        po = lambda a: jnp.pad(a, ((0, 0), (0, pad)), constant_values=1.0)
        vb = VBatch(jnp.concatenate([po(vb.x), vb2.x]),
                    jnp.concatenate([po(vb.y), vb2.y]),
                    jnp.concatenate([po(vb.z), vb2.z]),
                    jnp.concatenate([pz(vb.w), vb2.w]),
                    jnp.concatenate([vb.r, vb2.r]))
    loss_fn = None
    if deflate_params is not None:
        # excited-state mode: deflate against the frozen reference state(s)
        # (their (psi0, H psi0) rows are constants of the optimisation).
        # A dict is one reference; a list/tuple of dicts targets the
        # (k+1)-th state of the sector (row-orthogonalised stack).
        refs = (deflate_params if isinstance(deflate_params, (list, tuple))
                else [deflate_params])
        frozen = [jax.tree.map(lambda a: jnp.asarray(a, dtype), p)
                  for p in refs]
        psi0, hpsi0 = reference_states_on_batch(frozen, cfg, vb)
        psi0, hpsi0 = np.asarray(psi0), np.asarray(hpsi0)

        def loss_fn(p, cfg_, vb_, hw, _p0=psi0, _h0=hpsi0):
            return quotient_loss_deflated(p, cfg_, vb_,
                                          jnp.asarray(_p0, vb_.x.dtype),
                                          jnp.asarray(_h0, vb_.x.dtype), hw)
    if mesh is not None:
        # Multi-chip: the objective is a mean of per-R quotients — the R
        # axis is embarrassingly parallel (each row's (sum w psi H psi,
        # sum w psi^2) pair reduces within its shard; only the final
        # mean-over-R and the replicated-parameter gradient all-reduce
        # cross shards, and GSPMD inserts those). Shard every batch array
        # on axis 0 over the mesh's 'data' axis, replicate params.
        from jax.sharding import NamedSharding, PartitionSpec as Ps
        row = NamedSharding(mesh, Ps("data"))
        vb = VBatch(*(jax.device_put(a, row) for a in vb))
        params = jax.device_put(params, NamedSharding(mesh, Ps()))
        if deflate_params is not None:
            # stacked refs are (k, rows, pts): rows is axis 1
            ref_row = NamedSharding(mesh, Ps(None, "data"))
            p0_sh = jax.device_put(jnp.asarray(psi0, dtype), ref_row)
            h0_sh = jax.device_put(jnp.asarray(hpsi0, dtype), ref_row)

            def loss_fn(p, cfg_, vb_, hw, _p0=p0_sh, _h0=h0_sh):
                return quotient_loss_deflated(p, cfg_, vb_, _p0, _h0, hw)
    val_fn = None
    if val_grid and steps:
        # third, unseen grid for best-iterate selection: sizes coprime to
        # BOTH training grids, so a spike mode priced wrongly by the train
        # node sets cannot hide from selection too
        import math

        def _third(n: int, other: int, offset: int) -> int:
            m = n + offset
            while math.gcd(m, n) != 1 or math.gcd(m, other) != 1:
                m += 1
            return m

        oxi = _coprime_size(n_xi, 17) if dual_grid else n_xi
        oeta = _coprime_size(n_eta, 13) if dual_grid else n_eta
        vbv = spheroidal_vbatch(cfg, n_r=n_r, n_xi=_third(n_xi, oxi, 29),
                                n_eta=_third(n_eta, oeta, 23),
                                xi_span=xi_span, dtype=dtype)
        p0v = h0v = None
        if deflate_params is not None:
            p0v, h0v = reference_states_on_batch(frozen, cfg, vbv)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Ps
            vbv = VBatch(*(jax.device_put(a, NamedSharding(mesh, Ps("data")))
                           for a in vbv))
            if p0v is not None:
                rsh = NamedSharding(mesh, Ps(None, "data"))
                p0v = jax.device_put(p0v, rsh)
                h0v = jax.device_put(h0v, rsh)
        if deflate_params is not None:
            def val_fn(p, _vb=vbv, _p0=p0v, _h0=h0v):
                return quotient_loss_deflated(p, cfg, _vb, _p0, _h0,
                                              head_weight)[0]
        else:
            def val_fn(p, _vb=vbv):
                return quotient_loss(p, cfg, _vb, head_weight)[0]
    if adam_steps:
        params = _adam_minimize(params, cfg, vb, adam_steps, head_weight,
                                log_cb=log_cb, loss_fn=loss_fn)
        if warmup_save:
            # the L-BFGS phase compiles a much larger executable (zoom
            # linesearch while_loop) and has been seen OOM-killing a remote
            # compile server — don't let a late crash discard the warmup
            from ..io import checkpoint
            checkpoint.save(warmup_save,
                            {"params": jax.tree.map(np.asarray, params)},
                            meta={"polish": "spheroidal-adam-warmup"})
    return _lbfgs_minimize(params, cfg, vb, steps, head_weight, log_cb,
                           loss_fn=loss_fn, memory_size=memory_size,
                           val_fn=val_fn, best_save=best_save)


class VState(NamedTuple):
    step: jax.Array
    params: dict
    opt_state: optax.OptState
    ema_params: dict
    key: jax.Array


def train_variational(cfg: Config,
                      params: Optional[dict] = None,
                      n_r: int = 32, n_pts: int = 4096,
                      epochs: Optional[int] = None,
                      lr: Optional[float] = None,
                      ema_decay: float = 0.999,
                      key: Optional[jax.Array] = None,
                      antithetic: bool = False,
                      stratified: bool = False,
                      log_cb=None) -> engine.TrainResult:
    """Variational training loop (scan-chunked like the residual engine).

    Typically used as a REFINEMENT stage on a residual-pretrained checkpoint
    (the quotient's MC noise makes from-scratch runs slower to settle), but
    works standalone too."""
    t = cfg.train
    epochs = epochs or t.epochs
    lr_val = lr if lr is not None else t.lr
    if t.lr_schedule == "step":
        lr_val = optax.exponential_decay(lr_val, transition_steps=t.sc_step,
                                         decay_rate=t.sc_decay,
                                         staircase=True)
    optimizer = optax.adam(lr_val, b1=t.betas[0], b2=t.betas[1], eps=t.eps)
    key = jax.random.PRNGKey(t.seed) if key is None else key
    kp, kc = jax.random.split(key)
    dtype = jnp.dtype(cfg.dtype)
    if params is None:
        params = ansatz.init_params(kp, cfg.model, dtype)
    else:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    state = VState(jnp.zeros((), jnp.int32), params, optimizer.init(params),
                   params, kc)

    def step(state: VState, _):
        key, sub = jax.random.split(state.key)
        vb = sample_vbatch(sub, cfg, n_r, n_pts, antithetic=antithetic,
                           stratified=stratified)
        (l, aux), grads = jax.value_and_grad(quotient_loss, has_aux=True)(
            state.params, cfg, vb)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                           state.ema_params, new_params)
        return (VState(state.step + 1, new_params, opt_state, ema, key),
                (l, aux["e_mean"], aux["l_head"]))

    def chunk(state, k):
        return jax.lax.scan(step, state, None, length=k)

    chunk = jax.jit(chunk, static_argnums=1)
    hist_l, hist_e, hist_h = [], [], []
    n_done = 0
    t0 = time.perf_counter()
    while n_done < epochs:
        k = min(t.scan_chunk, epochs - n_done)
        state, (ls, es, lh) = chunk(state, k)
        n_done += k
        hist_l.append(np.asarray(ls))
        hist_e.append(np.asarray(es))
        hist_h.append(np.asarray(lh))
        if log_cb is not None:
            log_cb(n_done, {"E_mean": float(es[-1]), "l_head": float(lh[-1])})
    runtime = time.perf_counter() - t0
    # reference pickle schema keys (utils/metrics.py): Ltot is the full
    # objective; the variational loss has no pde/bc split, so Lpde carries
    # the QUOTIENT part (objective minus the E-head MSE term) and Lbc the
    # head-fit term — two genuinely distinct, informative series
    l_tot = np.concatenate(hist_l)
    l_head = np.concatenate(hist_h)
    history = {"Ltot": l_tot,
               "Lpde": l_tot - l_head,
               "Lbc": l_head,
               "Energy": np.concatenate(hist_e)}
    return engine.TrainResult(
        state=state,
        params=jax.tree.map(np.asarray, state.params),
        best_params=jax.tree.map(np.asarray, state.params),
        best_loss=float(history["Ltot"][-1]),
        history=history,
        runtime_s=runtime,
        points_per_sec=epochs * n_r * n_pts / runtime,
        ema_params=jax.tree.map(np.asarray, state.ema_params),
    )
