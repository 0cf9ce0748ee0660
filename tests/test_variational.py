"""Variational (Rayleigh-quotient) training mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.sampling import \
    sample_importance
from pinn_for_quantum_wavefunction_surfaces_tpu.training import variational


def test_importance_weights_integrate_known_function():
    """sum(w f)/n estimates integral over R^3: check with a Gaussian."""
    cfg = pqs.Config(dtype="float64")
    x, y, z, w = sample_importance(jax.random.PRNGKey(0), cfg, 1.0, 200_000,
                                   dtype=jnp.float64)
    f = jnp.exp(-(x ** 2 + y ** 2 + z ** 2) / 4.0)  # integral (4 pi)^{3/2}? no:
    exact = (4.0 * np.pi) ** 1.5 / (2.0 ** 1.5)     # (pi*4)^{3/2}: int e^{-r^2/4} = (4pi)^{3/2}/2^{3/2}... use numeric identity
    exact = (np.pi * 4.0) ** 1.5 / (2.0 ** 1.5)
    # int_{R^3} exp(-|p|^2/(2 s^2)) = (2 pi s^2)^{3/2}, s^2 = 2
    exact = (2.0 * np.pi * 2.0) ** 1.5
    got = float(jnp.sum(w * f) / len(w))
    np.testing.assert_allclose(got, exact, rtol=0.03)


def test_quotient_matches_quadrature():
    """With psi == LCAO (gate zeroed) the MC quotient must match the
    adapted-grid quadrature within MC noise."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    params["gate2"]["w"] = jnp.zeros_like(params["gate2"]["w"])
    params["gate2"]["b"] = jnp.zeros_like(params["gate2"]["b"])
    ri = 2.0
    cfgr = dataclasses.replace(
        cfg, domain=dataclasses.replace(cfg.domain, fixed_r=ri))
    vb = variational.sample_vbatch(jax.random.PRNGKey(1), cfgr, 2, 50_000)
    _, aux = variational.quotient_loss(params, cfgr, vb)
    quad = aen.rayleigh_quotient_adapted(params, cfg, ri, n=100,
                                         which="lcao")
    np.testing.assert_allclose(np.asarray(aux["e_r"]), quad, rtol=5e-3)


def test_lbfgs_polish_runs_and_descends():
    cfg = pqs.smoke_config(dtype="float64")
    cfg = dataclasses.replace(
        cfg, domain=dataclasses.replace(cfg.domain, fixed_r=2.0))
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    vals = []
    out = variational.polish_lbfgs(
        params, cfg, n_r=2, n_pts=2048, steps=30,
        log_cb=lambda s, m: vals.append(m["E_obj"]))
    assert np.isfinite(jax.tree.leaves(out)[0]).all()
    assert vals[-1] <= vals[0]


def test_variational_training_lowers_energy():
    cfg = pqs.smoke_config(dtype="float64")
    cfg = dataclasses.replace(
        cfg, domain=dataclasses.replace(cfg.domain, fixed_r=2.0),
        train=dataclasses.replace(cfg.train, scan_chunk=25, lr=3e-3))
    res = variational.train_variational(cfg, n_r=2, n_pts=2048, epochs=150)
    e = res.history["Energy"]
    assert np.isfinite(e).all()
    # moving toward the ground state (exact -0.796 electronic at R=2)
    assert np.mean(e[-20:]) < np.mean(e[:20])


def test_antithetic_and_stratified_variance_reduction():
    """Radial-antithetic pairing must leave the quotient unbiased while
    cutting its variance (deterministic given the fixed keys); stratified R
    covers each stratum exactly once."""
    import numpy as np
    from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, domain=dataclasses.replace(cfg.domain, fixed_r=1.0))

    import functools

    @functools.partial(jax.jit, static_argnames="antithetic")
    def _est(key, antithetic):
        vb = variational.sample_vbatch(key, cfg, n_r=1, n_pts=2048,
                                       antithetic=antithetic)
        _, aux = variational.quotient_loss(params, cfg, vb)
        return aux["e_r"][0]

    def estimate(key, antithetic):
        return float(_est(key, antithetic=antithetic))

    keys = jax.random.split(jax.random.PRNGKey(1), 40)
    plain = np.array([estimate(k, False) for k in keys])
    anti = np.array([estimate(k, True) for k in keys])
    # same estimand (the Rayleigh quotient of this psi at R=1)
    assert abs(plain.mean() - anti.mean()) < 4 * plain.std() / np.sqrt(40)
    # the spread must not degrade (the reduction itself is ~10-30% and
    # within estimation noise at this batch size — the mechanism is
    # asserted deterministically below)
    assert anti.std() < 1.15 * plain.std()

    # mechanism: paired radial draws are negatively correlated and pairs
    # share their direction/nucleus (deterministic sampler property)
    from pinn_for_quantum_wavefunction_surfaces_tpu.ops.sampling import \
        radial as _radial
    vb = variational.sample_vbatch(jax.random.PRNGKey(5), cfg, n_r=1,
                                   n_pts=4096, antithetic=True)
    n_f = int(cfg.domain.focus_frac * 4096) // 2 * 2
    m = n_f // 2
    r1, r2 = _radial(cfg.model, vb.x[0], vb.y[0], vb.z[0],
                     jnp.full_like(vb.x[0], 1.0))
    u = np.minimum(np.asarray(r1), np.asarray(r2))[:n_f]
    corr = np.corrcoef(u[:m], u[m:2 * m])[0, 1]
    assert corr < -0.3, corr

    # stratified R: one draw per stratum, strictly increasing
    cfg2 = pqs.Config(dtype="float64")
    vb = variational.sample_vbatch(jax.random.PRNGKey(2), cfg2, n_r=8,
                                   n_pts=64, stratified=True)
    r = np.asarray(vb.r)
    edges = np.linspace(cfg2.domain.r_lo, cfg2.domain.r_hi, 9)
    assert ((r >= edges[:-1]) & (r <= edges[1:])).all()


def test_spheroidal_vbatch_matches_quadrature_exactly():
    """The deterministic batch must reproduce rayleigh_quotient_spheroidal
    (same grid, same weights) — the quotient_loss per-R energies ARE the
    machine-precision quadrature values."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    r_values = [0.5, 2.0]
    vb = variational.spheroidal_vbatch(cfg, n_xi=40, n_eta=40,
                                       r_values=r_values)
    _, aux = variational.quotient_loss(params, cfg, vb)
    for i, ri in enumerate(r_values):
        quad = aen.rayleigh_quotient_spheroidal(params, cfg, ri,
                                                n_xi=40, n_eta=40)
        np.testing.assert_allclose(float(aux["e_r"][i]), quad, rtol=1e-12)


def test_spheroidal_polish_descends_and_respects_variational_bound():
    """Noise-free polish: objective decreases and every per-R quotient stays
    ABOVE the exact eigenvalue (the Rayleigh bound — the property that makes
    aggressive optimisation safe on this objective)."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
    cfg = pqs.smoke_config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    out = variational.polish_spheroidal(params, cfg, n_r=3, n_xi=24,
                                        n_eta=24, steps=20)
    r_values = np.linspace(cfg.domain.r_lo, cfg.domain.r_hi, 3)
    vb = variational.spheroidal_vbatch(cfg, n_xi=40, n_eta=40,
                                       r_values=r_values)
    _, aux0 = variational.quotient_loss(params, cfg, vb)
    _, aux = variational.quotient_loss(out, cfg, vb)
    assert float(jnp.mean(aux["e_r"])) < float(jnp.mean(aux0["e_r"]))
    exact = aen.exact_energy_ode(r_values)
    e_r = np.asarray(aux["e_r"])
    assert (e_r >= exact - 1e-9).all(), (e_r, exact)


def test_lbfgs_best_iterate_selected_by_validation_value():
    """Quadrature-gaming guard (field-tested on the 3p sigma_u run: the
    train objective jumped 15 mHa below the exact spectrum while the true
    energy degraded): when a val_fn is given, _lbfgs_minimize must return
    the iterate with the best VALIDATION value, not the best train value.

    Toy with the same geometry: the train loss keeps improving along the
    trajectory (w -> 0) while the validation loss is best mid-trajectory
    (w = 1). Selection must pick the mid-trajectory iterate."""
    cfg = pqs.smoke_config(dtype="float64")
    params = {"w": jnp.asarray([2.0], jnp.float64)}

    def train_loss(p, _cfg, _vb, _hw):
        return jnp.sum(p["w"] ** 2), {}

    def val_fn(p):
        return jnp.sum((p["w"] - 1.0) ** 2)

    out = variational._lbfgs_minimize(params, cfg, None, steps=30,
                                      head_weight=0.0, loss_fn=train_loss,
                                      val_fn=val_fn)
    w = float(np.asarray(out["w"])[0])
    # the final train iterate sits at ~0; the selected one must be the
    # closest-to-1 iterate the trajectory produced
    assert abs(w - 1.0) < 0.5, w
    # without val_fn the same driver returns the train-best (~0) iterate
    out2 = variational._lbfgs_minimize(params, cfg, None, steps=30,
                                       head_weight=0.0, loss_fn=train_loss)
    assert abs(float(np.asarray(out2["w"])[0])) < 0.1


def test_spheroidal_polish_val_grid_matches_train_best_when_honest():
    """On an honest (non-gaming) run the validation-tracked polish must land
    at the same optimum as train-value tracking (the guard is free when
    nothing is gamed)."""
    cfg = pqs.smoke_config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(1), cfg.model,
                                jnp.float64)
    kw = dict(n_r=2, n_xi=12, n_eta=10, steps=8)
    a = variational.polish_spheroidal(params, cfg, val_grid=True, **kw)
    b = variational.polish_spheroidal(params, cfg, val_grid=False, **kw)
    vb = variational.spheroidal_vbatch(cfg, n_r=2, n_xi=31, n_eta=29)
    la, _ = variational.quotient_loss(a, cfg, vb)
    lb, _ = variational.quotient_loss(b, cfg, vb)
    # same descent basin: the two selections agree to optimisation noise
    assert abs(float(la) - float(lb)) < 1e-4, (float(la), float(lb))


def test_antithetic_importance_weights_unbiased():
    """Radial-antithetic importance weights still integrate a known function
    (the weights/density contract is unchanged)."""
    cfg = pqs.Config(dtype="float64")
    x, y, z, w = sample_importance(jax.random.PRNGKey(3), cfg, 1.0, 200_000,
                                   dtype=jnp.float64, antithetic=True)
    f = jnp.exp(-(x ** 2 + y ** 2 + z ** 2) / 2.0)
    est = float(jnp.sum(w * f)) / x.shape[0]
    exact = float((2 * np.pi) ** 1.5)
    assert abs(est - exact) / exact < 0.02


def test_xi_span_config_drives_quadrature_box():
    """DomainConfig.xi_span (round 4) must flow into BOTH the training
    vbatch and the evaluation quotient. Physics check on the ground
    state: the span-20 and span-40 quotients agree to ~1e-10 mHa (the
    alpha ~ 1 tail is dead by r = 20), so the default stays exact for
    every compact state while diffuse wide-alpha states (4fpu measured
    -0.0004 mHa signed at span 20, +0.0004 at 40) get an honest box."""
    import dataclasses

    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational

    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable"))
    cfg40 = dataclasses.replace(
        cfg, domain=dataclasses.replace(cfg.domain, xi_span=40.0))
    vb20 = variational.spheroidal_vbatch(cfg, n_r=2, n_xi=8, n_eta=8)
    vb40 = variational.spheroidal_vbatch(cfg40, n_r=2, n_xi=8, n_eta=8)
    assert float(jnp.max(vb40.x)) > 1.5 * float(jnp.max(vb20.x))

    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model,
                                jnp.float64)
    e20 = aen.rayleigh_quotient_spheroidal(params, cfg, 1.0, n_xi=96,
                                           n_eta=64)
    e40 = aen.rayleigh_quotient_spheroidal(params, cfg40, 1.0, n_xi=128,
                                           n_eta=64)
    assert abs(e20 - e40) < 1e-10, (e20, e40)


def test_r_cluster_log_rows():
    """DomainConfig.r_cluster='log' (round 4) lays the variational R rows
    out in log(R + 0.3) — denser (so higher-weighted in the mean
    objective) toward the united-atom end — while keeping the exact
    endpoints. Monotone, endpoint-exact, and strictly denser at small R
    than uniform."""
    import dataclasses

    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational

    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable"))
    cfl = dataclasses.replace(
        cfg, domain=dataclasses.replace(cfg.domain, r_cluster="log"))
    vb_u = variational.spheroidal_vbatch(cfg, n_r=39, n_xi=6, n_eta=6)
    vb_l = variational.spheroidal_vbatch(cfl, n_r=39, n_xi=6, n_eta=6)
    ru, rl = np.asarray(vb_u.r), np.asarray(vb_l.r)
    assert rl[0] == ru[0] == 0.2 and rl[-1] == ru[-1] == 4.0
    assert np.all(np.diff(rl) > 0)
    # first interval at least 3x denser than uniform's 0.1
    assert rl[1] - rl[0] < 0.04
    # count of rows below R = 1: log layout must have strictly more
    assert (rl < 1.0).sum() > (ru < 1.0).sum()
