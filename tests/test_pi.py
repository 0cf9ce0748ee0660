"""Pi/delta sectors (capability beyond the reference): the harmonic
transverse factor Re[(y+iz)^m] on the separable ansatz
(models/ansatz._transverse_harmonic, ModelConfig.m_abs) targeting the
2p pi_u / 3d pi_g / 3d delta_g sector minima, scored against the
general-m exact oracle (analysis/exact)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops import operators


def _points(n=48, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.uniform(k[0], (n,), jnp.float64, -5, 5)
    y = jax.random.uniform(k[1], (n,), jnp.float64, -5, 5)
    z = jax.random.uniform(k[2], (n,), jnp.float64, -5, 5)
    r = jax.random.uniform(k[3], (n,), jnp.float64, 0.2, 4.0)
    return x, y, z, r


def _pi_params(p=1, m=1, seed=1):
    mcfg = pqs.ModelConfig(arch="separable", inversion_symmetry=p, m_abs=m)
    params = ansatz.init_params(jax.random.PRNGKey(seed), mcfg, jnp.float64)
    names = ["lamout", "muout", "alpha2", "beta2"]
    k = jax.random.split(jax.random.PRNGKey(seed + 10), len(names))
    for i, name in enumerate(names):
        params[name]["w"] = 0.3 * jax.random.normal(
            k[i], params[name]["w"].shape, jnp.float64)
    return mcfg, params


def test_pi_factor_at_init():
    """m_abs=1 init (zero correction heads): psi == GZ_sym * y — the
    harmonic transverse factor carries the full e^{i phi} structure."""
    mcfg = pqs.ModelConfig(arch="separable", m_abs=1)
    params = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    x, y, z, r = _points()
    psi_v, _ = ansatz.psi(params, mcfg, x, y, z, r)
    a = ansatz.orbital_exponent(params, r)
    b = ansatz.gz_exponent(params, r, 1, a)
    r1 = jnp.sqrt((x - r) ** 2 + y ** 2 + z ** 2)
    r2 = jnp.sqrt((x + r) ** 2 + y ** 2 + z ** 2)
    gz = jnp.exp(-a * r1 - b * r2) + jnp.exp(-a * r2 - b * r1)
    np.testing.assert_allclose(psi_v, gz * y, rtol=1e-13)


def test_delta_factor_at_init():
    """m_abs=2: the transverse factor is Re[(y+iz)^2] = y^2 - z^2."""
    mcfg = pqs.ModelConfig(arch="separable", m_abs=2)
    params = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    x, y, z, r = _points()
    psi_v, _ = ansatz.psi(params, mcfg, x, y, z, r)
    a = ansatz.orbital_exponent(params, r)
    b = ansatz.gz_exponent(params, r, 1, a)
    r1 = jnp.sqrt((x - r) ** 2 + y ** 2 + z ** 2)
    r2 = jnp.sqrt((x + r) ** 2 + y ** 2 + z ** 2)
    gz = jnp.exp(-a * r1 - b * r2) + jnp.exp(-a * r2 - b * r1)
    np.testing.assert_allclose(psi_v, gz * (y * y - z * z), rtol=1e-13)


def test_m_abs_requires_separable():
    with pytest.raises(ValueError):
        pqs.ModelConfig(arch="symmetric", m_abs=1)


@pytest.mark.parametrize("p,m", [(1, 1), (-1, 1), (1, 2)])
def test_pi_fwdlap_matches_nested_ad(p, m):
    mcfg, params = _pi_params(p, m)
    x, y, z, r = _points(32)
    s, e = ansatz.psi_fwdlap(params, mcfg, x, y, z, r)
    psi_v, e_v = ansatz.psi(params, mcfg, x, y, z, r)
    np.testing.assert_allclose(s.v[..., 0], psi_v, rtol=1e-12)
    np.testing.assert_allclose(e, e_v, rtol=1e-14)

    def point(c, ri):
        pv, _ = ansatz.psi(params, mcfg, c[0], c[1], c[2], ri)
        return pv

    lap = jax.vmap(lambda xx, yy, zz, rr: operators.laplacian_fn(
        lambda c: point(c, rr))(jnp.stack([xx, yy, zz])))(x, y, z, r)
    np.testing.assert_allclose(s.l[..., 0], lap, rtol=1e-8, atol=1e-12)
    grad = jax.vmap(lambda xx, yy, zz, rr: jax.grad(
        lambda c: point(c, rr))(jnp.stack([xx, yy, zz])))(x, y, z, r)
    np.testing.assert_allclose(s.g[..., 0], grad, rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("p,m", [(1, 1), (-1, 1), (1, 2)])
def test_pi_total_inversion_parity(p, m):
    """Total state parity = envelope parity * (-1)^m: 2p pi_u is the
    GERADE envelope times the inversion-odd factor y."""
    mcfg, params = _pi_params(p, m, seed=3)
    x, y, z, r = _points()
    a, _ = ansatz.psi(params, mcfg, x, y, z, r)
    b, _ = ansatz.psi(params, mcfg, -x, -y, -z, r)
    np.testing.assert_allclose(b, p * (-1) ** m * a, rtol=1e-12)


def test_pi_numpy_infer_parity():
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import \
        numpy_infer
    mcfg, params = _pi_params(seed=5)
    np_params = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                 for k, v in params.items()}
    x, y, z, r = _points()
    got = numpy_infer.psi(np_params, np.asarray(x), np.asarray(y),
                          np.asarray(z), np.asarray(r), arch="separable",
                          m_abs=1)
    want, _ = ansatz.psi(params, mcfg, x, y, z, r)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12)


def test_pi_polish_converges_to_2ppu():
    """Plain spheroidal polish at fixed R = 1 from the INIT ansatz (GZ * y):
    2p pi_u is its sector's minimum — no deflation needed — and must reach
    the exact E(2p pi_u) = -0.42877182 within 0.1 mHa in a smoke budget.
    The cos^2(phi) azimuthal factor cancels exactly in the quotient ratio
    on the phi = 0 half-plane quadrature."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import exact
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational

    cfg = pqs.Config(model=pqs.ModelConfig(arch="separable", m_abs=1),
                     domain=pqs.DomainConfig(fixed_r=1.0), dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model,
                                jnp.float64)
    out = variational.polish_spheroidal(params, cfg, n_xi=32, n_eta=32,
                                        steps=80, adam_steps=120)
    vb = variational.spheroidal_vbatch(cfg, n_xi=64, n_eta=64)
    out_j = jax.tree.map(jnp.asarray, out)
    _, aux = variational.quotient_loss(out_j, cfg, vb, 0.0)
    e = float(aux["e_r"][0])
    e_exact = exact.exact_electronic_energy(1.0, "2ppu")
    gap = e - e_exact
    assert -1e-9 < gap < 1e-4, (e, e_exact)


def test_pi_2ppu_artifact_regression():
    """Golden regression on the shipped 2p pi_u artifact (the pi-sector
    minimum — no deflation; wide alpha head; 96x64 dense continuation):
    E_int within 0.005 mHa of the exact ODE oracle at probe Rs, every one
    variationally positive."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "pi_2ppu.npz")
    if not os.path.exists(path):
        pytest.skip("2ppu artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "2ppu" and meta["m_abs"] == 1
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=1))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="2ppu")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert -1e-3 <= err_mha <= 0.005, (ri, err_mha)


def test_pi_3dpg_artifact_regression():
    """Golden regression on the shipped 3d pi_g artifact (the pi-g sector
    minimum: UNGERADE envelope x y, wide alpha head; round-4 dense 96x64 continuation: 0.0048 mHa mean / 0.0249 max): E_int within 0.03
    mHa of the exact ODE oracle at probe Rs, every one variationally
    positive. Also the
    field-tested evaluate-parity trap: scoring this artifact with a gerade
    cfg must NOT reproduce these numbers (the envelope parity is derived
    from the target state in cli evaluate)."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "pi_3dpg.npz")
    if not os.path.exists(path):
        pytest.skip("3dpg artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "3dpg" and meta["m_abs"] == 1
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=1,
                                           inversion_symmetry=-1))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="3dpg")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert -1e-3 <= err_mha <= 0.03, (ri, err_mha)


def test_delta_3ddg_artifact_regression():
    """Golden regression on the shipped 3d delta_g artifact (the
    delta-sector minimum, |m| = 2: gerade envelope x (y^2 - z^2), WIDE
    alpha head — the narrow run measured the 0.75 alpha floor binding):
    E_int within 0.05 mHa of the exact ODE oracle at probe Rs, every one
    variationally positive."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "delta_3ddg.npz")
    if not os.path.exists(path):
        pytest.skip("3ddg artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "3ddg" and meta["m_abs"] == 2
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=2))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="3ddg")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert -1e-3 <= err_mha <= 0.05, (ri, err_mha)


def test_pi_3ppu_artifact_regression():
    """Golden regression on the shipped 3p pi_u artifact — the n<=3
    completion state of the pi_u sector and the first COMPOSITION of the
    transverse m-factor with xi-node deflation (deflated against 2ppu):
    E_int within 0.005 mHa of the exact ODE oracle at probe Rs (the
    shipped re-deflation against the dense-polished 2ppu lands at
    0.0014 mHa mean / 0.0027 max), each within the one-sided deflation
    floor (-1e-3 mHa) of variationally positive."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "pi_3ppu.npz")
    if not os.path.exists(path):
        pytest.skip("3ppu artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "3ppu" and meta["m_abs"] == 1
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=1,
                                           xi_node=True))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="3ppu")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert -1e-3 <= err_mha <= 0.005, (ri, err_mha)


def test_phi_4fpu_artifact_regression():
    """Golden regression on the shipped 4f phi_u artifact — the FIRST
    n = 4 surface and the phi (|m| = 3) sector minimum: gerade envelope x
    Re[(y+iz)^3], wide alpha head, no deflation (lowest in sector).
    Round 5 re-ships it scored on the xi_span = 40 quadrature box (the
    meta records it): the default span-20 box truncates the diffuse 4f
    tail and UNDERSTATED the quotient, letting signed errors read
    -0.0008 mHa. On the honest box the certificate is strict: E_int
    within 0.006 mHa of the exact ODE oracle at probe Rs, every one
    STRICTLY variationally positive (full-surface min signed
    +0.0002 mHa)."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "phi_4fpu.npz")
    if not os.path.exists(path):
        pytest.skip("4fpu artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "4fpu" and meta["m_abs"] == 3
    assert meta["xi_span"] == 40.0   # the honest box for n = 4 tails
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=3),
                     domain=pqs.DomainConfig(xi_span=40.0))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="4fpu")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert 0.0 < err_mha <= 0.006, (ri, err_mha)


def test_pi_4fpiu_artifact_regression():
    """Golden on the shipped 4f pi_u artifact — the second ANGULAR branch
    of the pi_u sector (eta-node pair on the gerade envelope x y-factor;
    total parity u = envelope g x (-1)^m). Unlike the sigma_u shell the
    branch ordering has NO in-span crossing (3ppu x 4fpiu cross at
    R* = 4.115, outside the box — test_exact), so k = 2 deflation against
    2ppu + 3ppu reaches it directly. Honest xi-span-40 box (in meta).
    One 1500-Adam + 600-L-BFGS split run: E_int within 0.65 mHa at probe
    Rs (mean 0.194, R = 0.2-dominated — the diffuse eta-node n = 4
    plateau, same as 4fsu), STRICTLY variationally positive (min signed
    +0.05), frozen-reference contamination < 1e-4."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "pi_4fpiu.npz")
    if not os.path.exists(path):
        pytest.skip("4fpiu artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "4fpiu" and meta["m_abs"] == 1
    assert float(meta["xi_span"]) == 40.0
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=1,
                                           eta_node=True, wide_alpha=True))
    cfg = dataclasses.replace(cfg, domain=dataclasses.replace(
        cfg.domain, xi_span=40.0))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="4fpiu")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert 0.0 < err_mha <= 0.65, (ri, err_mha)
    refs = []
    for p in ("artifacts/pi_2ppu.npz", "artifacts/pi_3ppu.npz"):
        q, _ = checkpoint.load_params(p)
        refs.append(q.get("params", q))
    frac = variational.contamination_curve(params, refs, cfg, [1.0, 4.0],
                                           n_xi=48, n_eta=48)
    assert frac.max() < 1e-4, frac


def test_pi_4dpg_artifact_regression():
    """Golden on the shipped 4d pi_g artifact — the second pi_g state
    (one xi node on the 3dpg ladder: UNGERADE envelope x y x (xi-xi0(R)),
    k = 1 deflation against the dense-polished 3dpg; the rival second
    ANGULAR branch 5g pi_g sits >18 mHa above everywhere in-span, so
    plain k-counting is safe — analysis/exact.py STATE_INDEX notes).
    Honest xi-span-40 box (in meta). One 1500-Adam(TPU) + 600-L-BFGS(CPU)
    split run: E_int within 0.20 mHa at probe Rs (mean 0.064, max 0.173
    at R = 0.2), STRICTLY variationally positive (min signed +0.034),
    frozen-reference contamination < 1e-4."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "pi_4dpg.npz")
    if not os.path.exists(path):
        pytest.skip("4dpg artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "4dpg" and meta["m_abs"] == 1
    assert float(meta["xi_span"]) == 40.0
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=1,
                                           xi_node=True, wide_alpha=True,
                                           inversion_symmetry=-1))
    cfg = dataclasses.replace(cfg, domain=dataclasses.replace(
        cfg.domain, xi_span=40.0))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="4dpg")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert 0.0 < err_mha <= 0.20, (ri, err_mha)
    q, _ = checkpoint.load_params("artifacts/pi_3dpg.npz")
    frac = variational.contamination_curve(params, [q.get("params", q)],
                                           cfg, [1.0, 4.0],
                                           n_xi=48, n_eta=48)
    assert frac.max() < 1e-4, frac


def test_delta_4ddg_artifact_regression():
    """Golden on the shipped 4d delta_g artifact — the second delta_g
    state (one xi node on the 3ddg ladder: gerade envelope x
    Re[(y+iz)^2] x (xi - xi0(R)); k = 1 deflation against the shipped
    `delta_3ddg.npz` — counting is safe, the rival second ANGULAR
    delta_g branch (5g-dominant) stays far above in-span, same argument
    as 4dpg). Honest xi-span-40 box (in meta). TPU Adam 1500 + CPU f64
    L-BFGS split run: E_int within 0.05 mHa at probe Rs (surface mean
    0.0095, max 0.0286 at R = 4), STRICTLY variationally positive
    (min signed +0.0005), frozen-reference contamination < 1e-4."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "delta_4ddg.npz")
    if not os.path.exists(path):
        pytest.skip("4ddg artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "4ddg" and meta["m_abs"] == 2
    assert float(meta["xi_span"]) == 40.0
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=2,
                                           xi_node=True, wide_alpha=True))
    cfg = dataclasses.replace(cfg, domain=dataclasses.replace(
        cfg.domain, xi_span=40.0))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="4ddg")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert 0.0 < err_mha <= 0.05, (ri, err_mha)
    q, _ = checkpoint.load_params("artifacts/delta_3ddg.npz")
    frac = variational.contamination_curve(params, [q.get("params", q)],
                                           cfg, [1.0, 4.0],
                                           n_xi=48, n_eta=48)
    assert frac.max() < 1e-4, frac


def test_delta_4fdu_artifact_regression():
    """Golden on the shipped 4f delta_u artifact — the delta_u SECTOR
    MINIMUM (|m| = 2: total parity = envelope parity x (-1)^m, so the
    u sector needs an UNGERADE envelope under the even harmonic factor
    Re[(y+iz)^2]; united atom He+(4f), separated atom H(n=3) — the
    first |m| = 2 ungerade surface). No deflation needed
    (sector minimum, like 2ppu/3ddg/4fpu). Honest xi-span-40 box (in
    meta). TPU Adam 1500 + CPU f64 L-BFGS 800 split run: E_int within
    0.15 mHa at probe Rs (surface mean 0.038, max 0.108 at R = 0.2),
    STRICTLY variationally positive (min signed +0.017)."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "delta_4fdu.npz")
    if not os.path.exists(path):
        pytest.skip("4fdu artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "4fdu" and meta["m_abs"] == 2
    assert float(meta["xi_span"]) == 40.0
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", m_abs=2,
                                           wide_alpha=True,
                                           inversion_symmetry=-1))
    cfg = dataclasses.replace(cfg, domain=dataclasses.replace(
        cfg.domain, xi_span=40.0))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="4fdu")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert 0.0 < err_mha <= 0.15, (ri, err_mha)
