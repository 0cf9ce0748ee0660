"""Radially excited sigma states (capability beyond the reference): the
xi_node ansatz factor (models/ansatz.node_xi0) and the deflated variational
objective (training/variational.quotient_loss_deflated) targeting 2s sigma_g
/ 3p sigma_u — states that are NOT the lowest of their symmetry sector, so
plain quotient minimisation would sink to the ground state."""

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


def _node_params(p=1, seed=1, xi=True, eta=False, xi2=False):
    mcfg = pqs.ModelConfig(arch="separable", inversion_symmetry=p,
                           xi_node=xi, eta_node=eta, xi_node2=xi2)
    params = ansatz.init_params(jax.random.PRNGKey(seed), mcfg, jnp.float64)
    names = ["lamout", "muout", "alpha2", "beta2"]
    names += (["rnode2"] if xi else []) + (["enode2"] if eta else [])
    names += ["rnodeb2"] if xi2 else []
    k = jax.random.split(jax.random.PRNGKey(seed + 10), len(names))
    for i, name in enumerate(names):
        params[name]["w"] = 0.3 * jax.random.normal(
            k[i], params[name]["w"].shape, jnp.float64)
    return mcfg, params


def test_node_factor_at_init():
    """xi_node init (R-aware form): psi == GZ * ((r1+r2)/2 - (R + 2)) —
    the node ellipsoid sits 2 bohr beyond the foci at every R."""
    mcfg = pqs.ModelConfig(arch="separable", xi_node=True)
    params = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    x, y, z, r = _points()
    psi_v, _ = ansatz.psi(params, mcfg, x, y, z, r)
    a = ansatz.orbital_exponent(params, r)
    b = ansatz.gz_exponent(params, r, 1, a)
    r1 = jnp.sqrt((x - r) ** 2 + y ** 2 + z ** 2)
    r2 = jnp.sqrt((x + r) ** 2 + y ** 2 + z ** 2)
    gz = jnp.exp(-a * r1 - b * r2) + jnp.exp(-a * r2 - b * r1)
    want = gz * (0.5 * (r1 + r2) - (r + 2.0))
    np.testing.assert_allclose(psi_v, want, rtol=1e-13)
    np.testing.assert_allclose(ansatz.node_xi0(params, r) * r, r + 2.0,
                               rtol=1e-12)


def test_legacy_node_checkpoint_formula():
    """Legacy xi_node checkpoints (params key "node*") keep the legacy
    fixed-cap formula under the R-aware refactor (the current 2ssg
    artifact uses the R-aware + wide-alpha heads; the original is kept
    as the legacy-dispatch witness)."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "excited_2ssg_legacynode.npz")
    if not os.path.exists(path):
        pytest.skip("2ssg artifact not present")
    params, _ = checkpoint.load_params(path)
    params = params.get("params", params)
    params = {k: {kk: jnp.asarray(vv, jnp.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    r = jnp.asarray([0.2, 1.0, 4.0])
    a = jax.nn.sigmoid(r[..., None] @ params["node1"]["w"]
                       + params["node1"]["b"])
    h = (a @ params["node2"]["w"] + params["node2"]["b"])[..., 0]
    want = 1.0 + 8.0 * jax.nn.sigmoid(h)
    np.testing.assert_allclose(ansatz.node_xi0(params, r), want,
                               rtol=1e-15)


def test_eta_node_factor_at_init():
    """eta_node init: psi == GZ * (eta^2 - 1/3) — the P2 Legendre nodes of
    the d-state angular structure (sigmoid(log 1/2) == 1/3)."""
    mcfg = pqs.ModelConfig(arch="separable", eta_node=True)
    params = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    x, y, z, r = _points()
    psi_v, _ = ansatz.psi(params, mcfg, x, y, z, r)
    a = ansatz.orbital_exponent(params, r)
    b = ansatz.gz_exponent(params, r, 1, a)
    r1 = jnp.sqrt((x - r) ** 2 + y ** 2 + z ** 2)
    r2 = jnp.sqrt((x + r) ** 2 + y ** 2 + z ** 2)
    gz = jnp.exp(-a * r1 - b * r2) + jnp.exp(-a * r2 - b * r1)
    eta2 = (0.5 * (r1 - r2) / r) ** 2
    np.testing.assert_allclose(psi_v, gz * (eta2 - 1.0 / 3.0), rtol=1e-12)
    np.testing.assert_allclose(ansatz.node_eta0sq(params, r), 1.0 / 3.0,
                               rtol=1e-12)


def test_double_node_factor_at_init():
    """xi_node2 init: psi == GZ * (p - (R+2)) * (p - (R+4.5)) with
    p = (r1+r2)/2 — two simple zeros, the second 2.5 bohr (the init gap)
    beyond the first; a strictly positive gap bound keeps them simple."""
    mcfg = pqs.ModelConfig(arch="separable", xi_node=True, xi_node2=True)
    params = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    x, y, z, r = _points()
    psi_v, _ = ansatz.psi(params, mcfg, x, y, z, r)
    a = ansatz.orbital_exponent(params, r)
    b = ansatz.gz_exponent(params, r, 1, a)
    r1 = jnp.sqrt((x - r) ** 2 + y ** 2 + z ** 2)
    r2 = jnp.sqrt((x + r) ** 2 + y ** 2 + z ** 2)
    gz = jnp.exp(-a * r1 - b * r2) + jnp.exp(-a * r2 - b * r1)
    p_half = 0.5 * (r1 + r2)
    want = gz * (p_half - (r + 2.0)) * (p_half - (r + 4.5))
    np.testing.assert_allclose(psi_v, want, rtol=1e-12)
    gap = ansatz.node_gap2(params, r)
    np.testing.assert_allclose(gap, 2.5, rtol=1e-12)
    # the gap bound is strictly positive for ANY head value
    assert ansatz.RNODEB_GAP_LO > 0

    with pytest.raises(ValueError, match="requires"):
        ansatz.init_params(jax.random.PRNGKey(0),
                           pqs.ModelConfig(arch="separable", xi_node2=True),
                           jnp.float64)


@pytest.mark.parametrize("p,xi,eta,xi2",
                         [(1, True, False, False), (-1, True, False, False),
                          (1, False, True, False), (1, True, True, False),
                          (1, True, False, True), (-1, True, True, True)])
def test_node_fwdlap_matches_nested_ad(p, xi, eta, xi2):
    mcfg, params = _node_params(p, xi=xi, eta=eta, xi2=xi2)
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


@pytest.mark.parametrize("p", [1, -1])
def test_node_preserves_inversion_parity(p):
    mcfg, params = _node_params(p, seed=3, eta=True)
    x, y, z, r = _points()
    a, _ = ansatz.psi(params, mcfg, x, y, z, r)
    b, _ = ansatz.psi(params, mcfg, -x, -y, -z, r)
    np.testing.assert_allclose(b, p * a, rtol=1e-12)


def test_node_numpy_infer_parity():
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import \
        numpy_infer
    mcfg, params = _node_params(seed=5, eta=True, xi2=True)
    np_params = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                 for k, v in params.items()}
    x, y, z, r = _points()
    got = numpy_infer.psi(np_params, np.asarray(x), np.asarray(y),
                          np.asarray(z), np.asarray(r), arch="separable")
    want, _ = ansatz.psi(params, mcfg, x, y, z, r)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12)


def test_deflated_polish_converges_to_2ssg():
    """Deflated spheroidal polish at fixed R = 1 (psi0 = the shipped
    ground-state flagship): the xi_node model must converge to the SECOND
    gerade eigenvalue E(2ssg) = -0.36086488 — far from the ground state at
    -1.1026342 plain quotient minimisation would sink to — within 0.1 mHa
    in a smoke-sized budget."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import exact
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational

    p0, _ = checkpoint.load_params("artifacts/flagship_separable.npz")
    p0 = p0.get("params", p0)
    cfg = pqs.Config(model=pqs.ModelConfig(arch="separable", xi_node=True),
                     domain=pqs.DomainConfig(fixed_r=1.0), dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model,
                                jnp.float64)
    out = variational.polish_spheroidal(params, cfg, n_xi=32, n_eta=32,
                                        steps=80, adam_steps=120,
                                        deflate_params=p0)
    vb = variational.spheroidal_vbatch(cfg, n_xi=64, n_eta=64)
    out_j = jax.tree.map(jnp.asarray, out)
    _, aux = variational.quotient_loss(out_j, cfg, vb, 0.0)
    e = float(aux["e_r"][0])
    e2 = exact.exact_electronic_energy(1.0, "2ssg")
    assert abs(e - e2) < 1e-4, (e, e2)
    # the learned node sits inside the grid, away from its (1, 9) bounds
    xi0 = float(ansatz.node_xi0(out_j, jnp.asarray([1.0]))[0])
    assert 1.2 < xi0 < 5.0, xi0


def test_multi_reference_deflation_orthogonalised():
    """k = 2 stacked deflation (training/variational.reference_states_on_
    batch): the references come out row-orthogonal in the quadrature inner
    product, H phi transforms consistently (Gram-Schmidt is linear), and
    the k = 2 deflated loss reduces EXACTLY to the k = 1 loss when the
    second reference is a multiple of the first post-orthogonalisation
    residual of an independent state."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational

    p0, _ = checkpoint.load_params("artifacts/flagship_separable.npz")
    p0 = p0.get("params", p0)
    p0 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), p0)
    _, p1 = _node_params(seed=7)          # an independent xi_node state
    cfg = pqs.Config(model=pqs.ModelConfig(arch="separable"),
                     domain=pqs.DomainConfig(fixed_r=1.0), dtype="float64")
    vb = variational.spheroidal_vbatch(cfg, n_xi=24, n_eta=24)
    ps, hs = variational.reference_states_on_batch([p0, p1], cfg, vb)
    assert ps.shape[0] == 2 and ps.ndim == 3
    # row-orthogonality in the quadrature inner product
    cross = jnp.sum(vb.w * ps[0] * ps[1], axis=1)
    norms = jnp.sqrt(jnp.sum(vb.w * ps[0] ** 2, axis=1)
                     * jnp.sum(vb.w * ps[1] ** 2, axis=1))
    np.testing.assert_allclose(np.asarray(cross / norms), 0.0, atol=1e-10)
    # H phi consistency: phi_1' = phi_1 - c phi_0 => H phi_1' likewise
    ps1, hs1 = variational.reference_state_on_batch(p1, cfg, vb)
    ps0, hs0 = variational.reference_state_on_batch(p0, cfg, vb)
    c = (jnp.sum(vb.w * ps1 * ps0, axis=1)
         / jnp.sum(vb.w * ps0 * ps0, axis=1))[:, None]
    np.testing.assert_allclose(np.asarray(hs[1]),
                               np.asarray(hs1 - c * hs0), rtol=1e-12)
    # the k = 2 deflated quotient of a third state runs and stays finite,
    # and deflating (phi_0, phi_1) equals deflating the pre-orthogonalised
    # pair in any order of the SAME span
    _, p2 = _node_params(seed=11, eta=True)
    p2 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), p2)
    l2, aux2 = variational.quotient_loss_deflated(p2, cfg, vb, ps, hs, 0.0)
    ps_r, hs_r = variational.reference_states_on_batch([p1, p0], cfg, vb)
    l2r, aux2r = variational.quotient_loss_deflated(p2, cfg, vb, ps_r,
                                                    hs_r, 0.0)
    assert np.isfinite(float(l2)) and float(aux2["perp_frac"]) > 0
    # the contamination term sees only the SPAN of the references, so the
    # Gram-Schmidt ordering must not matter
    np.testing.assert_allclose(float(l2r), float(l2), rtol=1e-9)
    np.testing.assert_allclose(float(aux2r["e_mean"]),
                               float(aux2["e_mean"]), rtol=1e-9)


def test_sharded_deflated_polish_matches_single_device():
    """The deflated polish R-shards the frozen reference stack along with
    the quadrature rows ((k, rows, pts) on NamedSharding(None, 'data'));
    mesh=... must reproduce the single-device deflated polish to
    fp-reduction tolerance."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.parallel import \
        mesh as pmesh
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational

    p0, _ = checkpoint.load_params("artifacts/flagship_separable.npz")
    p0 = p0.get("params", p0)
    _, p1 = _node_params(seed=7)
    cfg = pqs.Config(model=pqs.ModelConfig(arch="separable", xi_node=True,
                                           eta_node=True), dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(2), cfg.model,
                                jnp.float64)
    kw = dict(n_r=8, n_xi=10, n_eta=8, steps=3, adam_steps=2,
              deflate_params=[p0, p1])
    ref = variational.polish_spheroidal(params, cfg, **kw)
    m = pmesh.make_mesh(8)
    got = variational.polish_spheroidal(params, cfg, mesh=m, **kw)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-12), ref, got)


def test_excited_2ssg_artifact_regression():
    """Golden regression on the shipped 2s sigma_g artifact (the SECOND
    gerade state — unreachable by any plain energy-minimising objective):
    E_int within 0.05 mHa of the excited ODE oracle at probe Rs
    (wide-alpha retrain),
    variationally positive, and ground-state contamination below 1e-4
    (the deflation + overlap-penalty certificate)."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "excited_2ssg.npz")
    if not os.path.exists(path):
        pytest.skip("2ssg artifact not present")
    params, _ = checkpoint.load_params(path)
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", xi_node=True))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="2ssg")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert -1e-3 <= err_mha <= 0.05, (ri, err_mha)
    p0, _ = checkpoint.load_params("artifacts/flagship_separable.npz")
    p0 = p0.get("params", p0)
    frac = variational.contamination_curve(params, [p0], cfg, [1.0, 4.0],
                                           n_xi=48, n_eta=48)
    assert frac.max() < 1e-4, frac


def test_pallas_kernel_rejects_node_params():
    from pinn_for_quantum_wavefunction_surfaces_tpu.ops.pallas_separable \
        import psi_lap_train_separable
    mcfg, params = _node_params()
    x, y, z, r = _points(8)
    with pytest.raises(NotImplementedError):
        psi_lap_train_separable(params, mcfg, x, y, z, r, interpret=True)


def test_excited_3psu_artifact_regression():
    """Golden regression on the shipped 3p sigma_u artifact (the SECOND
    ungerade state, wide-alpha retrain + dense 96x64 log-clustered
    continuation, re-deflated against the round-4 2psu): E_int within
    0.06 mHa of the excited ODE oracle at probe Rs, variationally
    positive, and
    2p sigma_u contamination below 1e-4 (deflation + overlap-penalty +
    validation-grid-selection certificate)."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "excited_3psu.npz")
    if not os.path.exists(path):
        pytest.skip("3psu artifact not present")
    params, _ = checkpoint.load_params(path)
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", xi_node=True,
                                           inversion_symmetry=-1))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="3psu")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert -1e-3 <= err_mha <= 0.06, (ri, err_mha)
    p0, _ = checkpoint.load_params("artifacts/ungerade_separable.npz")
    p0 = p0.get("params", p0)
    frac = variational.contamination_curve(params, [p0], cfg, [1.0, 4.0],
                                           n_xi=48, n_eta=48)
    assert frac.max() < 1e-4, frac


def test_excited_3dsg_artifact_regression():
    """Golden regression on the shipped 3d sigma_g artifact (the THIRD
    gerade state, k=2 deflation against 1ssg + 2ssg; round-5 dense
    96x64 log-row continuation): E_int within 0.06 mHa of the excited
    ODE oracle at probe Rs (R=0.2-dominated: 0.052 there, <=0.02
    elsewhere), variationally positive, and frozen-span contamination
    below 1e-4."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "excited_3dsg.npz")
    if not os.path.exists(path):
        pytest.skip("3dsg artifact not present")
    params, _ = checkpoint.load_params(path)
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", eta_node=True))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="3dsg")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert -1e-3 <= err_mha <= 0.06, (ri, err_mha)
    refs = []
    for p in ("artifacts/flagship_separable.npz",
              "artifacts/excited_2ssg.npz"):
        q, _ = checkpoint.load_params(p)
        refs.append(q.get("params", q))
    frac = variational.contamination_curve(params, refs, cfg, [0.2, 4.0],
                                           n_xi=48, n_eta=48)
    assert frac.max() < 1e-4, frac


def test_excited_4psu_artifact_regression():
    """Golden on the shipped 4p sigma_u artifact — the FIRST n = 4 radial
    state (third ungerade root: double xi-node + k = 2 deflation against
    2psu/3psu), trained AND scored on the honest --xi-span 40 box (the
    diffuse n = 4 tail spreads past the span-20 box if the objective
    doesn't price it — DESIGN.md S12): E_int within 0.09 mHa of the
    exact ODE oracle at probe Rs (R = 0.2-dominated: 0.082 there, ~0.02
    elsewhere — the xi_node2 family's small-R plateau), STRICTLY
    variationally positive, and frozen-reference contamination < 1e-4."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "excited_4psu.npz")
    if not os.path.exists(path):
        pytest.skip("4psu artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "4psu"
    assert float(meta["xi_span"]) == 40.0
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", xi_node=True,
                                           xi_node2=True, wide_alpha=True,
                                           inversion_symmetry=-1))
    cfg = dataclasses.replace(cfg, domain=dataclasses.replace(
        cfg.domain, xi_span=40.0))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="4psu")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert 0.0 < err_mha <= 0.09, (ri, err_mha)
    refs = []
    for p in ("artifacts/ungerade_separable.npz",
              "artifacts/excited_3psu.npz"):
        q, _ = checkpoint.load_params(p)
        refs.append(q.get("params", q))
    frac = variational.contamination_curve(params, refs, cfg, [1.0, 4.0],
                                           n_xi=48, n_eta=48)
    assert frac.max() < 1e-4, frac


def test_excited_3ssg_artifact_regression():
    """Golden regression on the shipped 3s sigma_g artifact — the THIRD
    gerade-sigma radial state (double xi-node + 3-reference deflation
    against 1ssg/2ssg/3dsg), completing the united-atom n<=3 manifold.
    Round 5 re-ships it through the dense 96x64 log-row continuation
    (`make cont-3ssg`), re-deflated against the CURRENT dense references:
    0.0059 mHa mean / 0.0106 max (from 0.0089/0.049). E_int within
    0.02 mHa of the exact ODE oracle at probe Rs, and no more than
    0.001 mHa below it anywhere probed (the deflation floor set by the
    reference artifacts' own accuracy halved with them — see
    RESULTS.md)."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "excited_3ssg.npz")
    if not os.path.exists(path):
        pytest.skip("3ssg artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "3ssg"
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", xi_node=True,
                                           xi_node2=True, wide_alpha=True))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="3ssg")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert -1e-3 <= err_mha <= 0.02, (ri, err_mha)


def test_excited_4fsu_artifact_regression():
    """Golden on the shipped 4f sigma_u artifact — THE CROSSING STATE
    (DESIGN.md S12): its curve crosses 4p sigma_u's at R* = 1.9331, so no
    deflation COUNT reaches it; k = 3 span-deflation (2psu + 3psu + 4psu)
    does, because the complement minimum is 4fsu at every R regardless of
    the crossing side. eta-node ungerade ansatz on the honest xi-span-40
    box. Accuracy is the round-5 plateau of one 1500+1500 split run —
    E_int within 1.25 mHa of the exact ODE oracle at probe Rs (mean
    0.425; R = 0.2-dominated like every diffuse n = 4 state), STRICTLY
    variationally positive (min signed +0.112), and frozen-reference
    contamination < 1e-4 (the certificate that it is NOT a re-found
    lower state on either side of the crossing)."""
    import os
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    path = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "excited_4fsu.npz")
    if not os.path.exists(path):
        pytest.skip("4fsu artifact not present")
    params, meta = checkpoint.load_params(path)
    assert meta["target_state"] == "4fsu"
    assert float(meta["xi_span"]) == 40.0
    params = params.get("params", params)
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in params.items()}
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable", eta_node=True,
                                           wide_alpha=True,
                                           inversion_symmetry=-1))
    cfg = dataclasses.replace(cfg, domain=dataclasses.replace(
        cfg.domain, xi_span=40.0))
    r_probe = np.array([0.2, 1.0, 2.0, 4.0])
    exact = aen.exact_energy_ode(r_probe, state="4fsu")
    for ri, ex in zip(r_probe, exact):
        e = aen.rayleigh_quotient_spheroidal(params, cfg, float(ri))
        err_mha = 1e3 * (e - ex)
        assert 0.0 < err_mha <= 1.25, (ri, err_mha)
    refs = []
    for p in ("artifacts/ungerade_separable.npz",
              "artifacts/excited_3psu.npz",
              "artifacts/excited_4psu.npz"):
        q, _ = checkpoint.load_params(p)
        refs.append(q.get("params", q))
    frac = variational.contamination_curve(params, refs, cfg, [1.0, 4.0],
                                           n_xi=48, n_eta=48)
    assert frac.max() < 1e-4, frac
