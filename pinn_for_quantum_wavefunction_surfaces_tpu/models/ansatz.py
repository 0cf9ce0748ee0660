"""The parametric H2+ ansatz psi(x, y, z; R) and eigenvalue head E(R).

Physics-baked structure (reference ``poc/main.py:223-355``):

    psi = gate(R) * NN_sym(x, y, z, R) + LCAO(x, y, z, R)
    LCAO = exp(-r1) + P * exp(-r2),   nuclei at (+/-R, +/-ry, +/-rz)
    NN_sym = Lin_out( base(f1, f2) + P * base(f1m, f2m) )   (mirror: x -> -x)
    E(R)  = small MLP, output bias initialised to -1

P = +1 selects the gerade ground state (1s sigma_g), P = -1 the ungerade
excited state (2p sigma_u) (reference ``poc/main.py:243,260,292``).

Everything here is a pure function over an explicit parameter pytree —
no module state, so the same code path serves `jit`, `grad`, `vmap`,
`shard_map` and the forward-Laplacian propagation in :mod:`..ops.fwdlap`.

Two architectures:
- ``symmetric`` — the paper model above (poc/main.py:247-267).
- ``minimal``   — the rewrite in reference ``train.py:41-53``: no mirrored
  branch (symmetrisation approximated by the factor 2 in ``linear(2*h, ...)``),
  psi = f1 + f2 + h * gate(R).

Parameter layout: ``{name: {"w": (d_in, d_out), "b": (d_out,)}}`` with the
JAX convention y = x @ w + b (transposed w.r.t. torch's (out, in) storage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops import fwdlap

# ---------------------------------------------------------------------------
# Initialisation


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _init_linear(key, d_in, d_out, dtype, bias_bound=None):
    """torch.nn.Linear default init: U(+/- 1/sqrt(fan_in)) for both weight and
    bias (kaiming_uniform(a=sqrt(5)) collapses to exactly this bound)."""
    kw, kb = jax.random.split(key)
    bw = 1.0 / jnp.sqrt(d_in).astype(dtype)
    bb = bw if bias_bound is None else jnp.asarray(bias_bound, dtype)
    return {
        "w": _uniform(kw, (d_in, d_out), bw, dtype),
        "b": _uniform(kb, (d_out,), bb, dtype),
    }


def init_params(key: jax.Array, mcfg: ModelConfig, dtype=jnp.float32) -> dict:
    """Build the parameter pytree.

    - ``symmetric``: torch Linear defaults; E-head output bias set to
      ``eout_bias_init`` (-1, reference poc/main.py:240).
    - ``minimal``: reference ``train.py:13-18`` draws every tensor from
      U(+/- 1/sqrt(shape[0])) — for biases that is 1/sqrt(fan_out).
    """
    dtype = jnp.dtype(dtype)
    keys = jax.random.split(key, 13)
    h, he, hg = mcfg.hidden, mcfg.hidden_e, mcfg.hidden_gate
    if mcfg.arch == "separable":
        return _init_separable(keys, mcfg, dtype)
    if mcfg.arch == "minimal":
        def lin(k, d_in, d_out):
            return _init_linear(k, d_in, d_out, dtype,
                                bias_bound=1.0 / (d_out ** 0.5))
    else:
        lin = lambda k, d_in, d_out: _init_linear(k, d_in, d_out, dtype)
    n_in = 3 if mcfg.r_input else 2
    params = {
        "h1": lin(keys[0], n_in, h),
        "h2": lin(keys[1], h, h),
        "out": lin(keys[2], h, 1),
        "e1": lin(keys[3], 1, he),
        "e2": lin(keys[4], he, he),
        "eout": lin(keys[5], he, 1),
        "gate1": lin(keys[6], 1, hg),
        "gate2": lin(keys[7], hg, 1),
    }
    if mcfg.arch == "symmetric":
        params["eout"]["b"] = jnp.full((1,), mcfg.eout_bias_init, dtype)
    if mcfg.trainable_exponent:
        ha = mcfg.hidden_alpha
        ka1, _ = jax.random.split(keys[0])
        params["alpha1"] = _init_linear(ka1, 1, ha, dtype)
        # zero weights + the tanh-inverting bias -> alpha(R) == 1 at init
        params["alpha2"] = {"w": jnp.zeros((ha, 1), dtype),
                            "b": jnp.full((1,), ALPHA_BIAS_INIT, dtype)}
    if mcfg.gz:
        ha = mcfg.hidden_alpha
        kb1, _ = jax.random.split(keys[1])
        params["beta1"] = _init_linear(kb1, 1, ha, dtype)
        params["beta2"] = {"w": jnp.zeros((ha, 1), dtype),
                           "b": jnp.full((1,), BETA_BIAS_INIT, dtype)}
    return params


def _init_separable(keys, mcfg: ModelConfig, dtype) -> dict:
    """Separable-spheroidal family (beyond the reference):

        psi = Phi_GZ(x, y, z; R) * exp( l(t, R~) + m(eta^2, R~) )

    Phi_GZ = exp(-a r1 - b r2) + P exp(-a r2 - b r1) (the classical
    Guillemin-Zener two-centre function, trainable a(R), b(R)); the log
    correction is SEPARABLE in prolate-spheroidal coordinates — exactly the
    structure Lambda(xi) M(eta) of the true two-centre eigenfunctions — with
    t = e^{-c(xi-1)} in (0, 1] and eta^2 in [0, 1] as bounded smooth
    features. exp(...) > 0 rules out the psi == 0 collapse modes by
    construction (CLAUDE.md checklist for new physics heads), and the
    eta -> -eta symmetry of both features preserves EXACT gerade/ungerade
    parity (Phi_GZ carries it). Zero-initialised output layers make the
    init EXACTLY the GZ physics ansatz."""
    h, he = mcfg.hidden, mcfg.hidden_e
    lin = lambda k, a, b: _init_linear(k, a, b, dtype)
    params = {
        "e1": lin(keys[3], 1, he),
        "e2": lin(keys[4], he, he),
        "eout": lin(keys[5], he, 1),
        "lam1": lin(keys[0], 2, h),
        "lam2": lin(keys[1], h, h),
        "lamout": {"w": jnp.zeros((h, 1), dtype), "b": jnp.zeros((1,), dtype)},
        "mu1": lin(keys[6], 2, h),
        "mu2": lin(keys[7], h, h),
        "muout": {"w": jnp.zeros((h, 1), dtype), "b": jnp.zeros((1,), dtype)},
    }
    # the GZ exponent heads are part of the family (alpha(R), b(R));
    # wide_alpha selects the (0.3, 2.25) "xalpha" range for excited
    # manifolds whose dissociation tails need alpha < 0.75
    a_key = "xalpha" if mcfg.wide_alpha else "alpha"
    a_bias = XALPHA_BIAS_INIT if mcfg.wide_alpha else ALPHA_BIAS_INIT
    params[a_key + "1"] = _init_linear(keys[8], 1, mcfg.hidden_alpha, dtype)
    params[a_key + "2"] = {"w": jnp.zeros((mcfg.hidden_alpha, 1), dtype),
                           "b": jnp.full((1,), a_bias, dtype)}
    params["beta1"] = _init_linear(keys[9], 1, mcfg.hidden_alpha, dtype)
    params["beta2"] = {"w": jnp.zeros((mcfg.hidden_alpha, 1), dtype),
                       "b": jnp.full((1,), BETA_BIAS_INIT, dtype)}
    params["eout"]["b"] = jnp.full((1,), mcfg.eout_bias_init, dtype)
    if mcfg.xi_node:
        # R-aware physical-radius parameterisation (see node_xi0; the
        # legacy fixed-cap "node*" form is kept for shipped checkpoints)
        params["rnode1"] = _init_linear(keys[10], 1, mcfg.hidden_alpha,
                                        dtype)
        params["rnode2"] = {"w": jnp.zeros((mcfg.hidden_alpha, 1), dtype),
                            "b": jnp.full((1,), RNODE_BIAS_INIT, dtype)}
    if mcfg.eta_node:
        params["enode1"] = _init_linear(keys[11], 1, mcfg.hidden_alpha,
                                        dtype)
        params["enode2"] = {"w": jnp.zeros((mcfg.hidden_alpha, 1), dtype),
                            "b": jnp.full((1,), ETA_NODE_BIAS_INIT, dtype)}
    if mcfg.xi_node2:
        if not mcfg.xi_node:
            raise ValueError("xi_node2 (second radial node) requires "
                             "xi_node")
        params["rnodeb1"] = _init_linear(keys[12], 1, mcfg.hidden_alpha,
                                         dtype)
        params["rnodeb2"] = {"w": jnp.zeros((mcfg.hidden_alpha, 1), dtype),
                             "b": jnp.full((1,), RNODEB_BIAS_INIT, dtype)}
    return params


# ---------------------------------------------------------------------------
# Value-only forward passes (probes, quadrature, parity io)


def _mlp2(x, l1, l2, l3=None):
    """sigmoid MLP: sig(x@w1+b1) -> sig(.@w2+b2) [-> .@w3+b3]."""
    y = jax.nn.sigmoid(x @ l1["w"] + l1["b"])
    y = jax.nn.sigmoid(y @ l2["w"] + l2["b"])
    if l3 is not None:
        y = y @ l3["w"] + l3["b"]
    return y


def energy(params: dict, r: jax.Array) -> jax.Array:
    """E(R) eigenvalue head (reference poc/main.py:249-253). r: (...,)."""
    return _mlp2(r[..., None], params["e1"], params["e2"],
                 params["eout"])[..., 0]


def gate(params: dict, r: jax.Array) -> jax.Array:
    """Gate / 'network importance' f(R) (reference poc/main.py:262-264)."""
    y = jax.nn.sigmoid(r[..., None] @ params["gate1"]["w"]
                       + params["gate1"]["b"])
    return (y @ params["gate2"]["w"] + params["gate2"]["b"])[..., 0]


# alpha(R) is bounded to (0.75, 2.25) — the physical H2+ range is [1, 2]
# (separated atoms -> united atom). An unbounded head has a trivial mode
# under normalised losses: alpha -> 0 inflates the wavefunction's extent and
# the loss normaliser with it (observed: alpha collapsed to ~0.2 in a
# 50k-epoch scale-invariant run before this bound).
_ALPHA_MID, _ALPHA_HALF = 1.5, 0.75
# head output h0 with zero weights such that alpha(R) == 1 exactly at init
ALPHA_BIAS_INIT = float(np.arctanh((1.0 - _ALPHA_MID) / _ALPHA_HALF))

# WIDE exponent range (0.3, 2.25) for excited-manifold families
# (ModelConfig.wide_alpha, params key "xalpha*"): states dissociating to
# H(n >= 2) need tail exponents down to 1/n (H(2p): 0.5, H(3d): 1/3 —
# outside the (0.75, 2.25) bound; the 3d delta_g surface measured the
# bound binding: large-R-dominated 0.97 mHa). The lower edge stays
# strictly positive, so the alpha -> 0 inflation mode remains excluded.
# Legacy checkpoints keep the narrow formula (params-keyed dispatch).
_XALPHA_MID, _XALPHA_HALF = 1.275, 0.975
XALPHA_BIAS_INIT = float(np.arctanh((1.0 - _XALPHA_MID) / _XALPHA_HALF))


def orbital_exponent(params: dict, r: jax.Array) -> jax.Array:
    """alpha(R) = 1.5 + 0.75 tanh(head(R)) — or the wide variant
    1.275 + 0.975 tanh(head) for "xalpha*" params; exactly 1 when the
    head is absent or at its init. r: (...,)."""
    if "xalpha1" in params:
        a = jax.nn.sigmoid(r[..., None] @ params["xalpha1"]["w"]
                           + params["xalpha1"]["b"])
        h = (a @ params["xalpha2"]["w"] + params["xalpha2"]["b"])[..., 0]
        return _XALPHA_MID + _XALPHA_HALF * jnp.tanh(h)
    if "alpha1" not in params:
        return jnp.ones_like(r)
    a = jax.nn.sigmoid(r[..., None] @ params["alpha1"]["w"]
                       + params["alpha1"]["b"])
    h = (a @ params["alpha2"]["w"] + params["alpha2"]["b"])[..., 0]
    return _ALPHA_MID + _ALPHA_HALF * jnp.tanh(h)


# Guillemin-Zener second exponent b(R) in (0, 1.5), initialised to 0.1
_BETA_HALF = 0.75
BETA_BIAS_INIT = float(np.arctanh(0.1 / _BETA_HALF - 1.0))


# Radial node position xi0(R) = 1 + XI0_CAP sigmoid(head) in (1, 1+XI0_CAP)
# for radially excited states (ModelConfig.xi_node). The cap keeps the node
# strictly inside the quadrature span (xi <= ~20): xi0 escaping the grid
# would leave psi nodeless and able to collapse onto the ground state,
# starving the deflated quotient's denominator (the "can this make psi
# vanish / spread" checklist). United-atom estimate: the He+ 2s node at
# r = 1 maps to xi0 ~ 1/R — up to 5 at R = 0.2, well inside the cap.
XI0_CAP = 8.0
NODE_BIAS_INIT = float(np.log(1.0 / (XI0_CAP - 1.0)))  # xi0(R) == 2 at init

# R-aware radial node (the CURRENT parameterisation, params key "rnode*"):
# the PHYSICAL node radius p_half = r xi0 = r + RNODE_CAP sigmoid(head) —
# i.e. the node ellipsoid sits a bounded PHYSICAL distance (0, 12) bohr
# beyond the foci, independent of R. The legacy fixed-xi cap above binds
# hard for 3p sigma_u: its node needs r xi0 ~ 2.7 bohr at R = 0.2, i.e.
# xi0 ~ 13.5 > 9 — the trained head saturated at xi0 = 9.0 and the small-R
# surface was 29 mHa off. Both learned node curves (2ssg, 3psu) are smooth
# r + O(1..5) bohr, exactly this form. Still inside the quadrature span
# (r xi <= r + 20 bohr) for every R. Legacy "node*" checkpoints keep the
# old formula (params-keyed dispatch).
RNODE_CAP = 12.0
RNODE_BIAS_INIT = float(np.log(0.2))  # node at r + 2 bohr at init

# Second radial node (xi_node2, params "rnodeb*") for doubly radially
# excited states (3s sigma_g): its PHYSICAL radius is the first node's
# plus a gap bounded in (0.3, 8.3) bohr — the strictly positive lower
# margin keeps the two zeros simple (coincident nodes would square the
# factor, lose the sign change, and re-open the collapse-onto-lower-state
# mode the node factor exists to block). United-atom estimate: He+ 3s
# nodes at r ~ 0.95 and 3.6 bohr (gap 2.6); H(3s) dissociation nodes at
# 1.9 and 7.1 (gap 5.2) — both inside the bound. Init gap 2.5 bohr.
RNODEB_CAP = 8.0
RNODEB_GAP_LO = 0.3
RNODEB_BIAS_INIT = float(np.log(2.2 / (RNODEB_CAP - 2.2)))


def node_xi0(params: dict, r: jax.Array) -> jax.Array:
    """Trainable node position xi0(R) (xi_node models); the psi factor is
    (p_half - r * xi0) with p_half = (r1+r2)/2."""
    if "rnode1" in params:
        a = jax.nn.sigmoid(r[..., None] @ params["rnode1"]["w"]
                           + params["rnode1"]["b"])
        h = (a @ params["rnode2"]["w"] + params["rnode2"]["b"])[..., 0]
        return 1.0 + (RNODE_CAP / r) * jax.nn.sigmoid(h)
    a = jax.nn.sigmoid(r[..., None] @ params["node1"]["w"]
                       + params["node1"]["b"])
    h = (a @ params["node2"]["w"] + params["node2"]["b"])[..., 0]
    return 1.0 + XI0_CAP * jax.nn.sigmoid(h)


def node_gap2(params: dict, r: jax.Array) -> jax.Array:
    """Physical gap (bohr) between the second and first radial-node
    ellipsoids (xi_node2 models): the second factor is
    (p_half - r xi0 - gap), gap in (RNODEB_GAP_LO, RNODEB_GAP_LO +
    RNODEB_CAP)."""
    a = jax.nn.sigmoid(r[..., None] @ params["rnodeb1"]["w"]
                       + params["rnodeb1"]["b"])
    h = (a @ params["rnodeb2"]["w"] + params["rnodeb2"]["b"])[..., 0]
    return RNODEB_GAP_LO + RNODEB_CAP * jax.nn.sigmoid(h)


# Angular node eta0^2(R) = sigmoid(head) in (0, 1); init at 1/3 (the P2
# Legendre nodes — the d-state angular structure of 3d sigma_g)
ETA_NODE_BIAS_INIT = float(np.log(0.5))


def node_eta0sq(params: dict, r: jax.Array) -> jax.Array:
    """Trainable squared angular node position eta0^2(R) (eta_node
    models): M(eta) vanishes at eta = +-eta0."""
    a = jax.nn.sigmoid(r[..., None] @ params["enode1"]["w"]
                       + params["enode1"]["b"])
    h = (a @ params["enode2"]["w"] + params["enode2"]["b"])[..., 0]
    return jax.nn.sigmoid(h)


def gz_exponent(params: dict, r: jax.Array, p_sym: int = 1,
                alpha=None) -> jax.Array:
    """Second GZ exponent b(R); 0 means pure LCAO.

    gerade (p_sym=+1): b = 0.75 (1 + tanh(head)) in (0, 1.5).
    ungerade (p_sym=-1): the antisymmetric physics part
    e^{-a r1 - b r2} - e^{-a r2 - b r1} VANISHES IDENTICALLY at b = a —
    an exact psi=0 collapse mode (observed: loss 2e-13). There b is bounded
    strictly below a:  b = (a - 0.25) (1 + tanh(head))/2.
    """
    if "beta1" not in params:
        return jnp.zeros_like(r)
    a_ = jax.nn.sigmoid(r[..., None] @ params["beta1"]["w"]
                        + params["beta1"]["b"])
    h = (a_ @ params["beta2"]["w"] + params["beta2"]["b"])[..., 0]
    if p_sym >= 0:
        return _BETA_HALF * (1.0 + jnp.tanh(h))
    alpha = jnp.ones_like(r) if alpha is None else alpha
    return (alpha - 0.25) * 0.5 * (1.0 + jnp.tanh(h))


def _envelopes(mcfg: ModelConfig, x, y, z, r, mirror_x=False, alpha=None):
    """exp(-alpha r1), exp(-alpha r2) for nuclei at (+/-R, +/-ry, +/-rz)
    (reference poc/main.py:269-284; alpha extension optional)."""
    xs = -x if mirror_x else x
    r1 = jnp.sqrt((xs - r) ** 2 + (y - mcfg.ry) ** 2 + (z - mcfg.rz) ** 2)
    r2 = jnp.sqrt((xs + r) ** 2 + (y + mcfg.ry) ** 2 + (z + mcfg.rz) ** 2)
    if alpha is None:
        return jnp.exp(-r1), jnp.exp(-r2)
    return jnp.exp(-alpha * r1), jnp.exp(-alpha * r2)


def lcao(mcfg: ModelConfig, x, y, z, r, params: dict | None = None) -> jax.Array:
    """Analytic LCAO part: exp(-a r1) + P exp(-a r2)
    (reference poc/main.py:286-293; a=1 unless the trainable exponent head
    is present in ``params``)."""
    alpha = None
    if params is not None and "alpha1" in params:
        alpha = orbital_exponent(params, r)
    f1, f2 = _envelopes(mcfg, x, y, z, r, alpha=alpha)
    return f1 + mcfg.inversion_symmetry * f2


def _base(params, f1, f2, r_feat=None):
    """The correction MLP body on stacked envelopes (reference
    poc/main.py:295-303), optionally with the scaled R feature appended
    (ModelConfig.r_input)."""
    feats = [f1, f2] + ([r_feat] if r_feat is not None else [])
    h = jnp.stack(feats, axis=-1)
    return _mlp2(h, params["h1"], params["h2"])


def _mlp_tanh(x, l1, l2, l3):
    """tanh MLP with linear output: the log-correction bodies of the
    separable arch (tanh: zero-centred, so zero output weights give an
    exactly-zero correction at init)."""
    y = jnp.tanh(x @ l1["w"] + l1["b"])
    y = jnp.tanh(y @ l2["w"] + l2["b"])
    return y @ l3["w"] + l3["b"]


# The log-correction of the separable arch is BOUNDED to |l + m| < 3
# (psi/Phi_GZ in [e^-3, e^3]): an unbounded exp correction has a
# quadrature-gaming mode under grid-trained variational objectives — the
# MLPs grow ~100x weights and carve delta-spikes between the quadrature
# nodes (observed: train-grid quotient -5.9e15 Ha, true energy +17 Ha).
# The physical correction is O(1), so the cap costs no capacity.
LOG_CORR_CAP = 3.0


def _transverse_harmonic(mcfg: ModelConfig, y, z):
    """Re[(y + i z)^m] — the harmonic transverse factor of an |m| = m_abs
    state (molecular axis along x): y for pi, y^2 - z^2 for delta. Carries
    the exact e^{i m phi} azimuthal structure and the
    [(xi^2-1)(1-eta^2)]^{m/2} boundary behaviour of the separated
    two-centre solutions; inversion-odd iff m is odd (total state parity =
    inversion_symmetry * (-1)^m). Returns (value, d/dy, d/dz); the
    laplacian is identically zero (harmonic polynomial)."""
    re, im = y, z
    for _ in range(mcfg.m_abs - 1):
        re, im = re * y - im * z, re * z + im * y
    # d/dw w^m = m w^{m-1}: grad(Re w^m) = m (Re w^{m-1}, -Im w^{m-1})
    if mcfg.m_abs == 1:
        gy = jnp.ones_like(y)
        gz = jnp.zeros_like(z)
    else:
        rp, ip = y, z
        for _ in range(mcfg.m_abs - 2):
            rp, ip = rp * y - ip * z, rp * z + ip * y
        gy = mcfg.m_abs * rp
        gz = -mcfg.m_abs * ip
    return re, gy, gz


def _psi_separable(params: dict, mcfg: ModelConfig, x, y, z, r):
    """Value-only forward of the separable-spheroidal family (see
    _init_separable)."""
    p_sym = mcfg.inversion_symmetry
    r1 = jnp.sqrt((x - r) ** 2 + (y - mcfg.ry) ** 2 + (z - mcfg.rz) ** 2)
    r2 = jnp.sqrt((x + r) ** 2 + (y + mcfg.ry) ** 2 + (z + mcfg.rz) ** 2)
    a = orbital_exponent(params, r)
    b = gz_exponent(params, r, p_sym, a)
    phi = (jnp.exp(-a * r1 - b * r2) + p_sym * jnp.exp(-a * r2 - b * r1))
    p_half = 0.5 * (r1 + r2)              # c*xi
    t = jnp.exp(r - p_half)               # e^{-c(xi-1)} in (0, 1]
    eta2 = (0.5 * (r1 - r2) / r) ** 2
    r_feat = 0.25 * r
    lam = _mlp_tanh(jnp.stack([t, r_feat], -1),
                    params["lam1"], params["lam2"], params["lamout"])
    mu = _mlp_tanh(jnp.stack([eta2, r_feat], -1),
                   params["mu1"], params["mu2"], params["muout"])
    c = LOG_CORR_CAP
    log_corr = c * jnp.tanh((lam[..., 0] + mu[..., 0]) / c)
    out = phi * jnp.exp(log_corr)
    if "node1" in params or "rnode1" in params:
        # radially excited states: one simple zero on the xi = xi0(R)
        # ellipsoid ((r1+r2)/2 = R xi0; the R factor is spatially constant
        # and absorbed by per-R normalisation)
        out = out * (p_half - r * node_xi0(params, r))
        if "rnodeb1" in params:
            # second radial node (3s sigma_g): a strictly larger ellipsoid
            out = out * (p_half - r * node_xi0(params, r)
                         - node_gap2(params, r))
    if "enode1" in params:
        # angularly excited sigma states (3d sigma_g): two symmetric
        # angular nodes at eta = +-eta0(R); eta^2 is even under inversion
        # so the factor leaves the parity with Phi_GZ
        out = out * (eta2 - node_eta0sq(params, r))
    if mcfg.m_abs:
        # pi/delta sectors: harmonic transverse factor Re[(y+iz)^m]
        h, _, _ = _transverse_harmonic(mcfg, y, z)
        out = out * h
    return out, energy(params, r)


def psi(params: dict, mcfg: ModelConfig, x, y, z, r):
    """Full ansatz forward: returns (psi, E), both shaped like x.

    x, y, z, r: (...,) arrays (R is the half internuclear distance per point).
    """
    if "lam1" in params:
        return _psi_separable(params, mcfg, x, y, z, r)
    e = energy(params, r)
    alpha = orbital_exponent(params, r) if "alpha1" in params else None
    f1, f2 = _envelopes(mcfg, x, y, z, r, alpha=alpha)
    g = gate(params, r)
    # r_input is inferred from the weight shape so checkpoints are
    # self-describing (config only controls initialisation)
    use_r = params["h1"]["w"].shape[0] == 3
    r_feat = (0.25 * r) if use_r else None
    if mcfg.arch == "minimal":
        # reference train.py:45-53
        h = _base(params, f1, f2, r_feat)
        nn = (2.0 * h) @ params["out"]["w"] + params["out"]["b"]
        out = f1 + f2 + nn[..., 0] * g
        return out, e
    # symmetric (poc): mirrored weight-shared branch
    f1m, f2m = _envelopes(mcfg, x, y, z, r, mirror_x=True, alpha=alpha)
    b = (_base(params, f1, f2, r_feat)
         + mcfg.inversion_symmetry * _base(params, f1m, f2m, r_feat))
    nn = b @ params["out"]["w"]
    if mcfg.inversion_symmetry > 0:
        # the constant output bias breaks EXACT antisymmetry for P=-1
        # (letting a variational objective leak toward the gerade ground
        # state), so it is applied only in the gerade sector. The reference
        # keeps it in both (poc/main.py:236) — a flaw, not a feature.
        nn = nn + params["out"]["b"]
    if "beta1" in params:
        # Guillemin-Zener physics part (LCAO is the b=0 special case)
        a_ = alpha if alpha is not None else jnp.ones_like(r)
        bt = gz_exponent(params, r, mcfg.inversion_symmetry, a_)
        r1 = jnp.sqrt((x - r) ** 2 + (y - mcfg.ry) ** 2 + (z - mcfg.rz) ** 2)
        r2 = jnp.sqrt((x + r) ** 2 + (y + mcfg.ry) ** 2 + (z + mcfg.rz) ** 2)
        n_lcao = (jnp.exp(-a_ * r1 - bt * r2)
                  + mcfg.inversion_symmetry * jnp.exp(-a_ * r2 - bt * r1))
    else:
        n_lcao = f1 + mcfg.inversion_symmetry * f2
    return nn[..., 0] * g + n_lcao, e


# ---------------------------------------------------------------------------
# Fused forward-Laplacian pass (the hot path)


def _base_fwdlap(params, s):
    s = fwdlap.linear(s, params["h1"]["w"], params["h1"]["b"])
    s = fwdlap.sigmoid(s)
    s = fwdlap.linear(s, params["h2"]["w"], params["h2"]["b"])
    return fwdlap.sigmoid(s)


def _flip_gx(s: fwdlap.Spatial) -> fwdlap.Spatial:
    """Convert gradients taken w.r.t. (-x, y, z) into gradients w.r.t.
    (x, y, z): negate the x row. The laplacian is mirror-invariant."""
    g = s.g.at[..., 0, :].multiply(-1.0)
    return fwdlap.Spatial(s.v, g, s.l)


def _psi_separable_fwdlap(params: dict, mcfg: ModelConfig, x, y, z, r):
    """Fused forward-Laplacian pass of the separable-spheroidal family."""
    p_sym = float(mcfg.inversion_symmetry)
    a = orbital_exponent(params, r)
    b = gz_exponent(params, r, mcfg.inversion_symmetry, a)
    ones = jnp.ones_like(r)
    c1 = (r, mcfg.ry * ones, mcfg.rz * ones)
    c2 = (-r, -mcfg.ry * ones, -mcfg.rz * ones)
    phi = fwdlap.add(fwdlap.gz_envelope(x, y, z, c1, c2, a, b),
                     fwdlap.scale(fwdlap.gz_envelope(x, y, z, c2, c1, a, b),
                                  jnp.asarray(p_sym, x.dtype)))
    r1s = fwdlap.radial_seed(x, y, z, *c1)
    r2s = fwdlap.radial_seed(x, y, z, *c2)
    # t = e^{r - (r1+r2)/2}; eta^2 = ((r1-r2)/(2r))^2; both even under
    # r1 <-> r2 exchange, so Phi alone carries the inversion parity
    p_half = fwdlap.scale(fwdlap.add(r1s, r2s), jnp.asarray(0.5, x.dtype))
    t = fwdlap.exp(fwdlap.add(fwdlap.scale(p_half, jnp.asarray(-1.0, x.dtype)),
                              fwdlap.const(r[..., None])))
    eta = fwdlap.scale(fwdlap.sub(r1s, r2s), (0.5 / r)[..., None])
    eta2 = fwdlap.mul(eta, eta)
    r_feat = fwdlap.const((0.25 * r)[..., None])

    def body(s, l1, l2, l3):
        # the only SPATIAL input is the single scalar s (R is constant in
        # space), so the body runs on 1-D derivative triples and the chain
        # rule is applied once — 3/5 of the full-tuple math (fwdlap.seed1d)
        tr = fwdlap.seed1d(s.v, [r_feat.v], params[l1]["w"],
                           params[l1]["b"])
        tr = fwdlap.tanh1d(tr)
        tr = fwdlap.tanh1d(fwdlap.linear1d(tr, params[l2]["w"],
                                           params[l2]["b"]))
        return fwdlap.chain(
            fwdlap.linear1d(tr, params[l3]["w"], params[l3]["b"]), s)

    lam = body(t, "lam1", "lam2", "lamout")
    mu = body(eta2, "mu1", "mu2", "muout")
    c = jnp.asarray(LOG_CORR_CAP, x.dtype)
    bounded = fwdlap.scale(
        fwdlap.tanh(fwdlap.scale(fwdlap.add(lam, mu), 1.0 / c)), c)
    corr = fwdlap.exp(bounded)
    out = fwdlap.mul(phi, corr)
    if "node1" in params or "rnode1" in params:
        q = fwdlap.add(p_half,
                       fwdlap.const(-(r * node_xi0(params, r))[..., None]))
        out = fwdlap.mul(out, q)
        if "rnodeb1" in params:
            q2 = fwdlap.add(
                p_half,
                fwdlap.const(-(r * node_xi0(params, r)
                               + node_gap2(params, r))[..., None]))
            out = fwdlap.mul(out, q2)
    if "enode1" in params:
        q = fwdlap.add(eta2,
                       fwdlap.const(-node_eta0sq(params, r)[..., None]))
        out = fwdlap.mul(out, q)
    if mcfg.m_abs:
        # harmonic transverse factor: grad is closed-form, laplacian is
        # EXACTLY zero, so the product rule costs one mul + one dot
        h, gy, gz = _transverse_harmonic(mcfg, y, z)
        zero = jnp.zeros_like(h)
        hs = fwdlap.Spatial(
            h[..., None],
            jnp.stack([zero, gy, gz], axis=-1)[..., None],
            zero[..., None])
        out = fwdlap.mul(out, hs)
    return out, energy(params, r)


def psi_fwdlap(params: dict, mcfg: ModelConfig, x, y, z, r):
    """Fused pass returning (Spatial(psi), E): psi, grad psi and lap psi in a
    single forward traversal — replaces the reference's 6-pass
    ``autograd.grad`` chain (poc/main.py:82-97) with closed-form propagation.
    """
    if "lam1" in params:
        return _psi_separable_fwdlap(params, mcfg, x, y, z, r)
    e = energy(params, r)
    g_r = gate(params, r)[..., None]  # (..., 1), spatially constant
    p = float(mcfg.inversion_symmetry)
    alpha = orbital_exponent(params, r) if "alpha1" in params else None

    f1 = fwdlap.orbital_envelope(x, y, z, r, mcfg.ry, mcfg.rz, alpha)
    f2 = fwdlap.orbital_envelope(x, y, z, -r, -mcfg.ry, -mcfg.rz, alpha)
    use_r = params["h1"]["w"].shape[0] == 3
    extra = ([fwdlap.const((0.25 * r)[..., None])] if use_r else [])

    if mcfg.arch == "minimal":
        s = fwdlap.concat([f1, f2] + extra)
        s = _base_fwdlap(params, s)
        s = fwdlap.scale(s, jnp.asarray(2.0, s.v.dtype))
        s = fwdlap.linear(s, params["out"]["w"], params["out"]["b"])
        s = fwdlap.scale(s, g_r)
        out = fwdlap.add(fwdlap.add(f1, f2), s)
        return out, e

    # symmetric: mirrored branch evaluated at -x, gradients re-oriented
    f1m = _flip_gx(fwdlap.orbital_envelope(-x, y, z, r, mcfg.ry, mcfg.rz,
                                           alpha))
    f2m = _flip_gx(fwdlap.orbital_envelope(-x, y, z, -r, -mcfg.ry, -mcfg.rz,
                                           alpha))
    b = _base_fwdlap(params, fwdlap.concat([f1, f2] + extra))
    bm = _base_fwdlap(params, fwdlap.concat([f1m, f2m] + extra))
    s = fwdlap.add(b, fwdlap.scale(bm, jnp.asarray(p, b.v.dtype)))
    # output bias only in the gerade sector (see psi(): exact antisymmetry)
    out_bias = params["out"]["b"] if mcfg.inversion_symmetry > 0 else None
    s = fwdlap.linear(s, params["out"]["w"], out_bias)
    s = fwdlap.scale(s, g_r)
    if "beta1" in params:
        a_ = alpha if alpha is not None else jnp.ones_like(r)
        bt = gz_exponent(params, r, mcfg.inversion_symmetry, a_)
        c1 = (r, mcfg.ry * jnp.ones_like(r), mcfg.rz * jnp.ones_like(r))
        c2 = (-r, -mcfg.ry * jnp.ones_like(r), -mcfg.rz * jnp.ones_like(r))
        gz1 = fwdlap.gz_envelope(x, y, z, c1, c2, a_, bt)
        gz2 = fwdlap.gz_envelope(x, y, z, c2, c1, a_, bt)
        n_lcao = fwdlap.add(gz1, fwdlap.scale(gz2, jnp.asarray(p, x.dtype)))
    else:
        n_lcao = fwdlap.add(f1, fwdlap.scale(f2, jnp.asarray(p, f2.v.dtype)))
    return fwdlap.add(s, n_lcao), e


def param_count(params: dict) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
