"""Typed, immutable configuration for the TPU-native H2+ PINN framework.

Replaces the reference's mutable ``set_params()`` dict (reference
``poc/main.py:16-45``) and the module-level constants of the minimal trainer
(reference ``train.py:75-109``) with a frozen dataclass that is hashable (so it
can be a static argument under ``jax.jit``).

Conventions:
- ``R`` is the *half* internuclear distance; the nuclei sit at ``(+/-R, ry, rz)``
  (reference ``poc/main.py:101-108``). Total energy = E_electronic + 1/(2R).
- All lengths in Bohr, energies in Hartree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the parametric ansatz psi(x, y, z; R).

    Defaults mirror the paper model (reference ``poc/main.py:225-245``):
    correction MLP 2->16->16 (sigmoid), output head 16->1, gate 1->10->1,
    eigenvalue head 1->32->32->1 with output bias initialised to -1.
    """

    # "symmetric" (poc) | "minimal" (train.py) | "separable" (beyond the
    # reference: psi = GZ(x;R) * exp(l(xi;R) + m(eta^2;R)) — a log-space
    # correction SEPARABLE in prolate-spheroidal coordinates, the exact
    # structure of the two-centre eigenfunctions Lambda(xi) M(eta). Per-R
    # capacity is then limited only by smooth 1-D approximation, which
    # breaks through the ~0.2 mHa floor of the gate*NN(f1,f2) family.)
    arch: str = "symmetric"
    hidden: int = 16         # correction-MLP width     (dense_neurons)
    hidden_e: int = 32       # eigenvalue-head width    (dense_neurons_E)
    hidden_gate: int = 10    # gate width               (netDecay_neurons)
    inversion_symmetry: int = 1  # P = +1 gerade (1s sigma_g), -1 ungerade (2p sigma_u)
    ry: float = 0.0          # nuclei offset in y (reference params['Ry'])
    rz: float = 0.0          # nuclei offset in z (reference params['Rz'])
    eout_bias_init: float = -1.0  # reference poc/main.py:240
    # Trainable orbital exponent alpha(R) on the envelopes e^{-alpha r}
    # (an extension over the reference's fixed alpha=1: the optimal H2+
    # exponent runs from ~2 at the united-atom limit to 1 at dissociation,
    # and the tail decay rate encodes the eigenvalue). alpha(R) = 1 + small
    # MLP head, initialised to exactly 1 for backward compatibility.
    trainable_exponent: bool = False
    hidden_alpha: int = 8
    # Feed R into the correction MLP (input (f1, f2, R/4) instead of
    # (f1, f2)). The reference's correction is gate(R) * B(f1, f2) — rank-1
    # in R: two points with equal (r1, r2) at different bond lengths get the
    # SAME correction shape. Variational-optimum experiments show this is the
    # binding constraint (~14 mHa bonding-band error at width 16 AND 32).
    r_input: bool = False
    # Guillemin-Zener physics part: replace the LCAO envelopes with the
    # classical two-centre form e^{-a r1 - b r2} + P e^{-a r2 - b r1}
    # (LCAO is b = 0). GZ alone reaches ~0.3 mHa at the H2+ equilibrium —
    # it removes most of the bonding-band error the LCAO+NN family
    # saturates at. b(R) is a bounded head in (0, 1.5), initialised to 0.1.
    gz: bool = False
    # Radial node factor for RADIALLY EXCITED sigma states (2s sigma_g,
    # 3p sigma_u): psi gains a trainable factor (xi - xi0(R)) with the node
    # position xi0(R) = 1 + 8 sigmoid(head(R)) in (1, 9). The exact excited
    # Lambda(xi) has exactly one simple zero, so Lambda/(xi - xi0) is
    # smooth and positive — the separable log-correction represents the
    # rest exactly. exp(...) > 0 keeps every collapse mode ruled out; the
    # factor is symmetric under r1 <-> r2 so inversion parity is untouched.
    # Separable arch only.
    xi_node: bool = False
    # Second radial node factor for DOUBLY radially excited states
    # (3s sigma_g): a second simple zero on a strictly LARGER ellipsoid,
    # physical radius = first node's + gap(R) bounded in (0.3, 8.3) bohr
    # (the positive margin keeps the zeros simple — coincident nodes would
    # square the factor and lose the sign change). Requires xi_node;
    # separable arch only.
    xi_node2: bool = False
    # Angular node factor for ANGULARLY excited sigma states (3d sigma_g):
    # psi gains (eta^2 - eta0^2(R)) with eta0^2(R) = sigmoid(head(R)) in
    # (0, 1) — the exact M(eta) of a d-like sigma state has two symmetric
    # nodes at +-eta0 (P2's are at eta^2 = 1/3, the init). Even in eta, so
    # inversion parity is untouched. Separable arch only.
    eta_node: bool = False
    # |m|, the axial angular momentum of the target sector (0 sigma, 1 pi,
    # 2 delta...). For m > 0 the ansatz gains the HARMONIC transverse
    # factor Re[(y + i z)^m] (= y for pi, y^2 - z^2 for delta with the
    # molecular axis along x): it carries the exact e^{i m phi} azimuthal
    # structure AND the [(xi^2-1)(1-eta^2)]^{m/2} boundary behaviour of
    # the separated two-centre solutions, is polynomial (laplacian ZERO —
    # one cheap product rule in the fused pass), and its cos^2(m phi)
    # factor cancels exactly in every Rayleigh-quotient RATIO on the
    # phi = 0 half-plane quadrature. The total inversion parity of the
    # state is inversion_symmetry * (-1)^m (the factor is inversion-odd
    # for odd m): 2p pi_u = gerade envelope * y; 3d pi_g = ungerade
    # envelope * y. Separable arch only.
    m_abs: int = 0
    # Wide orbital-exponent range alpha(R) in (0.3, 2.25) (params key
    # "xalpha*") instead of the default (0.75, 2.25). Excited-manifold
    # states dissociate to H(n >= 2) whose tails need alpha = 1/n — e.g.
    # H(3d) wants 1/3, and the 3d delta_g surface measured the default
    # bound binding (large-R-dominated error). The lower edge stays above
    # 0.25 + epsilon so the ungerade b < alpha - 0.25 bound keeps b > 0,
    # and strictly positive so the alpha -> 0 inflation mode stays
    # excluded. Separable arch only; legacy checkpoints are params-keyed.
    wide_alpha: bool = False

    def __post_init__(self):
        if self.arch not in ("symmetric", "minimal", "separable"):
            raise ValueError(f"unknown arch {self.arch!r}")
        if self.inversion_symmetry not in (-1, 1):
            raise ValueError("inversion_symmetry must be +1 or -1")
        if self.m_abs < 0:
            raise ValueError("m_abs must be >= 0")
        if self.m_abs and self.arch != "separable":
            raise ValueError("m_abs > 0 (pi/delta sectors) requires the "
                             "separable arch")
        if self.wide_alpha and self.arch != "separable":
            raise ValueError("wide_alpha requires the separable arch")


@dataclasses.dataclass(frozen=True)
class DomainConfig:
    """Collocation / quadrature domain (reference ``poc/main.py:18-30``)."""

    box: float = 18.0        # half-width of the sampling cube
    bc_cutoff: float = 17.5  # boundary-decay penalty radius (BCcutoff)
    r_lo: float = 0.2        # half-distance range lower bound (RxL)
    r_hi: float = 4.0        # upper bound (RxR); train.py uses 3.0
    cutoff: float = 0.005    # nuclear-singularity clamp (cutOff)
    # Prolate-spheroidal quadrature extent (ABSOLUTE, bohr): xi covers
    # r1+r2 up to 2R + 2*xi_span. 20 suffices for alpha >= 0.75 envelopes
    # (psi^2 < 1e-13 at the edge); DIFFUSE states need more — the wide-alpha
    # n=4 4f phi_u (alpha ~ 0.3) loses ~1e-3 mHa of tail at 20 and its
    # evaluated quotient dips BELOW the exact level (measured round 4:
    # span-20 eval at R=1 read -0.0004 mHa signed; span-40 reads +0.0004,
    # variationally honest). CLI: --xi-span; recorded in artifact meta.
    xi_span: float = 20.0
    # R-row layout of the deterministic variational objective. "uniform"
    # is linspace(r_lo, r_hi, n_r); "log" clusters rows in log(R + 0.3)
    # like the etab knots — the surface's curvature grows ~(R + 0.3)^-5
    # toward the united-atom end, and a uniform 39-row grid gives R = 0.2
    # only 1/39 of the mean objective, which is why the excited surfaces'
    # errors are R=0.2-dominated (round-4 measurement: 3dsg stuck at
    # 0.087 mHa there after +400 dense steps on uniform rows).
    r_cluster: str = "uniform"   # "uniform" | "log"
    fixed_r: Optional[float] = None  # per-R ("legacy multi-model") mode: train at one R
    # Collocation measure. "uniform" is the reference's sampler (whole +-box
    # cube — ~99% of which has psi ~ 0). "mixed" draws `focus_frac` of the
    # points from exponential shells of scale `focus_scale` around the two
    # nuclei (where the residual actually constrains psi) and the rest
    # uniform (keeps the boundary-decay sets populated).
    sampler: str = "uniform"     # "uniform" | "mixed"
    focus_frac: float = 0.3
    focus_scale: float = 1.0     # Gamma(3, scale) radius: mean 3*scale bohr
    # keep focused points OUT of the clamped cusp shell: radii below the
    # floor make the (clamped) residual blow up and hijack the mean loss
    focus_floor: float = 0.15


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimisation schedule (reference ``poc/main.py:36-44`` and ``train.py``)."""

    n_train: int = 100_000       # collocation batch size
    n_test: int = 80             # quadrature grid points per axis (n_test^3 grid)
    epochs: int = 5_000
    lr: float = 8e-3
    resample_every: int = 1      # sc_sampling
    resample_frac: float = 0.9   # resampling stops after this fraction of epochs
    best_after_frac: float = 0.5 # poc: persist best model only after 50% of epochs
    seed: int = 12345            # train.py:75 (poc sets no seed)
    # Step-decay LR schedule (reference poc/main.py:36-37,367-369 creates
    # StepLR(step=3000, gamma=0.7) but comments out scheduler.step() at
    # poc/main.py:405-406 — so "none" reproduces the effective behaviour and
    # "step" enables what the config intended).
    lr_schedule: str = "none"    # "none" | "step"
    sc_step: int = 3000
    sc_decay: float = 0.7
    # Polyak / exponential moving average of params (0 = off). Long f32 runs
    # random-walk late in training; the EMA iterate is the stable estimator.
    ema_decay: float = 0.0
    # Residual weighting. "none" = the reference's plain mean(res^2).
    # "lcao" = weight each squared residual by the (normalised) LCAO density
    # psi_lcao^2 plus a uniform floor — the VMC local-energy-variance
    # principle: the variational energy error is controlled by the
    # psi-weighted residual norm, which plain uniform weighting under-counts
    # exactly where the energy integrals live.
    residual_weight: str = "none"   # "none" | "lcao"
    residual_weight_floor: float = 0.05
    # Scale-invariant loss: divide L_pde and L_bc by mean(psi^2). The plain
    # loss has a trivial-collapse mode — res^2 scales with psi^2, so the
    # gated correction cancelling the LCAO amplitude lowers the loss without
    # improving physics (the reference knew: its disabled anti-trivial term,
    # poc/main.py:353-354). Normalising removes the incentive exactly;
    # verified to be what degrades long runs (psi norm shrank 10-40x in a
    # 50k-epoch run before this).
    scale_invariant: bool = False
    # Correction-size regulariser: lambda * mean((psi - LCAO)^2)/mean(LCAO^2)
    # keeps the gated neural correction SMALL relative to the physics prior —
    # the ansatz's own design intent. Blocks the cancellation-collapse mode
    # (gate*NN eating the LCAO amplitude on long runs) without touching the
    # loss's scale structure or eigenstate anchoring. 0 = off.
    correction_reg: float = 0.0
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8
    scan_chunk: int = 250        # steps per jitted lax.scan chunk (host io boundary)
    # Residual evaluation kernel for the training hot path. "xla" = the
    # fused forward-Laplacian pass under XLA autodiff; "pallas" = the
    # hand-fused Pallas train kernel with custom VJP (ops/pallas_train.py) —
    # symmetric-arch models incl. the alpha/GZ flagship, float32.
    kernel: str = "xla"          # "xla" | "pallas"
    # Rematerialise the fused forward-Laplacian pass in the backward
    # instead of keeping its residuals in HBM (jax.checkpoint). Measured
    # (RESULTS.md): on this width-16 family remat LOSES at every feasible
    # batch size (0.80x at n=1M, 0.76x at n=8M — the recompute's ~29%
    # extra FLOPs are never repaid), so the default stays off; the flag
    # exists because the trade flips for much wider models.
    remat: bool = False

    def __post_init__(self):
        if self.kernel not in ("xla", "pallas"):
            raise ValueError(f"unknown kernel {self.kernel!r}")


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level config: model + domain + training + numerics."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    domain: DomainConfig = dataclasses.field(default_factory=DomainConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    # Residual convention. "poc": res = (-1/2 lap - 1/r1 - 1/r2 - E) psi
    # (reference poc/main.py:118-120,345 — canonical, matches the Wind table).
    # "minimal": res = lap psi + (e + 1/r1 + 1/r2) psi (reference train.py:54;
    # its `e` is NOT the Hartree electronic energy — kept for model.bin parity).
    convention: str = "poc"

    # Compute dtype for the training path. float32 is the TPU-native default;
    # float64 is the reference-parity mode (requires jax_enable_x64).
    dtype: str = "float32"

    # Number of boundary-mask slots reserved per batch: the boundary loss uses
    # masked fixed-shape means (no data-dependent indexing under jit).
    def __post_init__(self):
        if self.convention not in ("poc", "minimal"):
            raise ValueError(f"unknown convention {self.convention!r}")
        if self.dtype not in ("float32", "float64", "bfloat16"):
            raise ValueError(f"unknown dtype {self.dtype!r}")

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def paper_config(**overrides) -> Config:
    """The configuration of the paper run (reference ``poc/main.py:16-45``)."""
    return Config(**overrides)


def minimal_config(**overrides) -> Config:
    """The configuration of the minimal trainer (reference ``train.py:78-87``):
    n=10000 points, R in [0.2, 3], epochs=1000, the `minimal` architecture and
    residual convention."""
    base = Config(
        model=ModelConfig(arch="minimal"),
        domain=DomainConfig(r_hi=3.0),
        # train.py resamples every epoch with no 90% cutoff (train.py:26)
        train=TrainConfig(n_train=10_000, epochs=1_000, resample_frac=1.0),
        convention="minimal",
    )
    return dataclasses.replace(base, **overrides)


def finetune_config(base: Config | None = None, **overrides) -> Config:
    """Stage-2 fine-tune schedule (reference ``poc/main.py:930-941``):
    lr 5e-4, 2000 epochs, same batch size; wavefunction nets frozen by the
    caller via ``training.engine.finetune``."""
    base = base or Config()
    cfg = dataclasses.replace(
        base, train=dataclasses.replace(base.train, lr=5e-4, epochs=2_000))
    return dataclasses.replace(cfg, **overrides)


def smoke_config(**overrides) -> Config:
    """Tiny config for tests/CI: small batch, few epochs."""
    base = Config(
        train=TrainConfig(n_train=512, epochs=20, scan_chunk=10),
    )
    return dataclasses.replace(base, **overrides)
