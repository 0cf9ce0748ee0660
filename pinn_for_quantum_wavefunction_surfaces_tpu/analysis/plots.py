"""Figure generation: loss curves, E(R) surface panels, gate, psi cuts.

Rebuilds the reference's figure outputs (reference ``plotLoss``
poc/main.py:189-217; paper panels poc/main.py:729-813,888-910; quick plots
``energy.py:25-35`` / ``plot.py:28-57``) from this framework's artifacts.
All functions save to files (headless Agg backend) and return the path.
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..config import Config
from ..models import ansatz
from . import energy as aen
from . import probes


def _save(fig, path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path


def loss_figure(history: dict, path: str = "figures/loss_figure.jpg",
                epochs_mark: int | None = None) -> str:
    """Two-panel loss/energy history (reference plotLoss)."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))
    ax1.plot(history["Ltot"], label="total", lw=2)
    ax1.plot(history["Lpde"], label="pde", lw=1)
    ax1.plot(history["Lbc"], label="bc", lw=1)
    ax1.set_yscale("log")
    ax1.set_xlabel("epochs")
    ax1.set_ylabel("Loss")
    ax1.legend()
    ax2.plot(history["Energy"], "-k", lw=1)
    ax2.set_xlabel("epochs")
    ax2.set_ylabel("Energy")
    if epochs_mark is not None:
        for ax in (ax1, ax2):
            ax.axvline(epochs_mark, c="r", ls="--", alpha=0.7)
    fig.tight_layout()
    return _save(fig, path)


def energy_curve_figure(params, cfg: Config, path: str = "figures/energy.png",
                        total: bool = True) -> str:
    """E(R) from the eigenvalue head (reference energy.py:25-35; plots the
    total energy e + 1/(2R))."""
    r, e = probes.energy_curve(params, cfg, total=total)
    fig, ax = plt.subplots()
    ax.plot(r, e, "b")
    ax.set_xlabel("R (bohr, half-distance)")
    ax.set_ylabel("E + 1/(2R) (Ha)" if total else "E (Ha)")
    return _save(fig, path)


def surface_figure(surf: dict, path: str = "figures/energy_surface.pdf") -> str:
    """E(R) surface panel: E_net, E_int, LCAO baseline vs the Wind exact
    table, with an error subpanel (reference poc/main.py:974-1001)."""
    r = np.asarray(surf["R"])
    exact = aen.exact_energy(r)
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 8), sharex=True,
                                   height_ratios=[2, 1])
    ax1.plot(r, exact, "k-", label="exact (Wind 1965)")
    ax1.plot(r, surf["E_net"], "b.-", label="E_net (eigenvalue head)")
    ax1.plot(r, surf["E_int"], "g--", label=r"$\langle\psi|H|\psi\rangle$")
    if np.any(surf.get("Elcao", 0)):
        ax1.plot(r, surf["Elcao"], "r:", label="LCAO baseline")
    ax1.set_ylabel("E (Ha)")
    ax1.legend()
    ax2.plot(r, 1e3 * (surf["E_net"] - exact), "b.-", label="E_net")
    ax2.plot(r, 1e3 * (surf["E_int"] - exact), "g--", label="E_int")
    ax2.axhline(0, c="k", lw=0.5)
    ax2.set_xlabel("R (bohr, half-distance)")
    ax2.set_ylabel("error (mHa)")
    ax2.legend()
    fig.tight_layout()
    return _save(fig, path)


def spectrum_figure(states: dict, path: str = "figures/spectrum.pdf") -> str:
    """Excited-state spectrum panel (beyond the reference, which only ever
    reaches the lowest state of each inversion sector): one E(R) curve per
    trained state vs its exact two-centre ODE oracle, with a signed-error
    subpanel in mHa.

    states: {oracle_state_name: surf} with surf as returned by
    ``analysis.energy.surface`` (keys R, E_int and optionally E_net).
    """
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 8), sharex=True,
                                   height_ratios=[2, 1])
    colors = plt.cm.tab10(np.linspace(0, 1, 10))
    for i, (state, surf) in enumerate(states.items()):
        r = np.asarray(surf["R"])
        exact = aen.exact_energy_ode(r, state=state)
        c = colors[i % 10]
        ax1.plot(r, exact, "-", c=c, lw=1, alpha=0.6)
        ax1.plot(r, surf["E_int"], ".", c=c, ms=4, label=state)
        ax2.plot(r, 1e3 * (np.asarray(surf["E_int"]) - exact), ".-", c=c,
                 lw=0.8, ms=3, label=state)
    ax1.set_ylabel("E (Ha)")
    ax1.legend(title="state (lines: exact ODE)")
    ax2.axhline(0, c="k", lw=0.5)
    ax2.set_xlabel("R (bohr, half-distance)")
    ax2.set_ylabel("E_int - exact (mHa)")
    fig.tight_layout()
    return _save(fig, path)


def gate_figure(params, cfg: Config, path: str = "figures/gate.pdf") -> str:
    """The gate / network-importance function f(R) (reference
    poc/main.py:1092-1111)."""
    r, g, label = probes.importance_curve(params, cfg)
    fig, ax = plt.subplots()
    ax.plot(r, g, "b")
    ax.set_xlabel("R (bohr, half-distance)")
    ax.set_ylabel(label)
    return _save(fig, path)


def exponent_figure(params, cfg: Config,
                    path: str = "figures/exponents.pdf") -> str | None:
    """Learned orbital exponents alpha(R) and b(R) (capability beyond the
    reference — its envelopes are fixed at alpha=1, b=0). Returns None for
    fixed-exponent models."""
    import jax.numpy as jnp
    from ..models import ansatz
    if "alpha1" not in params and "beta1" not in params:
        return None
    r = np.linspace(cfg.domain.r_lo, cfg.domain.r_hi, 400)
    rj = jnp.asarray(r)
    a = np.asarray(ansatz.orbital_exponent(params, rj))
    b = np.asarray(ansatz.gz_exponent(params, rj,
                                      cfg.model.inversion_symmetry,
                                      jnp.asarray(a)))
    fig, ax = plt.subplots()
    ax.plot(r, a, "b", label=r"$\alpha(R)$ (primary)")
    ax.plot(r, b, "r", label=r"$b(R)$ (Guillemin-Zener)")
    if "node1" in params:
        ax.plot(r, np.asarray(ansatz.node_xi0(params, rj)), "g--",
                label=r"$\xi_0(R)$ (radial node)")
    if "enode1" in params:
        ax.plot(r, np.sqrt(np.asarray(ansatz.node_eta0sq(params, rj))),
                "m--", label=r"$\eta_0(R)$ (angular node)")
    ax.axhline(1.0, c="k", ls=":", alpha=0.5)
    ax.set_xlabel("R (bohr, half-distance)")
    ax.set_ylabel("orbital exponent")
    ax.legend()
    return _save(fig, path)


def psi_cut_figure(params, cfg: Config, ri: float,
                   path: str | None = None, normalized: bool = False,
                   diff: bool = False) -> str:
    """psi(x, 0, 0) vs the LCAO part at fixed R (reference plot.py:28-57:
    R{1,2}.png and the difference panels R{1,2}e.png)."""
    if normalized:
        ax_x, psi, psi_l = probes.psi_cut_x_norm(params, cfg, ri)
    else:
        ax_x, psi, psi_l = probes.psi_cut_x(params, cfg, ri)
    path = path or f"figures/R{ri:g}{'e' if diff else ''}.png"
    fig, ax = plt.subplots()
    if diff:
        ax.plot(ax_x, psi - psi_l, "r")
        ax.set_ylabel(r"$\psi - \psi_{LCAO}$")
    else:
        ax.plot(ax_x, psi, "b", label=r"$\psi$")
        ax.plot(ax_x, psi_l, "r", label="LCAO")
        ax.legend()
        ax.set_ylabel(r"$\psi(x, 0, 0)$")
    ax.set_xlabel("x (bohr)")
    return _save(fig, path)


def psi_surface_figure(params, cfg: Config, ri: float,
                       path: str | None = None, n: int = 120,
                       half_width: float = 6.0, normalized: bool = True) -> str:
    """3-D surface of psi(x, y, z=0) at fixed R (reference fig_R3-style
    panel, poc/main.py:1098-1166)."""
    import jax.numpy as jnp
    from ..models import ansatz as _ansatz
    ax = np.linspace(-half_width, half_width, n)
    xg, yg = np.meshgrid(ax, ax, indexing="ij")
    z = np.zeros_like(xg.ravel())
    psi, _ = _ansatz.psi(params, cfg.model, jnp.asarray(xg.ravel()),
                         jnp.asarray(yg.ravel()), jnp.asarray(z),
                         jnp.full_like(jnp.asarray(z), ri))
    psi = np.asarray(psi).reshape(n, n)
    if normalized:
        from . import probes
        npsi, _ = probes.normalization(params, cfg, ri)
        psi = psi * npsi
    path = path or f"figures/psi_surface_R{ri:g}.pdf"
    fig = plt.figure(figsize=(7, 6))
    ax3 = fig.add_subplot(projection="3d")
    ax3.plot_surface(xg, yg, psi, cmap="viridis", linewidth=0)
    ax3.set_xlabel("x (bohr)")
    ax3.set_ylabel("y (bohr)")
    ax3.set_zlabel(r"$\psi(x, y, 0)$")
    ax3.set_title(f"R = {ri:g}")
    return _save(fig, path)


def dispersion_figure(sweep_out: dict, path: str = "figures/dispersion.pdf",
                      parametric_surface: dict | None = None) -> str:
    """E(R) from the per-R model family vs the exact table — the legacy
    'multi-model' dispersion plot (reference ``plot_EforR``,
    poc/main.py:845-870), optionally overlaying the parametric model's
    surface. Energies shown as total E + 1/(2R)."""
    r = np.asarray(sweep_out["R"])
    fig, ax = plt.subplots()
    exact_r = np.linspace(r.min(), r.max(), 200)
    ax.plot(exact_r, aen.exact_energy(exact_r) + 0.5 / exact_r, "k-",
            label="exact (Wind 1965)")
    ax.plot(r, sweep_out["E_net"] + 0.5 / r, "bo", label="per-R models")
    if parametric_surface is not None:
        rp = np.asarray(parametric_surface["R"])
        ax.plot(rp, parametric_surface["E_net"] + 0.5 / rp, "g--",
                label="parametric E(R)")
    ax.set_xlabel("R (bohr, half-distance)")
    ax.set_ylabel("E + 1/(2R) (Ha)")
    ax.legend()
    return _save(fig, path)


def dispersion_gap_figure(sweeps: dict, path: str = "figures/dispersion.pdf",
                          parametric: dict | None = None,
                          oracle: str = "ode") -> str:
    """The variational-gap-per-R picture (the payoff of the deterministic
    per-R polish, reference counterpart ``plot_EforR`` poc/main.py:880-910):

    top — E + 1/(2R) for each per-R-polished family vs the exact curve;
    bottom — signed per-R error vs the exact ODE oracle on a log scale,
    one line per ansatz family (their per-R variational floors), plus the
    parametric flagship surface if given (the single-model-vs-family gap).

    ``sweeps``: {label: sweep_out} from training.sweep.polish_per_r.
    """
    fig, (ax, axe) = plt.subplots(
        2, 1, figsize=(6.4, 7.2), sharex=True,
        gridspec_kw={"height_ratios": [2, 1.4]})
    rs = np.concatenate([np.asarray(s["R"]) for s in sweeps.values()])
    exact_r = np.linspace(rs.min(), rs.max(), 200)
    exact_fn = (aen.exact_energy_ode if oracle == "ode" else
                aen.exact_energy)
    ax.plot(exact_r, exact_fn(exact_r) + 0.5 / exact_r, "k-", lw=1,
            label="exact (ODE oracle)")
    markers = ["o", "s", "^", "d"]
    for i, (label, out) in enumerate(sweeps.items()):
        r = np.asarray(out["R"])
        e = np.asarray(out["E_net"])
        ax.plot(r, e + 0.5 / r, markers[i % 4], ms=3.5, label=label)
        axe.semilogy(r, np.maximum(1e3 * (e - exact_fn(r)), 1e-9),
                     markers[i % 4] + "-", ms=3.5, lw=0.8, label=label)
    if parametric is not None:
        rp = np.asarray(parametric["R"])
        axe.semilogy(rp, np.maximum(
            1e3 * (np.asarray(parametric["E_int"]) - exact_fn(rp)), 1e-9),
            "k--", lw=1, label="parametric flagship (E_int)")
    ax.set_ylabel("E + 1/(2R) (Ha)")
    ax.legend(fontsize=8)
    axe.set_xlabel("R (bohr, half-distance)")
    axe.set_ylabel("E - E_exact (mHa)")
    axe.legend(fontsize=7)
    axe.grid(True, which="both", alpha=0.25)
    return _save(fig, path)


def paper_grid_figure(params, cfg: Config, surf: dict,
                      path: str = "figures/fig2.pdf",
                      cut_rs=(4.0, 3.0, 2.0, 1.0)) -> str:
    """The paper's headline composite (reference fig2.pdf,
    poc/main.py:1174-1260): left column PES + error + gate, right column
    normalised psi cuts at R = 4, 3, 2, 1."""
    import jax.numpy as jnp
    r = np.asarray(surf["R"])
    exact = aen.exact_energy(r)
    rr = np.linspace(cfg.domain.r_lo, cfg.domain.r_hi, 400)
    e_net_curve = np.asarray(ansatz.energy(params, jnp.asarray(rr)))
    fig = plt.figure(figsize=(18, 10))
    ax1 = plt.subplot2grid((4, 4), (0, 0), colspan=2, rowspan=2)
    plt.tick_params("x", labelbottom=False)
    ax1.plot(r, exact + 0.5 / r, "k.", label="Ground truth")
    if np.any(surf.get("Elcao", 0)):
        ax1.plot(r, surf["Elcao"] + 0.5 / r, "*m", label="LCAO")
    ax1.plot(r, surf["E_int"] + 0.5 / r, "go", fillstyle="none",
             label=r"$\langle\psi|\hat H|\psi\rangle$")
    ax1.plot(rr, e_net_curve + 0.5 / rr, "b-", label="Neural E")
    ax1.legend(frameon=False)
    ax1.set_ylabel("Energy (AU)")
    ax2 = plt.subplot2grid((4, 4), (2, 0), colspan=2, sharex=ax1)
    plt.tick_params("x", labelbottom=False)
    ax2.plot(r, surf["E_int"] - exact, "go", fillstyle="none")
    if np.any(surf.get("Elcao", 0)):
        ax2.plot(r, surf["Elcao"] - exact, "*m")
    ax2.plot(r, surf["E_net"] - exact, "b")
    ax2.axhline(0, c="k", ls="--", alpha=0.9)
    ax2.set_ylabel("Error (AU)")
    ax3 = plt.subplot2grid((4, 4), (3, 0), colspan=2, sharex=ax1)
    rg, gate, glabel = probes.importance_curve(params, cfg)
    ax3.plot(rg, gate, "c")
    ax3.set_ylabel("Gate" if "gate" in glabel else glabel)
    ax3.set_xlabel("$R/2$")
    ax_top = None
    for i, ri in enumerate(cut_rs):
        axp = plt.subplot2grid((4, 4), (i, 2), colspan=2,
                               sharex=ax_top)
        ax_top = ax_top or axp
        xs, p, pl_ = probes.psi_cut_x_norm(params, cfg, float(ri))
        axp.plot(xs, p, "b", label=r"Neural $\psi$")
        axp.plot(xs, pl_, "--m", label="LCAO")
        for s in (-ri, ri):
            axp.axvline(s, c="k", ls=":", alpha=0.9)
        axp.set_yticks([])
        if i == len(cut_rs) - 1:
            axp.legend(frameon=False)
            axp.set_xlabel("$x$")
        else:
            axp.tick_params("x", labelbottom=False)
    fig.text(0.54, 0.5, "Normalized Wavefunctions", ha="center",
             va="center", rotation="vertical")
    fig.tight_layout()
    return _save(fig, path)


def psi_two_panel_figure(params, cfg: Config,
                         path: str = "figures/fig3.pdf",
                         cut_rs=(2.0, 1.0)) -> str:
    """Two stacked normalised psi cuts (reference fig3.pdf,
    poc/main.py:1100-1160)."""
    fig = plt.figure(figsize=(10, 8))
    ax0 = None
    for i, ri in enumerate(cut_rs):
        ax = plt.subplot(len(cut_rs), 1, i + 1, sharex=ax0)
        ax0 = ax0 or ax
        xs, p, pl_ = probes.psi_cut_x_norm(params, cfg, float(ri))
        ax.plot(xs, p, "b", label=r"Neural $\psi$")
        ax.plot(xs, pl_, "--m", label="LCAO")
        for s in (-ri, ri):
            ax.axvline(s, c="k", ls=":", alpha=0.9)
        ax.set_yticks([])
        if i == len(cut_rs) - 1:
            ax.legend(frameon=False)
            ax.set_xlabel("$x$")
        else:
            ax.tick_params("x", labelbottom=False)
    fig.text(0.02, 0.5, "Normalized Wavefunctions", ha="center",
             va="center", rotation="vertical")
    fig.tight_layout()
    return _save(fig, path)


def paper_psi_surface_figure(params, cfg: Config, ri: float,
                             path: str, n: int = 100,
                             half_width: float = 5.0) -> str:
    """Frameless 3-D psi(x, y, 0) surface in the reference's style
    (fig_R{1,2,3}.pdf, poc/main.py:1263-1306)."""
    import jax.numpy as jnp
    from matplotlib import cm
    ax_pts = np.linspace(-half_width, half_width, n)
    xg, yg = np.meshgrid(ax_pts, ax_pts, indexing="ij")
    z = np.zeros_like(xg.ravel())
    psi, _ = ansatz.psi(params, cfg.model, jnp.asarray(xg.ravel()),
                        jnp.asarray(yg.ravel()), jnp.asarray(z),
                        jnp.full_like(jnp.asarray(z), ri))
    psi = np.asarray(psi).reshape(n, n)
    fig, ax3 = plt.subplots(1, subplot_kw={"projection": "3d"},
                            figsize=[10, 10])
    ax3.plot_surface(xg, yg, psi, cmap=cm.coolwarm, antialiased=True,
                     linewidth=0, shade=False, edgecolor="none")
    ax3.set_xlabel("$x$")
    ax3.set_ylabel("$y$")
    ax3.set_xticks([]); ax3.set_yticks([]); ax3.set_zticks([])
    ax3.view_init(30, 60)
    ax3.axis("off")
    return _save(fig, path)


def loss_figure_pdf(history: dict, path: str = "figures/loss_figure.pdf",
                    opt_epoch: int | None = None) -> str:
    """Single-panel log-loss curves with the optimal-epoch marker
    (reference loss_figure.pdf, poc/main.py:1040-1062)."""
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.plot(history["Ltot"], label="Total", lw=2)
    ax.plot(history["Lpde"], label="PDE", lw=1)
    ax.plot(history["Lbc"], label="BCs", lw=1)
    if opt_epoch is not None:
        ax.axvline(opt_epoch, c="r", ls="--", alpha=0.9)
    ax.set_yscale("log")
    ax.set_ylabel("Loss")
    ax.set_xlabel("Training Iterations")
    ax.legend(frameon=False)
    fig.tight_layout()
    return _save(fig, path)


# The reference's complete named figure output (shipped in poc/: fig2/3/4,
# fig_R1/2/3, loss_figure.pdf; plus energy.py/plot.py's pngs)
PAPER_SET_NAMES = ("fig2.pdf", "fig3.pdf", "fig4.pdf", "fig_R1.pdf",
                   "fig_R2.pdf", "fig_R3.pdf", "loss_figure.pdf",
                   "energy.png", "R1.png", "R2.png", "R1e.png", "R2e.png")


def paper_set(params, cfg: Config, outdir: str, surf: dict | None = None,
              history: dict | None = None, n_test: int = 80,
              grid: str = "spheroidal", opt_epoch: int | None = None,
              hf_points: int = 9) -> list[str]:
    """Emit the reference's EXACT named figure set from one checkpoint
    (``cli analyze --paper-set``): fig2/3/4.pdf, fig_R1/2/3.pdf,
    loss_figure.pdf (when a history is given), energy.png, R{1,2}{,e}.png.
    Returns the list of written paths."""
    if surf is None:
        surf = aen.surface(params, cfg, n=n_test, lcao=True, grid=grid)
    j = lambda name: os.path.join(outdir, name)
    paths = [
        paper_grid_figure(params, cfg, surf, j("fig2.pdf")),
        psi_two_panel_figure(params, cfg, j("fig3.pdf")),
        forces_figure(params, cfg, path=j("fig4.pdf"), hf_points=hf_points),
        paper_psi_surface_figure(params, cfg, 1.0, j("fig_R1.pdf")),
        paper_psi_surface_figure(params, cfg, 2.0, j("fig_R2.pdf")),
        paper_psi_surface_figure(params, cfg, 3.0, j("fig_R3.pdf")),
        energy_curve_figure(params, cfg, j("energy.png")),
        psi_cut_figure(params, cfg, 1.0, j("R1.png")),
        psi_cut_figure(params, cfg, 2.0, j("R2.png")),
        psi_cut_figure(params, cfg, 1.0, j("R1e.png"), diff=True),
        psi_cut_figure(params, cfg, 2.0, j("R2e.png"), diff=True),
    ]
    if history is not None:
        paths.append(loss_figure_pdf(history, j("loss_figure.pdf"),
                                     opt_epoch))
    return paths


def forces_figure(params, cfg: Config, r_values=None,
                  path: str = "figures/forces.pdf",
                  hf_points: int = 9) -> str:
    """Force panel: -dE/dR from autograd, finite differences and the
    Hellmann-Feynman integral (reference poc/main.py:1465-1489)."""
    from . import forces as afo
    if r_values is None:
        r_values = np.linspace(cfg.domain.r_lo + 0.2, cfg.domain.r_hi, 60)
    g_auto = afo.denergy_dr_autograd(params, r_values, total=True)
    g_fd = afo.denergy_dr_fd(params, r_values, total=True)
    r_hf = np.linspace(r_values[0], r_values[-1], hf_points)
    if cfg.model.ry == 0.0 and cfg.model.rz == 0.0:
        g_hf = np.array([afo.denergy_dr_hf_spheroidal(params, cfg, float(ri))
                         for ri in r_hf])
    else:
        g_hf = np.array([afo.denergy_dr_hellmann_feynman(params, cfg,
                                                         float(ri))
                         for ri in r_hf])
    fig, ax = plt.subplots()
    ax.plot(r_values, -g_auto, "b-", label="autograd")
    ax.plot(r_values, -g_fd, "g--", label="finite diff")
    ax.plot(r_hf, -g_hf, "ro", label="Hellmann-Feynman")
    ax.axhline(0, c="k", lw=0.5)
    ax.set_xlabel("R (bohr, half-distance)")
    ax.set_ylabel("force -dE/dR (Ha/bohr)")
    ax.legend()
    return _save(fig, path)
