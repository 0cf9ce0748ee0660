"""CLI smoke tests (in-process, tiny workloads)."""

import json
import os

import numpy as np
import pytest

from pinn_for_quantum_wavefunction_surfaces_tpu import cli


def _run(capsys, argv):
    cli.main(argv)
    return capsys.readouterr().out.strip().splitlines()[-1]


def test_train_evaluate_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "run")
    last = _run(capsys, ["train", "--out", out, "--epochs", "20",
                         "--n-train", "256", "--dtype", "float64"])
    rec = json.loads(last)
    assert rec["best_loss"] > 0
    assert os.path.exists(os.path.join(out, "best.npz"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))

    last = _run(capsys, ["export", os.path.join(out, "best.npz"),
                         str(tmp_path / "m.bin")])
    assert json.loads(last)["written"].endswith("m.bin")


def test_energy_on_reference_checkpoint(tmp_path, capsys):
    ref = "/root/reference/models/ionHsym_fineTune.pt"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    last = _run(capsys, ["energy", ref, "--out", str(tmp_path / "e.pkl"),
                         "--n-test", "24", "--no-lcao", "--dtype", "float64"])
    rec = json.loads(last)
    assert np.isfinite(rec["mean_err_mHa"])


def test_exact_resume_from_state(tmp_path, capsys):
    out1 = str(tmp_path / "s1")
    _run(capsys, ["train", "--out", out1, "--epochs", "30",
                  "--n-train", "256", "--dtype", "float64"])
    assert os.path.exists(os.path.join(out1, "state.npz"))
    out2 = str(tmp_path / "s2")
    # --epochs is the TOTAL schedule length: resuming a run checkpointed at
    # step s with --epochs 40 trains the remaining 40 - s steps
    last = _run(capsys, ["train", "--out", out2, "--resume",
                         os.path.join(out1, "state.npz"), "--epochs", "40",
                         "--n-train", "256", "--dtype", "float64"])
    rec = json.loads(last)
    # a warm resume starts orders of magnitude below a cold start
    assert rec["best_loss"] < 1e-3


def test_variational_spheroidal_cli(tmp_path, capsys):
    out1 = str(tmp_path / "s1")
    _run(capsys, ["train", "--out", out1, "--arch", "separable",
                  "--epochs", "20", "--n-train", "256", "--dtype", "float64"])
    # --arch must propagate into the model config (regression: it was
    # silently dropped, training a symmetric model under a separable label)
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    params, _ = checkpoint.load_params(os.path.join(out1, "best.npz"))
    assert "lam1" in params.get("params", params)
    out2 = str(tmp_path / "pol")
    last = _run(capsys, ["variational", os.path.join(out1, "best.npz"),
                         "--out", out2, "--arch", "separable",
                         "--lbfgs", "2", "--adam-warmup", "3", "--spheroidal",
                         "--n-r", "3", "--n-xi", "10", "--n-eta", "8",
                         "--dtype", "float64"])
    rec = json.loads(last)
    assert rec["spheroidal"] is True
    assert os.path.exists(os.path.join(out2, "variational.npz"))


def test_variational_deflate_cli_wiring(tmp_path, capsys):
    """--xi-node / --deflate wiring: tiny deflated polish from the shipped
    ground-state artifact; the checkpoint must carry node params and the
    deflation provenance in its meta."""
    out = str(tmp_path / "defl")
    last = _run(capsys, ["variational", "--out", out, "--arch", "separable",
                         "--xi-node", "--spheroidal", "--deflate",
                         "artifacts/flagship_separable.npz",
                         "--fixed-r", "1.0", "--adam-warmup", "3",
                         "--lbfgs", "2", "--n-xi", "10", "--n-eta", "8",
                         "--dtype", "float64"])
    rec = json.loads(last)
    assert rec["deflated"] is True
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    params, meta = checkpoint.load_params(os.path.join(out,
                                                       "variational.npz"))
    # the R-aware node head (models/ansatz.RNODE_CAP parameterisation)
    assert "rnode1" in params.get("params", params)
    assert meta["deflated"] == "flagship_separable.npz"
    # k=1 gerade deflation targets the second gerade state
    assert meta["target_state"] == "2ssg"
    # --deflate without --spheroidal must be rejected
    with pytest.raises(SystemExit):
        cli.main(["variational", "--out", out, "--arch", "separable",
                  "--deflate", "artifacts/flagship_separable.npz",
                  "--lbfgs", "2", "--dtype", "float64"])


def test_variational_pi_sector_cli_wiring(tmp_path, capsys):
    """--m-abs wiring: tiny pi-sector polish; the checkpoint meta must
    carry m_abs and the sector-minimum target state so `cli evaluate`
    rebuilds the right ansatz and scores the right oracle by default."""
    out = str(tmp_path / "pi")
    last = _run(capsys, ["variational", "--out", out, "--arch", "separable",
                         "--m-abs", "1", "--spheroidal", "--fixed-r", "1.0",
                         "--adam-warmup", "3", "--lbfgs", "2",
                         "--n-xi", "10", "--n-eta", "8",
                         "--dtype", "float64"])
    rec = json.loads(last)
    assert rec["spheroidal"] is True
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    _, meta = checkpoint.load_params(os.path.join(out, "variational.npz"))
    assert meta["m_abs"] == 1
    assert meta["target_state"] == "2ppu"
    # ungerade envelope * y -> 3d pi_g
    out2 = str(tmp_path / "pig")
    _run(capsys, ["variational", "--out", out2, "--arch", "separable",
                  "--m-abs", "1", "--state", "ungerade", "--spheroidal",
                  "--fixed-r", "1.0", "--adam-warmup", "2", "--lbfgs", "1",
                  "--n-xi", "10", "--n-eta", "8", "--dtype", "float64"])
    _, meta2 = checkpoint.load_params(os.path.join(out2, "variational.npz"))
    assert meta2["target_state"] == "3dpg"
    # --m-abs with a non-separable arch must be rejected by the config
    with pytest.raises(ValueError):
        cli.main(["variational", "--out", out, "--arch", "symmetric",
                  "--m-abs", "1", "--spheroidal", "--lbfgs", "1",
                  "--dtype", "float64"])


def test_bad_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        cli.main(["energy", str(tmp_path / "missing.npz")])


def test_analyze_paper_set(tmp_path, capsys):
    """--paper-set must emit the reference's EXACT named figure list
    (fig2/3/4.pdf, fig_R1/2/3.pdf, loss_figure.pdf, energy.png,
    R{1,2}{,e}.png — the files shipped in reference poc/)."""
    out1 = str(tmp_path / "run")
    _run(capsys, ["train", "--out", out1, "--epochs", "10",
                  "--n-train", "256", "--dtype", "float64"])
    figs = str(tmp_path / "figs")
    last = _run(capsys, ["analyze", os.path.join(out1, "best.npz"),
                         "--out", figs, "--paper-set", "--n-test", "16",
                         "--hf-points", "2", "--dtype", "float64",
                         "--history", os.path.join(out1, "history.pkl")])
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis.plots import \
        PAPER_SET_NAMES
    produced = set(json.loads(last)["figures"])
    for name in PAPER_SET_NAMES:
        path = os.path.join(figs, name)
        assert path in produced and os.path.exists(path), name


def test_variational_mesh_pod_recipe(tmp_path, capsys):
    """The multi-chip (pod) recipe, end-to-end on the 8-device virtual mesh:
    multi-R spheroidal quadrature training sharded over the R axis
    (``cli variational --spheroidal --mesh 8`` — docs/DESIGN.md pod demo).
    Absolute scaling numbers need real chips; this pins the recipe runs."""
    out = str(tmp_path / "pod")
    # adam-warmup phase only: the L-BFGS zoom-linesearch executable takes
    # ~3 min to compile on the virtual mesh and adds no sharding coverage
    # (tests/test_parallel pins sharded-polish equivalence separately)
    last = _run(capsys, ["variational", "--out", out, "--arch", "separable",
                         "--adam-warmup", "6", "--lbfgs", "0",
                         "--spheroidal", "--mesh", "8",
                         "--n-r", "8", "--n-xi", "12", "--n-eta", "8",
                         "--dtype", "float64"])
    rec = json.loads(last)
    assert rec["spheroidal"] is True and rec["polish"] == "spheroidal-adam"
    assert os.path.exists(os.path.join(out, "variational.npz"))
