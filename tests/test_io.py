"""Checkpoint io: model.bin codec, native npz, torch-free .pt reader."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.io import (checkpoint,
                                                           modelbin, torch_pt)
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz


def _params(arch="minimal"):
    cfg = pqs.minimal_config() if arch == "minimal" else pqs.Config()
    return ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)


def test_modelbin_roundtrip(tmp_path):
    p = _params()
    path = str(tmp_path / "model.bin")
    modelbin.save_params(path, p)
    q = modelbin.load_params(path)
    for k in p:
        np.testing.assert_array_equal(np.asarray(p[k]["w"]), q[k]["w"])
        np.testing.assert_array_equal(np.asarray(p[k]["b"]), q[k]["b"])


def test_modelbin_format_matches_reference_reader(tmp_path):
    """Parse our file with the reference's record semantics."""
    p = _params()
    path = str(tmp_path / "model.bin")
    modelbin.save_params(path, p)
    arrays = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            ndim = int.from_bytes(head, "little") if head else 0
            if ndim == 0:
                break
            shape = [int.from_bytes(f.read(4), "little") for _ in range(ndim)]
            n = int(np.prod(shape)) * 8
            arrays.append(np.frombuffer(f.read(n), "<f8").reshape(shape))
    assert len(arrays) == 16
    np.testing.assert_array_equal(arrays[0], np.asarray(p["h1"]["w"]))
    np.testing.assert_array_equal(arrays[15], np.asarray(p["eout"]["b"]))


def test_npz_checkpoint_roundtrip(tmp_path):
    import optax
    cfg = pqs.smoke_config(dtype="float64")
    p = _params("symmetric")
    opt = optax.adam(1e-3)
    opt_state = opt.init(p)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, {"params": p, "opt": opt_state},
                    meta={"step": 7, "best": 0.5})
    tree, meta = checkpoint.load(path, {"params": p, "opt": opt_state})
    assert meta == {"step": 7, "best": 0.5}
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        {"params": p, "opt": opt_state}, tree)
    del chex_equal
    q, meta2 = checkpoint.load_params(path)
    np.testing.assert_array_equal(q["params"]["h1"]["w"],
                                  np.asarray(p["h1"]["w"]))


def test_pt_reader_bitwise_vs_torch(reference_available):
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    path = "/root/reference/models/ionHsym.pt"
    ours = torch_pt.load(path)
    theirs = torch.load(path, map_location="cpu")
    for k, v in theirs["model_state_dict"].items():
        np.testing.assert_array_equal(ours["model_state_dict"][k], v.numpy())
    # optimizer state too (Adam moments)
    st = theirs["optimizer_state_dict"]["state"]
    for i, sub in st.items():
        for kk, vv in sub.items():
            got = ours["optimizer_state_dict"]["state"][i][kk]
            np.testing.assert_array_equal(np.asarray(got),
                                          vv.numpy() if hasattr(vv, "numpy")
                                          else vv)


def test_state_dict_mapping_roundtrip():
    p = _params("symmetric")
    sd = torch_pt.params_to_state_dict(p)
    q = torch_pt.state_dict_to_params(sd)
    for k in p:
        np.testing.assert_array_equal(np.asarray(p[k]["w"]), q[k]["w"])
        np.testing.assert_array_equal(np.asarray(p[k]["b"]), q[k]["b"])


def test_pt_reader_rejects_arbitrary_code(tmp_path):
    """The restricted unpickler must refuse non-allowlisted globals instead of
    falling through to the unrestricted default (arbitrary code execution)."""
    import pickle
    import zipfile

    # GLOBAL builtins.print + REDUCE — a stand-in for an os.system payload
    # that stays harmless even if the guard under test were broken
    payload = (b"\x80\x02cbuiltins\nprint\nq\x00X\x04\x00\x00\x00echoq\x01"
               b"\x85q\x02Rq\x03.")
    path = str(tmp_path / "evil.pt")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
    with pytest.raises(pickle.UnpicklingError, match="allowlist"):
        torch_pt.load(path)
