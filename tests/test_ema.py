"""Polyak/EMA parameter averaging."""

import dataclasses

import jax
import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine


def test_ema_off_tracks_params():
    cfg = pqs.smoke_config(dtype="float64")
    res = engine.train(cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), res.params, res.ema_params)


def test_ema_on_smooths():
    cfg = pqs.smoke_config(dtype="float64")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.99, epochs=30,
                                       n_train=512, scan_chunk=10))
    res = engine.train(cfg)
    # ema differs from the raw iterate but stays in the same ballpark
    dw = np.abs(np.asarray(res.params["h1"]["w"])
                - np.asarray(res.ema_params["h1"]["w"]))
    assert dw.max() > 0
    assert dw.max() < 1.0
