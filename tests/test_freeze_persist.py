"""Freeze persistence (save_freezes / load_freezes) and volume-table
release (free_volume_tables) — the production warm-start path bench.py
and pikachu_scale.py rely on.

Contract under test: a freshly-built identical domain that loads the
pickle steps IDENTICALLY to the domain that computed the freezes; the
pickle does not duplicate the runtime state's volume element tables
(2.2 GB at pikachu refine-2 scale — the duplication OOMed the TPU);
and releasing the volume tables (dead HBM for affine-volume physics on
the refined path) leaves the step bit-identical."""

import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from metafem.linsolve import krylov
from test_refined import _radiating_thermal


def _frozen_dom():
    dom = _radiating_thermal(nel=(8, 4))
    dom.converge_tol = 1e-10
    dom.freeze_linear_tangent()
    dom.freeze_refined_residual()
    return dom


def _one_step(dom):
    step = dom.make_refined_step(sv_func=krylov.bicgstab, maxiter=200,
                                 max_refine=8, max_pass=1,
                                 precond="jacobi")
    state = dom._runtime_state()
    x1, _, res, _ = step(state, jnp.asarray(dom.x), jnp.float64(0.0),
                         jnp.float64(1.0))
    return np.asarray(x1), float(res)


def test_save_load_roundtrip_matches(tmp_path):
    dom = _frozen_dom()
    x_ref, res_ref = _one_step(dom)
    assert res_ref < 1e-10

    fz = str(tmp_path / "fz.pkl")
    dom.save_freezes(fz)

    # the pickle must NOT carry a copy of the state's volume element
    # tables — only the alias sentinel (the copy doubles HBM on reload)
    with open(fz, "rb") as f:
        blob = pickle.load(f)
    for w in blob["_refined"]["wp"]:
        assert w["el"] == "__state_el__"

    dom2 = _radiating_thermal(nel=(8, 4))
    dom2.converge_tol = 1e-10
    dom2.load_freezes(fz)
    # the sentinel was replaced by the live state's tables
    el = dom2._refined["wp"][0]["el"]
    assert el is dom2.state["wp"][0]["el"]

    x2, res2 = _one_step(dom2)
    np.testing.assert_array_equal(x2, x_ref)
    assert res2 == res_ref


def test_stale_layout_rejected(tmp_path):
    dom = _frozen_dom()
    fz = str(tmp_path / "fz.pkl")
    dom.save_freezes(fz)
    dom2 = _radiating_thermal(nel=(10, 4))       # different layout
    dom2.converge_tol = 1e-10
    with pytest.raises(ValueError, match="stale cache"):
        dom2.load_freezes(fz)


def test_free_volume_tables_step_identical(tmp_path):
    dom = _frozen_dom()
    x_ref, _ = _one_step(dom)

    dom.free_volume_tables()
    assert dom.state["wp"][0]["el"]["itg_vals"] is None
    assert dom.state["wp"][0]["el"]["weights"] is None
    # el_cp stays (boundary gathers index through it)
    assert dom.state["wp"][0]["el"]["el_cp"] is not None

    x2, res2 = _one_step(dom)
    np.testing.assert_array_equal(x2, x_ref)
    assert res2 < 1e-10


def test_free_volume_tables_guards():
    dom = _radiating_thermal(nel=(8, 4))
    with pytest.raises(RuntimeError, match="freeze_refined_residual"):
        dom.free_volume_tables()
    dom_nl = _radiating_thermal(nel=(8, 4), nonlinear_volume=True)
    dom_nl.freeze_linear_tangent()
    dom_nl.freeze_refined_residual()
    with pytest.raises(RuntimeError, match="volume-nonaffine"):
        dom_nl.free_volume_tables()


def test_freed_tables_fail_fast():
    """Paths that assemble volume integrals must raise a descriptive
    error after free_volume_tables — not a TypeError deep in assembly —
    and update_mesh() must clear the condition."""
    dom = _frozen_dom()
    dom.free_volume_tables()
    with pytest.raises(RuntimeError, match="free_volume_tables"):
        dom.update_one_step()
    with pytest.raises(RuntimeError, match="free_volume_tables"):
        dom.make_jitted_step(sv_func=krylov.bicgstab)
    dom.update_mesh()
    dom.update_one_step(max_iter=1)      # rebuilt tables: runs again


def test_legacy_pickle_el_copy_dropped(tmp_path):
    """A pre-sentinel pickle carrying a FULL copy of the volume tables
    (the round-3 format) must reload without duplicating them: the copy
    is dropped and the live state tables re-attached by alias."""
    dom = _frozen_dom()
    x_ref, res_ref = _one_step(dom)
    fz = str(tmp_path / "fz_legacy.pkl")
    dom.save_freezes(fz)
    with open(fz, "rb") as f:
        blob = pickle.load(f)
    # forge the legacy format: sentinel -> materialized host copy
    blob["_refined"] = dict(blob["_refined"])
    blob["_refined"]["wp"] = [
        {**w, "el": {k: np.asarray(v) for k, v in
                     dom.state["wp"][i]["el"].items()}}
        if w.get("el") is not None else w
        for i, w in enumerate(blob["_refined"]["wp"])]
    with open(fz, "wb") as f:
        pickle.dump(blob, f, protocol=4)

    dom2 = _radiating_thermal(nel=(8, 4))
    dom2.converge_tol = 1e-10
    dom2.load_freezes(fz)
    assert dom2._refined["wp"][0]["el"] is dom2.state["wp"][0]["el"]
    x2, res2 = _one_step(dom2)
    np.testing.assert_array_equal(x2, x_ref)
    assert res2 == res_ref
