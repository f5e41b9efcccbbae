"""Fused Pallas block-offset SpMV (linsolve/pallas_spmv.py).

Covers the reference capability "CSR SpMV via CUSPARSE mv!"
(src/misc/04_GPU_Utils.jl:131-138) in its TPU-native form.  On the CPU
test mesh the kernel runs in Pallas interpret mode; numerical identity
with the XLA shifted-add path is the contract (same summation order per
output position — elementwise, no reduction reordering).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from metafem.linsolve import pallas_spmv
from metafem.linsolve.block_offset import OffsetMatrix

from test_multigrid import _thermal_domain, _elastic_domain_2d, _tangent


@pytest.fixture(autouse=True)
def _restore_force():
    prev = pallas_spmv.FORCE
    yield
    pallas_spmv.FORCE = prev


def _compare(dom, rtol=1e-14):
    A, residue = _tangent(dom)
    rng = np.random.default_rng(7)
    xs = [jnp.asarray(rng.standard_normal(A.n)), residue]
    for x in xs:
        pallas_spmv.FORCE = False
        y0 = np.asarray(A.mv(x))
        pallas_spmv.FORCE = True
        y1 = np.asarray(A.mv(x))
        scale = np.abs(y0).max()
        np.testing.assert_allclose(y1, y0, rtol=rtol, atol=rtol * scale)
    return A


def test_thermal_single_channel():
    A = _compare(_thermal_domain(nel=(12, 6)))
    (g,) = A.layout.pallas_groups
    assert g.n_vars == 1 and g.units == ((0, 0),)


def test_elastic_vector_channels():
    A = _compare(_elastic_domain_2d(nel=(8, 4)))
    (g,) = A.layout.pallas_groups
    assert g.n_vars == 2 and len(g.units) == 4   # full 2x2 coupling


def test_matches_scipy():
    dom = _thermal_domain(nel=(10, 5))
    A, _ = _tangent(dom)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(A.n)
    pallas_spmv.FORCE = True
    y = np.asarray(A.mv(jnp.asarray(x)))
    y_ref = A.to_scipy() @ x
    np.testing.assert_allclose(y, y_ref, rtol=1e-12,
                               atol=1e-12 * np.abs(y_ref).max())


def test_group_layout_metadata():
    dom = _elastic_domain_2d(nel=(8, 4))
    A, _ = _tangent(dom)
    lo = A.layout
    (g,) = lo.pallas_groups
    # the dense region is [G, n_off, n_cp] row-major: segment list order
    # must match (unit-major, offsets sorted)
    segs = [s for s in lo.segments]
    k = 0
    for (pd, pb) in g.units:
        for d in g.offsets:
            row0, col0, n_cp, dd, base = segs[k]
            assert dd == d and n_cp == g.n_cp
            assert row0 == g.dof_offset + pd * g.n_cp
            assert col0 == g.dof_offset + pb * g.n_cp
            assert base == g.base + k * g.n_cp
            k += 1
    assert k == len(segs)
