"""Native (C++) host setup kernels vs independent numpy oracles.

The sparsity-pattern dedup is the host-setup hot spot (reference analog:
the GPU hash dict of 02_FEM_Dict.jl / COO sort of 00_Sparse_Utils.jl);
here it is an O(N) counting radix over the element->cp table
(native/fastmap.cpp unique_pairs_elcp).
"""
import numpy as np
import pytest

from metafem.native import unique_pairs, unique_pairs_elcp


def _oracle(el, n_cp):
    na = el.shape[1]
    keys = (np.repeat(el, na, axis=1).ravel().astype(np.int64) * n_cp
            + np.tile(el, (1, na)).ravel())
    uniq, inv = np.unique(keys, return_inverse=True)
    return uniq // n_cp, uniq % n_cp, inv


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_unique_pairs_elcp_matches_np_unique(seed):
    rng = np.random.default_rng(seed)
    E, na = int(rng.integers(3, 60)), int(rng.integers(2, 12))
    n_cp = int(rng.integers(8, 100))
    el = rng.integers(0, n_cp, size=(E, na)).astype(np.int32)
    ci, cj, inv = unique_pairs_elcp(el, n_cp)
    oci, ocj, oinv = _oracle(el, n_cp)
    np.testing.assert_array_equal(ci, oci)
    np.testing.assert_array_equal(cj, ocj)
    np.testing.assert_array_equal(inv.ravel().astype(np.int64), oinv)
    assert inv.shape == (E, na, na) and inv.dtype == np.int32


def test_unique_pairs_elcp_structured():
    # a 2x2 quad mesh's el_cp: shared nodes dedup across elements
    el = np.array([[0, 1, 4, 3], [1, 2, 5, 4],
                   [3, 4, 7, 6], [4, 5, 8, 7]], np.int32)
    ci, cj, inv = unique_pairs_elcp(el, 9)
    oci, ocj, oinv = _oracle(el, 9)
    np.testing.assert_array_equal(ci, oci)
    np.testing.assert_array_equal(cj, ocj)
    np.testing.assert_array_equal(inv.ravel().astype(np.int64), oinv)
    # the center node (4) couples to every node: a full row
    assert (cj[ci == 4] == np.arange(9)).all()


def test_unique_pairs_legacy_matches_elcp():
    rng = np.random.default_rng(3)
    el = rng.integers(0, 40, size=(25, 6)).astype(np.int32)
    na = el.shape[1]
    ci_all = np.repeat(el, na, axis=1).ravel().astype(np.int64)
    cj_all = np.tile(el, (1, na)).ravel().astype(np.int64)
    ci1, cj1, inv1 = unique_pairs(ci_all, cj_all, 40)
    ci2, cj2, inv2 = unique_pairs_elcp(el, 40)
    np.testing.assert_array_equal(ci1, ci2)
    np.testing.assert_array_equal(cj1, cj2)
    np.testing.assert_array_equal(inv1, inv2.ravel().astype(np.int64))
