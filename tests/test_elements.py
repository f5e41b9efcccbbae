"""Element library tests: partition of unity, nodal interpolation property,
quadrature exactness, derivative consistency, boundary frames."""

import itertools

import numpy as np
import pytest

from metafem.elements import (Polynomial, initialize_classical_element,
                              make_element_type, quadrature)


# ---------------------------------------------------------------------------
# polynomial algebra
# ---------------------------------------------------------------------------

def test_polynomial_basics():
    x = Polynomial.variable(2, 0)
    y = Polynomial.variable(2, 1)
    p = (x + y) * (x - y) + 1.0
    assert p.evaluate([2.0, 1.0]) == pytest.approx(4.0)
    dp = p.derivative((1, 0))
    assert dp.evaluate([2.0, 1.0]) == pytest.approx(4.0)
    d2 = p.derivative((0, 2))
    assert d2.evaluate([0.3, 0.7]) == pytest.approx(-2.0)


def test_polynomial_substitute():
    x = Polynomial.variable(1, 0)
    p = x * x + 2.0 * x  # x^2 + 2x
    y2 = Polynomial.variable(2, 1)
    q = p.substitute(0, y2 * 3.0)  # (3y)^2 + 2(3y)
    assert q.evaluate([0.0, 2.0]) == pytest.approx(36.0 + 12.0)


# ---------------------------------------------------------------------------
# shape functions
# ---------------------------------------------------------------------------

CASES = [
    (2, "CUBE", 1, "Lagrange"), (2, "CUBE", 2, "Lagrange"),
    (2, "CUBE", 3, "Lagrange"), (2, "CUBE", 2, "Serendipity"),
    (2, "CUBE", 3, "Serendipity"), (2, "SIMPLEX", 1, "Lagrange"),
    (2, "SIMPLEX", 2, "Lagrange"), (2, "SIMPLEX", 3, "Lagrange"),
    (3, "CUBE", 1, "Lagrange"), (3, "CUBE", 2, "Lagrange"),
    (3, "CUBE", 2, "Serendipity"), (3, "SIMPLEX", 1, "Lagrange"),
    (3, "SIMPLEX", 2, "Lagrange"),
]


@pytest.mark.parametrize("dim,shape,order,itp", CASES)
def test_nodal_property(dim, shape, order, itp):
    et = make_element_type(dim, shape, order, itp)
    n = et.n_cp
    vals = np.array([[f.evaluate(p) for f in et.itp_funcs]
                     for p in et.node_pos])
    assert vals == pytest.approx(np.eye(n), abs=1e-9)


@pytest.mark.parametrize("dim,shape,order,itp", CASES)
def test_partition_of_unity(dim, shape, order, itp):
    et = make_element_type(dim, shape, order, itp)
    rng = np.random.default_rng(0)
    pts = rng.random((10, dim))
    if shape == "SIMPLEX":
        pts = pts / np.maximum(pts.sum(axis=1, keepdims=True), 1.0) * 0.9
    for p in pts:
        s = sum(f.evaluate(p) for f in et.itp_funcs)
        assert s == pytest.approx(1.0, abs=1e-9)
        for d in range(dim):
            orders = tuple(1 if k == d else 0 for k in range(dim))
            gs = sum(f.derivative(orders).evaluate(p) for f in et.itp_funcs)
            assert gs == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize("dim,shape,order,itp", CASES)
def test_linear_completeness(dim, shape, order, itp):
    # sum_a phi_a(x) * node_a reproduces x exactly
    et = make_element_type(dim, shape, order, itp)
    rng = np.random.default_rng(1)
    pts = rng.random((5, dim)) * 0.8
    for p in pts:
        phis = np.array([f.evaluate(p) for f in et.itp_funcs])
        rec = phis @ et.node_pos
        assert rec == pytest.approx(p, abs=1e-9)


def test_corner_weights():
    et = make_element_type(3, "CUBE", 2, "Serendipity")
    w = et.corner_weights()
    # cp positions reproduced from corner coords
    rec = w @ et.vertices
    assert rec == pytest.approx(et.node_pos)
    assert w.sum(axis=1) == pytest.approx(np.ones(et.n_cp))


# ---------------------------------------------------------------------------
# quadrature exactness
# ---------------------------------------------------------------------------

def _monomial_integral_cube(orders):
    return np.prod([1.0 / (o + 1) for o in orders])


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("itg_order", [2, 3, 5])
def test_cube_quadrature_exactness(dim, itg_order):
    pos, w = quadrature.cube_domain(itg_order, dim)
    for orders in itertools.product(range(itg_order + 1), repeat=dim):
        if sum(orders) > itg_order:
            continue
        val = float(np.sum(w * np.prod(pos ** np.array(orders), axis=1)))
        assert val == pytest.approx(_monomial_integral_cube(orders),
                                    rel=1e-12)


def _monomial_integral_simplex(orders, dim):
    # int over unit simplex of prod x_i^a_i = prod(a_i!) / (sum a + dim)!
    from math import factorial
    num = np.prod([float(factorial(o)) for o in orders])
    return num / float(factorial(sum(orders) + dim))


@pytest.mark.parametrize("itg_order", [5, 6, 8])
def test_triangle_quadrature_exactness(itg_order):
    pos, w = quadrature.triangle_domain(itg_order)
    assert w.sum() == pytest.approx(0.5, rel=1e-12)
    for orders in itertools.product(range(itg_order + 1), repeat=2):
        if sum(orders) > itg_order:
            continue
        val = float(np.sum(w * pos[:, 0] ** orders[0] * pos[:, 1] ** orders[1]))
        assert val == pytest.approx(_monomial_integral_simplex(orders, 2),
                                    rel=1e-9, abs=1e-14)


@pytest.mark.parametrize("itg_order", [5, 6, 8])
def test_tet_quadrature_exactness(itg_order):
    pos, w = quadrature.tet_domain(itg_order)
    assert w.sum() == pytest.approx(1.0 / 6.0, rel=1e-12)
    for orders in itertools.product(range(itg_order + 1), repeat=3):
        if sum(orders) > itg_order:
            continue
        val = float(np.sum(w * np.prod(pos ** np.array(orders), axis=1)))
        assert val == pytest.approx(_monomial_integral_simplex(orders, 3),
                                    rel=1e-9, abs=1e-14)


# ---------------------------------------------------------------------------
# boundary rules: perimeter/area & outward normals on the identity map
# ---------------------------------------------------------------------------

def _check_boundary(faces, dim, expected_measures, expected_normals):
    for f, (pos, w, tan) in enumerate(faces):
        if dim == 2:
            t = tan[:, :, 0]
            n = np.stack([t[:, 1], -t[:, 0]], axis=1)
            det = np.linalg.norm(t, axis=1)
        else:
            n = np.cross(tan[:, :, 0], tan[:, :, 1], axis=1)
            det = np.linalg.norm(n, axis=1)
            n = n / det[:, None]
        assert float(np.sum(w * det)) == pytest.approx(
            expected_measures[f], rel=1e-9)
        npred = np.asarray(expected_normals[f], dtype=float)
        npred = npred / np.linalg.norm(npred)
        assert n == pytest.approx(np.broadcast_to(npred, n.shape), abs=1e-9)


def test_cube2d_boundary():
    _check_boundary(quadrature.cube_boundary(3, 2), 2, [1, 1, 1, 1],
                    [(0, -1), (1, 0), (0, 1), (-1, 0)])


def test_cube3d_boundary():
    _check_boundary(quadrature.cube_boundary(3, 3), 3, [1] * 6,
                    [(0, 0, -1), (0, -1, 0), (1, 0, 0),
                     (0, 1, 0), (-1, 0, 0), (0, 0, 1)])


def test_triangle_boundary():
    s2 = np.sqrt(2.0)
    _check_boundary(quadrature.triangle_boundary(5), 2, [1, s2, 1],
                    [(0, -1), (1, 1), (-1, 0)])


def test_tet_boundary():
    s3 = np.sqrt(3.0)
    _check_boundary(quadrature.tet_boundary(5), 3,
                    [0.5, 0.5, s3 / 2, 0.5],
                    [(0, 0, -1), (0, -1, 0), (1, 1, 1), (-1, 0, 0)])


# ---------------------------------------------------------------------------
# full discretization tables
# ---------------------------------------------------------------------------

def test_discretization_tables():
    d = initialize_classical_element(2, "CUBE", 2, 1, 5,
                                     itp_type="Serendipity")
    assert d.ref_itp_vals.shape == (9, 8, 3)  # 3x3 gauss, 8 cps, 3 modes
    # value mode sums to 1 at every quad point
    assert d.ref_itp_vals[:, :, 0].sum(axis=1) == pytest.approx(np.ones(9))
    # derivative modes sum to 0
    assert d.ref_itp_vals[:, :, 1].sum(axis=1) == pytest.approx(
        np.zeros(9), abs=1e-12)
    assert len(d.bdy_ref_itp_vals) == 4
    assert d.bdy_ref_itp_vals[0].shape == (3, 8, 3)


def test_discretization_sd2_modes():
    from metafem.elements import sd_mode_list, sd_ids_to_mode
    modes = sd_mode_list(2, 2)
    assert modes[0] == (0, 0)
    assert set(modes) == {(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2)}
    assert sd_ids_to_mode(2, (), modes) == 0
    assert sd_ids_to_mode(2, (1, 1), modes) == modes.index((2, 0))
    assert sd_ids_to_mode(2, (1, 2), modes) == modes.index((1, 1))
