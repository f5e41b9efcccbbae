"""Mesh layer tests: topology, boundary extraction, builders, readers,
high-order control point generation/dedup."""

import numpy as np
import pytest

from metafem.elements import initialize_classical_element
from metafem.mesh import (build_wp_mesh, construct_total_mesh,
                          get_boundary_mesh, make_brick, make_square,
                          read_mphtxt, select_facets)


def test_make_square_cube():
    vert, conn = make_square((2.0, 1.0), (4, 2), "CUBE")
    assert vert.shape == (15, 2)
    assert conn.shape == (8, 4)
    mesh = construct_total_mesh(vert, conn)
    # facets: unique edges = 4*2 + 5*2 + ... : horizontal 4*3 + vertical 5*2
    assert len(mesh.facets) == 4 * 3 + 5 * 2
    b = get_boundary_mesh(mesh)
    assert len(b) == 2 * 4 + 2 * 2


def test_make_square_simplex():
    vert, conn = make_square((1.0, 1.0), (3, 3), "SIMPLEX")
    assert conn.shape == (18, 3)
    mesh = construct_total_mesh(vert, conn)
    assert len(get_boundary_mesh(mesh)) == 12
    # all triangles positively oriented
    v = vert[conn]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    assert (det > 0).all()


def test_make_brick_cube():
    vert, conn = make_brick((1.0, 1.0, 1.0), (2, 2, 2), "CUBE")
    assert vert.shape == (27, 3)
    assert conn.shape == (8, 8)
    mesh = construct_total_mesh(vert, conn)
    assert len(get_boundary_mesh(mesh)) == 6 * 4


def test_make_brick_simplex():
    vert, conn = make_brick((1.0, 1.0, 1.0), (2, 2, 2), "SIMPLEX")
    assert conn.shape == (40, 4)
    mesh = construct_total_mesh(vert, conn)
    # tet volumes positive and sum to cube volume
    v = vert[conn]
    det = np.linalg.det(v[:, 1:] - v[:, [0]])
    assert np.abs(det).sum() / 6 == pytest.approx(1.0)
    assert (det > 0).all(), "tets must be positively oriented"
    # neighboring hexes' split faces must be conforming (manifold check
    # happens inside construct_total_mesh); boundary = 2 tris * 4 per face
    assert len(get_boundary_mesh(mesh)) == 6 * 4 * 2


def test_select_facets():
    vert, conn = make_square((2.0, 1.0), (4, 2), "CUBE")
    mesh = construct_total_mesh(vert, conn)
    left = select_facets(mesh, lambda x: x[:, 0] < 1e-9)
    assert len(left) == 2
    bottom = select_facets(mesh, lambda x: x[:, 1] < 1e-9)
    assert len(bottom) == 4


def test_mphtxt_reader(tmp_path):
    content = """# Created by COMSOL
3 # sdim
3405 # number of mesh points
0 # lowest mesh point index
# Mesh point coordinates
"""
    # synthesize a tiny file instead: 4 points, 1 tet
    content = """# comment
3 anything
4 # number of mesh points
0 # lowest mesh point index
# Mesh point coordinates
0 0 0
1 0 0
0 1 0
0 0 1

3 tet # type name
4 # number of nodes per element
1 # number of elements
# Elements
0 1 2 3
"""
    p = tmp_path / "tiny.mphtxt"
    p.write_text(content)
    vert, conn = read_mphtxt(str(p))
    assert vert.shape == (4, 3)
    assert conn.shape == (1, 4)


def test_reference_pikachu_mesh_reads():
    import os
    path = "/root/reference/examples/thermal_conduction/3D_COMSOL_Mesh.mphtxt"
    if not os.path.exists(path):
        pytest.skip("reference mesh not available")
    vert, conn = read_mphtxt(path)
    assert vert.shape == (3405, 3)
    assert conn.shape == (15334, 4)
    assert conn.min() == 0 and conn.max() == 3404
    mesh = construct_total_mesh(vert / 100.0, conn)
    b = get_boundary_mesh(mesh)
    assert len(b) > 1000  # a closed surface


# ---------------------------------------------------------------------------
# control point generation
# ---------------------------------------------------------------------------

def test_cp_generation_quad2():
    vert, conn = make_square((1.0, 1.0), (2, 2), "CUBE")
    mesh = construct_total_mesh(vert, conn)
    disc = initialize_classical_element(2, "CUBE", 2, 1, 5, "Lagrange")
    wp = build_wp_mesh(mesh, disc, {})
    # biquadratic on 2x2 grid: 5x5 nodes
    assert wp.n_cp == 25
    assert wp.el_cp.shape == (4, 9)
    # every element's cps are distinct
    for e in range(4):
        assert len(set(wp.el_cp[e])) == 9


def test_cp_generation_serendipity3d():
    vert, conn = make_brick((1.0, 1.0, 1.0), (2, 1, 1), "CUBE")
    mesh = construct_total_mesh(vert, conn)
    disc = initialize_classical_element(3, "CUBE", 2, 1, 5, "Serendipity")
    wp = build_wp_mesh(mesh, disc, {})
    # 2 hexes serendipity q2: vertices 3*2*2=12, edges: count unique edges
    # edges: x-dir 2*(2*2)=... easier: per-hex 8+12=20, shared face has
    # 4 vertices + 4 edge midpoints -> total = 40 - 8 = 32
    assert wp.n_occupied == 32
    assert wp.el_cp.shape == (2, 20)


def test_cp_generation_tet_order3_face_sharing():
    # cubic tets share 1 cp per face interior; position dedup must merge it
    vert, conn = make_brick((1.0, 1.0, 1.0), (1, 1, 1), "SIMPLEX")
    mesh = construct_total_mesh(vert, conn)
    disc = initialize_classical_element(3, "SIMPLEX", 3, 1, 5, "Lagrange")
    wp = build_wp_mesh(mesh, disc, {})
    n_itp = disc.element_type.n_cp
    assert n_itp == 20
    # euler-style count: V + 2*E + F (1 cp per face) for cubic tets
    nv = 8
    # count unique edges and faces from the 5-tet split
    edges = set()
    faces = set()
    for tet in conn:
        for a in range(4):
            for b in range(a + 1, 4):
                edges.add(tuple(sorted((tet[a], tet[b]))))
        for f in ((0, 1, 2), (0, 1, 3), (1, 2, 3), (0, 2, 3)):
            faces.add(tuple(sorted(tet[list(f)])))
    expect = nv + 2 * len(edges) + len(faces)
    assert wp.n_occupied == expect


def test_boundary_groups():
    vert, conn = make_square((1.0, 1.0), (2, 2), "CUBE")
    mesh = construct_total_mesh(vert, conn)
    disc = initialize_classical_element(2, "CUBE", 2, 1, 5, "Lagrange")
    left = select_facets(mesh, lambda x: x[:, 0] < 1e-9)
    wp = build_wp_mesh(mesh, disc, {1: left})
    bg = wp.boundary_groups[1]
    assert len(bg.element_ids) == 2
    # local face 4 (left, index 3) for lattice elements on the left edge
    assert (bg.eindex == 3).all()
