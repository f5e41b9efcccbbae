"""Probe: BSR block-tail fill factor on the pikachu tet mesh, for
candidate cp orderings (file order vs Morton vs lex bins) and block
sizes.  Decides the design of the block-structured COO tail
(linsolve/block_offset.py) — the fix for the unstructured SpMV running
at the random-gather floor (PERFORMANCE.md round-3 gap).

fill = nb * b^2 / nnz  (storage + flops inflation over scalar COO)
gain = nnz / nb        (gather-index reduction: one index per block
                        moves b contiguous x values instead of 1)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import metafem as mf
from metafem import native


def morton3(q: np.ndarray) -> np.ndarray:
    """Interleave 21-bit nonneg ints q[:, 3] -> int64 Morton code."""
    def spread(v):
        v = v.astype(np.uint64)
        v &= np.uint64(0x1FFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v
    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2))).astype(np.int64)


def main(refine=1):
    import jax.numpy as jnp
    from metafem.solver.domain import FEM_Domain
    from metafem import Bilinear

    vert, conn = mf.read_mesh(
        "/root/reference/examples/thermal_conduction/3D_COMSOL_Mesh.mphtxt")
    vert = np.asarray(vert) / 100.0
    for _ in range(refine):
        vert, conn = mf.refine_simplex(vert, conn)
    geo = mf.construct_total_mesh(vert, conn)
    dom = FEM_Domain(3, dtype=jnp.float32)
    wp = dom.add_workpiece(geo)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    dom.assign_workpiece_weakform(
        wp, -0.6 * Bilinear(T.d(i), T.d(i)) + Bilinear(T, s))
    dom.initialize_local_assembly(explicit_max_sd_order=1)
    dom.mesh_classical(itp_order=2, itg_order=5)
    mesh = dom.workpieces[wp].mesh
    n_cp = mesh.n_cp
    el_cp = np.asarray(mesh.el_cp, np.int32)
    t0 = time.perf_counter()
    ci, cj, _inv = native.unique_pairs_elcp(el_cp, n_cp)
    print(f"n_cp={n_cp} nnz={ci.size} "
          f"(pairs {time.perf_counter()-t0:.1f}s)", flush=True)

    coords = mesh.cp_coords
    # quantization for orderings: ~1/1024 of the bbox per axis
    lo, hi = coords.min(0), coords.max(0)
    q = ((coords - lo) / (hi - lo + 1e-300) * 2047).astype(np.int64)

    orderings = {"file": None}
    orderings["morton"] = np.argsort(morton3(q), kind="stable")
    # lex bins at ~2 median edge lengths
    e0 = coords[el_cp[:, 0]] - coords[el_cp[:, 1]]
    h_med = np.median(np.linalg.norm(e0, axis=1))
    for mult, name in ((2.0, "lex2h"), (4.0, "lex4h")):
        b = np.floor((coords - lo) / (mult * h_med)).astype(np.int64)
        key = (b[:, 2], b[:, 1], b[:, 0], coords[:, 2], coords[:, 1],
               coords[:, 0])
        orderings[name] = np.lexsort(key)

    for name, perm in orderings.items():
        if perm is None:
            ci2, cj2 = ci.astype(np.int64), cj.astype(np.int64)
        else:
            rank = np.empty(n_cp, np.int64)
            rank[perm] = np.arange(n_cp)
            ci2, cj2 = rank[ci], rank[cj]
        line = [f"{name:7s}"]
        for b in (8, 16, 32):
            nbc = (n_cp + b - 1) // b
            key = (ci2 // b) * nbc + (cj2 // b)
            nb = np.unique(key).size
            fill = nb * b * b / ci.size
            gain = ci.size / nb
            line.append(f"b={b}: fill={fill:.2f} gain={gain:.1f} "
                        f"nb={nb/1e6:.2f}M")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main(refine=int(sys.argv[1]) if len(sys.argv) > 1 else 1)
