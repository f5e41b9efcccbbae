"""Host probe: cp-ordering candidates for the unstructured BSR tail.

The pikachu fine SpMV is index-rate-bound: nb block gathers + nb block
scatter-adds at the TPU random-index floor (~0.06 G/s), so the step cost
is ~linear in nb = number of stored 8x8 blocks.  nb = nnz * fill / 64;
fill is a pure function of the cp ORDERING (which 8 cps share a block
row/col).  Morton (the round-3 choice) measured fill 9.1x on pikachu
refine-2 — this probe compares orderings on the real mesh before paying
the 20-min freeze rebuild:

  morton   : current (Z-order over quantized coords)
  rcm      : reverse Cuthill-McKee on the cp adjacency graph
  greedy8  : BFS aggregation into size-8 graph clusters, clusters in
             Morton-of-centroid order (directly minimizes distinct
             block pairs)

For each: dense-offset coverage (build_offset_layout policy replica),
tail nnz, nb, fill, and the implied tail index ops per mv.

Usage: python benchmarks/ordering_probe.py [refine]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))

import metafem as mf
from metafem.elements.discretization import initialize_classical_element
from metafem.mesh.fem_mesh import build_wp_mesh
from metafem.native import unique_pairs_elcp

MESH_PATH = ("/root/reference/examples/thermal_conduction/"
             "3D_COMSOL_Mesh.mphtxt")


def tick(msg, t0=[None]):
    now = time.perf_counter()
    if t0[0] is not None:
        print(f"  [{now - t0[0]:.1f}s] {msg}", flush=True)
    else:
        print(f"  {msg}", flush=True)
    t0[0] = now


def block_stats(ci, cj, n_cp, b=8, max_dense_offsets=136,
                min_count_ratio=1 / 16, dense_budget_ratio=6.0):
    """Replicates build_offset_layout's dense-offset policy, then block
    stats on the tail."""
    d = cj.astype(np.int64) - ci
    hist = np.bincount(d + n_cp, minlength=2 * n_cp + 1)
    offs = np.nonzero(hist)[0]
    counts = hist[offs]
    order = np.argsort(-counts)
    offs, counts = offs[order] - n_cp, counts[order]
    budget = dense_budget_ratio * ci.size
    dense, spent, covered = [], 0, 0
    for dd, c in zip(offs, counts):
        if len(dense) >= max_dense_offsets:
            break
        if c < max(1, int(min_count_ratio * n_cp)):
            continue
        if spent + n_cp > max(budget, n_cp):
            break
        dense.append(int(dd))
        spent += n_cp
        covered += int(c)
    if 0 not in dense:
        dense.append(0)
    rank = np.full(2 * n_cp + 1, -1, np.int16)
    for dd in dense:
        rank[dd + n_cp] = 1
    tail = rank[d + n_cp] < 0
    nnz_tail = int(tail.sum())
    bi = (ci[tail] // b).astype(np.int64)
    bj = (cj[tail] // b).astype(np.int64)
    nb = len(np.unique(bi * ((n_cp // b) + 2) + bj))
    return {
        "n_dense_offs": len(dense),
        "dense_cov": covered / ci.size,
        "nnz_tail": nnz_tail,
        "nb": nb,
        "fill": nb * b * b / max(nnz_tail, 1),
        "tail_index_ops": 2 * nb,           # gather + scatter per mv
        "tail_ms_est": 2 * nb / 0.06e9 * 1e3,
    }


def apply_perm(ci, cj, rank):
    return rank[ci], rank[cj]


def rcm_order(ci, cj, n_cp):
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    A = sp.coo_matrix((np.ones(ci.size, np.int8), (ci, cj)),
                      shape=(n_cp, n_cp)).tocsr()
    perm = reverse_cuthill_mckee(A, symmetric_mode=True)
    rank = np.empty(n_cp, np.int64)
    rank[perm] = np.arange(n_cp)
    return rank


def greedy8_order(ci, cj, n_cp, coords, b=8):
    """Aggregate cps into graph clusters of exactly b via BFS from Morton-
    ordered seeds (incomplete groups filled with the next unassigned cps
    in Morton order so every block holds exactly b members); number
    cluster-by-cluster."""
    import scipy.sparse as sp
    A = sp.coo_matrix((np.ones(ci.size, np.int8), (ci, cj)),
                      shape=(n_cp, n_cp)).tocsr()
    indptr, indices = A.indptr, A.indices
    assigned = np.zeros(n_cp, bool)
    new_id = np.empty(n_cp, np.int64)
    nxt = 0
    scan = 0            # next-unassigned scan pointer (Morton order)
    for seed in range(n_cp):
        if assigned[seed]:
            continue
        group = [seed]
        assigned[seed] = True
        fr = 0
        while len(group) < b and fr < len(group):
            u = group[fr]
            fr += 1
            for v in indices[indptr[u]:indptr[u + 1]]:
                if not assigned[v]:
                    assigned[v] = True
                    group.append(v)
                    if len(group) >= b:
                        break
        # pad to exactly b with the next unassigned cps in Morton order
        while len(group) < b and nxt + len(group) < n_cp:
            while scan < n_cp and assigned[scan]:
                scan += 1
            if scan >= n_cp:
                break
            assigned[scan] = True
            group.append(scan)
        for u in group:
            new_id[u] = nxt
            nxt += 1
    return new_id


def hem8_order(ci, cj, n_cp, rounds=3):
    """Heavy-edge-matching aggregation: 3 rounds of greedy pairwise graph
    matching (2 -> 4 -> 8 members per aggregate), aggregates kept in
    first-member Morton order each round."""
    import scipy.sparse as sp
    # cluster membership starts as singletons with Morton ids
    memb = np.arange(n_cp, dtype=np.int64)     # cp -> cluster id
    gi, gj = ci, cj
    n_cl = n_cp
    for _ in range(rounds):
        G = sp.coo_matrix((np.ones(gi.size, np.int8), (gi, gj)),
                          shape=(n_cl, n_cl)).tocsr()
        indptr, indices = G.indptr, G.indices
        mate = np.full(n_cl, -1, np.int64)
        for u in range(n_cl):
            if mate[u] >= 0:
                continue
            for v in indices[indptr[u]:indptr[u + 1]]:
                if v != u and mate[v] < 0:
                    mate[u], mate[v] = v, u
                    break
            else:
                mate[u] = u                    # unmatched: singleton
        # new cluster ids in first-member order
        first = np.minimum(np.arange(n_cl), mate)
        uniq, new_of = np.unique(first, return_inverse=True)
        memb = new_of[memb]
        gi2 = new_of[gi]
        gj2 = new_of[gj]
        keys = gi2 * len(uniq) + gj2
        uk = np.unique(keys)
        gi, gj = uk // len(uniq), uk % len(uniq)
        n_cl = len(uniq)
    # number cps cluster-by-cluster (clusters already in Morton-ish order)
    order = np.argsort(memb, kind="stable")
    rank = np.empty(n_cp, np.int64)
    rank[order] = np.arange(n_cp)
    return rank


def main(refine=1):
    vert, conn = mf.read_mesh(MESH_PATH)
    vert = np.asarray(vert) / 100.0
    for _ in range(refine):
        vert, conn = mf.refine_simplex(vert, conn)
    geo = mf.construct_total_mesh(vert, conn)
    tick(f"geo: {len(vert)} verts, {len(conn)} tets")
    disc = initialize_classical_element(geo.dim, geo.shape, itp_order=2,
                                        max_sd_order=1, itg_order=5)
    mesh = build_wp_mesh(geo, disc, {0: geo.boundary_facet_ids()})
    n_cp = mesh.n_cp
    tick(f"wp mesh: n_cp={n_cp}")
    ci, cj, _ = unique_pairs_elcp(mesh.el_cp, n_cp)
    ci = ci.astype(np.int64)
    cj = cj.astype(np.int64)
    tick(f"pairs: nnz={ci.size} ({ci.size / n_cp:.1f}/row)")

    results = {}
    which = os.environ.get("ORDERINGS", "morton,rcm,greedy8,hem8").split(
        ",")
    results["morton"] = block_stats(ci, cj, n_cp)
    tick(f"morton: {results['morton']}")

    if "rcm" in which:
        rank = rcm_order(ci, cj, n_cp)
        results["rcm"] = block_stats(*apply_perm(ci, cj, rank), n_cp)
        tick(f"rcm: {results['rcm']}")

    if "greedy8" in which:
        rank = greedy8_order(ci, cj, n_cp, mesh.cp_coords)
        results["greedy8"] = block_stats(*apply_perm(ci, cj, rank), n_cp)
        tick(f"greedy8: {results['greedy8']}")

    if "hem8" in which:
        rank = hem8_order(ci, cj, n_cp)
        results["hem8"] = block_stats(*apply_perm(ci, cj, rank), n_cp)
        tick(f"hem8: {results['hem8']}")

    # Block-size sweep (Morton order, tail after dense offsets): the
    # random-index floor is paid PER BLOCK, so bigger blocks amortize it
    # — nb (and with it 2*nb index ops/mv) falls faster than storage
    # rises.  Storage streams sequentially (component-major layout).
    print()
    print(f"{'b':>3s} {'rxc':>7s} {'nb':>9s} {'fill':>6s} "
          f"{'storage MB':>10s} {'idx ms':>7s} {'stream ms':>9s} "
          f"{'est ms':>7s}")
    d = cj - ci
    hist = np.bincount(d + n_cp, minlength=2 * n_cp + 1)
    offs = np.nonzero(hist)[0]
    counts = hist[offs]
    order = np.argsort(-counts)
    offs, counts = offs[order] - n_cp, counts[order]
    dense = []
    spent = 0
    for dd, c in zip(offs, counts):
        if len(dense) >= 136 or spent + n_cp > 6.0 * ci.size:
            break
        if c < max(1, n_cp // 16):
            continue
        dense.append(int(dd))
        spent += n_cp
    rankl = np.full(2 * n_cp + 1, -1, np.int16)
    for dd in dense:
        rankl[dd + n_cp] = 1
    if 0 not in dense:
        rankl[n_cp] = 1
    tail = rankl[d + n_cp] < 0
    ti, tj = ci[tail], cj[tail]
    for br, bc in [(8, 8), (8, 16), (8, 32), (16, 16), (16, 32),
                   (32, 32), (32, 64), (64, 64)]:
        bi = ti // br
        bj = tj // bc
        stride = (n_cp // bc) + 2
        nb = len(np.unique(bi * stride + bj))
        storage = nb * br * bc * 4 / 1e6
        idx_ms = 2 * nb / 0.06e9 * 1e3
        stream_ms = nb * br * bc * 4 / 400e9 * 1e3   # ~half roofline
        est = idx_ms + stream_ms
        print(f"{br:3d} {f'{br}x{bc}':>7s} {nb:9d} "
              f"{nb*br*bc/max(tail.sum(),1):6.2f} {storage:10.1f} "
              f"{idx_ms:7.2f} {stream_ms:9.2f} {est:7.2f}", flush=True)

    print()
    hdr = (f"{'ordering':10s} {'dense_cov':>9s} {'nnz_tail':>10s} "
           f"{'nb':>9s} {'fill':>6s} {'tail ms est':>11s}")
    print(hdr)
    for k, r in results.items():
        print(f"{k:10s} {r['dense_cov']:9.3f} {r['nnz_tail']:10d} "
              f"{r['nb']:9d} {r['fill']:6.2f} {r['tail_ms_est']:11.1f}")


if __name__ == "__main__":
    main(refine=int(sys.argv[1]) if len(sys.argv) > 1 else 1)
