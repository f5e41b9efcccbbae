"""Aux-space MG spectrum experiments on a cached pikachu operator.

At refine=2 (1.36M DOF) the aux-MG preconditioned spectrum blew up to
lam_max ~ 694 (vs 2.5 at refine=1, 0.99 at refine=0) and the refined
step stalled at 6e-5.  This harness dumps the assembled f64 tangent once
(`dump N`), then sweeps aux-transfer configurations (`probe`) measuring
the preconditioned spectrum per config in minutes instead of repaying
the 40-minute pipeline per experiment.

Usage:
  python benchmarks/auxmg_probe.py dump 2        # ~15 min, writes npz
  python benchmarks/auxmg_probe.py probe         # sweep configs
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "examples"))

BUNDLE = "/tmp/pika_op_r{refine}.npz"


def dump(refine=2):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import pikachu_3d

    t0 = time.perf_counter()
    dom, geo, mesh = pikachu_3d.build(itp_order=2, itg_order=5,
                                      refine=refine, dtype=jnp.float32)
    print(f"build: {time.perf_counter()-t0:.0f}s  n={mesh.n_cp}",
          flush=True)
    t0 = time.perf_counter()
    K = dom._host_tangent()
    print(f"host tangent: {time.perf_counter()-t0:.0f}s", flush=True)
    layout = dom.pattern.offset_layout
    np.savez(BUNDLE.format(refine=refine),
             vals=np.asarray(K, np.float64)[layout.storage_of_slot],
             rows=dom.pattern.coo_rows, cols=dom.pattern.coo_cols,
             coords=mesh.cp_coords, el_cp=mesh.el_cp,
             n=dom.pattern.basicfield_size)
    print("wrote", BUNDLE.format(refine=refine), flush=True)


def probe(refine=2, configs=None):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import scipy.sparse as sp

    from metafem.linsolve import auxmg, multigrid
    from metafem.linsolve.multigrid import _safe_inv
    from metafem.linsolve.spmv import SparseMatrix

    d = np.load(BUNDLE.format(refine=refine))
    n = int(d["n"])
    coords, el_cp = d["coords"], d["el_cp"]
    A_sp = sp.coo_matrix(
        (d["vals"], (d["rows"].astype(np.int64),
                     d["cols"].astype(np.int64))), shape=(n, n))
    order = np.lexsort((d["cols"], d["rows"]))
    A32 = SparseMatrix(jnp.asarray(d["vals"][order], jnp.float32),
                       jnp.asarray(d["rows"][order].astype(np.int32)),
                       jnp.asarray(d["cols"][order].astype(np.int32)), n)
    diag = np.zeros(n)
    on_d = d["rows"] == d["cols"]
    np.add.at(diag, d["rows"][on_d].astype(np.int64), d["vals"][on_d])
    invd = jnp.asarray(_safe_inv(jnp.asarray(diag)), jnp.float32)

    spacing, diam_hi = auxmg.estimate_spacing(coords, el_cp)
    print(f"n={n}  fine spacing={spacing:.4g}  diam_q99={diam_hi:.4g}",
          flush=True)

    if configs is None:
        configs = [dict(h_factor=3.0, radius=2, lump=True, solve=True),
                   dict(h_factor=3.0, radius=2, lump=True, wclamp=0.05),
                   dict(h_factor=3.0, radius=2, lump=True, nu=4)]

    for cfg in configs:
        t0 = time.perf_counter()
        h = cfg["h_factor"] * spacing
        radius = cfg["radius"]
        cell_flat, w, aux_shape, corner_offs = auxmg.build_transfer(
            coords, h, wclamp=cfg.get("wclamp", 1e-3))
        n_lat = int(np.prod(aux_shape))
        coefs, mask, dropped = auxmg.galerkin_stencil(
            A_sp, cell_flat, w, aux_shape, 1, radius, jnp.float64,
            lump=cfg.get("lump", False))
        nu = cfg.get("nu", 2)
        hier = multigrid.build_hierarchy(
            aux_shape, 1, fine_radius=2 * radius - 2, nu1=nu, nu2=nu,
            n_power=12)
        lat_state = jax.jit(multigrid.mg_setup_from_stencil,
                            static_argnums=0)(hier, coefs, mask)
        lat_state = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), lat_state)

        @jax.jit
        def calibrate(A, invd):
            v = jax.random.normal(jax.random.PRNGKey(7), (n,),
                                  invd.dtype)
            v = v / jnp.linalg.norm(v)

            def body(v, _):
                u = invd * A.mv(v)
                lam = jnp.linalg.norm(u)
                return u / jnp.where(lam == 0, 1.0, lam), lam

            _, lams = jax.lax.scan(body, v, None, length=12)
            return (4.0 / 3.0) / jnp.where(lams[-1] == 0, 1.0,
                                           lams[-1] * 1.1)

        omega = calibrate(A32, invd)
        desc = auxmg.AuxDesc(dim=coords.shape[1], channels=1, n_cp=n,
                             n_lat=n_lat, aux_shape=aux_shape,
                             corner_offs=corner_offs, nu1=nu, nu2=nu)
        tree = {"cell": jnp.asarray(cell_flat.astype(np.int32)),
                "w": jnp.asarray(w, jnp.float32),
                "inv_diag": invd, "omega": omega, "lat": lat_state}
        op = auxmg.AuxMGOperator(A32, tree, hier, desc)
        spec = multigrid.estimate_spectrum(op, n, jnp.float32)
        cheb = multigrid.tune_chebyshev(op, n, jnp.float32, spec)
        print(f"cfg {cfg}: aux {aux_shape} ({n_lat/n:.2f}x), dropped "
              f"{dropped:.2e}, spectrum [{spec[0]:.3f}, {spec[1]:.3f}], "
              f"cheb {cheb}  ({time.perf_counter()-t0:.0f}s)", flush=True)
        if cfg.get("solve"):
            # does adaptive Krylov converge on A.M?  (what the refined
            # step's inner solve does with sv_func=bicgstab)
            from metafem.linsolve import krylov

            @jax.jit
            def solve(op):
                b = jax.random.normal(jax.random.PRNGKey(3), (n,),
                                      jnp.float32)
                y, it, _ = krylov.bicgstab(op, b, tol=1e-2, maxiter=120)
                r = b - op.mv(y)
                return (jnp.linalg.norm(r) / jnp.linalg.norm(b)), it

            t0 = time.perf_counter()
            rel, it = solve(op)
            print(f"  bicgstab on A.M: rel {float(rel):.2e} in "
                  f"{int(it)} iters ({time.perf_counter()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "dump":
        dump(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    else:
        probe(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
