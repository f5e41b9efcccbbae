"""Krylov solver tests on manufactured SPD / nonsymmetric systems."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from metafem import linsolve
from metafem.linsolve import SparseMatrix, iterative_solve, solver_lu
from metafem.linsolve.krylov import (bicgstab, bicgstabl, bicgstabl_gs,
                                     cg, cgs, cgs2, gmres, idrs,
                                     idrs_original, lsqr, tfqmr)


def _to_sparse(A: sp.spmatrix) -> SparseMatrix:
    coo = A.tocoo()
    order = np.lexsort((coo.col, coo.row))
    return SparseMatrix(jnp.asarray(coo.data[order]),
                        jnp.asarray(coo.row[order].astype(np.int32)),
                        jnp.asarray(coo.col[order].astype(np.int32)),
                        A.shape[0])


def _laplace_1d(n):
    return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()


def _nonsym(n, seed=0):
    rng = np.random.default_rng(seed)
    A = _laplace_1d(n).tolil()
    # convection-like skew part destroys symmetry
    for i in range(n - 1):
        A[i, i + 1] += 0.5
    A += sp.diags(rng.uniform(0.1, 0.5, n))
    return A.tocsr()


class TestSpMV:
    def test_mv_tmv(self):
        A = _nonsym(50)
        As = _to_sparse(A)
        x = np.random.default_rng(1).normal(size=50)
        np.testing.assert_allclose(np.asarray(As.mv(jnp.asarray(x))),
                                   A @ x, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(As.tmv(jnp.asarray(x))),
                                   A.T @ x, rtol=1e-12)


SOLVERS_SPD = [cg, bicgstab, bicgstabl, bicgstabl_gs, idrs, idrs_original,
               gmres, lsqr, cgs, cgs2, tfqmr]
SOLVERS_NONSYM = [bicgstab, bicgstabl, bicgstabl_gs, idrs, idrs_original,
                  gmres, lsqr, cgs, cgs2, tfqmr]


class TestKrylov:
    @pytest.mark.parametrize("solver", SOLVERS_SPD,
                             ids=[s.__name__ for s in SOLVERS_SPD])
    def test_spd(self, solver):
        n = 64
        A = _laplace_1d(n)
        x_true = np.sin(np.linspace(0, 3, n))
        b = jnp.asarray(A @ x_true)
        x, iters, res = solver(_to_sparse(A), b, tol=1e-10, maxiter=5000)
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-6)

    @pytest.mark.parametrize("solver", SOLVERS_NONSYM,
                             ids=[s.__name__ for s in SOLVERS_NONSYM])
    def test_nonsymmetric(self, solver):
        n = 64
        A = _nonsym(n)
        x_true = np.cos(np.linspace(0, 5, n))
        b = jnp.asarray(A @ x_true)
        x, iters, res = solver(_to_sparse(A), b, tol=1e-10, maxiter=5000)
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-5)

    def test_left_jacobi(self):
        n = 64
        A = _nonsym(n) @ sp.diags(np.linspace(1, 100, n))
        x_true = np.ones(n)
        b = jnp.asarray(A @ x_true)
        As = _to_sparse(A)
        pl = 1.0 / jnp.asarray(np.abs(A.diagonal()))
        x, iters, res = bicgstab(As, b, tol=1e-11, maxiter=5000, pl=pl)
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-5)


class TestDriver:
    def test_iterative_solve_with_pr_jacobi(self):
        n = 100
        # badly column-scaled system: right Jacobi fixes it
        A = (_nonsym(n) @ sp.diags(np.logspace(0, 4, n))).tocsr()
        x_true = np.random.default_rng(2).normal(size=n)
        b = jnp.asarray(A @ x_true)
        As = _to_sparse(A)
        rows = np.asarray(As.rows)
        cols = np.asarray(As.cols)
        diag_pos = np.full(n, -1, dtype=np.int64)
        hits = rows == cols
        diag_pos[rows[hits]] = np.nonzero(hits)[0]
        x = iterative_solve(As, b, diag_pos, converge_tol=1e-12,
                            sv_func=linsolve.krylov.bicgstab,
                            max_pass=10, maxiter=2000)
        np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6)

    def test_direct_lu(self):
        n = 50
        A = _nonsym(n)
        x_true = np.random.default_rng(3).normal(size=n)
        b = jnp.asarray(A @ x_true)
        x = solver_lu(_to_sparse(A), b)
        np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-10)

    def test_direct_qr(self):
        """Device dense-QR direct solve (solver_QR_GPU parity,
        01_Direct_Solver.jl:55-66): matches LU on a general system and
        stays accurate on a penalty-row-dominated one (the QR role in
        the reference: robustness where pivoted LU loses digits)."""
        from metafem.linsolve import solver_qr
        n = 60
        A = _nonsym(n)
        x_true = np.random.default_rng(4).normal(size=n)
        b = jnp.asarray(A @ x_true)
        x = solver_qr(_to_sparse(A), b)
        np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-8)
        # penalty-scaled rows (boundary-condition style, kappa ~ 1e10)
        P = A.copy()
        P[:3] *= 1e10
        bp = jnp.asarray(P @ x_true)
        xp = solver_qr(_to_sparse(P), bp)
        np.testing.assert_allclose(np.asarray(xp), x_true, rtol=1e-5)
        with np.testing.assert_raises(ValueError):
            solver_qr(_to_sparse(A), b, max_dense_n=10)


class TestNeumannPreconditioner:
    def test_reduces_iterations(self):
        n = 256
        A = _laplace_1d(n)
        x_true = np.sin(np.linspace(0, 3, n))
        b = jnp.asarray(A @ x_true)
        As = _to_sparse(A)
        rows = np.asarray(As.rows)
        cols = np.asarray(As.cols)
        diag_pos = np.full(n, -1, dtype=np.int64)
        hits = rows == cols
        diag_pos[rows[hits]] = np.nonzero(hits)[0]

        x0, it0, _ = bicgstab(As, b, tol=1e-10, maxiter=20000)
        from metafem.linsolve.poly import NeumannOperator
        from metafem.linsolve.precond import pl_jacobi
        Ap = NeumannOperator(As, pl_jacobi(As, diag_pos), 4)
        bp = Ap.pinv(b)
        x1, it1, _ = bicgstab(Ap, bp, tol=1e-10, maxiter=20000)
        np.testing.assert_allclose(np.asarray(x1), x_true, atol=1e-5)
        # order-4 polynomial must cut the iteration count substantially
        assert int(it1) < 0.6 * int(it0)

    def test_driver_neumann_path(self):
        n = 128
        A = _nonsym(n)
        x_true = np.cos(np.linspace(0, 5, n))
        b = jnp.asarray(A @ x_true)
        As = _to_sparse(A)
        rows = np.asarray(As.rows)
        cols = np.asarray(As.cols)
        diag_pos = np.full(n, -1, dtype=np.int64)
        hits = rows == cols
        diag_pos[rows[hits]] = np.nonzero(hits)[0]
        x = iterative_solve(As, b, diag_pos, converge_tol=1e-10,
                            sv_func=linsolve.krylov.bicgstab,
                            neumann_order=3, max_pass=10, maxiter=5000)
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-6)


class TestF32Robustness:
    """f32 robustness of the Givens-rotation GMRES and the Gram-Schmidt
    BiCGStab(l) MR part (VERDICT: the normal-equations Hessenberg solve
    squares the conditioning; at kappa ~ 1e5 in f32 it loses all digits,
    Givens does not)."""

    def _illcond(self, n=400, kappa=1e5):
        rng = np.random.default_rng(3)
        d = np.logspace(0, np.log10(kappa), n)
        A = sp.diags(d).tolil()
        for i in range(n - 1):           # mild nonsymmetric coupling
            A[i, i + 1] += 0.05 * d[i]
        A = A.tocsr().astype(np.float32)
        x_true = rng.normal(size=n).astype(np.float32)
        return A, x_true

    def test_gmres_givens_illconditioned_f32(self):
        A, x_true = self._illcond()
        b = jnp.asarray((A @ x_true).astype(np.float32))
        # right-Jacobi scaling as the production driver does
        s_ = (1.0 / A.diagonal()).astype(np.float32)
        Aj = _to_sparse((A @ sp.diags(s_)).astype(np.float32))
        x, iters, res = gmres(Aj, b, tol=1e-5, maxiter=800, s=40)
        x = jnp.asarray(s_) * x
        assert x.dtype == jnp.float32
        rel = np.linalg.norm(np.asarray(x) - x_true) / np.linalg.norm(x_true)
        assert rel < 1e-3, rel

        # the normal-equations LS on the same Hessenberg loses the digits:
        # kappa(H^T H) ~ kappa^2 ~ 1e10 >> 1/eps_f32
        H = np.triu(np.random.default_rng(0).normal(
            size=(41, 40)), -1).astype(np.float32)
        H[np.diag_indices(40)] = np.logspace(0, -5, 40)
        e1 = np.zeros(41, np.float32)
        e1[0] = 1.0
        y_ne = np.linalg.solve((H.T @ H).astype(np.float32),
                               (H.T @ e1).astype(np.float32))
        y_ref = np.linalg.lstsq(H.astype(np.float64),
                                e1.astype(np.float64), rcond=None)[0]
        ne_err = np.linalg.norm(y_ne - y_ref) / np.linalg.norm(y_ref)
        assert ne_err > 1e-2   # normal equations are genuinely broken here

    def test_bicgstabl_gs_matches_lu_variant(self):
        A = _nonsym(128)
        x_true = np.cos(np.linspace(0, 4, 128))
        b = jnp.asarray(A @ x_true)
        x_gs, _, res_gs = bicgstabl_gs(_to_sparse(A), b, tol=1e-10,
                                       maxiter=4000, s=4)
        assert float(res_gs) < 1e-10
        np.testing.assert_allclose(np.asarray(x_gs), x_true, atol=1e-7)
