"""Two-float (double-f32) assembly lowering: f64-quality residual
evaluation of arbitrary weak forms at native f32 VPU rate.

Why this exists: the refined-residual Newton path (jit_step.
make_refined_step) needs EXACT residuals to push an f32 hot path to the
reference's 1e-6 normalized-residual bar (pikachu.jl:106).  For affine
weak forms the residual is frozen once as a DF operator
(twofloat.df_offset_mv); *nonaffine volume* forms (hyperelasticity's
P{i,j}=d(W,F{i,j}), the cavity's u.grad(u) convection, J2 return maps)
must be re-evaluated at every refinement iteration.  XLA:TPU's emulated
f64 is ~30-100x off bandwidth for exactly these shapes (measured,
twofloat.py header), so the evaluation runs in two-float arithmetic
instead:

* every gathered variable, geometry table, and intermediate is an
  (hi, lo) f32 pair carrying ~48 significant bits;
* the gather->quadrature einsums are dot2-compensated contractions
  (twofloat.df_dot2) — error-free products, compensated hi sums;
* +, *, integer ^ and / lower to native DF ops; transcendentals and
  user callbacks fall back to emulated f64 on quadrature-point-sized
  arrays only (cheap at [B, nq]);
* the reduction to the global residual stays exact: the lattice
  interleave places values without rounding, cross-stream accumulation
  is df_add, gather maps use compensated sums (scatter.
  apply_device_maps_df).

The reference has no counterpart: it simply pins FEM_Float = Float64
(misc/02_Global_Macros.jl:124) — free on a CUDA GPU, 30-100x on TPU.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..linsolve import twofloat as tf
from ..linsolve.twofloat import DF
from ..symbolics.registry import (CONTROLPOINT_VAR, GLOBAL_VAR,
                                  INTEGRATION_POINT_VAR)
from ..elements.discretization import sd_ids_to_mode
from .lowering import LoweringContext, _BUILTIN_FNS

#: ops with native DF implementations; everything else falls back to
#: emulated f64 on [B, nq]-sized arrays (see _fallback)
_DF_CMP = {"lt": lambda a, b: a < b, "gt": lambda a, b: a > b,
           "le": lambda a, b: a <= b, "ge": lambda a, b: a >= b}


def df_index(x: DF, idx) -> DF:
    """x[..., idx] on both components."""
    return DF(x.hi[..., idx], x.lo[..., idx])


def df_einsum_bqa_ba(T: DF, V: DF) -> DF:
    """sum_a T[b,q,a] * V[b,a] -> [b,q], dot2-compensated (the
    quadrature-value gather einsum of assembly._build_env)."""
    na = T.hi.shape[-1]
    return tf.df_dot2(
        (df_index(T, a), DF(V.hi[:, None, a], V.lo[:, None, a]))
        for a in range(na))


def df_einsum_bqa_bq(T: DF, V: DF) -> DF:
    """sum_q T[b,q,a] * V[b,q] -> [b,a], dot2-compensated (the residual
    test-function contraction of assembly._assemble_part)."""
    nq = T.hi.shape[1]
    return tf.df_dot2(
        (DF(T.hi[:, q, :], T.lo[:, q, :]),
         DF(V.hi[:, q, None], V.lo[:, q, None]))
        for q in range(nq))


def df_gather(vec: DF, idx) -> DF:
    return DF(vec.hi[idx], vec.lo[idx])


def build_env_df(tb, wp_state: dict, part_state: dict, cw,
                 inner_infos, exter_infos, x_star: DF, t, dt,
                 global_vars: dict, is_boundary: bool,
                 gather_fast=None) -> Dict[str, object]:
    """DF mirror of assembly._build_env: every env entry is a DF pair.
    ``part_state`` carries DF geometry tables (itg_vals, weights,
    normals) and plain int32 el_cp; ``x_star`` is a DF [levels, n]."""
    env: Dict[str, object] = {}
    itg_vals: DF = part_state["itg_vals"]
    el_cp = part_state["el_cp"]
    disc, info, la = cw.disc, cw.info, cw.la

    def node_vals(vec: DF, block_base) -> DF:
        if gather_fast is not None:
            from .lattice_reduce import gather_lattice_nodes
            n_cp = info.n_cp
            bh = jax.lax.dynamic_slice(vec.hi, (block_base,), (n_cp,))
            bl = jax.lax.dynamic_slice(vec.lo, (block_base,), (n_cp,))
            return DF(gather_lattice_nodes(bh, gather_fast),
                      gather_lattice_nodes(bl, gather_fast))
        idx = el_cp + block_base if block_base else el_cp
        return df_gather(vec, idx)

    for (sym, td, sd_ids, pos) in inner_infos:
        if len(sd_ids) > la.max_sd_order:
            env[sym] = 0.0
            continue
        m = sd_ids_to_mode(tb.dim, sd_ids, disc.sd_modes)
        nodes = node_vals(DF(x_star.hi[td], x_star.lo[td]),
                          info.dof_offset + pos * info.n_cp)
        env[sym] = df_einsum_bqa_ba(df_index(itg_vals, m), nodes)

    for (sym, local_sym, base, sd_ids, c_ids) in exter_infos:
        attrs = tb.registry.attributes(base)
        if GLOBAL_VAR in attrs:
            if base == "t":
                env[sym] = tf.as_df(t)
            elif base == "dt":
                env[sym] = tf.as_df(dt)
            elif sym in global_vars:
                env[sym] = tf.as_df(global_vars[sym])
            else:
                raise KeyError(f"global variable {sym!r} has no value")
        elif CONTROLPOINT_VAR in attrs:
            if len(sd_ids) > la.max_sd_order:
                env[sym] = 0.0
                continue
            m = sd_ids_to_mode(tb.dim, sd_ids, disc.sd_modes)
            col: DF = wp_state["fields"][local_sym]
            env[sym] = df_einsum_bqa_ba(df_index(itg_vals, m),
                                        node_vals(col, 0))
        elif INTEGRATION_POINT_VAR in attrs and base == "n":
            if not is_boundary:
                raise ValueError("the normal n{i} only exists on "
                                 "boundaries")
            env[sym] = df_index(part_state["normals"], c_ids[0] - 1)
        else:
            raise ValueError(f"unresolved external variable {sym!r}")
    return env


class DFLoweringContext(LoweringContext):
    """LoweringContext whose values are DF pairs (or python floats for
    constants).  +, *, integer ^ and / run natively in DF; comparisons
    compare hi parts (selection only); everything else — powers with
    non-integer exponents, transcendentals, user callbacks — evaluates
    through emulated f64 on the quadrature-point arrays and splits back
    (bounded cost: [B, nq]-sized data, never global vectors)."""

    def _lower_term(self, t):
        if t.op == "+":
            acc = tf.as_df(self.lower(t.subterms[0]))
            for s in t.subterms[1:]:
                acc = tf.df_add(acc, tf.as_df(self.lower(s)))
            return acc
        if t.op == "*":
            acc = tf.as_df(self.lower(t.subterms[0]))
            for s in t.subterms[1:]:
                acc = tf.df_mul(acc, tf.as_df(self.lower(s)))
            return acc
        if t.op == "^":
            b = tf.as_df(self.lower(t.subterms[0]))
            e = self.lower(t.subterms[1])
            if isinstance(e, float) and e == round(e):
                n = int(e)
                if n < 0:
                    return tf.df_div(tf.df_const(1.0),
                                     self._df_int_pow(b, -n))
                if n == 0:
                    return 1.0
                return self._df_int_pow(b, n)
            return self._fallback(lambda bb, ee: bb ** ee, [b, e])
        args = [self.lower(s) for s in t.subterms]
        if t.op == "ifelse":
            c, a, b = args
            a, b = tf.as_df(a), tf.as_df(b)
            cond = c.hi if isinstance(c, DF) else c
            return DF(jnp.where(cond, a.hi, b.hi),
                      jnp.where(cond, a.lo, b.lo))
        cmp = _DF_CMP.get(t.op)
        if cmp is not None:
            a, b = (tf.df_to_f64(v) if isinstance(v, DF) else v
                    for v in args)
            return cmp(a, b)
        fn = self.functions.get(t.op)
        if fn is not None:
            import inspect
            if "user" in inspect.signature(fn).parameters:
                return self._fallback(
                    lambda *aa: fn(*aa, user=self.user_state), args)
            return self._fallback(fn, args)
        fn = _BUILTIN_FNS.get(t.op)
        if fn is None:
            raise ValueError(f"unknown function {t.op!r} in weak form; "
                             f"register it via "
                             f"FEM_Domain.register_function")
        return self._fallback(fn, args)

    @staticmethod
    def _df_int_pow(b: DF, n: int) -> DF:
        acc = b
        for _ in range(n - 1):
            acc = tf.df_mul(acc, b)
        return acc

    @staticmethod
    def _fallback(fn, args):
        """Emulated-f64 evaluation of an op without a DF kernel.  User
        callbacks backing multi-component integration-point variables
        (e.g. a Voigt plastic-strain tensor) return a tuple of
        components — split each back to a DF pair so _lower_itg_var can
        distribute them."""
        args64 = [tf.df_to_f64(a) if isinstance(a, DF)
                  else (jnp.float64(a) if isinstance(a, float) else a)
                  for a in args]
        out = fn(*args64)

        def split(o):
            o = jnp.asarray(o)
            if o.dtype == jnp.bool_:
                return o
            o = o.astype(jnp.float64)
            hi = o.astype(jnp.float32)
            return DF(hi, (o - hi.astype(jnp.float64)).astype(jnp.float32))

        if isinstance(out, (tuple, list)):
            return tuple(split(o) for o in out)
        return split(out)


def assemble_part_df(tb, cw, part_state: dict, bilinears_res,
                     ctx: DFLoweringContext) -> Dict[int, DF]:
    """DF mirror of assembly._assemble_part, residues only (the tangent
    needs no extended precision — it only sets the convergence rate):
    per-DOF-position [B, na] DF contribution pairs."""
    disc, la = cw.disc, cw.la
    itg_vals: DF = part_state["itg_vals"]
    weights: DF = part_state["weights"]
    out: Dict[int, DF] = {}
    for bil in bilinears_res:
        _, _, sd_ids, pos = bil.dual_info
        if len(sd_ids) > la.max_sd_order:
            continue
        m = sd_ids_to_mode(tb.dim, sd_ids, disc.sd_modes)
        cwgt = tf.df_mul(tf.as_df(ctx.lower(bil.base_term)), weights)
        contrib = df_einsum_bqa_bq(df_index(itg_vals, m), cwgt)
        prev = out.get(pos)
        out[pos] = contrib if prev is None else tf.df_add(prev, contrib)
    return out


def df_tables(wp_states: List[dict], device=None) -> List[dict]:
    """Split a CPU-built f64 geometry-state list (domain._geometry_state)
    into DF pairs and place them on ``device``: itg_vals / weights /
    normals / fields become DF; el_cp stays int32."""
    def put(a):
        a = np.asarray(a)
        return jax.device_put(jnp.asarray(a), device)

    def split(a):
        a = np.asarray(a, np.float64)
        hi = a.astype(np.float32)
        lo = (a - hi.astype(np.float64)).astype(np.float32)
        return DF(put(hi), put(lo))

    out = []
    for ws in wp_states:
        el = ws["el"]
        el_df = None
        if el is not None:
            el_df = {"itg_vals": split(el["itg_vals"]),
                     "weights": split(el["weights"]),
                     "el_cp": put(el["el_cp"])}
        bdy_df = {}
        for bg_id, plist in ws["bdy"].items():
            bdy_df[bg_id] = [
                {"itg_vals": split(p["itg_vals"]),
                 "weights": split(p["weights"]),
                 "normals": split(p["normals"]),
                 "el_cp": put(p["el_cp"])} for p in plist]
        out.append({"el": el_df, "bdy": bdy_df,
                    "fields": {k: split(v)
                               for k, v in ws["fields"].items()}})
    return out
