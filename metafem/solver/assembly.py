"""The compiled updaters: trace-time construction of the two jitted
assembly functions.

The analog of the reference's runtime code generator
(solver/05_CodeGenerator.jl + solver/06_FEM_Kernel.jl), redesigned for XLA:

* ``_Var_Basic`` gathers (one atomic sum per thread) become batched einsums
  ``val[b, q] = itg_vals[b, q, a, mode] @ x_star[rows[b, a]]``;
* ``_Kval_Basic`` scatters become per-element batched GEMMs
  ``kel[b, a, c] = sum_q phi_a phi_c (coef * w)`` followed by one
  deterministic ``segment_sum`` into the precomputed COO slots — no
  atomics, bitwise-reproducible;
* ``_Res_Basic`` likewise via ``segment_sum`` over DOF rows.

Two functions are built (compile_Updater_GPU, 05_CodeGenerator.jl:265-291):
``k_linear(state)`` assembles the x-independent gradient blocks once per
time step; ``res_k_nonlinear(state)`` assembles the residual and the
state-dependent gradient blocks every Newton iteration, on top of the
cached linear part.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..elements.discretization import (ClassicalDiscretization,
                                       sd_ids_to_mode)
from ..symbolics.registry import (CONTROLPOINT_VAR, GLOBAL_VAR,
                                  INTEGRATION_POINT_VAR)
from ..symbolics.tensor_table import TensorTable
from .global_assembly import GlobalPattern, WPGlobalInfo
from .local_assembly import (AssembleBilinear, AssembleWeakform,
                             ExtervarInfo, InnervarInfo, LocalAssembly)
from .lowering import LoweringContext


@dataclasses.dataclass
class CompiledWP:
    """Static (host) per-workpiece metadata closed over by the updaters."""
    disc: ClassicalDiscretization
    la: LocalAssembly
    info: WPGlobalInfo
    #: boundary group id -> list of (eindex, facet element ids) partitions
    bdy_parts: Dict[int, List[Tuple[int, np.ndarray]]]


def _segment_sum(data, ids, num):
    return jax.ops.segment_sum(data, ids, num_segments=num)


def _build_env(tb: TensorTable, wp_state: dict, part_state: dict,
               cw: CompiledWP, inner_infos: List[InnervarInfo],
               exter_infos: List[ExtervarInfo], x_star, t, dt,
               global_vars: dict, is_boundary: bool) -> dict:
    """Gather quadrature-point values for every referenced variable — the
    analog of declare_Innervar_GPU / declare_Extervar_GPU
    (solver/05_CodeGenerator.jl:1-50)."""
    env: dict = {}
    itg_vals = part_state["itg_vals"]           # [B, nq, na, n_modes]
    el_cp = part_state["el_cp"]                 # [B, na]
    disc, info, la = cw.disc, cw.info, cw.la

    for (sym, td, sd_ids, pos) in inner_infos:
        if len(sd_ids) > la.max_sd_order:
            env[sym] = 0.0  # truncated derivative (explicit_max_sd_order)
            continue
        m = sd_ids_to_mode(tb.dim, sd_ids, disc.sd_modes)
        rows = el_cp + (info.dof_offset + pos * info.n_cp)
        env[sym] = jnp.einsum("bqa,ba->bq", itg_vals[..., m], x_star[td][rows])

    for (sym, local_sym, base, sd_ids, c_ids) in exter_infos:
        attrs = tb.registry.attributes(base)
        if GLOBAL_VAR in attrs:
            if base == "t":
                env[sym] = t
            elif base == "dt":
                env[sym] = dt
            elif sym in global_vars:
                # traced from the state pytree: runtime-changeable without
                # recompilation (the reference reads physics.global_vars at
                # run time, 05_CodeGenerator.jl:26)
                env[sym] = global_vars[sym]
            else:
                raise KeyError(
                    f"global variable {sym!r} has no value; set "
                    f"domain.global_vars[{sym!r}] before compile()")
        elif CONTROLPOINT_VAR in attrs:
            if len(sd_ids) > la.max_sd_order:
                env[sym] = 0.0
                continue
            m = sd_ids_to_mode(tb.dim, sd_ids, disc.sd_modes)
            col = wp_state["fields"][local_sym]             # [n_cp]
            env[sym] = jnp.einsum("bqa,ba->bq", itg_vals[..., m], col[el_cp])
        elif INTEGRATION_POINT_VAR in attrs and base == "n":
            if not is_boundary:
                raise ValueError("the normal n{i} only exists on boundaries")
            env[sym] = part_state["normals"][..., c_ids[0] - 1]
        else:
            raise ValueError(f"unresolved external variable {sym!r}")
    return env


def _assemble_part(tb: TensorTable, cw: CompiledWP, part_state: dict,
                   bilinears_res: List[AssembleBilinear],
                   bilinears_grad: List[AssembleBilinear],
                   ctx: LoweringContext, K_params,
                   ) -> Tuple[Optional[Tuple[jnp.ndarray, jnp.ndarray]],
                              Dict[int, jnp.ndarray]]:
    """Residual (rows, values) and per-unit COO chunks for one batch of
    elements or facets (gen_K_Linear_GPU / gen_Res_K_NonLinear_GPU,
    05_CodeGenerator.jl:52-154)."""
    disc, la, info = cw.disc, cw.la, cw.info
    itg_vals = part_state["itg_vals"]
    weights = part_state["weights"]
    el_cp = part_state["el_cp"]
    pair_slot = part_state["pair_slot"]

    res_out = None
    if bilinears_res:
        res_el = None
        rows_all = None
        contribs = {}
        for bil in bilinears_res:
            sym, td, sd_ids, pos = bil.dual_info
            if len(sd_ids) > la.max_sd_order:
                continue
            m = sd_ids_to_mode(tb.dim, sd_ids, disc.sd_modes)
            cwgt = ctx.lower(bil.base_term) * weights          # [B, nq]
            contrib = jnp.einsum("bqa,bq->ba", itg_vals[..., m], cwgt)
            contribs[pos] = contribs.get(pos, 0.0) + contrib
        if contribs:
            parts = []
            rows_parts = []
            for pos, c in contribs.items():
                parts.append(c.reshape(-1))
                rows = el_cp + (info.dof_offset + pos * info.n_cp)
                rows_parts.append(rows.reshape(-1))
            res_out = (jnp.concatenate(rows_parts),
                       jnp.concatenate(parts))
        del res_el, rows_all

    kel_units: Dict[int, jnp.ndarray] = {}
    for bil in bilinears_grad:
        _, _, dual_sd, dual_pos = bil.dual_info
        _, der_td, der_sd, der_pos = bil.derivative_info
        if max(len(dual_sd), len(der_sd)) > la.max_sd_order:
            continue
        u = la.sparse_mapping[(dual_pos, der_pos)]
        m1 = sd_ids_to_mode(tb.dim, dual_sd, disc.sd_modes)
        m2 = sd_ids_to_mode(tb.dim, der_sd, disc.sd_modes)
        cwgt = ctx.lower(bil.base_term) * K_params[der_td] * weights
        kel = jnp.einsum("bqa,bq,bqc->bac",
                         itg_vals[..., m1], cwgt, itg_vals[..., m2])
        kel_units[u] = kel_units.get(u, 0.0) + kel

    chunks = {u: _segment_sum(kel.reshape(-1), pair_slot.reshape(-1),
                              info.unitsize)
              for u, kel in kel_units.items()}
    return res_out, chunks


def make_updaters(tb: TensorTable, compiled_wps: List[CompiledWP],
                  pattern: GlobalPattern,
                  functions: Dict[str, object]):
    """Build (k_linear, res_k_nonlinear) as jittable pure functions of the
    runtime ``state`` pytree."""
    bfs = pattern.basicfield_size

    def _run(state, linear_only: bool):
        dtype = state["x_star"].dtype
        K = jnp.zeros(pattern.nnz, dtype)
        residue = jnp.zeros(bfs, dtype)
        x_star = state["x_star"]
        t, dt, K_params = state["t"], state["dt"], state["K_params"]
        global_vars = state.get("global_vars", {})
        for w_i, cw in enumerate(compiled_wps):
            wp_state = state["wp"][w_i]
            la, info = cw.la, cw.info

            def do_wf(wf: AssembleWeakform, part_state, is_boundary):
                nonlocal K, residue
                if linear_only:
                    res_bils, grad_bils = [], wf.linear_gradients
                    inner_infos: List[InnervarInfo] = []
                    exter_infos = wf.linear_extervar_infos
                else:
                    res_bils, grad_bils = wf.residues, wf.nonlinear_gradients
                    inner_infos = wf.innervar_infos
                    exter_infos = wf.extervar_infos
                if not (res_bils or grad_bils):
                    return
                env = _build_env(tb, wp_state, part_state, cw, inner_infos,
                                 exter_infos, x_star, t, dt, global_vars,
                                 is_boundary)
                ctx = LoweringContext(tb, env, functions,
                                      user_state=state.get("user"))
                res_out, chunks = _assemble_part(
                    tb, cw, part_state, res_bils, grad_bils, ctx, K_params)
                if res_out is not None:
                    rows, vals = res_out
                    residue = residue + _segment_sum(vals, rows, bfs)
                for u, chunk in chunks.items():
                    off = info.sparse_entry + u * info.unitsize
                    K = K.at[off:off + info.unitsize].add(chunk)

            do_wf(la.assembled_weakform, wp_state["el"], False)
            for bg_id, wf in la.assembled_boundary_weakform_pairs.items():
                for part_state in wp_state["bdy"][bg_id]:
                    do_wf(wf, part_state, True)
        return residue, K

    def k_linear(state):
        """K_linear: x-independent gradient blocks, once per step."""
        _, K = _run(state, linear_only=True)
        return K

    def res_k_nonlinear(state):
        """(residue, K_total = K_linear + nonlinear blocks), per Newton
        iteration."""
        residue, K = _run(state, linear_only=False)
        return residue, state["K_linear"] + K

    return k_linear, res_k_nonlinear
