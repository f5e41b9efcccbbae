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
    #: host copy of the element control-point ids [E, na]
    el_cp: np.ndarray = None


def _build_env(tb: TensorTable, wp_state: dict, part_state: dict,
               cw: CompiledWP, inner_infos: List[InnervarInfo],
               exter_infos: List[ExtervarInfo], x_star, t, dt,
               global_vars: dict, is_boundary: bool,
               gather_fast=None) -> dict:
    """Gather quadrature-point values for every referenced variable — the
    analog of declare_Innervar_GPU / declare_Extervar_GPU
    (solver/05_CodeGenerator.jl:1-50).  ``gather_fast``: FastStream list
    for lattice strided node reads (lattice_reduce.gather_lattice_nodes)
    on the volume part, or None for the generic [B, na] gather."""
    env: dict = {}
    itg_vals = part_state["itg_vals"]           # [B, nq, na, n_modes]
    el_cp = part_state["el_cp"]                 # [B, na]
    disc, info, la = cw.disc, cw.info, cw.la

    def node_vals(vec, block_base):
        """vec[block_base + el_cp] as [B, na]."""
        if gather_fast is not None:
            from .lattice_reduce import gather_lattice_nodes
            block = jax.lax.dynamic_slice(vec, (block_base,),
                                          (info.n_cp,))
            return gather_lattice_nodes(block, gather_fast)
        return vec[el_cp + block_base] if block_base else vec[el_cp]

    for (sym, td, sd_ids, pos) in inner_infos:
        if len(sd_ids) > la.max_sd_order:
            env[sym] = 0.0  # truncated derivative (explicit_max_sd_order)
            continue
        m = sd_ids_to_mode(tb.dim, sd_ids, disc.sd_modes)
        nodes = node_vals(x_star[td], info.dof_offset + pos * info.n_cp)
        env[sym] = jnp.einsum("bqa,ba->bq", itg_vals[..., m], nodes)

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
            env[sym] = jnp.einsum("bqa,ba->bq", itg_vals[..., m],
                                  node_vals(col, 0))
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
                   ) -> Tuple[Dict[int, jnp.ndarray],
                              Dict[int, jnp.ndarray]]:
    """Per-DOF-position residual contributions [B, na] and per-unit
    element-stiffness blocks [B, na, na] for one batch of elements or
    facets (gen_K_Linear_GPU / gen_Res_K_NonLinear_GPU,
    05_CodeGenerator.jl:52-154).  No scattering here — the caller reduces
    everything through precomputed gather maps."""
    disc, la = cw.disc, cw.la
    itg_vals = part_state["itg_vals"]
    weights = part_state["weights"]

    res_contribs: Dict[int, jnp.ndarray] = {}
    for bil in bilinears_res:
        _, _, sd_ids, pos = bil.dual_info
        if len(sd_ids) > la.max_sd_order:
            continue
        m = sd_ids_to_mode(tb.dim, sd_ids, disc.sd_modes)
        cwgt = ctx.lower(bil.base_term) * weights              # [B, nq]
        contrib = jnp.einsum("bqa,bq->ba", itg_vals[..., m], cwgt)
        res_contribs[pos] = res_contribs.get(pos, 0.0) + contrib

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

    return res_contribs, kel_units


def _phase_parts(wf: AssembleWeakform, phase: str):
    """(res_bils, grad_bils) contributing in a phase.

    Phases: ``lin`` — x-independent gradient blocks, once per step;
    ``nl`` — residues + x-dependent gradients, per Newton iteration;
    ``aff_lin`` — linear gradients of *affine* forms only (the frozen
    f64 affine operator A_td of the refined-residual path, refine.py);
    ``aff_res`` — residues of affine forms (evaluated at x=0 to freeze
    the constant part b); ``nonaff_nl`` — residues and nonlinear
    gradients of nonaffine forms (the small per-refinement-iteration
    assembly)."""
    if phase == "lin":
        return [], wf.linear_gradients
    if phase == "nl":
        return wf.residues, wf.nonlinear_gradients
    aff = wf.affine_form_ids()
    if phase == "aff_lin":
        return [], [g for g in wf.linear_gradients if g.form_id in aff]
    if phase == "aff_res":
        return [r for r in wf.residues if r.form_id in aff], []
    if phase == "nonaff_nl":
        return ([r for r in wf.residues if r.form_id not in aff],
                wf.nonlinear_gradients)
    if phase == "nonaff_res":
        return [r for r in wf.residues if r.form_id not in aff], []
    if phase == "nl_grad":
        return [], wf.nonlinear_gradients
    raise ValueError(f"unknown assembly phase {phase!r}")


def _phase_bilinears(wf: AssembleWeakform, la: LocalAssembly,
                     phase: str):
    """(residual positions, K units) this weak form contributes in the
    given phase — shared by the traced run and the host map builder so
    the contribution concatenation orders match exactly."""
    res_bils, grad_bils = _phase_parts(wf, phase)
    positions = sorted({b.dual_info[3] for b in res_bils
                        if len(b.dual_info[2]) <= la.max_sd_order})
    units = sorted({la.sparse_mapping[(b.dual_info[3],
                                       b.derivative_info[3])]
                    for b in grad_bils
                    if max(len(b.dual_info[2]),
                           len(b.derivative_info[2])) <= la.max_sd_order})
    return positions, units


def collect_phase_streams(compiled_wps: List[CompiledWP],
                          pattern: GlobalPattern, phase: str):
    """Host mirror of _run's contribution order, one entry per stream:
    dicts {kind: 'r'|'k', slots: [E, n_cols] int64, volume: bool,
    wp: index}.  The order matches _run's emission exactly (volume weak
    form first, then boundary parts; residual positions then K units,
    both sorted)."""
    streams: List[dict] = []
    for w_i, cw in enumerate(compiled_wps):
        la, info = cw.la, cw.info

        def handle(wf, el_cp_np, pair_slot_np, volume):
            positions, units = _phase_bilinears(wf, la, phase)
            for pos in positions:
                streams.append(dict(
                    kind="r", volume=volume, wp=w_i,
                    slots=(el_cp_np.astype(np.int64) + info.dof_offset
                           + pos * info.n_cp)))
            for u in units:
                B = pair_slot_np.shape[0]
                streams.append(dict(
                    kind="k", volume=volume, wp=w_i,
                    slots=pattern.slot_storage(
                        (pair_slot_np.astype(np.int64) + info.sparse_entry
                         + u * info.unitsize).reshape(-1)
                    ).reshape(B, -1)))

        handle(la.assembled_weakform, cw.el_cp, info.pair_slot, True)
        for bg_id, wf in la.assembled_boundary_weakform_pairs.items():
            for (_, els) in cw.bdy_parts[bg_id]:
                handle(wf, cw.el_cp[els], info.pair_slot[els], False)
    return streams


def collect_phase_slots(compiled_wps: List[CompiledWP],
                        pattern: GlobalPattern, phase: str):
    """Concatenated residual DOF rows and K storage slots for one phase
    (all streams; see collect_phase_streams for the per-stream view)."""
    streams = collect_phase_streams(compiled_wps, pattern, phase)
    r = [s["slots"].reshape(-1) for s in streams if s["kind"] == "r"]
    k = [s["slots"].reshape(-1) for s in streams if s["kind"] == "k"]
    return (np.concatenate(r) if r else None,
            np.concatenate(k) if k else None)


def _reduce_df(r_vals, fast_r: dict, extents, total: int,
               device_maps: dict):
    """Two-float residual reduction (df_lowering.py): per-stream DF
    contribution pairs -> a DF global residual.  The lattice interleave
    places hi/lo exactly (0/1 selection matmuls — no rounding); only the
    cross-column accumulation compensates (df_add / scan_apply_group_df);
    non-fitting streams reduce through the compensated gather maps
    (scatter.apply_device_maps_df)."""
    from ..linsolve import twofloat as tf
    from .lattice_reduce import (concat_fast_blocks, interleave_stream,
                                 scan_apply_group_df, use_scan_interleave)
    from .scatter import apply_device_maps_df

    pairs = []                        # (DF col, FastStream)
    rest = []                         # flat DF contribution tails
    for si, v in enumerate(r_vals):
        entry = fast_r.get(si)
        if entry is None:
            rest.append(tf.DF(v.hi.reshape(-1), v.lo.reshape(-1)))
            continue
        fs_list, rest_cols = entry
        B = v.hi.shape[0]
        vf = tf.DF(v.hi.reshape(B, -1), v.lo.reshape(B, -1))
        pairs.extend((tf.DF(vf.hi[:, fs.col], vf.lo[:, fs.col]), fs)
                     for fs in fs_list)
        if rest_cols.size:
            rest.append(tf.DF(vf.hi[:, rest_cols].reshape(-1),
                              vf.lo[:, rest_cols].reshape(-1)))
    if pairs:
        n_cp_max = max(int(np.prod(fs.lattice)) for _, fs in pairs)
        if use_scan_interleave(2 * len(pairs), n_cp_max, 4):
            residue = tf.DF(jnp.zeros(total, jnp.float32),
                            jnp.zeros(total, jnp.float32))
            groups: Dict[tuple, list] = {}
            for col, fs in pairs:
                groups.setdefault((fs.lattice, fs.el_grid, fs.p),
                                  []).append((col, fs))
            for grp in groups.values():
                residue = scan_apply_group_df(residue, grp)
        else:
            blocks: Dict[int, tf.DF] = {}
            for col, fs in pairs:
                arr = tf.DF(interleave_stream(col.hi, fs),
                            interleave_stream(col.lo, fs))
                prev = blocks.get(fs.base)
                blocks[fs.base] = (arr if prev is None
                                   else tf.df_add(prev, arr))
            residue = tf.DF(
                concat_fast_blocks({b: d.hi for b, d in blocks.items()},
                                   extents, total, jnp.float32),
                concat_fast_blocks({b: d.lo for b, d in blocks.items()},
                                   extents, total, jnp.float32))
    else:
        residue = tf.DF(jnp.zeros(total, jnp.float32),
                        jnp.zeros(total, jnp.float32))
    if rest:
        data = tf.DF(jnp.concatenate([d.hi for d in rest]),
                     jnp.concatenate([d.lo for d in rest]))
        if "r_touched" in device_maps:
            touched = device_maps["r_touched"]
            compact = apply_device_maps_df(device_maps.get("r"), data,
                                           touched.shape[0])
            cur = tf.DF(residue.hi[touched], residue.lo[touched])
            new = tf.df_add(cur, compact)
            residue = tf.DF(residue.hi.at[touched].set(new.hi),
                            residue.lo.at[touched].set(new.lo))
        else:
            residue = tf.df_add(residue, apply_device_maps_df(
                device_maps.get("r"), data, total))
    return residue


def make_updaters(tb: TensorTable, compiled_wps: List[CompiledWP],
                  pattern: GlobalPattern,
                  functions: Dict[str, object],
                  fast_maps: Dict[str, dict] = None):
    """Build (k_linear, res_k_nonlinear) as jittable pure functions of the
    runtime ``state`` pytree.

    The contribution->slot maps are static per phase, so they are inverted
    once (at first trace) into padded gather maps; the runtime reduction
    is gathers + dense sums — no scatters (see scatter.py).

    ``fast_maps``: {phase_key: {stream_idx: [FastStream]}} — lattice
    dense-interleave reductions (lattice_reduce.py), filled in by
    FEM_Domain.compile after this call but before the first trace.
    Streams covered by it bypass the gather maps entirely; the device
    maps then cover only the remaining (boundary/unstructured) streams."""
    from .scatter import build_gather_reduce
    fast_maps = fast_maps if fast_maps is not None else {}

    bfs = pattern.basicfield_size
    #: phase -> (residual GatherReduce, K GatherReduce); built lazily at
    #: first trace, reused by retraces (the layout is phase-static)
    _maps_cache: Dict[bool, tuple] = {}

    def _run(state, phase: str):
        # two-float mode: '<base>_df' evaluates the base phase's residues
        # in double-f32 arithmetic (df_lowering.py) — x_star and all
        # geometry tables in state['wp'] are DF pairs, the return is a
        # DF residual.  Map/stream layouts are those of the base phase.
        df_mode = phase.endswith("_df")
        base_phase = phase[:-3] if df_mode else phase
        x_star = state["x_star"]
        dtype = jnp.float32 if df_mode else x_star.dtype
        t, dt, K_params = state["t"], state["dt"], state["K_params"]
        global_vars = state.get("global_vars", {})

        r_vals: List[jnp.ndarray] = []
        r_rows: List[np.ndarray] = []
        k_vals: List[jnp.ndarray] = []
        k_slots: List[np.ndarray] = []

        for w_i, cw in enumerate(compiled_wps):
            wp_state = state["wp"][w_i]
            la, info = cw.la, cw.info

            def do_wf(wf: AssembleWeakform, part_state, el_cp_np,
                      pair_slot_np, is_boundary):
                res_bils, grad_bils = _phase_parts(wf, base_phase)
                if base_phase in ("lin", "aff_lin"):
                    inner_infos: List[InnervarInfo] = []
                    exter_infos = wf.linear_extervar_infos
                else:
                    inner_infos = wf.innervar_infos
                    exter_infos = wf.extervar_infos
                if not (res_bils or grad_bils):
                    return
                gather_fast = None
                if not is_boundary and state.get("maps"):
                    gather_fast = fast_maps.get("gather", {}).get(w_i)
                if df_mode:
                    from .df_lowering import (DFLoweringContext,
                                              assemble_part_df,
                                              build_env_df)
                    assert not grad_bils, \
                        "df phases evaluate residues only"
                    env = build_env_df(tb, wp_state, part_state, cw,
                                       inner_infos, exter_infos, x_star,
                                       t, dt, global_vars, is_boundary,
                                       gather_fast=gather_fast)
                    ctx = DFLoweringContext(tb, env, functions,
                                            user_state=state.get("user"))
                    res_contribs = assemble_part_df(tb, cw, part_state,
                                                    res_bils, ctx)
                    for pos in sorted(res_contribs):
                        r_vals.append(res_contribs[pos])   # DF [B, na]
                    return
                # sharding may have padded the element batch; pad the host
                # index arrays to match (pad contributions are exactly 0 —
                # zeroed tables — so slot 0 receives harmless +0)
                B = part_state["weights"].shape[0]
                if B != el_cp_np.shape[0]:
                    pad = B - el_cp_np.shape[0]
                    el_cp_np = np.pad(el_cp_np, ((0, pad), (0, 0)))
                    pair_slot_np = np.pad(pair_slot_np,
                                          ((0, pad),) + ((0, 0),) * 2)
                env = _build_env(tb, wp_state, part_state, cw, inner_infos,
                                 exter_infos, x_star, t, dt, global_vars,
                                 is_boundary, gather_fast=gather_fast)
                ctx = LoweringContext(tb, env, functions,
                                      user_state=state.get("user"))
                res_contribs, kel_units = _assemble_part(
                    tb, cw, part_state, res_bils, grad_bils, ctx, K_params)
                for pos in sorted(res_contribs):
                    r_vals.append(res_contribs[pos])       # [B, na]
                    r_rows.append(
                        (el_cp_np.astype(np.int64) + info.dof_offset
                         + pos * info.n_cp).reshape(-1))
                for u in sorted(kel_units):
                    k_vals.append(kel_units[u])            # [B, na, nb]
                    k_slots.append(pattern.slot_storage(
                        (pair_slot_np.astype(np.int64) + info.sparse_entry
                         + u * info.unitsize).reshape(-1)))

            do_wf(la.assembled_weakform, wp_state["el"], cw.el_cp,
                  info.pair_slot, False)
            for bg_id, wf in la.assembled_boundary_weakform_pairs.items():
                for j, part_state in enumerate(wp_state["bdy"][bg_id]):
                    els = cw.bdy_parts[bg_id][j][1]
                    do_wf(wf, part_state, cw.el_cp[els],
                          info.pair_slot[els], True)

        device_maps = state.get("maps", {}).get(base_phase)
        if df_mode:
            assert device_maps is not None, \
                "df phases need device reduction maps (_ensure_device_maps)"
            residue = _reduce_df(
                r_vals, fast_maps.get(base_phase, {}).get("r", {}),
                pattern.dof_block_extents, bfs, device_maps)
            return residue, jnp.zeros((), jnp.float32)

        cache_key = (phase,
                     sum(int(r.size) for r in r_rows),
                     sum(int(k.size) for k in k_slots))
        if device_maps is not None:
            # maps passed as device arrays through the state pytree (the
            # standard path; keeps them out of the program constants)
            from .scatter import apply_device_maps
            from .lattice_reduce import (concat_fast_blocks,
                                         interleave_stream,
                                         scan_apply_group,
                                         use_scan_interleave)
            fast = fast_maps.get(phase, {})
            fast_r, fast_k = fast.get("r", {}), fast.get("k", {})

            def reduce_streams(vals_list, fast_dict, extents, total):
                """Reduce the lattice fast-path columns.  Two forms:
                unrolled (sum per lattice block, one concatenate) for
                small footprints where XLA fuses across streams, or one
                lax.scan over stacked selection matrices
                (lattice_reduce.scan_apply_group) when the unrolled
                temporaries would blow the arena (3D at 1M-DOF scale).
                Collects non-fitting columns for the gather path."""
                pairs = []                  # (vals_col, FastStream)
                rest = []
                for si, v in enumerate(vals_list):
                    entry = fast_dict.get(si)
                    if entry is None:
                        rest.append(v.reshape(-1))
                        continue
                    fs_list, rest_cols = entry
                    vf = v.reshape(v.shape[0], -1)
                    pairs.extend((vf[:, fs.col], fs) for fs in fs_list)
                    if rest_cols.size:
                        rest.append(vf[:, rest_cols].reshape(-1))
                if not pairs:
                    return jnp.zeros(total, dtype), rest
                n_cp_max = max(int(np.prod(fs.lattice)) for _, fs in pairs)
                if use_scan_interleave(len(pairs), n_cp_max,
                                       jnp.dtype(dtype).itemsize):
                    out = jnp.zeros(total, dtype)
                    groups: Dict[tuple, list] = {}
                    for col, fs in pairs:
                        key = (fs.lattice, fs.el_grid, fs.p)
                        groups.setdefault(key, []).append((col, fs))
                    for grp in groups.values():
                        out = scan_apply_group(out, grp)
                    return out, rest
                blocks: Dict[int, jnp.ndarray] = {}
                for col, fs in pairs:
                    arr = interleave_stream(col, fs)
                    prev = blocks.get(fs.base)
                    blocks[fs.base] = arr if prev is None else prev + arr
                return (concat_fast_blocks(blocks, extents, total, dtype),
                        rest)

            r_extents = pattern.dof_block_extents
            k_extents = pattern.k_segment_extents
            if state.get("r_compact") and "r_touched" in device_maps:
                # compact-return mode (refined residual path): every
                # residual stream reduces over the touched rows only;
                # the caller owns the expansion.  Only valid for phases
                # with no fast-path (volume) residual streams.
                assert not fast_r, "r_compact with fast residual streams"
                touched = device_maps["r_touched"]
                compact = apply_device_maps(
                    device_maps.get("r"),
                    jnp.concatenate([v.reshape(-1) for v in r_vals])
                    if r_vals else jnp.zeros(0, dtype),
                    touched.shape[0])
                K = jnp.zeros(pattern.n_storage, dtype)  # unused in mode
                return compact, K
            residue, rest_r = reduce_streams(r_vals, fast_r, r_extents,
                                             bfs)
            if rest_r:
                if "r_touched" in device_maps:
                    touched = device_maps["r_touched"]
                    compact = apply_device_maps(
                        device_maps.get("r"), jnp.concatenate(rest_r),
                        touched.shape[0])
                    residue = residue.at[touched].add(compact)
                else:
                    residue = residue + apply_device_maps(
                        device_maps.get("r"), jnp.concatenate(rest_r), bfs)

            K, rest_k = reduce_streams(k_vals, fast_k, k_extents,
                                       pattern.n_storage)
            if rest_k:
                if "k_touched" in device_maps:
                    # compact reduction over the touched slots + one small
                    # scatter-expand (boundary-only nonlinear tangents)
                    touched = device_maps["k_touched"]
                    compact = apply_device_maps(device_maps.get("k"),
                                                jnp.concatenate(rest_k),
                                                touched.shape[0])
                    K = K.at[touched].add(compact)
                else:
                    K = K + apply_device_maps(device_maps.get("k"),
                                              jnp.concatenate(rest_k),
                                              pattern.n_storage)
            if phase == "lin" and state.get("ghost_diag") is not None:
                # unit diagonal on ghost (unoccupied lattice) DOF rows
                K = K + state["ghost_diag"]
            return residue, K

        # fallback (e.g. externally re-sharded/padded states): build maps
        # from the traced layout and embed as constants
        maps = _maps_cache.get(cache_key)
        if maps is None:
            r_map = (build_gather_reduce(np.concatenate(r_rows), bfs)
                     if r_rows else None)
            k_map = (build_gather_reduce(np.concatenate(k_slots),
                                         pattern.n_storage)
                     if k_slots else None)
            maps = _maps_cache[cache_key] = (r_map, k_map)
        r_map, k_map = maps

        residue = (r_map(jnp.concatenate([v.reshape(-1) for v in r_vals]))
                   if r_map is not None else jnp.zeros(bfs, dtype))
        K = (k_map(jnp.concatenate([v.reshape(-1) for v in k_vals]))
             if k_map is not None else jnp.zeros(pattern.n_storage, dtype))
        if phase == "lin" and state.get("ghost_diag") is not None:
            K = K + state["ghost_diag"]
        return residue, K

    def k_linear(state):
        """K_linear: x-independent gradient blocks, once per step."""
        _, K = _run(state, "lin")
        return K

    def res_k_nonlinear(state):
        """(residue, K_total = K_linear + nonlinear blocks), per Newton
        iteration."""
        residue, K = _run(state, "nl")
        return residue, state["K_linear"] + K

    return k_linear, res_k_nonlinear, _run
