"""FEM_Domain: the user-facing problem object.

The analog of the reference's ``FEM_Domain`` / ``WorkPiece`` / ``Physics``
(solver/01_Types.jl) and the top-level API narrative
(docs pikachu example): declare variables, add workpieces/boundaries,
assign weak forms, mesh, compile, then step.  Unlike the reference, all
registries (variable attributes, definitions) are owned by the domain —
no module globals (the reference's shared VARIABLE_ATTRIBUTES breaks
multi-domain use, symbolics/01_Types.jl:1).

Typical flow (mirrors docs/src/examples/src/pikachu/pikachu.jl:8-117):

    dom = FEM_Domain(dim=2)
    T = dom.internal_var("T")
    s = dom.external_var("s", "CONTROLPOINT_VAR")
    i = mf.index("i")
    wp = dom.add_workpiece(geo_mesh)
    bg = dom.add_boundary(wp, facet_ids)
    dom.assign_workpiece_weakform(wp, -k * Bilinear(T.d(i), T.d(i)) + ...)
    dom.assign_boundary_weakform(wp, bg, ...)
    dom.initialize_local_assembly()
    dom.mesh_classical(itp_order=2, itg_order=5)
    dom.compile()
    dom.update_one_step()
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..elements.discretization import (ClassicalDiscretization,
                                       initialize_classical_element)
from ..mesh.fem_mesh import WPMesh, build_wp_mesh
from ..mesh.ref_geometry import GeoMesh
from ..symbolics.api import Expr, SymRef, as_term
from ..symbolics.ir import GroundTerm
from ..symbolics.registry import (EXTERNAL_VAR, INTERNAL_VAR,
                                  VariableRegistry)
from ..symbolics.tensor_table import TensorTable
from ..symbolics.weakform import BilinearForm, build_weakform
from .. import linsolve
from ..linsolve import SparseMatrix, iterative_solve
from ..linsolve.block_offset import OffsetMatrix
from .assembly import CompiledWP, make_updaters
from .geometry import update_element_geometry, update_facet_geometry
from .global_assembly import (GlobalPattern, assemble_x, build_global_pattern,
                              dessemble_x)
from .local_assembly import LocalAssembly, initialize_local_assembly
from .time_domain import (GeneralAlpha, initialize_dx, normalized_norm,
                          update_dx, x_star_of)

_COORD_NAMES = ("x", "y", "z")


def _maps_entry(host: dict) -> dict:
    """Device maps entry from the host (GatherReduce, touched) pairs kept
    by _build_phase_maps — touched != None marks a compact reduction."""
    from .scatter import maps_to_device
    entry = {}
    if host.get("r"):
        gr, touched = host["r"]
        entry["r"] = maps_to_device(gr)
        if touched is not None:
            entry["r_touched"] = jnp.asarray(touched.astype(np.int32))
    if host.get("k"):
        gr, touched = host["k"]
        entry["k"] = maps_to_device(gr)
        if touched is not None:
            entry["k_touched"] = jnp.asarray(touched.astype(np.int32))
    return entry


@dataclasses.dataclass
class WorkPiece:
    geo: GeoMesh
    boundary_facets: Dict[int, np.ndarray] = dataclasses.field(
        default_factory=dict)
    domain_forms: List[BilinearForm] = dataclasses.field(default_factory=list)
    boundary_forms: Dict[int, List[BilinearForm]] = dataclasses.field(
        default_factory=dict)
    extra_vars: List[str] = dataclasses.field(default_factory=list)
    local_assembly: Optional[LocalAssembly] = None
    disc: Optional[ClassicalDiscretization] = None
    mesh: Optional[WPMesh] = None
    #: boundary group id -> [(eindex, facet positions within group)]
    bdy_parts: Dict[int, List[Tuple[int, np.ndarray]]] = dataclasses.field(
        default_factory=dict)


class FEM_Domain:
    def __init__(self, dim: int, dtype=None):
        """``dtype``: working precision of the device hot path (geometry
        tables, assembly, Krylov).  Defaults to the process-wide
        config.fdtype() (f64).  On TPU f64 is software-emulated
        (misc/02_Global_Macros.jl:124 pins f64 in the reference); pass
        jnp.float32 for the hardware-rate path and set converge_tol
        accordingly (~1e-5 of the initial residual is reachable with the
        default right-Jacobi scaling)."""
        from ..config import fdtype
        self.dim = dim
        self.dtype = dtype or fdtype()
        self.registry = VariableRegistry()
        self.tensor_table = TensorTable(dim, self.registry)
        self.workpieces: List[WorkPiece] = []
        self.global_vars: Dict[str, float] = {}
        self.functions: Dict[str, Callable] = {}
        #: arbitrary user pytree (e.g. plasticity history per quad point),
        #: passed to registered callbacks declaring a ``user`` parameter
        self.user_state: dict = {}
        self.time_discretization = GeneralAlpha()
        self.converge_tol: float = 1e-6
        self.t: float = 0.0
        self.dt: float = 1.0
        self.linear_solver: Optional[Callable] = None  # (A, b) -> x
        # runtime
        self.pattern: Optional[GlobalPattern] = None
        self.x: Optional[jnp.ndarray] = None           # [L+1, bfs]
        self.dx: Optional[jnp.ndarray] = None
        self.state: Optional[dict] = None
        self._k_linear = None
        self._res_k = None
        self._compiled_wps: List[CompiledWP] = []

    # ------------------------------------------------------------------
    # variable declaration (the @Sym / @External_Sym / @Def analogs)
    # ------------------------------------------------------------------
    def internal_var(self, name: str, *extra_attrs: str) -> SymRef:
        self.registry.declare(name, INTERNAL_VAR, *extra_attrs)
        return SymRef(name, self.registry)

    def external_var(self, name: str, *attrs: str) -> SymRef:
        self.registry.declare(name, EXTERNAL_VAR, *attrs)
        return SymRef(name, self.registry)

    def sym(self, name: str) -> SymRef:
        return SymRef(name, self.registry)

    def define(self, name: str, free_ids: Sequence[str], expr) -> SymRef:
        """The @Def analog: record a named definition (possibly tensorial
        with the given free indices).  For a declared integration-point
        variable the RHS is a user function returning all components at
        once, so the free-index check is skipped."""
        from ..symbolics.registry import INTEGRATION_POINT_VAR
        if INTEGRATION_POINT_VAR in self.registry.attributes(name):
            self.tensor_table.define_raw(name, list(free_ids), as_term(expr))
        else:
            self.tensor_table.define(name, list(free_ids), as_term(expr))
        return SymRef(name, self.registry)

    def register_function(self, name: str, fn: Callable) -> None:
        """User callbacks referenced by name in weak forms (the analog of
        Main.$op dispatch, symbolics/08_Tensor.jl:210)."""
        self.functions[name] = fn

    # ------------------------------------------------------------------
    # geometry / physics wiring
    # ------------------------------------------------------------------
    def add_workpiece(self, geo: GeoMesh) -> int:
        if geo.dim != self.dim:
            raise ValueError("workpiece dimension mismatch")
        self.workpieces.append(WorkPiece(geo=geo))
        return len(self.workpieces) - 1

    def add_boundary(self, wp_id: int, facet_ids) -> int:
        wp = self.workpieces[wp_id]
        bg_id = len(wp.boundary_facets)
        wp.boundary_facets[bg_id] = np.asarray(facet_ids, dtype=np.int64)
        return bg_id

    def assign_workpiece_weakform(self, wp_id: int, expr) -> None:
        term = as_term(expr if not isinstance(expr, Expr) else expr)
        self.workpieces[wp_id].domain_forms = build_weakform(
            self.tensor_table, term)

    def assign_boundary_weakform(self, wp_id: int, bg_id: int, expr) -> None:
        term = as_term(expr)
        self.workpieces[wp_id].boundary_forms[bg_id] = build_weakform(
            self.tensor_table, term)

    # ------------------------------------------------------------------
    # compilation pipeline
    # ------------------------------------------------------------------
    def initialize_local_assembly(self,
                                  explicit_max_sd_order: int = 9) -> None:
        for wp in self.workpieces:
            wp.local_assembly = initialize_local_assembly(
                self.tensor_table, wp.domain_forms, wp.boundary_forms,
                extra_vars=wp.extra_vars,
                explicit_max_sd_order=explicit_max_sd_order)

    def mesh_classical(self, wp_ids: Optional[Sequence[int]] = None,
                       itp_order: int = 1, itg_order: int = 2,
                       itp_type: str = "Lagrange",
                       lattice_pad: int = 1) -> None:
        """Build element tables + runtime mesh (mesh_Classical,
        unstructured_mesh/2_Interface.jl:7-39).

        ``lattice_pad``: round the leading lattice axis up to a multiple
        (extra ghost planes) so the DOF vector / K storage split evenly
        over an N-device mesh — pass the device count when the domain
        will be row-sharded (parallel/rowshard.py)."""
        ids = range(len(self.workpieces)) if wp_ids is None else wp_ids
        for wp_id in ids:
            wp = self.workpieces[wp_id]
            if wp.local_assembly is None:
                raise RuntimeError("call initialize_local_assembly first")
            wp.disc = initialize_classical_element(
                self.dim, wp.geo.shape, itp_order,
                wp.local_assembly.max_sd_order, itg_order, itp_type)
            wp.mesh = build_wp_mesh(wp.geo, wp.disc, wp.boundary_facets,
                                    lattice_pad=lattice_pad)
            # coordinate columns (built-in controlpoint vars x, y, z)
            for d in range(self.dim):
                wp.mesh.fields[_COORD_NAMES[d]] = wp.mesh.cp_coords[:, d]
            # DOF columns + external controlpoint columns, zero-initialized
            for (local_sym, _, _) in wp.local_assembly.local_innervar_infos:
                wp.mesh.field(local_sym)
            for name in wp.local_assembly.controlpoint_extervars:
                wp.mesh.field(name)
            # group each boundary's facets by local face index
            wp.bdy_parts = {}
            for bg_id, grp_f in wp.boundary_facets.items():
                els = wp.geo.facet_elements[grp_f, 0]
                eis = wp.geo.facet_eindex[grp_f, 0]
                parts = []
                for ei in np.unique(eis):
                    parts.append((int(ei), els[eis == ei].astype(np.int64)))
                wp.bdy_parts[bg_id] = parts

    def assemble_global_variables(self, **layout_opts) -> None:
        """``layout_opts`` forward to block_offset.build_offset_layout
        (e.g. blk_b / blk_min_tail for the BSR tail of unstructured
        meshes)."""
        meshes = [wp.mesh for wp in self.workpieces]
        assemblies = [wp.local_assembly for wp in self.workpieces]
        self.pattern = build_global_pattern(meshes, assemblies,
                                            **layout_opts)
        self.x = jnp.asarray(assemble_x(meshes, assemblies, self.pattern),
                             dtype=self.dtype)
        self.dx = jnp.zeros_like(self.x)

    def compile(self) -> None:
        """Build + jit the two updaters (compile_Updater_GPU analog)."""
        if self.pattern is None:
            self.assemble_global_variables()
        self._compiled_wps = [
            CompiledWP(disc=wp.disc, la=wp.local_assembly,
                       info=self.pattern.wp_infos[i],
                       bdy_parts=wp.bdy_parts,
                       el_cp=wp.mesh.el_cp.astype(np.int64))
            for i, wp in enumerate(self.workpieces)]
        self._fast_maps = {}
        k_linear, res_k, run_phase = make_updaters(
            self.tensor_table, self._compiled_wps, self.pattern,
            self.functions, fast_maps=self._fast_maps)
        self._k_linear = jax.jit(k_linear)
        self._res_k = jax.jit(res_k)
        self._run_phase = run_phase
        # reduction maps, built once on the host: volume streams on
        # lattice meshes reduce via dense interleaved adds (the fast
        # path, lattice_reduce.py — the generic gather of the linear
        # tangent measured 1.5 s at 1.28M DOF vs ~ms dense); the rest
        # (boundary parts, unstructured spill) through gather maps
        # passed in the state pytree as device arrays
        from .lattice_reduce import fit_stream_columns

        # lattice node-gather fast path: el_cp columns as strided slices
        self._fast_maps["gather"] = {}
        for w_i, wp in enumerate(self.workpieces):
            mesh = wp.mesh
            if mesh.lattice_shape is None:
                continue
            n_cp = mesh.n_cp

            def in_block(slot, n_cp=n_cp):
                return 0 if 0 <= slot < n_cp else None

            fs_list, rest_cols = fit_stream_columns(
                mesh.el_cp.astype(np.int64), mesh.lattice_shape, in_block)
            if fs_list and rest_cols.size == 0:   # node reads need ALL
                self._fast_maps["gather"][w_i] = fs_list

        self._device_maps = {}
        for phase_key in ("lin", "nl"):
            self._build_phase_maps(phase_key)
        self._ghost_diag = self._ghost_diag_vector()
        # occupancy mask for the multigrid preconditioner (single lattice
        # workpiece with ghost slots; linsolve/multigrid.mask_for_domain)
        self._mg_mask = None
        if len(self.workpieces) == 1:
            occ = self.workpieces[0].mesh.is_occupied
            if occ is not None and not occ.all():
                self._mg_mask = jnp.asarray(occ.astype(np.float64),
                                            dtype=self.dtype)
        self.update_mesh()
        if self.linear_solver is None:
            self.linear_solver = self.make_iterative_solver()

    def _build_phase_maps(self, phase_key: str) -> None:
        """Build the host-side reduction maps for one assembly phase
        (see assembly._phase_parts for the phase vocabulary): lattice
        fast-interleave streams where the slot columns are affine in the
        lattice index, gather maps for the rest (host arrays here;
        uploaded on demand by _ensure_device_maps).  Idempotent; called
        for 'lin'/'nl' at compile() and lazily for the refined-residual
        phases (freeze_refined_residual)."""
        if phase_key in getattr(self, "_host_maps", {}):
            return
        from .assembly import collect_phase_streams
        from .lattice_reduce import fit_stream_columns
        from .scatter import (build_compact_gather_reduce,
                              build_gather_reduce, maps_to_device)

        seg_bases = np.asarray(
            [s[4] for s in self.pattern.offset_layout.segments])
        seg_ncp = np.asarray(
            [s[2] for s in self.pattern.offset_layout.segments])
        order = np.argsort(seg_bases)
        seg_bases, seg_ncp = seg_bases[order], seg_ncp[order]

        def k_block_of(slot):
            j = np.searchsorted(seg_bases, slot, side="right") - 1
            if j < 0 or slot >= seg_bases[j] + seg_ncp[j]:
                return None
            return int(seg_bases[j])

        streams = collect_phase_streams(
            self._compiled_wps, self.pattern, phase_key)
        fast = {"r": {}, "k": {}}
        rest = {"r": [], "k": []}
        counters = {"r": 0, "k": 0}
        for s in streams:
            kind = s["kind"]
            si = counters[kind]
            counters[kind] += 1
            fs_list, rest_cols = None, None
            mesh = self.workpieces[s["wp"]].mesh
            if s["volume"] and mesh.lattice_shape is not None:
                if kind == "k":
                    block_of = k_block_of
                else:
                    info = self.pattern.wp_infos[s["wp"]]

                    def block_of(slot, info=info):
                        rel = slot - info.dof_offset
                        if rel < 0 or rel >= info.n_vars * info.n_cp:
                            return None
                        return (info.dof_offset
                                + (rel // info.n_cp) * info.n_cp)
                slots2 = s["slots"].reshape(s["slots"].shape[0], -1)
                fs_list, rest_cols = fit_stream_columns(
                    slots2, mesh.lattice_shape, block_of)
            if fs_list:
                # per-column split: fitting columns reduce dense,
                # the rest (e.g. COO-spilled offsets) via gather
                fast[kind][si] = (fs_list, rest_cols)
                if rest_cols.size:
                    rest[kind].append(
                        slots2[:, rest_cols].reshape(-1))
            else:
                rest[kind].append(s["slots"].reshape(-1))
        self._fast_maps[phase_key] = fast

        host = {}
        if rest["r"]:
            host["r"] = build_compact_gather_reduce(
                np.concatenate(rest["r"]), self.pattern.basicfield_size)
        if rest["k"]:
            host["k"] = build_compact_gather_reduce(
                np.concatenate(rest["k"]), self.pattern.n_storage)
        if not hasattr(self, "_host_maps"):
            self._host_maps = {}
        self._host_maps[phase_key] = host

    def _ensure_device_maps(self, *phases) -> None:
        """Upload the host reduction maps of the given phases to the
        compute device (idempotent).  Uploads are deferred to the entry
        points that actually assemble on device: setup-only flows (the
        host-side freezes) and unstructured-mesh production steps (whose
        refined path never assembles volumes on device) then never ship
        the multi-GB volume gather maps through the transport or hold
        them in HBM."""
        for ph in phases:
            self._build_phase_maps(ph)
            if ph not in self._device_maps:
                self._device_maps[ph] = _maps_entry(self._host_maps[ph])

    def _ghost_diag_vector(self):
        """Unit-diagonal regularizer for ghost (unoccupied lattice) DOF
        rows; None when every control point is occupied."""
        lo = self.pattern.offset_layout
        vec = np.zeros(self.pattern.n_storage, dtype=np.float64)
        any_ghost = False
        for wp, info in zip(self.workpieces, self.pattern.wp_infos):
            occ = wp.mesh.is_occupied
            if occ is None or occ.all():
                continue
            any_ghost = True
            ghost_cp = np.nonzero(~occ)[0]
            for pos in range(info.n_vars):
                rows = info.dof_offset + pos * info.n_cp + ghost_cp
                vec[lo.diag_storage[rows]] = 1.0
        if not any_ghost:
            return None
        return jnp.asarray(vec, dtype=self.dtype)

    def make_iterative_solver(self, sv_func=None, precond=None,
                              **kwargs) -> Callable:
        """``precond=None``: the reference's iterative_Solve! behavior
        (right-Jacobi scaled Krylov, 02_Preconditioner.jl:30-78).
        ``precond='auxmg'``: auxiliary-space multigrid (auxmg.py) — call
        ``setup_auxmg()`` first; the frozen aux hierarchy is combined
        with each fresh tangent's values and diagonal."""
        sv_func = sv_func or linsolve.krylov.bicgstab
        kwargs.setdefault("maxiter", 2000)
        kwargs.setdefault("max_pass", 10)

        if precond == "auxmg":
            from ..linsolve import auxmg

            def solve(A, b):
                if getattr(self, "_auxmg", None) is None:
                    raise RuntimeError("call domain.setup_auxmg() first")
                tree, (desc, hier) = self._auxmg
                tree = auxmg.refresh_tangent(A, tree, desc)
                op = auxmg.AuxMGOperator(A, tree, hier, desc)
                y = iterative_solve(op, b, None,
                                    converge_tol=self.converge_tol,
                                    sv_func=sv_func, use_pr_jacobi=False,
                                    **kwargs)
                return op.apply_m(y)
            return solve
        if precond is not None:
            raise ValueError(f"unknown precond {precond!r}")

        def solve(A, b):
            return iterative_solve(A, b, None,
                                   converge_tol=self.converge_tol,
                                   sv_func=sv_func, **kwargs)
        return solve

    def make_direct_solver(self) -> Callable:
        return lambda A, b: linsolve.solver_lu(A, b)

    # ------------------------------------------------------------------
    # runtime state
    # ------------------------------------------------------------------
    def _geometry_state(self, dtype, device=None,
                        volume: bool = True) -> list:
        """Geometry tables per workpiece, computed from the host coords at
        the given dtype (optionally pinned to a device — the refined
        freeze builds f64 tables on the CPU backend so nothing large
        crosses the device transport).  ``volume=False`` skips the
        element tables (boundary-only f64 views for the nonaffine
        remainder)."""
        import contextlib
        ctx = (jax.default_device(device) if device is not None
               else contextlib.nullcontext())
        wp_states = []
        with ctx:
            for i, wp in enumerate(self.workpieces):
                coords = jnp.asarray(wp.mesh.cp_coords, dtype=dtype)
                el_cp = jnp.asarray(wp.mesh.el_cp, dtype=jnp.int32)
                el_state = None
                if volume:
                    itg_vals, itg_w = update_element_geometry(
                        coords, el_cp, wp.disc)
                    # note: NO device pair_slot — the contribution->slot
                    # maps are host-side (gather maps / lattice fast
                    # streams); a [E,na,na] int32 table is ~280 MB of
                    # dead HBM at 1.4M DOF in 3D
                    el_state = {"itg_vals": itg_vals, "weights": itg_w,
                                "el_cp": el_cp}
                bdy_state: Dict[int, list] = {}
                for bg_id, parts in wp.bdy_parts.items():
                    plist = []
                    for (ei, els) in parts:
                        els_j = jnp.asarray(els, dtype=jnp.int32)
                        f_vals, f_w, f_n = update_facet_geometry(
                            coords, el_cp[els_j], wp.disc, ei)
                        plist.append({"itg_vals": f_vals, "weights": f_w,
                                      "normals": f_n,
                                      "el_cp": el_cp[els_j]})
                    bdy_state[bg_id] = plist
                wp_states.append({"el": el_state, "bdy": bdy_state,
                                  "fields": {}})
        return wp_states

    def update_mesh(self) -> None:
        """(Re)compute geometry tables into the runtime state pytree
        (update_Mesh analog)."""
        self.drop_host_caches()
        self.state = {"wp": self._geometry_state(self.dtype)}
        self._volume_tables_freed = False
        self.refresh_fields()

    def refresh_fields(self) -> None:
        """Re-upload the named controlpoint columns (cheap; call after
        mutating mesh fields)."""
        self.drop_host_caches()
        for i, wp in enumerate(self.workpieces):
            self.state["wp"][i]["fields"] = {
                name: jnp.asarray(col, dtype=self.dtype)
                for name, col in wp.mesh.fields.items()}

    def set_field(self, wp_id: int, name: str, values) -> None:
        self.drop_host_caches()
        self.workpieces[wp_id].mesh.set_field(name, values)

    # ------------------------------------------------------------------
    # shared host-f64 freeze caches
    # ------------------------------------------------------------------
    def drop_host_caches(self) -> None:
        """Invalidate the cached host-f64 geometry/field tables and
        linear-tangent components shared by the one-time freezes
        (freeze_linear_tangent / freeze_refined_residual / setup_auxmg).
        Called automatically whenever mesh fields change; call manually
        to reclaim host RAM after the freezes are done."""
        self._host_wp64_cache = None
        self._host_lin_td64_cache = None

    def _host_wp64(self) -> list:
        """f64 geometry + field tables built on the CPU backend, CACHED:
        every one-time host freeze (freeze_linear_tangent on_host,
        freeze_refined_residual, setup_auxmg's _host_tangent) consumes
        the same tables, and at 1M+ DOF rebuilding them per freeze is
        minutes on this host's single vCPU.  Invalidated by
        refresh_fields / set_field / dessemble_x / update_mesh."""
        cached = getattr(self, "_host_wp64_cache", None)
        if cached is not None:
            return cached
        cpu = jax.devices("cpu")[0]
        st_wp = self._geometry_state(jnp.float64, device=cpu)
        with jax.default_device(cpu):
            for i, wp in enumerate(self.workpieces):
                st_wp[i]["fields"] = {
                    name: jnp.asarray(np.asarray(col), dtype=jnp.float64)
                    for name, col in wp.mesh.fields.items()}
        self._host_wp64_cache = st_wp
        return st_wp

    def _host_lin_td64(self) -> list:
        """Per-time-level f64 linear-gradient components (one-hot
        K_params 'lin' assemblies) on the host, CACHED as np arrays.
        Each entry still includes the ghost regularizer when present
        (the 'lin' phase adds it once per run); consumers subtract it
        per their own combine convention.  Shared by
        freeze_linear_tangent, _host_tangent and (for fully affine
        problems, where aff_lin == lin) freeze_refined_residual —
        previously each re-assembled the identical operator."""
        cached = getattr(self, "_host_lin_td64_cache", None)
        if cached is not None:
            return cached
        self._build_phase_maps("lin")
        L = self.pattern.max_time_level
        cpu = jax.devices("cpu")[0]
        run = jax.jit(self._run_phase, static_argnums=1)
        comps = []
        with jax.default_device(cpu):
            st = self._host_phase_state(jnp.float64)
            for td in range(L + 1):
                one_hot = np.zeros(L + 1)
                one_hot[td] = 1.0
                st["K_params"] = jnp.asarray(one_hot, jnp.float64)
                comps.append(np.asarray(run(st, "lin")[1]))
        self._host_lin_td64_cache = comps
        return comps

    def _all_forms_affine(self) -> bool:
        """True when every LINEAR gradient comes from an affine form —
        then the 'lin' phase and the refined path's 'aff_lin' phase
        assemble the same operator and the host f64 components can be
        shared.  (Nonaffine forms may exist — e.g. a T^4 radiation
        boundary — as long as all their gradients are nonlinear, which
        is the typical case: an affine form cannot have a nonlinear
        gradient, and a nonaffine form's linear gradients are the only
        way the two phases diverge.)"""
        for wp in self.workpieces:
            la = wp.local_assembly
            wfs = ([la.assembled_weakform]
                   + list(la.assembled_boundary_weakform_pairs.values()))
            for wf in wfs:
                aff = wf.affine_form_ids()
                if any(g.form_id not in aff for g in wf.linear_gradients):
                    return False
        return True

    def _host_phase_state(self, dtype=jnp.float64) -> dict:
        """Runtime-state pytree rebuilt from HOST sources on the CPU
        backend, for one-time setup assemblies (freezes).  Callers must
        run the phases INSIDE a ``jax.default_device(cpu)`` scope (see
        freeze_refined_residual's note on uncommitted arrays)."""
        cpu = jax.devices("cpu")[0]
        ga = self.time_discretization
        if dtype == jnp.float64:
            st_wp = self._host_wp64()       # cached across the freezes
        else:
            st_wp = self._geometry_state(dtype, device=cpu)
            with jax.default_device(cpu):
                for i, wp in enumerate(self.workpieces):
                    st_wp[i]["fields"] = {
                        name: jnp.asarray(np.asarray(col), dtype)
                        for name, col in wp.mesh.fields.items()}
        with jax.default_device(cpu):
            ghost = getattr(self, "_ghost_diag", None)
            return {
                "wp": st_wp,
                "maps": {ph: _maps_entry(self._host_maps[ph])
                         for ph in self._host_maps},
                "ghost_diag": (jnp.asarray(np.asarray(ghost), dtype)
                               if ghost is not None else None),
                "x_star": jnp.asarray(np.asarray(self.x), dtype),
                "t": jnp.asarray(self.t, dtype),
                "dt": jnp.asarray(self.dt or 1.0, dtype),
                "K_params": jnp.asarray(np.asarray(ga.K_params), dtype),
                "global_vars": {k: float(v)
                                for k, v in self.global_vars.items()},
                "user": jax.device_put(jax.tree_util.tree_map(
                    jnp.asarray, self.user_state), cpu)}

    def _host_tangent(self) -> np.ndarray:
        """Assemble the tangent at the current x ON THE HOST in f64
        (K_linear + nonlinear blocks): one-time setup cost that never
        ships the volume gather maps to the device — at 1M+ DOF on an
        unstructured mesh those are multi-GB."""
        for ph in ("lin", "nl"):
            self._build_phase_maps(ph)
        cpu = jax.devices("cpu")[0]
        run = jax.jit(self._run_phase, static_argnums=1)
        # linear part from the shared per-td cache (each component
        # carries the ghost regularizer once; combine adds it once, as
        # the device path does)
        comps = self._host_lin_td64()
        Kp = np.asarray(self.time_discretization.K_params, np.float64)
        ghost = getattr(self, "_ghost_diag", None)
        g64 = (np.asarray(ghost, np.float64) if ghost is not None
               else 0.0)
        K_lin = sum(Kp[td] * (c - g64) for td, c in enumerate(comps))
        K_lin = K_lin + g64
        with jax.default_device(cpu):
            st = self._host_phase_state(jnp.float64)
            _, K_nl = run(st, "nl")
            return np.asarray(K_lin) + np.asarray(K_nl)

    def freeze_linear_tangent(self, on_host: bool = None) -> None:
        """Precompute the per-time-level linear tangent components
        G_td (x-independent), so jitted steps built with
        ``static_k_linear=True`` combine them as sum(K_params[td]*G_td)
        instead of re-assembling K_linear every step (~160 ms at 1M DOF).

        Valid while geometry, controlpoint fields, and global material
        constants stay fixed (the linear coefficients may not reference
        t/dt).  Call again after changing any of those.

        ``on_host``: assemble the components on the CPU backend instead
        of the compute device (default: auto — on for unstructured
        meshes, whose volume gather maps are too large to ship)."""
        L = self.pattern.max_time_level
        if on_host is None:
            on_host = any(wp.mesh.lattice_shape is None
                          for wp in self.workpieces)
        ghost = getattr(self, "_ghost_diag", None)
        comps = []
        if on_host:
            comps = [jnp.asarray(G, self.dtype)
                     for G in self._host_lin_td64()]
            # ghost handling matches the device path: the host 'lin'
            # run adds ghost_diag once per td when present
            if ghost is not None:
                comps = [c - ghost for c in comps]
            self._k_linear_td = jnp.stack(comps)
            return
        self._ensure_device_maps("lin")
        state = self._runtime_state()
        for td in range(L + 1):
            one_hot = np.zeros(L + 1)
            one_hot[td] = 1.0
            st = dict(state)
            st["K_params"] = jnp.asarray(one_hot, dtype=self.dtype)
            G = self._k_linear(st)
            if ghost is not None:
                G = G - ghost     # added once at combine time, not per td
            comps.append(G)
        self._k_linear_td = jnp.stack(comps)

    def freeze_refined_residual(self) -> None:
        """Freeze the exact-residual decomposition used by
        ``make_refined_step``:

            R(x*) = sum_td A_td @ x*[td] + b + R_nonaffine(x*)

        where A_td / b are the affine forms' gradients / residues-at-zero
        (an exact discrete identity — every gradient of an affine form is
        x-independent), assembled ONCE here in f64, and R_nonaffine is
        the (typically boundary-only) remainder re-assembled per
        iteration, also in f64.  This is what lets an f32 hot path reach
        the reference's 1e-6 normalized-residual bar (pikachu.jl:106):
        residuals are exact while tangent solves and MG cycles stay f32.

        Same validity contract as freeze_linear_tangent: geometry,
        controlpoint fields, and global constants frozen; affine
        coefficients may not reference t/dt.  Call again after changing
        any of those.  If a *volume* weak form has nonaffine terms, the
        volume tables are kept in f64 and the per-iteration remainder
        assembly runs over the whole volume (correct, but the fast-path
        benefit is then limited to the affine terms)."""
        for ph in ("aff_lin", "aff_res", "nonaff_nl", "nonaff_res",
                   "nl_grad"):
            self._build_phase_maps(ph)
        # the refined step assembles these phases ON DEVICE: publish
        # their device maps now so a _runtime_state() snapshot taken
        # before make_refined_step (e.g. for shard_domain_state) already
        # carries them — the snapshot dict aliases _device_maps, but a
        # sharded copy does not
        mode_phases = (("nonaff_res", "nl_grad")
                       if self.dtype == jnp.float32 else ("nonaff_nl",))
        self._ensure_device_maps(*(ph for ph in mode_phases
                                   if ph in self._host_maps))

        vol_nonaff = any(
            wp.local_assembly.assembled_weakform.affine_form_ids()
            != {r.form_id
                for r in wp.local_assembly.assembled_weakform.residues}
            for wp in self.workpieces)

        # One-time full-f64 state for the affine freeze.  Everything is
        # (re)built from HOST sources on the CPU backend: XLA:TPU's
        # emulated-f64 assembly materializes (8,128)-padded layout
        # copies (measured 24 GB of temps at 1.28M DOF — OOM), and
        # pulling the existing device tables back through a remote
        # transport is GBs of transfer; host coords -> f64 geometry on
        # CPU avoids both.  Only the A_td / b results ship to device.
        L = self.pattern.max_time_level
        cpu = jax.devices("cpu")[0]

        def fields64(wp, device):
            with jax.default_device(device):
                return {name: jnp.asarray(np.asarray(col),
                                          dtype=jnp.float64)
                        for name, col in wp.mesh.fields.items()}

        # NOTE: the jitted phase runs must happen INSIDE the
        # default_device(cpu) scope — arrays built on the CPU device are
        # uncommitted, and a jit call outside the scope silently moves
        # them to the process default device (the TPU), shipping the f64
        # tables through the remote transport (measured: minutes).
        st_wp = self._host_wp64()           # cached across the freezes
        run64 = jax.jit(self._run_phase, static_argnums=1)
        all_affine = self._all_forms_affine()
        with jax.default_device(cpu):
            cpu_maps = {ph: _maps_entry(self._host_maps[ph])
                        for ph in ("aff_lin", "aff_res")}
            st = {"wp": st_wp, "maps": cpu_maps, "ghost_diag": None,
                  "x_star": jnp.zeros(
                      (L + 1, self.pattern.basicfield_size), jnp.float64),
                  "t": jnp.asarray(self.t, jnp.float64),
                  "dt": jnp.asarray(self.dt, jnp.float64),
                  "global_vars": {k: float(v)
                                  for k, v in self.global_vars.items()},
                  "user": jax.device_put(
                      jax.tree_util.tree_map(jnp.asarray, self.user_state),
                      cpu)}
            if all_affine:
                # aff_lin == lin when every form is affine: share the
                # cached per-td components (they carry the ghost
                # regularizer once; the refined operator excludes it)
                ghost = getattr(self, "_ghost_diag", None)
                g64 = (np.asarray(ghost, np.float64)
                       if ghost is not None else 0.0)
                A_list = [c - g64 for c in self._host_lin_td64()]
            else:
                A_list = []
                for td in range(L + 1):
                    one_hot = np.zeros(L + 1)
                    one_hot[td] = 1.0
                    st["K_params"] = jnp.asarray(one_hot, jnp.float64)
                    A_list.append(np.asarray(run64(st, "aff_lin")[1]))
            st["K_params"] = jnp.asarray(np.ones(L + 1), jnp.float64)
            b64 = np.asarray(run64(st, "aff_res")[0])
        del st

        # table views on the compute device for the per-iteration
        # nonaffine remainder.  Boundary-only nonaffinity: f64 tables
        # (boundary-sized data — cheap even emulated).  Volume
        # nonaffinity (hyperelasticity, convection): two-float pairs of
        # the exact f64 geometry (df_lowering.py) — the df32 step
        # evaluates the nonaffine volume residues in DF arithmetic at
        # native f32 rate, and the f64 step mode reconstructs f64 views
        # from the same pairs (exact: hi + lo).
        dev = self.x.devices().pop() if hasattr(self.x, "devices") else None
        wp_df = None
        if vol_nonaff:
            from .df_lowering import df_tables
            wp_df = df_tables(self._host_wp64(), device=dev)
            wp64 = None
        else:
            wp64 = self._geometry_state(jnp.float64, device=dev,
                                        volume=False)
            for i, wp in enumerate(self.workpieces):
                wp64[i]["el"] = self.state["wp"][i]["el"]
                wp64[i]["fields"] = fields64(wp, dev)

        # DOF slots the nonaffine streams can gather x from (union of
        # the boundary elements' control points over all variables and
        # time levels) — the df32 step materializes the f64 x* only at
        # these slots instead of casting the full vector (emulated-f64
        # casts measured ~tens of ms at 1M DOF)
        if vol_nonaff:
            bnd_dofs = None                   # needs the full vector
        else:
            dofs = []
            for wp, info in zip(self.workpieces, self.pattern.wp_infos):
                cps = [els for parts in wp.bdy_parts.values()
                       for (_, els) in parts]
                if not cps:
                    continue
                cp_set = np.unique(
                    wp.mesh.el_cp[np.concatenate(cps)].reshape(-1))
                for pos in range(info.n_vars):
                    dofs.append(info.dof_offset + pos * info.n_cp
                                + cp_set)
            bnd_dofs = jnp.asarray(
                np.unique(np.concatenate(dofs)).astype(np.int32)
                if dofs else np.zeros(0, np.int32))

        # the frozen operator as two-float pairs (twofloat.py): exact
        # splits of the f64 assembly, consumed at native f32 VPU rate
        from ..linsolve.twofloat import df_from_f64
        A_df = df_from_f64(np.stack(A_list))
        b_df = df_from_f64(b64)
        self._refined = {"A_hi": A_df.hi, "A_lo": A_df.lo,
                         "b_hi": b_df.hi, "b_lo": b_df.lo,
                         "bnd_dofs": bnd_dofs, "wp": wp64,
                         "wp_df": wp_df}

    def setup_mg(self, tune: bool = True, **mg_opts) -> None:
        """Build the geometric-multigrid state ONCE from the tangent at
        the current x and stash it in the runtime state, for jitted
        steps built with ``precond='mg', reuse_mg=True`` — skips the
        per-step probing setup (~160 ms at 1M DOF).  Valid while the
        tangent the V-cycle approximates stays representative (linear
        problems: exact; mild nonlinearity: still an effective
        preconditioner — the Krylov iteration count absorbs the drift).

        ``tune=False`` skips the preconditioned-spectrum estimate and
        the Chebyshev enclosure scan — the expensive part of the setup
        (power iterations + contraction measurements, device solves).
        Use it when the tangent at the current x is NOT the one
        production will step around (e.g. before an initial
        converge-once pass with an adaptive Krylov inner solver, which
        only needs the V-cycle): tune once at the converged state
        instead of paying the scan twice."""
        from ..linsolve import multigrid
        hier = multigrid.hierarchy_for_domain(self, **mg_opts)
        self._mg_hier = hier    # steps must reuse the SAME hierarchy
        ga = self.time_discretization
        ga.update_time(self.dt or 1.0, self.pattern.max_time_level)
        self._ensure_device_maps("lin", "nl")
        state = self._runtime_state()
        state["K_linear"] = self._k_linear(state)
        # keep everything in the DOMAIN dtype: self.x is carried in f64
        # between steps, and letting it promote the tangent here froze
        # an f64 V-cycle state into the f32 production step — emulated
        # f64 on TPU, measured 25x off the V-cycle bandwidth roofline
        state["x_star"] = jnp.asarray(self.x, self.dtype)
        _, K_total = self._res_k(state)
        K_total = K_total.astype(self.dtype)
        A = OffsetMatrix.from_values(K_total, self.pattern.offset_layout)
        mask = multigrid.mask_for_domain(self)
        self._mg_frozen = jax.jit(
            lambda A, m: multigrid.mg_setup(hier, A, m))(A, mask)
        if not tune:
            self._mg_spectrum = None
            self._mg_cheb = None
            return
        # preconditioned-spectrum estimate + tuned Chebyshev enclosure
        # (interval, measured rate) for Chebyshev inner solves
        op = multigrid.MGOperator(A, self._mg_frozen, hier)
        n = self.pattern.basicfield_size
        self._mg_spectrum = multigrid.estimate_spectrum(op, n, self.dtype)
        self._mg_cheb = multigrid.tune_chebyshev(
            op, n, self.dtype, self._mg_spectrum)

    def setup_auxmg(self, **opts) -> None:
        """Freeze the auxiliary-space multigrid preconditioner (for
        UNSTRUCTURED meshes — the counterpart of setup_mg) from the
        tangent at the current x.  Consumed by
        ``make_iterative_solver(precond='auxmg')``; valid while that
        tangent stays representative (linear problems: exact)."""
        from ..linsolve import auxmg
        ga = self.time_discretization
        ga.update_time(self.dt or 1.0, self.pattern.max_time_level)
        # tangent assembled on the HOST (f64): the aux Galerkin build
        # consumes it on the host anyway, and this keeps the unstructured
        # volume gather maps (GBs at 1M+ DOF) off the device entirely
        self._auxmg = auxmg.setup(self, self._host_tangent(), **opts)

    def _coo_dev(self):
        """Device copies of the block-offset COO-tail index arrays
        (None, None) for lattice meshes (empty tail).  Shipped through
        the traced state: baking them into jitted programs as constants
        is hundreds of MB of HLO at 1M+ DOF unstructured — the remote
        compile transport rejects the program (HTTP 413)."""
        lo = self.pattern.offset_layout
        if not lo.n_coo:
            return None, None
        cached = getattr(self, "_coo_dev_cache", None)
        if cached is None:
            cached = (jnp.asarray(lo.coo_rows), jnp.asarray(lo.coo_cols))
            self._coo_dev_cache = cached
        return cached

    # ------------------------------------------------------------------
    # freeze persistence (the one-time setup wall is host-bound minutes
    # at 1M+ DOF; repeated runs of the same problem reload instead)
    # ------------------------------------------------------------------
    _FREEZE_ATTRS = ("_k_linear_td", "_refined", "_auxmg", "_auxmg_cheb",
                     "_auxmg_spectrum", "_mg_frozen", "_mg_hier",
                     "_mg_cheb", "_mg_spectrum")

    def save_freezes(self, path: str) -> None:
        """Persist the production freezes (linear tangent components,
        refined f64 operator, MG / aux-MG state + tuned spectra) as a
        pickle of host arrays.  The validity contract is the caller's:
        reload only for the SAME mesh, weak forms, fields, and global
        constants the freezes were computed for."""
        import pickle

        def to_np(t):
            return jax.tree_util.tree_map(
                lambda v: np.asarray(v) if isinstance(v, jax.Array)
                else v, t)

        blob = {}
        for name in self._FREEZE_ATTRS:
            val = getattr(self, name, None)
            if val is None:
                continue
            # boundary-only nonaffinity attaches the runtime state's
            # volume element tables to _refined["wp"] by reference
            # (freeze_refined_residual) — 2+ GB at 1M-DOF 3D that the
            # pickle would DUPLICATE on reload (the state keeps its own
            # copy).  Swap in a sentinel BEFORE to_np so the tables are
            # never transferred device→host at all; load_freezes
            # re-attaches the live state tables.
            if name == "_refined" and val.get("wp") is not None:
                val = dict(val)
                val["wp"] = [
                    {**w, "el": "__state_el__"}
                    if w.get("el") is not None else dict(w)
                    for w in val["wp"]]
                # the f64 field columns are exact casts of the live mesh
                # fields (same validity contract) — store a sentinel and
                # rebuild on load instead of ~10 MB/field of pickle
                for w in val["wp"]:
                    if isinstance(w.get("fields"), dict):
                        w["fields"] = "__mesh_fields64__"
            blob[name] = to_np(val)
        # layout fingerprint: frozen arrays are meaningless under a
        # different storage layout (e.g. after the Morton renumbering or
        # a BSR-tail change) — reject instead of silently corrupting.
        # The trailing version marks the BSR tail's component-major
        # storage order (block-major caches predate it); lattice layouts
        # (blk_b=0) keep the unversioned 4-tuple so their caches stay
        # valid across the change.
        blob["_layout_fp"] = self._layout_fp()
        with open(path, "wb") as f:
            pickle.dump(blob, f, protocol=4)

    def _layout_fp(self) -> tuple:
        lo = self.pattern.offset_layout
        fp = (self.pattern.basicfield_size, lo.n_storage, lo.n_dense,
              lo.blk_b)
        if lo.blk_b:
            fp += ("tail-cm2",)
        return fp

    def load_freezes(self, path: str) -> None:
        """Counterpart of save_freezes: restore the frozen state onto
        the current compute device."""
        import pickle
        with open(path, "rb") as f:
            blob = pickle.load(f)
        fp = self._layout_fp()
        saved_fp = blob.pop("_layout_fp", None)
        if saved_fp is not None and tuple(saved_fp) != fp:
            raise ValueError(
                f"load_freezes: stale cache {path} — saved layout "
                f"{tuple(saved_fp)} != current {fp}; recompute freezes")

        def to_dev(t):
            return jax.tree_util.tree_map(
                lambda v: jnp.asarray(v) if isinstance(v, np.ndarray)
                else v, t)

        for name, val in blob.items():
            attach = []
            refields = []
            if name == "_refined" and isinstance(val, dict) \
                    and val.get("wp") is not None:
                # re-attach the live state's volume tables where
                # save_freezes left its alias sentinel — and ALSO where a
                # legacy pickle (pre-sentinel code, same layout
                # fingerprint) carries a full copy of the tables: loading
                # that copy would silently re-introduce the 2+ GB HBM
                # duplication the sentinel exists to eliminate.  Dropping
                # it is safe: the tables were aliases of the state's own
                # at save time.  Strip BEFORE to_dev so a legacy copy is
                # never shipped to the device.
                val = dict(val)
                attach = [i for i, w in enumerate(val["wp"])
                          if w.get("el") is not None]
                refields = [i for i, w in enumerate(val["wp"])
                            if w.get("fields") == "__mesh_fields64__"]
                val["wp"] = [
                    {**w, "el": None} if w.get("el") is not None else
                    dict(w) for w in val["wp"]]
                for i in refields:
                    val["wp"][i]["fields"] = None
            val = to_dev(val)
            for i in attach:
                val["wp"][i]["el"] = self.state["wp"][i]["el"]
            for i in refields:
                val["wp"][i]["fields"] = {
                    fname: jnp.asarray(np.asarray(col), jnp.float64)
                    for fname, col in
                    self.workpieces[i].mesh.fields.items()}
            setattr(self, name, val)

    def free_volume_tables(self) -> None:
        """Release the device-resident volume element tables
        (``state['wp'][i]['el']['itg_vals'/'weights']`` — GBs at 1M-DOF
        3D) for production refined stepping of physics whose volume
        forms are all affine: the refined step consumes the host-frozen
        A_td/b operator plus BOUNDARY-only nonaffine phases, so the
        volume tables are dead HBM (the assembly skips phases with no
        matching forms before touching any table, assembly.py do_wf).
        Call after ``freeze_refined_residual()``; ``update_mesh()``
        rebuilds the tables if volume assembly is needed again."""
        ref = getattr(self, "_refined", None)
        if ref is None:
            raise RuntimeError("call freeze_refined_residual() first")
        if ref.get("wp_df") is not None:
            raise RuntimeError(
                "free_volume_tables: volume-nonaffine physics evaluates "
                "volume residues per iteration — the tables are live")
        for i, wps in enumerate(self.state["wp"]):
            if wps.get("el") is not None:
                wps["el"] = {**wps["el"], "itg_vals": None, "weights": None}
            if ref.get("wp") is not None and ref["wp"][i].get("el") \
                    is not None:
                ref["wp"][i] = {**ref["wp"][i],
                                "el": self.state["wp"][i]["el"]}
        self._volume_tables_freed = True

    def _require_volume_tables(self, what: str) -> None:
        """Fail fast (instead of a TypeError deep inside assembly) when a
        path that assembles volume integrals runs after
        free_volume_tables() released the element tables."""
        if getattr(self, "_volume_tables_freed", False):
            raise RuntimeError(
                f"{what} assembles volume integrals, but the volume "
                "element tables were released by free_volume_tables(); "
                "call update_mesh() to rebuild them (or keep to the "
                "refined step, which does not need them)")

    def _runtime_state(self) -> dict:
        ga = self.time_discretization
        coo_rows, coo_cols = self._coo_dev()
        return {**self.state,
                "coo_rows": coo_rows, "coo_cols": coo_cols,
                "ghost_diag": getattr(self, "_ghost_diag", None),
                "mg_mask": getattr(self, "_mg_mask", None),
                "mg_frozen": getattr(self, "_mg_frozen", None),
                "auxmg_tree": (self._auxmg[0]
                               if getattr(self, "_auxmg", None) is not None
                               else None),
                "K_linear_td": getattr(self, "_k_linear_td", None),
                "refined": getattr(self, "_refined", None),
                "maps": getattr(self, "_device_maps", {}),
                "x_star": self.x,
                "K_linear": jnp.zeros(self.pattern.n_storage, self.dtype),
                "t": self.t, "dt": self.dt,
                "K_params": jnp.asarray(ga.K_params, dtype=self.dtype),
                # traced scalars: changeable between steps w/o recompile
                "global_vars": {k: float(v)
                                for k, v in self.global_vars.items()},
                "user": jax.tree_util.tree_map(jnp.asarray,
                                               self.user_state)}

    # ------------------------------------------------------------------
    # the hot loop (update_OneStep!, solver/04_Time_Domain.jl:59-80)
    # ------------------------------------------------------------------
    def update_one_step(self, max_iter: int = 4,
                        verbose: bool = False) -> float:
        ga = self.time_discretization
        L = self.pattern.max_time_level
        self._require_volume_tables("update_one_step")
        self.t += self.dt
        ga.update_time(self.dt, L)
        self._ensure_device_maps("lin", "nl")
        state = self._runtime_state()
        dx = initialize_dx(self.x, self.dt, ga.gamma_params)
        K_linear = self._k_linear(state)
        state["K_linear"] = K_linear
        res = np.inf
        for counter in range(max_iter + 1):
            state["x_star"] = x_star_of(self.x, dx, ga.alpha_params)
            residue, K_total = self._res_k(state)
            res = normalized_norm(residue)
            if verbose:
                print(f"step iteration {counter}: residue = {res:.6e}")
            if res < self.converge_tol or counter >= max_iter:
                break
            A = OffsetMatrix.from_values(K_total,
                                         self.pattern.offset_layout)
            delta_x = self.linear_solver(A, residue)
            dx = update_dx(dx, -delta_x, ga.beta_params)
        self.x = self.x + dx
        self.dx = dx
        return res

    def make_jitted_step(self, **kwargs):
        """Fully-jitted step (Newton + Krylov in one device dispatch, see
        jit_step.py).  Usage:

            step = dom.make_jitted_step(sv_func=krylov.bicgstab)
            state = dom._runtime_state()
            x, dx, res, iters = step(state, dom.x, t, dt)
        """
        self._require_volume_tables("make_jitted_step")
        from .jit_step import make_jitted_step
        return make_jitted_step(self, **kwargs)

    def make_refined_step(self, **kwargs):
        """Exact-f64-residual Newton step at f32 solve cost (see
        jit_step.make_refined_step).  Call freeze_linear_tangent(),
        freeze_refined_residual() and setup_mg() first."""
        from .jit_step import make_refined_step
        return make_refined_step(self, **kwargs)

    def update_one_step_jit(self, max_iter: int = 4, **kwargs) -> float:
        """Drive one step through the jitted path (single dispatch)."""
        if getattr(self, "_jit_step", None) is None:
            self._jit_step = self.make_jitted_step(max_newton=max_iter,
                                                   **kwargs)
        self.t += self.dt
        state = self._runtime_state()
        x, dx, res, _ = self._jit_step(state, self.x,
                                       jnp.asarray(self.t, self.dtype),
                                       jnp.asarray(self.dt, self.dtype))
        self.x, self.dx = x, dx
        return float(res)

    # ------------------------------------------------------------------
    # integration-point evaluation (for history-variable return maps)
    # ------------------------------------------------------------------
    def evaluate_at_itg(self, wp_id: int, expr):
        """Evaluate a (scalar, concrete-index) expression at the domain
        quadrature points of a workpiece using the current solution x:
        returns [n_el, n_itg].  This is how user code recomputes converged
        integration-point quantities to update history state (replacing
        the reference's in-callback mutation, J2Plasticity.jl:201-208)."""
        from ..symbolics.ir import free_index
        from ..symbolics.simplify import unroll_and_simplify
        from .assembly import _build_env
        from .local_assembly import (_extervar_info, _innervar_info,
                                     extract_words)
        from .lowering import LoweringContext

        term = as_term(expr)
        if free_index(term):
            raise ValueError("evaluate_at_itg expects concrete indices")
        term = unroll_and_simplify(term, self.dim)
        tb = self.tensor_table
        wp = self.workpieces[wp_id]
        la = wp.local_assembly
        inner, exter = extract_words(tb, term)
        inner_infos = [_innervar_info(self.dim, w, la.bvar_mapping)
                       for w in inner]
        exter_infos = [_extervar_info(self.dim, w) for w in exter]
        cw = self._compiled_wps[wp_id]
        wp_state = self.state["wp"][wp_id]
        env = _build_env(tb, wp_state, wp_state["el"], cw, inner_infos,
                         exter_infos, self.x, self.t, self.dt,
                         {k: float(v) for k, v in self.global_vars.items()},
                         is_boundary=False)
        ctx = LoweringContext(
            tb, env, self.functions,
            user_state=jax.tree_util.tree_map(jnp.asarray, self.user_state))
        return ctx.lower(term)

    # ------------------------------------------------------------------
    # state sync (assemble_X! / dessemble_X!)
    # ------------------------------------------------------------------
    def assemble_x(self) -> None:
        meshes = [wp.mesh for wp in self.workpieces]
        assemblies = [wp.local_assembly for wp in self.workpieces]
        self.x = jnp.asarray(assemble_x(meshes, assemblies, self.pattern),
                             dtype=self.dtype)

    def dessemble_x(self) -> None:
        meshes = [wp.mesh for wp in self.workpieces]
        assemblies = [wp.local_assembly for wp in self.workpieces]
        dessemble_x(np.asarray(self.x), meshes, assemblies, self.pattern)
        self.drop_host_caches()   # solution columns live in mesh.fields
