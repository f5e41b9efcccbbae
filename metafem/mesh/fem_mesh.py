"""FEM runtime mesh: control-point generation + facet links.

The analog of the reference's mesh_Classical / allocate_Basic_WP_Mesh
(unstructured_mesh/2_Interface.jl, 3_InitializeMesh.jl), redesigned: shared
high-order control points are deduplicated by quantized position
(lexsort/unique on the host) instead of per-entity GPU generation with
orientation alignment — one uniform mechanism for every order, shape and
face orientation (the reference errors out beyond 1 cp per 3D face,
3_InitializeMesh.jl:132-134; this handles arbitrary order).

Output: static arrays ready for device upload -
  cp_coords[n_cp, dim], el_cp[n_el, n_itp], and per boundary-group facet
  (element id, local face index) pairs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from ..elements.discretization import ClassicalDiscretization
from .ref_geometry import GeoMesh


@dataclasses.dataclass
class BoundaryGroup:
    element_ids: np.ndarray   # [n_facet]
    eindex: np.ndarray        # [n_facet] local face index into bdy tables


@dataclasses.dataclass
class WPMesh:
    """Per-workpiece runtime mesh (host numpy; device copies made at
    assembly compile time)."""
    dim: int
    cp_coords: np.ndarray               # [n_cp, dim]
    el_cp: np.ndarray                   # [n_el, n_itp] control-point ids
    boundary_groups: Dict[int, BoundaryGroup]
    fields: Dict[str, np.ndarray]       # named per-cp columns (T, s, ...)

    @property
    def n_cp(self) -> int:
        return len(self.cp_coords)

    @property
    def n_el(self) -> int:
        return len(self.el_cp)

    def field(self, name: str) -> np.ndarray:
        if name not in self.fields:
            self.fields[name] = np.zeros(self.n_cp)
        return self.fields[name]

    def set_field(self, name: str, values) -> None:
        arr = self.fields.setdefault(name, np.zeros(self.n_cp))
        arr[...] = values


def _dedup_positions(pos: np.ndarray, tol: float):
    """Map each row of pos [N, dim] to a unique id; positions within tol
    collapse.  Grid quantization with straddle verification + offset retry."""
    for shift in (0.0, tol / 3.0, 2.0 * tol / 3.0):
        keys = np.round((pos + shift) / tol).astype(np.int64)
        order = np.lexsort(keys.T[::-1])
        sk = keys[order]
        is_new = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            is_new[1:] = np.any(sk[1:] != sk[:-1], axis=1)
        gid_sorted = np.cumsum(is_new) - 1
        gid = np.empty(len(order), dtype=np.int64)
        gid[order] = gid_sorted
        n_unique = gid_sorted[-1] + 1 if len(order) else 0
        # representative position per group (first occurrence)
        rep = np.zeros((n_unique, pos.shape[1]))
        first_pos = order[is_new.nonzero()[0]]
        rep[gid[first_pos]] = pos[first_pos]
        # verify no same-point pair got split across grid cells
        if np.abs(pos - rep[gid]).max() <= tol:
            return gid, rep
    raise RuntimeError("control-point dedup failed: mesh has distinct nodes "
                       "closer than the dedup tolerance")


def build_wp_mesh(geo: GeoMesh, disc: ClassicalDiscretization,
                  boundary_facets: Dict[int, np.ndarray]) -> WPMesh:
    """Generate high-order control points for all elements of ``geo`` and
    link boundary facet groups to (element, local face)."""
    et = disc.element_type
    if geo.shape != et.shape or geo.dim != et.dim:
        raise ValueError("element type does not match the geometric mesh")

    corners = geo.vert[geo.connections]          # [E, n_vert, dim]
    w = et.corner_weights()                      # [n_itp, n_vert]
    all_pos = np.einsum("av,evd->ead", w, corners)  # [E, n_itp, dim]
    n_el, n_itp, dim = all_pos.shape

    # dedup tolerance: a small fraction of the smallest element edge
    edge_vecs = corners - corners[:, [0], :]
    scale = np.linalg.norm(edge_vecs[:, 1:, :], axis=2).min()
    tol = max(scale, 1e-300) * 1e-6 / max(et.order, 1)

    gid, rep = _dedup_positions(all_pos.reshape(-1, dim), tol)
    el_cp = gid.reshape(n_el, n_itp)

    groups: Dict[int, BoundaryGroup] = {}
    for bg_id, f_ids in boundary_facets.items():
        f_ids = np.asarray(f_ids, dtype=np.int64)
        els = geo.facet_elements[f_ids, 0]
        eis = geo.facet_eindex[f_ids, 0]
        if (els < 0).any():
            raise ValueError("boundary group references an invalid facet")
        inner = geo.facet_elements[f_ids, 1]
        if (inner >= 0).any():
            raise ValueError("boundary group contains interior facets")
        groups[bg_id] = BoundaryGroup(element_ids=els.astype(np.int64),
                                      eindex=eis.astype(np.int64))

    return WPMesh(dim=dim, cp_coords=rep, el_cp=el_cp.astype(np.int64),
                  boundary_groups=groups, fields={})
