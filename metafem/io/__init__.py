"""IO: VTK output (and future checkpoint formats)."""

from .vtk import write_vtk  # noqa: F401
