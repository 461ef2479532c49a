"""Grid container: an immutable pytree describing one receptor field grid.

This replaces the reference's mutable ``GridForce`` state (reference
openmmapi/include/GridForce.h:83) with a functional dataclass that can flow
through ``jax.jit`` / ``vmap`` / ``pjit``. Array leaves are traced; geometry
and mode switches are static metadata so XLA sees fixed shapes and branches.

Layout conventions:
  * ``vals``:   [nx, ny, nz] (C order, z fastest — same linearization as the
                reference's ``ix*ny*nz + iy*nz + iz``).
  * ``derivs``: [nx, ny, nz, 27] (derivative-minor; the canonical on-disk
                layout [27, nx, ny, nz] is transposed at load time for gather
                locality on TPU). Cell-fractional scaling, see
                ops/derivatives27.py.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .units import DEFAULT_GRID_CAP, DEFAULT_OOB_K


class InvPowerMode(enum.IntEnum):
    """Inverse-power smoothing transform modes
    (reference openmmapi/include/GridForceTypes.h:10-32)."""

    NONE = 0     # grid stores raw values, no transform
    RUNTIME = 1  # grid stores raw values; eval transforms stencil to G^(1/n),
                 # interpolates, then back-transforms (.)^n
    STORED = 2   # grid stores G^(1/n); eval back-transforms (.)^n


class InterpolationMethod(enum.IntEnum):
    """Interpolation methods (reference GridForce.h:280-296)."""

    TRILINEAR = 0
    BSPLINE = 1     # cubic B-spline, 4x4x4 stencil (smoothing, not exact)
    TRICUBIC = 2    # Lekien-Marsden tricubic Hermite, needs 8 derivatives
    TRIQUINTIC = 3  # C2 triquintic Hermite, needs all 27 derivatives


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    """One receptor field grid plus its evaluation configuration."""

    # --- array data (pytree leaves) ---
    vals: jax.Array                    # [nx, ny, nz]
    spacing: jax.Array                 # [3] nm
    origin: jax.Array                  # [3] nm
    derivs: Optional[jax.Array] = None  # [nx, ny, nz, 27] or None

    # --- static metadata ---
    counts: tuple[int, int, int] = dataclasses.field(
        default=(0, 0, 0), metadata=dict(static=True))
    interp_method: int = dataclasses.field(
        default=int(InterpolationMethod.TRILINEAR), metadata=dict(static=True))
    inv_power_mode: int = dataclasses.field(
        default=int(InvPowerMode.NONE), metadata=dict(static=True))
    inv_power: float = dataclasses.field(
        default=0.0, metadata=dict(static=True))
    grid_cap: float = dataclasses.field(
        default=DEFAULT_GRID_CAP, metadata=dict(static=True))
    oob_k: float = dataclasses.field(
        default=DEFAULT_OOB_K, metadata=dict(static=True))
    grid_type: str = dataclasses.field(default="", metadata=dict(static=True))

    # ------------------------------------------------------------------
    @staticmethod
    def create(vals,
               spacing,
               origin=(0.0, 0.0, 0.0),
               derivs=None,
               interp_method=InterpolationMethod.TRILINEAR,
               inv_power_mode=InvPowerMode.NONE,
               inv_power=0.0,
               grid_cap=DEFAULT_GRID_CAP,
               oob_k=DEFAULT_OOB_K,
               grid_type="",
               dtype=None) -> "Grid":
        """Build a Grid from array-likes.

        ``vals`` may be [nx,ny,nz] or flat (then ``counts`` is taken from its
        shape / must be inferable). ``derivs`` may be [27,nx,ny,nz] (canonical
        file layout) or [nx,ny,nz,27]; both are normalized to the internal
        derivative-minor layout.
        """
        vals = np.asarray(vals)
        if vals.ndim == 1:
            raise ValueError("pass vals with shape [nx, ny, nz]; "
                             "reshape flat buffers at the I/O layer")
        if vals.ndim != 3:
            raise ValueError(f"vals must be 3-D, got shape {vals.shape}")
        counts = tuple(int(c) for c in vals.shape)
        if dtype is None:
            dtype = vals.dtype if vals.dtype in (np.float32, np.float64) \
                else np.float32
        vals = jnp.asarray(vals, dtype=dtype)

        d = None
        if derivs is not None:
            derivs = np.asarray(derivs)
            if derivs.ndim == 4 and derivs.shape[0] == 27:
                derivs = np.moveaxis(derivs, 0, -1)
            if derivs.shape != counts + (27,):
                raise ValueError(
                    f"derivs shape {derivs.shape} does not match grid "
                    f"{counts} (+27)")
            d = jnp.asarray(derivs, dtype=dtype)

        return Grid(
            vals=vals,
            derivs=d,
            spacing=jnp.asarray(spacing, dtype=dtype),
            origin=jnp.asarray(origin, dtype=dtype),
            counts=counts,
            interp_method=int(interp_method),
            inv_power_mode=int(inv_power_mode),
            inv_power=float(inv_power),
            grid_cap=float(grid_cap),
            oob_k=float(oob_k),
            grid_type=grid_type,
        )

    @property
    def has_derivatives(self) -> bool:
        return self.derivs is not None

    @property
    def num_points(self) -> int:
        nx, ny, nz = self.counts
        return nx * ny * nz

    def with_(self, **kwargs) -> "Grid":
        """Return a copy with the given fields replaced."""
        return dataclasses.replace(self, **kwargs)
