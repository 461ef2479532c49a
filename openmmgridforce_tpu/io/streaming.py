"""Out-of-core grid evaluation over the native tile streamer.

TPU-era replacement for the reference's tiled evaluation path
(CudaCalcGridForceKernel tiled mode: download positions -> prepareTiles ->
computeGridForceTiled, CudaGridForceKernels.cpp:888-975): for grids too
large for HBM, each evaluation streams ONE fixed-size region covering the
current atom cloud from the OMGTILE file (through the native LRU cache)
into a device-resident Grid, then evaluates with the standard kernels.
The fixed region shape keeps jit signatures stable across calls.
"""

from __future__ import annotations

import numpy as np

from ..grid import Grid, InterpolationMethod
from ..ops.interpolate import evaluate_grid
from ..units import DEFAULT_OOB_K
from .native import NativeTileStream

# stencil halo (grid points) needed on each side per method
_HALO = {
    int(InterpolationMethod.TRILINEAR): (0, 1),
    int(InterpolationMethod.BSPLINE): (1, 2),
    int(InterpolationMethod.TRICUBIC): (0, 1),
    int(InterpolationMethod.TRIQUINTIC): (0, 1),
}


class StreamedGridEvaluator:
    """Evaluate atoms on a file-backed tiled grid, one region per call."""

    def __init__(self, path, interp_method=InterpolationMethod.TRILINEAR,
                 region_shape=(64, 64, 64), budget_bytes: int = 2 << 30,
                 inv_power_mode=None, inv_power=None,
                 oob_k: float = DEFAULT_OOB_K):
        self.stream = NativeTileStream(path, budget_bytes)
        self.interp_method = int(interp_method)
        # never read beyond the grid: clamp the region per axis
        self.region_shape = tuple(
            min(int(r), int(c))
            for r, c in zip(region_shape, self.stream.counts))
        self.oob_k = oob_k
        self.inv_power_mode = (self.stream.inv_power_mode
                               if inv_power_mode is None
                               else int(inv_power_mode))
        self.inv_power = (self.stream.inv_power if inv_power is None
                          else float(inv_power))
        if self.interp_method in (InterpolationMethod.TRICUBIC,
                                  InterpolationMethod.TRIQUINTIC) \
                and not self.stream.has_derivatives:
            raise ValueError(
                "tiled file has no derivatives; Hermite methods need them")

    def _region_for(self, positions):
        """Choose the region start so the atom cloud plus stencil halo
        fits; raises if the cloud exceeds the configured region."""
        spacing = np.asarray(self.stream.spacing)
        origin = np.asarray(self.stream.origin)
        counts = np.asarray(self.stream.counts)
        lo_h, hi_h = _HALO[self.interp_method]

        pos = np.asarray(positions)
        corner = origin + (counts - 1) * spacing
        inside = np.all((pos >= origin) & (pos <= corner), axis=1)
        if not np.any(inside):
            return np.zeros(3, dtype=int)
        # atoms outside the full grid take the restraint branch and need no
        # grid data: only inside atoms size the region
        t = (pos[inside] - origin) / spacing
        cell_lo = np.clip(np.floor(t.min(axis=0)).astype(int) - lo_h,
                          0, counts - 1)
        cell_hi = np.clip(np.floor(t.max(axis=0)).astype(int) + 1 + hi_h,
                          0, counts - 1)
        need = cell_hi - cell_lo + 1
        if np.any(need > np.asarray(self.region_shape)):
            raise ValueError(
                f"atom cloud needs region {tuple(need)} > configured "
                f"{self.region_shape}; enlarge region_shape")
        start = np.clip(cell_lo, 0, np.maximum(counts - self.region_shape,
                                               0))
        return start

    def evaluate(self, positions, scaling):
        """GridEval for the atoms against the streamed region.

        Atoms outside the FULL grid get the standard restraint; the region
        is chosen to contain all atoms, so region-local evaluation matches
        full-grid evaluation exactly for inside atoms.
        """
        start = self._region_for(positions)
        with_derivs = self.interp_method in (
            InterpolationMethod.TRICUBIC, InterpolationMethod.TRIQUINTIC)
        vals, derivs = self.stream.read_region(start, self.region_shape,
                                               with_derivatives=with_derivs)
        spacing = np.asarray(self.stream.spacing)
        origin = np.asarray(self.stream.origin) + start * spacing
        grid = Grid.create(
            vals, spacing, origin,
            derivs=derivs,
            interp_method=self.interp_method,
            inv_power_mode=self.inv_power_mode,
            inv_power=self.inv_power,
            oob_k=self.oob_k,
        )
        # NOTE on boundaries: the region grid's inside-test uses the region
        # box. Atoms inside the full grid but outside the region cannot
        # occur (region contains the cloud); atoms outside the FULL grid
        # are also outside the region, and the restraint must measure
        # distance to the FULL grid box — recompute it here.
        res = evaluate_grid(grid, positions, scaling)
        full_counts = np.asarray(self.stream.counts)
        full_origin = np.asarray(self.stream.origin)
        corner = full_origin + (full_counts - 1) * spacing
        pos = np.asarray(positions)
        inside_full = np.all((pos >= full_origin) & (pos <= corner), axis=1)
        if np.all(inside_full):
            return res
        import jax.numpy as jnp
        dev = np.where(pos < full_origin, pos - full_origin,
                       np.where(pos > corner, pos - corner, 0.0))
        e_oob = 0.5 * self.oob_k * np.sum(dev * dev, axis=1)
        f_oob = -self.oob_k * dev
        scaling = np.asarray(scaling)
        active = inside_full & (scaling != 0.0)
        per_atom = jnp.where(jnp.asarray(active),
                             res.per_atom_energy, jnp.asarray(e_oob))
        forces = jnp.where(jnp.asarray(active)[:, None], res.forces,
                           jnp.asarray(f_oob))
        return type(res)(jnp.sum(per_atom), forces, per_atom)

    def cache_stats(self):
        return self.stream.cache_stats()

    def close(self):
        self.stream.close()
