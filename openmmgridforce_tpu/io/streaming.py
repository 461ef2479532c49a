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
from ..ops.interpolate import GridEval, evaluate_grid
from ..units import DEFAULT_OOB_K
from .native import NativeTileStream


def evaluate_streamed(grid, full_origin, full_corner, positions,
                      scaling, oob_k: float, *,
                      return_gap_mask: bool = False):
    """Evaluate atoms on a region-resident grid, applying the
    out-of-bounds restraint of the FULL grid box (jit-compatible).

    ``grid`` may be a raw :class:`Grid` (direct stencil kernel) or a
    :class:`PackedGrid` of the region (the single-row-gather fast path
    — what MD steppers should use; ~100x faster per step).

    The region grid's own inside-test uses the region box; atoms outside
    the full grid must be restrained toward the full box instead
    (reference semantics: ReferenceGridForceKernels.cpp's OOB branch is
    relative to the whole grid). Atoms inside the full grid but outside
    the region — "in the gap" — would silently receive the region's
    restraint values; callers must keep the cloud inside the region
    (see ``StreamedGridEvaluator.region_grid``). Pass
    ``return_gap_mask=True`` to get ``(GridEval, gap_mask)`` where
    ``gap_mask[n]`` flags exactly those silent-wrong atoms (active,
    inside the full box, outside the region's box) so callers can
    assert/retry instead of trusting containment discipline.
    StreamedBatchMD enforces containment by construction (in-scan bbox
    + re-centered retries); this output exists for direct callers.
    """
    import jax.numpy as jnp

    from ..ops.packed import PackedGrid, evaluate_packed

    if isinstance(grid, PackedGrid):
        res = evaluate_packed(grid, positions, scaling)
    else:
        res = evaluate_grid(grid, positions, scaling)
    full_origin = jnp.asarray(full_origin, positions.dtype)
    full_corner = jnp.asarray(full_corner, positions.dtype)
    inside_full = jnp.all((positions >= full_origin)
                          & (positions <= full_corner), axis=1)
    dev = jnp.where(positions < full_origin, positions - full_origin,
                    jnp.where(positions > full_corner,
                              positions - full_corner, 0.0))
    e_oob = 0.5 * oob_k * jnp.sum(dev * dev, axis=1)
    f_oob = -oob_k * dev
    active = inside_full & (jnp.asarray(scaling) != 0.0)
    per_atom = jnp.where(active, res.per_atom_energy, e_oob)
    forces = jnp.where(active[:, None], res.forces, f_oob)
    out = GridEval(jnp.sum(per_atom), forces, per_atom)
    if not return_gap_mask:
        return out
    region_origin = jnp.asarray(grid.origin, positions.dtype)
    region_corner = region_origin + (
        jnp.asarray(grid.spacing, positions.dtype)
        * (jnp.asarray(grid.counts, positions.dtype) - 1.0))
    inside_region = jnp.all((positions >= region_origin)
                            & (positions <= region_corner), axis=1)
    return out, active & ~inside_region

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
                 oob_k: float = DEFAULT_OOB_K,
                 oob_convention: str = "reference"):
        """``oob_convention``: "reference" (default) applies the
        standard out-of-bounds restraint E = 1/2 k d^2, F = -k dev;
        "cuda-tiled" reproduces the reference's TILED kernel quirk Q7
        (E = k d^2, F = -2 k dev — exactly a doubled stiffness;
        platforms/cuda/src/kernels/gridForceTiled.cu:522-550, vs the
        1/2 k d^2 of the non-tiled gridForce.cu:479)."""
        if oob_convention not in ("reference", "cuda-tiled"):
            raise ValueError(f"unknown oob_convention {oob_convention!r}")
        if oob_convention == "cuda-tiled":
            oob_k = 2.0 * oob_k
        self.oob_convention = oob_convention
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
        # last-region cache: (grid, (interior_lo, interior_hi)); reused
        # whenever the next call's cloud still fits the interior, so a
        # stationary or slowly-drifting cloud costs zero file reads
        self._cached = None
        self.region_hits = 0
        self.region_misses = 0
        # scattered-batch path: device-resident region LRU + jitted
        # vmapped evaluator (built lazily)
        self._regions = {}
        self.device_regions = 8
        self._batch_eval = None
        if self.interp_method in (InterpolationMethod.TRICUBIC,
                                  InterpolationMethod.TRIQUINTIC) \
                and not self.stream.has_derivatives:
            raise ValueError(
                "tiled file has no derivatives; Hermite methods need them")

    def _cell_bounds(self, positions):
        """Halo-inclusive (cell_lo, cell_hi) covering one cloud's
        IN-GRID atoms, or ``None`` when no atom is inside the full grid
        (those take the restraint branch and need no grid data). Raises
        if the cloud cannot fit one region. The single shared
        implementation behind every region-placement policy."""
        spacing = np.asarray(self.stream.spacing)
        origin = np.asarray(self.stream.origin)
        counts = np.asarray(self.stream.counts)
        lo_h, hi_h = _HALO[self.interp_method]

        pos = np.asarray(positions)
        corner = origin + (counts - 1) * spacing
        inside = np.all((pos >= origin) & (pos <= corner), axis=1)
        if not np.any(inside):
            return None
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
        return cell_lo, cell_hi

    def _region_for(self, positions):
        """Region start for one cloud — CENTERED, so drift in any
        direction has the same (maximal) margin before the next refresh.
        (An edge-flush start leaves sub-spacing margin on the low side
        and makes segment runners spuriously refresh/raise on low-ward
        drift.)"""
        return self._centered_region_for(positions)

    @property
    def full_box(self):
        """(origin, corner) of the FULL on-disk grid in world coords."""
        spacing = np.asarray(self.stream.spacing)
        origin = np.asarray(self.stream.origin)
        corner = origin + (np.asarray(self.stream.counts) - 1) * spacing
        return origin, corner

    def _build_region(self, start, shape=None):
        """Read region ``start`` and return ``(grid, (ilo, ihi))`` —
        a device-ready :class:`Grid` plus its exact interior box."""
        start = np.asarray(start, dtype=int)
        if shape is None:
            shape = self.region_shape
        with_derivs = self.interp_method in (
            InterpolationMethod.TRICUBIC, InterpolationMethod.TRIQUINTIC)
        vals, derivs = self.stream.read_region(start, shape,
                                               with_derivatives=with_derivs)
        spacing = np.asarray(self.stream.spacing)
        full_origin = np.asarray(self.stream.origin)
        counts = np.asarray(self.stream.counts)
        origin = full_origin + start * spacing
        grid = Grid.create(
            vals, spacing, origin,
            derivs=derivs,
            interp_method=self.interp_method,
            inv_power_mode=self.inv_power_mode,
            inv_power=self.inv_power,
            oob_k=self.oob_k,
        )
        return grid, self._interior_box(start, shape)

    def region_grid(self, positions):
        """Read the region covering ``positions`` and return
        ``(grid, (interior_lo, interior_hi))``.

        ``grid`` is a device-ready :class:`Grid` for the region; within
        the interior box, region-local evaluation via
        :func:`evaluate_streamed` is exact (full stencil support). The
        interior extends to the full-grid boundary wherever the region
        touches it. Segment runners refresh the region whenever the atom
        cloud approaches the interior boundary.

        Reuses the previous region (no file read, no new device buffer)
        when every in-grid atom still lies inside its exact interior —
        a stationary or slowly-drifting cloud then costs zero I/O.
        """
        if self._cached is not None:
            cgrid, (ilo, ihi) = self._cached
            pos = np.asarray(positions)
            full_lo, full_hi = self.full_box
            in_full = np.all((pos >= full_lo) & (pos <= full_hi), axis=1)
            if np.all(np.all((pos >= ilo) & (pos <= ihi), axis=1)
                      | ~in_full):
                self.region_hits += 1
                return self._cached
        self.region_misses += 1
        start = self._region_for(positions)
        self._cached = self._build_region(start)
        return self._cached

    def _aligned_region_for(self, pos):
        """Region start for ONE cloud, aligned to a half-region lattice
        so nearby clouds share regions (maximizing the device-region and
        native tile caches). Falls back to the exact start when the
        cloud straddles a lattice boundary; raises if it cannot fit any
        region (mirrors the reference's per-tile coverage contract,
        gridForceTiled.cu's per-atom tile lookup)."""
        cb = self._cell_bounds(pos)
        if cb is None:
            return np.zeros(3, dtype=int)
        cell_lo, cell_hi = cb
        counts = np.asarray(self.stream.counts)
        shape = np.asarray(self.region_shape)
        max_start = np.maximum(counts - shape, 0)
        stride = np.maximum(shape // 2, 1)
        aligned = np.clip((cell_lo // stride) * stride, 0, max_start)
        if np.all(cell_hi <= aligned + shape - 1):
            return aligned
        return np.clip(cell_lo, 0, max_start)

    def _centered_region_for(self, pos):
        """Region start CENTERING one cloud — for MD stepping, where the
        symmetric margin (not cache alignment) sets how long a segment
        can run before the cloud reaches the interior boundary. Raises
        if the cloud cannot fit a region."""
        cb = self._cell_bounds(pos)
        if cb is None:
            return np.zeros(3, dtype=int)
        cell_lo, cell_hi = cb
        counts = np.asarray(self.stream.counts)
        shape = np.asarray(self.region_shape)
        mid = (cell_lo + cell_hi + 1) // 2
        return np.clip(mid - shape // 2, 0,
                       np.maximum(counts - shape, 0))

    def _interior_box(self, start, shape=None):
        """(interior_lo, interior_hi) world box of region ``start`` —
        pure geometry, no file read (extends to the full-grid boundary
        wherever the region touches it)."""
        spacing = np.asarray(self.stream.spacing)
        origin = np.asarray(self.stream.origin)
        counts = np.asarray(self.stream.counts)
        lo_h, hi_h = _HALO[self.interp_method]
        start = np.asarray(start, dtype=int)
        if shape is None:
            shape = self.region_shape
        last = start + np.asarray(shape) - 1
        corner = origin + (counts - 1) * spacing
        interior_lo = np.where(start > 0,
                               origin + (start + lo_h) * spacing, origin)
        interior_hi = np.where(last < counts - 1,
                               origin + (last - hi_h) * spacing, corner)
        return interior_lo, interior_hi

    def full_grid_bytes(self):
        """Bytes a full-grid payload takes (values, plus the 27
        derivatives for Hermite methods). Full-grid escalation payloads
        live in HOST memory (see ``_full_region_cached``), so this
        budgets host RAM, not HBM."""
        per_pt = 28 if self.interp_method in (
            InterpolationMethod.TRICUBIC,
            InterpolationMethod.TRIQUINTIC) else 1
        return int(np.prod(self.stream.counts)) * 4 * per_pt

    def _full_region_cached(self, host=False):
        """The WHOLE on-disk grid as one region — the escalation payload
        for clouds no bounded region can contain (e.g. a capped-well
        runaway transiting the box). Its interior is the full grid box,
        so containment checks are vacuous; cached separately from the
        region LRU. With ``host=True`` the grid arrays are committed to
        the host CPU device: a multi-GB full grid must never share HBM
        with the resident region packs (measured to exhaust a 16 GB
        chip at stress scale), and on tunneled backends the upload
        itself is prohibitive — escalated replicas run their segments
        on the host instead."""
        attr = "_full_region_host" if host else "_full_region"
        if getattr(self, attr, None) is None:
            if host:
                import jax
                with jax.default_device(jax.devices("cpu")[0]):
                    region = self._build_region(
                        (0, 0, 0), tuple(int(c) for c in self.stream.counts))
            else:
                region = self._build_region(
                    (0, 0, 0), tuple(int(c) for c in self.stream.counts))
            setattr(self, attr, region)
        return getattr(self, attr)

    def _region_cached(self, start):
        """Device-resident region LRU keyed by start (bounded by
        ``device_regions``); falls through to the file streamer."""
        key = tuple(int(s) for s in start)
        hit = self._regions.get(key)
        if hit is not None:
            self.region_hits += 1
            # refresh LRU order
            self._regions.pop(key)
            self._regions[key] = hit
            return hit
        self.region_misses += 1
        built = self._build_region(start)
        self._regions[key] = built
        while len(self._regions) > self.device_regions:
            self._regions.pop(next(iter(self._regions)))
        return built

    def evaluate_batch(self, positions, scaling):
        """GridEval (batched leaves) for replica clouds scattered across
        the full grid: ``positions`` is [R, N, 3], ``scaling`` [N] or
        [R, N]; returns energies [R], forces [R, N, 3], per-atom [R, N].

        Unlike :meth:`evaluate`, the WHOLE batch need not share one
        region — each replica only needs ITS cloud to fit one region
        (the docking-screen case: small ligand poses spread over a huge
        receptor grid; cf. the reference's per-atom tile lookup,
        platforms/cuda/src/kernels/gridForceTiled.cu). Replicas are
        grouped by lattice-aligned region, each distinct region is read
        once per call (device-LRU-cached across calls), and each group
        is evaluated in one padded vmapped dispatch.
        """
        import jax
        import jax.numpy as jnp

        pos = np.asarray(positions)
        if pos.ndim != 3:
            raise ValueError("evaluate_batch wants positions [R, N, 3]")
        n_rep, n_atoms = pos.shape[0], pos.shape[1]
        scal = np.asarray(scaling)
        if scal.ndim == 1:
            scal = np.broadcast_to(scal, (n_rep, n_atoms))

        starts, big = [], []
        for r, p in enumerate(pos):
            try:
                starts.append(self._aligned_region_for(p))
            except ValueError:
                starts.append(np.zeros(3, dtype=int))   # placeholder
                big.append(r)                            # oversized cloud
        starts = np.stack(starts)
        big = np.asarray(big, dtype=int)
        small = np.setdiff1d(np.arange(n_rep), big)

        if self._batch_eval is None:
            self._batch_eval = jax.jit(
                jax.vmap(evaluate_streamed,
                         in_axes=(None, None, None, 0, 0, None)),
                static_argnums=(5,))
        full_origin, full_corner = self.full_box

        perm, outs = [], []
        if small.size:
            uniq, inverse = np.unique(starts[small], axis=0,
                                      return_inverse=True)
            for u in range(uniq.shape[0]):
                grid, _ = self._region_cached(uniq[u])
                idx = small[np.nonzero(inverse == u)[0]]
                # pad each group to a power of two: bounded recompiles
                b = 1 << (len(idx) - 1).bit_length()
                pad = np.concatenate([idx,
                                      np.repeat(idx[:1], b - len(idx))])
                res = self._batch_eval(grid, full_origin, full_corner,
                                       jnp.asarray(pos[pad]),
                                       jnp.asarray(scal[pad]),
                                       self.oob_k)
                perm.append(idx)
                outs.append(jax.tree.map(lambda x: x[:len(idx)], res))
        # replicas whose own cloud exceeds one region: exact chunked
        # evaluation (same guarantee as the reference's per-atom tile
        # lookup, which never constrains the cloud extent)
        for r in big:
            out = self._evaluate_chunked(pos[r], scal[r])
            perm.append(np.asarray([r]))
            outs.append(jax.tree.map(lambda x: jnp.asarray(x)[None],
                                     out))
        order = np.argsort(np.concatenate(perm))
        cat = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[order],
                           *outs)
        return GridEval(cat.energy, cat.forces, cat.per_atom_energy)

    def evaluate(self, positions, scaling):
        """GridEval for the atoms against the streamed region.

        Atoms outside the FULL grid get the standard restraint (measured
        to the full grid box, not the region box); the region is chosen
        to contain all inside atoms, so region-local evaluation matches
        full-grid evaluation exactly for them. A cloud LARGER than the
        configured region is evaluated exactly via region-sized spatial
        chunks (per-atom grid evaluation is independent), mirroring the
        reference's tiled one-shot evaluation, which prepares however
        many tiles the cloud spans (gridForceTiled.cu).
        """
        import jax.numpy as jnp

        try:
            grid, _ = self.region_grid(positions)
        except ValueError:
            return self._evaluate_chunked(positions, scaling)
        full_origin, full_corner = self.full_box
        return evaluate_streamed(grid, full_origin, full_corner,
                                 jnp.asarray(positions),
                                 jnp.asarray(scaling), self.oob_k)

    def _evaluate_chunked(self, positions, scaling):
        """Exact evaluation of a cloud larger than one region: bucket
        the in-grid atoms on an aligned super-lattice sized so any
        bucket's cloud + stencil halo fits one region, evaluate each
        bucket against its own region, and stitch the per-atom results
        (out-of-full-grid atoms ride with the first bucket — only the
        restraint branch touches them)."""
        import jax.numpy as jnp

        pos = np.asarray(positions)
        scal = np.broadcast_to(np.asarray(scaling), pos.shape[:1])
        origin, corner = self.full_box
        spacing = np.asarray(self.stream.spacing)
        counts = np.asarray(self.stream.counts)
        lo_h, hi_h = _HALO[self.interp_method]
        shape = np.asarray(self.region_shape)
        stride = np.maximum(shape - 1 - lo_h - hi_h, 1)
        inside = np.all((pos >= origin) & (pos <= corner), axis=1)
        cell = np.clip(((pos - origin) / spacing).astype(int),
                       0, counts - 1)
        bucket = cell // stride
        if np.any(inside):
            bucket[~inside] = bucket[np.argmax(inside)]
        keys, inv = np.unique(bucket, axis=0, return_inverse=True)
        n = pos.shape[0]
        forces = np.zeros((n, 3), dtype=pos.dtype)
        per_atom = np.zeros((n,), dtype=pos.dtype)
        for b in range(keys.shape[0]):
            idx = np.nonzero(inv == b)[0]
            grid, _ = self.region_grid(pos[idx])
            out = evaluate_streamed(grid, origin, corner,
                                    jnp.asarray(pos[idx]),
                                    jnp.asarray(scal[idx]), self.oob_k)
            forces[idx] = np.asarray(out.forces, dtype=pos.dtype)
            per_atom[idx] = np.asarray(out.per_atom_energy,
                                       dtype=pos.dtype)
        return GridEval(per_atom.sum(), jnp.asarray(forces),
                        jnp.asarray(per_atom))

    def cache_stats(self):
        return self.stream.cache_stats()

    def close(self):
        self.stream.close()
