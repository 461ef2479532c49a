"""Batched MD on out-of-core grids: scattered replica clouds, each
stepping against its own streamed region.

TPU-era replacement for running the reference's tiled MD loop
(platforms/cuda/src/CudaGridForceKernels.cpp:787-1028: positions
download -> prepareTiles -> computeGridForceTiled each step) over many
independent replicas: a host-orchestrated segment loop — replicas are
grouped by lattice-aligned region (the same assignment as
StreamedGridEvaluator.evaluate_batch), each group's segment runs as ONE
jitted vmapped dispatch with the region grids passed as arguments
(never baked into HLO), and groups are reformed between segments as the
clouds drift. Atoms outside the full grid take the full-box restraint
(reference OOB semantics), and any replica whose cloud outruns its
region mid-segment is detected at the segment boundary — the segment
then re-runs from its saved start in smaller chunks with re-centered
regions, raising only if the cloud outruns the margin within ~a dozen
steps."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..io.streaming import StreamedGridEvaluator
from ..ops.packed import combine_packed_grids, evaluate_multi, pack_grid
from .integrators import MDState, make_langevin_step
from .system import System, energy_and_forces


def _cloud_bounds(positions, full_lo, full_hi):
    """Bbox of the IN-GRID atoms (works per replica [N,3] or batched
    [R,N,3]): keeps the host's per-segment download at O(R) floats
    instead of the whole position tensor (the tunnel's ~2.5 MB/s makes
    full position syncs the dominant cost otherwise). An all-outside
    cloud yields +/-inf bounds — derive any_in from finiteness."""
    inside = jnp.all((positions >= full_lo) & (positions <= full_hi),
                     axis=-1, keepdims=True)                 # [..., N, 1]
    big = jnp.asarray(jnp.inf, positions.dtype)
    lo = jnp.min(jnp.where(inside, positions, big), axis=-2)
    hi = jnp.max(jnp.where(inside, positions, -big), axis=-2)
    return lo, hi


_CLOUD_BOUNDS_JIT = jax.jit(_cloud_bounds)


def _unpack_bounds(b12):
    """Host-side split of the packed [R, 12] per-segment download into
    ((fin_lo, fin_hi, fin_in), (run_lo, run_hi, run_in))."""
    b = np.asarray(b12)
    fin_lo, fin_hi = b[:, 0:3], b[:, 3:6]
    run_lo, run_hi = b[:, 6:9], b[:, 9:12]
    return ((fin_lo, fin_hi, np.isfinite(fin_lo).all(axis=1)),
            (run_lo, run_hi, np.isfinite(run_lo).all(axis=1)))


class _RegionCrossing(RuntimeError):
    """A replica's cloud left its region's interior within a segment."""

    def __init__(self, message, bad):
        super().__init__(message)
        self.bad = np.asarray(bad, dtype=int)


class StreamedBatchMD:
    """Langevin MD for a batch of replica clouds over file-backed grids.

    ``evaluators``: co-located :class:`StreamedGridEvaluator`s (one per
    grid file, e.g. charge/ljr/lja over the same box); ``scalings``: one
    per-atom scaling array per evaluator. Each replica's cloud must fit
    one region at a time — the batch as a whole may scatter anywhere.
    """

    def __init__(self, evaluators: Sequence[StreamedGridEvaluator],
                 scalings, system: System, dt: float, friction: float,
                 scheme: str = "classic", refresh_steps: int = 50):
        if not evaluators:
            raise ValueError("need at least one evaluator")
        ev0 = evaluators[0]
        for ev in evaluators[1:]:
            if (tuple(ev.stream.counts) != tuple(ev0.stream.counts)
                    or not np.allclose(ev.stream.spacing,
                                       ev0.stream.spacing)
                    or not np.allclose(ev.stream.origin,
                                       ev0.stream.origin)
                    or tuple(ev.region_shape) != tuple(ev0.region_shape)):
                raise ValueError(
                    "evaluators must be co-located (same counts, "
                    "spacing, origin) with identical region shapes")
        if len(scalings) != len(evaluators):
            raise ValueError(
                f"{len(scalings)} scalings for {len(evaluators)} "
                "evaluators")
        if int(refresh_steps) < 1:
            raise ValueError("refresh_steps must be >= 1")
        self.evaluators = list(evaluators)
        self.scalings = [np.asarray(s) for s in scalings]
        self.system = system
        self.dt = float(dt)
        self.friction = float(friction)
        self.scheme = scheme
        self.refresh_steps = int(refresh_steps)
        self._runners = {}
        self._starts = None     # [R, 3] per-replica region hysteresis
        self._recenter = None   # [R] bool: force re-center on next assign
        # fused PACKED regions: per-cell polynomial coefficients of all
        # co-located grids (one lane-padded row gather per atom — the
        # same fast path as in-memory MD; the direct stencil kernel is
        # ~100x slower per step). Packed rows are memory-hungry (64-216
        # coeffs/cell/grid), so keep only a couple resident.
        self._packed = {}
        self.packed_regions = 4

    def _runner(self, n_steps: int):
        """Jitted group-segment runner; the fused PACKED region is an
        ARGUMENT so the compiled program is shared by every region (and
        never embeds multi-MB tables as HLO constants). Atoms outside
        the FULL grid take the full-box restraint (applied once per
        fused set, like the in-memory fused path)."""
        run = self._runners.get(n_steps)
        if run is not None:
            return run
        ev0 = self.evaluators[0]
        full_lo, full_hi = ev0.full_box
        oob_k = ev0.oob_k
        dt, friction, scheme = self.dt, self.friction, self.scheme

        def seg(states, system, fused, scal_stack, temps):
            lo = jnp.asarray(full_lo, states.positions.dtype)
            hi = jnp.asarray(full_hi, states.positions.dtype)

            def one(state, t):
                def force_fn(x):
                    f = energy_and_forces(system, [], x)[1]
                    res = evaluate_multi(fused, x, scal_stack)
                    inside = jnp.all((x >= lo) & (x <= hi), axis=1)
                    dev = jnp.where(x < lo, x - lo,
                                    jnp.where(x > hi, x - hi, 0.0))
                    return f + jnp.where(inside[:, None], res.forces,
                                         -oob_k * dev)
                step = make_langevin_step(
                    force_fn, system.masses, dt, friction, t,
                    scheme=scheme, constraints=system.constraints)

                # carry a RUNNING in-grid bbox so mid-segment region
                # excursions are detected even when the region restraint
                # (or an exit from the full grid) pulls the atom back
                # before the segment ends
                def body(carry, _):
                    st, rlo, rhi = carry
                    st2 = step(st)
                    l2, h2 = _cloud_bounds(st2.positions, lo, hi)
                    return (st2, jnp.minimum(rlo, l2),
                            jnp.maximum(rhi, h2)), None
                l0, h0 = _cloud_bounds(state.positions, lo, hi)
                (st, rlo, rhi), _ = jax.lax.scan(
                    body, (state, l0, h0), None, length=n_steps,
                    unroll=4)
                return st, rlo, rhi
            out, run_lo, run_hi = jax.vmap(one)(states, temps)
            fin_lo, fin_hi = _cloud_bounds(out.positions, lo, hi)
            return out, jnp.concatenate(
                [fin_lo, fin_hi, run_lo, run_hi], axis=1)   # [R, 12]

        run = jax.jit(seg)
        self._runners[n_steps] = run
        return run

    def _packed_region(self, start):
        """Fused packed region for ``start``: read each evaluator's
        region (through its device LRU), pack to per-cell coefficients,
        fuse into one multi-grid row table. Hysteresis keeps regions
        stable across segments, so the pack cost amortizes."""
        key = tuple(int(s) for s in start)
        hit = self._packed.get(key)
        if hit is not None:
            self._packed.pop(key)
            self._packed[key] = hit
            return hit
        grids, ilo, ihi = [], None, None
        for ev in self.evaluators:
            g, (lo, hi) = ev._region_cached(start)
            grids.append(g)
            ilo = lo if ilo is None else np.maximum(ilo, lo)
            ihi = hi if ihi is None else np.minimum(ihi, hi)
        fused = combine_packed_grids([pack_grid(g) for g in grids])
        built = (fused, (ilo, ihi))
        self._packed[key] = built
        while len(self._packed) > self.packed_regions:
            self._packed.pop(next(iter(self._packed)))
        return built

    def run(self, states: MDState, temperatures, n_steps: int) -> MDState:
        """Advance every replica ``n_steps``; returns the new batch.

        Host traffic per segment is O(R) floats (in-grid cloud bboxes
        computed on device), never the position tensor; the common
        all-replicas-one-region case runs the segment with zero
        gather/scatter dispatches. A replica whose cloud outruns its
        region mid-segment (e.g. a charge-fusion-accelerated atom) is
        detected at the segment boundary and the segment re-runs from
        its saved start in quarter-length chunks with re-centered
        regions — only a cloud faster than the region margin over ~a
        dozen steps still raises."""
        n_rep = states.positions.shape[0]
        dtype = states.positions.dtype
        temps = np.broadcast_to(np.asarray(temperatures), (n_rep,))
        full_lo, full_hi = self.evaluators[0].full_box
        l0, h0 = _CLOUD_BOUNDS_JIT(states.positions,
                                    jnp.asarray(full_lo, dtype),
                                    jnp.asarray(full_hi, dtype))
        l0, h0 = np.asarray(l0), np.asarray(h0)
        bounds = (l0, h0, np.isfinite(l0).all(axis=1))
        scal_stack = jnp.asarray(np.stack(self.scalings), dtype)
        done = 0
        while done < n_steps:
            k = min(self.refresh_steps, n_steps - done)
            states, bounds = self._run_chunk(states, bounds, temps,
                                             scal_stack, k, depth=0)
            done += k
        return states

    def _run_chunk(self, states, bounds, temps, scal_stack, k, depth):
        try:
            return self._segment(states, bounds, temps, scal_stack, k)
        except _RegionCrossing as rc:
            if depth >= 2 or k < 4:
                raise
            # drop the violators' hysteresis entries so the retry
            # actually RE-CENTERS their regions on the current clouds
            # (the segment-start bbox is usually still inside the old
            # interior, so hysteresis alone would keep the old region
            # and the retry would rely on shorter chunks only)
            if self._starts is not None:
                lo, hi, any_in = bounds
                recenter = np.zeros(len(any_in), dtype=bool)
                recenter[rc.bad] = True
                self._recenter = recenter
            sub = max(k // 4, 1)
            left = k
            while left > 0:
                piece = min(sub, left)
                states, bounds = self._run_chunk(states, bounds, temps,
                                                 scal_stack, piece,
                                                 depth + 1)
                left -= piece
            return states, bounds

    def _segment(self, states, bounds, temps, scal_stack, k):
        n_rep = states.positions.shape[0]
        dtype = states.positions.dtype
        runner = self._runner(k)
        starts = self._assign_regions(bounds)
        uniq, inverse = np.unique(starts, axis=0, return_inverse=True)
        # never thrash the packed-region LRU: it must hold at least one
        # entry per concurrent group
        self.packed_regions = max(self.packed_regions, uniq.shape[0])
        if uniq.shape[0] == 1:
            fused, interior = self._packed_region(uniq[0])
            states, b = runner(states, self.system, fused, scal_stack,
                               jnp.asarray(temps, dtype))
            fin, run_b = _unpack_bounds(b)      # ONE [R,12] download
            interiors, perm = [interior], [np.arange(n_rep)]
        else:
            perm, outs, bparts, interiors = [], [], [], []
            for u in range(uniq.shape[0]):
                idx = np.nonzero(inverse == u)[0]
                fused, interior = self._packed_region(uniq[u])
                nb = 1 << (len(idx) - 1).bit_length()
                pad = np.concatenate(
                    [idx, np.repeat(idx[:1], nb - len(idx))])
                sub = jax.tree.map(lambda x: x[pad], states)
                out, b = runner(sub, self.system, fused, scal_stack,
                                jnp.asarray(temps[pad], dtype))
                perm.append(idx)
                outs.append(jax.tree.map(lambda x: x[:len(idx)],
                                         out))
                bparts.append(np.asarray(b)[:len(idx)])
                interiors.append(interior)
            order = np.argsort(np.concatenate(perm))
            states = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0)[order], *outs)
            fin, run_b = _unpack_bounds(
                np.concatenate(bparts, axis=0)[order])
        # the check sees the RUNNING bbox (every mid-segment excursion);
        # the next assignment sees the final bbox
        self._check_bounds(run_b, interiors, perm, k)
        return states, fin

    def _assign_regions(self, bounds):
        """Per-replica region starts from in-grid cloud bboxes, with
        hysteresis: keep a replica's previous region while its cloud
        stays inside that region's interior; otherwise re-CENTER a
        region on the cloud (maximal symmetric margin for the coming
        segment). All-outside replicas keep whatever region they have
        (only the restraint branch runs for them)."""
        blo, bhi, any_in = bounds
        ev0 = self.evaluators[0]
        spacing = np.asarray(ev0.stream.spacing)
        origin = np.asarray(ev0.stream.origin)
        counts = np.asarray(ev0.stream.counts)
        shape = np.asarray(ev0.region_shape)
        from ..io.streaming import _HALO
        # widest stencil halo across evaluators (mixed-method sets must
        # size regions for the method that needs the most support)
        lo_h = max(_HALO[ev.interp_method][0] for ev in self.evaluators)
        hi_h = max(_HALO[ev.interp_method][1] for ev in self.evaluators)
        n_rep = len(any_in)
        if self._starts is not None and len(self._starts) != n_rep:
            self._starts = None

        # placeholder bbox for all-outside replicas (start stays 0/prev)
        safe_lo = np.where(any_in[:, None], blo, origin)
        safe_hi = np.where(any_in[:, None], bhi, origin)
        cell_lo = np.clip(
            np.floor((safe_lo - origin) / spacing).astype(int) - lo_h,
            0, counts - 1)
        cell_hi = np.clip(
            np.floor((safe_hi - origin) / spacing).astype(int) + 1 + hi_h,
            0, counts - 1)
        need = cell_hi - cell_lo + 1
        too_big = any_in & np.any(need > shape, axis=1)
        if np.any(too_big):
            i = int(np.argmax(too_big))
            raise ValueError(
                f"replica {i}'s cloud needs region {tuple(need[i])} > "
                f"configured {tuple(shape)}; enlarge region_shape")
        mid = (cell_lo + cell_hi + 1) // 2
        max_start = np.maximum(counts - shape, 0)
        centered = np.clip(mid - shape // 2, 0, max_start)

        if self._starts is None:
            starts = np.where(any_in[:, None], centered, 0)
        else:
            # tightest interior across evaluators' halos (mirrors
            # _packed_region / _check_bounds)
            ilo = ihi = None
            for ev in self.evaluators:
                lo_e, hi_e = ev._interior_box(self._starts)
                ilo = lo_e if ilo is None else np.maximum(ilo, lo_e)
                ihi = hi_e if ihi is None else np.minimum(ihi, hi_e)
            keep = (~any_in) | (np.all(blo >= ilo, axis=1)
                                & np.all(bhi <= ihi, axis=1))
            if self._recenter is not None and len(self._recenter) == n_rep:
                keep &= ~(self._recenter & any_in)
            starts = np.where(keep[:, None], self._starts, centered)
        self._recenter = None
        self._starts = starts
        return starts

    def _check_bounds(self, bounds, interiors, perm, k):
        """Every replica's RUNNING in-grid cloud bbox (the min/max over
        every step of the segment, so excursions that self-reverse are
        still seen) must stay inside its region interior; replicas whose
        atoms were outside the full grid the whole segment are exempt
        (only the restraint branch ran for them). Violations raise
        _RegionCrossing so run() can re-run the segment in smaller
        chunks before giving up."""
        blo, bhi, any_in = bounds
        for (ilo, ihi), idx in zip(interiors, perm):
            ok = ((~any_in[idx])
                  | (np.all(blo[idx] >= ilo, axis=1)
                     & np.all(bhi[idx] <= ihi, axis=1)))
            if not np.all(ok):
                bad = np.asarray(idx)[~ok]
                raise _RegionCrossing(
                    f"replicas {bad.tolist()} crossed their streamed "
                    f"region boundary during a {k}-step segment; lower "
                    "refresh_steps or enlarge region_shape", bad)
