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
then re-runs from its saved start in smaller chunks with regions
RE-CENTERED on the violators' current clouds, raising only if the cloud
outruns the margin within ~a dozen steps.

This module is the ONE streamed-MD engine: the compat
``api.Context``/``Simulation`` streamed stepping and minimization paths
delegate here (a Context is a batch of one replica), so both give the
reference's every-step exactness guarantee. The engine generalizes over

- multiple :class:`StreamSet`\\ s — co-located groups of streamed grids,
  each acting on its own atom subset with its own out-of-bounds
  restraint (the compat API applies each GridForce's restraint
  independently, so a fused set there carries the SUM of its forces'
  k, while the mm-layer default keeps one restraint per fused set);
- a pluggable integrator ``step_factory`` (Langevin by default; the
  compat path supplies Verlet or Langevin built from its Integrator);
- a pluggable ``base_force`` for everything that is not a streamed grid
  (bonded terms by default; the compat path evaluates its whole
  non-streamed force table, with in-memory grids threaded through jit
  as arguments).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import InterpolationMethod
from ..io.streaming import _HALO, StreamedGridEvaluator
from ..ops.interpolate import evaluate_grid
from ..ops.packed import (combine_packed_grids, evaluate_multi, pack_grid,
                          pack_grids_fused)
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


def _unpack_set_bounds(b12):
    """Host-side split of one set's packed [R, 12] per-segment download
    into ((fin_lo, fin_hi, fin_in), (run_lo, run_hi, run_in))."""
    b = np.asarray(b12)
    fin_lo, fin_hi = b[:, 0:3], b[:, 3:6]
    run_lo, run_hi = b[:, 6:9], b[:, 9:12]
    return ((fin_lo, fin_hi, np.isfinite(fin_lo).all(axis=1)),
            (run_lo, run_hi, np.isfinite(run_lo).all(axis=1)))


def _debug_log():
    """Optional stderr logger, enabled by OPENMMGRIDFORCE_STREAM_DEBUG=1
    (diagnosing region-churn/HBM issues on opaque tunneled devices where
    memory_stats() is unavailable)."""
    import os
    import sys
    if os.environ.get("OPENMMGRIDFORCE_STREAM_DEBUG") != "1":
        return None
    return lambda msg: print(f"[stream] {msg}", file=sys.stderr,
                             flush=True)


class _RegionCrossing(RuntimeError):
    """A replica's cloud left its region's interior within a segment."""

    def __init__(self, message, bad):
        super().__init__(message)
        self.bad = np.asarray(bad, dtype=int)


class StreamSet:
    """One co-located group of streamed grids acting on one atom subset.

    Owns all per-set region state: assignment with hysteresis and forced
    re-centering, the fused packed-region LRU, interior geometry, and
    running-bbox containment checks. The batch dimension (replicas) is
    vectorized through every method.

    ``atom_indices``: indices into the full position array this set's
    grids act on (None = all atoms). ``oob_k``: the full-box restraint
    stiffness (default: the first evaluator's — ONE restraint per fused
    set; the compat API passes the sum over its forces instead, since
    the reference applies each GridForce's restraint independently,
    ReferenceGridForceKernels.cpp:1093-1117).
    """

    _FULL = np.array([-1, -1, -1])   # sentinel region start: whole grid

    def __init__(self, evaluators: Sequence[StreamedGridEvaluator],
                 scalings, atom_indices=None, oob_k=None,
                 pack_budget_bytes: int = 512 << 20,
                 full_region_budget_bytes: int = 4 << 30):
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
        self.evaluators = list(evaluators)
        self.scal_stack = np.stack([np.asarray(s) for s in scalings])
        self.atom_idx = (None if atom_indices is None
                         else np.asarray(atom_indices, dtype=int))
        self.oob_k = float(ev0.oob_k if oob_k is None else oob_k)
        self.pack_budget = int(pack_budget_bytes)
        self._starts = None     # [R, 3] per-replica region hysteresis
        self._recenter = None   # [R] bool: force re-center on next assign
        self._union_start = None  # sticky shared-region start (union mode)
        # fused PACKED regions: per-cell polynomial coefficients of all
        # co-located grids (one lane-padded row gather per atom — the
        # same fast path as in-memory MD; the direct stencil kernel is
        # ~100x slower per step). Packed rows are memory-hungry (64-216
        # coeffs/cell/grid), so ``pack_budget_bytes`` bounds the TOTAL
        # resident pack bytes: building a new pack first evicts
        # least-recently-used packs not pinned by the current segment
        # round, and a pack that still would not fit falls back to the
        # direct stencil kernels on the raw region grids (slower, but
        # never OOMs — e.g. a lone crossing-retry replica at stress
        # scale must not double a multi-GB pack footprint).
        self._packed = {}       # key -> (payload, interior)
        self._packed_bytes = {}  # key -> resident device bytes
        self._round_keys = set()  # keys pinned by the current round
        self._host_regions = {}   # CPU-device raw regions (mixed groups)
        # FULL-GRID escalation: a replica whose cloud no bounded region
        # can contain (a capped-well runaway transiting the box, or a
        # crossing that persists through the retry ladder) is moved onto
        # the whole on-disk grid as its "region" — direct-stencil
        # evaluation ON THE HOST CPU device (the multi-GB payload lives
        # in host RAM, never HBM), containment vacuously satisfied —
        # and demoted back to a packed region once its cloud again fits
        # one with margin.
        # This is how the streamed path keeps the reference's
        # every-step-exact guarantee for ANY trajectory (the reference
        # re-prepares tiles each step, CudaGridForceKernels.cpp:888-975)
        # while normal replicas stay on the packed fast path. Only
        # allowed when the full grids fit ``full_region_budget_bytes``.
        self.full_region_budget = int(full_region_budget_bytes)
        self._full = None        # [R] bool: replica is on the full grid
        self._calm = None        # [R] consecutive region-fitting rounds
        self._full_pay = None
        self._full_pay_host = None
        self.full_escalations = 0
        # build counters (observability: region churn is the cost driver
        # on tunneled backends — every raw-region build is a host->device
        # transfer whose bytes the tunnel client never releases)
        self.packs_built = 0
        self.direct_builds = 0

    # --- geometry -------------------------------------------------------
    @property
    def full_box(self):
        return self.evaluators[0].full_box

    def take(self, positions):
        """This set's atoms from full positions ([..., N, 3])."""
        if self.atom_idx is None:
            return positions
        return positions[..., self.atom_idx, :]

    def scatter_matrix(self, n_total):
        """One-hot [n_total, n_sub] scatter for force assembly (TPU
        scatters serialize; a small matmul does not), or None when this
        set covers all atoms in order."""
        if self.atom_idx is None:
            return None
        idx = self.atom_idx
        if len(idx) == n_total and np.array_equal(idx,
                                                  np.arange(n_total)):
            return None
        w = np.zeros((n_total, len(idx)))
        w[idx, np.arange(len(idx))] = 1.0
        return w

    def _interior(self, start):
        """Tightest interior across evaluators' halos for one region."""
        ilo = ihi = None
        for ev in self.evaluators:
            lo_e, hi_e = ev._interior_box(start)
            ilo = lo_e if ilo is None else np.maximum(ilo, lo_e)
            ihi = hi_e if ihi is None else np.minimum(ihi, hi_e)
        return ilo, ihi

    # --- region payloads ------------------------------------------------
    def begin_round(self):
        """Start a segment round: forget which packs are pinned."""
        self._round_keys = set()

    def _evict_until(self, room_for: int):
        """Drop least-recently-used packs not pinned by the current
        round until ``room_for`` more bytes fit the budget. Returns True
        when they do."""
        def resident():
            return sum(self._packed_bytes.values())
        for key in list(self._packed):
            if resident() + room_for <= self.pack_budget:
                break
            if key in self._round_keys:
                continue
            self._packed.pop(key)
            self._packed_bytes.pop(key)
        return resident() + room_for <= self.pack_budget

    def can_escalate(self):
        # full-grid payloads live in HOST memory (escalated replicas run
        # their segments on the host CPU device), so this budgets RAM
        return (sum(ev.full_grid_bytes() for ev in self.evaluators)
                <= self.full_region_budget)

    def escalate(self, bad, n_rep):
        """Move replicas ``bad`` onto the full-grid payload."""
        if self._full is None or len(self._full) != n_rep:
            self._full = np.zeros(n_rep, dtype=bool)
        bad = np.asarray(bad, dtype=int)
        self._full[bad] = True
        # restart the demotion clock: _calm accumulates for every
        # region-fitting replica, so without this reset a replica whose
        # ENDPOINT bbox fits (a runaway transiting in and out of the
        # grid leaves small endpoint bboxes while its running bbox
        # violates any bounded region) is demoted on the very next
        # assign and re-escalates forever
        if self._calm is not None and len(self._calm) == n_rep:
            self._calm[bad] = 0
        self.full_escalations += len(bad)

    def _full_payload(self, host=False):
        attr = "_full_pay_host" if host else "_full_pay"
        if getattr(self, attr, None) is None:
            grids = [ev._full_region_cached(host=host)[0]
                     for ev in self.evaluators]
            lo, hi = self.full_box
            setattr(self, attr,
                    (tuple(grids), (np.asarray(lo), np.asarray(hi))))
        return getattr(self, attr)

    def payload(self, start, host=False):
        """Device payload for region ``start``: read each evaluator's
        region (through its device LRU), pack to per-cell coefficients
        and fuse into one multi-grid row table — or, when the pack does
        not fit the remaining budget, the tuple of raw region Grids for
        the direct stencil kernels. The sentinel start ``(-1,-1,-1)``
        returns the full-grid escalation payload. Returns
        ``(payload, (interior_lo, interior_hi))``; LRU-cached so
        hysteresis amortizes the pack cost."""
        key = tuple(int(s) for s in start)
        if key == (-1, -1, -1):
            return self._full_payload(host=host)
        if host:
            # bounded region inside a HOST-dispatched group (a mixed
            # group: this set region-bound, another set escalated).
            # Build the raw-region payload directly on the CPU device —
            # reusing the TPU pack here would make dispatch() round-trip
            # a multi-GB table through the tunnel every segment.
            hit = self._host_regions.pop(key, None)
            if hit is None:
                import jax
                self.direct_builds += 1
                grids, ilo, ihi = [], None, None
                with jax.default_device(jax.devices("cpu")[0]):
                    for ev in self.evaluators:
                        g, (lo, hi) = ev._build_region(np.asarray(key))
                        grids.append(g)
                        ilo = lo if ilo is None else np.maximum(ilo, lo)
                        ihi = hi if ihi is None else np.minimum(ihi, hi)
                hit = (tuple(grids), (ilo, ihi))
            self._host_regions[key] = hit
            while len(self._host_regions) > 4:
                self._host_regions.pop(next(iter(self._host_regions)))
            return hit
        self._round_keys.add(key)
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
        # heterogeneous sets (mixed interpolation methods or per-grid
        # oob_k) cannot fuse into one row table — evaluate them with
        # the direct stencil kernels instead of letting the packer raise
        if any(int(g.interp_method) != int(grids[0].interp_method)
               or float(g.oob_k) != float(grids[0].oob_k)
               for g in grids[1:]):
            self.direct_builds += 1
            return (tuple(grids), (ilo, ihi))
        method = int(grids[0].interp_method)
        ncells = int(np.prod(np.asarray(grids[0].counts) - 1))
        kcoef = {0: 8, 1: 64, 2: 64, 3: 216}[method]
        width = len(grids) * kcoef
        value_method = method in (int(InterpolationMethod.TRILINEAR),
                                  int(InterpolationMethod.BSPLINE))
        # value methods fuse slab-by-slab into a 64-lane-padded table
        # (peak = table + one slab); Hermite packs go through per-grid
        # pack + combine (128-lane rows, 2x-table peak)
        row = (-(-width // 64) * 64 if value_method
               else -(-width // 128) * 128)
        nbytes = ncells * row * 4
        dbg = _debug_log()
        if self._evict_until(nbytes):
            if dbg:
                dbg(f"payload BUILD pack key={key} bytes={nbytes}")
            if value_method:
                built = (pack_grids_fused(grids), (ilo, ihi))
            else:
                built = (combine_packed_grids(
                    [pack_grid(g) for g in grids]), (ilo, ihi))
            self._packed[key] = built
            self._packed_bytes[key] = nbytes
            self.packs_built += 1
        else:
            if dbg:
                dbg(f"payload DIRECT key={key} (pack {nbytes} over "
                    f"budget {self.pack_budget})")
            self.direct_builds += 1
            # raw grids live in the evaluators' own device LRUs; do not
            # cache (nor count) them here
            built = (tuple(grids), (ilo, ihi))
        return built

    # --- assignment -----------------------------------------------------
    def assign(self, bounds):
        """Per-replica region starts from in-grid cloud bboxes, with
        hysteresis: keep a replica's previous region while its cloud
        stays inside that region's interior; otherwise (or when a
        crossing retry flagged the replica for re-centering) CENTER a
        region on the cloud (maximal symmetric margin for the coming
        segment). All-outside replicas keep whatever region they have
        (only the restraint branch runs for them)."""
        blo, bhi, any_in = bounds
        ev0 = self.evaluators[0]
        spacing = np.asarray(ev0.stream.spacing)
        origin = np.asarray(ev0.stream.origin)
        counts = np.asarray(ev0.stream.counts)
        shape = np.asarray(ev0.region_shape)
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
        if self._full is None or len(self._full) != n_rep:
            self._full = np.zeros(n_rep, dtype=bool)
        too_big = any_in & np.any(need > shape, axis=1) & ~self._full
        if np.any(too_big):
            if self.can_escalate():
                self.escalate(np.nonzero(too_big)[0], n_rep)
            else:
                i = int(np.argmax(too_big))
                raise ValueError(
                    f"replica {i}'s cloud needs region {tuple(need[i])}"
                    f" > configured {tuple(shape)}; enlarge region_shape")
        # demote full-grid replicas whose cloud has fit a region with
        # >= 8 spare cells per axis for 4 consecutive assignments (a
        # runaway atom momentarily OUTSIDE the grid leaves a small
        # in-grid bbox — instant demotion would churn escalations every
        # time it transits back through)
        fits = any_in & np.all(need <= shape - 16, axis=1)
        if self._calm is None or len(self._calm) != n_rep:
            self._calm = np.zeros(n_rep, dtype=int)
        self._calm = np.where(fits, self._calm + 1, 0)
        demote = self._full & fits & (self._calm >= 4)
        self._full &= ~demote
        mid = (cell_lo + cell_hi + 1) // 2
        max_start = np.maximum(counts - shape, 0)
        centered = np.clip(mid - shape // 2, 0, max_start)
        # UNION-FIRST sharing: when the union of all active clouds fits
        # one region, every active replica gets the SAME start — one
        # group, one resident pack, one region read, regardless of R —
        # and that start is STICKY: it is reused unchanged while it
        # still contains the union, so the pack is rebuilt only when
        # the union bbox actually outgrows the region, not every
        # segment the union's center drifts a cell. Per-replica
        # centered starts would otherwise fragment nearly identical
        # clouds into distinct regions (each fragment costing a
        # multi-MB region read + device transfer — ruinous through a
        # tunneled backend: the transfer bytes are never reclaimed).
        # Crossing-retry violators are excluded: they just outran a
        # region edge and need one centered on THEIR cloud.
        recenter = (self._recenter
                    if self._recenter is not None
                    and len(self._recenter) == n_rep
                    else np.zeros(n_rep, dtype=bool))
        active = any_in & ~self._full & ~recenter
        union_start = None
        if np.any(active):
            u_lo = cell_lo[active].min(axis=0)
            u_hi = cell_hi[active].max(axis=0)
            if np.all(u_hi - u_lo + 1 <= shape):
                prev = self._union_start
                if (prev is not None and np.all(u_lo >= prev)
                        and np.all(u_hi <= prev + shape - 1)):
                    union_start = prev
                else:
                    umid = (u_lo + u_hi + 1) // 2
                    stride = np.maximum(shape // 16, 1)
                    union_start = np.clip(
                        (umid - shape // 2 + stride // 2)
                        // stride * stride, 0, max_start)
                    if not (np.all(u_lo >= union_start) and np.all(
                            u_hi <= union_start + shape - 1)):
                        # lattice snap uncovered the union (margin
                        # thinner than the snap offset): exact center
                        union_start = np.clip(umid - shape // 2, 0,
                                              max_start)
        self._union_start = union_start

        if self._starts is None:
            keep = np.zeros(n_rep, dtype=bool)
            starts = np.where(any_in[:, None], centered, 0)
        else:
            ilo = ihi = None
            for ev in self.evaluators:
                lo_e, hi_e = ev._interior_box(self._starts)
                ilo = lo_e if ilo is None else np.maximum(ilo, lo_e)
                ihi = hi_e if ihi is None else np.minimum(ihi, hi_e)
            keep = (~any_in) | (np.all(blo >= ilo, axis=1)
                                & np.all(bhi <= ihi, axis=1))
            if (self._recenter is not None
                    and len(self._recenter) == n_rep):
                keep &= ~(self._recenter & any_in)
            # a just-demoted replica's stored start is the -1 sentinel:
            # always re-center it
            keep &= ~demote
            starts = np.where(keep[:, None], self._starts, centered)
        if union_start is not None:
            # union mode bypasses per-replica hysteresis: ONE group on
            # the sticky region (splitting actives between an old start
            # and the union start would hold two multi-GB packs or push
            # one group onto the slow direct-stencil fallback)
            starts = np.where(active[:, None], union_start, starts)
        elif np.any(active):
            # REGION-POOL JOINING: the union no longer fits one region,
            # so share the FEWEST regions instead of fragmenting into
            # per-replica centered starts (nearly identical clouds then
            # differ by a cell or two and each fragment costs a region
            # read + device transfer per segment — the measured death
            # spiral at stress scale). Every re-assigned cloud first
            # tries to JOIN an existing region — a kept replica's
            # sticky start or a pool region created this round — and
            # only founds a new (lattice-snapped, so reproducible)
            # region when it fits none with slack.
            slack = np.maximum(shape // 32, 2)
            stride = np.maximum(shape // 16, 1)
            pool = [st for st in np.unique(
                starts[active & keep], axis=0)] if np.any(
                    active & keep) else []
            for i in np.nonzero(active & ~keep)[0]:
                placed = False
                for st in pool:
                    if (np.all(cell_lo[i] >= st + slack)
                            and np.all(cell_hi[i]
                                       <= st + shape - 1 - slack)):
                        starts[i] = st
                        placed = True
                        break
                if not placed:
                    st = np.clip(
                        (mid[i] - shape // 2 + stride // 2)
                        // stride * stride, 0, max_start)
                    if not (np.all(cell_lo[i] >= st)
                            and np.all(cell_hi[i]
                                       <= st + shape - 1)):
                        # snap uncovered the cloud: exact center
                        st = np.clip(mid[i] - shape // 2, 0, max_start)
                    starts[i] = st
                    pool.append(st)
        # crossing-retry violators get max-own-margin regions, but a
        # MASS crossing (a shared region outgrown by the whole drifting
        # batch at once) must not fragment into per-replica cell-offset
        # starts — pool the violators among THEMSELVES (never the
        # region they just outran), demanding a wider slack since
        # theirs are the fast-moving clouds
        rec = recenter & any_in & ~self._full
        if np.count_nonzero(rec) > 1:
            slack2 = np.maximum(shape // 8, 2)
            pool2 = []
            for i in np.nonzero(rec)[0]:
                placed = False
                for st in pool2:
                    if (np.all(cell_lo[i] >= st + slack2)
                            and np.all(cell_hi[i]
                                       <= st + shape - 1 - slack2)):
                        starts[i] = st
                        placed = True
                        break
                if not placed:
                    starts[i] = centered[i]     # founder: exact center
                    pool2.append(centered[i])
        starts = np.where(self._full[:, None], self._FULL, starts)
        self._recenter = None
        self._starts = starts
        return starts

    def check(self, run_bounds, interior, idx):
        """Replica indices (from ``idx``) whose RUNNING in-grid cloud
        bbox (min/max over every step of the segment, so excursions that
        self-reverse are still seen) left ``interior``; replicas whose
        atoms were outside the full grid the whole segment are exempt
        (only the restraint branch ran for them)."""
        blo, bhi, any_in = run_bounds
        ilo, ihi = interior
        ok = ((~any_in[idx])
              | (np.all(blo[idx] >= ilo, axis=1)
                 & np.all(bhi[idx] <= ihi, axis=1)))
        return np.asarray(idx)[~ok]


def _default_step_factory(dt, friction, scheme):
    def factory(force_fn, t, base_args):
        return make_langevin_step(force_fn, base_args.masses, dt,
                                  friction, t, scheme=scheme,
                                  constraints=base_args.constraints)
    return factory


def _default_base_force(base_args, x):
    return energy_and_forces(base_args, [], x)[1]


class StreamedBatchMD:
    """Langevin MD for a batch of replica clouds over file-backed grids.

    Default construction (the mm-layer path): ``evaluators`` are
    co-located :class:`StreamedGridEvaluator`s (one per grid file, e.g.
    charge/ljr/lja over the same box); ``scalings`` one per-atom scaling
    array per evaluator; ``system`` supplies masses/bonded
    terms/constraints. Each replica's cloud must fit one region at a
    time — the batch as a whole may scatter anywhere.

    Generalized construction (what ``api.Context`` delegates to): pass
    ``sets`` (a list of :class:`StreamSet`), a ``step_factory``
    ``(force_fn, temperature, base_args) -> step_fn`` and a
    ``base_force`` ``(base_args, x) -> forces`` for all non-streamed
    terms; ``run(..., base_args=...)`` threads whatever pytree the
    base/step callables need through jit as an argument.
    """

    def __init__(self, evaluators=None, scalings=None, system: System = None,
                 dt: float = 0.001, friction: float = 1.0,
                 scheme: str = "classic", refresh_steps: int = 50, *,
                 sets: Sequence[StreamSet] = None, step_factory=None,
                 base_force=None):
        if sets is None:
            sets = [StreamSet(evaluators, scalings)]
        elif evaluators is not None or scalings is not None:
            raise ValueError("pass either evaluators/scalings or sets")
        if not sets:
            raise ValueError("need at least one StreamSet")
        if int(refresh_steps) < 1:
            raise ValueError("refresh_steps must be >= 1")
        self.sets = list(sets)
        self.system = system
        self.dt = float(dt)
        self.friction = float(friction)
        self.scheme = scheme
        self.refresh_steps = int(refresh_steps)
        self.step_factory = (step_factory if step_factory is not None
                             else _default_step_factory(self.dt,
                                                        self.friction,
                                                        scheme))
        self.base_force = (base_force if base_force is not None
                           else _default_base_force)
        self._runners = {}

    @property
    def evaluators(self):
        return self.sets[0].evaluators

    def _runner(self, n_steps: int, n_total: int):
        """Jitted group-segment runner; region payloads are ARGUMENTS so
        the compiled program is shared by every region (and never embeds
        multi-MB tables as HLO constants). Atoms outside a set's FULL
        grid take that set's full-box restraint (applied once per fused
        set with the set's effective k)."""
        key = (n_steps, n_total)
        run = self._runners.get(key)
        if run is not None:
            return run
        metas = [(np.asarray(s.full_box[0]), np.asarray(s.full_box[1]),
                  float(s.oob_k)) for s in self.sets]
        base_force = self.base_force
        step_factory = self.step_factory

        # subset gather/scatter arrays are ARGUMENTS (gathers), not
        # closure captures: a dense one-hot scatter matrix for a large
        # atom subset baked as an HLO constant would blow the tunneled
        # compiler's ~100 MB program limit (CLAUDE.md jit-closure rule)
        def seg(states, base_args, payloads, scals, temps, gathers):
            dtype = states.positions.dtype
            boxes = [(jnp.asarray(lo, dtype), jnp.asarray(hi, dtype))
                     for lo, hi, _ in metas]

            def sub(x, g):
                return x if g is None else x[g[0]]

            def one(state, t):
                def force_fn(x):
                    f = base_force(base_args, x)
                    for meta, (blo, bhi), pay, sc, g in zip(
                            metas, boxes, payloads, scals, gathers):
                        xi = sub(x, g)
                        if isinstance(pay, tuple):   # direct fallback
                            fr = sum(evaluate_grid(gr, xi, sc[gi]).forces
                                     for gi, gr in enumerate(pay))
                        else:
                            fr = evaluate_multi(pay, xi, sc).forces
                        inside = jnp.all((xi >= blo) & (xi <= bhi),
                                         axis=1)
                        dev = jnp.where(
                            xi < blo, xi - blo,
                            jnp.where(xi > bhi, xi - bhi, 0.0))
                        fi = jnp.where(inside[:, None], fr,
                                       -meta[2] * dev)
                        f = f + (fi if g is None else g[1] @ fi)
                    return f

                step = step_factory(force_fn, t, base_args)

                # carry RUNNING per-set in-grid bboxes so mid-segment
                # region excursions are detected even when the region
                # restraint (or an exit from the full grid) pulls the
                # atom back before the segment ends
                def body(carry, _):
                    st, bbs = carry
                    st2 = step(st)
                    nb = []
                    for g, (blo, bhi), (rlo, rhi) in zip(gathers, boxes,
                                                         bbs):
                        l2, h2 = _cloud_bounds(sub(st2.positions, g),
                                               blo, bhi)
                        nb.append((jnp.minimum(rlo, l2),
                                   jnp.maximum(rhi, h2)))
                    return (st2, tuple(nb)), None

                bb0 = tuple(
                    _cloud_bounds(sub(state.positions, g), blo, bhi)
                    for g, (blo, bhi) in zip(gathers, boxes))
                (st, bbs), _ = jax.lax.scan(
                    body, (state, bb0), None, length=n_steps, unroll=4)
                return st, bbs
            out, run_bbs = jax.vmap(
                one, in_axes=(0, 0))(states, temps)
            per_set = []
            for si, (g, (blo, bhi)) in enumerate(zip(gathers, boxes)):
                xi = (out.positions if g is None
                      else out.positions[:, g[0]])
                fin_lo, fin_hi = _cloud_bounds(xi, blo, bhi)
                rlo, rhi = run_bbs[si]
                per_set.append(jnp.concatenate(
                    [fin_lo, fin_hi, rlo, rhi], axis=1))   # [R, 12]
            return out, jnp.stack(per_set, axis=1)         # [R, S, 12]

        run = jax.jit(seg)
        self._runners[key] = run
        return run

    def _gathers(self, n_total):
        """Per-set (atom_idx, one-hot scatter) device arrays, or None
        for whole-system sets; built once per n_total and passed to the
        runner as arguments."""
        key = ("gathers", n_total)
        g = self._runners.get(key)
        if g is None:
            g = []
            for s in self.sets:
                w = s.scatter_matrix(n_total)
                if s.atom_idx is None or w is None:
                    g.append(None)
                else:
                    g.append((jnp.asarray(s.atom_idx), jnp.asarray(w)))
            g = tuple(g)
            self._runners[key] = g
        return g

    def run(self, states: MDState, temperatures, n_steps: int,
            base_args=None, progress=None) -> MDState:
        """Advance every replica ``n_steps``; returns the new batch.

        Host traffic per segment is O(R) floats (in-grid cloud bboxes
        computed on device), never the position tensor; the common
        all-replicas-one-region case runs the segment with zero
        gather/scatter dispatches. A replica whose cloud outruns its
        region mid-segment (e.g. a charge-fusion-accelerated atom) is
        detected at the segment boundary and the segment re-runs from
        its saved start in quarter-length chunks with the violators'
        regions re-centered on their current clouds — only a cloud
        faster than the region margin over ~a dozen steps still raises.
        """
        if base_args is None:
            base_args = self.system
        n_rep = states.positions.shape[0]
        dtype = states.positions.dtype
        temps = np.broadcast_to(np.asarray(temperatures), (n_rep,))
        bounds = []
        for s in self.sets:
            full_lo, full_hi = s.full_box
            l0, h0 = _CLOUD_BOUNDS_JIT(s.take(states.positions),
                                       jnp.asarray(full_lo, dtype),
                                       jnp.asarray(full_hi, dtype))
            l0, h0 = np.asarray(l0), np.asarray(h0)
            bounds.append((l0, h0, np.isfinite(l0).all(axis=1)))
        scal_args = tuple(jnp.asarray(s.scal_stack, dtype)
                          for s in self.sets)
        done = 0
        while done < n_steps:
            k = min(self.refresh_steps, n_steps - done)
            states, bounds = self._run_chunk(states, bounds, temps,
                                             scal_args, base_args, k,
                                             depth=0)
            done += k
            if progress is not None:
                progress(done, n_steps)
        return states

    def _run_chunk(self, states, bounds, temps, scal_args, base_args, k,
                   depth):
        # ALL retry work happens OUTSIDE the except block: while the
        # handler is active the exception's traceback pins the failed
        # _segment frame — including its multi-GB payload tuple — so a
        # pack built during an in-handler retry would stack on top of
        # packs the LRU believes it has evicted (measured: 8.3 GB of
        # "evicted" stress packs stayed device-resident through the
        # retry and a sticky-union re-pack then exhausted HBM)
        bad = None
        try:
            return self._segment(states, bounds, temps, scal_args,
                                 base_args, k)
        except _RegionCrossing as rc:
            dbg = _debug_log()
            if dbg:
                dbg(f"crossing k={k} depth={depth} bad={rc.bad.tolist()}")
            if ((depth >= 2 or k < 4)
                    and not all(s.can_escalate() for s in self.sets)):
                raise
            bad = rc.bad
        n_rep = states.positions.shape[0]
        if depth >= 2 or k < 4:
            # retry ladder exhausted: the cloud outruns any bounded
            # region (a capped-well runaway) — move the violators
            # onto the full-grid payload and re-run; they cannot
            # violate again, so the recursion strictly shrinks
            for s in self.sets:
                s.escalate(bad, n_rep)
            return self._run_chunk(states, bounds, temps, scal_args,
                                   base_args, k, depth)
        # drop the violators' hysteresis entries so the retry
        # actually RE-CENTERS their regions on the current clouds
        # (the segment-start bbox is usually still inside the old
        # interior, so hysteresis alone would keep the old region
        # and the retry would rely on shorter chunks only)
        recenter = np.zeros(n_rep, dtype=bool)
        recenter[bad] = True
        for s in self.sets:
            if s._starts is not None:
                s._recenter = recenter
        sub = max(k // 4, 1)
        left = k
        while left > 0:
            piece = min(sub, left)
            states, bounds = self._run_chunk(states, bounds, temps,
                                             scal_args, base_args,
                                             piece, depth + 1)
            left -= piece
        return states, bounds

    def _segment(self, states, bounds, temps, scal_args, base_args, k):
        n_rep = states.positions.shape[0]
        n_total = states.positions.shape[1]
        dtype = states.positions.dtype
        runner = self._runner(k, n_total)
        starts = [s.assign(bounds[si]) for si, s in enumerate(self.sets)]
        combo = np.hstack(starts)                         # [R, 3S]
        uniq, inverse = np.unique(combo, axis=0, return_inverse=True)
        dbg = _debug_log()
        if dbg:
            dbg(f"segment k={k} groups={uniq.shape[0]} "
                f"uniq={uniq.tolist()} "
                f"resident={[sum(s._packed_bytes.values()) for s in self.sets]} "
                f"keys={[list(s._packed) for s in self.sets]}")
        # a new round may pack fresh regions: unpin last round's packs
        # (they stay cached until the budget needs the room)
        for s in self.sets:
            s.begin_round()

        def group_payloads(u, host=False):
            payloads, interiors = [], []
            for si, s in enumerate(self.sets):
                pay, interior = s.payload(uniq[u][3 * si:3 * si + 3],
                                          host=host)
                payloads.append(pay)
                interiors.append(interior)
            return tuple(payloads), interiors

        def dispatch(u, subs, temps_sub):
            """Run one group's segment. Full-grid escalation groups
            (sentinel start) run on the HOST CPU device: their multi-GB
            payload must never share HBM with the resident region packs
            (measured to exhaust a 16 GB chip at stress scale), and on
            tunneled backends the upload alone is prohibitive. The SAME
            jitted runner compiles a CPU executable via committed
            argument placement, so semantics are identical; only the
            (runaway, rare) escalated replicas pay host speed."""
            host = bool((np.asarray(uniq[u]) < 0).any())
            payloads, interiors = group_payloads(u, host=host)
            t_sub = jnp.asarray(temps_sub, dtype)
            gathers = self._gathers(n_total)
            if host:
                cpu = jax.devices("cpu")[0]
                main_dev = next(iter(states.positions.devices()))
                args = jax.device_put(
                    (subs, base_args, payloads, scal_args, t_sub,
                     gathers), cpu)
                out, b = runner(*args)
                out = jax.device_put(out, main_dev)
            else:
                out, b = runner(subs, base_args, payloads, scal_args,
                                t_sub, gathers)
            return out, b, interiors

        if uniq.shape[0] == 1:
            states, b, interiors = dispatch(0, states, temps)
            bset = np.asarray(b)                  # ONE [R,S,12] download
            perm = [np.arange(n_rep)]
            group_interiors = [interiors]
        else:
            perm, outs, bparts, group_interiors = [], [], [], []
            # largest groups first: they claim the pack budget, so any
            # direct-stencil fallback lands on the fewest replicas
            group_idx = [np.nonzero(inverse == u)[0]
                         for u in range(uniq.shape[0])]
            order_u = sorted(range(uniq.shape[0]),
                             key=lambda u: -len(group_idx[u]))
            for u in order_u:
                idx = group_idx[u]
                nb = 1 << (len(idx) - 1).bit_length()
                pad = np.concatenate(
                    [idx, np.repeat(idx[:1], nb - len(idx))])
                subs = jax.tree.map(lambda x: x[pad], states)
                out, b, interiors = dispatch(u, subs, temps[pad])
                perm.append(idx)
                outs.append(jax.tree.map(lambda x: x[:len(idx)], out))
                bparts.append(np.asarray(b)[:len(idx)])
                group_interiors.append(interiors)
            order = np.argsort(np.concatenate(perm))
            states = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0)[order], *outs)
            bset = np.concatenate(bparts, axis=0)[order]
        # the check sees the RUNNING bbox (every mid-segment excursion);
        # the next assignment sees the final bbox
        bad_all = []
        fins = []
        for si, s in enumerate(self.sets):
            fin, run_b = _unpack_set_bounds(bset[:, si, :])
            fins.append(fin)
            for gi, idx in enumerate(perm):
                bad = s.check(run_b, group_interiors[gi][si], idx)
                if bad.size and s._full is not None:
                    # Replicas already on the full-grid payload are
                    # EXEMPT from this set's containment check: their
                    # segment ran on the exact full field, so there is
                    # nothing better for a retry to stream in. Without
                    # this, an f32 running bbox grazing the f64 full-box
                    # corner (a half-ulp band OOB-restrained atoms cross
                    # every segment) re-flags the replica after every
                    # escalate — escalate() is a no-op for it — and
                    # _run_chunk recurses at constant depth forever
                    # (the r5 canonical streamed-triquintic bare
                    # RecursionError).
                    bad = bad[~s._full[bad]]
                if bad.size:
                    bad_all.append(bad)
        if bad_all:
            bad = np.unique(np.concatenate(bad_all))
            raise _RegionCrossing(
                f"replicas {bad.tolist()} crossed their streamed "
                f"region boundary during a {k}-step segment; lower "
                "refresh_steps or enlarge region_shape", bad)
        return states, fins
