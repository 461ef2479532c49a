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
region mid-segment is detected after the segment and reported, exactly
like the single-cloud Context streaming path."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..io.streaming import StreamedGridEvaluator, evaluate_streamed
from .integrators import MDState, make_langevin_step, run_segment
from .system import System, energy_and_forces


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
        c0 = evaluators[0].stream.counts
        for ev in evaluators[1:]:
            if (tuple(ev.stream.counts) != tuple(c0)
                    or tuple(ev.region_shape)
                    != tuple(evaluators[0].region_shape)):
                raise ValueError("evaluators must be co-located with "
                                 "identical region shapes")
        self.evaluators = list(evaluators)
        self.scalings = [np.asarray(s) for s in scalings]
        self.system = system
        self.dt = float(dt)
        self.friction = float(friction)
        self.scheme = scheme
        self.refresh_steps = int(refresh_steps)
        self._runners = {}

    def _runner(self, n_steps: int):
        """Jitted group-segment runner; region grids are ARGUMENTS so the
        compiled program is shared by every region (and never embeds
        multi-MB tables as HLO constants)."""
        run = self._runners.get(n_steps)
        if run is not None:
            return run
        ev0 = self.evaluators[0]
        full_lo, full_hi = ev0.full_box
        oob_k = ev0.oob_k
        dt, friction, scheme = self.dt, self.friction, self.scheme

        def seg(states, system, grids, scalings, temps):
            def one(state, t):
                def force_fn(x):
                    f = energy_and_forces(system, [], x)[1]
                    for g, s in zip(grids, scalings):
                        f = f + evaluate_streamed(
                            g, full_lo, full_hi, x, s, oob_k).forces
                    return f
                step = make_langevin_step(
                    force_fn, system.masses, dt, friction, t,
                    scheme=scheme, constraints=system.constraints)
                return run_segment(step, state, n_steps)
            return jax.vmap(one)(states, temps)

        run = jax.jit(seg)
        self._runners[n_steps] = run
        return run

    def run(self, states: MDState, temperatures, n_steps: int) -> MDState:
        """Advance every replica ``n_steps``; returns the new batch."""
        n_rep = states.positions.shape[0]
        dtype = states.positions.dtype
        temps = np.broadcast_to(np.asarray(temperatures), (n_rep,))
        ev0 = self.evaluators[0]
        done = 0
        while done < n_steps:
            k = min(self.refresh_steps, n_steps - done)
            runner = self._runner(k)
            pos = np.asarray(states.positions)
            starts = np.stack([ev0._aligned_region_for(p) for p in pos])
            uniq, inverse = np.unique(starts, axis=0, return_inverse=True)
            perm, outs, interiors = [], [], []
            for u in range(uniq.shape[0]):
                idx = np.nonzero(inverse == u)[0]
                grids, scals = [], []
                ilo, ihi = None, None
                for ev, sc in zip(self.evaluators, self.scalings):
                    g, (lo, hi) = ev._region_cached(uniq[u])
                    grids.append(g)
                    scals.append(jnp.asarray(sc, dtype))
                    # tightest interior across methods' halos
                    ilo = lo if ilo is None else np.maximum(ilo, lo)
                    ihi = hi if ihi is None else np.minimum(ihi, hi)
                b = 1 << (len(idx) - 1).bit_length()
                pad = np.concatenate([idx,
                                      np.repeat(idx[:1], b - len(idx))])
                sub = jax.tree.map(lambda x: x[pad], states)
                out = runner(sub, self.system, tuple(grids), tuple(scals),
                             jnp.asarray(temps[pad], dtype))
                perm.append(idx)
                outs.append(jax.tree.map(lambda x: x[:len(idx)], out))
                interiors.append((ilo, ihi))
            order = np.argsort(np.concatenate(perm))
            states = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0)[order], *outs)
            done += k
            self._check_bounds(np.asarray(states.positions),
                               np.concatenate(perm), interiors, perm)
        return states

    def _check_bounds(self, pos, flat_idx, interiors, perm):
        """Every atom must end the segment inside its replica's region
        interior or outside the full grid (restraint branch); anything
        else means the cloud outran the region mid-segment."""
        flo, fhi = self.evaluators[0].full_box
        for (ilo, ihi), idx in zip(interiors, perm):
            p = pos[idx]
            ok = (np.all((p >= ilo) & (p <= ihi), axis=2)
                  | np.any((p < flo) | (p > fhi), axis=2))
            if not np.all(ok):
                bad = idx[~np.all(ok, axis=1)]
                raise RuntimeError(
                    f"replicas {bad.tolist()} crossed their streamed "
                    f"region boundary during a {self.refresh_steps}-step "
                    "segment; lower refresh_steps or enlarge "
                    "region_shape")
