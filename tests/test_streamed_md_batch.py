"""StreamedBatchMD: scattered replica batches stepping on out-of-core
grids must match the in-memory batched runner (same segment structure),
with regions assigned per replica and bounds violations detected."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmmgridforce_tpu.grid import InterpolationMethod
from openmmgridforce_tpu.io import write_grid_tiled
from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator
from openmmgridforce_tpu.mm import (GridBinding, StreamedBatchMD,
                                    load_inpcrd, load_prmtop,
                                    make_md_runner, system_from_amber)
from openmmgridforce_tpu.mm.integrators import MDState
from openmmgridforce_tpu.ops import gridgen

DATA = "/root/reference/python/prmtopcrd"
RNG = np.random.default_rng(31)


def _setup(tmp_path, region_shape=(26, 26, 26)):
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    lig_x = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    lig_x = lig_x - lig_x.min(0)  # local frame
    system = system_from_amber(lig, dtype=np.float64)

    # gentle synthetic receptor field over a box big enough to scatter in
    counts = (33, 33, 33)
    spacing = (0.1,) * 3
    origin = (-0.8, -0.8, -0.8)
    rec = RNG.uniform(-0.5, 2.2, (15, 3))
    q = RNG.uniform(-0.2, 0.2, 15)
    grids, evs, scals = [], [], []
    for gt in ["charge", "lja"]:
        g = gridgen.generate_grid(counts, spacing, origin, gt, rec, q,
                                  np.full(15, 0.32), np.full(15, 0.4),
                                  dtype=np.float64)
        path = str(tmp_path / f"{gt}.tiled")
        write_grid_tiled(path, g, tile_size=8)
        grids.append(g)
        evs.append(StreamedGridEvaluator(path, InterpolationMethod.BSPLINE,
                                         region_shape=region_shape))
        scals.append(np.asarray(gridgen.auto_scaling_factors(
            gt, lig.charges, lig.sigmas, lig.epsilons)))
    # f32 tiled files: carry the SAME f32-rounded values in the in-memory
    # reference so the comparison isolates the region mechanics
    from openmmgridforce_tpu.grid import Grid
    grids = [Grid.create(np.asarray(g.vals, np.float32).astype(np.float64),
                         spacing, origin,
                         interp_method=InterpolationMethod.BSPLINE,
                         dtype=np.float64) for g in grids]

    # 6 replicas scattered across different regions (+1 fully outside)
    offsets = np.array([[0.0, 0.0, 0.0], [1.3, 0.1, 0.2],
                        [0.1, 1.4, 0.1], [1.2, 1.3, 1.2],
                        [0.2, 0.1, 1.4], [4.0, 4.0, 4.0]])
    pos = np.stack([lig_x + off for off in offsets])
    states = MDState(
        positions=jnp.asarray(pos, jnp.float64),
        velocities=jnp.zeros_like(jnp.asarray(pos, jnp.float64)),
        key=jax.vmap(jax.random.PRNGKey)(jnp.arange(6)))
    return system, grids, evs, scals, states


def test_streamed_batch_matches_in_memory(tmp_path):
    # region smaller than the scattered clouds' union: forces genuine
    # per-replica regions + grouping (union-first sharing would
    # otherwise collapse this layout into one shared region)
    system, grids, evs, scals, states = _setup(tmp_path,
                                               region_shape=(20, 20, 20))

    md = StreamedBatchMD(evs, scals, system, dt=0.0005, friction=2.0,
                         refresh_steps=10)
    got = md.run(states, 0.0, 30)   # T=0: deterministic (no noise)

    # in-memory reference uses the SAME fused-packed representation the
    # streamed runner packs its regions into (restraint-once semantics)
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid)
    run_mem = make_md_runner(10, dt=0.0005, friction=2.0)
    fused = combine_packed_grids([pack_grid(g) for g in grids])
    bindings = [GridBinding(grid=fused,
                            scaling=jnp.asarray(np.stack(scals)))]
    want = states
    for _ in range(3):
        want = run_mem(want, system, bindings,
                       jnp.zeros((6,), jnp.float64))

    # several distinct regions were actually streamed
    assert evs[0].region_misses >= 3
    # replicas 0-4 (in-grid): trajectory parity to f64 noise. Replica 5
    # starts fully outside and BOUNCES off the stiff k=1e4 restraint
    # back across the box boundary — the inside/outside branch there is
    # discontinuous, so the f32 region values seed chaotic divergence
    # (same physics as the reference's OOB branch); require only that
    # it stays finite and near the in-memory trajectory.
    # (observed ~6e-6 max: f32 tile values evaluated in the region
    # frame vs f64 positions on the full grid; a wrong-region or
    # wrong-restraint bug shows up at 1e-2+)
    np.testing.assert_allclose(np.asarray(got.positions)[:5],
                               np.asarray(want.positions)[:5],
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.velocities)[:5],
                               np.asarray(want.velocities)[:5],
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.positions)[5],
                               np.asarray(want.positions)[5],
                               rtol=0, atol=0.05)


def test_streamed_batch_bounds_violation(tmp_path):
    """With full-grid escalation disabled (budget 0), a cloud that
    outruns its region must still raise."""
    system, grids, evs, scals, states = _setup(tmp_path)
    from openmmgridforce_tpu.mm.streamed_md import StreamSet
    # huge velocities: clouds outrun their regions within one segment
    states = MDState(
        positions=states.positions,
        velocities=jnp.full_like(states.positions, 80.0),
        key=states.key)
    md = StreamedBatchMD(
        sets=[StreamSet(evs, scals, full_region_budget_bytes=0)],
        system=system, dt=0.001, friction=0.1, refresh_steps=20)
    with pytest.raises(RuntimeError, match="crossed their streamed"):
        md.run(states, 0.0, 20)


def test_streamed_batch_escalates_runaway_to_full_grid(tmp_path):
    """By default a cloud that outruns every bounded region ESCALATES to
    the whole-grid payload (direct stencil, containment vacuous) instead
    of raising — the reference's tiled MD never fails either (it
    re-prepares tiles every step). The trajectory must match the
    in-memory run on the same grids."""
    system, grids, evs, scals, states = _setup(tmp_path)
    # one replica fired fast enough to outrun its region within the
    # retry ladder; the rest stay tame
    v = np.zeros_like(np.asarray(states.positions))
    v[1] = 40.0
    states = MDState(positions=states.positions,
                     velocities=jnp.asarray(v, jnp.float64),
                     key=states.key)
    md = StreamedBatchMD(evs, scals, system, dt=0.001, friction=0.1,
                         refresh_steps=20)
    got = md.run(states, 0.0, 40)    # T=0: deterministic
    assert all(s.full_escalations > 0 for s in md.sets)
    assert np.isfinite(np.asarray(got.positions)).all()

    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid)
    run_mem = make_md_runner(20, dt=0.001, friction=0.1)
    fused = combine_packed_grids([pack_grid(g) for g in grids])
    bindings = [GridBinding(grid=fused,
                            scaling=jnp.asarray(np.stack(scals)))]
    want = states
    for _ in range(2):
        want = run_mem(want, system, bindings,
                       jnp.zeros((6,), jnp.float64))
    # the runaway bounces off the discontinuous full-box restraint
    # branch; compare the tame replicas tightly and the runaway loosely
    tame = [0, 2, 3, 4, 5]
    np.testing.assert_allclose(np.asarray(got.positions)[tame],
                               np.asarray(want.positions)[tame],
                               rtol=0, atol=1e-4)


def test_streamed_batch_detects_self_reversing_excursion(tmp_path):
    """An atom that leaves its region mid-segment and is pushed back by
    the restraint before the segment ends must STILL be detected (the
    containment check sees the RUNNING bbox, not just the endpoint)."""
    system, grids, evs, scals, states = _setup(tmp_path)
    # replica 0: fire one atom outward fast enough to exit the region,
    # with low friction so the oscillation brings it back in-segment
    v = np.zeros_like(np.asarray(states.positions))
    v[0, 0] = [6.0, 0.0, 0.0]     # nm/ps
    states = MDState(positions=states.positions,
                     velocities=jnp.asarray(v, jnp.float64),
                     key=states.key)
    from openmmgridforce_tpu.mm.streamed_md import StreamSet
    md = StreamedBatchMD(
        sets=[StreamSet(evs, scals, full_region_budget_bytes=0)],
        system=system, dt=0.001, friction=0.2, refresh_steps=400)
    with pytest.raises(RuntimeError, match="crossed their streamed"):
        md.run(states, 0.0, 400)


def test_union_sharing_one_region(tmp_path):
    """Nearly identical replica clouds (the REMD/stress-bench layout:
    one pose + thermal jitter) must share ONE region — one file read,
    one resident pack — not fragment into per-replica regions that
    differ by a cell. Region reads are host->device transfers, so the
    fragmentation this guards against is the dominant cost (and, on
    tunneled backends, an unreclaimable host-memory cost) at scale."""
    system, grids, evs, scals, states = _setup(tmp_path)
    pos = np.asarray(states.positions)
    pos = np.stack([pos[0] + RNG.normal(0, 0.01, pos[0].shape)
                    for _ in range(6)])
    states = MDState(positions=jnp.asarray(pos, jnp.float64),
                     velocities=jnp.zeros_like(states.velocities),
                     key=states.key)
    md = StreamedBatchMD(evs, scals, system, dt=0.0005, friction=2.0,
                         refresh_steps=10)
    md.run(states, 0.0, 30)
    sset = md.sets[0]
    assert np.unique(sset._starts, axis=0).shape[0] == 1, \
        "jittered copies of one pose must share one region"
    # one miss per evaluator for the whole 3-segment run
    assert evs[0].region_misses == 1
    assert sset.packs_built <= 1


def test_streamed_subset_atoms_matches_zero_scaled(tmp_path):
    """A StreamSet acting on an atom SUBSET (gather + one-hot scatter
    through the jitted runner) must match an in-memory run where the
    same grid acts on all atoms with zero scaling outside the subset
    (exact equivalence while every atom stays inside the grid)."""
    system, grids, evs, scals, states = _setup(tmp_path)
    from openmmgridforce_tpu.mm.streamed_md import StreamSet
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid)
    idx = np.arange(20)
    states2 = jax.tree.map(lambda x: x[:2], states)
    md = StreamedBatchMD(
        sets=[StreamSet([evs[0]], [np.asarray(scals[0])[idx]],
                        atom_indices=idx)],
        system=system, dt=0.0005, friction=2.0, refresh_steps=10)
    got = md.run(states2, 0.0, 20)

    scal_full = np.zeros_like(scals[0])
    scal_full[idx] = np.asarray(scals[0])[idx]
    fused = combine_packed_grids([pack_grid(grids[0])])
    bindings = [GridBinding(grid=fused,
                            scaling=jnp.asarray(scal_full[None]))]
    run_mem = make_md_runner(10, dt=0.0005, friction=2.0)
    want = states2
    for _ in range(2):
        want = run_mem(want, system, bindings,
                       jnp.zeros((2,), jnp.float64))
    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(want.positions),
                               rtol=0, atol=1e-4)


def test_mixed_group_escalated_and_bounded_sets(tmp_path):
    """A replica can be escalated in ONE StreamSet (its cloud outgrows
    that set's region) while staying region-bound in another with a
    bigger region. The group then dispatches on the host, and the
    bounded set's payload must come from the host raw-region branch
    (payload(host=True)) — falling through to the TPU pack would
    round-trip a multi-GB table through the tunnel every segment. The
    trajectory must still match the in-memory reference run."""
    system, grids, evs, scals, states = _setup(tmp_path)
    from openmmgridforce_tpu.mm.streamed_md import StreamSet
    # set A: region far smaller than the ligand cloud -> every in-grid
    # replica escalates to the full grid; set B: room to spare
    ev_a = StreamedGridEvaluator(str(tmp_path / "charge.tiled"),
                                 InterpolationMethod.BSPLINE,
                                 region_shape=(12, 12, 12))
    set_a = StreamSet([ev_a], [scals[0]])
    set_b = StreamSet([evs[1]], [scals[1]])
    states1 = jax.tree.map(lambda x: x[:1], states)   # one tame replica
    md = StreamedBatchMD(sets=[set_a, set_b], system=system, dt=0.0005,
                         friction=2.0, refresh_steps=10)
    got = md.run(states1, 0.0, 30)
    assert set_a.full_escalations >= 1
    assert set_b.full_escalations == 0
    assert len(set_b._host_regions) >= 1, \
        "bounded set in a host group must use the host raw-region path"

    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid)
    fused = combine_packed_grids([pack_grid(g) for g in grids])
    bindings = [GridBinding(grid=fused,
                            scaling=jnp.asarray(np.stack(scals)))]
    run_mem = make_md_runner(10, dt=0.0005, friction=2.0)
    want = states1
    for _ in range(3):
        want = run_mem(want, system, bindings,
                       jnp.zeros((1,), jnp.float64))
    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(want.positions),
                               rtol=0, atol=1e-4)


def test_region_pool_joins_clusters(tmp_path):
    """When the GLOBAL union of clouds no longer fits one region,
    assignment must still share the fewest regions (one per spatial
    cluster), not fragment nearly identical clouds into per-replica
    centered starts differing by a cell — at stress scale each fragment
    costs a region read + device transfer per segment (the measured
    death spiral). Starts must also be sticky under jitter."""
    system, grids, evs, scals, states = _setup(tmp_path,
                                               region_shape=(20, 20, 20))
    from openmmgridforce_tpu.mm.streamed_md import StreamSet
    s = StreamSet(evs, scals)
    c0 = np.array([0.3, 0.3, 0.3])
    c1 = c0 + 1.5            # 15 cells away: union needs > 20 cells
    centers = np.array([c0 + 0.01 * i for i in range(3)]
                       + [c1 + 0.01 * i for i in range(3)])
    ones = np.ones(6, dtype=bool)
    starts = s.assign((centers - 0.05, centers + 0.05, ones))
    assert np.unique(starts, axis=0).shape[0] == 2, \
        "two clusters must share exactly two regions"
    # sticky under jitter: a re-assign with slightly moved clouds keeps
    # both regions unchanged (hysteresis + pool reuse)
    starts2 = s.assign((centers - 0.06, centers + 0.04, ones))
    assert np.array_equal(np.asarray(starts), np.asarray(starts2))


def test_escalation_survives_accumulated_calm(tmp_path):
    """A replica escalated to the full-grid payload must STAY there for
    several rounds even when its endpoint bbox fits a region: the
    demotion clock (_calm) accumulates during every calm segment, so
    without a reset at escalation a runaway whose endpoint cloud is
    small (it transits in and out of the grid) was demoted on the very
    next assign and re-escalated forever (observed as an infinite
    escalate/demote recursion at stress scale)."""
    system, grids, evs, scals, states = _setup(tmp_path,
                                               region_shape=(30, 30, 30))
    from openmmgridforce_tpu.mm.streamed_md import StreamSet
    s = StreamSet(evs, scals)
    # tight endpoint bboxes well inside the grid (the runaway's
    # signature: small ENDPOINT cloud, violating RUNNING cloud)
    c = np.asarray([[0.4, 0.4, 0.4], [1.2, 1.2, 1.2]])
    bounds = (c - 0.05, c + 0.05, np.ones(2, dtype=bool))
    for _ in range(6):                # accumulate demotion credit
        s.assign(bounds)
    assert s._calm.min() >= 4         # the pre-fix hazard condition
    s.escalate([1], 2)
    for _ in range(3):                # < 4 fitting rounds: still full
        starts = s.assign(bounds)
        assert tuple(starts[1]) == (-1, -1, -1)
        assert tuple(starts[0]) != (-1, -1, -1)
    s.assign(bounds)                  # 4th fitting round: demoted
    assert tuple(s.assign(bounds)[1]) != (-1, -1, -1)


def test_region_crossing_retry_recenters(tmp_path):
    """After a _RegionCrossing the violating replica's region must be
    RE-CENTERED on its current cloud during the retry, even though the
    segment-start bbox is still inside the old interior (where hysteresis
    alone would keep the old region and rely only on shorter chunks)."""
    system, grids, evs, scals, states = _setup(tmp_path)
    md = StreamedBatchMD(evs, scals, system, dt=0.0005, friction=2.0,
                         refresh_steps=10)
    md.run(states, 0.0, 10)              # populate region hysteresis
    sset = md.sets[0]

    # fabricate a cloud bbox nudged 3 cells (+0.3 nm) in x but still
    # inside the shared region's interior
    from openmmgridforce_tpu.mm.streamed_md import _cloud_bounds
    full_lo, full_hi = evs[0].full_box
    lo, hi = _cloud_bounds(jnp.asarray(states.positions),
                           jnp.asarray(full_lo), jnp.asarray(full_hi))
    blo, bhi = np.asarray(lo).copy(), np.asarray(hi).copy()
    any_in = np.isfinite(blo).all(axis=1)
    blo[0, 0] += 0.3
    bhi[0, 0] += 0.3
    bounds = (blo, bhi, any_in)

    s1 = sset.assign(bounds)
    # this layout's union fits one region: in-grid replicas share a
    # single sticky start
    assert np.unique(s1[any_in], axis=0).shape[0] == 1
    shared = s1[any_in][0].copy()
    s1b = sset.assign(bounds)
    assert np.array_equal(s1b, s1), "sticky start must not drift"

    # now mark replica 0 as a crossing violator (what _run_chunk does)
    sset._recenter = np.zeros(len(any_in), dtype=bool)
    sset._recenter[0] = True
    s2 = sset.assign(bounds)
    assert not np.array_equal(s2[0], shared), \
        "violator's region must re-center on its current cloud"
    assert np.array_equal(s2[1:], s1[1:]), \
        "non-violators keep the shared region"
    assert sset._recenter is None, "recenter request is one-shot"


def test_pack_budget_total_fallback_matches(tmp_path):
    """``pack_budget_bytes`` bounds the TOTAL resident pack bytes: with
    room for exactly one region pack, the largest concurrent group packs
    and every other group falls back to the direct stencil kernels —
    trajectories must match the all-packed run (this is the stress-scale
    OOM guard: a lone crossing-retry straggler must never double a
    multi-GB pack footprint)."""
    system, grids, evs, scals, states = _setup(tmp_path)
    from openmmgridforce_tpu.mm.streamed_md import StreamSet

    one_pack = 25 ** 3 * 128 * 4     # ncells x padded(2x64) lanes x f32
    md_small = StreamedBatchMD(
        sets=[StreamSet(evs, scals,
                        pack_budget_bytes=int(one_pack * 1.5))],
        system=system, dt=0.0005, friction=2.0, refresh_steps=10)
    got = md_small.run(states, 0.0, 30)   # T=0: deterministic
    sset = md_small.sets[0]
    assert len(sset._packed) == 1, "only one group may hold a pack"
    assert sum(sset._packed_bytes.values()) <= int(one_pack * 1.5)

    md_big = StreamedBatchMD(evs, scals, system, dt=0.0005,
                             friction=2.0, refresh_steps=10)
    want = md_big.run(states, 0.0, 30)
    assert all(len(s._packed) > 1 for s in md_big.sets)
    # packed-row vs direct-stencil evaluation differ only in f64
    # contraction order
    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(want.positions),
                               rtol=0, atol=1e-6)


def test_full_payload_replica_exempt_from_check(tmp_path, monkeypatch):
    """A replica on the full-grid escalation payload must be EXEMPT from
    the containment check: its segment ran on the exact full field, so a
    re-flag (e.g. the f32 running bbox grazing the f64 full-box corner —
    a half-ulp band OOB-restrained atoms cross every segment) would make
    escalate() a no-op and _run_chunk recurse at constant depth forever
    (the r5 canonical streamed-triquintic bare RecursionError). With the
    exemption, a permanently-flagged replica escalates ONCE and the run
    completes."""
    system, grids, evs, scals, states = _setup(tmp_path)
    from openmmgridforce_tpu.mm.streamed_md import StreamSet

    sset = StreamSet(evs, scals, full_region_budget_bytes=1 << 30)
    md = StreamedBatchMD(sets=[sset], system=system, dt=0.0005,
                         friction=2.0, refresh_steps=10)

    real_check = StreamSet.check

    def paranoid_check(self, run_bounds, interior, idx):
        bad = set(np.asarray(real_check(self, run_bounds, interior,
                                        idx)).tolist())
        # simulate the boundary artifact: replica 0 always "violates"
        # whenever it is in this group
        if 0 in np.asarray(idx):
            bad.add(0)
        return np.asarray(sorted(bad), dtype=int)

    monkeypatch.setattr(StreamSet, "check", paranoid_check)
    got = md.run(states, 0.0, 30)      # must terminate, not recurse
    assert bool(sset._full[0]), "replica 0 should have escalated once"
    assert np.isfinite(np.asarray(got.positions)[:5]).all()

    # parity: the escalated replica ran on the exact full grid — its
    # trajectory must match the unmocked engine's (same physics, since
    # full-grid evaluation has no region approximation)
    monkeypatch.setattr(StreamSet, "check", real_check)
    md2 = StreamedBatchMD(
        sets=[StreamSet(evs, scals, full_region_budget_bytes=1 << 30)],
        system=system, dt=0.0005, friction=2.0, refresh_steps=10)
    want = md2.run(states, 0.0, 30)
    np.testing.assert_allclose(np.asarray(got.positions)[:5],
                               np.asarray(want.positions)[:5],
                               rtol=0, atol=5e-5)
