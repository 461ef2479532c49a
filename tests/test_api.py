"""Reference-compatible API layer, exercised with the reference's own test
flows (translations of python/tests/test_grid_force.py, test_auto_grid.py,
test_auto_scaling.py, test_simple_grid_energy.py patterns)."""

import os

import numpy as np
import pytest

import openmmgridforce_tpu.api as gfp
from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop
from openmmgridforce_tpu.units import COULOMB_CONST, TWO_POW_ONE_SIXTH

DATA = "/root/reference/python/prmtopcrd"
HAVE_FIXTURES = os.path.exists(f"{DATA}/ligand.prmtop")
RNG = np.random.default_rng(9)


def make_simple_grid(counts=(5, 5, 5), spacing=0.1):
    g = gfp.GridForce()
    g.addGridCounts(*counts)
    g.addGridSpacing(spacing, spacing, spacing)
    vals = RNG.standard_normal(int(np.prod(counts)))
    g.setGridValues(vals)
    return g, vals


def test_gridforce_builder_roundtrip(tmp_path):
    g, vals = make_simple_grid()
    g.setGridOrigin(1.0, 2.0, 3.0)
    g.setGridType("charge")
    g.setInvPowerMode(gfp.InvPowerMode_STORED, 2.0)
    counts, spacing, v, s = g.getGridParameters()
    assert counts == [5, 5, 5]
    np.testing.assert_allclose(v, vals)

    p = str(tmp_path / "g.grid")
    g.saveToFile(p)
    g2 = gfp.GridForce()
    g2.loadFromFile(p)
    counts2, spacing2, v2, _ = g2.getGridParameters()
    assert counts2 == [5, 5, 5]
    np.testing.assert_allclose(v2, vals)
    assert g2.getInvPowerMode() == gfp.InvPowerMode_STORED
    assert g2.getInvPower() == 2.0
    assert g2.getGridType() == "charge"
    assert g2.getGridOrigin() == (1.0, 2.0, 3.0)


def test_scaling_property_validation():
    g = gfp.GridForce()
    with pytest.raises(ValueError, match="Invalid scaling property"):
        g.setScalingProperty("bogus")
    with pytest.raises(ValueError, match="Invalid grid type"):
        g.setGridType("bogus")


def test_particle_groups():
    g, _ = make_simple_grid()
    i0 = g.addParticleGroup("ligA", [0, 1, 2], [1.0, 2.0, 3.0])
    i1 = g.addParticleGroup("ligB", [3, 4, 5], [1.0, 1.0, 1.0])
    assert (i0, i1) == (0, 1)
    assert g.getNumParticleGroups() == 2
    assert g.getParticleGroupByName("ligB").particle_indices == [3, 4, 5]
    with pytest.raises(ValueError, match="already exists"):
        g.addParticleGroup("ligA", [6])
    g.removeParticleGroup(0)
    assert g.getParticleGroup(0).name == "ligB"
    g.clearParticleGroups()
    assert g.getNumParticleGroups() == 0


def test_cast_helper():
    g = gfp.GridForce()
    assert gfp.castToGridForce(g) is g
    assert gfp.castToGridForce(gfp.IsolatedNonbondedForce()) is None
    assert gfp.clearGridCache() is None


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_auto_scaling_from_system():
    """Mirror of test_auto_scaling.py: factors computed from nonbonded
    parameters at Context creation."""
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = gfp.create_system(top)

    g, _ = make_simple_grid(counts=(4, 4, 4), spacing=1.0)
    g.setGridOrigin(*(crd.min(0) - 0.5))
    g.setScalingProperty("ljr")
    g.setAutoCalculateScalingFactors(True)
    system.addForce(g)

    ctx = gfp.Context(system, gfp.VerletIntegrator(0.001))
    ctx.setPositions(crd)
    ctx.getState(getEnergy=True)

    got = np.asarray(g.getScalingFactors())
    want = np.sqrt(top.epsilons) * (TWO_POW_ONE_SIXTH * top.sigmas) ** 6
    np.testing.assert_allclose(got, want, rtol=1e-12)


def _synthetic_topology(n, q, sig, eps):
    """A minimal AmberTopology for a rigid synthetic receptor."""
    from openmmgridforce_tpu.mm.amber import AmberTopology
    z2 = np.zeros((0, 2), dtype=np.int64)
    z3 = np.zeros((0, 3), dtype=np.int64)
    z4 = np.zeros((0, 4), dtype=np.int64)
    z = np.zeros(0)
    return AmberTopology(
        natom=n, masses=np.full(n, 12.0), charges=q, sigmas=sig,
        epsilons=eps, atom_names=["C"] * n, residue_labels=["REC"],
        residue_pointers=np.array([1]), bond_idx=z2, bond_k=z, bond_r0=z,
        angle_idx=z3, angle_k=z, angle_t0=z, torsion_idx=z4, torsion_k=z,
        torsion_per=z, torsion_phase=z, exclusions=[],
        pairs14=z2, scee=z, scnb=z)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_auto_generate_and_energy_parity(tmp_path):
    """Mirror of test_simple_grid_energy.py: auto-generate grids on a
    receptor system, save, load into the ligand system, compare against
    the pairwise double sum."""
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    lig_crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")

    # small synthetic "receptor": 20 atoms scattered near the ligand but
    # kept >= 0.35 nm from every ligand atom (inside steric contact the
    # r^-12 curvature exceeds what low-order interpolation can track; the
    # reference's own oracle tests use a real, non-overlapping receptor)
    n_rec = 20
    rec_crd = []
    while len(rec_crd) < n_rec:
        cand = lig_crd.mean(0) + RNG.uniform(-0.9, 0.9, 3)
        if np.linalg.norm(lig_crd - cand, axis=1).min() >= 0.35:
            rec_crd.append(cand)
    rec_crd = np.asarray(rec_crd)

    lo = lig_crd.min(0) - 0.6
    spacing = 0.02
    counts = tuple(int(c) + 1 for c in
                   np.ceil((lig_crd.max(0) + 0.6 - lo) / spacing))

    rec_q = RNG.uniform(-0.5, 0.5, n_rec)
    rec_sig = RNG.uniform(0.25, 0.35, n_rec)
    rec_eps = RNG.uniform(0.2, 0.8, n_rec)
    rec_top = _synthetic_topology(n_rec, rec_q, rec_sig, rec_eps)

    # phase 1: generate + save each grid on the receptor system
    paths = {}
    for gt in ["charge", "ljr", "lja"]:
        system = gfp.create_system(rec_top)
        g = gfp.GridForce()
        g.addGridCounts(*counts)
        g.addGridSpacing(spacing, spacing, spacing)
        g.setGridOrigin(*lo)
        g.setAutoGenerateGrid(True)
        g.setGridType(gt)
        g.setReceptorAtoms(list(range(n_rec)))
        g.setReceptorPositionsFromLists(rec_crd)
        g.setScalingFactors(np.zeros(n_rec))  # receptor atoms feel nothing
        system.addForce(g)
        ctx = gfp.Context(system, gfp.VerletIntegrator(0.001))
        ctx.setPositions(rec_crd)
        ctx.getState(getEnergy=True)  # triggers generation
        assert g.getNumGridValues() == int(np.prod(counts))
        p = str(tmp_path / f"{gt}.grid")
        g.saveToFile(p)
        paths[gt] = p

    # phase 2: load grids into the ligand system and evaluate
    system = gfp.create_system(lig)
    for f in system.getForces():
        f.setForceGroup(31)
    for i, gt in enumerate(["charge", "ljr", "lja"]):
        g = gfp.GridForce()
        g.loadFromFile(paths[gt])
        g.setInterpolationMethod(1)  # cubic B-spline
        g.setScalingProperty(gt)
        g.setAutoCalculateScalingFactors(True)
        g.setForceGroup(i)
        system.addForce(g)
    ctx = gfp.Context(system, gfp.VerletIntegrator(0.001))
    ctx.setPositions(lig_crd)
    energies = {
        gt: ctx.getState(getEnergy=True,
                         groups={i}).getPotentialEnergy()
        for i, gt in enumerate(["charge", "ljr", "lja"])}

    # pairwise oracle
    d = np.linalg.norm(lig_crd[:, None, :] - rec_crd[None, :, :], axis=-1)
    qq = np.outer(lig.charges, rec_q)
    want_charge = float((COULOMB_CONST * qq / d).sum())
    se = np.sqrt(np.outer(lig.epsilons, rec_eps))
    r3 = np.outer((TWO_POW_ONE_SIXTH * lig.sigmas) ** 3,
                  (TWO_POW_ONE_SIXTH * rec_sig) ** 3)
    want_ljr = float((se * r3 ** 2 / d ** 12).sum())
    want_lja = float((-2.0 * se * r3 / d ** 6).sum())

    # 2% relative gate matching the reference's oracle tests
    # (test_triquintic.py:215-217), with a small absolute floor for
    # near-zero components
    assert energies["charge"] == pytest.approx(want_charge, rel=0.02,
                                               abs=0.05)
    assert energies["ljr"] == pytest.approx(want_ljr, rel=0.02, abs=0.05)
    assert energies["lja"] == pytest.approx(want_lja, rel=0.02, abs=0.05)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_force_groups_and_md_stepping():
    """Mirror of test_grid_force.py:117-159: full simulation with grid
    force, finite energies, force-group separation, MD steps."""
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = gfp.create_system(lig, hydrogen_mass=4.0)
    for f in system.getForces():
        f.setForceGroup(31)

    g = gfp.GridForce()
    counts = (8, 8, 8)
    g.addGridCounts(*counts)
    g.addGridSpacing(0.3, 0.3, 0.3)
    g.setGridOrigin(*(crd.min(0) - 0.8))
    g.setGridValues(RNG.standard_normal(int(np.prod(counts))) * 0.1)
    g.setScalingProperty("charge")
    g.setAutoCalculateScalingFactors(True)
    g.setForceGroup(0)
    system.addForce(g)

    integ = gfp.LangevinIntegrator(300.0, 5.0, 0.001)
    sim = gfp.Simulation(lig, system, integ)
    sim.context.setPositions(crd)
    sim.context.setVelocitiesToTemperature(300.0)

    e_total = sim.context.getState(getEnergy=True).getPotentialEnergy()
    e_grid = sim.context.getState(getEnergy=True,
                                  groups={0}).getPotentialEnergy()
    e_internal = sim.context.getState(getEnergy=True,
                                      groups={31}).getPotentialEnergy()
    assert np.isfinite(e_total)
    assert e_total == pytest.approx(e_grid + e_internal, rel=1e-9)

    sim.step(50)
    st = sim.context.getState(getEnergy=True, getForces=True)
    assert np.isfinite(st.getPotentialEnergy())
    assert np.all(np.isfinite(st.getForces()))
    assert np.isfinite(st.getKineticEnergy())


def test_isolated_nonbonded_force_api():
    iso = gfp.IsolatedNonbondedForce()
    n = 5
    iso.setNumAtoms(n)
    q = RNG.uniform(-0.5, 0.5, n)
    sig = RNG.uniform(0.2, 0.3, n)
    eps = RNG.uniform(0.1, 0.9, n)
    for i in range(n):
        iso.setAtomParameters(i, q[i], sig[i], eps[i])
    iso.addExclusion(0, 1)
    iso.addException(1, 2, 0.1, 0.25, 0.3)
    assert iso.getNumExclusions() == 1
    assert iso.getNumExceptions() == 1
    assert iso.getAtomParameters(2) == (q[2], sig[2], eps[2])

    table, particles = iso._build()
    from openmmgridforce_tpu.ops.pairwise import pair_energy_forces
    x = RNG.uniform(0, 1.0, (n, 3))
    e, f = pair_energy_forces(table, x)

    want = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) == (0, 1):
                continue
            if (i, j) == (1, 2):
                qq, s, ep = 0.1, 0.25, 0.3
            else:
                qq = q[i] * q[j]
                s = 0.5 * (sig[i] + sig[j])
                ep = np.sqrt(eps[i] * eps[j])
            r = np.linalg.norm(x[i] - x[j])
            sr6 = (s / r) ** 6
            want += COULOMB_CONST * qq / r + 4 * ep * (sr6 ** 2 - sr6)
    assert float(e) == pytest.approx(want, rel=1e-10)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_autogrid_save_and_reload(tmp_path):
    """Mirror of test_autogrid_save.py: parameters populated after Context
    creation; saved auto-generated grid reloads identically."""
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    n_rec = 8
    rec_q = RNG.uniform(-0.4, 0.4, n_rec)
    rec_top = _synthetic_topology(n_rec, rec_q,
                                  RNG.uniform(0.25, 0.3, n_rec),
                                  RNG.uniform(0.3, 0.7, n_rec))
    rec_pos = crd.mean(0) + RNG.uniform(-0.5, 0.5, (n_rec, 3))

    system = gfp.create_system(rec_top)
    g = gfp.GridForce()
    g.addGridCounts(6, 6, 6)
    g.addGridSpacing(0.2, 0.2, 0.2)
    g.setGridOrigin(*(crd.mean(0) - 0.6))
    g.setAutoGenerateGrid(True)
    g.setGridType("lja")
    g.setReceptorAtoms(list(range(n_rec)))
    g.setReceptorPositionsFromLists(rec_pos)
    g.setScalingFactors(np.zeros(n_rec))
    system.addForce(g)

    assert g.getNumGridValues() == 0  # before Context creation
    ctx = gfp.Context(system, gfp.VerletIntegrator(0.001))
    counts, spacing, vals, _ = g.getGridParameters()
    assert counts == [6, 6, 6]
    assert len(vals) == 216 and np.all(np.isfinite(vals))

    p = str(tmp_path / "auto.grid")
    g.saveToFile(p)
    g2 = gfp.GridForce()
    g2.loadFromFile(p)
    np.testing.assert_allclose(g2.getGridValues(), vals, rtol=1e-12)
    assert g2.getGridType() == "lja"


def test_binary_netcdf_equivalence(tmp_path):
    """Mirror of test_auto_grid.py's binary-vs-NetCDF check: the same grid
    through both formats evaluates identically."""
    from openmmgridforce_tpu.io import read_netcdf, write_netcdf

    counts = (5, 4, 6)
    vals = RNG.standard_normal(int(np.prod(counts)))
    spacing, origin = (0.1, 0.1, 0.1), (0.5, 0.5, 0.5)

    g_bin = gfp.GridForce()
    g_bin.addGridCounts(*counts)
    g_bin.addGridSpacing(*spacing)
    g_bin.setGridOrigin(*origin)
    g_bin.setGridValues(vals)
    pb = str(tmp_path / "g.grid")
    g_bin.saveToFile(pb)

    pn = str(tmp_path / "g.nc")
    write_netcdf(pn, counts, spacing, vals, origin)
    d = read_netcdf(pn)

    g1 = gfp.GridForce()
    g1.loadFromFile(pb)
    g2 = gfp.GridForce()
    g2.addGridCounts(*d["counts"])
    g2.addGridSpacing(*d["spacing"])
    g2.setGridOrigin(*d["origin"])
    g2.setGridValues(d["vals"])

    np.testing.assert_allclose(g1.getGridValues(), g2.getGridValues(),
                               rtol=1e-12)
    assert g1.getGridParameters()[0] == g2.getGridParameters()[0]


def test_bpmf_cli_grid_loading(tmp_path):
    """The sampler CLI's grid-loading path (AlGDock NetCDF in Angstrom/kcal
    with the reference's unit conversions, sampler.py:490-521)."""
    import importlib.util
    import sys

    from openmmgridforce_tpu.io import write_netcdf
    from openmmgridforce_tpu.ops.packed import evaluate_packed
    from openmmgridforce_tpu.units import KCAL_TO_KJ

    spec = importlib.util.spec_from_file_location(
        "bpmf_sampler", "/root/repo/examples/bpmf_sampler.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    counts = (5, 5, 5)
    vals_kcal = RNG.standard_normal(int(np.prod(counts)))
    nc = str(tmp_path / "elec.nc")
    # AlGDock NetCDF: spacing/origin in Angstrom, values kcal/mol
    write_netcdf(nc, counts, (0.25, 0.25, 0.25), vals_kcal,
                 origin=(1.0, 2.0, 3.0))

    import jax.numpy as jnp
    scaling = RNG.standard_normal(4)
    binding = mod.get_grid_binding(nc, KCAL_TO_KJ, scaling, 0, jnp.float64)
    g = binding.grid
    assert g.counts == counts
    np.testing.assert_allclose(np.asarray(g.spacing), 0.025)
    np.testing.assert_allclose(np.asarray(g.origin), (0.1, 0.2, 0.3))
    # value at a node equals the converted file value (probe the (1,1,1)
    # node: the (0,0,0) corner sits on the boundary within float rounding)
    node = np.asarray(g.origin) + np.asarray(g.spacing)
    res = evaluate_packed(g, node[None, :], np.ones(1))
    want = vals_kcal.reshape(counts)[1, 1, 1] * KCAL_TO_KJ
    assert float(res.per_atom_energy[0]) == pytest.approx(want, rel=1e-9)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_minimize_energy():
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = gfp.create_system(lig)
    sim = gfp.Simulation(lig, system, gfp.VerletIntegrator(0.001))
    # perturb the crystal pose, then minimize back down
    pert = crd + RNG.normal(0.0, 0.004, crd.shape)
    sim.context.setPositions(pert)
    e0 = sim.context.getState(getEnergy=True).getPotentialEnergy()
    sim.minimizeEnergy(maxIterations=150, tolerance=20.0)
    e1 = sim.context.getState(getEnergy=True).getPotentialEnergy()
    assert e1 < e0
    st = sim.context.getState(getEnergy=True, getForces=True)
    rms = float(np.sqrt((np.asarray(st.getForces()) ** 2).mean()))
    assert rms < 100.0  # near a local minimum


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_constrained_hbonds_simulation():
    """create_system(constraints='HBonds') + 2 fs Langevin must hold every
    constrained H-bond at its equilibrium length through MD (reference
    workflow: python/tests/test_grid_force.py:67, example/sampler.py:503)."""
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = gfp.create_system(lig, hydrogen_mass=4.0,
                               constraints="HBonds")
    cset = system._core.constraints
    assert cset is not None and cset.num_constraints > 0
    # constrained bonds must be removed from the harmonic terms
    n_bonds_all = load_prmtop(f"{DATA}/ligand.prmtop").bond_idx.shape[0]
    assert system._core.bond_idx.shape[0] == \
        n_bonds_all - cset.num_constraints

    g = gfp.GridForce()
    g.addGridCounts(8, 8, 8)
    g.addGridSpacing(0.3, 0.3, 0.3)
    g.setGridOrigin(*(crd.min(0) - 0.8))
    g.setGridValues(RNG.standard_normal(512) * 0.1)
    g.setScalingProperty("charge")
    g.setAutoCalculateScalingFactors(True)
    system.addForce(g)

    ctx = gfp.Context(system, gfp.LangevinIntegrator(300.0, 5.0, 0.002))
    ctx.setPositions(crd)
    ctx.setVelocitiesToTemperature(300.0)
    ctx.getIntegrator().step(500)

    pos = ctx.getPositions()
    idx = np.asarray(cset.idx)
    d = np.linalg.norm(pos[idx[:, 0]] - pos[idx[:, 1]], axis=1)
    np.testing.assert_allclose(d, np.asarray(cset.length), rtol=2e-5)
    assert np.isfinite(
        ctx.getState(getEnergy=True).getPotentialEnergy())


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_readme_quickstart(tmp_path):
    """The README's compat-API Quick Start must run verbatim (modulo
    file paths): loadFromFile + auto scaling + constraints + getIntegrator."""
    src = gfp.GridForce()
    src.addGridCounts(9, 9, 9)
    src.addGridSpacing(0.25, 0.25, 0.25)
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    src.setGridOrigin(*(crd.min(0) - 0.7))
    src.setGridType("charge")
    src.setGridValues(RNG.standard_normal(9 ** 3) * 0.2)
    path = str(tmp_path / "charge.grid")
    src.saveToFile(path)

    grid = gfp.GridForce()
    grid.loadFromFile(path)
    grid.setInterpolationMethod(1)
    grid.setScalingProperty("charge")
    grid.setAutoCalculateScalingFactors(True)
    system = gfp.create_system(f"{DATA}/ligand.prmtop", hydrogen_mass=4.0,
                               constraints="HBonds")
    system.addForce(grid)
    ctx = gfp.Context(system, gfp.LangevinIntegrator(300.0, 1.0, 0.002))
    ctx.setPositions(crd)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()
    assert np.isfinite(e)
    ctx.getIntegrator().step(1000)
    assert np.all(np.isfinite(ctx.getPositions()))


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_platform_compensated():
    """Platform("Compensated") evaluates GridForces through the
    double-float32 accuracy tier: energies/forces must track the
    default platform's f64 evaluation (same CUDA-convention semantics)
    to ~1e-6 relative, from a pack whose storage is float32 — and
    stepping must run through the same argument channel."""
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")

    vals = np.abs(RNG.standard_normal(24 ** 3)) * 50.0 + 1.0

    def build():
        system = gfp.create_system(top)
        g = gfp.GridForce()
        g.addGridCounts(24, 24, 24)
        g.addGridSpacing(0.05, 0.05, 0.05)
        g.setGridOrigin(*(crd.min(0) - 0.15))
        g.setGridValues(vals)
        g.setScalingProperty("ljr")
        g.setAutoCalculateScalingFactors(True)
        system.addForce(g)
        return system

    ctx64 = gfp.Context(build(), gfp.VerletIntegrator(0.001))
    ctx64.setPositions(crd)
    e64 = ctx64.getState(getEnergy=True, getForces=True)

    ctx_c = gfp.Context(build(), gfp.VerletIntegrator(0.001),
                        gfp.Platform.getPlatformByName("Compensated"))
    ctx_c.setPositions(crd)
    ec = ctx_c.getState(getEnergy=True, getForces=True)

    ref_e = e64.getPotentialEnergy()
    assert ec.getPotentialEnergy() == pytest.approx(ref_e, rel=3e-6)
    f64 = np.asarray(e64.getForces())
    fc = np.asarray(ec.getForces())
    fscale = np.abs(f64).max()
    # exclude atoms sitting EXACTLY on grid nodes (origin is derived
    # from crd.min): the gradient is discontinuous there, so f64 vs
    # double-word arithmetic may land them in either adjacent cell —
    # a branch-ambiguous tie, not an accuracy loss (values, compared
    # above, stay continuous)
    t = (crd - (crd.min(0) - 0.15)) / 0.05
    off_node = (np.abs(t - np.round(t)) > 1e-9).all(axis=1)
    np.testing.assert_allclose(fc[off_node], f64[off_node],
                               atol=3e-6 * fscale)

    # the pack flows through the stepping argument channel (no HLO
    # constants), and the pack cache invalidates on parameter updates
    gforce = [f for f in ctx_c.system.getForces()
              if isinstance(f, gfp.GridForce)][0]
    ctx_c.getIntegrator().step(3)
    assert np.isfinite(np.asarray(
        ctx_c.getState(getEnergy=True).getPotentialEnergy()))
    assert len(ctx_c._comp_packs) == 1
    gforce.updateParametersInContext(ctx_c)
    assert len(ctx_c._comp_packs) == 0
