"""Migration-surface guarantees: every public symbol of the reference's
SWIG module (reference python/gridforceplugin.i:85-368) exists here with
the same name, and the shared GridData container behaves like the
reference's ``shared_ptr<GridData>`` (GridData.h, GridForce.h:83-92).

MIGRATION.md's symbol tables are backed by these assertions.
"""

import numpy as np

import openmmgridforce_tpu.api as gfp

RNG = np.random.default_rng(7)


# Names exported by the reference SWIG module (gridforceplugin.i), per
# class. SWIG %apply OUTPUT getters return tuples in Python; they keep
# their names.
REF_GRIDDATA = [
    "loadFromFile", "saveToFile",
    "getNx", "getNy", "getNz", "getCounts",
    "getDx", "getDy", "getDz", "getSpacing",
    "getOrigin", "setOrigin",
    "getValues", "getDerivatives", "hasDerivatives",
    "getGridType", "setGridType", "getInvPower",
    "setValues", "setDerivatives",
]

REF_GRIDFORCE = [
    "setGridData", "getGridData",
    "addGridCounts", "addGridSpacing", "addGridValue", "setGridValues",
    "getGridValues", "addScalingFactor", "setScalingFactor",
    "setAutoCalculateScalingFactors", "getAutoCalculateScalingFactors",
    "setScalingProperty", "getScalingProperty",
    "setInvPowerMode", "getInvPowerMode", "applyInvPowerTransformation",
    "getInvPower", "setGridCap", "getGridCap",
    "setOutOfBoundsRestraint", "getOutOfBoundsRestraint",
    "setInterpolationMethod", "getInterpolationMethod",
    "setAutoGenerateGrid", "getAutoGenerateGrid",
    "setGridType", "getGridType",
    "setGridOrigin", "getGridOrigin",
    "setComputeDerivatives", "getComputeDerivatives", "hasDerivatives",
    "getDerivatives",
    "setReceptorAtoms", "getReceptorAtoms",
    "setLigandAtoms", "getLigandAtoms",
    "setParticles", "getParticles",
    "addParticleGroup", "getNumParticleGroups", "getParticleGroup",
    "getParticleGroupByName", "removeParticleGroup",
    "clearParticleGroups",
    "getParticleGroupEnergies", "getParticleAtomEnergies",
    "setTiledMode", "getTiledMode", "getTileSize", "getMemoryBudgetMB",
    "setTiledOutputFile", "getTiledOutputFile", "getTiledOutputTileSize",
    "setTiledInputFile", "getTiledInputFile",
    "clearGridData",
    "setReceptorPositions", "setReceptorPositionsFromArrays",
    "setReceptorPositionsFromLists", "getReceptorPositions",
    "loadFromFile", "saveToFile", "getGridParameters",
    "updateParametersInContext",
]

REF_ISOLATED = [
    "getNumAtoms", "setNumAtoms", "setParticles", "getParticles",
    "setAtomParameters", "getAtomParameters",
    "addExclusion", "getNumExclusions", "getExclusion",
    "addException", "getNumExceptions", "getExceptionParameters",
    "updateParametersInContext",
]

REF_MODULE = [
    "GridData", "GridForce", "IsolatedNonbondedForce", "ParticleGroup",
    "InvPowerMode_NONE", "InvPowerMode_RUNTIME", "InvPowerMode_STORED",
    "castToGridForce", "clearGridCache",
]


def test_module_surface():
    missing = [n for n in REF_MODULE if not hasattr(gfp, n)]
    assert not missing, f"module-level symbols missing: {missing}"


def test_griddata_surface():
    missing = [n for n in REF_GRIDDATA if not hasattr(gfp.GridData, n)]
    assert not missing, f"GridData methods missing: {missing}"


def test_gridforce_surface():
    missing = [n for n in REF_GRIDFORCE if not hasattr(gfp.GridForce, n)]
    assert not missing, f"GridForce methods missing: {missing}"


def test_isolated_surface():
    missing = [n for n in REF_ISOLATED
               if not hasattr(gfp.IsolatedNonbondedForce, n)]
    assert not missing, f"IsolatedNonbondedForce methods missing: {missing}"


def test_griddata_roundtrip(tmp_path):
    gd = gfp.GridData(4, 5, 6, 0.1, 0.2, 0.3)
    assert gd.getCounts() == (4, 5, 6)
    assert gd.getNx() == 4 and gd.getNy() == 5 and gd.getNz() == 6
    assert gd.getSpacing() == (0.1, 0.2, 0.3)
    assert gd.getDz() == 0.3
    gd.setOrigin(-1.0, 0.5, 2.0)
    vals = RNG.standard_normal(4 * 5 * 6)
    gd.setValues(vals)
    gd.setGridType("LJr")
    assert not gd.hasDerivatives()
    derivs = RNG.standard_normal(27 * 4 * 5 * 6)
    gd.setDerivatives(derivs)
    assert gd.hasDerivatives()

    p = str(tmp_path / "gd.grid")
    gd.saveToFile(p)
    gd2 = gfp.GridData.loadFromFile(p)
    assert gd2.getCounts() == (4, 5, 6)
    np.testing.assert_allclose(gd2.getSpacing(), (0.1, 0.2, 0.3))
    np.testing.assert_allclose(gd2.getOrigin(), (-1.0, 0.5, 2.0))
    np.testing.assert_allclose(gd2.getValues(), vals)
    assert gd2.hasDerivatives()
    np.testing.assert_allclose(gd2.getDerivatives(), derivs)


def test_gridforce_adopts_griddata(tmp_path):
    counts = (5, 5, 5)
    gd = gfp.GridData(*counts, 0.1, 0.1, 0.1)
    gd.setOrigin(0.25, 0.0, -0.125)
    vals = RNG.standard_normal(int(np.prod(counts)))
    gd.setValues(vals)
    gd.setGridType("charge")

    # constructor form and setter form are equivalent
    for g in (gfp.GridForce(gd), gfp.GridForce()):
        if g.getGridData() is None:
            g.setGridData(gd)
        assert g.getGridData() is gd
        c, s, v, _ = g.getGridParameters()
        assert c == [5, 5, 5]
        np.testing.assert_allclose(v, vals)
        assert g.getGridOrigin() == (0.25, 0.0, -0.125)
        assert g.getGridType() == "charge"

    # the adopted container drives Context energies identically to the
    # flat-setter path
    import jax.numpy as jnp

    from tests.test_api import _synthetic_topology

    top = _synthetic_topology(2, np.array([0.3, -0.4]),
                              np.array([0.3, 0.25]),
                              np.array([0.5, 0.4]))
    x = np.array([[0.2, 0.2, 0.2], [0.3, 0.25, 0.2]])

    def energy(force):
        force.setScalingProperty("charge")
        force.setAutoCalculateScalingFactors(True)
        force.setInterpolationMethod(1)
        system = gfp.ApiSystem(top)
        system.addForce(force)
        ctx = gfp.Context(system, gfp.VerletIntegrator(0.001))
        ctx.setPositions(jnp.asarray(x))
        return ctx.getState(getEnergy=True).getPotentialEnergy()

    g_flat = gfp.GridForce()
    g_flat.addGridCounts(*counts)
    g_flat.addGridSpacing(0.1, 0.1, 0.1)
    g_flat.setGridOrigin(0.25, 0.0, -0.125)
    g_flat.setGridValues(vals)
    g_flat.setGridType("charge")
    assert energy(gfp.GridForce(gd)) == energy(g_flat)


def test_griddata_shared_between_forces():
    # reference semantics: one shared_ptr<GridData>, several forces
    gd = gfp.GridData(3, 3, 3, 0.1, 0.1, 0.1)
    gd.setValues(np.arange(27.0))
    g1 = gfp.GridForce(gd)
    g2 = gfp.GridForce(gd)
    assert g1.getGridData() is g2.getGridData()
    # alias, not a copy: both forces read the same buffer
    assert np.shares_memory(np.asarray(g1._values_flat()),
                            np.asarray(gd.getValues()))

    # read-through: a later GridData.setValues is visible to every
    # attached force (reference m_vals = getValuesPtr(),
    # GridForce.cpp:127)
    gd.setValues(np.arange(27.0) * 2.0)
    np.testing.assert_allclose(g1.getGridValues(), np.arange(27.0) * 2)

    # write-through: a force's setGridValues mutates the shared buffer
    # (*m_vals = vals, GridForce.cpp:170-172) and siblings see it
    g1.setGridValues(np.arange(27.0) + 5.0)
    np.testing.assert_allclose(gd.getValues(), np.arange(27.0) + 5)
    np.testing.assert_allclose(g2.getGridValues(), np.arange(27.0) + 5)

    # derivatives route through the container the same way
    assert not g1.hasDerivatives() and not g2.hasDerivatives()
    d = np.arange(27.0 * 27)
    g1.setDerivatives(d)
    assert gd.hasDerivatives() and g2.hasDerivatives()
    np.testing.assert_allclose(g2.getDerivatives(), d)

    # clearGridData is a documented no-op under sharing
    # (GridForce.cpp:429-434)
    g1.clearGridData()
    np.testing.assert_allclose(gd.getValues(), np.arange(27.0) + 5)
