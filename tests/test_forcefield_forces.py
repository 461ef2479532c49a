"""Closed-form bonded forces vs jax.grad of the energies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop, system_from_amber
from openmmgridforce_tpu.mm.forcefield import (angle_energy,
                                               angle_energy_forces,
                                               bond_energy,
                                               bond_energy_forces,
                                               bonded_energy,
                                               bonded_energy_forces,
                                               torsion_energy,
                                               torsion_energy_forces)

DATA = "/root/reference/python/prmtopcrd"
RNG = np.random.default_rng(37)


@pytest.fixture(scope="module")
def ligand_system():
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    return system_from_amber(top), jnp.asarray(crd)


def test_bond_forces(ligand_system):
    s, x = ligand_system
    e, f = bond_energy_forces(x, s.bond_idx, s.bond_k, s.bond_r0)
    g = jax.grad(lambda p: bond_energy(p, s.bond_idx, s.bond_k,
                                       s.bond_r0))(x)
    assert float(e) == pytest.approx(
        float(bond_energy(x, s.bond_idx, s.bond_k, s.bond_r0)), rel=1e-12)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-10,
                               atol=1e-11)


def test_angle_forces(ligand_system):
    s, x = ligand_system
    e, f = angle_energy_forces(x, s.angle_idx, s.angle_k, s.angle_t0)
    g = jax.grad(lambda p: angle_energy(p, s.angle_idx, s.angle_k,
                                        s.angle_t0))(x)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-9,
                               atol=1e-10)


def test_torsion_forces(ligand_system):
    s, x = ligand_system
    e, f = torsion_energy_forces(x, s.torsion_idx, s.torsion_k,
                                 s.torsion_per, s.torsion_phase)
    g = jax.grad(lambda p: torsion_energy(p, s.torsion_idx, s.torsion_k,
                                          s.torsion_per,
                                          s.torsion_phase))(x)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-9,
                               atol=1e-10)


def test_bonded_total_perturbed(ligand_system):
    """Away from equilibrium (nonzero forces everywhere)."""
    s, x = ligand_system
    x = x + 0.01 * jnp.asarray(RNG.standard_normal(x.shape))
    e, f = bonded_energy_forces(x, s)
    g = jax.grad(lambda p: bonded_energy(p, s))(x)
    assert float(e) == pytest.approx(float(bonded_energy(x, s)), rel=1e-12)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-9,
                               atol=1e-9)
