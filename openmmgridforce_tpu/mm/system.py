"""System pytree: masses, bonded terms and the intra-ligand pair table.

Functional replacement for the OpenMM System/Context pair that the reference
plugged into (SURVEY section 1): all simulation inputs live in one frozen
pytree, built from an AMBER topology, and total energies/forces are pure
functions of (system, grids, positions).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpolate import evaluate_grid
from ..ops.packed import (HermitePackedGrid, MultiHermitePackedGrid,
                          MultiPackedGrid, PackedGrid,
                          evaluate_hermite_multi, evaluate_hermite_packed,
                          evaluate_multi, evaluate_packed)
from ..ops.pairwise import PairTable, build_pair_table, pair_energy_forces
from .amber import AmberTopology
from .constraints import ConstraintSet, constraints_from_bonds
from .forcefield import bonded_energy, bonded_energy_forces


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class System:
    masses: jax.Array          # [N] amu
    charges: jax.Array         # [N] e
    sigmas: jax.Array          # [N] nm
    epsilons: jax.Array        # [N] kJ/mol
    bond_idx: jax.Array        # [B, 2]
    bond_k: jax.Array
    bond_r0: jax.Array
    angle_idx: jax.Array       # [A, 3]
    angle_k: jax.Array
    angle_t0: jax.Array
    torsion_idx: jax.Array     # [T, 4]
    torsion_k: jax.Array
    torsion_per: jax.Array
    torsion_phase: jax.Array
    pairs: Optional[PairTable] = None
    constraints: Optional[ConstraintSet] = None

    @property
    def num_atoms(self) -> int:
        return self.masses.shape[0]


def system_from_amber(top: AmberTopology, dtype=jnp.float64,
                      hydrogen_mass: Optional[float] = None,
                      include_nonbonded: bool = True,
                      constraints: Optional[str] = None) -> System:
    """Build a System from a parsed AMBER topology.

    ``hydrogen_mass``: if set, repartition hydrogen masses to this value,
    subtracting the difference from the bonded heavy atom (OpenMM's
    hydrogenMass option used by the sampler, reference
    example/sampler.py:476-482).
    ``constraints``: None, "h_bonds" (alias "HBonds") or "all_bonds"
    (alias "AllBonds") — constrained bonds are removed from the harmonic
    terms (OpenMM createSystem semantics) and returned as a ConstraintSet
    on the System.
    """
    masses = np.array(top.masses, dtype=float)
    if hydrogen_mass is not None:
        is_h = masses < 2.0  # hydrogens (and extra points excluded: mass 0)
        is_h &= masses > 0.0
        for (i, j) in top.bond_idx:
            hi, heavy = (i, j) if is_h[i] and not is_h[j] else \
                ((j, i) if is_h[j] and not is_h[i] else (None, None))
            if hi is not None:
                delta = hydrogen_mass - masses[hi]
                masses[hi] += delta
                masses[heavy] -= delta

    pairs = None
    if include_nonbonded:
        exceptions = []
        excl = set(top.exclusions)
        for p, (i, j) in enumerate(top.pairs14):
            qq = top.charges[i] * top.charges[j] / top.scee[p]
            sg = 0.5 * (top.sigmas[i] + top.sigmas[j])
            ep = np.sqrt(top.epsilons[i] * top.epsilons[j]) / top.scnb[p]
            exceptions.append((int(i), int(j), qq, sg, ep))
        pairs = build_pair_table(top.charges, top.sigmas, top.epsilons,
                                 exclusions=sorted(excl),
                                 exceptions=exceptions,
                                 dtype=np.dtype(dtype))

    alias = {"HBonds": "h_bonds", "AllBonds": "all_bonds",
             "h_bonds": "h_bonds", "all_bonds": "all_bonds"}
    cset = None
    bond_idx, bond_k, bond_r0 = top.bond_idx, top.bond_k, top.bond_r0
    if constraints is not None:
        cset = constraints_from_bonds(top.bond_idx, top.bond_r0,
                                      top.masses,  # pre-repartition masses
                                      which=alias[constraints])
        # replace masses in the constraint set with repartitioned ones
        cset = ConstraintSet(idx=cset.idx, length=cset.length,
                             inv_mass=jnp.asarray(1.0 / masses,
                                                  dtype=dtype))
        cidx = {tuple(sorted(p)) for p in np.asarray(cset.idx)}
        keep = np.array([tuple(sorted(b)) not in cidx
                         for b in top.bond_idx])
        bond_idx = top.bond_idx[keep]
        bond_k = top.bond_k[keep]
        bond_r0 = top.bond_r0[keep]

    def arr(x):
        return jnp.asarray(x, dtype=dtype)

    def iarr(x):
        return jnp.asarray(x, dtype=jnp.int32)

    return System(
        masses=arr(masses),
        charges=arr(top.charges),
        sigmas=arr(top.sigmas),
        epsilons=arr(top.epsilons),
        bond_idx=iarr(bond_idx),
        bond_k=arr(bond_k),
        bond_r0=arr(bond_r0),
        angle_idx=iarr(top.angle_idx),
        angle_k=arr(top.angle_k),
        angle_t0=arr(top.angle_t0),
        torsion_idx=iarr(top.torsion_idx),
        torsion_k=arr(top.torsion_k),
        torsion_per=arr(top.torsion_per),
        torsion_phase=arr(top.torsion_phase),
        pairs=pairs,
        constraints=cset,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridBinding:
    """A grid plus the per-atom scaling factors that couple atoms to it.

    ``grid`` may be a Grid (reference-layout, gather-per-stencil) or a
    PackedGrid (per-cell polynomial coefficients — the TPU fast path)."""

    grid: object          # Grid | PackedGrid
    scaling: jax.Array    # [N]


def _eval_grid(grid, positions, scaling):
    if isinstance(grid, MultiPackedGrid):
        return evaluate_multi(grid, positions, scaling)  # scaling [G, N]
    if isinstance(grid, MultiHermitePackedGrid):
        return evaluate_hermite_multi(grid, positions, scaling)
    if isinstance(grid, PackedGrid):
        return evaluate_packed(grid, positions, scaling)
    if isinstance(grid, HermitePackedGrid):
        return evaluate_hermite_packed(grid, positions, scaling)
    return evaluate_grid(grid, positions, scaling)


def grid_energy(grids: Sequence[GridBinding], positions):
    """Total GRID energy of the bindings (no bonded/pair terms) —
    dispatches each binding to the right evaluator (Grid, packed,
    Hermite-packed, fused multi). The public face of the per-kernel
    dispatch used by potential_energy/energy_and_forces."""
    e = 0.0
    for gb in grids:
        e = e + _eval_grid(gb.grid, positions, gb.scaling).energy
    return e


def potential_energy(system: System, grids: Sequence[GridBinding],
                     positions):
    """Total potential energy (differentiable)."""
    e = bonded_energy(positions, system)
    if system.pairs is not None:
        e = e + pair_energy_forces(system.pairs, positions)[0]
    for gb in grids:
        e = e + _eval_grid(gb.grid, positions, gb.scaling).energy
    return e


def make_md_runner(n_steps: int, dt: float, friction: float,
                   scheme: str = "classic", batched: bool = True):
    """Build a jitted MD segment runner with all large state as ARGUMENTS.

    Returns run(states, system, grids, temperatures) -> states. Passing the
    System/GridBinding pytrees as arguments (rather than closing over them)
    keeps grid arrays out of the compiled program's constant pool — critical
    for multi-hundred-MB packed grids, and required on backends that ship
    HLO to a remote compiler.

    ``temperatures``: scalar, or [R] array when ``batched`` for per-replica
    thermostats (replica-exchange ladders).
    """
    from .integrators import make_langevin_step, run_segment

    def run(states, system, grids, temperatures):
        def one(state, t):
            def force_fn(x):
                return energy_and_forces(system, grids, x)[1]
            step = make_langevin_step(force_fn, system.masses, dt,
                                      friction, t, scheme=scheme,
                                      constraints=system.constraints)
            return run_segment(step, state, n_steps)

        if batched:
            t = jnp.broadcast_to(jnp.asarray(temperatures),
                                 (states.positions.shape[0],))
            return jax.vmap(one)(states, t)
        return one(states, jnp.asarray(temperatures))

    return jax.jit(run)


def energy_and_forces(system: System, grids: Sequence[GridBinding],
                      positions):
    """Total energy and forces.

    All terms use closed-form gradients (each validated against jax.grad
    of its energy): grid forces match the reference kernels' conventions
    exactly (OOB restraints, inv-power chain rules); bonded and pair terms
    use the analytic formulas in mm/forcefield.py and ops/pairwise.py.
    """
    with jax.named_scope("bonded"):
        energy, forces = bonded_energy_forces(positions, system)
    if system.pairs is not None:
        with jax.named_scope("intra_nonbonded"):
            e_p, f_p = pair_energy_forces(system.pairs, positions)
        energy = energy + e_p
        forces = forces + f_p
    for i, gb in enumerate(grids):
        with jax.named_scope(f"grid_force_{i}"):
            res = _eval_grid(gb.grid, positions, gb.scaling)
        energy = energy + res.energy
        forces = forces + res.forces
    return energy, forces
