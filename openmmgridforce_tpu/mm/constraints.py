"""Holonomic bond constraints (SHAKE / RATTLE), vmap- and jit-friendly.

The reference workflows create systems with ``constraints=HBonds``
(python/tests/test_grid_force.py:67-68, example/sampler.py:503) and rely on
OpenMM's CCMA. CCMA's Gauss-Seidel sweeps are inherently sequential; here
constraints are relaxed with damped Jacobi iterations inside
``lax.while_loop`` — every constraint updates in parallel each sweep
(VPU-friendly, batches cleanly under vmap over replicas), converging in a
few tens of sweeps for H-bond star topologies.

SHAKE displaces post-step positions along the pre-step bond directions;
RATTLE removes relative velocity along the constrained bonds.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np


def _static_iters() -> int:
    """Fixed sweep count for the statically-unrolled constraint solver.

    0 (default) keeps the convergence-tested ``lax.while_loop``. Setting
    ``OPENMMGRIDFORCE_SHAKE_STATIC=<n>`` replaces both SHAKE and RATTLE
    loops with ``n`` straight-line Jacobi sweeps (no inner ``while`` in
    the compiled program). Measured motivation (r5): nesting the SHAKE
    while_loop inside the MD step scan made XLA:TPU copy-insert a full
    padded duplicate of a loop-invariant 3.2 GB packed-grid argument
    (6.37 GiB HLO temp -> HBM OOM at canonical scale in the BPMF
    sampler); the same step program without the inner while compiles
    with zero grid copies. The fixed-point iteration is idempotent at
    convergence, so extra sweeps only cost time, never accuracy — n
    should be >= the while version's typical sweep count (a few tens
    for H-bond stars)."""
    return int(os.environ.get("OPENMMGRIDFORCE_SHAKE_STATIC", "0"))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConstraintSet:
    idx: jax.Array        # [C, 2] int32 atom pairs
    length: jax.Array     # [C] target distances (nm)
    inv_mass: jax.Array   # [N] 1/mass

    @property
    def num_constraints(self) -> int:
        return self.idx.shape[0]


def constraints_from_bonds(bond_idx, bond_r0, masses,
                           which: str = "h_bonds") -> ConstraintSet:
    """Build a ConstraintSet from bonded terms.

    ``which``: "h_bonds" constrains bonds involving a hydrogen (mass < 2
    before repartitioning is NOT detectable afterwards — pass the original
    topology masses); "all_bonds" constrains every bond.
    """
    masses = np.asarray(masses)
    bond_idx = np.asarray(bond_idx)
    bond_r0 = np.asarray(bond_r0)
    if which == "all_bonds":
        mask = np.ones(len(bond_idx), dtype=bool)
    elif which == "h_bonds":
        is_h = masses < 2.0
        mask = is_h[bond_idx[:, 0]] | is_h[bond_idx[:, 1]]
    else:
        raise ValueError(which)
    return ConstraintSet(
        idx=jnp.asarray(bond_idx[mask], jnp.int32),
        length=jnp.asarray(bond_r0[mask]),
        inv_mass=jnp.asarray(1.0 / masses),
    )


def apply_shake(cs: ConstraintSet, x_ref, x_new, tol=1e-5, max_iter=150,
                omega=1.0):
    """Project ``x_new`` onto the constraint manifold.

    Args:
      x_ref: [N, 3] pre-step positions (define the constraint directions).
      x_new: [N, 3] unconstrained post-step positions.

    Returns constrained positions.
    """
    if cs.num_constraints == 0:
        return x_new
    i, j = cs.idx[:, 0], cs.idx[:, 1]
    d_ref = x_ref[i] - x_ref[j]                  # [C, 3]
    im_i = cs.inv_mass[i][:, None]
    im_j = cs.inv_mass[j][:, None]
    d0_sq = (cs.length * cs.length)[:, None]

    def body(state):
        x, _, it = state
        d = x[i] - x[j]
        r2 = jnp.sum(d * d, axis=-1, keepdims=True)
        diff = r2 - d0_sq
        denom = 2.0 * (im_i + im_j) * jnp.sum(d * d_ref, axis=-1,
                                              keepdims=True)
        g = omega * diff / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        dx = g * d_ref
        x = x.at[i].add(-im_i * dx).at[j].add(im_j * dx)
        err = jnp.max(jnp.abs(diff) / d0_sq)
        return x, err, it + 1

    def cond(state):
        _, err, it = state
        return (err > 2.0 * tol) & (it < max_iter)

    n_static = _static_iters()
    if n_static:
        state = (x_new, jnp.inf, 0)
        for _ in range(n_static):
            state = body(state)
        return state[0]
    x, err, _ = jax.lax.while_loop(cond, body,
                                   body((x_new, jnp.inf, 0)))
    return x


def apply_rattle(cs: ConstraintSet, x, v, tol=1e-8, max_iter=100,
                 omega=1.0):
    """Remove velocity components along constrained bonds."""
    if cs.num_constraints == 0:
        return v
    i, j = cs.idx[:, 0], cs.idx[:, 1]
    d = x[i] - x[j]
    im_i = cs.inv_mass[i][:, None]
    im_j = cs.inv_mass[j][:, None]
    r2 = jnp.sum(d * d, axis=-1, keepdims=True)

    def body(state):
        v, _, it = state
        vrel = jnp.sum((v[i] - v[j]) * d, axis=-1, keepdims=True)
        k = omega * vrel / ((im_i + im_j) * r2)
        dv = k * d
        v = v.at[i].add(-im_i * dv).at[j].add(im_j * dv)
        err = jnp.max(jnp.abs(vrel))
        return v, err, it + 1

    n_static = _static_iters()
    if n_static:
        state = (v, jnp.inf, 0)
        for _ in range(n_static):
            state = body(state)
        return state[0]
    v, err, _ = jax.lax.while_loop(
        lambda s: (s[1] > tol) & (s[2] < max_iter), body,
        body((v, jnp.inf, 0)))
    return v
