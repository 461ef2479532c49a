"""Bonded energy terms (harmonic bonds/angles, periodic torsions).

Vectorized jnp implementations with OpenMM conventions:
  bonds:    E = k/2 (r - r0)^2
  angles:   E = k/2 (theta - theta0)^2
  torsions: E = k (1 + cos(n phi - phase))

These supply the intra-ligand forces that OpenMM's own runtime provided in
the reference setup (the plugin only added the grid force; see SURVEY
section 1 note on host runtime).
"""

from __future__ import annotations

import jax.numpy as jnp


def bond_energy(positions, idx, k, r0):
    if idx.shape[0] == 0:
        return jnp.zeros((), dtype=positions.dtype)
    d = positions[idx[:, 0]] - positions[idx[:, 1]]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    return jnp.sum(0.5 * k * (r - r0) ** 2)


def angle_energy(positions, idx, k, t0):
    if idx.shape[0] == 0:
        return jnp.zeros((), dtype=positions.dtype)
    a = positions[idx[:, 0]] - positions[idx[:, 1]]
    b = positions[idx[:, 2]] - positions[idx[:, 1]]
    na = jnp.sqrt(jnp.sum(a * a, axis=-1))
    nb = jnp.sqrt(jnp.sum(b * b, axis=-1))
    cos_t = jnp.sum(a * b, axis=-1) / (na * nb)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    return jnp.sum(0.5 * k * (theta - t0) ** 2)


def torsion_energy(positions, idx, k, periodicity, phase):
    if idx.shape[0] == 0:
        return jnp.zeros((), dtype=positions.dtype)
    p0, p1, p2, p3 = (positions[idx[:, i]] for i in range(4))
    b1 = p1 - p0
    b2 = p2 - p1
    b3 = p3 - p2
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    phi = jnp.arctan2(y, x)
    return jnp.sum(k * (1.0 + jnp.cos(periodicity * phi - phase)))


def bonded_energy(positions, system):
    """Sum of all bonded terms for a System pytree."""
    return (bond_energy(positions, system.bond_idx, system.bond_k,
                        system.bond_r0)
            + angle_energy(positions, system.angle_idx, system.angle_k,
                           system.angle_t0)
            + torsion_energy(positions, system.torsion_idx, system.torsion_k,
                             system.torsion_per, system.torsion_phase))
