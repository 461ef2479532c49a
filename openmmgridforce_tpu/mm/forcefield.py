"""Bonded energy terms (harmonic bonds/angles, periodic torsions).

Vectorized jnp implementations with OpenMM conventions:
  bonds:    E = k/2 (r - r0)^2
  angles:   E = k/2 (theta - theta0)^2
  torsions: E = k (1 + cos(n phi - phase))

These supply the intra-ligand forces that OpenMM's own runtime provided in
the reference setup (the plugin only added the grid force; see SURVEY
section 1 note on host runtime).

Force assembly is scatter-free: per-term force contributions are applied
to atoms through a one-hot contraction (``assemble_forces``) instead of
``.at[].add`` scatters. On TPU a scatter lowers to a serialized
per-update loop, while the one-hot contraction is a single [N,K]x[K,3]
matmul the MXU executes in microseconds — and under ``vmap`` over
replicas it stays ONE batched matmul with a shared, unbatched one-hot
matrix.
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


# ----------------------------------------------------------------------
# Closed-form forces (the MD hot path; autodiff of the energies above is
# used as the test oracle, see tests/test_forcefield_forces.py)
# ----------------------------------------------------------------------

def assemble_forces(n_atoms, atom_ids, contribs):
    """Scatter-free force assembly: forces[n] = sum_k [ids[k]==n] c[k].

    ``atom_ids`` [K] int32, ``contribs`` [K, 3]. The one-hot matrix is a
    function of the (unbatched) topology only, so under vmap this is one
    shared-operand batched matmul on the MXU instead of R serialized
    scatter loops.
    """
    onehot = (atom_ids[:, None]
              == jnp.arange(n_atoms, dtype=atom_ids.dtype)[None, :])
    return jnp.einsum("kn,kc->nc", onehot.astype(contribs.dtype), contribs)


def _bond_contribs(positions, idx, k, r0):
    d = positions[idx[:, 0]] - positions[idx[:, 1]]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    dr = r - r0
    e = jnp.sum(0.5 * k * dr * dr)
    f_pair = (-k * dr / r)[:, None] * d          # force on atom i
    ids = jnp.concatenate([idx[:, 0], idx[:, 1]])
    contribs = jnp.concatenate([f_pair, -f_pair])
    return e, ids, contribs


def _angle_contribs(positions, idx, k, t0):
    a = positions[idx[:, 0]] - positions[idx[:, 1]]
    b = positions[idx[:, 2]] - positions[idx[:, 1]]
    na = jnp.sqrt(jnp.sum(a * a, axis=-1))
    nb = jnp.sqrt(jnp.sum(b * b, axis=-1))
    ah = a / na[:, None]
    bh = b / nb[:, None]
    cos_t = jnp.clip(jnp.sum(ah * bh, axis=-1), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    e = jnp.sum(0.5 * k * (theta - t0) ** 2)

    # dtheta/da = -(bh - cos*ah) / (|a| sin); grad E = k (theta-t0) dtheta
    coef = (k * (theta - t0) / sin_t)[:, None]
    gi = coef * (bh - cos_t[:, None] * ah) / na[:, None] * -1.0
    gk = coef * (ah - cos_t[:, None] * bh) / nb[:, None] * -1.0
    ids = jnp.concatenate([idx[:, 0], idx[:, 2], idx[:, 1]])
    contribs = jnp.concatenate([-gi, -gk, gi + gk])
    return e, ids, contribs


def _torsion_contribs(positions, idx, k, periodicity, phase):
    p0, p1, p2, p3 = (positions[idx[:, i]] for i in range(4))
    b1 = p1 - p0
    b2 = p2 - p1
    b3 = p3 - p2
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    nb2 = jnp.sqrt(jnp.sum(b2 * b2, axis=-1))
    m1 = jnp.cross(n1, b2 / nb2[:, None])
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    phi = jnp.arctan2(y, x)
    e = jnp.sum(k * (1.0 + jnp.cos(periodicity * phi - phase)))

    de_dphi = -k * periodicity * jnp.sin(periodicity * phi - phase)
    n1_sq = jnp.maximum(jnp.sum(n1 * n1, axis=-1), 1e-12)
    n2_sq = jnp.maximum(jnp.sum(n2 * n2, axis=-1), 1e-12)
    # sign convention fixed by the atan2(y, x) definition above
    # (m1 = n1 x b2_hat): dphi/dp0 is ALONG +n1, dphi/dp3 along -n2
    dphi_dp0 = (nb2 / n1_sq)[:, None] * n1
    dphi_dp3 = (-nb2 / n2_sq)[:, None] * n2
    c12 = (jnp.sum(b1 * b2, axis=-1) / (nb2 * nb2))[:, None]
    c32 = (jnp.sum(b3 * b2, axis=-1) / (nb2 * nb2))[:, None]
    dphi_dp1 = -(1.0 + c12) * dphi_dp0 + c32 * dphi_dp3
    dphi_dp2 = -dphi_dp0 - dphi_dp1 - dphi_dp3  # translation invariance

    de = de_dphi[:, None]
    ids = jnp.concatenate([idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]])
    contribs = jnp.concatenate([-de * dphi_dp0, -de * dphi_dp1,
                                -de * dphi_dp2, -de * dphi_dp3])
    return e, ids, contribs


def bond_energy_forces(positions, idx, k, r0):
    if idx.shape[0] == 0:
        return jnp.zeros((), positions.dtype), jnp.zeros_like(positions)
    e, ids, contribs = _bond_contribs(positions, idx, k, r0)
    return e, assemble_forces(positions.shape[0], ids, contribs)


def angle_energy_forces(positions, idx, k, t0):
    if idx.shape[0] == 0:
        return jnp.zeros((), positions.dtype), jnp.zeros_like(positions)
    e, ids, contribs = _angle_contribs(positions, idx, k, t0)
    return e, assemble_forces(positions.shape[0], ids, contribs)


def torsion_energy_forces(positions, idx, k, periodicity, phase):
    if idx.shape[0] == 0:
        return jnp.zeros((), positions.dtype), jnp.zeros_like(positions)
    e, ids, contribs = _torsion_contribs(positions, idx, k, periodicity,
                                         phase)
    return e, assemble_forces(positions.shape[0], ids, contribs)


def bonded_energy_forces(positions, system):
    """Closed-form energy and forces of all bonded terms.

    All per-term contributions are concatenated and assembled with a
    single one-hot contraction (one matmul for the whole bonded force)."""
    energy = jnp.zeros((), positions.dtype)
    ids_list, contrib_list = [], []
    if system.bond_idx.shape[0]:
        e, ids, c = _bond_contribs(positions, system.bond_idx,
                                   system.bond_k, system.bond_r0)
        energy, ids_list, contrib_list = energy + e, [ids], [c]
    if system.angle_idx.shape[0]:
        e, ids, c = _angle_contribs(positions, system.angle_idx,
                                    system.angle_k, system.angle_t0)
        energy = energy + e
        ids_list.append(ids)
        contrib_list.append(c)
    if system.torsion_idx.shape[0]:
        e, ids, c = _torsion_contribs(positions, system.torsion_idx,
                                      system.torsion_k, system.torsion_per,
                                      system.torsion_phase)
        energy = energy + e
        ids_list.append(ids)
        contrib_list.append(c)
    if not ids_list:
        return energy, jnp.zeros_like(positions)
    forces = assemble_forces(positions.shape[0],
                             jnp.concatenate(ids_list),
                             jnp.concatenate(contrib_list))
    return energy, forces
