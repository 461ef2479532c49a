"""Dense intra-ligand nonbonded interactions (Coulomb + Lennard-Jones).

TPU-native redesign of ``IsolatedNonbondedForce``
(reference openmmapi/include/IsolatedNonbondedForce.h:47-61 and
platforms/cuda/src/kernels/isolatedNonbonded.cu): instead of one CUDA thread
per pair with linear exclusion/exception scans, pair parameters (with
Lorentz-Berthelot combination, exclusions zeroed, exceptions overridden) are
precomputed host-side into dense [N, N] matrices once, and evaluation is a
masked broadcast over the full pair matrix — ideal for the TPU VPU at ligand
sizes, and trivially vmappable over replicas (the reference's multi-pose
batching use case).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..units import COULOMB_CONST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairTable:
    """Precomputed dense pair parameters for one template ligand."""

    qq: jax.Array        # [N, N] charge products (with 1-4 scaling applied)
    sigma: jax.Array     # [N, N] combined sigma
    epsilon: jax.Array   # [N, N] combined epsilon (with 1-4 scaling applied)
    mask: jax.Array      # [N, N] 1.0 for interacting i<j pairs else 0.0


def build_pair_table(charges, sigmas, epsilons, exclusions=(),
                     exceptions=(), dtype=np.float64) -> PairTable:
    """Build the dense pair table.

    Args:
      charges, sigmas, epsilons: [N] per-atom parameters.
      exclusions: iterable of (i, j) pairs to remove entirely.
      exceptions: iterable of (i, j, chargeProd, sigma, epsilon) overriding
        the combination rule (1-4 interactions). An exception pair is
        evaluated even if also listed as excluded, matching the reference
        semantics where exceptions carry their own parameters.
    """
    charges = np.asarray(charges, dtype=dtype)
    sigmas = np.asarray(sigmas, dtype=dtype)
    epsilons = np.asarray(epsilons, dtype=dtype)
    n = len(charges)

    qq = np.outer(charges, charges)
    sigma = 0.5 * (sigmas[:, None] + sigmas[None, :])
    epsilon = np.sqrt(np.outer(epsilons, epsilons))

    mask = np.triu(np.ones((n, n), dtype=dtype), k=1)
    for (i, j) in exclusions:
        mask[min(i, j), max(i, j)] = 0.0
    for (i, j, cp, sg, ep) in exceptions:
        a, b = min(i, j), max(i, j)
        qq[a, b] = qq[b, a] = cp
        sigma[a, b] = sigma[b, a] = sg
        epsilon[a, b] = epsilon[b, a] = ep
        mask[a, b] = 1.0 if (cp != 0.0 or ep != 0.0) else 0.0

    return PairTable(qq=jnp.asarray(qq), sigma=jnp.asarray(sigma),
                     epsilon=jnp.asarray(epsilon), mask=jnp.asarray(mask))


def pair_energy_forces(table: PairTable, positions):
    """Total pair energy and forces.

    Args:
      table: PairTable.
      positions: [N, 3].

    Returns (energy scalar, forces [N, 3]).
    """
    dtype = table.qq.dtype
    x = jnp.asarray(positions, dtype=dtype)
    dr = x[:, None, :] - x[None, :, :]            # [N, N, 3] (i - j)
    r2 = jnp.sum(dr * dr, axis=-1)
    r2_safe = jnp.where(table.mask > 0, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2_safe)
    inv_r2 = inv_r * inv_r

    coul = COULOMB_CONST * table.qq * inv_r
    sig_r2 = (table.sigma * table.sigma) * inv_r2
    sig_r6 = sig_r2 * sig_r2 * sig_r2
    sig_r12 = sig_r6 * sig_r6
    lj = 4.0 * table.epsilon * (sig_r12 - sig_r6)

    pair_e = table.mask * (coul + lj)
    energy = jnp.sum(pair_e)

    # -dE/dr along dr: F_i += fmag * dr_hat, F_j -= ...
    fmag_over_r = table.mask * (
        coul + 4.0 * table.epsilon * (12.0 * sig_r12 - 6.0 * sig_r6)
    ) * inv_r2
    fvec = fmag_over_r[..., None] * dr            # force on i from j (i<j)
    forces = jnp.sum(fvec, axis=1) - jnp.sum(fvec, axis=0)
    return energy, forces


def pair_energy(table: PairTable, positions):
    return pair_energy_forces(table, positions)[0]
