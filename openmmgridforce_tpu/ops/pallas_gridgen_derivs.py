"""Pallas TPU kernel: raw 27-derivative field summation.

Computes U and all its mixed partials (orders <= 2 per axis) summed over
receptor atoms, per grid point — the pair-interaction part of
generateGridWithAnalyticalDerivatives (reference gridGeneration.cu:24-116).
The per-POINT post-processing (tanh cap chain rule, inverse-power chain,
cell-fractional scaling — gridGeneration.cu:118-195) is cheap and stays in
jnp on the kernel's 27 outputs.

Same tiling as the values kernel: points ride (8, 128) tiles, atoms stream
through the (B, 8, 128) interaction tile in VMEM; the 27 per-pair
derivative components reduce over atoms inside the loop, so nothing of
size [points, atoms, 27] ever exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .radial import _COEF_M1, _COEF_M6, _COEF_M12, GRID_TYPE_CODES
from ..units import COULOMB_CONST, TWO_POW_ONE_SIXTH

POINT_TILE = 1024     # (8, 128) grid points per program
ATOM_BLOCK = 8        # atoms per inner iteration (leading axis)

_COEFS = {0: _COEF_M1, 1: _COEF_M12, 2: _COEF_M6}
_POWER = {0: 1, 1: 12, 2: 6}


def _derivs_kernel(atoms_ref, *out_refs, grid_type_code, counts, spacing,
                   origin, n_atom_blocks):
    tile = pl.program_id(0)
    nyz = counts[1] * counts[2]

    flat = (tile * POINT_TILE
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
    i = flat // nyz
    rem = flat % nyz
    j = rem // counts[2]
    k = rem % counts[2]
    gx = (origin[0] + i.astype(jnp.float32) * spacing[0])[None]
    gy = (origin[1] + j.astype(jnp.float32) * spacing[1])[None]
    gz = (origin[2] + k.astype(jnp.float32) * spacing[2])[None]

    coefs = _COEFS[grid_type_code]
    m = _POWER[grid_type_code]

    def body(b, accs):
        a0 = b * ATOM_BLOCK
        ax = atoms_ref[pl.ds(a0, ATOM_BLOCK), 0:1][:, :, None]
        ay = atoms_ref[pl.ds(a0, ATOM_BLOCK), 1:2][:, :, None]
        az = atoms_ref[pl.ds(a0, ATOM_BLOCK), 2:3][:, :, None]
        K = atoms_ref[pl.ds(a0, ATOM_BLOCK), 3:4][:, :, None]
        dx = gx - ax                                 # (B, 8, 128)
        dy = gy - ay
        dz = gz - az
        r2 = dx * dx + dy * dy + dz * dz
        r2 = jnp.maximum(r2, 4e-4)                   # derivative r clamp
        inv_r = jax.lax.rsqrt(r2)

        # radial derivatives d^n U / dr^n = coefs[n] * K / r^(m+n)
        inv_rm = inv_r
        for _ in range(m - 1):
            inv_rm = inv_rm * inv_r
        base = K * inv_rm
        dU = coefs[1] * base * inv_r
        d2U = coefs[2] * base * (inv_r * inv_r)
        i2 = inv_r * inv_r
        i3 = i2 * inv_r
        i4 = i2 * i2
        i5 = i4 * inv_r
        i6 = i4 * i2
        d3U = coefs[3] * base * i3
        d4U = coefs[4] * base * i4
        d5U = coefs[5] * base * i5
        d6U = coefs[6] * base * i6
        U = coefs[0] * base

        nx = dx * inv_r
        ny = dy * inv_r
        nz = dz * inv_r
        nx2 = nx * nx
        ny2 = ny * ny
        nz2 = nz * nz

        A2 = d2U - dU * inv_r
        A3 = d3U - 3.0 * d2U * inv_r + 3.0 * dU * i2
        B3 = d2U * inv_r - dU * i2
        A4 = d4U - 6.0 * d3U * inv_r + 15.0 * d2U * i2 - 15.0 * dU * i3
        B4 = d3U * inv_r - 3.0 * d2U * i2 + 3.0 * dU * i3
        C4 = d2U * i2 - dU * i3
        A5 = (d5U - 10.0 * d4U * inv_r + 45.0 * d3U * i2
              - 105.0 * d2U * i3 + 105.0 * dU * i4)
        B5 = (d4U * inv_r - 6.0 * d3U * i2 + 15.0 * d2U * i3
              - 15.0 * dU * i4)
        C5 = d3U * i2 - 3.0 * d2U * i3 + 3.0 * dU * i4
        A6 = (d6U - 15.0 * d5U * inv_r + 105.0 * d4U * i2
              - 420.0 * d3U * i3 + 945.0 * d2U * i4 - 945.0 * dU * i5)
        B6 = (d5U * inv_r - 10.0 * d4U * i2 + 45.0 * d3U * i3
              - 105.0 * d2U * i4 + 105.0 * dU * i5)
        C6 = d4U * i2 - 6.0 * d3U * i3 + 15.0 * d2U * i4 - 15.0 * dU * i5
        D6 = d3U * i3 - 3.0 * d2U * i4 + 3.0 * dU * i5
        dUr = dU * inv_r

        terms = (
            U,
            dU * nx, dU * ny, dU * nz,
            A2 * nx2 + dUr, A2 * nx * ny, A2 * nx * nz,
            A2 * ny2 + dUr, A2 * ny * nz, A2 * nz2 + dUr,
            A3 * nx2 * ny + B3 * ny, A3 * nx2 * nz + B3 * nz,
            A3 * nx * ny2 + B3 * nx, A3 * nx * ny * nz,
            A3 * ny2 * nz + B3 * nz, A3 * nx * nz2 + B3 * nx,
            A3 * ny * nz2 + B3 * ny,
            A4 * nx2 * ny2 + B4 * (nx2 + ny2) + C4,
            A4 * nx2 * nz2 + B4 * (nx2 + nz2) + C4,
            A4 * ny2 * nz2 + B4 * (ny2 + nz2) + C4,
            A4 * nx2 * ny * nz + B4 * ny * nz,
            A4 * nx * ny2 * nz + B4 * nx * nz,
            A4 * nx * ny * nz2 + B4 * nx * ny,
            A5 * nx2 * ny2 * nz + B5 * (nx2 + ny2) * nz + C5 * nz,
            A5 * nx2 * ny * nz2 + B5 * (ny * nz2 + nx2 * ny) + C5 * ny,
            A5 * nx * ny2 * nz2 + B5 * (nx * nz2 + nx * ny2) + C5 * nx,
            (A6 * nx2 * ny2 * nz2
             + B6 * (nx2 * ny2 + nx2 * nz2 + ny2 * nz2)
             + C6 * (nx2 + ny2 + nz2) + D6),
        )
        return tuple(acc + jnp.sum(t, axis=0)
                     for acc, t in zip(accs, terms))

    init = tuple(jnp.zeros((8, 128), jnp.float32) for _ in range(27))
    accs = jax.lax.fori_loop(0, n_atom_blocks, body, init)
    for ref, acc in zip(out_refs, accs):
        ref[:, :] = acc


def generate_raw_derivs_pallas(counts, spacing, origin, grid_type,
                               receptor_positions, charges, sigmas,
                               epsilons, interpret=False):
    """Uncapped, unscaled 27-derivative sums [nx, ny, nz, 27] (float32).

    Apply chain_rules.apply_tanh_cap / apply_invpower and the
    cell-fractional spacing scale afterwards (one cheap jnp pass)."""
    counts = tuple(int(c) for c in counts)
    code = GRID_TYPE_CODES[grid_type]
    pos = np.asarray(receptor_positions, np.float32)
    A = pos.shape[0]

    q = np.asarray(charges, np.float64)
    sig = np.asarray(sigmas, np.float64)
    eps = np.asarray(epsilons, np.float64)
    if grid_type == "charge":
        kparam = COULOMB_CONST * q
    elif grid_type == "ljr":
        kparam = np.sqrt(eps) * (TWO_POW_ONE_SIXTH * sig) ** 6
    else:
        kparam = -2.0 * np.sqrt(eps) * (TWO_POW_ONE_SIXTH * sig) ** 3

    A_pad = -(-A // ATOM_BLOCK) * ATOM_BLOCK
    atoms = np.full((A_pad, 4), 1.0e3, np.float32)
    atoms[:A, :3] = pos
    atoms[:, 3] = 0.0
    atoms[:A, 3] = kparam

    total = counts[0] * counts[1] * counts[2]
    n_tiles = -(-total // POINT_TILE)

    kernel = functools.partial(
        _derivs_kernel,
        grid_type_code=code,
        counts=counts,
        spacing=tuple(float(s) for s in spacing),
        origin=tuple(float(o) for o in origin),
        n_atom_blocks=A_pad // ATOM_BLOCK,
    )

    out_shape = [jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32)
                 for _ in range(27)]
    out_specs = [pl.BlockSpec((8, 128), lambda t: (t, 0),
                              memory_space=pltpu.VMEM) for _ in range(27)]
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(atoms))

    stacked = jnp.stack([o.reshape(-1)[:total] for o in outs], axis=-1)
    return stacked.reshape(counts + (27,))
