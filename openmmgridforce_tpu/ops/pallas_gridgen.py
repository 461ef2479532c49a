"""Pallas TPU kernel for grid-value generation.

Replaces the reference's generateGridKernel CUDA launch
(platforms/cuda/src/kernels/gridGeneration.cu:198-371) with a tiled,
VMEM-resident field summation: each program computes a lane-aligned tile of
grid points; receptor atoms (VMEM-resident) stream through the interaction
tile in sublane blocks, so the point x atom pair tensor never exists in
HBM (the jnp path materializes [chunk, atoms] displacement tensors).

Layout: grid points ride the LANE axis (tile (1, P)), atoms ride the
SUBLANE axis (blocks (B, 1)); the (B, P) interaction tile reduces over
sublanes into the (1, P) output row — no cross-lane relayouts anywhere.

Field conventions match ops/radial.py exactly:
  charge: k q / r; ljr: sqrt(eps) Rmin^6 / r^12; lja: -2 sqrt(eps) Rmin^3/r^6
  with r clamped to >= 1e-6 nm and a final tanh cap
  (gridGeneration.cu:269-271, 340-342).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .radial import GRID_TYPE_CODES
from ..units import COULOMB_CONST, TWO_POW_ONE_SIXTH

POINT_TILE = 1024     # grid points per program, shaped (8, 128)
ATOM_BLOCK = 32       # receptor atoms per inner iteration (leading axis)
# ((32, 8, 128) interaction tiles tuned on v5e: 16->24->35 Gpairs/s for
# B=16/64/32; larger blocks spill vregs


def _gen_kernel(atoms_ref, out_ref, *, grid_type_code, counts, spacing,
                origin, grid_cap, n_atom_blocks):
    """One program: POINT_TILE grid points vs all atoms.

    atoms_ref: [A_pad, 4] rows (x, y, z, K) with K the per-atom field
               strength (k*q, sqrt(eps)*Rmin^6, or -2*sqrt(eps)*Rmin^3).
    out_ref:   [8, 128] capped values for this tile (POINT_TILE points).
    """
    tile = pl.program_id(0)
    nyz = counts[1] * counts[2]

    flat = (tile * POINT_TILE
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
    i = flat // nyz
    rem = flat % nyz
    j = rem // counts[2]
    k = rem % counts[2]
    gx = (origin[0] + i.astype(jnp.float32) * spacing[0])[None]  # (1,8,128)
    gy = (origin[1] + j.astype(jnp.float32) * spacing[1])[None]
    gz = (origin[2] + k.astype(jnp.float32) * spacing[2])[None]

    def body(b, acc):
        a0 = b * ATOM_BLOCK
        ax = atoms_ref[pl.ds(a0, ATOM_BLOCK), 0:1][:, :, None]  # (B,1,1)
        ay = atoms_ref[pl.ds(a0, ATOM_BLOCK), 1:2][:, :, None]
        az = atoms_ref[pl.ds(a0, ATOM_BLOCK), 2:3][:, :, None]
        K = atoms_ref[pl.ds(a0, ATOM_BLOCK), 3:4][:, :, None]
        dx = gx - ax                                      # (B, 8, 128)
        dy = gy - ay
        dz = gz - az
        r2 = dx * dx + dy * dy + dz * dz
        r2 = jnp.maximum(r2, 1e-12)                       # r >= 1e-6 nm
        inv_r = jax.lax.rsqrt(r2)
        if grid_type_code == 0:       # charge: K / r
            contrib = K * inv_r
        elif grid_type_code == 1:     # ljr: K / r^12
            inv_r2 = inv_r * inv_r
            inv_r4 = inv_r2 * inv_r2
            contrib = K * (inv_r4 * inv_r4 * inv_r4)
        else:                         # lja: K / r^6
            inv_r2 = inv_r * inv_r
            contrib = K * (inv_r2 * inv_r2 * inv_r2)
        return acc + jnp.sum(contrib, axis=0)             # (8, 128)

    total = jax.lax.fori_loop(0, n_atom_blocks, body,
                              jnp.zeros((8, 128), jnp.float32))

    # tanh cap with explicit saturation (backend tanh NaNs above ~20)
    u = total / grid_cap
    uc = jnp.clip(u, -20.0, 20.0)
    capped = grid_cap * jnp.where(
        u > 20.0, 1.0, jnp.where(u < -20.0, -1.0, jnp.tanh(uc)))
    out_ref[:, :] = capped


def generate_grid_values_pallas(counts, spacing, origin, grid_type,
                                receptor_positions, charges, sigmas,
                                epsilons, grid_cap, interpret=False):
    """Capped field values [nx, ny, nz] via the Pallas kernel (float32)."""
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
    atoms = np.full((A_pad, 4), 1.0e3, np.float32)   # padding: far away
    atoms[:A, :3] = pos
    atoms[:, 3] = 0.0
    atoms[:A, 3] = kparam

    total = counts[0] * counts[1] * counts[2]
    n_tiles = -(-total // POINT_TILE)

    kernel = functools.partial(
        _gen_kernel,
        grid_type_code=code,
        counts=counts,
        spacing=tuple(float(s) for s in spacing),
        origin=tuple(float(o) for o in origin),
        grid_cap=float(grid_cap),
        n_atom_blocks=A_pad // ATOM_BLOCK,
    )

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            # atom table is small (A_pad x 4, lane-padded ~5 MB at 10k
            # atoms): keep fully VMEM-resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(atoms))

    return out.reshape(-1)[:total].reshape(counts)
