"""Mesh-sharded grid generation: each device computes an x-slab.

Multi-chip counterpart of ops/gridgen.generate_grid (which the reference
runs on one GPU with host-side chunking, CudaGridForceKernels.cpp:
1164-1214). Generation is embarrassingly parallel over grid points, so the
x-axis is split across the mesh with ``shard_map``: every device evaluates
its own slab against the (replicated) receptor — zero collectives in the
compute, one implicit all-gather only if the caller materializes the full
array on one host.

The returned Grid's ``vals`` (and ``derivs``) are global jax arrays
sharded over the mesh axis, ready either for host gathering
(``np.asarray``) or for direct packing + spatial sharding
(ops.packed.pack_grid -> parallel.shard_packed_grid) without ever living
on a single device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..grid import Grid, InterpolationMethod, InvPowerMode
from ..units import DEFAULT_GRID_CAP, DEFAULT_OOB_K
from ..ops import gridgen as _gg


def generate_grid_sharded(mesh: Mesh,
                          counts,
                          spacing,
                          origin,
                          grid_type: str,
                          receptor_positions,
                          charges,
                          sigmas,
                          epsilons,
                          *,
                          axis: str = "sp",
                          compute_derivatives: bool = False,
                          grid_cap: float = DEFAULT_GRID_CAP,
                          inv_power: float = 0.0,
                          inv_power_mode: InvPowerMode = InvPowerMode.NONE,
                          interp_method: InterpolationMethod =
                          InterpolationMethod.TRILINEAR,
                          oob_k: float = DEFAULT_OOB_K,
                          chunk_size: int = 262144,
                          dtype=jnp.float32) -> Grid:
    """Generate one receptor grid with the x-axis split over ``axis``.

    Semantics (clamps, tanh cap, inverse-power storage transform,
    cell-fractional derivative scaling) match generate_grid exactly; the
    x-axis is zero-padded up to a multiple of the axis size during
    computation and trimmed before the Grid is assembled.
    """
    counts = tuple(int(c) for c in counts)
    nx, ny, nz = counts
    n_dev = mesh.shape[axis]
    per = -(-nx // n_dev)                      # slab height (padded)
    nx_pad = per * n_dev

    spacing_arr = jnp.asarray(spacing, dtype=dtype)
    origin_arr = jnp.asarray(origin, dtype=dtype)
    positions = jnp.asarray(receptor_positions, dtype=dtype)
    charges = jnp.asarray(charges, dtype=dtype)
    sigmas = jnp.asarray(sigmas, dtype=dtype)
    epsilons = jnp.asarray(epsilons, dtype=dtype)

    slab_counts = (per, ny, nz)
    slab_total = per * ny * nz
    # fixed-size point chunks keep the per-device footprint
    # O(chunk_size * num_atoms), same as generate_grid's lax.map streaming
    chunk_size = max(1, min(chunk_size, slab_total))
    n_chunks = max(1, -(-slab_total // chunk_size))
    padded = n_chunks * chunk_size
    idx = jnp.minimum(jnp.arange(padded, dtype=jnp.int32),
                      slab_total - 1).reshape(n_chunks, chunk_size)

    replicated = P()

    def _slab_origin():
        i_dev = jax.lax.axis_index(axis)
        return origin_arr.at[0].add(
            i_dev.astype(dtype) * per * spacing_arr[0])

    def slab_vals(positions, charges, sigmas, epsilons):
        slab_origin = _slab_origin()

        def chunk(flat):
            pts = _gg.grid_point_positions(slab_counts, spacing_arr,
                                           slab_origin, flat)
            vals = _gg._values_at_points(pts, grid_type, positions,
                                         charges, sigmas, epsilons,
                                         grid_cap)
            if inv_power != 0.0 and inv_power_mode != InvPowerMode.NONE:
                sign = jnp.where(vals >= 0.0, 1.0, -1.0)
                vals = sign * jnp.abs(vals) ** (1.0 / inv_power)
            return vals

        out = jax.lax.map(chunk, idx)
        return out.reshape(-1)[:slab_total].reshape(slab_counts)

    def slab_derivs(positions, charges, sigmas, epsilons):
        slab_origin = _slab_origin()

        def chunk(flat):
            pts = _gg.grid_point_positions(slab_counts, spacing_arr,
                                           slab_origin, flat)
            return _gg._derivs_at_points(pts, grid_type, positions,
                                         charges, sigmas, epsilons,
                                         grid_cap, inv_power,
                                         inv_power_mode,
                                         np.asarray(spacing))

        out = jax.lax.map(chunk, idx)
        return out.reshape(-1, 27)[:slab_total].reshape(
            slab_counts + (27,))

    in_specs = (replicated,) * 4
    fn = slab_derivs if compute_derivatives else slab_vals
    sharded = jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                                out_specs=P(axis)))
    out = sharded(positions, charges, sigmas, epsilons)

    # construct the Grid pytree directly: Grid.create round-trips through
    # numpy, which would gather the sharded array onto one host
    out = out[:nx] if nx_pad != nx else out
    if compute_derivatives:
        derivs, vals = out, out[..., 0]
    else:
        derivs, vals = None, out
    return Grid(vals=vals, spacing=spacing_arr, origin=origin_arr,
                derivs=derivs, counts=counts,
                interp_method=int(interp_method),
                inv_power_mode=int(inv_power_mode),
                inv_power=float(inv_power), grid_cap=float(grid_cap),
                oob_k=float(oob_k), grid_type=grid_type)
