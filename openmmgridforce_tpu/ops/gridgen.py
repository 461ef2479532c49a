"""Grid generation: receptor fields sampled on a rectilinear grid.

TPU-native re-design of the reference's generation kernels
(platforms/cuda/src/kernels/gridGeneration.cu): a broadcast
(grid_chunk x receptor_atoms) contraction evaluated under ``lax.map`` over
chunks so arbitrarily large grids stream through fixed-size device buffers
(replacing the reference's cuLaunchKernel chunking at
CudaGridForceKernels.cpp:1164-1214).

Pipelines (matching the reference order of operations):
  values only:  sum fields -> tanh cap -> [inv-power if enabled]
                (gridGeneration.cu:198-371; note: the value path applies the
                inv-power transform for ANY mode != NONE with inv_power != 0,
                matching generateGridKernel which has no mode argument)
  derivatives:  sum 27 Cartesian derivatives (radial tables + tensor
                cascade) -> exact tanh chain rule -> [inv-power chain rule if
                STORED] -> scale to cell-fractional units
                (gridGeneration.cu:24-196)

Clamps mirror the reference: r >= 1e-6 nm for values, r^2 >= 4e-4 nm^2 for
derivatives (gridGeneration.cu:270, :91).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid, InterpolationMethod, InvPowerMode
from ..units import DEFAULT_GRID_CAP, DEFAULT_OOB_K
from . import radial
from .chain_rules import apply_invpower, apply_tanh_cap, tanh_cap_value
from .derivatives27 import DERIV_ORDERS

_R_MIN_VALUES = 1e-6      # nm      (gridGeneration.cu:270)
_R2_MIN_DERIVS = 4e-4     # nm^2    (gridGeneration.cu:90-93)


def grid_point_positions(counts, spacing, origin, flat_index):
    """Positions of grid points given flat (z-fastest) indices. [..., 3]."""
    nx, ny, nz = counts
    nyz = ny * nz
    i = flat_index // nyz
    rem = flat_index % nyz
    j = rem // nz
    k = rem % nz
    ijk = jnp.stack([i, j, k], axis=-1)
    return origin + ijk * spacing


def _values_at_points(points, grid_type, positions, charges, sigmas,
                      epsilons, grid_cap, lj_convention="rmin"):
    """Capped field values at points [..., 3]; receptor arrays [A]."""
    dr = points[..., None, :] - positions          # [..., A, 3]
    r = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
    r = jnp.maximum(r, _R_MIN_VALUES)
    contrib = radial.field_value(r, grid_type, charges, sigmas, epsilons,
                                 lj_convention)
    total = jnp.sum(contrib, axis=-1)
    return tanh_cap_value(total, grid_cap)


def _postprocess_raw_derivs(chunk, *, grid_cap, inv_power, inv_power_mode,
                            spacing):
    """Cap/transform/scale raw 27-derivative sums ([..., 27]): the cheap
    per-point tail of generateGridWithAnalyticalDerivatives
    (gridGeneration.cu:118-195) shared by the jnp and Pallas paths."""
    V = apply_tanh_cap(chunk, grid_cap)
    if inv_power != 0.0 and inv_power_mode == InvPowerMode.STORED:
        V = apply_invpower(V, 1.0 / inv_power)
    scale = np.array([
        math.prod(float(sp) ** o for sp, o in zip(spacing, orders))
        for orders in DERIV_ORDERS])
    return V * jnp.asarray(scale, dtype=V.dtype)


def _resolve_backend(backend: str, dtype) -> str:
    """Resolve backend="auto": Pallas on a TPU-like default device for
    float32 work (the kernels are TPU-tiled; measured 35 Gpair/s for
    values vs ~10 for jnp chunks), jnp everywhere else. Pallas remains
    opt-in-only on CPU (interpret mode is for tests)."""
    if backend != "auto":
        return backend
    if jnp.dtype(dtype) != jnp.float32:
        return "jnp"
    platform = jax.devices()[0].platform
    return "pallas" if platform in ("tpu", "axon") else "jnp"


_DERIV_ATOM_CHUNK = 512


def _derivs_at_points(points, grid_type, positions, charges, sigmas,
                      epsilons, grid_cap, inv_power, inv_power_mode,
                      spacing, lj_convention="rmin"):
    """All 27 cell-fractional derivatives at points [..., 3] -> [..., 27].

    Receptor atoms stream through fixed-size chunks under lax.scan so the
    [points, atoms, 27] Cartesian-derivative tensor never materializes
    (XLA cannot fuse the 27-way stack into the atom reduction; at 16k
    points x 9k atoms that tensor alone is 15 GB)."""
    A = positions.shape[0]
    C = min(_DERIV_ATOM_CHUNK, A)
    n_chunks = -(-A // C)
    A_pad = n_chunks * C
    if A_pad != A:
        # padding: far-away positions with zero strength contribute zero
        # for every grid type (K factors vanish)
        pad = A_pad - A
        positions = jnp.concatenate(
            [positions, jnp.full((pad, 3), 1.0e3, positions.dtype)])
        charges = jnp.concatenate([charges,
                                   jnp.zeros((pad,), charges.dtype)])
        sigmas = jnp.concatenate([sigmas,
                                  jnp.full((pad,), 0.1, sigmas.dtype)])
        epsilons = jnp.concatenate([epsilons,
                                    jnp.zeros((pad,), epsilons.dtype)])
    pos_c = positions.reshape(n_chunks, C, 3)
    q_c = charges.reshape(n_chunks, C)
    s_c = sigmas.reshape(n_chunks, C)
    e_c = epsilons.reshape(n_chunks, C)

    def body(acc, chunk):
        cpos, cq, cs, ce = chunk
        dr = points[..., None, :] - cpos           # [..., C, 3]
        r2 = jnp.sum(dr * dr, axis=-1)
        r2c = jnp.maximum(r2, _R2_MIN_DERIVS)
        rad = radial.radial_derivatives(r2c, grid_type, cq, cs, ce,
                                        lj_convention)
        # per-component atom reduction: the [..., C, 27] tensor never
        # materializes (each slot fuses elementwise work into its own sum)
        cart = radial.radial_to_cartesian(dr, rad, reduce_axis=-1)
        return acc + cart, None

    # derive the carry from ``points`` so it inherits any shard_map
    # varying axes (a plain zeros constant is unvarying and rejects the
    # varying scan output under manual sharding)
    U0 = jnp.zeros(points.shape[:-1] + (27,), points.dtype) \
        + 0.0 * points[..., :1]
    U, _ = jax.lax.scan(body, U0, (pos_c, q_c, s_c, e_c))

    V = apply_tanh_cap(U, grid_cap)
    if inv_power != 0.0 and inv_power_mode == InvPowerMode.STORED:
        V = apply_invpower(V, 1.0 / inv_power)

    scale = np.array([
        math.prod(float(s) ** o for s, o in zip(spacing, orders))
        for orders in DERIV_ORDERS
    ])
    return V * jnp.asarray(scale, dtype=V.dtype)


def _device_memory_budget():
    """Usable accelerator memory in bytes, or None when unbounded/unknown.

    The reference mitigates generation OOM proactively (skips derivatives
    above 80% free GPU memory, CudaGridForceKernels.cpp:527-535, and caps
    chunks at <=50% free memory, :1176-1184); here the same check turns a
    certain device OOM into an actionable error pointing at the tiled
    path. CPU backends are treated as unbounded.
    """
    import jax

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        return None
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    limit = stats.get("bytes_limit")
    in_use = stats.get("bytes_in_use", 0)
    if limit:
        return int(0.8 * (limit - in_use))
    # stats unavailable (e.g. tunneled devices): assume the v5e's 16 GB HBM
    return int(0.8 * (16 << 30))


def _check_grid_fits(total_points, compute_derivatives, itemsize):
    budget = _device_memory_budget()
    if budget is None:
        return
    # full grid + (27-derivative array) + one staging copy
    factor = (28 + 27) if compute_derivatives else 2
    need = total_points * itemsize * factor
    if need > budget:
        what = " with 27 derivatives" if compute_derivatives else ""
        raise ValueError(
            f"grid of {total_points:,} points{what} needs ~{need/1e9:.1f} "
            f"GB on device (>{budget/1e9:.1f} GB available); use "
            "generate_grid_to_tiled_file + StreamedGridEvaluator for "
            "out-of-core grids, or drop compute_derivatives "
            "(B-spline/trilinear do not need them)")


def generate_grid(counts,
                  spacing,
                  origin,
                  grid_type: str,
                  receptor_positions,
                  charges,
                  sigmas,
                  epsilons,
                  *,
                  compute_derivatives: bool = False,
                  grid_cap: float = DEFAULT_GRID_CAP,
                  inv_power: float = 0.0,
                  inv_power_mode: InvPowerMode = InvPowerMode.NONE,
                  interp_method: InterpolationMethod =
                  InterpolationMethod.TRILINEAR,
                  oob_k: float = DEFAULT_OOB_K,
                  chunk_size: int = 262144,
                  backend: str = "auto",
                  lj_convention: str = "rmin",
                  dtype=jnp.float32) -> Grid:
    """Generate one receptor grid (optionally with 27 analytic derivatives).

    Streams the grid through fixed-size chunks with ``lax.map`` so the peak
    device footprint is O(chunk_size * num_atoms) regardless of grid size.

    ``backend``: "auto" (default: the Pallas TPU kernels on a TPU-like
    default device when eligible — float32, rmin convention — else jnp),
    "jnp" (any dtype, any platform) or "pallas" (float32 TPU kernels for
    values and for the 27 raw derivatives; ineligible configs fall back
    to jnp).

    Returns a :class:`Grid`. When derivatives are computed, ``vals`` is the
    d=0 slice of the derivative array — NOTE this matches the reference's
    analytic-derivative path, whose value differs from the values-only path
    below 0.1*cap (the tanh chain rule passthrough, see
    chain_rules.apply_tanh_cap) and in the r-clamp convention.
    """
    counts = tuple(int(c) for c in counts)
    nx, ny, nz = counts
    total = nx * ny * nz
    backend = _resolve_backend(backend, dtype)
    _check_grid_fits(total, compute_derivatives, np.dtype(dtype).itemsize)
    spacing_arr = jnp.asarray(spacing, dtype=dtype)
    origin_arr = jnp.asarray(origin, dtype=dtype)
    positions = jnp.asarray(receptor_positions, dtype=dtype)
    charges = jnp.asarray(charges, dtype=dtype)
    sigmas = jnp.asarray(sigmas, dtype=dtype)
    epsilons = jnp.asarray(epsilons, dtype=dtype)

    # never pad a small grid up to a full chunk: the pair block is
    # [chunk, atoms], and a 262144-point pad against a 9k-atom receptor
    # would materialize ~10 GB for a grid of any size
    chunk_size = max(1, min(chunk_size, total))
    n_chunks = max(1, -(-total // chunk_size))
    padded = n_chunks * chunk_size
    idx = jnp.arange(padded, dtype=jnp.int32).reshape(n_chunks, chunk_size)
    # clamp padding to the last valid point; those outputs are discarded
    idx = jnp.minimum(idx, total - 1)

    def value_chunk(flat_index):
        pts = grid_point_positions(counts, spacing_arr, origin_arr,
                                   flat_index)
        vals = _values_at_points(pts, grid_type, positions, charges, sigmas,
                                 epsilons, grid_cap, lj_convention)
        if inv_power != 0.0 and inv_power_mode != InvPowerMode.NONE:
            # values-only storage transform (gridGeneration.cu:350-361);
            # no 1e-10 dead zone on the generation side
            sign = jnp.where(vals >= 0.0, 1.0, -1.0)
            vals = sign * jnp.abs(vals) ** (1.0 / inv_power)
        return vals

    def deriv_chunk(flat_index):
        pts = grid_point_positions(counts, spacing_arr, origin_arr,
                                   flat_index)
        return _derivs_at_points(pts, grid_type, positions, charges, sigmas,
                                 epsilons, grid_cap, inv_power,
                                 inv_power_mode, np.asarray(spacing),
                                 lj_convention)

    use_pallas = (backend == "pallas" and lj_convention == "rmin"
                  and (compute_derivatives or inv_power == 0.0))
    if compute_derivatives and use_pallas:
        from .pallas_gridgen_derivs import generate_raw_derivs_pallas
        raw = generate_raw_derivs_pallas(
            counts, spacing, origin, grid_type, receptor_positions,
            charges, sigmas, epsilons)
        post = jax.jit(partial(_postprocess_raw_derivs,
                               grid_cap=grid_cap, inv_power=inv_power,
                               inv_power_mode=inv_power_mode,
                               spacing=tuple(float(s) for s in spacing)))
        raw_flat = raw.reshape(total, 27)
        pad27 = padded - total
        if pad27:
            raw_flat = jnp.concatenate(
                [raw_flat, jnp.zeros((pad27, 27), raw_flat.dtype)])
        derivs = jax.lax.map(post, raw_flat.reshape(n_chunks, chunk_size,
                                                    27))
        derivs = derivs.reshape(padded, 27)[:total].reshape(
            nx, ny, nz, 27).astype(dtype)
        vals = derivs[..., 0]
    elif compute_derivatives:
        derivs = jax.lax.map(jax.jit(deriv_chunk), idx)
        derivs = derivs.reshape(padded, 27)[:total].reshape(nx, ny, nz, 27)
        vals = derivs[..., 0]
    elif use_pallas:
        from .pallas_gridgen import generate_grid_values_pallas
        vals = generate_grid_values_pallas(
            counts, spacing, origin, grid_type, receptor_positions,
            charges, sigmas, epsilons, grid_cap).astype(dtype)
        derivs = None
    else:
        vals = jax.lax.map(jax.jit(value_chunk), idx)
        vals = vals.reshape(padded)[:total].reshape(nx, ny, nz)
        derivs = None

    return Grid(
        vals=vals,
        derivs=derivs,
        spacing=spacing_arr,
        origin=origin_arr,
        counts=counts,
        interp_method=int(interp_method),
        inv_power_mode=int(inv_power_mode),
        inv_power=float(inv_power),
        grid_cap=float(grid_cap),
        oob_k=float(oob_k),
        grid_type=grid_type,
    )


def auto_scaling_factors(grid_type: str, charges, sigmas, epsilons,
                         convention: str = "rmin"):
    """Per-atom scaling factors for a grid type.

    ``convention``:
      * "rmin":     sqrt(eps) * Rmin^k with Rmin = 2^(1/6) sigma — the
                    CUDA/common platform convention
                    (CudaGridForceKernels.cpp:172-185), consistent with the
                    generated fields above.
      * "diameter": sqrt(eps) * (2 sigma)^k — the reference-platform
                    convention (ReferenceGridForceKernels.cpp:196-205).
    """
    charges = jnp.asarray(charges)
    sigmas = jnp.asarray(sigmas)
    epsilons = jnp.asarray(epsilons)
    if grid_type == "charge":
        return charges
    if convention == "rmin":
        from ..units import TWO_POW_ONE_SIXTH
        d = TWO_POW_ONE_SIXTH * sigmas
    elif convention == "diameter":
        d = 2.0 * sigmas
    else:
        raise ValueError(f"unknown convention {convention!r}")
    if grid_type == "ljr":
        return jnp.sqrt(epsilons) * d ** 6
    if grid_type == "lja":
        return jnp.sqrt(epsilons) * d ** 3
    raise ValueError(f"unknown grid type {grid_type!r}")


def generate_grid_to_tiled_file(path,
                                counts,
                                spacing,
                                origin,
                                grid_type: str,
                                receptor_positions,
                                charges,
                                sigmas,
                                epsilons,
                                *,
                                tile_size: int = 32,
                                compute_derivatives: bool = False,
                                grid_cap: float = DEFAULT_GRID_CAP,
                                inv_power: float = 0.0,
                                inv_power_mode: InvPowerMode =
                                InvPowerMode.NONE,
                                backend: str = "auto",
                                dtype=jnp.float32,
                                progress=None) -> None:
    """Generate a grid directly into an OMGTILE file, tile by tile.

    The counterpart of the reference's generateGridToTiledFile
    (CudaGridForceKernels.cpp:1411-1658): grids too large to hold in
    device or host memory stream through one tile-sized buffer. Each tile
    is one jitted evaluation (a single compile serves every full-size tile;
    boundary tiles get their own shapes).

    ``progress``: optional callback(tile_index, total_tiles).
    """
    from ..io.omgtile import TiledGridWriter, num_tiles, tile_range

    counts = tuple(int(c) for c in counts)
    backend = _resolve_backend(backend, dtype)
    spacing_arr = jnp.asarray(spacing, dtype=dtype)
    positions = jnp.asarray(receptor_positions, dtype=dtype)
    charges = jnp.asarray(charges, dtype=dtype)
    sigmas = jnp.asarray(sigmas, dtype=dtype)
    epsilons = jnp.asarray(epsilons, dtype=dtype)
    origin_arr = jnp.asarray(origin, dtype=dtype)

    @partial(jax.jit, static_argnames=("shape",))
    def tile_values(start, shape):
        ijk = jnp.stack(jnp.meshgrid(
            start[0] + jnp.arange(shape[0]),
            start[1] + jnp.arange(shape[1]),
            start[2] + jnp.arange(shape[2]), indexing="ij"),
            axis=-1).astype(dtype)
        pts = origin_arr + ijk * spacing_arr
        vals = _values_at_points(pts, grid_type, positions, charges,
                                 sigmas, epsilons, grid_cap)
        if inv_power != 0.0 and inv_power_mode != InvPowerMode.NONE:
            sign = jnp.where(vals >= 0.0, 1.0, -1.0)
            vals = sign * jnp.abs(vals) ** (1.0 / inv_power)
        return vals

    @partial(jax.jit, static_argnames=("shape",))
    def tile_derivs(start, shape):
        ijk = jnp.stack(jnp.meshgrid(
            start[0] + jnp.arange(shape[0]),
            start[1] + jnp.arange(shape[1]),
            start[2] + jnp.arange(shape[2]), indexing="ij"),
            axis=-1).astype(dtype)
        pts = origin_arr + ijk * spacing_arr
        return _derivs_at_points(pts, grid_type, positions, charges,
                                 sigmas, epsilons, grid_cap, inv_power,
                                 inv_power_mode, np.asarray(spacing))

    post_derivs = jax.jit(partial(_postprocess_raw_derivs,
                                  grid_cap=grid_cap, inv_power=inv_power,
                                  inv_power_mode=inv_power_mode,
                                  spacing=tuple(float(s)
                                                for s in spacing)))

    ntx, nty, ntz = num_tiles(counts, tile_size)
    total_tiles = ntx * nty * ntz
    done = 0
    with TiledGridWriter(path, counts, spacing, origin,
                         tile_size=tile_size,
                         has_derivatives=compute_derivatives,
                         inv_power=inv_power,
                         inv_power_mode=int(inv_power_mode)) as writer:
        for tx in range(ntx):
            for ty in range(nty):
                for tz in range(ntz):
                    x0, y0, z0, x1, y1, z1 = tile_range(
                        counts, tile_size, tx, ty, tz)
                    shape = (x1 - x0, y1 - y0, z1 - z0)
                    start = jnp.asarray([x0, y0, z0])
                    if compute_derivatives and backend == "pallas":
                        from .pallas_gridgen_derivs import (
                            generate_raw_derivs_pallas)
                        tile_org = tuple(
                            float(o) + int(st) * float(sp)
                            for o, st, sp in zip(origin, (x0, y0, z0),
                                                 spacing))
                        raw = generate_raw_derivs_pallas(
                            shape, spacing, tile_org, grid_type,
                            receptor_positions, charges, sigmas,
                            epsilons)
                        D = np.asarray(post_derivs(raw))
                        writer.write_tile(tx, ty, tz, D[..., 0],
                                          np.moveaxis(D, -1, 0))
                    elif compute_derivatives:
                        D = np.asarray(tile_derivs(start, shape))
                        vals = D[..., 0]
                        derivs = np.moveaxis(D, -1, 0)
                        writer.write_tile(tx, ty, tz, vals, derivs)
                    elif backend == "pallas" and inv_power == 0.0:
                        from .pallas_gridgen import (
                            generate_grid_values_pallas)
                        tile_org = tuple(
                            float(o) + int(st) * float(sp)
                            for o, st, sp in zip(origin, (x0, y0, z0),
                                                 spacing))
                        v = generate_grid_values_pallas(
                            shape, spacing, tile_org, grid_type,
                            receptor_positions, charges, sigmas, epsilons,
                            grid_cap)
                        writer.write_tile(tx, ty, tz, np.asarray(v))
                    else:
                        writer.write_tile(tx, ty, tz,
                                          np.asarray(tile_values(start,
                                                                 shape)))
                    done += 1
                    if progress is not None:
                        progress(done, total_tiles)
