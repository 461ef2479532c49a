"""Spatially-sharded packed grids over a device mesh.

The reference streams oversized grids through an LRU tile cache on one GPU
(TileManager, platforms/cuda/src/TileManager.h:196-334). The TPU-native
equivalent shards the grid once across the mesh and keeps it resident:
the packed per-cell coefficient array [ncells, K] is split along the
x-cell axis over mesh axis ``sp``; every device evaluates all atoms against
its own slab (atoms whose cell falls outside contribute zero) and a single
``psum`` over ``sp`` reduces energies and forces — one small collective per
evaluation riding ICI, zero host traffic.

Because packing folds each cell's full interpolation stencil into that
cell's own coefficient row, sharded evaluation needs NO halo exchange at
all — the halo problem exists only at pack time, where XLA's SPMD
partitioner inserts the (one-time) boundary communication automatically
when the packing contraction is jitted with sharded inputs.

Layout notes: with a combined ("dp", "sp") mesh, replica batches shard over
``dp`` while the grid shards over ``sp``; the psum stays inside each dp
group. HBM capacity scales linearly with |sp| (a 47 GB triquintic grid
fits on a v5e-8 slice that could never hold it on one chip).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.interpolate import GridEval


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedPackedGrid:
    """Packed (possibly multi-) grid coefficient rows sharded over sp.

    ``coeffs`` is the GLOBAL array (padded so x-cells divide the axis
    size), placed with NamedSharding(P("sp")); evaluation uses shard_map
    and sees only the local slab. ``n_grids`` > 1 carries a fused
    MultiPackedGrid (one gather serves all fused grids per atom).
    """

    coeffs: jax.Array            # [ncells_padded, K_row], sharded over sp
    spacing: jax.Array
    origin: jax.Array
    counts: tuple = dataclasses.field(default=(0, 0, 0),
                                      metadata=dict(static=True))
    degree: int = dataclasses.field(default=2, metadata=dict(static=True))
    n_grids: int = dataclasses.field(default=1, metadata=dict(static=True))
    back_powers: tuple = dataclasses.field(default=(0.0,),
                                           metadata=dict(static=True))
    oob_k: float = dataclasses.field(default=0.0,
                                     metadata=dict(static=True))
    ncx_padded: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))
    # "monomial" (PackedGrid rows) or "hermite" (corner-derivative rows,
    # bounded-basis accuracy tier); method only matters for "hermite"
    form: str = dataclasses.field(default="monomial",
                                  metadata=dict(static=True))
    method: int = dataclasses.field(default=0, metadata=dict(static=True))
    poly_basis: str = dataclasses.field(default="monomial",
                                        metadata=dict(static=True))

    @property
    def cell_counts(self):
        nx, ny, nz = self.counts
        return (nx - 1, ny - 1, nz - 1)


def shard_packed_grid(packed, mesh: Mesh,
                      axis: str = "sp") -> ShardedPackedGrid:
    """Place a PackedGrid or MultiPackedGrid on the mesh, sharded along
    x-cells over ``axis``.

    Pads the x-cell dimension to a multiple of the axis size with zero
    coefficient rows (padding cells are never addressed: cell indices are
    clamped to real cells before lookup).
    """
    from ..ops.packed import (HermitePackedGrid, MultiHermitePackedGrid,
                              MultiPackedGrid)

    form, method, degree = "monomial", 0, getattr(packed, "degree", 0)
    poly_basis = getattr(packed, "poly_basis", "monomial")
    if isinstance(packed, (HermitePackedGrid, MultiHermitePackedGrid)):
        form, method, degree = "hermite", packed.method, 0
    if isinstance(packed, (MultiPackedGrid, MultiHermitePackedGrid)):
        n_grids = packed.n_grids
        back_powers = packed.back_powers
    else:
        n_grids = 1
        back_powers = (packed.back_power,)

    n_dev = mesh.shape[axis]
    ncx, ncy, ncz = packed.cell_counts
    K = packed.coeffs.shape[-1]
    ncx_padded = -(-ncx // n_dev) * n_dev
    coeffs = packed.coeffs.reshape(ncx, ncy * ncz * K)
    if ncx_padded != ncx:
        pad = jnp.zeros((ncx_padded - ncx, ncy * ncz * K),
                        dtype=coeffs.dtype)
        coeffs = jnp.concatenate([coeffs, pad], axis=0)
    coeffs = coeffs.reshape(ncx_padded * ncy * ncz, K)
    sharding = NamedSharding(mesh, P(axis))
    return ShardedPackedGrid(
        coeffs=jax.device_put(coeffs, sharding),
        spacing=packed.spacing,
        origin=packed.origin,
        counts=packed.counts,
        degree=degree,
        n_grids=n_grids,
        back_powers=back_powers,
        oob_k=packed.oob_k,
        ncx_padded=ncx_padded,
        form=form,
        method=method,
        poly_basis=poly_basis,
    )


def _eval_local_slab(coeffs_local, positions, scaling, grid, axis):
    """Per-device evaluation: atoms in my x-slab contribute, others zero.

    Runs inside shard_map; ends with psum over ``axis``. Handles fused
    multi-grids (G coefficient blocks per cell row, scaling [G, N]).
    """
    dtype = coeffs_local.dtype
    positions = positions.astype(dtype)
    G = grid.n_grids
    scaling = scaling.astype(dtype)
    if scaling.ndim == 1:
        scaling = scaling[None, :]

    pos = positions - grid.origin
    counts = jnp.asarray(grid.counts, dtype=dtype)
    corner = grid.spacing * (counts - 1.0)
    inside = jnp.all((pos >= 0.0) & (pos <= corner), axis=-1)

    icounts = jnp.asarray(grid.counts)
    t = pos / grid.spacing
    ixyz = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, icounts - 2)
    f = jnp.clip(t - ixyz, 0.0, 1.0)

    ncx, ncy, ncz = grid.cell_counts
    n_dev = jax.lax.psum(1, axis)
    slab = grid.ncx_padded // n_dev
    my = jax.lax.axis_index(axis)
    local_x = ixyz[..., 0] - my * slab
    in_slab = (local_x >= 0) & (local_x < slab) & inside
    lx = jnp.clip(local_x, 0, slab - 1)
    cell = (lx * ncy + ixyz[..., 1]) * ncz + ixyz[..., 2]

    if grid.form == "hermite":
        from ..grid import InterpolationMethod
        from ..ops import basis
        from ..ops.interpolate import (_AX, _AX3, _AY, _AY3, _AZ, _AZ3,
                                       _hermite_tensor_eval)

        D = (8 if grid.method == int(InterpolationMethod.TRICUBIC)
             else 27)
        K = 8 * D
        rows = jnp.take(coeffs_local, cell, axis=0)[..., :G * K]
        X = rows.reshape(rows.shape[:-1] + (G, 8, D))
        if grid.method == int(InterpolationMethod.TRICUBIC):
            fams = (basis.hermite3_weights, basis.hermite3_derivs,
                    _AX3, _AY3, _AZ3)
        else:
            fams = (basis.hermite5_weights, basis.hermite5_derivs,
                    _AX, _AY, _AZ)
        interp, grad_s = jax.vmap(
            lambda Xg: _hermite_tensor_eval(Xg, f, *fams),
            in_axes=-3, out_axes=(-1, -2))(X)
    else:
        d = grid.degree
        K = d ** 3
        rows = jnp.take(coeffs_local, cell, axis=0)[..., :G * K]
        rows = rows.reshape(rows.shape[:-1] + (G, K))
        from ..ops.packed import _poly_dpowers, _poly_powers
        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        pb = grid.poly_basis
        px, py, pz = (_poly_powers(fx, d, pb), _poly_powers(fy, d, pb),
                      _poly_powers(fz, d, pb))
        dpx, dpy, dpz = (_poly_dpowers(fx, d, pb),
                         _poly_dpowers(fy, d, pb),
                         _poly_dpowers(fz, d, pb))
        R = rows.reshape(rows.shape[:-1] + (d, d, d))
        interp = jnp.einsum("...gpqr,...p,...q,...r->...g", R, px, py, pz)
        gx = jnp.einsum("...gpqr,...p,...q,...r->...g", R, dpx, py, pz)
        gy = jnp.einsum("...gpqr,...p,...q,...r->...g", R, px, dpy, pz)
        gz = jnp.einsum("...gpqr,...p,...q,...r->...g", R, px, py, dpz)
        grad_s = jnp.stack([gx, gy, gz], axis=-1)    # [..., G, 3]

    if any(bp != 0.0 for bp in grid.back_powers):
        bps = jnp.asarray(grid.back_powers, dtype=dtype)
        enabled = jnp.asarray([bp != 0.0 for bp in grid.back_powers])
        sign = jnp.where(interp >= 0.0, 1.0, -1.0)
        a = jnp.abs(interp)
        act = (a > 1e-10) & enabled
        a_safe = jnp.where(act, a, 1.0)
        pf = jnp.where(act, bps * a_safe ** (bps - 1.0), 1.0)
        interp = jnp.where(act, sign * a_safe ** bps, interp)
        grad_s = grad_s * pf[..., None]

    grad_phys = grad_s / grid.spacing                # [..., G, 3]
    # scaling [G, N] -> [..., G] aligned with the batch layout of interp
    s_t = jnp.moveaxis(scaling, 0, -1)               # [N, G]
    s_t = jnp.broadcast_to(s_t, interp.shape)
    active = in_slab[..., None] & (s_t != 0.0)
    per_atom = jnp.sum(jnp.where(active, s_t * interp, 0.0), axis=-1)
    forces = -jnp.sum(jnp.where(active[..., None],
                                s_t[..., None] * grad_phys, 0.0), axis=-2)

    # out-of-bounds restraint: computed once, on the first slab
    dev = jnp.where(pos < 0.0, pos,
                    jnp.where(pos > corner, pos - corner, 0.0))
    # equivalent to the single-device branch structure: inside atoms (with
    # or without zero scaling) have dev == 0, so gating on ~inside alone
    # reproduces evaluate_packed/evaluate_multi exactly
    oob_active = ~inside & (my == 0)
    per_atom = per_atom + jnp.where(
        oob_active, 0.5 * grid.oob_k * jnp.sum(dev * dev, axis=-1), 0.0)
    forces = forces + jnp.where(oob_active[..., None],
                                -grid.oob_k * dev, 0.0)

    per_atom = jax.lax.psum(per_atom, axis)
    forces = jax.lax.psum(forces, axis)
    return forces, per_atom


def make_sharded_grid_eval(mesh: Mesh, axis: str = "sp",
                           extra_batch_specs=P()):
    """Build a shard_map'd evaluator (sharded_grid, positions, scaling) ->
    GridEval. Positions/scaling are replicated along ``axis`` (they may be
    sharded along other mesh axes via ``extra_batch_specs``)."""

    from jax import shard_map

    def eval_fn(grid: ShardedPackedGrid, positions, scaling):
        grid_specs = ShardedPackedGrid(
            coeffs=P(axis),
            spacing=P(),
            origin=P(),
            counts=grid.counts,
            degree=grid.degree,
            n_grids=grid.n_grids,
            back_powers=grid.back_powers,
            oob_k=grid.oob_k,
            ncx_padded=grid.ncx_padded,
            form=grid.form,
            method=grid.method,
            poly_basis=grid.poly_basis,
        )

        fn = shard_map(
            lambda g, x, s: _eval_local_slab(g.coeffs, x, s, g, axis),
            mesh=mesh,
            in_specs=(grid_specs, extra_batch_specs, P()),
            out_specs=(extra_batch_specs, extra_batch_specs),
        )
        forces, per_atom = fn(grid, positions, scaling)
        # global scalar reduction outside shard_map: XLA inserts the
        # cross-axis collectives as needed for any batch sharding
        return GridEval(jnp.sum(per_atom), forces, per_atom)

    return eval_fn


def make_sharded_md_runner(mesh: Mesh, n_steps: int, dt: float,
                           friction: float, dp_axis: str = "dp",
                           sp_axis: str = "sp", unroll: int = 4,
                           constraints=None):
    """Jitted Langevin MD over a 2-D (dp x sp) mesh.

    Replicas shard over ``dp_axis``; the fused grid shards spatially over
    ``sp_axis`` (one psum per force evaluation). Intramolecular terms are
    batch-parallel. Noise/key handling mirrors mm.make_md_runner's
    per-replica scheme exactly, so single- and multi-chip trajectories
    match bit-for-bit given the same keys.

    ``constraints``: optional ConstraintSet — constraints are
    replica-local, so SHAKE/RATTLE vmap over the dp-sharded batch with no
    cross-shard communication (mm.integrators._constrain semantics).

    Returns run(states, system, sharded_grid, scaling, temperatures):
      states: batched MDState [R, ...] (dp-sharded);
      sharded_grid: ShardedPackedGrid (or MultiPackedGrid sharded via
        shard_packed_grid on its fused table);
      scaling: per-atom (or [G, N]) scaling factors, replicated;
      temperatures: [R] per-replica thermostat temperatures.
    """
    from ..mm.forcefield import bonded_energy_forces
    from ..ops.pairwise import pair_energy_forces
    from ..units import BOLTZ

    grid_eval = make_sharded_grid_eval(mesh, axis=sp_axis,
                                       extra_batch_specs=P(dp_axis))

    def run(states, system, sharded_grid, scaling, temperatures):
        masses = system.masses
        inv_m = (1.0 / masses)[:, None]
        a = jnp.exp(-friction * dt)
        kT = (BOLTZ * jnp.asarray(temperatures))[:, None, None]  # [R,1,1]

        def intra(x):
            e, f = bonded_energy_forces(x, system)
            if system.pairs is not None:
                f = f + pair_energy_forces(system.pairs, x)[1]
            return f

        def step(state):
            x, v, keys = state
            split = jax.vmap(jax.random.split)(keys)
            keys2, subs = split[:, 0], split[:, 1]
            res = grid_eval(sharded_grid, x, scaling)
            f = res.forces + jax.vmap(intra)(x)
            noise = jax.vmap(
                lambda k, shape=x.shape[1:]: jax.random.normal(
                    k, shape, x.dtype))(subs)
            v = (a * v + (1.0 - a) * f * inv_m / friction
                 + jnp.sqrt(kT * (1.0 - a * a) * inv_m) * noise)
            x_new = x + v * dt
            if constraints is not None:
                from ..mm.integrators import _constrain
                x_new, v = jax.vmap(
                    lambda x0, x1, vv: _constrain(constraints, x0, x1,
                                                  vv, dt))(x, x_new, v)
            from ..mm.integrators import MDState
            return MDState(x_new, v, keys2)

        def body(s, _):
            return step(s), None

        out, _ = jax.lax.scan(body, states, None, length=n_steps,
                              unroll=min(unroll, max(n_steps, 1)))
        return out

    return jax.jit(run)
