"""Reference-platform (CPU/double) evaluation semantics, as an option.

The engine's default kernels follow the CUDA/common-platform conventions
(see ops/interpolate.py). This module provides the *reference platform's*
semantics (ReferenceGridForceKernels.cpp:646-1121) for bit-level parity
work against BASELINE.json's stated target, covering the quirks the two
platforms disagree on (SURVEY.md section 2.6):

  * Q2 — the cell index is NOT clamped to counts-2: at the exact upper
    grid face the reference lands in a one-past-the-last cell with
    fraction 0 (`(int)(pi/spacing)` truncation, :710-717).
  * Q4 — inverse-power back-transform fires on ``inv_power > 0`` alone
    (no mode check) and is a plain ``pow`` with no sign handling and no
    1e-10 dead zone (:785-796).
  * the tricubic branch (:796-893) interpolates from VALUES ONLY,
    estimating corner derivatives with on-the-fly centered finite
    differences (no precomputed derivative block needed) through an
    x -> y -> z cascade of cubic Hermite 1-D interpolations whose
    cross-terms are deliberately dropped by the reference (its gradient
    is not the exact gradient of its interpolant; ported literally).
  * Q12 — the triquintic branch converts local gradients to physical by
    MULTIPLYING by spacing (:992-997), consistent with its own
    derivative-storage convention (and unlike every other branch).
  * flat-index neighbor arithmetic: at a z (or y) face the reference's
    trilinear/tricubic stencils read the next row of the flattened
    array rather than clamping per axis (e.g. ``g_vals[im + 1]`` with
    ``iz == nz-1`` reads the ``iy+1`` row). Reproduced by doing the
    same flat arithmetic; indices are clipped to the array range only
    where the C++ would read out of bounds entirely (undefined
    behavior we cannot — and should not — reproduce).

Q1 (forces written to the LOOP index rather than the particle index,
:688 vs :794) lives at the force-scatter level and is implemented by the
compat Context when ``platform="reference"`` (api/context.py).

Q3/Q5 (diameter (2*sigma) LJ conventions in generation and auto-scaling)
are options on ops/gridgen (``lj_convention="diameter"``,
``auto_scaling_factors(convention="diameter")``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grid import Grid, InterpolationMethod
from . import basis
from .interpolate import GridEval, _interp_triquintic


def _gv(flat, idx):
    """Flat gather with range clip (stands in for the C++'s raw reads)."""
    return jnp.take(flat, jnp.clip(idx, 0, flat.shape[0] - 1), axis=0)


def _ref_trilinear(grid: Grid, ixyz, f):
    """:1016-1084 — flat-index corner arithmetic, fraction complements."""
    nx, ny, nz = grid.counts
    nyz = ny * nz
    flat = grid.vals.reshape(-1)
    ix, iy, iz = ixyz[..., 0], ixyz[..., 1], ixyz[..., 2]
    im = ix * nyz + iy * nz + iz
    imp = im + nz
    ip = im + nyz
    ipp = ip + nz

    vmmm, vmmp = _gv(flat, im), _gv(flat, im + 1)
    vmpm, vmpp = _gv(flat, imp), _gv(flat, imp + 1)
    vpmm, vpmp = _gv(flat, ip), _gv(flat, ip + 1)
    vppm, vppp = _gv(flat, ipp), _gv(flat, ipp + 1)

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    ax, ay, az = 1.0 - fx, 1.0 - fy, 1.0 - fz

    vmm = az * vmmm + fz * vmmp
    vmp = az * vmpm + fz * vmpp
    vpm = az * vpmm + fz * vpmp
    vpp = az * vppm + fz * vppp
    vm = ay * vmm + fy * vmp
    vp = ay * vpm + fy * vpp
    interp = ax * vm + fx * vp

    dx = -vm + vp
    dy = (-vmm + vmp) * ax + (-vpm + vpp) * fx
    dz = ((-vmmm + vmmp) * ay + (-vmpm + vmpp) * fy) * ax + \
         ((-vpmm + vpmp) * ay + (-vppm + vppp) * fy) * fx
    return interp, jnp.stack([dx, dy, dz], axis=-1)


def _ref_bspline(grid: Grid, ixyz, f):
    """:727-794 — per-point stencil clamp around the UNclamped cell."""
    nx, ny, nz = grid.counts
    ar4 = jnp.arange(4) - 1
    gx = jnp.clip(ixyz[..., 0:1] + ar4, 0, nx - 1)
    gy = jnp.clip(ixyz[..., 1:2] + ar4, 0, ny - 1)
    gz = jnp.clip(ixyz[..., 2:3] + ar4, 0, nz - 1)
    flat_idx = (gx[..., :, None, None] * (ny * nz)
                + gy[..., None, :, None] * nz
                + gz[..., None, None, :])
    v = jnp.take(grid.vals.reshape(-1), flat_idx, axis=0)

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    bx, by, bz = (basis.bspline_weights(fx), basis.bspline_weights(fy),
                  basis.bspline_weights(fz))
    dbx, dby, dbz = (basis.bspline_derivs(fx), basis.bspline_derivs(fy),
                     basis.bspline_derivs(fz))
    interp = jnp.einsum("...i,...j,...k,...ijk->...", bx, by, bz, v)
    dx = jnp.einsum("...i,...j,...k,...ijk->...", dbx, by, bz, v)
    dy = jnp.einsum("...i,...j,...k,...ijk->...", bx, dby, bz, v)
    dz = jnp.einsum("...i,...j,...k,...ijk->...", bx, by, dbz, v)
    return interp, jnp.stack([dx, dy, dz], axis=-1)


def _ref_tricubic_fd(grid: Grid, ixyz, f):
    """:796-893 — on-the-fly finite-difference tricubic, ported literally
    (including the dropped gradient cross-terms; see module docstring)."""
    nx, ny, nz = grid.counts
    nyz = ny * nz
    sp = grid.spacing
    sx, sy, sz = sp[0], sp[1], sp[2]
    flat = grid.vals.reshape(-1)
    ix, iy, iz = ixyz[..., 0], ixyz[..., 1], ixyz[..., 2]
    im = ix * nyz + iy * nz + iz
    imp = im + nz
    ip = im + nyz
    ipp = ip + nz

    f000, f001 = _gv(flat, im), _gv(flat, im + 1)
    f010, f011 = _gv(flat, imp), _gv(flat, imp + 1)
    f100, f101 = _gv(flat, ip), _gv(flat, ip + 1)
    f110, f111 = _gv(flat, ipp), _gv(flat, ipp + 1)

    in_x = (ix > 0) & (ix < nx - 1)

    def fd_x(row_off):
        # centered difference around (ix, .) and (ix+1, .)
        lo = _gv(flat, im - nyz + row_off)
        hi = _gv(flat, ip + row_off)
        d0 = jnp.where(in_x, (hi - lo) / (2.0 * sx), 0.0)
        lo1 = _gv(flat, im + row_off)
        hi1 = _gv(flat, ip + nyz + row_off)
        d1 = jnp.where(in_x, (hi1 - lo1) / (2.0 * sx), 0.0)
        return d0, d1

    dx000, dx100 = fd_x(0)
    dx001, dx101 = fd_x(1)
    dx010, dx110 = fd_x(nz)
    dx011, dx111 = fd_x(nz + 1)

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    h3 = basis.hermite3_weights(fx)       # [N, 2, 2]: [order, side]
    g3 = basis.hermite3_derivs(fx)
    h00x, h01x = h3[..., 0, 0], h3[..., 0, 1]
    h10x, h11x = h3[..., 1, 0], h3[..., 1, 1]
    dh00x, dh01x = g3[..., 0, 0], g3[..., 0, 1]
    dh10x, dh11x = g3[..., 1, 0], g3[..., 1, 1]

    def xline(fa, fb, da, db):
        return h00x * fa + h01x * fb + h10x * da * sx + h11x * db * sx

    def dxline(fa, fb, da, db):
        return dh00x * fa + dh01x * fb + dh10x * da * sx + dh11x * db * sx

    v00 = xline(f000, f100, dx000, dx100)
    v01 = xline(f001, f101, dx001, dx101)
    v10 = xline(f010, f110, dx010, dx110)
    v11 = xline(f011, f111, dx011, dx111)
    dv00 = dxline(f000, f100, dx000, dx100)
    dv01 = dxline(f001, f101, dx001, dx101)
    dv10 = dxline(f010, f110, dx010, dx110)
    dv11 = dxline(f011, f111, dx011, dx111)

    in_y = (iy > 0) & (iy < ny - 1)
    # one-sided y-derivative estimates mixing interpolated values
    # (reference :843-846, ported verbatim)
    dy00 = jnp.where(in_y, (v10 - (h00x * _gv(flat, im - nz)
                                   + h01x * _gv(flat, ip - nz))) / sy, 0.0)
    dy01 = jnp.where(in_y, (v11 - (h00x * _gv(flat, im + 1 - nz)
                                   + h01x * _gv(flat, ip + 1 - nz))) / sy,
                     0.0)
    dy10 = jnp.where(in_y, ((h00x * _gv(flat, im + 2 * nz)
                             + h01x * _gv(flat, ip + 2 * nz)) - v00) / sy,
                     0.0)
    dy11 = jnp.where(in_y, ((h00x * _gv(flat, im + 1 + 2 * nz)
                             + h01x * _gv(flat, ip + 1 + 2 * nz)) - v01)
                     / sy, 0.0)

    h3y = basis.hermite3_weights(fy)
    g3y = basis.hermite3_derivs(fy)
    h00y, h01y = h3y[..., 0, 0], h3y[..., 0, 1]
    h10y, h11y = h3y[..., 1, 0], h3y[..., 1, 1]
    dh00y, dh01y = g3y[..., 0, 0], g3y[..., 0, 1]
    dh10y, dh11y = g3y[..., 1, 0], g3y[..., 1, 1]

    v0 = h00y * v00 + h01y * v10 + h10y * dy00 * sy + h11y * dy10 * sy
    v1 = h00y * v01 + h01y * v11 + h10y * dy01 * sy + h11y * dy11 * sy
    dvdx_0 = h00y * dv00 + h01y * dv10
    dvdx_1 = h00y * dv01 + h01y * dv11
    dvdy = (dh00y * v00 + dh01y * v10
            + dh10y * dy00 * sy + dh11y * dy10 * sy)

    in_z = (iz > 0) & (iz < nz - 1)
    dz0 = jnp.where(
        in_z,
        (v1 - (h00y * (h00x * _gv(flat, im - 1) + h01x * _gv(flat, ip - 1))
               + h01y * (h00x * _gv(flat, imp - 1)
                         + h01x * _gv(flat, ipp - 1)))) / sz, 0.0)
    dz1 = jnp.where(
        in_z,
        ((h00y * (h00x * _gv(flat, im + 2) + h01x * _gv(flat, ip + 2))
          + h01y * (h00x * _gv(flat, imp + 2)
                    + h01x * _gv(flat, ipp + 2))) - v0) / sz, 0.0)

    h3z = basis.hermite3_weights(fz)
    g3z = basis.hermite3_derivs(fz)
    h00z, h01z = h3z[..., 0, 0], h3z[..., 0, 1]
    h10z, h11z = h3z[..., 1, 0], h3z[..., 1, 1]
    dh00z, dh01z = g3z[..., 0, 0], g3z[..., 0, 1]
    dh10z, dh11z = g3z[..., 1, 0], g3z[..., 1, 1]

    interp = h00z * v0 + h01z * v1 + h10z * dz0 * sz + h11z * dz1 * sz
    dvdx = h00z * dvdx_0 + h01z * dvdx_1
    dvdz = (dh00z * v0 + dh01z * v1
            + dh10z * dz0 * sz + dh11z * dz1 * sz)
    return interp, jnp.stack([dvdx, dvdy, dvdz], axis=-1)


def evaluate_grid_reference(grid: Grid, positions,
                            scaling_factors) -> GridEval:
    """Reference-platform semantics evaluation (double-precision target).

    Mirrors ReferenceCalcGridForceKernel::execute (:646-1121): unclamped
    cell index (Q2), ``inv_power > 0`` literal-``pow`` back-transform
    (Q4), on-the-fly FD tricubic, triquintic gradient*spacing (Q12),
    unscaled OOB restraint. Use ``float64`` grids/positions to reproduce
    the reference bit-for-bit (within the same expression order).
    """
    dtype = grid.vals.dtype
    positions = jnp.asarray(positions, dtype=dtype)
    scaling = jnp.asarray(scaling_factors, dtype=dtype)

    pos = positions - grid.origin
    counts_f = jnp.asarray(grid.counts, dtype=dtype)
    corner = grid.spacing * (counts_f - 1.0)
    inside = jnp.all((pos >= 0.0) & (pos <= corner), axis=-1)

    t = pos / grid.spacing
    # (int) truncation, NO clamp to counts-2 (Q2); clip only to keep the
    # traced index arithmetic finite for OOB atoms (whose values are
    # discarded by the `inside` mask anyway)
    ixyz = jnp.clip(jnp.floor(t).astype(jnp.int32), 0,
                    jnp.asarray(grid.counts) - 1)
    f = t - ixyz

    method = grid.interp_method
    if method == InterpolationMethod.BSPLINE:
        interp, grad_s = _ref_bspline(grid, ixyz, f)
        to_phys = 1.0 / grid.spacing
    elif method == InterpolationMethod.TRICUBIC:
        # reference tricubic works from values only (no derivative block)
        interp, grad_phys3 = _ref_tricubic_fd(grid, ixyz, f)
        grad_s, to_phys = grad_phys3, 1.0 / grid.spacing
    elif method == InterpolationMethod.TRIQUINTIC:
        if grid.derivs is None:
            raise ValueError("reference triquintic requires precomputed "
                             "derivatives (GridForce docstring, "
                             "ReferenceGridForceKernels.cpp:910-913)")
        interp, grad_s = _interp_triquintic(grid, ixyz, f)
        to_phys = grid.spacing          # Q12: multiply, don't divide
    else:
        interp, grad_s = _ref_trilinear(grid, ixyz, f)
        to_phys = 1.0 / grid.spacing

    # Q4: literal pow() back-transform on inv_power > 0, no mode check,
    # no sign handling, no dead zone (:785-796, :858-868, :1060-1079)
    n = float(grid.inv_power)
    if n > 0.0:
        base = interp
        interp = base ** n
        grad_s = grad_s * (n * base ** (n - 1.0))[..., None]

    grad_phys = grad_s * to_phys
    energy_in = scaling * interp
    force_in = -scaling[..., None] * grad_phys

    dev = jnp.where(pos < 0.0, pos,
                    jnp.where(pos > corner, pos - corner, 0.0))
    energy_oob = 0.5 * grid.oob_k * jnp.sum(dev * dev, axis=-1)
    force_oob = -grid.oob_k * dev

    active = inside & (scaling != 0.0)
    per_atom = jnp.where(active, energy_in, energy_oob)
    forces = jnp.where(active[..., None], force_in, force_oob)
    return GridEval(jnp.sum(per_atom), forces, per_atom)
