"""Grid interpolation: energies and analytic forces for ligand atoms.

Functional, fully-vectorized re-design of the reference evaluation kernels
(platforms/cuda/src/kernels/gridForce.cu:14-520 and
platforms/reference/src/ReferenceGridForceKernels.cpp:646-1121).

Semantics follow the CUDA kernel (the reference's performance path):
  * cell index clamped to [0, counts-2], fraction clamped to [0, 1]
    (gridForce.cu:74-85);
  * RUNTIME inverse-power transforms stencil values (trilinear/B-spline) or
    all 27 corner derivatives via the exact chain rule (tricubic/triquintic)
    before interpolation (gridForce.cu:127-134, 180-193, 261-274);
  * common back-transform sign(v)|v|^n with gradient chain rule afterwards
    (gridForce.cu:419-435);
  * out-of-bounds atoms get an unscaled harmonic restraint
    E = 1/2 k d^2 per axis (gridForce.cu:458-483);
  * atoms with zero scaling factor contribute nothing (they fall into the
    restraint branch with zero deviation, matching gridForce.cu:72).

Instead of the reference's 64x64 / 216x216 coefficient matrices
(TricubicCoefficients.cuh, TriquinticCoefficients.cuh — 46656 MACs/atom),
tricubic and triquintic are evaluated in tensor-product Hermite form:

    P(s) = sum_{m, c} Hx[mx,cx](sx) * Hy[my,cy](sy) * Hz[mz,cz](sz)
                      * D^m f(corner c)

which is the *same unique polynomial* (the matrices are just the precomputed
change of basis; uniqueness of the Hermite interpolation problem makes the
two forms identical — verified against an independently-constructed
constraint-matrix solve in tests/test_hermite_interp.py). This form needs
~220 fused multiply-adds per atom per output, a ~40x FLOP reduction, and
maps onto the TPU VPU as pure broadcast/FMA with no per-atom matrix product.

All functions are dtype-generic; run under float64 (CPU) for parity tests
and float32/bfloat16 on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid, InterpolationMethod, InvPowerMode
from . import basis
from .chain_rules import apply_invpower, invpower_value
from .derivatives27 import DERIV_ORDERS, TRICUBIC_DERIV_MAP


class GridEval(NamedTuple):
    energy: jax.Array          # scalar: total grid energy
    forces: jax.Array          # [N, 3]
    per_atom_energy: jax.Array  # [N]


# Static corner enumeration, order matching the reference
# (gridForce.cu:163-166): c = cx + 2*cy + 4*cz.
_CORNER_CX = np.array([0, 1, 0, 1, 0, 1, 0, 1])
_CORNER_CY = np.array([0, 0, 1, 1, 0, 0, 1, 1])
_CORNER_CZ = np.array([0, 0, 0, 0, 1, 1, 1, 1])

# Per-axis derivative orders for each of the 27 slots.
_AX = np.array([o[0] for o in DERIV_ORDERS])
_AY = np.array([o[1] for o in DERIV_ORDERS])
_AZ = np.array([o[2] for o in DERIV_ORDERS])

# Tricubic: orders for the 8 mapped derivatives {f,fx,fy,fz,fxy,fxz,fyz,fxyz}.
_AX3 = _AX[list(TRICUBIC_DERIV_MAP)]
_AY3 = _AY[list(TRICUBIC_DERIV_MAP)]
_AZ3 = _AZ[list(TRICUBIC_DERIV_MAP)]


def _cell_and_fraction(grid: Grid, pos):
    """Clamped cell index and in-cell fraction (CUDA semantics)."""
    counts = jnp.asarray(grid.counts)
    t = pos / grid.spacing
    ixyz = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, counts - 2)
    f = jnp.clip(t - ixyz, 0.0, 1.0)
    return ixyz, f


def _flat_corner_indices(grid: Grid, ixyz):
    """Flat indices of the 8 cell corners, [N, 8]."""
    nx, ny, nz = grid.counts
    ix, iy, iz = ixyz[..., 0], ixyz[..., 1], ixyz[..., 2]
    base = (ix * (ny * nz) + iy * nz + iz)[..., None]
    offs = (_CORNER_CX * (ny * nz) + _CORNER_CY * nz + _CORNER_CZ)
    return base + jnp.asarray(offs, dtype=base.dtype)


# ----------------------------------------------------------------------
# Method implementations: each returns (interpolated [N], grad_s [N, 3])
# with grad_s the gradient w.r.t. cell fraction (not yet / spacing).
# ----------------------------------------------------------------------

def _interp_trilinear(grid: Grid, ixyz, f):
    flat = grid.vals.reshape(-1)
    v = jnp.take(flat, _flat_corner_indices(grid, ixyz), axis=0)  # [N, 8]

    if grid.inv_power_mode == InvPowerMode.RUNTIME:
        v = invpower_value(v, 1.0 / grid.inv_power)

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    ox, oy, oz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    # corners: index c = cx + 2*cy + 4*cz
    vmmm, vpmm = v[..., 0], v[..., 1]
    vmpm, vppm = v[..., 2], v[..., 3]
    vmmp, vpmp = v[..., 4], v[..., 5]
    vmpp, vppp = v[..., 6], v[..., 7]

    vmm = oz * vmmm + fz * vmmp
    vmp = oz * vmpm + fz * vmpp
    vpm = oz * vpmm + fz * vpmp
    vpp = oz * vppm + fz * vppp
    vm = oy * vmm + fy * vmp
    vp = oy * vpm + fy * vpp
    interp = ox * vm + fx * vp

    dx = vp - vm
    dy = ox * (vmp - vmm) + fx * (vpp - vpm)
    dz = (ox * (oy * (vmmp - vmmm) + fy * (vmpp - vmpm))
          + fx * (oy * (vpmp - vpmm) + fy * (vppp - vppm)))
    return interp, jnp.stack([dx, dy, dz], axis=-1)


def _interp_bspline(grid: Grid, ixyz, f):
    nx, ny, nz = grid.counts
    ar4 = jnp.arange(4) - 1
    gx = jnp.clip(ixyz[..., 0:1] + ar4, 0, nx - 1)  # [N, 4]
    gy = jnp.clip(ixyz[..., 1:2] + ar4, 0, ny - 1)
    gz = jnp.clip(ixyz[..., 2:3] + ar4, 0, nz - 1)
    flat_idx = (gx[..., :, None, None] * (ny * nz)
                + gy[..., None, :, None] * nz
                + gz[..., None, None, :])             # [N, 4, 4, 4]
    v = jnp.take(grid.vals.reshape(-1), flat_idx, axis=0)

    if grid.inv_power_mode == InvPowerMode.RUNTIME:
        v = invpower_value(v, 1.0 / grid.inv_power)

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


def _gather_corner_derivs(grid: Grid, ixyz):
    """Gather the 27 cell-fractional derivatives at the 8 cell corners.

    Returns [N, 8, 27]."""
    d2 = grid.derivs.reshape(-1, 27)
    return jnp.take(d2, _flat_corner_indices(grid, ixyz), axis=0)


def _hermite_tensor_eval(X, f, weights_fn, derivs_fn, ax, ay, az):
    """Tensor-product Hermite evaluation shared by tricubic/triquintic.

    Args:
      X:  [N, C=8 corners, D] corner derivatives in cell-fractional units.
      f:  [N, 3] cell fractions.
      weights_fn / derivs_fn: 1-D basis family returning [..., M, 2]
          (M = number of derivative orders the family carries per axis).
      ax, ay, az: static [D] arrays of per-axis orders for each slot of X.

    Returns (value [N], grad_s [N, 3]).
    """
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    Hx, Hy, Hz = weights_fn(fx), weights_fn(fy), weights_fn(fz)   # [N, M, 2]
    Gx, Gy, Gz = derivs_fn(fx), derivs_fn(fy), derivs_fn(fz)

    def w(H, orders, sides):
        # H: [N, M, 2] -> select [N, D] by order, then [N, D, C] by side.
        sel = H[..., orders, :]            # [N, D, 2]
        return sel[..., sides]             # [N, D, C] via static gather

    cx, cy, cz = _CORNER_CX, _CORNER_CY, _CORNER_CZ
    wx, wy, wz = w(Hx, ax, cx), w(Hy, ay, cy), w(Hz, az, cz)  # [N, D, 8]
    gx, gy, gz = w(Gx, ax, cx), w(Gy, ay, cy), w(Gz, az, cz)

    Xt = jnp.swapaxes(X, -1, -2)           # [N, D, 8]
    value = jnp.sum(wx * wy * wz * Xt, axis=(-1, -2))
    dvx = jnp.sum(gx * wy * wz * Xt, axis=(-1, -2))
    dvy = jnp.sum(wx * gy * wz * Xt, axis=(-1, -2))
    dvz = jnp.sum(wx * wy * gz * Xt, axis=(-1, -2))
    return value, jnp.stack([dvx, dvy, dvz], axis=-1)


def _interp_tricubic(grid: Grid, ixyz, f):
    X27 = _gather_corner_derivs(grid, ixyz)            # [N, 8, 27]
    if grid.inv_power_mode == InvPowerMode.RUNTIME:
        X27 = apply_invpower(X27, 1.0 / grid.inv_power)
    X = X27[..., list(TRICUBIC_DERIV_MAP)]             # [N, 8, 8]
    return _hermite_tensor_eval(
        X, f, basis.hermite3_weights, basis.hermite3_derivs,
        _AX3, _AY3, _AZ3)


def _interp_triquintic(grid: Grid, ixyz, f):
    X27 = _gather_corner_derivs(grid, ixyz)            # [N, 8, 27]
    if grid.inv_power_mode == InvPowerMode.RUNTIME:
        X27 = apply_invpower(X27, 1.0 / grid.inv_power)
    return _hermite_tensor_eval(
        X27, f, basis.hermite5_weights, basis.hermite5_derivs,
        _AX, _AY, _AZ)


_METHODS = {
    int(InterpolationMethod.TRILINEAR): _interp_trilinear,
    int(InterpolationMethod.BSPLINE): _interp_bspline,
    int(InterpolationMethod.TRICUBIC): _interp_tricubic,
    int(InterpolationMethod.TRIQUINTIC): _interp_triquintic,
}


def _back_transform(grid: Grid, interp, grad_s):
    """Common inverse-power back-transform (gridForce.cu:419-435).

    ``inv_power == 0`` disables the transform even when a mode is set
    (matching the packed evaluators' back_power gate — n=0 would map
    every value to +/-1)."""
    if (grid.inv_power_mode not in (InvPowerMode.RUNTIME,
                                    InvPowerMode.STORED)
            or grid.inv_power == 0.0):
        return interp, grad_s
    n = grid.inv_power
    sign = jnp.where(interp >= 0.0, 1.0, -1.0)
    a = jnp.abs(interp)
    active = a > 1e-10
    a_safe = jnp.where(active, a, 1.0)
    power_factor = n * a_safe ** (n - 1.0)
    new_interp = jnp.where(active, sign * a_safe ** n, interp)
    new_grad = jnp.where(active[..., None], grad_s * power_factor[..., None],
                         grad_s)
    return new_interp, new_grad


def evaluate_grid(grid: Grid, positions, scaling_factors) -> GridEval:
    """Energy, forces and per-atom energies of atoms on one grid.

    Args:
      grid: the Grid (interp method / inv-power config are static fields).
      positions: [N, 3] absolute positions in nm.
      scaling_factors: [N] per-atom scaling factors.

    Returns:
      GridEval(total energy scalar, forces [N, 3], per-atom energies [N]).
    """
    if grid.interp_method in (InterpolationMethod.TRICUBIC,
                              InterpolationMethod.TRIQUINTIC):
        if grid.derivs is None:
            raise ValueError(
                f"interpolation method {grid.interp_method} requires "
                "precomputed derivatives (generate with "
                "compute_derivatives=True)")

    dtype = grid.vals.dtype
    positions = jnp.asarray(positions, dtype=dtype)
    scaling = jnp.asarray(scaling_factors, dtype=dtype)

    pos = positions - grid.origin
    counts = jnp.asarray(grid.counts, dtype=dtype)
    corner = grid.spacing * (counts - 1.0)
    inside = jnp.all((pos >= 0.0) & (pos <= corner), axis=-1)

    ixyz, f = _cell_and_fraction(grid, pos)
    interp, grad_s = _METHODS[grid.interp_method](grid, ixyz, f)
    interp, grad_s = _back_transform(grid, interp, grad_s)
    grad_phys = grad_s / grid.spacing

    energy_in = scaling * interp
    force_in = -scaling[..., None] * grad_phys

    # Out-of-bounds harmonic restraint (unscaled; gridForce.cu:458-483).
    dev = jnp.where(pos < 0.0, pos,
                    jnp.where(pos > corner, pos - corner, 0.0))
    energy_oob = 0.5 * grid.oob_k * jnp.sum(dev * dev, axis=-1)
    force_oob = -grid.oob_k * dev

    active = inside & (scaling != 0.0)
    per_atom = jnp.where(active, energy_in, energy_oob)
    forces = jnp.where(active[..., None], force_in, force_oob)
    return GridEval(jnp.sum(per_atom), forces, per_atom)


def grid_energy(grid: Grid, positions, scaling_factors):
    """Energy-only evaluation (differentiable; jax.grad gives -forces)."""
    return evaluate_grid(grid, positions, scaling_factors).energy
