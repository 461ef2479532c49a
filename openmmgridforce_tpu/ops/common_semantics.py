"""Common-platform (OpenCL/portable) kernel semantics — quirks Q6 + the
common-platform inverse-power variant (SURVEY section 2.6).

The reference's portable kernel (platforms/common/src/gridForce.cc)
differs from the reference/CUDA kernels in deliberate-looking but
inconsistent ways:

- **Q6**: the out-of-bounds restraint FORCE is scaled by the atom's
  scaling factor while the restraint ENERGY is not
  (gridForce.cc:214-217, vs the explicit "Don't scale" comments of
  gridForce.cu:480-482) — visible for any atom with 0 < scaling != 1.
  An atom with scaling EXACTLY 0 is skipped entirely by the kernel's
  early-out (gridForce.cc:40-45): no energy, no force, not even the
  restraint (the default kernels still restrain such atoms).
- inverse power is a BARE power transform applied whenever
  ``invPower > 0`` — no sign handling, no odd-power absolute-value
  dance, and no InvPowerMode check at all (gridForce.cc:180-187; the
  host passes ``force.getInvPower()`` unconditionally,
  CommonGridForceKernels.cpp:285).
- only trilinear and cubic B-spline interpolation exist (the portable
  kernel has no Hermite branch); no particle groups, no tiling, no
  derivative arrays (CommonGridForceKernels.cpp:464-472 stubs).

``evaluate_grid_common`` reproduces that contract verbatim so the quirk
matrix is fully two-sided; the compat API selects it with
``Platform("Common")`` (or ``"OpenCL"``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grid import Grid, InterpolationMethod
from .interpolate import (GridEval, _cell_and_fraction, _interp_bspline,
                          _interp_trilinear)


def evaluate_grid_common(grid: Grid, positions, scaling_factors
                         ) -> GridEval:
    """Energy/forces with the common platform's kernel semantics."""
    if grid.interp_method not in (InterpolationMethod.TRILINEAR,
                                  InterpolationMethod.BSPLINE):
        raise ValueError(
            "the Common/OpenCL platform supports only trilinear and "
            "B-spline interpolation (CommonGridForceKernels.cpp "
            "compiles no Hermite branch)")
    dtype = grid.vals.dtype
    positions = jnp.asarray(positions, dtype=dtype)
    scaling = jnp.asarray(scaling_factors, dtype=dtype)

    pos = positions - grid.origin
    counts = jnp.asarray(grid.counts, dtype=dtype)
    corner = grid.spacing * (counts - 1.0)
    inside = jnp.all((pos >= 0.0) & (pos <= corner), axis=-1)

    ixyz, f = _cell_and_fraction(grid, pos)
    if grid.interp_method == InterpolationMethod.TRILINEAR:
        interp, grad_s = _interp_trilinear(grid, ixyz, f)
    else:
        interp, grad_s = _interp_bspline(grid, ixyz, f)

    # bare power transform whenever invPower > 0 (gridForce.cc:180-187)
    if grid.inv_power > 0.0:
        p = jnp.asarray(grid.inv_power, dtype)
        factor = p * interp ** (p - 1.0)
        interp = interp ** p
        grad_s = grad_s * factor[..., None]

    grad_phys = grad_s / grid.spacing
    energy_in = scaling * interp
    force_in = -scaling[..., None] * grad_phys

    dev = jnp.where(pos < 0.0, pos,
                    jnp.where(pos > corner, pos - corner, 0.0))
    # Q6: energy unscaled, force SCALED by the scaling factor
    # (gridForce.cc:214-217)
    energy_oob = 0.5 * grid.oob_k * jnp.sum(dev * dev, axis=-1)
    force_oob = -scaling[..., None] * grid.oob_k * dev

    # the common kernel skips only scaling==0 atoms entirely
    # (gridForce.cc:40-42): they produce neither grid energy nor
    # restraint terms
    live = scaling != 0.0
    per_atom = jnp.where(live, jnp.where(inside, energy_in, energy_oob),
                         0.0)
    forces = jnp.where((live & inside)[..., None], force_in,
                       jnp.where((live & ~inside)[..., None], force_oob,
                                 0.0))
    return GridEval(jnp.sum(per_atom), forces, per_atom)
