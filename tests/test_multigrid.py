"""MultiPackedGrid fusion: parity with per-grid evaluation."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu import Grid, InterpolationMethod, InvPowerMode
from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                            evaluate_multi,
                                            evaluate_packed, pack_grid)

RNG = np.random.default_rng(41)
COUNTS = (7, 6, 8)
SPACING = (0.1, 0.12, 0.11)
ORIGIN = (0.2, -0.1, 0.4)


def test_multigrid_matches_sum_of_singles():
    packs, scals = [], []
    for i in range(3):
        vals = np.abs(RNG.standard_normal(COUNTS)) + 0.3
        mode = InvPowerMode.STORED if i == 1 else InvPowerMode.NONE
        g = Grid.create(vals, SPACING, ORIGIN,
                        interp_method=InterpolationMethod.BSPLINE,
                        inv_power_mode=mode,
                        inv_power=2.0 if i == 1 else 0.0,
                        oob_k=444.0, dtype=np.float64)
        packs.append(pack_grid(g))
        scals.append(RNG.standard_normal(40))

    multi = combine_packed_grids(packs)
    lo = np.asarray(ORIGIN) - 0.05
    hi = (np.asarray(ORIGIN)
          + (np.asarray(COUNTS) - 1) * np.asarray(SPACING) + 0.05)
    pos = RNG.uniform(lo, hi, size=(40, 3))

    res = evaluate_multi(multi, pos, np.stack(scals))

    want_pa = np.zeros(40)
    want_f = np.zeros((40, 3))
    # per-grid evaluation triple-counts the OOB restraint; the fused path
    # applies it once — compare inside-atoms exactly and restraint-only
    # atoms at 1x
    singles = [evaluate_packed(p, pos, s) for p, s in zip(packs, scals)]
    inside = np.all((pos >= np.asarray(ORIGIN))
                    & (pos <= hi - 0.05), axis=1)
    for s in singles:
        want_pa += np.asarray(s.per_atom_energy)
        want_f += np.asarray(s.forces)
    got_pa = np.asarray(res.per_atom_energy)
    got_f = np.asarray(res.forces)
    np.testing.assert_allclose(got_pa[inside], want_pa[inside], rtol=1e-9,
                               atol=1e-10)
    np.testing.assert_allclose(got_f[inside], want_f[inside], rtol=1e-9,
                               atol=1e-9)
    # outside: fused applies restraint once, singles three times
    np.testing.assert_allclose(got_pa[~inside] * 3.0, want_pa[~inside],
                               rtol=1e-9)


def test_combine_requires_matching_geometry():
    g1 = Grid.create(RNG.standard_normal(COUNTS), SPACING, ORIGIN,
                     interp_method=InterpolationMethod.BSPLINE,
                     dtype=np.float64)
    g2 = Grid.create(RNG.standard_normal((5, 5, 5)), SPACING, ORIGIN,
                     interp_method=InterpolationMethod.BSPLINE,
                     dtype=np.float64)
    with pytest.raises(ValueError, match="share"):
        combine_packed_grids([pack_grid(g1), pack_grid(g2)])
