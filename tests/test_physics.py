"""Physics validation: NVE energy conservation with grid forces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.mm import GridBinding, potential_energy
from openmmgridforce_tpu.mm.integrators import (MDState, make_verlet_step,
                                                run_segment)
from openmmgridforce_tpu.ops import gridgen

RNG = np.random.default_rng(23)


@pytest.mark.parametrize("method", [InterpolationMethod.BSPLINE,
                                    InterpolationMethod.TRIQUINTIC])
def test_nve_energy_conservation_on_grid(method):
    """Velocity-Verlet on a smooth generated grid conserves total energy.

    This is a strong end-to-end check: analytic grid forces must be the
    exact gradient of the interpolated energy (any mismatch shows up as
    secular drift)."""
    counts = (14, 14, 14)
    spacing = (0.08,) * 3
    origin = (0.0, 0.0, 0.0)
    # confining field: r^-12 wall sources on a shell around the box
    # center (a Coulomb bowl has no stable interior minimum — Earnshaw)
    center = np.full(3, 0.52)
    dirs = []
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            for k in (-1, 0, 1):
                if (i, j, k) != (0, 0, 0):
                    d = np.array([i, j, k], float)
                    dirs.append(d / np.linalg.norm(d))
    src = center + 0.62 * np.asarray(dirs)
    n_src = len(src)
    g = gridgen.generate_grid(
        counts, spacing, origin, "ljr", src,
        np.zeros(n_src), np.full(n_src, 0.35), np.full(n_src, 0.5),
        compute_derivatives=(method == InterpolationMethod.TRIQUINTIC),
        interp_method=method, dtype=jnp.float64)

    n_atoms = 5
    masses = jnp.full((n_atoms,), 10.0)
    scaling = jnp.asarray(np.full(n_atoms, 1e-3))
    binding = GridBinding(grid=g, scaling=scaling)
    x0 = jnp.asarray(RNG.uniform(0.42, 0.62, (n_atoms, 3)))

    from openmmgridforce_tpu.mm.system import _eval_grid

    def force_fn(x):
        return _eval_grid(g, x, scaling).forces

    def total_energy(state):
        pe = float(_eval_grid(g, state.positions, scaling).energy)
        ke = float(0.5 * jnp.sum(masses[:, None] * state.velocities ** 2))
        return pe + ke

    v0 = 0.1 * jnp.asarray(RNG.standard_normal((n_atoms, 3)))
    state = MDState(x0, v0, jax.random.PRNGKey(0))
    step = make_verlet_step(force_fn, masses, dt=0.001)
    e0 = total_energy(state)
    state = jax.jit(lambda s: run_segment(step, s, 3000))(state)
    e1 = total_energy(state)
    # all atoms must have stayed inside (restraint branch is discontinuous)
    corner = jnp.asarray(origin) + (jnp.asarray(counts) - 1) * \
        jnp.asarray(spacing)
    assert bool(jnp.all((state.positions >= jnp.asarray(origin))
                        & (state.positions <= corner)))
    assert abs(e1 - e0) / (abs(e0) + 1.0) < 1e-5, (e0, e1)
