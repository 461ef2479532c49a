"""Multiple-timestep (RESPA) integration: sampling correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.mm.integrators import (MDState,
                                                instantaneous_temperature,
                                                initialize_state,
                                                make_langevin_step,
                                                make_respa_langevin_step,
                                                run_respa_segment,
                                                run_segment)
from openmmgridforce_tpu.ops import gridgen
from openmmgridforce_tpu.ops.packed import evaluate_packed, pack_grid

RNG = np.random.default_rng(29)


def _wall_grid():
    """Smooth confining LJ-wall grid (see test_physics)."""
    center = np.full(3, 0.52)
    dirs = []
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            for k in (-1, 0, 1):
                if (i, j, k) != (0, 0, 0):
                    d = np.array([i, j, k], float)
                    dirs.append(d / np.linalg.norm(d))
    src = center + 0.62 * np.asarray(dirs)
    n = len(src)
    g = gridgen.generate_grid(
        (14, 14, 14), (0.08,) * 3, (0.0, 0.0, 0.0), "ljr", src,
        np.zeros(n), np.full(n, 0.35), np.full(n, 0.5),
        interp_method=InterpolationMethod.BSPLINE, dtype=jnp.float64)
    return pack_grid(g)


def test_respa_thermalizes_like_plain_langevin():
    """RESPA Langevin must sample the same temperature as the plain
    integrator on a harmonic (fast) + grid (slow) system."""
    packed = _wall_grid()
    n_atoms = 32
    masses = jnp.full((n_atoms,), 10.0)
    scaling = jnp.full((n_atoms,), 1e-3)
    anchors = jnp.asarray(RNG.uniform(0.45, 0.6, (n_atoms, 3)))
    k_spring = 2e4

    def fast(x):
        return -k_spring * (x - anchors)

    def slow(x):
        return evaluate_packed(packed, x, scaling).forces

    temps = {}
    for name, step in [
        ("plain", make_langevin_step(lambda x: fast(x) + slow(x), masses,
                                     0.0005, 5.0, 300.0)),
        ("respa", make_respa_langevin_step(slow, fast, masses, 0.002, 4,
                                           5.0, 300.0)),
    ]:
        state = initialize_state(jax.random.PRNGKey(0), anchors, masses,
                                 300.0)
        n = 4000 if name == "plain" else 1000  # same simulated time
        if name == "respa":
            def seg(s, nn, st=step):
                return run_respa_segment(st, slow, s, nn)
        else:
            def seg(s, nn, st=step):
                return run_segment(st, s, nn)
        state = jax.jit(lambda s, nn=n: seg(s, nn))(state)
        samples = []
        for _ in range(15):
            state = jax.jit(lambda s: seg(s, 200))(state)
            samples.append(float(instantaneous_temperature(state, masses)))
        temps[name] = np.mean(samples)
        assert np.all(np.isfinite(np.asarray(state.positions)))

    assert temps["respa"] == pytest.approx(300.0, rel=0.12), temps
    assert temps["plain"] == pytest.approx(300.0, rel=0.12), temps
