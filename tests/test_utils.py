"""Checkpoint/resume and observability utilities."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu.mm.integrators import MDState
from openmmgridforce_tpu.utils import (StateDataReporter, load_pytree,
                                       load_sampler, save_pytree,
                                       save_sampler, write_xyz_frame)

DATA = "/root/reference/python/prmtopcrd"
RNG = np.random.default_rng(3)


def test_pytree_checkpoint_roundtrip(tmp_path):
    state = MDState(
        positions=jnp.asarray(RNG.standard_normal((5, 3))),
        velocities=jnp.asarray(RNG.standard_normal((5, 3))),
        key=jax.random.PRNGKey(7),
    )
    p = str(tmp_path / "state.npz")
    save_pytree(p, state)
    like = MDState(jnp.zeros((5, 3)), jnp.zeros((5, 3)),
                   jax.random.PRNGKey(0))
    back = load_pytree(p, like)
    np.testing.assert_array_equal(np.asarray(back.positions),
                                  np.asarray(state.positions))
    np.testing.assert_array_equal(np.asarray(back.key),
                                  np.asarray(state.key))


@pytest.mark.skipif(not os.path.exists(f"{DATA}/ligand.prmtop"),
                    reason="fixtures not available")
def test_sampler_checkpoint_resume(tmp_path):
    from openmmgridforce_tpu.mm import (load_inpcrd, load_prmtop,
                                        system_from_amber)
    from openmmgridforce_tpu.sampling import Sampler, SamplerConfig

    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = system_from_amber(top, hydrogen_mass=4.0)
    cfg = SamplerConfig(n_states=3, t_high=400.0, md_steps_per_trial=10,
                        dt=0.001, friction=5.0)

    s1 = Sampler(system, [], jnp.asarray(crd), cfg)
    s1.run(n_trials=2, n_exchange_per_trial=2)
    save_sampler(str(tmp_path / "ckpt"), s1)

    s2 = Sampler(system, [], jnp.asarray(crd), cfg)
    load_sampler(str(tmp_path / "ckpt"), s2)
    np.testing.assert_array_equal(np.asarray(s2.states.positions),
                                  np.asarray(s1.states.positions))
    assert s2.n_exchange_attempted == s1.n_exchange_attempted

    # identical continuation from the restored state
    s1.run(n_trials=1, n_exchange_per_trial=2)
    s2.run(n_trials=1, n_exchange_per_trial=2)
    np.testing.assert_allclose(np.asarray(s1.states.positions),
                               np.asarray(s2.states.positions),
                               atol=1e-12)


def test_state_data_reporter():
    buf = io.StringIO()
    rep = StateDataReporter(buf, 10)
    rep.report(10, -1234.5, 298.7)
    rep.report(20, -1230.1, 301.2)
    lines = buf.getvalue().strip().split("\n")
    assert lines[0].startswith('#"Step"')
    assert lines[1].split()[0] == "10"
    assert len(lines) == 3


def test_write_xyz_frame():
    buf = io.StringIO()
    write_xyz_frame(buf, "E=-1.0", np.array([[0.1, 0.2, 0.3]]), ["O"])
    lines = buf.getvalue().strip().split("\n")
    assert lines[0] == "1"
    assert lines[2].startswith("O 1.0")
