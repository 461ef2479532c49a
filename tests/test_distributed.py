"""Multi-process (DCN) data parallelism: 2 local processes over TCP.

Two subprocesses join a jax.distributed runtime (2 virtual CPU devices
each = a 4-device global dp mesh spanning processes), run the
distributed screen runner on their local halves of an 8-replica
ensemble, and write back only their local shards. The union must match a
single-process run of the identical workload (threefry noise is
replica-keyed, so results are layout-invariant at f64).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dcn_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_screen_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)   # workers set their own device count
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
        assert "OK" in o

    # stitch the shards back together
    pos = np.empty((8,) + (6, 3))
    ene = np.empty(8)
    for pid in range(2):
        d = np.load(tmp_path / f"proc{pid}.npz")
        lo, hi = int(d["lo"]), int(d["hi"])
        assert d["positions"].shape[0] == hi - lo == 4
        pos[lo:hi] = d["positions"]
        ene[lo:hi] = d["energies"]
    assert np.all(np.isfinite(pos)) and np.all(np.isfinite(ene))

    # single-process reference of the identical workload
    import jax

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from dcn_worker import build_workload

    from openmmgridforce_tpu.mm.integrators import (make_langevin_step,
                                                    run_segment)
    from openmmgridforce_tpu.mm.system import energy_and_forces

    system, grids, states, temps = build_workload(8, jax.numpy.float64)

    @jax.jit
    def ref_run(states, system, grids, temps):
        def one(state, t):
            def force_fn(x):
                return energy_and_forces(system, grids, x)[1]
            step = make_langevin_step(force_fn, system.masses, 0.001,
                                      5.0, t)
            out = run_segment(step, state, 25)
            return out, energy_and_forces(system, grids, out.positions)[0]
        return jax.vmap(one)(states, temps)

    out_ref, e_ref = ref_run(states, system, grids, temps)
    np.testing.assert_allclose(pos, np.asarray(out_ref.positions),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(ene, np.asarray(e_ref), rtol=1e-12)


def test_top_k_poses():
    import jax.numpy as jnp

    from openmmgridforce_tpu.parallel.distributed import top_k_poses

    e = jnp.asarray([5.0, -2.0, 3.0, -7.0, 0.0])
    x = jnp.arange(5 * 2 * 3, dtype=jnp.float64).reshape(5, 2, 3)
    best_e, best_x = top_k_poses(e, x, 2)
    np.testing.assert_allclose(np.asarray(best_e), [-7.0, -2.0])
    np.testing.assert_allclose(np.asarray(best_x), np.asarray(x)[[3, 1]])
