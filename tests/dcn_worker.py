"""Worker process for the multi-process (DCN) data-parallel test and
for ``__graft_entry__.dryrun_distributed``.

Usage: python dcn_worker.py <process_id> <num_processes> <port> <outdir>
   or: python dcn_worker.py ref <outdir>

Each worker process exposes 2 virtual CPU devices, joins the distributed
runtime, feeds its local half of a deterministic 8-replica ensemble into
the globally dp-sharded screen runner, and writes back ONLY its local
shard. ``ref`` runs the identical workload single-process (no
distributed runtime) and writes ``ref.npz``; the parent compares the
shard union against it (threefry noise is replica-keyed, so results are
layout-invariant at f64).
"""

import os
import sys


def build_workload(n_replicas, dtype):
    """Deterministic tiny system + grid + replica states (seed-shared)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.mm import GridBinding, initialize_state
    from openmmgridforce_tpu.mm.integrators import MDState
    from openmmgridforce_tpu.mm.system import System
    from openmmgridforce_tpu.ops.pairwise import build_pair_table

    rng = np.random.default_rng(123)
    n_atoms = 6
    vals = rng.standard_normal((10, 10, 10)) * 2.0
    grid = Grid.create(vals, (0.08, 0.08, 0.08), (0.0, 0.0, 0.0),
                       interp_method=InterpolationMethod.BSPLINE,
                       dtype=dtype)
    charges = rng.uniform(-0.3, 0.3, n_atoms)
    zeros0 = jnp.zeros((0,), dtype)
    system = System(
        masses=jnp.full((n_atoms,), 12.0, dtype),
        charges=jnp.asarray(charges, dtype),
        sigmas=jnp.full((n_atoms,), 0.25, dtype),
        epsilons=jnp.full((n_atoms,), 0.4, dtype),
        bond_idx=jnp.asarray([[i, i + 1] for i in range(n_atoms - 1)],
                             jnp.int32),
        bond_k=jnp.full((n_atoms - 1,), 2.0e4, dtype),
        bond_r0=jnp.full((n_atoms - 1,), 0.12, dtype),
        angle_idx=jnp.zeros((0, 3), jnp.int32), angle_k=zeros0,
        angle_t0=zeros0,
        torsion_idx=jnp.zeros((0, 4), jnp.int32), torsion_k=zeros0,
        torsion_per=zeros0, torsion_phase=zeros0,
        pairs=build_pair_table(
            charges, np.full(n_atoms, 0.25), np.full(n_atoms, 0.4),
            exclusions=[(i, i + 1) for i in range(n_atoms - 1)],
            dtype=np.dtype(dtype)),
    )
    binding = GridBinding(grid=grid, scaling=jnp.asarray(charges, dtype))

    x0 = jnp.asarray(
        0.25 + 0.1 * np.arange(n_atoms)[:, None] * np.array([[1, 0.3, 0]])
        + rng.uniform(-0.01, 0.01, (n_atoms, 3)), dtype)
    poses = jnp.stack([x0 + 0.02 * r for r in range(n_replicas)])
    vel = jnp.zeros_like(poses)
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(n_replicas))
    states = MDState(poses, vel, keys)
    temps = jnp.asarray(
        np.linspace(250.0, 400.0, n_replicas), dtype)
    return system, [binding], states, temps


def main_reference():
    """Single-process reference of the distributed workload."""
    outdir = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

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
            return out, energy_and_forces(system, grids,
                                          out.positions)[0]
        return jax.vmap(one)(states, temps)

    out, energies = ref_run(states, system, grids, temps)
    np.savez(os.path.join(outdir, "ref.npz"),
             positions=np.asarray(out.positions),
             energies=np.asarray(energies))
    print("ref OK")


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"

    from openmmgridforce_tpu.parallel import distributed as dist

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    dist.initialize(f"localhost:{port}", nproc, pid, local_device_count=2)

    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    n_global = 8
    n_local = n_global // nproc

    system, grids, states, temps = build_workload(n_global, jax.numpy.float64)
    # slice out THIS process's replicas (what a real screen driver does:
    # each host loads only its own poses)
    lo, hi = pid * n_local, (pid + 1) * n_local
    local_states = jax.tree.map(lambda x: np.asarray(x)[lo:hi], states)
    local_temps = np.asarray(temps)[lo:hi]

    mesh = dist.global_replica_mesh()
    gstates = dist.distribute_replicas(mesh, local_states)
    gtemps = dist.distribute_replicas(mesh, local_temps)
    gsystem = dist.replicate(mesh, system)
    ggrids = dist.replicate(mesh, grids)

    run = dist.make_distributed_screen(mesh, n_steps=25, dt=0.001,
                                       friction=5.0)
    out, energies = run(gstates, gsystem, ggrids, gtemps)
    jax.block_until_ready(energies)

    np.savez(os.path.join(outdir, f"proc{pid}.npz"),
             positions=dist.local_shard(out.positions),
             energies=dist.local_shard(energies),
             lo=lo, hi=hi)
    print(f"proc {pid} OK")


if __name__ == "__main__":
    if sys.argv[1] == "ref":
        main_reference()
    else:
        main()
