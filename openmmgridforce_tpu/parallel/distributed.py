"""Multi-process (DCN-spanning) data parallelism.

The reference has no multi-node support at all (SURVEY section 2.7: no
MPI/NCCL/Gloo anywhere in its tree); scaling a docking screen or a BPMF
ladder beyond one TPU slice is a new capability of this engine. The
design follows the JAX multi-controller model:

  * every process calls :func:`initialize` (jax.distributed) and then
    sees ALL devices of all processes in ``jax.devices()``;
  * the replica ensemble is sharded over a global ``dp`` mesh axis that
    spans processes — each process feeds only its local sub-batch
    (``jax.make_array_from_process_local_data``) and reads back only its
    own shard (:func:`local_shard`), so pose data never crosses DCN;
  * the MD hot loop is pure data parallel (zero collectives — the only
    DCN traffic is the initial compile-time handshake); cross-replica
    reductions (top-k pose scores, acceptance statistics) compile to one
    XLA collective that is latency- not bandwidth-bound and rides DCN
    fine.

Works identically over ICI within a slice and DCN across slices/hosts:
the mesh axis is ordered so neighboring replicas land on the same
process first (jax.devices() groups by process), keeping any residual
collective traffic hierarchical.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_device_count: Optional[int] = None) -> None:
    """Join the multi-process JAX runtime.

    Must run before any other jax call in the process.
    ``local_device_count``: optional number of virtual CPU devices to
    expose from this process (testing / CPU fleets); real TPU processes
    leave it None and expose their local chips.
    """
    if local_device_count is not None:
        flag = (f"--xla_force_host_platform_device_count="
                f"{local_device_count}")
        xf = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in xf:
            os.environ["XLA_FLAGS"] = (xf + " " + flag).strip()
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_replica_mesh(axis_name: str = "dp"):
    """1-D mesh over ALL processes' devices (process-major order)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def distribute_replicas(mesh, local_tree, axis_name: str = "dp"):
    """Assemble a globally dp-sharded pytree from each process's local
    sub-batch (leading axis = this process's replicas). The local batch
    size must equal global_replicas / num_processes."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_tree)


def replicate(mesh, tree):
    """Replicate small pytrees (system, grids) on every device."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(tree, NamedSharding(mesh, P()))


def local_shard(x) -> np.ndarray:
    """This process's rows of a globally dp-sharded array (host copy)."""
    shards = [s for s in x.addressable_shards]
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def make_distributed_screen(mesh, n_steps: int, dt: float, friction: float,
                            axis_name: str = "dp"):
    """Distributed docking-screen runner: advance a globally-sharded
    replica ensemble by ``n_steps`` of Langevin MD and return
    (final_states, per-replica energies), all dp-sharded.

    ``system`` / ``grids`` enter as replicated ARGUMENTS (never HLO
    constants). The per-replica temperature array is dp-sharded like the
    states. Zero collectives in the loop; XLA partitions the batch.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..mm.integrators import make_langevin_step, run_segment
    from ..mm.system import energy_and_forces

    spec = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def run(states, system, grids, temperatures):
        def one(state, t):
            def force_fn(x):
                return energy_and_forces(system, grids, x)[1]

            step = make_langevin_step(force_fn, system.masses, dt,
                                      friction, t,
                                      constraints=system.constraints)
            out = run_segment(step, state, n_steps)
            e = energy_and_forces(system, grids, out.positions)[0]
            return out, e

        return jax.vmap(one)(states, temperatures)

    return jax.jit(run,
                   in_shardings=(spec, repl, repl, spec),
                   out_shardings=(spec, spec))


def top_k_poses(energies, positions, k: int):
    """Global top-k lowest-energy poses from dp-sharded inputs: ONE
    lax.top_k (compiles to an all-gather of [R] energies — bytes, not
    poses — plus a gather of the k winners)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _topk(e, x):
        neg, idx = jax.lax.top_k(-e, k)
        return -neg, x[idx]

    return _topk(energies, positions)
