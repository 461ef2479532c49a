"""Replica-ensemble parallelism over a device mesh.

The reference's only batching mechanism was flattened particle groups in a
single CUDA launch (CudaGridForceKernels.cpp:607-675); here an ensemble of
ligand replicas is a leading batch axis, vmapped on one chip and sharded
over the ``dp`` mesh axis across chips. Grids and system parameters are
replicated (they are small); positions/velocities/keys are sharded.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mm.integrators import MDState


def replica_mesh(devices=None, axis_name: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_replica_states(mesh: Mesh, state: MDState,
                         axis_name: str = "dp") -> MDState:
    """Place a batched MDState (leading replica axis) on the mesh with the
    replica axis sharded over ``axis_name``."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def make_ensemble_runner(step_fn: Callable, n_steps: int,
                         mesh: Mesh = None, axis_name: str = "dp"):
    """Build a jitted function advancing a batched MDState by n_steps.

    With a mesh, inputs/outputs are sharded over the replica axis so XLA
    partitions the ensemble across devices (pure data parallel — no
    collectives needed in the hot loop; ICI traffic is zero).
    """
    from ..mm.integrators import run_segment

    def run(states: MDState) -> MDState:
        return jax.vmap(lambda s: run_segment(step_fn, s, n_steps))(states)

    if mesh is None:
        return jax.jit(run)
    spec = NamedSharding(mesh, P(axis_name))
    return jax.jit(run, in_shardings=(spec,), out_shardings=spec)


def replica_temperatures(states: MDState, masses) -> jax.Array:
    """Per-replica instantaneous temperature [R] in K from velocities.

    Batched form of ``mm.instantaneous_temperature`` (3N degrees of
    freedom, no constraint correction) — a cheap health probe for
    drain/equilibration decisions, not a thermodynamic estimator.
    """
    from ..mm.integrators import instantaneous_temperature

    return jax.vmap(lambda s: instantaneous_temperature(s, masses))(states)


def redraw_hot_velocities(states: MDState, masses, temperatures,
                          threshold):
    """Re-thermalize fusion-trapped replicas; leave the rest untouched.

    ``threshold`` is in K — a scalar, or [R] for per-replica thresholds
    (temperature-ladder ensembles scale it with the rung temperature).

    On tanh-capped grids (the reference's cap, gridGeneration.cu:342) a
    replica that falls into a capped receptor-core well picks up a
    bounded high-kinetic-energy orbit that Langevin friction drains only
    slowly, and at fine grid spacings the orbit outruns any affordable
    streaming-region margin (BENCH_MATRIX "stress-MD rerun collapse").
    The standard MD-package remedy is a velocity re-draw during
    equilibration: replicas whose instantaneous temperature exceeds
    ``threshold`` get fresh Maxwell-Boltzmann velocities at their target
    temperature (scalar or [R] ladder) drawn from their OWN key stream;
    cold replicas keep bitwise-identical velocities AND keys, so their
    trajectories are unchanged.

    Returns ``(new_states, n_redrawn)``; jit-safe (one device dispatch).
    """
    from ..units import BOLTZ

    t_inst = replica_temperatures(states, masses)
    hot = t_inst > threshold
    m = jnp.asarray(masses, states.velocities.dtype)
    temps = jnp.broadcast_to(
        jnp.asarray(temperatures, t_inst.dtype), t_inst.shape)

    def redraw_one(s, h, t_target):
        k, sub = jax.random.split(s.key)
        sigma_v = jnp.sqrt(BOLTZ * t_target / m)[:, None]
        v = sigma_v * jax.random.normal(sub, s.positions.shape,
                                        dtype=s.velocities.dtype)
        return MDState(positions=s.positions,
                       velocities=jnp.where(h, v, s.velocities),
                       key=jnp.where(h, k, s.key))

    return jax.vmap(redraw_one)(states, hot, temps), jnp.sum(hot)


def init_replica_states(key, positions, masses, temperatures,
                        n_replicas: int) -> MDState:
    """Batched Maxwell-Boltzmann initialization; ``temperatures`` may be a
    scalar or a [R] array (replica-exchange ladders)."""
    from ..units import BOLTZ

    positions = jnp.asarray(positions)
    temps = jnp.broadcast_to(jnp.asarray(temperatures, positions.dtype),
                             (n_replicas,))
    keys = jax.random.split(key, n_replicas)

    def init_one(k, t):
        k, sub = jax.random.split(k)
        sigma_v = jnp.sqrt(BOLTZ * t / jnp.asarray(masses,
                                                   positions.dtype))[:, None]
        v = sigma_v * jax.random.normal(sub, positions.shape,
                                        dtype=positions.dtype)
        return MDState(positions=positions, velocities=v, key=k)

    return jax.vmap(init_one)(keys, temps)
