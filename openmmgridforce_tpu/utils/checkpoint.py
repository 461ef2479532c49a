"""Checkpoint/resume for MD and sampler state.

The reference persists only grids (V3/OMGTILE files) and writes text
trajectories (SURVEY section 5); full simulation state had no
checkpointing. Here any pytree of arrays (MDState, batched replica states,
sampler RNG keys) round-trips through a single .npz file with the tree
structure stored alongside, so long campaigns survive preemption.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_pytree(path, tree) -> None:
    """Save a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in
              enumerate(leaves)}
    np.savez(path, __treedef__=np.frombuffer(
        str(treedef).encode(), dtype=np.uint8), **arrays)


def load_pytree(path, like):
    """Load arrays saved by save_pytree into the structure of ``like``.

    ``like`` supplies the pytree structure (and dtypes for jax arrays).
    """
    import jax.numpy as jnp

    z = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    n = len(leaves)
    loaded = []
    for i in range(n):
        arr = z[f"leaf_{i}"]
        ref = leaves[i]
        if isinstance(ref, jax.Array):
            loaded.append(jnp.asarray(arr, dtype=ref.dtype))
        else:
            loaded.append(type(ref)(arr) if np.ndim(arr) == 0 else arr)
    return jax.tree.unflatten(treedef, loaded)


def save_sampler(path, sampler) -> None:
    """Checkpoint a sampling.Sampler (replica states + RNG + MC stats)."""
    save_pytree(f"{path}.states.npz", sampler.states)
    meta = {
        "key": np.asarray(sampler._key).tolist(),
        "rng_state": sampler._rng.bit_generator.state,
        "n_exchange_accepted": sampler.n_exchange_accepted,
        "n_exchange_attempted": sampler.n_exchange_attempted,
        "n_gmc_accepted": sampler.n_gmc_accepted,
        "n_gmc_attempted": sampler.n_gmc_attempted,
    }
    with open(f"{path}.meta.json", "w") as fh:
        json.dump(meta, fh)


def load_sampler(path, sampler) -> None:
    """Restore a checkpoint into an already-constructed Sampler."""
    import jax.numpy as jnp

    sampler.states = load_pytree(f"{path}.states.npz", sampler.states)
    with open(f"{path}.meta.json") as fh:
        meta = json.load(fh)
    sampler._key = jnp.asarray(np.asarray(meta["key"], dtype=np.uint32))
    sampler._rng.bit_generator.state = meta["rng_state"]
    sampler.n_exchange_accepted = meta["n_exchange_accepted"]
    sampler.n_exchange_attempted = meta["n_exchange_attempted"]
    sampler.n_gmc_accepted = meta["n_gmc_accepted"]
    sampler.n_gmc_attempted = meta["n_gmc_attempted"]
