"""Integrators: Langevin (classic and BAOAB) and velocity Verlet, fused into
``lax.scan`` trajectories so full MD segments stay on-chip.

The classic scheme matches OpenMM's ``LangevinIntegrator`` (the integrator
the reference sampler uses, example/sampler.py:101-104):

    a = exp(-gamma dt)
    v <- a v + (1 - a) f / (m gamma) + sqrt(kT (1 - a^2) / m) xi
    x <- x + v dt

``langevin_middle`` is OpenMM's LangevinMiddleIntegrator (BAOAB splitting),
preferred for configurational sampling at large time steps.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..units import BOLTZ


class MDState(NamedTuple):
    positions: jax.Array   # [N, 3] nm
    velocities: jax.Array  # [N, 3] nm/ps
    key: jax.Array         # PRNG key


def initialize_state(key, positions, masses, temperature):
    """Maxwell-Boltzmann velocities at ``temperature``."""
    positions = jnp.asarray(positions)
    key, sub = jax.random.split(key)
    sigma_v = jnp.sqrt(BOLTZ * temperature / masses)[:, None]
    v = sigma_v * jax.random.normal(sub, positions.shape,
                                    dtype=positions.dtype)
    return MDState(positions=positions, velocities=v, key=key)


def _constrain(constraints, x_ref, x_new, v, dt):
    """SHAKE the positions and fold the correction into velocities."""
    from .constraints import apply_rattle, apply_shake

    x_c = apply_shake(constraints, x_ref, x_new)
    v = v + (x_c - x_new) / dt
    v = apply_rattle(constraints, x_c, v)
    return x_c, v


def make_langevin_step(force_fn: Callable, masses, dt, friction,
                       temperature, scheme: str = "classic",
                       constraints=None):
    """Build one Langevin step function state -> state.

    force_fn(positions) -> forces [N, 3] (kJ/mol/nm).
    masses [N] amu, dt ps, friction 1/ps, temperature K (may be a traced
    scalar for per-replica temperatures under vmap).
    ``constraints``: optional ConstraintSet — SHAKE after position updates
    with the correction folded into velocities, plus RATTLE projection
    (the HBonds workflow of the reference sampler, example/sampler.py:503).
    """
    masses = jnp.asarray(masses)
    inv_m = (1.0 / masses)[:, None]
    a = jnp.exp(-friction * dt)
    kT = BOLTZ * temperature
    # friction == 0 would make the classic force term 0/0 = NaN; use the
    # ballistic limit (1-a)/gamma -> dt like OpenMM's LangevinIntegrator.
    # The friction != 0 expression keeps the ORIGINAL operation order —
    # an ulp-level reorder changes every f32 trajectory (chaotic
    # sensitivity), which breaks reproducibility of published runs.
    zero_friction = friction == 0.0

    if scheme == "classic":
        def step(state: MDState) -> MDState:
            x, v, key = state
            key, sub = jax.random.split(key)
            f = force_fn(x)
            noise = jax.random.normal(sub, v.shape, dtype=v.dtype)
            kick = (dt * f * inv_m if zero_friction
                    else (1.0 - a) * f * inv_m / friction)
            v = (a * v + kick
                 + jnp.sqrt(kT * (1.0 - a * a) * inv_m) * noise)
            x_new = x + v * dt
            if constraints is not None:
                x_new, v = _constrain(constraints, x, x_new, v, dt)
            return MDState(x_new, v, key)
    elif scheme == "middle":
        def step(state: MDState) -> MDState:
            x, v, key = state
            key, sub = jax.random.split(key)
            f = force_fn(x)
            v = v + dt * f * inv_m
            x1 = x + 0.5 * dt * v
            if constraints is not None:
                x1, v = _constrain(constraints, x, x1, v, 0.5 * dt)
            noise = jax.random.normal(sub, v.shape, dtype=v.dtype)
            v = a * v + jnp.sqrt(kT * (1.0 - a * a) * inv_m) * noise
            x2 = x1 + 0.5 * dt * v
            if constraints is not None:
                x2, v = _constrain(constraints, x1, x2, v, 0.5 * dt)
            return MDState(x2, v, key)
    else:
        raise ValueError(f"unknown Langevin scheme {scheme!r}")
    return step


def make_verlet_step(force_fn: Callable, masses, dt, constraints=None):
    """Velocity Verlet (NVE), optionally with SHAKE/RATTLE constraints."""
    masses = jnp.asarray(masses)
    inv_m = (1.0 / masses)[:, None]

    def step(state: MDState) -> MDState:
        x, v, key = state
        f = force_fn(x)
        v_half = v + 0.5 * dt * f * inv_m
        x_new = x + dt * v_half
        if constraints is not None:
            x_new, v_half = _constrain(constraints, x, x_new, v_half, dt)
        f_new = force_fn(x_new)
        v_new = v_half + 0.5 * dt * f_new * inv_m
        if constraints is not None:
            from .constraints import apply_rattle
            v_new = apply_rattle(constraints, x_new, v_new)
        return MDState(x_new, v_new, key)

    return step


def run_segment(step_fn: Callable, state: MDState, n_steps: int,
                unroll: int = 4) -> MDState:
    """Run ``n_steps`` with lax.scan (jit-friendly, on-chip).

    ``unroll`` amortizes the backend's fixed per-iteration sequencing
    overhead (~0.17 ms/iteration measured on the tunneled v5e) over
    several physical steps per loop iteration.
    """
    def body(s, _):
        return step_fn(s), None

    final, _ = jax.lax.scan(body, state, None, length=n_steps,
                            unroll=min(unroll, max(n_steps, 1)))
    return final


def run_trajectory(step_fn: Callable, state: MDState, n_steps: int,
                   record_every: int = 1):
    """Run and record positions every ``record_every`` steps.

    Returns (final_state, positions [n_steps // record_every, N, 3]).
    ``n_steps`` must be a multiple of ``record_every`` — silently
    simulating fewer steps than asked would corrupt any caller that
    trusts the final state."""
    if n_steps % record_every:
        raise ValueError(
            f"n_steps={n_steps} is not a multiple of "
            f"record_every={record_every}; the trajectory would silently "
            f"stop at {(n_steps // record_every) * record_every} steps")

    def inner(s, _):
        s2 = step_fn(s)
        return s2, None

    def body(s, _):
        s, _ = jax.lax.scan(inner, s, None, length=record_every,
                            unroll=4)
        return s, s.positions

    final, traj = jax.lax.scan(body, state, None,
                               length=n_steps // record_every)
    return final, traj


def kinetic_energy(state: MDState, masses):
    m = jnp.asarray(masses)[:, None]
    return 0.5 * jnp.sum(m * state.velocities ** 2)


def instantaneous_temperature(state: MDState, masses):
    n_dof = 3 * state.positions.shape[-2]
    return 2.0 * kinetic_energy(state, masses) / (n_dof * BOLTZ)


def make_respa_langevin_step(slow_force_fn: Callable,
                             fast_force_fn: Callable, masses, dt_outer,
                             n_inner: int, friction, temperature,
                             constraints=None):
    """Multiple-timestep (r-RESPA) Langevin step.

    Slow forces (grid interactions — smooth, expensive gathers) kick at
    ``dt_outer``; fast forces (stiff bonded/intramolecular terms)
    integrate with classic Langevin at ``dt_outer / n_inner``. Impulse
    (Trotter) splitting:

        v += dt/2 * F_slow / m
        n_inner x { classic Langevin step with F_fast at dt/n }
        v += dt/2 * F_slow / m

    Halves-to-quarters the grid-gather cost per unit simulated time while
    resolving bond vibrations at the small step. Not part of the
    reference's feature set; validated in tests/test_respa.py.

    The returned step maps ``(MDState, f_slow) -> (MDState, f_slow)``:
    the closing half-kick's slow force IS the next step's opening one
    (same positions), so it is carried rather than recomputed — inside a
    ``lax.scan`` XLA cannot CSE across iterations, and recomputing would
    double the very cost the splitting amortizes. Use
    :func:`run_respa_segment` (or seed the carry with
    ``slow_force_fn(state.positions)``).
    """
    masses = jnp.asarray(masses)
    inv_m = (1.0 / masses)[:, None]
    inner = make_langevin_step(fast_force_fn, masses, dt_outer / n_inner,
                               friction, temperature,
                               constraints=constraints)

    def step(carry):
        state, f_slow = carry
        x, v, key = state
        v = v + 0.5 * dt_outer * f_slow * inv_m
        s = MDState(x, v, key)
        s = run_segment(inner, s, n_inner, unroll=n_inner)
        f_slow2 = slow_force_fn(s.positions)
        v = s.velocities + 0.5 * dt_outer * f_slow2 * inv_m
        if constraints is not None:
            from .constraints import apply_rattle
            v = apply_rattle(constraints, s.positions, v)
        return MDState(s.positions, v, s.key), f_slow2

    return step


def run_respa_segment(step_fn: Callable, slow_force_fn: Callable,
                      state: MDState, n_outer: int) -> MDState:
    """Advance ``n_outer`` r-RESPA outer steps: ONE slow-force
    evaluation per outer step (plus one to seed the carry)."""
    carry = (state, slow_force_fn(state.positions))

    def body(c, _):
        return step_fn(c), None

    (final, _), _ = jax.lax.scan(body, carry, None, length=n_outer)
    return final
