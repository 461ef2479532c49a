"""Context / Simulation / integrator shells over the functional core.

The reference delegated its runtime to OpenMM (System, Context, integrators,
force groups — SURVEY section 1); this module supplies a minimal TPU-native
equivalent with the same user-facing shapes:

    system = create_system(prmtop_path)            # AmberPrmtopFile.createSystem
    system.addForce(grid_force)                    # System.addForce
    ctx = Context(system, LangevinIntegrator(300, 1, 0.002))
    ctx.setPositions(x)
    state = ctx.getState(getEnergy=True, groups={0})
    state.getPotentialEnergy()
    ctx.getIntegrator().step(100)

Internally everything is resolved to frozen pytrees at Context creation and
evaluated by one jitted function; stepping runs jitted lax.scan segments.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid
from ..mm.amber import AmberTopology, load_prmtop
from ..mm.forcefield import (angle_energy, bond_energy, torsion_energy)
from ..mm.integrators import (MDState, make_langevin_step,
                              make_verlet_step, run_segment)
from ..ops.gridgen import auto_scaling_factors, generate_grid
from ..ops.interpolate import evaluate_grid
from ..ops.pairwise import pair_energy_forces
from ..units import BOLTZ
from .gridforce import Force, GridForce
from .isolated import IsolatedNonbondedForce


# ----------------------------------------------------------------------
# Internal force wrappers (so `for f in system.getForces(): f.setForceGroup`
# works like it does with OpenMM systems)
# ----------------------------------------------------------------------

class HarmonicBondForce(Force):
    pass


class HarmonicAngleForce(Force):
    pass


class PeriodicTorsionForce(Force):
    pass


class NonbondedForce(Force):
    """Intra-system nonbonded (dense pair table) + per-atom parameters."""

    def __init__(self, charges, sigmas, epsilons):
        super().__init__()
        self.charges = np.asarray(charges)
        self.sigmas = np.asarray(sigmas)
        self.epsilons = np.asarray(epsilons)

    def getNumParticles(self):
        return len(self.charges)

    def getParticleParameters(self, i):
        return (self.charges[i], self.sigmas[i], self.epsilons[i])


class ApiSystem:
    """Holds topology-derived terms plus user-added forces."""

    def __init__(self, topology: AmberTopology,
                 hydrogen_mass: Optional[float] = None,
                 constraints: Optional[str] = None,
                 remove_cm_motion: bool = True):
        from ..mm.system import system_from_amber

        self.topology = topology
        self._core = system_from_amber(topology, dtype=jnp.float64,
                                       hydrogen_mass=hydrogen_mass,
                                       constraints=constraints)
        self.constraints = constraints
        self._forces: List[Force] = [
            HarmonicBondForce(),
            HarmonicAngleForce(),
            PeriodicTorsionForce(),
            NonbondedForce(topology.charges, topology.sigmas,
                           topology.epsilons),
        ]

    def getNumParticles(self):
        return self.topology.natom

    def getParticleMass(self, i):
        return float(self._core.masses[i])

    def addForce(self, force: Force):
        self._forces.append(force)
        return len(self._forces) - 1

    def getForces(self):
        return list(self._forces)

    def getNumForces(self):
        return len(self._forces)

    def getForce(self, index):
        return self._forces[index]

    def removeForce(self, index):
        del self._forces[index]


def create_system(prmtop, hydrogen_mass=None, constraints=None,
                  nonbonded_method="NoCutoff") -> ApiSystem:
    """Mirror of ``AmberPrmtopFile.createSystem(nonbondedMethod=NoCutoff)``.

    ``prmtop`` may be a path or a parsed AmberTopology."""
    if nonbonded_method not in ("NoCutoff",):
        raise NotImplementedError(
            "only NoCutoff is supported (matching the reference workflows)")
    top = prmtop if isinstance(prmtop, AmberTopology) else \
        load_prmtop(prmtop)
    return ApiSystem(top, hydrogen_mass=hydrogen_mass,
                     constraints=constraints)


# ----------------------------------------------------------------------
# Integrators
# ----------------------------------------------------------------------

class _Integrator:
    def __init__(self, dt):
        self.dt = float(dt)
        self._context: Optional["Context"] = None

    def getStepSize(self):
        return self.dt

    def step(self, n):
        self._context._step(int(n))


class VerletIntegrator(_Integrator):
    kind = "verlet"


class LangevinIntegrator(_Integrator):
    kind = "langevin"
    scheme = "classic"

    def __init__(self, temperature, friction, dt):
        super().__init__(dt)
        self.temperature = float(temperature)
        self.friction = float(friction)

    def getTemperature(self):
        return self.temperature

    def setTemperature(self, t):
        self.temperature = float(t)
        if self._context is not None:
            self._context._invalidate_stepper()

    def getFriction(self):
        return self.friction


class LangevinMiddleIntegrator(LangevinIntegrator):
    scheme = "middle"


# ----------------------------------------------------------------------
# State
# ----------------------------------------------------------------------

class State:
    def __init__(self, positions=None, velocities=None, energy=None,
                 forces=None, kinetic=None):
        self._positions = positions
        self._velocities = velocities
        self._energy = energy
        self._forces = forces
        self._kinetic = kinetic

    def getPositions(self, asNumpy=True):
        return self._positions

    def getVelocities(self, asNumpy=True):
        return self._velocities

    def getPotentialEnergy(self):
        return self._energy

    def getKineticEnergy(self):
        return self._kinetic

    def getForces(self, asNumpy=True):
        return self._forces


# ----------------------------------------------------------------------
# Context
# ----------------------------------------------------------------------

class _GridBindingInfo:
    """Resolved evaluation plan for one GridForce."""

    def __init__(self, grid, atom_indices, scaling, group_sizes,
                 streamer=None):
        self.grid = grid                # Grid, or None when streamed
        self.streamer = streamer        # StreamedGridEvaluator or None
        self.atom_indices = jnp.asarray(atom_indices, dtype=jnp.int32)
        self.scaling = jnp.asarray(scaling, dtype=jnp.float64)
        self.group_sizes = group_sizes  # list[int], empty if no groups


class Platform:
    """Mirror of openmm.Platform. ``Reference`` selects the reference
    platform's evaluation semantics (quirks Q1-Q5, Q12 — see
    ops/reference_semantics.py); ``Common``/``OpenCL`` selects the
    portable kernel's semantics (quirk Q6 scaled OOB restraint force,
    bare-pow inverse power, trilinear/B-spline only — see
    ops/common_semantics.py); ``Compensated`` (alias ``Accurate``)
    evaluates in-memory GridForces through the double-float32 accuracy
    tier (ops/compensated.py: f64-packed (hi|lo) Chebyshev rows,
    double-word f32 arithmetic, CUDA-convention semantics) — ~5e-8 of
    field scale with zero on-device float64, at roughly an order of
    magnitude more VPU flops; tiled/streamed GridForces under it keep
    the plain streamed path. Anything else (or None) selects the
    engine's default CUDA-convention kernels."""

    def __init__(self, name):
        self._name = name

    def getName(self):
        return self._name

    @staticmethod
    def getPlatformByName(name):
        return Platform(name)


class Context:
    def __init__(self, system: ApiSystem, integrator: _Integrator,
                 platform=None, seed: int = 0):
        self.system = system
        self.integrator = integrator
        integrator._context = self
        name = (platform.getName() if hasattr(platform, "getName")
                else platform)
        name = str(name).lower()
        self._semantics = ("reference" if name == "reference"
                           else "common" if name in ("common", "opencl")
                           else "compensated" if name in ("compensated",
                                                          "accurate")
                           else "cuda")
        # lazily built double-float32 packs (Platform("Compensated"));
        # invalidated with the grid bindings on updateParametersInContext
        self._comp_packs: Dict[int, object] = {}
        self._positions: Optional[jax.Array] = None
        self._velocities: Optional[jax.Array] = None
        self._key = jax.random.PRNGKey(seed)
        self._grid_infos: Dict[int, _GridBindingInfo] = {}
        self._iso_infos: Dict[int, tuple] = {}
        self._steppers: Dict[int, object] = {}   # n_steps -> jitted runner
        self._last_grid_results: Dict[int, object] = {}
        # streamed grids: host-side region refresh cadence during stepping
        # (the reference re-prepares tiles EVERY step,
        # CudaGridForceKernels.cpp:888-975; here the region carries enough
        # margin that one refresh serves a whole jitted segment). Same
        # default cadence as mm.StreamedBatchMD — stepping DELEGATES to
        # that engine (a Context is a batch of one replica), so both
        # paths share its running-bbox exactness guarantee.
        self.stream_refresh_steps = 50
        # cap on the full-grid escalation payload for streamed MD (see
        # mm.streamed_md.StreamSet); 0 disables escalation — a cloud
        # that outruns every bounded region then raises instead
        self.stream_full_region_budget_bytes = 4 << 30
        self._stream_engine = None
        self._min_segs: Dict[tuple, object] = {}
        self._initialize_forces()

    # --- force resolution (the reference's kernel initialize() path) ----
    def _initialize_forces(self):
        n = self.system.getNumParticles()
        top = self.system.topology
        for idx, force in enumerate(self.system.getForces()):
            if isinstance(force, GridForce):
                self._grid_infos[idx] = self._resolve_grid_force(force, n,
                                                                 top)
                force._context = self
            elif isinstance(force, IsolatedNonbondedForce):
                table, particles = force._build()
                self._iso_infos[idx] = (table,
                                        jnp.asarray(particles,
                                                    dtype=jnp.int32))

    def _resolve_grid_force(self, force: GridForce, n_particles,
                            top) -> _GridBindingInfo:
        # auto scaling factors (reference
        # ReferenceGridForceKernels.cpp:162-210; rmin convention of the
        # CUDA/common platforms)
        scaling = np.asarray(force.getScalingFactors(), dtype=np.float64)
        if force.getAutoCalculateScalingFactors() and scaling.size == 0:
            prop = force.getScalingProperty()
            if not prop:
                raise ValueError(
                    "Auto-calculate scaling factors enabled but no scaling "
                    "property specified")
            # Q5: the reference platform auto-scales with (2*sigma)
            # diameter formulas (ReferenceGridForceKernels.cpp:196-205);
            # CUDA/common use Rmin (CudaGridForceKernels.cpp:175-185)
            scaling = np.asarray(auto_scaling_factors(
                prop, top.charges, top.sigmas, top.epsilons,
                convention=("diameter" if self._semantics == "reference"
                            else "rmin")))
            force.setScalingFactors(scaling)

        # tiled generate -> evaluate pipeline (reference
        # CudaGridForceKernels.cpp:323-345, 1411-1658): with a tiled output
        # file configured, auto-generation writes straight to disk and the
        # file becomes the tiled input
        if (force.getAutoGenerateGrid() and force.getTiledOutputFile()
                and not force.getTiledInputFile()):
            from ..ops.gridgen import generate_grid_to_tiled_file
            gt = force.getGridType()
            counts, spacing, _, _ = force.getGridParameters()
            rec = force.getReceptorAtoms()
            lig = set(force.getLigandAtoms())
            if not rec:
                rec = [i for i in range(n_particles) if i not in lig]
            rec_pos = force.getReceptorPositions()
            generate_grid_to_tiled_file(
                force.getTiledOutputFile(), counts, spacing,
                force.getGridOrigin(), gt, rec_pos[:len(rec)],
                top.charges[rec], top.sigmas[rec], top.epsilons[rec],
                tile_size=force.getTiledOutputTileSize(),
                compute_derivatives=force.getComputeDerivatives(),
                grid_cap=force.getGridCap(),
                inv_power=force.getInvPower(),
                inv_power_mode=force.getInvPowerMode())
            force.setTiledInputFile(force.getTiledOutputFile())

        streamer = None
        # a tiled input file always means file-backed evaluation
        if force.getTiledInputFile():
            from ..io.streaming import StreamedGridEvaluator
            streamer = StreamedGridEvaluator(
                force.getTiledInputFile(),
                interp_method=force.getInterpolationMethod(),
                region_shape=(force.getStreamRegionShape()
                              or (64, 64, 64)),
                budget_bytes=force.getMemoryBudgetMB() * 1024 * 1024,
                oob_k=force.getOutOfBoundsRestraint(),
                oob_convention=force.getTiledOOBConvention())
            grid = None
        # auto grid generation (reference :212-278)
        elif force.getAutoGenerateGrid() and force.getNumGridValues() == 0:
            gt = force.getGridType()
            if gt not in ("charge", "ljr", "lja"):
                raise ValueError(f"Invalid grid type '{gt}'")
            counts, spacing, _, _ = force.getGridParameters()
            if len(counts) != 3 or len(spacing) != 3:
                raise ValueError("Grid counts and spacing must be set "
                                 "before auto-generation")
            rec = force.getReceptorAtoms()
            lig = set(force.getLigandAtoms())
            if not rec:
                rec = [i for i in range(n_particles) if i not in lig]
            rec_pos = force.getReceptorPositions()
            if rec_pos.shape[0] == 0:
                raise ValueError("Receptor positions must be set for "
                                 "auto-grid generation")
            if rec_pos.shape[0] < len(rec):
                raise ValueError("Not enough receptor positions provided")
            grid = generate_grid(
                counts, spacing, force.getGridOrigin(), gt,
                rec_pos[:len(rec)],
                top.charges[rec], top.sigmas[rec], top.epsilons[rec],
                compute_derivatives=force.getComputeDerivatives(),
                grid_cap=force.getGridCap(),
                inv_power=force.getInvPower(),
                inv_power_mode=force.getInvPowerMode(),
                interp_method=force.getInterpolationMethod(),
                oob_k=force.getOutOfBoundsRestraint(),
                # Q3: reference-platform generation uses 2*sigma LJ sizes
                lj_convention=("diameter"
                               if self._semantics == "reference"
                               else "rmin"),
                dtype=jnp.float64)
            force.setGridValues(np.asarray(grid.vals).reshape(-1))
            if grid.derivs is not None:
                force.setDerivatives(
                    np.moveaxis(np.asarray(grid.derivs), -1, 0).reshape(-1))
        else:
            grid = force._build_grid()

        # Q4: the reference platform applies RUNTIME inverse-power as a
        # one-time host-side value transform at Context init
        # (GridForce.cpp:221-272: G -> sign(G)|G|^(1/n), mode -> STORED),
        # then its kernels back-transform on inv_power > 0 alone
        if (self._semantics == "reference" and grid is not None
                and grid.inv_power_mode == 1 and grid.inv_power != 0.0
                and grid.derivs is None):
            import dataclasses as _dc
            v = grid.vals
            sign = jnp.where(v >= 0.0, 1.0, -1.0)
            v2 = jnp.where(v != 0.0,
                           sign * jnp.abs(v) ** (1.0 / grid.inv_power), v)
            grid = _dc.replace(grid, vals=v2, inv_power_mode=2)

        # atom selection (priority mirrors CudaGridForceKernels.cpp:
        # particle groups > particle filter > ligand atoms > all)
        group_sizes: List[int] = []
        if force.getNumParticleGroups() > 0:
            atom_indices = []
            scal = []
            for gi in range(force.getNumParticleGroups()):
                g = force.getParticleGroup(gi)
                atom_indices.extend(g.particle_indices)
                if g.scaling_factors:
                    scal.extend(g.scaling_factors)
                else:
                    scal.extend(scaling[g.particle_indices])
                group_sizes.append(len(g.particle_indices))
            atom_indices = np.asarray(atom_indices, dtype=np.int32)
            scal = np.asarray(scal, dtype=np.float64)
        elif force.getParticles():
            atom_indices = np.asarray(force.getParticles(), dtype=np.int32)
            scal = scaling[atom_indices]
        elif force.getLigandAtoms():
            atom_indices = np.asarray(force.getLigandAtoms(),
                                      dtype=np.int32)
            # ligand-local scaling factors (reference semantics,
            # ReferenceGridForceKernels.cpp:682-706)
            scal = (scaling[:len(atom_indices)]
                    if len(scaling) == len(atom_indices)
                    else scaling[atom_indices])
        else:
            atom_indices = np.arange(min(len(scaling), n_particles),
                                     dtype=np.int32)
            scal = scaling[:len(atom_indices)]

        return _GridBindingInfo(grid, atom_indices, scal, group_sizes,
                                streamer=streamer)

    def _rebind_force(self, force):
        self._initialize_forces()
        self._comp_packs = {}
        self._invalidate_stepper()

    def _compensated_pack(self, idx):
        """The (hi|lo) double-float32 pack for in-memory GridForce
        ``idx`` (Platform("Compensated")), built once per binding. The
        force's own f64 origin/spacing are passed as exact-geometry
        overrides: a float32 Grid's rounded geometry shifts the cell
        fraction by ~1e-7*t, the dominant compensated-tier error on
        large grids (see ops/compensated.pack_grid_compensated)."""
        cp = self._comp_packs.get(idx)
        if cp is None:
            from ..ops.compensated import pack_grid_compensated
            force = self.system.getForces()[idx]
            _, spacing, _, _ = force.getGridParameters()
            origin = force.getGridOrigin()
            info = self._grid_infos[idx]
            kw = {}
            if len(spacing) == 3:
                kw = dict(origin=np.asarray(origin, np.float64),
                          spacing=np.asarray(spacing, np.float64))
            cp = pack_grid_compensated(info.grid, **kw)
            self._comp_packs[idx] = cp
        return cp

    # --- evaluation ------------------------------------------------------
    def _per_force_terms(self, positions, grid_args=None, exclude=()):
        """Returns dict force_index -> (energy, forces [N,3]).

        ``grid_args``: optional dict force_index -> Grid overriding the
        resolved grid data. This is how jitted paths (stepping,
        minimization) receive grids as ARGUMENTS instead of baking them
        into the program as HLO constants (the remote TPU compiler
        rejects >~100 MB programs — see mm.make_md_runner).

        ``exclude``: force indices to skip entirely — the streamed-MD
        engine evaluates streamed GridForces itself, and its jitted
        paths must never reach the host-side streamer branch below.
        """
        core = self.system._core
        out = {}
        for idx, force in enumerate(self.system.getForces()):
            if idx in exclude:
                continue
            if isinstance(force, HarmonicBondForce):
                e, g = jax.value_and_grad(
                    lambda x: bond_energy(x, core.bond_idx, core.bond_k,
                                          core.bond_r0))(positions)
                out[idx] = (e, -g)
            elif isinstance(force, HarmonicAngleForce):
                e, g = jax.value_and_grad(
                    lambda x: angle_energy(x, core.angle_idx, core.angle_k,
                                           core.angle_t0))(positions)
                out[idx] = (e, -g)
            elif isinstance(force, PeriodicTorsionForce):
                e, g = jax.value_and_grad(
                    lambda x: torsion_energy(x, core.torsion_idx,
                                             core.torsion_k,
                                             core.torsion_per,
                                             core.torsion_phase))(positions)
                out[idx] = (e, -g)
            elif isinstance(force, NonbondedForce):
                e, f = pair_energy_forces(core.pairs, positions)
                out[idx] = (e, f)
            elif isinstance(force, GridForce):
                info = self._grid_infos[idx]
                override = None if grid_args is None else grid_args.get(idx)
                if info.streamer is not None:
                    res = info.streamer.evaluate(
                        np.asarray(positions)[np.asarray(info.atom_indices)],
                        np.asarray(info.scaling))
                elif self._semantics == "reference":
                    from ..ops.reference_semantics import (
                        evaluate_grid_reference)
                    res = evaluate_grid_reference(
                        info.grid if override is None else override,
                        positions[info.atom_indices],
                        info.scaling)
                elif self._semantics == "common":
                    from ..ops.common_semantics import evaluate_grid_common
                    res = evaluate_grid_common(
                        info.grid if override is None else override,
                        positions[info.atom_indices],
                        info.scaling)
                elif self._semantics == "compensated":
                    from ..ops.compensated import evaluate_compensated
                    res = evaluate_compensated(
                        self._compensated_pack(idx) if override is None
                        else override,
                        positions[info.atom_indices],
                        info.scaling)
                else:
                    res = evaluate_grid(
                        info.grid if override is None else override,
                        positions[info.atom_indices],
                        info.scaling)
                # Q1: the reference platform writes grid forces to the
                # LOOP index, not the particle index
                # (ReferenceGridForceKernels.cpp:688 vs :794) — correct
                # only when ligand atoms are 0..N-1; reproduced verbatim
                # in reference semantics
                tgt = (jnp.arange(info.atom_indices.shape[0])
                       if (self._semantics == "reference"
                           and info.streamer is None)
                       else info.atom_indices)
                f = jnp.zeros_like(positions).at[tgt].add(
                    jnp.asarray(res.forces, positions.dtype))
                out[idx] = (jnp.asarray(res.energy, positions.dtype), f)
            elif isinstance(force, IsolatedNonbondedForce):
                table, particles = self._iso_infos[idx]
                e, fp = pair_energy_forces(table, positions[particles])
                f = jnp.zeros_like(positions).at[particles].add(fp)
                out[idx] = (e, f)
            else:
                raise TypeError(f"unknown force type {type(force)}")
        return out

    def _group_mask_terms(self, positions, groups: Optional[set],
                          grid_args=None, exclude=()):
        terms = self._per_force_terms(positions, grid_args, exclude)
        energy = jnp.zeros((), dtype=positions.dtype)
        forces = jnp.zeros_like(positions)
        for idx, force in enumerate(self.system.getForces()):
            if idx not in terms:
                continue
            if groups is not None and force.getForceGroup() not in groups:
                continue
            e, f = terms[idx]
            energy = energy + e
            forces = forces + f
        return energy, forces

    # --- public API --------------------------------------------------------
    def getIntegrator(self):
        return self.integrator

    def getSystem(self):
        return self.system

    def setPositions(self, positions):
        # positions flow through the jitted steppers as arguments, so no
        # stepper invalidation (a rebuild costs a full remote recompile)
        self._positions = jnp.asarray(np.asarray(positions,
                                                 dtype=np.float64))

    def getPositions(self):
        return np.asarray(self._positions)

    def setVelocities(self, velocities):
        self._velocities = jnp.asarray(np.asarray(velocities,
                                                  dtype=np.float64))

    def setVelocitiesToTemperature(self, temperature, seed=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        masses = self.system._core.masses
        sigma_v = jnp.sqrt(BOLTZ * temperature / masses)[:, None]
        self._velocities = sigma_v * jax.random.normal(
            sub, self._positions.shape, dtype=self._positions.dtype)

    def getState(self, getPositions=False, getVelocities=False,
                 getEnergy=False, getForces=False, groups=None, **_ignored):
        st = State(
            positions=np.asarray(self._positions),
            velocities=(np.asarray(self._velocities)
                        if self._velocities is not None else None),
        )
        if getEnergy or getForces:
            gset = set(groups) if groups is not None else None
            e, f = self._group_mask_terms(self._positions, gset)
            st._energy = float(e)
            st._forces = np.asarray(f)
            if self._velocities is not None:
                m = self.system._core.masses[:, None]
                st._kinetic = float(
                    0.5 * jnp.sum(m * self._velocities ** 2))
        return st

    # --- stepping ----------------------------------------------------------
    def _invalidate_stepper(self):
        self._steppers = {}
        self._stream_engine = None
        self._min_segs = {}

    def _memory_grid_indices(self):
        return [i for i in sorted(self._grid_infos)
                if self._grid_infos[i].streamer is None]

    def _streamed_force_indices(self):
        return frozenset(i for i in self._grid_infos
                         if self._grid_infos[i].streamer is not None)

    def _grid_arguments(self):
        """In-memory grid pytrees to pass through jit as ARGUMENTS
        (never baked as HLO constants — the remote TPU compiler rejects
        >~100 MB programs). Streamed forces are NOT returned here: the
        streamed-MD engine owns their region payloads. Under
        Platform("Compensated") the arguments are the (hi|lo) packs —
        the same override channel, so stepping stays constant-free."""
        gidx = self._memory_grid_indices()
        if self._semantics == "compensated":
            return gidx, tuple(self._compensated_pack(i) for i in gidx)
        return gidx, tuple(self._grid_infos[i].grid for i in gidx)

    def _ensure_stream_engine(self):
        """The ONE streamed-MD engine (mm.StreamedBatchMD) this Context
        delegates streamed stepping and minimization to — a Context is a
        batch of one replica. Streamed GridForces over the same box with
        the same atoms fuse into one StreamSet; the reference applies
        each GridForce's out-of-bounds restraint independently
        (ReferenceGridForceKernels.cpp:1093-1117), so a fused set
        carries the SUM of its forces' restraint k."""
        if self._stream_engine is not None:
            return self._stream_engine
        from ..mm.streamed_md import StreamedBatchMD, StreamSet

        groups = {}
        for idx in sorted(self._grid_infos):
            info = self._grid_infos[idx]
            if info.streamer is None:
                continue
            ev = info.streamer
            # interp_method and per-grid oob_k are part of the key:
            # pack fusion requires both to match across a set's grids
            # (pack_grids_fused raises otherwise), so e.g. a TRILINEAR
            # charge force and a BSPLINE LJ force over the same box
            # must land in separate sets
            key = (tuple(int(c) for c in ev.stream.counts),
                   tuple(np.round(np.asarray(ev.stream.spacing), 12)),
                   tuple(np.round(np.asarray(ev.stream.origin), 12)),
                   tuple(ev.region_shape),
                   int(ev.interp_method), float(ev.oob_k),
                   tuple(np.asarray(info.atom_indices).tolist()))
            groups.setdefault(key, []).append(info)
        sets = [
            StreamSet([i.streamer for i in infos],
                      [np.asarray(i.scaling) for i in infos],
                      atom_indices=np.asarray(infos[0].atom_indices),
                      oob_k=sum(float(i.streamer.oob_k) for i in infos),
                      full_region_budget_bytes=int(
                          self.stream_full_region_budget_bytes))
            for infos in groups.values()
        ]

        core = self.system._core
        integ = self.integrator
        if isinstance(integ, LangevinIntegrator):
            def step_factory(force_fn, t, base_args):
                return make_langevin_step(force_fn, core.masses, integ.dt,
                                          integ.friction, t,
                                          scheme=integ.scheme,
                                          constraints=core.constraints)
        elif isinstance(integ, VerletIntegrator):
            def step_factory(force_fn, t, base_args):
                return make_verlet_step(force_fn, core.masses, integ.dt,
                                        constraints=core.constraints)
        else:
            raise TypeError(f"unknown integrator {type(integ)}")

        gidx_mem = self._memory_grid_indices()
        excl = self._streamed_force_indices()

        def base_force(base_args, x):
            grid_args = dict(zip(gidx_mem, base_args))
            return self._group_mask_terms(x, None, grid_args,
                                          exclude=excl)[1]

        self._stream_engine = StreamedBatchMD(
            sets=sets,
            refresh_steps=max(1, int(self.stream_refresh_steps)),
            step_factory=step_factory, base_force=base_force)
        return self._stream_engine

    def _build_stepper(self, n_steps):
        core = self.system._core
        gidx = self._memory_grid_indices()
        integ = self.integrator

        def run(st, grids):
            grid_args = dict(zip(gidx, grids))

            def force_fn(x):
                return self._group_mask_terms(x, None, grid_args)[1]

            if isinstance(integ, LangevinIntegrator):
                step = make_langevin_step(force_fn, core.masses, integ.dt,
                                          integ.friction, integ.temperature,
                                          scheme=integ.scheme,
                                          constraints=core.constraints)
            elif isinstance(integ, VerletIntegrator):
                step = make_verlet_step(force_fn, core.masses, integ.dt,
                                        constraints=core.constraints)
            else:
                raise TypeError(f"unknown integrator {type(integ)}")
            return run_segment(step, st, n_steps)

        stepper = jax.jit(run)
        self._steppers[n_steps] = stepper
        return stepper

    def _step(self, n):
        if self._positions is None:
            raise RuntimeError("setPositions first")
        if self._velocities is None:
            self._velocities = jnp.zeros_like(self._positions)
        n = int(n)
        if self._streamed_force_indices():
            # delegate to the batch streamed-MD engine (R=1): running
            # in-scan bbox exactness, chunked re-run recovery with
            # re-centered regions, hysteresis, shared packed-region LRU
            eng = self._ensure_stream_engine()
            eng.refresh_steps = max(1, int(self.stream_refresh_steps))
            _, grids = self._grid_arguments()
            temp = getattr(self.integrator, "temperature", 0.0)
            states = MDState(self._positions[None],
                             self._velocities[None], self._key[None])
            out = eng.run(states, np.asarray([temp]), n, base_args=grids)
            self._positions = out.positions[0]
            self._velocities = out.velocities[0]
            self._key = out.key[0]
            return
        done = 0
        while done < n:
            k = n - done
            stepper = self._steppers.get(k) or self._build_stepper(k)
            _, grids = self._grid_arguments()
            self._key, sub = jax.random.split(self._key)
            st = stepper(MDState(self._positions, self._velocities, sub),
                         grids)
            self._positions = st.positions
            self._velocities = st.velocities
            done += k

    def _minimize_streamed(self, maxIterations, tolerance, chunk=25):
        """L-BFGS minimization over streamed (tiled-file) grids with the
        SAME exactness guarantee as streamed stepping: the loop runs in
        jitted segments that carry a RUNNING in-grid cloud bbox per
        stream set (the min/max over every iterate, so excursions that
        self-reverse are still seen); a segment whose bbox leaves a
        region interior is DISCARDED and re-run with the violators'
        regions re-centered on the current cloud. Mirrors the
        reference's tiled semantics where every evaluation sees exact
        tiles (CudaGridForceKernels.cpp:888-975). Region state
        (hysteresis, packed LRU) is shared with the stepping engine."""
        import optax

        from ..mm.streamed_md import _CLOUD_BOUNDS_JIT, _cloud_bounds
        from ..ops.packed import evaluate_multi

        eng = self._ensure_stream_engine()
        sets = eng.sets
        gidx_mem, grids = self._grid_arguments()
        excl = self._streamed_force_indices()
        scal_args = tuple(jnp.asarray(s.scal_stack) for s in sets)
        metas = [(np.asarray(s.full_box[0]), np.asarray(s.full_box[1]),
                  float(s.oob_k),
                  None if s.atom_idx is None else jnp.asarray(s.atom_idx))
                 for s in sets]
        opt = optax.lbfgs()

        seg_key = (int(maxIterations), float(tolerance), int(chunk))
        seg = self._min_segs.get(seg_key)
        if seg is None:
            def seg_fn(x0, st0, it0, grids, payloads, scals):
                grid_args = dict(zip(gidx_mem, grids))
                dtype = x0.dtype
                boxes = [(jnp.asarray(lo, dtype), jnp.asarray(hi, dtype))
                         for lo, hi, _, _ in metas]

                def energy(p):
                    e = self._group_mask_terms(p, None, grid_args,
                                               exclude=excl)[0]
                    for meta, (blo, bhi), pay, sc in zip(
                            metas, boxes, payloads, scals):
                        xi = p if meta[3] is None else p[meta[3]]
                        if isinstance(pay, tuple):   # direct fallback
                            pa = sum(evaluate_grid(g, xi,
                                                   sc[gi]).per_atom_energy
                                     for gi, g in enumerate(pay))
                        else:
                            pa = evaluate_multi(pay, xi,
                                                sc).per_atom_energy
                        inside = jnp.all((xi >= blo) & (xi <= bhi),
                                         axis=1)
                        dev = jnp.where(
                            xi < blo, xi - blo,
                            jnp.where(xi > bhi, xi - bhi, 0.0))
                        e_oob = 0.5 * meta[2] * jnp.sum(dev * dev,
                                                        axis=1)
                        e = e + jnp.sum(jnp.where(inside, pa, e_oob))
                    return e

                def bbox(p):
                    out = []
                    for meta, (blo, bhi) in zip(metas, boxes):
                        xi = p if meta[3] is None else p[meta[3]]
                        out.append(_cloud_bounds(xi, blo, bhi))
                    return tuple(out)

                vg = jax.value_and_grad(energy)
                e0, g0 = vg(x0)

                def cond(carry):
                    _, _, _, g, it, k, _ = carry
                    return ((k < chunk) & (it < maxIterations)
                            & (jnp.sqrt(jnp.mean(g * g)) >= tolerance))

                def body(carry):
                    x, st, e, g, it, k, bbs = carry
                    updates, st = opt.update(g, st, x, value=e, grad=g,
                                             value_fn=energy)
                    x = optax.apply_updates(x, updates)
                    e, g = vg(x)
                    bbs = tuple(
                        (jnp.minimum(rl, l2), jnp.maximum(rh, h2))
                        for (rl, rh), (l2, h2) in zip(bbs, bbox(x)))
                    return (x, st, e, g, it + 1, k + 1, bbs)

                x, st, e, g, it, _, bbs = jax.lax.while_loop(
                    cond, body, (x0, st0, e0, g0, it0, 0, bbox(x0)))
                b = jnp.stack([jnp.concatenate([rl, rh])
                               for rl, rh in bbs])          # [S, 6]
                return x, st, e, g, it, b

            seg = jax.jit(seg_fn)
            self._min_segs[seg_key] = seg

        x = self._positions
        st = opt.init(x)
        it = 0
        retries = 0
        while it < int(maxIterations):
            # region assignment for the CURRENT cloud (R=1), through the
            # shared per-set hysteresis/re-centering machinery; a new
            # round unpins last round's packs (else _round_keys grows
            # with every region the descent ever visited and pinned
            # packs eventually block all eviction)
            set_starts = []
            for s in sets:
                s.begin_round()
            for s in sets:
                full_lo, full_hi = s.full_box
                l0, h0 = _CLOUD_BOUNDS_JIT(
                    s.take(x)[None], jnp.asarray(full_lo, x.dtype),
                    jnp.asarray(full_hi, x.dtype))
                l0, h0 = np.asarray(l0), np.asarray(h0)
                set_starts.append(s.assign(
                    (l0, h0, np.isfinite(l0).all(axis=1))))
            # a cloud no bounded region contains escalates to the full
            # grid, which lives on the HOST CPU device (a multi-GB full
            # grid must never be uploaded to / share HBM with packs —
            # see mm.streamed_md); the segment then runs on the host
            host = any(bool((np.asarray(ss[0]) < 0).any())
                       for ss in set_starts)
            payloads, interiors = [], []
            for s, ss in zip(sets, set_starts):
                pay, interior = s.payload(ss[0], host=host)
                payloads.append(pay)
                interiors.append(interior)
            if host:
                cpu = jax.devices("cpu")[0]
                main_dev = next(iter(x.devices()))
                args = jax.device_put((x, st, grids, tuple(payloads),
                                       scal_args), cpu)
                x2, st2, e2, g2, it2, b = seg(args[0], args[1], it,
                                              args[2], args[3], args[4])
                x2, st2 = jax.device_put((x2, st2), main_dev)
            else:
                x2, st2, e2, g2, it2, b = seg(x, st, it, grids,
                                              tuple(payloads), scal_args)
            b = np.asarray(b)
            bad_sets = []
            for si, s in enumerate(sets):
                rlo, rhi = b[si, 0:3], b[si, 3:6]
                if not np.isfinite(rlo).all():
                    continue               # all-outside: restraint only
                ilo, ihi = interiors[si]
                if not (np.all(rlo >= ilo) and np.all(rhi <= ihi)):
                    bad_sets.append(si)
            if bad_sets:
                retries += 1
                if retries > 4:
                    raise RuntimeError(
                        "minimization cloud crossed its streamed region "
                        "boundary repeatedly; enlarge region_shape "
                        "(GridForce.setMemoryBudgetMB)")
                for si in bad_sets:
                    sets[si]._recenter = np.array([True])
                continue                   # discard segment, re-run
            retries = 0
            rms = float(jnp.sqrt(jnp.mean(g2 * g2)))
            stuck = int(it2) == it        # segment made no iterations
            x, st, it = x2, st2, int(it2)
            if rms < float(tolerance):
                break
            if not np.isfinite(rms) or stuck:
                # a non-finite gradient (overlapping atoms, inv-power
                # pole) makes the jitted loop exit immediately with
                # it2 == it0 and a NaN rms that satisfies neither
                # comparison — re-running the identical segment would
                # spin forever, so stop like the in-jit minimizer did
                break
        self._positions = x

    # --- group / atom energy queries (GridForce companions) ----------------
    def _grid_eval(self, info):
        pos = self._positions[info.atom_indices]
        if info.streamer is not None:
            return info.streamer.evaluate(np.asarray(pos),
                                          np.asarray(info.scaling))
        return evaluate_grid(info.grid, pos, info.scaling)

    def _grid_group_energies(self, force: GridForce):
        idx = self.system.getForces().index(force)
        info = self._grid_infos[idx]
        if not info.group_sizes:
            return []
        res = self._grid_eval(info)
        out = []
        off = 0
        pa = np.asarray(res.per_atom_energy)
        for size in info.group_sizes:
            out.append(float(pa[off:off + size].sum()))
            off += size
        return out

    def _grid_atom_energies(self, force: GridForce):
        idx = self.system.getForces().index(force)
        info = self._grid_infos[idx]
        res = self._grid_eval(info)
        return list(np.asarray(res.per_atom_energy))


class Simulation:
    """Minimal mirror of openmm.app.Simulation."""

    def __init__(self, topology, system: ApiSystem, integrator,
                 platform=None):
        self.topology = topology
        self.system = system
        self.integrator = integrator
        self.context = Context(system, integrator, platform)

    def step(self, n):
        self.integrator.step(n)

    def minimizeEnergy(self, maxIterations=200, tolerance=10.0):
        """L-BFGS energy minimization (optax), mirroring OpenMM's
        LocalEnergyMinimizer role. ``tolerance`` is the RMS force target
        in kJ/mol/nm.

        The whole loop (rms gate included) runs inside one jitted
        lax.while_loop — ONE host round-trip total, instead of one per
        iteration (~31 ms each through the tunnel). Grids are threaded
        through as jit arguments, never baked as HLO constants. With
        streamed (tiled-file) grids the loop runs in validated segments
        instead — see Context._minimize_streamed."""
        import optax

        ctx = self.context
        if ctx._streamed_force_indices():
            ctx._minimize_streamed(maxIterations, tolerance)
            return
        gidx, grids = ctx._grid_arguments()

        @jax.jit
        def minimize(x0, grids):
            grid_args = dict(zip(gidx, grids))

            def energy(p):
                return ctx._group_mask_terms(p, None, grid_args)[0]

            vg = jax.value_and_grad(energy)
            opt = optax.lbfgs()
            e0, g0 = vg(x0)

            def cond(carry):
                _, _, _, g, it = carry
                return ((it < maxIterations)
                        & (jnp.sqrt(jnp.mean(g * g)) >= tolerance))

            def body(carry):
                x, st, e, g, it = carry
                updates, st = opt.update(
                    g, st, x, value=e, grad=g, value_fn=energy)
                x = optax.apply_updates(x, updates)
                e, g = vg(x)
                return (x, st, e, g, it + 1)

            x, _, _, _, _ = jax.lax.while_loop(
                cond, body, (x0, opt.init(x0), e0, g0, 0))
            return x

        ctx._positions = minimize(ctx._positions, grids)

    def _ctx_positions(self):
        return self.context._positions


def clearGridCache():
    """Clear the shared grid-file cache (SWIG ``clearGridCache``)."""
    from .gridforce import clear_grid_cache

    clear_grid_cache()
    return None
