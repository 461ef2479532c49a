#!/usr/bin/env python
"""BPMF production workflow: the TPU-native mirror of the reference's
example/sampler.py CLI (``python bpmf_sampler.py -i input.json``).

Reads the same input.json schema (run_job/nstate/ntrial_repX/ntrial_gMC/
nstep_MD/H_mass/delta_t + ligand/receptor paths + grid files), builds the
three grid forces with the reference's unit conversions
(sampler.py:490-521: kcal->kJ for electrostatics, sqrt(kcal)*A^-6 and
sqrt(kcal)*A^-3 for the LJ grids with (2*rVdw) diameter scaling), then runs
the temperature-ladder sampler with all replicas batched on one chip.

Grid inputs may be AlGDock NetCDF (.nc) or V3 binary (.grid) files; missing
grid files can be regenerated from the receptor with --generate-grids.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# allow running from a source checkout without installation
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo, "openmmgridforce_tpu")):
    sys.path.insert(0, _repo)


def get_grid_binding(path, unit_conversion, scaling, interp_method, dtype):
    import jax.numpy as jnp

    from openmmgridforce_tpu import Grid
    from openmmgridforce_tpu.mm import GridBinding
    from openmmgridforce_tpu.ops.packed import pack_grid

    if path.endswith(".nc"):
        from openmmgridforce_tpu.io import read_netcdf
        from openmmgridforce_tpu.units import ANGSTROM_TO_NM
        data = read_netcdf(path)
        counts = data["counts"]
        spacing = tuple(s * ANGSTROM_TO_NM for s in data["spacing"])
        origin = tuple(o * ANGSTROM_TO_NM for o in data["origin"])
        vals = np.asarray(data["vals"]).reshape(counts) * unit_conversion
    else:
        from openmmgridforce_tpu.io import load_v3
        d = load_v3(path)
        counts, spacing, origin = d.counts, d.spacing, d.origin
        vals = d.vals * unit_conversion

    grid = Grid.create(vals, spacing, origin, interp_method=interp_method,
                       dtype=dtype)
    return GridBinding(grid=pack_grid(grid),
                       scaling=jnp.asarray(scaling, dtype))


def generate_grids(cfg, lig_crd, margin, spacing, dtype):
    """Regenerate charge/ljr/lja grids from the receptor (for setups whose
    grid files are unavailable)."""
    import jax

    from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop
    from openmmgridforce_tpu.ops import gridgen

    paths = cfg.get("dir", {})
    for k in ("receptor_prmtop", "receptor_inpcrd"):
        if k not in paths:
            raise SystemExit(f"input.json: --generate-grids needs '{k}' "
                             "under 'dir'")
    rec = load_prmtop(paths["receptor_prmtop"])
    rec_crd = load_inpcrd(paths["receptor_inpcrd"])
    lo = lig_crd.min(0) - margin
    counts = tuple(int(c) + 1 for c in
                   np.ceil((lig_crd.max(0) + margin - lo) / spacing))
    print(f"generating grids {counts} from {rec.natom} receptor atoms",
          flush=True)
    backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    out = {}
    for gt in ["charge", "ljr", "lja"]:
        g = gridgen.generate_grid(counts, (spacing,) * 3, lo, gt, rec_crd,
                                  rec.charges, rec.sigmas, rec.epsilons,
                                  backend=backend, dtype=dtype)
        out[gt] = g
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("--n-trials", type=int, default=100)
    ap.add_argument("--generate-grids", action="store_true",
                    help="regenerate grids from the receptor instead of "
                         "loading grid files")
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--grid-spacing", type=float, default=0.025,
                    help="spacing (nm) for --generate-grids")
    ap.add_argument("--dp", type=int, default=0,
                    help="shard the replica ladder over this many devices "
                         "(0 = single-device); nstate must be divisible")
    ap.add_argument("--sp", type=int, default=1,
                    help="additionally shard the fused grid table "
                         "spatially over this many devices per replica "
                         "group (total devices = dp * sp)")
    ap.add_argument("--friction", type=float, default=1.0,
                    help="Langevin friction (ps^-1). The reference example "
                         "uses 1/ps; on capped grids a fusion event spikes "
                         "T by ~50x and friction sets the drain rate — 5/ps "
                         "keeps the ladder finite where 1/ps lets spikes "
                         "compound across a 5000-step equilibration "
                         "(measured r5 at 0.025 nm, dt=0.5 fs)")
    ap.add_argument("--drain-rounds", type=int, default=0,
                    help="split equilibration into this many chunks and "
                         "re-draw velocities of fusion-trapped states "
                         "between chunks (0 = reference-faithful: one "
                         "uninterrupted equilibration run)")
    ap.add_argument("--singleton-lanes", type=int, default=64,
                    choices=[64, 128],
                    help="row width of the un-fused third pack in the "
                         "pair-fusion split. 64 = least HBM (9.6 GiB of "
                         "args; needs OPENMMGRIDFORCE_SHAKE_STATIC to "
                         "avoid the nested-while grid-copy OOM at "
                         "canonical scale). 128 = canonical-layout rows "
                         "(12.7 GiB of args, copy-proof but within "
                         "~1 GiB of the device allocator ceiling)")
    args = ap.parse_args()

    with open(args.input) as fh:
        cfg = json.load(fh)

    import jax

    # JAX_PLATFORMS=cpu alone may not stick against an ambient TPU
    # plugin — pin the backend before the first device query (see
    # CLAUDE.md; same pattern as bench_canonical.main)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import openmmgridforce_tpu  # noqa: F401 (enables compilation cache)
    from openmmgridforce_tpu.grid import InterpolationMethod
    from openmmgridforce_tpu.mm import (load_inpcrd, load_prmtop,
                                        system_from_amber)
    from openmmgridforce_tpu.sampling import Sampler, SamplerConfig
    from openmmgridforce_tpu.units import KCAL_TO_KJ
    from openmmgridforce_tpu.utils import (StateDataReporter, save_sampler,
                                           write_xyz_frame)

    def require(d, key, where):
        if key not in d:
            raise SystemExit(
                f"input.json: missing key '{key}' in {where} (reference "
                "schema: run_job/nstate/ntrial_repX/ntrial_gMC/nstep_MD at "
                "the top level; T_HIGH/T_SIMMIN/H_mass/delta_t inside the "
                "job section named by run_job; file paths under 'dir')")
        return d[key]

    run_job = require(cfg, "run_job", "the top level")
    job = require(cfg, run_job, "the top level (the job section)")
    dtype = jnp.float32

    paths = require(cfg, "dir", "the top level")
    lig = load_prmtop(require(paths, "ligand_prmtop", "'dir'"))
    lig_crd = load_inpcrd(require(paths, "ligand_inpcrd", "'dir'"))
    system = system_from_amber(lig, dtype=dtype,
                               hydrogen_mass=job.get("H_mass"),
                               constraints="HBonds")

    # per-atom scaling factors with the sampler's conventions
    # (sampler.py:497-520: charge; sqrt(eps)*(2 rVdw)^6; sqrt(eps)*(2 rVdw)^3
    # where rVdw = Rmin/2 = 2^(1/6) sigma / 2)
    rvdw = (2.0 ** (1.0 / 6.0)) * lig.sigmas / 2.0
    scale_q = lig.charges
    scale_ljr = np.sqrt(lig.epsilons) * (2.0 * rvdw) ** 6
    scale_lja = np.sqrt(lig.epsilons) * (2.0 * rvdw) ** 3

    mesh = None
    if args.dp:
        from jax.sharding import Mesh
        n_dev = args.dp * max(args.sp, 1)
        devs = jax.devices()
        if len(devs) < n_dev:
            devs = jax.devices("cpu")
        if len(devs) < n_dev:
            raise SystemExit(f"--dp {args.dp} --sp {args.sp}: need "
                             f"{n_dev} devices, only {len(devs)}")
        if args.sp > 1:
            mesh = Mesh(np.asarray(devs[:n_dev]).reshape(args.dp, args.sp),
                        ("dp", "sp"))
        else:
            mesh = Mesh(np.asarray(devs[:n_dev]), ("dp",))

    bindings = []
    # the reference adds grid forces only for the complex ('CD') job;
    # 'BC' samples the isolated ligand (sampler.py:484-521)
    want_grids = run_job != "BC"
    if want_grids and args.generate_grids:
        from openmmgridforce_tpu.mm import GridBinding
        from openmmgridforce_tpu.ops.packed import (pack_grid,
                                                    pack_grids_fused)
        grids = generate_grids(cfg, lig_crd, margin=1.0,
                               spacing=args.grid_spacing, dtype=dtype)
        trio = [("charge", scale_q), ("ljr", scale_ljr),
                ("lja", scale_lja)]
        gs = [grids[gt].with_(
            interp_method=int(InterpolationMethod.BSPLINE))
            for gt, _ in trio]
        # fused multi-grid: one gather per atom serves all three fields.
        # A 3-grid B-spline row is 192 floats and lane-pads to 256, so
        # at fine spacings the fused table exceeds the ~7.2 GB
        # compiled-buffer ceiling of the tunneled device; fall back to a
        # (charge+ljr | lja) pair fusion (exactly 128 + 64 lanes — same
        # policy as bench_canonical._build_packs, device-assembled with
        # pack_grids_fused so the HBM peak is table + one slab).
        ncells = int(np.prod([c - 1 for c in gs[0].counts]))
        if ncells * 256 * 4 > 6.8e9:
            groups = [[0, 1], [2]]
        else:
            groups = [[0, 1, 2]]
        # Canonical-scale HBM notes (r5 bpmf logs). The two OOM modes:
        #  - 64-lane singleton + nested SHAKE while_loop: XLA:TPU
        #    copy-inserts a PADDED 6.37 GiB duplicate of the singleton
        #    inside the segment program (16.18 GiB > 15.75 capacity).
        #    Mitigation: OPENMMGRIDFORCE_SHAKE_STATIC straightens the
        #    constraint loop (same step-program shape as the bench MD
        #    runner, which compiles these packs copy-free).
        #  - both tables padded to 128 lanes: the 12.7 GiB of arguments
        #    plus a 1 GB packing slab tripped the runtime allocator.
        #    Mitigation: x_chunk=16 (0.26 GB slabs) and --singleton-lanes
        #    to choose the trade.
        for grp in groups:
            scal = np.stack([np.asarray(trio[i][1]) for i in grp])
            if len(grp) == 1 and len(groups) == 1:
                bindings.append(GridBinding(
                    grid=pack_grid(gs[grp[0]]),
                    scaling=jnp.asarray(scal[0], dtype)))
            else:
                lanes = (args.singleton_lanes if len(grp) == 1 else 64)
                bindings.append(GridBinding(
                    grid=pack_grids_fused([gs[i] for i in grp],
                                          lane_pad=lanes, x_chunk=16),
                    scaling=jnp.asarray(scal, dtype)))
    elif want_grids:
        gpaths = require(cfg, "grids", "the top level (or pass "
                         "--generate-grids)")
        specs = [
            (require(gpaths, "direct_elec", "'grids'"), KCAL_TO_KJ, scale_q),
            (require(gpaths, "LJr", "'grids'"),
             np.sqrt(KCAL_TO_KJ) * 1.0e6, scale_ljr),
            (require(gpaths, "LJa", "'grids'"),
             np.sqrt(KCAL_TO_KJ) * 1.0e3, scale_lja),
        ]
        for path, conv, scale in specs:
            bindings.append(get_grid_binding(
                path, conv, scale, InterpolationMethod.BSPLINE, dtype))

    scfg = SamplerConfig(
        n_states=require(cfg, "nstate", "the top level"),
        t_high=require(job, "T_HIGH", f"job '{run_job}'"),
        t_min=require(job, "T_SIMMIN", f"job '{run_job}'"),
        dt=require(job, "delta_t", f"job '{run_job}'") / 1000.0,  # fs -> ps
        friction=args.friction,
        md_steps_per_trial=require(cfg, "nstep_MD", "the top level"),
        hydrogen_mass=job.get("H_mass"),
    )
    sampler = Sampler(system, bindings, jnp.asarray(lig_crd, dtype), scfg,
                      bonds=[tuple(b) for b in lig.bond_idx], mesh=mesh)

    work_dir = args.work_dir or os.path.join(
        cfg.get("work_dir", "."), run_job,
        f'{require(cfg, "nstate", "the top level")}'
        f'_{require(cfg, "ntrial_repX", "the top level")}'
        f'_{require(cfg, "ntrial_gMC", "the top level")}')
    os.makedirs(work_dir, exist_ok=True)
    energy_file = open(os.path.join(work_dir, "energies.dat"), "w")
    xyz_file = open(os.path.join(work_dir, "traj.xyz"), "w")

    def report(trial, s):
        e = s.potential_energies()
        energy_file.write("".join(f"{v / KCAL_TO_KJ:12.4f}"
                                  for v in e) + "\n")
        energy_file.flush()
        pos = np.asarray(s.states.positions)
        for istate in (0, len(e) - 1):
            write_xyz_frame(xyz_file, f"state {istate} E={e[istate]:.3f}",
                            pos[istate])
        if trial % 50 == 49:
            save_sampler(os.path.join(work_dir, "checkpoint"), s)

    t0 = time.time()
    # equilibration phase before production (sampler.py:551), in
    # --drain-rounds chunks: between chunks, fusion-trapped rungs
    # (instantaneous T > 5x their ladder T) get their velocities
    # re-drawn so capped-well orbits can't compound into f32 overflow
    # (Sampler.drain_trapped; 0 rounds = reference-faithful single run)
    nstep_equil = int(cfg.get("nstep_equil", 0))
    if nstep_equil > 0:
        chunks = max(1, args.drain_rounds)
        per = max(1, nstep_equil // chunks)
        for i in range(chunks):
            sampler.run_md(per)
            if args.drain_rounds > 0:
                n_hot = sampler.drain_trapped()
                if n_hot:
                    print(f"equil chunk {i + 1}/{chunks}: re-drew "
                          f"velocities of {n_hot} trapped states")

    sampler.run(n_trials=args.n_trials,
                n_exchange_per_trial=require(cfg, "ntrial_repX", "the top level"),
                n_gmc_per_trial=require(cfg, "ntrial_gMC", "the top level"),
                callback=report)
    elapsed = time.time() - t0

    print(f"{args.n_trials} trials in {elapsed:.1f}s "
          f"({args.n_trials * cfg['nstep_MD'] * cfg['nstate'] / elapsed:,.0f}"
          f" replica-steps/s)")
    print(f"exchange acceptance: "
          f"{sampler.n_exchange_accepted}/{sampler.n_exchange_attempted}")
    if sampler.n_gmc_attempted:
        print(f"gMC acceptance: "
              f"{sampler.n_gmc_accepted}/{sampler.n_gmc_attempted}")
    energy_file.close()
    xyz_file.close()


if __name__ == "__main__":
    main()
