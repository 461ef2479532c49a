"""Diagnose the stress-scale (0.005 nm) ljr parity outlier (VERDICT r3
next #3): 1.78% vs charge 0.010% / lja 0.071%, and WORSE than the same
grid type at 4x coarser canonical spacing (0.58%) — interpolation error
should shrink ~h^2, so something else dominates. Decompose per-atom:

  total  = grid(streamed f32 eval on stored f32 data) - f64 pairwise
  gen    = stored f32 node values            - f64 analytic field at nodes
  interp = f64 B-spline on stored f32 data   - f64 analytic at atom
           (minus gen's contribution)
  eval   = streamed f32 eval                 - f64 B-spline on same data
"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
DATA = "/root/reference/python/prmtopcrd"
S_SPACING = np.array([0.005] * 3)
ORIGIN = np.array([1.00175115, 0.5328844699999999, 0.8606374500000002])

from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.io.native import NativeTileStream
from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator
from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop
from openmmgridforce_tpu.ops.interpolate import evaluate_grid
from openmmgridforce_tpu.ops.gridgen import auto_scaling_factors
from openmmgridforce_tpu.units import COULOMB_CONST, TWO_POW_ONE_SIXTH

lig = load_prmtop(f"{DATA}/ligand.prmtop")
lig_x = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
rec = load_prmtop(f"{DATA}/receptor.prmtop")
rec_x = load_inpcrd(f"{DATA}/receptor.trans.inpcrd")

GT = sys.argv[1] if len(sys.argv) > 1 else "ljr"
scal = np.asarray(auto_scaling_factors(GT, lig.charges, lig.sigmas,
                                       lig.epsilons))

def analytic_field(pts):
    """f64 ljr/lja/charge field (per unit scaling) at points [N,3]."""
    d = np.linalg.norm(pts[:, None, :] - rec_x[None, :, :], axis=-1)
    rmin_r = TWO_POW_ONE_SIXTH * rec.sigmas
    if GT == "charge":
        return (COULOMB_CONST * rec.charges / d).sum(1)
    if GT == "ljr":
        return (np.sqrt(rec.epsilons) * rmin_r**6 / d**12).sum(1)
    return (np.sqrt(rec.epsilons) * rmin_r**3 / d**6).sum(1)

def per_atom_pairwise():
    d = np.linalg.norm(lig_x[:, None, :] - rec_x[None, :, :], axis=-1)
    rmin_l = TWO_POW_ONE_SIXTH * lig.sigmas
    rmin_r = TWO_POW_ONE_SIXTH * rec.sigmas
    se = np.sqrt(np.outer(lig.epsilons, rec.epsilons))
    if GT == "charge":
        return (COULOMB_CONST * np.outer(lig.charges, rec.charges)
                / d).sum(1)
    if GT == "ljr":
        return (se * np.outer(rmin_l**6, rmin_r**6) / d**12).sum(1)
    return (-2.0 * se * np.outer(rmin_l**3, rmin_r**3) / d**6).sum(1)

path = os.path.join(HERE, ".bench_stress", f"stress_{GT}.tiled")
ev = StreamedGridEvaluator(path, InterpolationMethod.BSPLINE)
grid_pa = np.asarray(ev.evaluate(lig_x, scal).per_atom_energy,
                     np.float64)
pair_pa = per_atom_pairwise()
tot = grid_pa.sum() - pair_pa.sum()
print(f"{GT}: E_grid={grid_pa.sum():.4f} E_pair={pair_pa.sum():.4f} "
      f"rel={tot / abs(pair_pa.sum()):+.4%}", flush=True)
err = grid_pa - pair_pa
order = np.argsort(-np.abs(err))
print("worst atoms (idx, err, grid, pair, scaling):")
for i in order[:6]:
    print(f"  {i:3d} {err[i]:+10.4f} {grid_pa[i]:12.4f} "
          f"{pair_pa[i]:12.4f} {scal[i]:10.4f}", flush=True)
print(f"sum of top-3 errors: {err[order[:3]].sum():+.4f} of total "
      f"{err.sum():+.4f}", flush=True)

# --- decompose around the worst atom --------------------------------
ts = NativeTileStream(path)
for i in order[:3]:
    x = lig_x[i]
    ic = np.floor((x - ORIGIN) / S_SPACING).astype(int)
    lo = ic - 12
    shape = (25, 25, 25)
    vals, _ = ts.read_region(tuple(lo), shape)
    node_idx = np.stack(np.meshgrid(*[np.arange(l, l + s) for l, s in
                                      zip(lo, shape)], indexing="ij"),
                        -1).reshape(-1, 3)
    node_pos = ORIGIN + node_idx * S_SPACING
    anal = analytic_field(node_pos).reshape(shape)
    stored = np.asarray(vals, np.float64)
    gen_rel = np.abs(stored - anal) / np.maximum(np.abs(anal), 1e-30)
    # f64 B-spline on stored data vs on analytic data at the atom
    sub_origin = ORIGIN + lo * S_SPACING
    g_stored = Grid.create(stored, S_SPACING, sub_origin,
                           interp_method=InterpolationMethod.BSPLINE,
                           dtype=np.float64)
    g_anal = Grid.create(anal, S_SPACING, sub_origin,
                         interp_method=InterpolationMethod.BSPLINE,
                         dtype=np.float64)
    pt = x[None, :]
    one = np.ones(1)
    e_stored = float(evaluate_grid(g_stored, pt, one).per_atom_energy[0])
    e_anal = float(evaluate_grid(g_anal, pt, one).per_atom_energy[0])
    f_true = float(analytic_field(pt)[0])
    s = scal[i]
    print(f"atom {i}: field(f64)={f_true:.6g} "
          f"bspline(analytic nodes)={e_anal:.6g} "
          f"bspline(stored nodes)={e_stored:.6g} "
          f"streamed_f32/s={grid_pa[i]/s:.6g}", flush=True)
    print(f"  -> smoothing err={(e_anal - f_true)/f_true:+.3%} "
          f"gen err at atom={(e_stored - e_anal)/f_true:+.3%} "
          f"f32 eval err={(grid_pa[i]/s - e_stored)/f_true:+.3%} "
          f"| node gen rel: med={np.median(gen_rel):.2e} "
          f"max={gen_rel.max():.2e}", flush=True)
ts.close(); ev.close()
