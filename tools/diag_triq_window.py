"""One-window timing diagnostic for the triquintic accuracy sweep.

Replicates exactly what bench_canonical.py stage_accuracy does for a
single charge-grid window at method=triquintic, printing wall time for
each sub-step, to find where the 9h-with-no-output sweep spends its
time. Run with the same env as the sweep (CPU backend, f64 enabled via
tests-style config is NOT used here; we mirror bench_canonical's own
setup).
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, "/root/repo")
import bench_canonical as bc

T0 = time.time()


def t(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.ops.compensated import (evaluate_compensated,
                                                 pack_grid_compensated)
from openmmgridforce_tpu.ops.interpolate import evaluate_grid
from openmmgridforce_tpu.ops.packed import (evaluate_hermite_packed,
                                            evaluate_packed, pack_grid,
                                            pack_grid_hermite)

rng = np.random.default_rng(11)
t("imports done; loading amber fixture")
_, lig_x, rec, rec_x = bc.load_amber()
origin = np.asarray(bc.ORIGIN)
corner = origin + (np.asarray(bc.COUNTS) - 1) * np.asarray(bc.SPACING)
inner = rec_x[np.all((rec_x > origin + 0.35)
                     & (rec_x < corner - 0.35), axis=1)]
cores = inner[rng.choice(len(inner), size=8, replace=False)]
c = cores[0]
win = 40
method = InterpolationMethod.TRIQUINTIC
gt = "charge"
t("loading mmap derivs")
d27 = np.load(bc.derivs_cache(gt), mmap_mode="r")
ic = np.floor((c - origin) / np.asarray(bc.SPACING)).astype(int)
lo = np.clip(ic - win, 0, np.asarray(bc.COUNTS) - 1)
hi = np.clip(ic + win, 0, np.asarray(bc.COUNTS) - 1)
t(f"window shape {hi - lo + 1}")
sub = np.ascontiguousarray(
    d27[:, lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1]
).astype(np.float64)
sub_origin = origin + lo * np.asarray(bc.SPACING)
t("window materialized; creating grids")
g64 = Grid.create(sub[0], bc.SPACING, sub_origin,
                  derivs=np.moveaxis(sub, 0, -1),
                  interp_method=method, dtype=np.float64)
g32 = Grid.create(sub[0].astype(np.float32), bc.SPACING, sub_origin,
                  derivs=np.moveaxis(sub, 0, -1).astype(np.float32),
                  interp_method=method, dtype=np.float32)
u = rng.standard_normal((256, 3))
u /= np.linalg.norm(u, axis=1, keepdims=True)
r = rng.uniform(0.12, 0.5, (256, 1))
pts = np.clip(c + u * r, sub_origin + 0.05,
              sub_origin + (np.asarray(sub[0].shape) - 1)
              * np.asarray(bc.SPACING) - 0.05)
ones = np.ones(len(pts))
pts32 = pts.astype(np.float32)
ones32 = ones.astype(np.float32)

t("STEP 1: evaluate_grid f64 direct (truth)")
e64 = np.asarray(evaluate_grid(g64, pts, ones).per_atom_energy)
t(f"  done; |e64| max {np.abs(e64).max():.3g}")

t("STEP 2: pack_grid(g32) chebyshev")
p32 = pack_grid(g32)
p32.coeffs.block_until_ready()
t("  done")
t("STEP 3: evaluate_packed")
a = np.asarray(evaluate_packed(p32, pts32, ones32).per_atom_energy)
t("  done")

t("STEP 4: pack_grid_hermite(g32)")
ph = pack_grid_hermite(g32)
jax.block_until_ready(ph)
t("  done")
t("STEP 5: evaluate_hermite_packed")
b = np.asarray(evaluate_hermite_packed(ph, pts32, ones32).per_atom_energy)
t("  done")

t("STEP 6: evaluate_grid f32 direct")
cdir = np.asarray(evaluate_grid(g32, pts32, ones32).per_atom_energy)
t("  done")

t("STEP 7: pack_grid_compensated")
cp = pack_grid_compensated(g32, origin=sub_origin, spacing=bc.SPACING)
cp.coeffs.block_until_ready()
t("  done")
t("STEP 8: evaluate_compensated")
e = np.asarray(evaluate_compensated(cp, pts, ones).per_atom_energy)
t("  done")
err = np.abs(e - e64)
fs = np.abs(e64).max()
t(f"compensated max err/field-scale: {err.max() / fs:.3g}")
t("ALL DONE (one window)")
