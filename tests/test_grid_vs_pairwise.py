"""End-to-end accuracy matrix: generate grid -> evaluate ligand -> compare
against an O(L*R) pairwise double-precision oracle.

This reproduces the reference's CUDA accuracy-script suite in-suite
(python/tests/test_{trilinear,bspline,tricubic,triquintic}[_tiled].py and
test_invpower2.py / test_triquintic_invpower.py; oracle pattern at
test_simple_grid_energy.py:124-184). Pass gates follow the reference: 2%
relative error per grid type, 5% with inverse-power smoothing
(test_triquintic.py:215-217, test_invpower2.py:207-213).

Geometry: a synthetic receptor shell at ~1 nm from the ligand cloud keeps
every grid value far below the tanh cap, so the capped grid and the
uncapped pairwise oracle agree up to interpolation error only.
"""

import numpy as np
import pytest

from openmmgridforce_tpu import InterpolationMethod, InvPowerMode
from openmmgridforce_tpu.ops import gridgen
from openmmgridforce_tpu.ops.interpolate import evaluate_grid
from openmmgridforce_tpu.units import COULOMB_CONST, TWO_POW_ONE_SIXTH

RNG = np.random.default_rng(7)

# --- synthetic receptor (shell) + ligand (cloud) -------------------------
N_REC = 48
_u = RNG.standard_normal((N_REC, 3))
REC_POS = 0.5 + 1.0 * _u / np.linalg.norm(_u, axis=1, keepdims=True)
REC_Q = RNG.uniform(-0.6, 0.6, N_REC)
REC_SIG = RNG.uniform(0.25, 0.35, N_REC)
REC_EPS = RNG.uniform(0.3, 0.8, N_REC)

N_LIG = 8
LIG_POS = 0.5 + RNG.uniform(-0.12, 0.12, (N_LIG, 3))
LIG_Q = RNG.uniform(-0.4, 0.4, N_LIG)
LIG_SIG = RNG.uniform(0.25, 0.35, N_LIG)
LIG_EPS = RNG.uniform(0.3, 0.8, N_LIG)

SPACING = (0.02, 0.02, 0.02)
ORIGIN = (0.2, 0.2, 0.2)
COUNTS = (31, 31, 31)           # box [0.2, 0.8]^3, ligand well inside


def pairwise_energy(grid_type, lig_q=LIG_Q, rec_q=REC_Q):
    """The reference oracle: double loop in f64 with the grid's own
    geometric-mean pair decomposition."""
    d = np.linalg.norm(LIG_POS[:, None, :] - REC_POS[None, :, :], axis=-1)
    if grid_type == "charge":
        return float((COULOMB_CONST * np.outer(lig_q, rec_q) / d).sum())
    rmin_l = TWO_POW_ONE_SIXTH * LIG_SIG
    rmin_r = TWO_POW_ONE_SIXTH * REC_SIG
    se = np.sqrt(np.outer(LIG_EPS, REC_EPS))
    if grid_type == "ljr":
        return float((se * np.outer(rmin_l**6, rmin_r**6) / d**12).sum())
    if grid_type == "lja":
        return float((-2.0 * se * np.outer(rmin_l**3, rmin_r**3)
                      / d**6).sum())
    raise ValueError(grid_type)


def scaling(grid_type):
    return np.asarray(gridgen.auto_scaling_factors(
        grid_type, LIG_Q, LIG_SIG, LIG_EPS))


def make_grid(grid_type, method, **kw):
    needs_derivs = method in (InterpolationMethod.TRICUBIC,
                              InterpolationMethod.TRIQUINTIC)
    return gridgen.generate_grid(
        COUNTS, SPACING, ORIGIN, grid_type, REC_POS, REC_Q, REC_SIG,
        REC_EPS, interp_method=method,
        compute_derivatives=kw.pop("compute_derivatives", needs_derivs),
        dtype=np.float64, **kw)


GATE = 0.02   # the reference's standard pass threshold
GATE_INVPOWER = 0.05


@pytest.mark.parametrize("method", [
    InterpolationMethod.TRILINEAR, InterpolationMethod.BSPLINE,
    InterpolationMethod.TRICUBIC, InterpolationMethod.TRIQUINTIC])
@pytest.mark.parametrize("grid_type", ["charge", "ljr", "lja"])
def test_grid_vs_pairwise(method, grid_type):
    grid = make_grid(grid_type, method)
    res = evaluate_grid(grid, LIG_POS, scaling(grid_type))
    e_ref = pairwise_energy(grid_type)
    rel = abs(float(res.energy) - e_ref) / abs(e_ref)
    assert rel < GATE, f"{grid_type}/{method.name}: rel={rel:.4%}"
    assert np.all(np.isfinite(np.asarray(res.forces)))


def test_stored_invpower_n2_charge():
    """STORED n=2 smoothing (test_invpower2.py pattern): all-positive
    charges so U^(1/2) is smooth; 5% gate."""
    rec_q = np.abs(REC_Q) + 0.05
    grid = gridgen.generate_grid(
        COUNTS, SPACING, ORIGIN, "charge", REC_POS, rec_q, REC_SIG,
        REC_EPS, interp_method=InterpolationMethod.BSPLINE,
        inv_power=2.0, inv_power_mode=InvPowerMode.STORED,
        dtype=np.float64)
    lig_q = np.abs(LIG_Q) + 0.05
    res = evaluate_grid(grid, LIG_POS, lig_q)
    e_ref = pairwise_energy("charge", lig_q=lig_q, rec_q=rec_q)
    rel = abs(float(res.energy) - e_ref) / abs(e_ref)
    assert rel < GATE_INVPOWER, f"rel={rel:.4%}"


def test_stored_invpower_nm12_ljr_triquintic():
    """STORED n=-12 on the LJ repulsion (test_triquintic_invpower.py
    pattern): the stored field U^(-1/12) ~ r is nearly linear, so even the
    steep r^-12 wall interpolates accurately."""
    grid = gridgen.generate_grid(
        COUNTS, SPACING, ORIGIN, "ljr", REC_POS, REC_Q, REC_SIG, REC_EPS,
        interp_method=InterpolationMethod.TRIQUINTIC,
        compute_derivatives=True,
        inv_power=-12.0, inv_power_mode=InvPowerMode.STORED,
        dtype=np.float64)
    res = evaluate_grid(grid, LIG_POS, scaling("ljr"))
    e_ref = pairwise_energy("ljr")
    rel = abs(float(res.energy) - e_ref) / abs(e_ref)
    assert rel < GATE_INVPOWER, f"rel={rel:.4%}"


def test_runtime_invpower_n2_charge_bspline():
    """RUNTIME n=2: raw values stored, transform applied per stencil
    point at evaluation (gridForce.cu:103-147 semantics).

    The grid is generated with mode NONE and the mode flipped afterwards:
    auto-generating values WITH RUNTIME double-transforms by reference
    design (generateGridKernel applies the storage transform for any
    invPower != 0, gridGeneration.cu:353-355) — RUNTIME is meant for grids
    whose stored values are raw (e.g. loaded from pre-existing files)."""
    import dataclasses

    rec_q = np.abs(REC_Q) + 0.05
    raw = gridgen.generate_grid(
        COUNTS, SPACING, ORIGIN, "charge", REC_POS, rec_q, REC_SIG,
        REC_EPS, interp_method=InterpolationMethod.BSPLINE,
        dtype=np.float64)
    grid = dataclasses.replace(raw, inv_power=2.0,
                               inv_power_mode=int(InvPowerMode.RUNTIME))
    lig_q = np.abs(LIG_Q) + 0.05
    res = evaluate_grid(grid, LIG_POS, lig_q)
    e_ref = pairwise_energy("charge", lig_q=lig_q, rec_q=rec_q)
    rel = abs(float(res.energy) - e_ref) / abs(e_ref)
    assert rel < GATE_INVPOWER, f"rel={rel:.4%}"


@pytest.mark.parametrize("method,needs_derivs", [
    (InterpolationMethod.TRILINEAR, False),
    (InterpolationMethod.BSPLINE, False),
    (InterpolationMethod.TRICUBIC, True),
    (InterpolationMethod.TRIQUINTIC, True),
])
def test_tiled_grid_vs_pairwise(tmp_path, method, needs_derivs):
    """Tiled copies (test_*_tiled.py pattern): generate straight to an
    OMGTILE file, stream-evaluate, same oracle and gate."""
    from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator

    path = str(tmp_path / "g.tiled")
    gridgen.generate_grid_to_tiled_file(
        path, COUNTS, SPACING, ORIGIN, "ljr", REC_POS, REC_Q, REC_SIG,
        REC_EPS, tile_size=16, compute_derivatives=needs_derivs,
        dtype=np.float64)
    ev = StreamedGridEvaluator(path, interp_method=method,
                               region_shape=(32, 32, 32))
    res = ev.evaluate(LIG_POS.astype(np.float32),
                      scaling("ljr").astype(np.float32))
    e_ref = pairwise_energy("ljr")
    rel = abs(float(res.energy) - e_ref) / abs(e_ref)
    assert rel < GATE, f"tiled {method.name}: rel={rel:.4%}"
