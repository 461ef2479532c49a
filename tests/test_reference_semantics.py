"""Reference-platform semantics mode vs a hand-ported f64 oracle.

The oracle below is a LITERAL scalar port of
ReferenceCalcGridForceKernel::execute (reference
platforms/reference/src/ReferenceGridForceKernels.cpp:646-1121) — plain
Python loops, flat-index arithmetic, the reference's own basis formulas —
kept deliberately independent of the vectorized implementation in
ops/reference_semantics.py. Parity target: <=1e-12 relative (both f64).
"""

import numpy as np
import pytest

import openmmgridforce_tpu.api as gfp
from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.ops.gridgen import generate_grid
from openmmgridforce_tpu.ops.interpolate import evaluate_grid
from openmmgridforce_tpu.ops.reference_semantics import (
    evaluate_grid_reference)

RNG = np.random.default_rng(31)
OOB_K = 10000.0


# ----------------------------------------------------------------------
# Oracle: literal scalar port of the C++ (f64)
# ----------------------------------------------------------------------

def _b(t):
    return [(1 - t) ** 3 / 6.0,
            (3 * t ** 3 - 6 * t ** 2 + 4) / 6.0,
            (-3 * t ** 3 + 3 * t ** 2 + 3 * t + 1) / 6.0,
            t ** 3 / 6.0]


def _db(t):
    return [-(1 - t) ** 2 / 2.0,
            (3 * t ** 2 - 4 * t) / 2.0,
            (-3 * t ** 2 + 2 * t + 1) / 2.0,
            t ** 2 / 2.0]


def _h(t):
    return ((1 + 2 * t) * (1 - t) ** 2, t * (1 - t) ** 2,
            t * t * (3 - 2 * t), t * t * (t - 1))


def _dh(t):
    return (6 * t * t - 6 * t, 3 * t * t - 4 * t + 1,
            -6 * t * t + 6 * t, 3 * t * t - 2 * t)


def oracle_execute(vals_flat, counts, spacing, origin, scaling, positions,
                   method, inv_power=0.0, oob_k=OOB_K):
    nx, ny, nz = counts
    nyz = ny * nz
    total = nx * ny * nz
    sp = spacing

    def gv(i):
        return vals_flat[min(max(int(i), 0), total - 1)]

    hC = [sp[0] * (nx - 1), sp[1] * (ny - 1), sp[2] * (nz - 1)]
    energy = 0.0
    forces = np.zeros((len(scaling), 3))
    for ia in range(len(scaling)):
        pi = [positions[ia][k] - origin[k] for k in range(3)]
        inside = all(0.0 <= pi[k] <= hC[k] for k in range(3))
        if inside and scaling[ia] != 0.0:
            ix = int(pi[0] / sp[0])
            iy = int(pi[1] / sp[1])
            iz = int(pi[2] / sp[2])
            fx = pi[0] / sp[0] - ix
            fy = pi[1] / sp[1] - iy
            fz = pi[2] / sp[2] - iz
            if method == 1:               # cubic B-spline
                bx, by, bz = _b(fx), _b(fy), _b(fz)
                dbx, dby, dbz = _db(fx), _db(fy), _db(fz)
                interp = dvdx = dvdy = dvdz = 0.0
                for i in range(4):
                    gx = min(max(ix - 1 + i, 0), nx - 1)
                    for j in range(4):
                        gy = min(max(iy - 1 + j, 0), ny - 1)
                        for k in range(4):
                            gz = min(max(iz - 1 + k, 0), nz - 1)
                            val = vals_flat[gx * nyz + gy * nz + gz]
                            interp += bx[i] * by[j] * bz[k] * val
                            dvdx += dbx[i] * by[j] * bz[k] * val
                            dvdy += bx[i] * dby[j] * bz[k] * val
                            dvdz += bx[i] * by[j] * dbz[k] * val
                if inv_power > 0.0:
                    base = interp
                    interp = base ** inv_power
                    pf = inv_power * base ** (inv_power - 1.0)
                    dvdx *= pf
                    dvdy *= pf
                    dvdz *= pf
                grd = np.array([dvdx / sp[0], dvdy / sp[1], dvdz / sp[2]])
                energy += scaling[ia] * interp
                forces[ia] -= scaling[ia] * grd
            elif method == 2:             # tricubic, on-the-fly FD
                im = ix * nyz + iy * nz + iz
                imp = im + nz
                ip = im + nyz
                ipp = ip + nz
                f000, f001 = gv(im), gv(im + 1)
                f010, f011 = gv(imp), gv(imp + 1)
                f100, f101 = gv(ip), gv(ip + 1)
                f110, f111 = gv(ipp), gv(ipp + 1)
                inx = 0 < ix < nx - 1

                def fdx(off):
                    if not inx:
                        return 0.0, 0.0
                    d0 = (gv(ip + off) - gv(im - nyz + off)) / (2 * sp[0])
                    d1 = (gv(ip + nyz + off) - gv(im + off)) / (2 * sp[0])
                    return d0, d1

                dx000, dx100 = fdx(0)
                dx001, dx101 = fdx(1)
                dx010, dx110 = fdx(nz)
                dx011, dx111 = fdx(nz + 1)

                h00x, h10x, h01x, h11x = _h(fx)
                dh00x, dh10x, dh01x, dh11x = _dh(fx)

                def xl(a, b, da, db):
                    return (h00x * a + h01x * b
                            + h10x * da * sp[0] + h11x * db * sp[0])

                def dxl(a, b, da, db):
                    return (dh00x * a + dh01x * b
                            + dh10x * da * sp[0] + dh11x * db * sp[0])

                v00 = xl(f000, f100, dx000, dx100)
                v01 = xl(f001, f101, dx001, dx101)
                v10 = xl(f010, f110, dx010, dx110)
                v11 = xl(f011, f111, dx011, dx111)
                dv00 = dxl(f000, f100, dx000, dx100)
                dv01 = dxl(f001, f101, dx001, dx101)
                dv10 = dxl(f010, f110, dx010, dx110)
                dv11 = dxl(f011, f111, dx011, dx111)

                iny = 0 < iy < ny - 1
                dy00 = ((v10 - (h00x * gv(im - nz) + h01x * gv(ip - nz)))
                        / sp[1]) if iny else 0.0
                dy01 = ((v11 - (h00x * gv(im + 1 - nz)
                                + h01x * gv(ip + 1 - nz))) / sp[1]) \
                    if iny else 0.0
                dy10 = (((h00x * gv(im + 2 * nz) + h01x * gv(ip + 2 * nz))
                         - v00) / sp[1]) if iny else 0.0
                dy11 = (((h00x * gv(im + 1 + 2 * nz)
                          + h01x * gv(ip + 1 + 2 * nz)) - v01) / sp[1]) \
                    if iny else 0.0

                h00y, h10y, h01y, h11y = _h(fy)
                dh00y, dh10y, dh01y, dh11y = _dh(fy)
                v0 = (h00y * v00 + h01y * v10
                      + h10y * dy00 * sp[1] + h11y * dy10 * sp[1])
                v1 = (h00y * v01 + h01y * v11
                      + h10y * dy01 * sp[1] + h11y * dy11 * sp[1])
                dvdx_0 = h00y * dv00 + h01y * dv10
                dvdx_1 = h00y * dv01 + h01y * dv11
                dvdy = (dh00y * v00 + dh01y * v10
                        + dh10y * dy00 * sp[1] + dh11y * dy10 * sp[1])

                inz = 0 < iz < nz - 1
                dz0 = ((v1 - (h00y * (h00x * gv(im - 1) + h01x * gv(ip - 1))
                              + h01y * (h00x * gv(imp - 1)
                                        + h01x * gv(ipp - 1)))) / sp[2]) \
                    if inz else 0.0
                dz1 = (((h00y * (h00x * gv(im + 2) + h01x * gv(ip + 2))
                         + h01y * (h00x * gv(imp + 2)
                                   + h01x * gv(ipp + 2))) - v0) / sp[2]) \
                    if inz else 0.0

                h00z, h10z, h01z, h11z = _h(fz)
                dh00z, dh10z, dh01z, dh11z = _dh(fz)
                interp = (h00z * v0 + h01z * v1
                          + h10z * dz0 * sp[2] + h11z * dz1 * sp[2])
                dvdx = h00z * dvdx_0 + h01z * dvdx_1
                dvdz = (dh00z * v0 + dh01z * v1
                        + dh10z * dz0 * sp[2] + dh11z * dz1 * sp[2])
                if inv_power > 0.0:
                    base = interp
                    interp = base ** inv_power
                    pf = inv_power * base ** (inv_power - 1.0)
                    dvdx *= pf
                    dvdy *= pf
                    dvdz *= pf
                grd = np.array([dvdx / sp[0], dvdy / sp[1], dvdz / sp[2]])
                energy += scaling[ia] * interp
                forces[ia] -= scaling[ia] * grd
            else:                          # trilinear (default branch)
                im = ix * nyz + iy * nz + iz
                imp = im + nz
                ip = im + nyz
                ipp = ip + nz
                vmmm, vmmp = gv(im), gv(im + 1)
                vmpm, vmpp = gv(imp), gv(imp + 1)
                vpmm, vpmp = gv(ip), gv(ip + 1)
                vppm, vppp = gv(ipp), gv(ipp + 1)
                ax, ay, az = 1 - fx, 1 - fy, 1 - fz
                vmm = az * vmmm + fz * vmmp
                vmp = az * vmpm + fz * vmpp
                vpm = az * vpmm + fz * vpmp
                vpp = az * vppm + fz * vppp
                vm = ay * vmm + fy * vmp
                vp = ay * vpm + fy * vpp
                interp = ax * vm + fx * vp
                if inv_power > 0.0:
                    interp = interp ** inv_power
                dvdx = -vm + vp
                dvdy = (-vmm + vmp) * ax + (-vpm + vpp) * fx
                dvdz = (((-vmmm + vmmp) * ay + (-vmpm + vmpp) * fy) * ax
                        + ((-vpmm + vpmp) * ay + (-vppm + vppp) * fy) * fx)
                grd = np.array([dvdx / sp[0], dvdy / sp[1], dvdz / sp[2]])
                if inv_power > 0.0:
                    base = ax * vm + fx * vp
                    grd = grd * (inv_power * base ** (inv_power - 1.0))
                energy += scaling[ia] * interp
                forces[ia] -= scaling[ia] * grd
        else:
            grd = np.zeros(3)
            for k in range(3):
                dev = 0.0
                if pi[k] < 0.0:
                    dev = pi[k]
                elif pi[k] > hC[k]:
                    dev = pi[k] - hC[k]
                energy += 0.5 * oob_k * dev * dev
                grd[k] = oob_k * dev
            forces[ia] -= grd
    return energy, forces


# ----------------------------------------------------------------------
# Fixtures
# ----------------------------------------------------------------------

COUNTS = (9, 8, 7)
SPACING = (0.11, 0.09, 0.13)
ORIGIN = (0.2, -0.1, 0.05)


def _grid(method, inv_power=0.0, inv_power_mode=0):
    vals = RNG.standard_normal(COUNTS) + 2.5   # keep positive for pow()
    return Grid.create(vals, SPACING, ORIGIN, interp_method=method,
                       inv_power=inv_power, inv_power_mode=inv_power_mode,
                       oob_k=OOB_K, dtype=np.float64)


def _positions(n=40):
    lo = np.asarray(ORIGIN)
    hi = lo + (np.asarray(COUNTS) - 1) * np.asarray(SPACING)
    pos = RNG.uniform(lo - 0.05, hi + 0.05, (n, 3))
    # exact upper-face / corner points (Q2 territory) and exact lower face
    pos[0] = hi
    pos[1] = [hi[0], lo[1] + 0.123, lo[2] + 0.2]
    pos[2] = lo
    pos[3] = [lo[0] + 0.1, hi[1], lo[2] + 0.15]
    return pos


@pytest.mark.parametrize("method,mname", [
    (int(InterpolationMethod.TRILINEAR), "trilinear"),
    (int(InterpolationMethod.BSPLINE), "bspline"),
    (int(InterpolationMethod.TRICUBIC), "tricubic_fd"),
])
def test_matches_hand_ported_oracle(method, mname):
    g = _grid(method)
    pos = _positions()
    scal = RNG.uniform(-1.0, 1.0, len(pos))
    scal[5] = 0.0                     # zero-scaling branch
    res = evaluate_grid_reference(g, pos, scal)
    e_o, f_o = oracle_execute(np.asarray(g.vals).reshape(-1), COUNTS,
                              SPACING, ORIGIN, scal, pos, method)
    np.testing.assert_allclose(float(res.energy), e_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.forces), f_o,
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("method", [
    int(InterpolationMethod.TRILINEAR),
    int(InterpolationMethod.BSPLINE),
])
def test_inv_power_literal_pow(method):
    """Q4: back-transform fires on inv_power > 0 with a literal pow,
    regardless of mode."""
    g = _grid(method, inv_power=2.0, inv_power_mode=2)  # STORED
    pos = _positions(20)
    scal = RNG.uniform(0.1, 1.0, len(pos))
    res = evaluate_grid_reference(g, pos, scal)
    e_o, f_o = oracle_execute(np.asarray(g.vals).reshape(-1), COUNTS,
                              SPACING, ORIGIN, scal, pos, method,
                              inv_power=2.0)
    np.testing.assert_allclose(float(res.energy), e_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.forces), f_o,
                               rtol=1e-10, atol=1e-12)


def test_q2_upper_face_divergence():
    """At the exact upper grid face the reference (unclamped cell) and the
    CUDA convention (cell clamped to counts-2, fraction 1) pick different
    stencils for trilinear — the quirk the mode exists to expose."""
    # power-of-two spacing + zero origin so the face coordinate is exact
    # in f64 (otherwise rounding puts the test point epsilon-outside)
    g = Grid.create(RNG.standard_normal(COUNTS) + 2.5, (0.125,) * 3,
                    (0.0, 0.0, 0.0),
                    interp_method=InterpolationMethod.TRILINEAR,
                    oob_k=OOB_K, dtype=np.float64)
    hi = (np.asarray(COUNTS) - 1) * 0.125
    pos = np.array([[hi[0], 0.15, 0.3]])
    scal = np.array([1.0])
    ref = evaluate_grid_reference(g, pos, scal)
    cuda = evaluate_grid(g, pos, scal)
    # energies agree (fraction 0 at the face kills the extra stencil row)
    np.testing.assert_allclose(float(ref.energy), float(cuda.energy),
                               rtol=1e-12)
    # but the face-normal force differs: the reference's x-gradient uses
    # the flat-array "next row" values, the CUDA convention the real cell
    assert not np.allclose(np.asarray(ref.forces),
                           np.asarray(cuda.forces), rtol=1e-6)
    # interior point: both agree exactly
    pos_in = np.array([[0.37, 0.21, 0.33]])
    ref_i = evaluate_grid_reference(g, pos_in, scal)
    cuda_i = evaluate_grid(g, pos_in, scal)
    np.testing.assert_allclose(np.asarray(ref_i.forces),
                               np.asarray(cuda_i.forces), rtol=1e-12)


def test_q12_triquintic_force_scaling():
    """Reference triquintic converts local gradients with grd = dv * sp
    (ReferenceGridForceKernels.cpp:992-997) where every other branch does
    dv / sp; the interpolated VALUE is the same Hermite polynomial."""
    n = 10
    rec = RNG.uniform(0.1, 0.9, (n, 3))
    q = RNG.uniform(-0.4, 0.4, n)
    sig = np.full(n, 0.3)
    eps = np.full(n, 0.5)
    g = generate_grid(COUNTS, SPACING, ORIGIN, "charge", rec, q, sig, eps,
                      compute_derivatives=True,
                      interp_method=InterpolationMethod.TRIQUINTIC,
                      oob_k=OOB_K, dtype=np.float64)
    lo = np.asarray(ORIGIN) + 0.05
    hi = np.asarray(ORIGIN) + (np.asarray(COUNTS) - 1.5) * \
        np.asarray(SPACING)
    pos = RNG.uniform(lo, hi, (15, 3))
    scal = RNG.uniform(0.2, 1.0, 15)
    ref = evaluate_grid_reference(g, pos, scal)
    cuda = evaluate_grid(g, pos, scal)
    np.testing.assert_allclose(np.asarray(ref.per_atom_energy),
                               np.asarray(cuda.per_atom_energy),
                               rtol=1e-12)
    ratio = np.asarray(SPACING) ** 2
    np.testing.assert_allclose(np.asarray(ref.forces),
                               np.asarray(cuda.forces) * ratio,
                               rtol=1e-10)


def test_q1_q5_reference_platform_context():
    """platform='Reference' in the compat API: grid forces land on the
    LOOP index rows (Q1) and auto-scaling uses (2*sigma) diameters (Q5)."""
    from tests.test_api import _synthetic_topology

    n = 8
    q = RNG.uniform(-0.4, 0.4, n)
    sig = RNG.uniform(0.25, 0.35, n)
    eps = RNG.uniform(0.2, 0.8, n)
    top = _synthetic_topology(n, q, sig, eps)

    def build(platform):
        system = gfp.create_system(top)
        g = gfp.GridForce()
        g.addGridCounts(6, 6, 6)
        g.addGridSpacing(0.15, 0.15, 0.15)
        g.setGridOrigin(-0.2, -0.2, -0.2)
        g.setGridValues(RNG.standard_normal(216))
        g.setScalingProperty("ljr")
        g.setAutoCalculateScalingFactors(True)
        g.setLigandAtoms([4, 5, 6])     # NOT 0..N-1: exposes Q1
        g.setForceGroup(3)
        system.addForce(g)
        ctx = gfp.Context(system, gfp.VerletIntegrator(0.001),
                          platform=platform)
        ctx.setPositions(RNG.uniform(0.0, 0.4, (n, 3)))
        return ctx, g

    ctx_ref, g_ref = build(gfp.Platform.getPlatformByName("Reference"))
    # Q5: diameter convention
    expect = np.sqrt(eps[:3]) * (2.0 * sig[:3]) ** 6
    got = np.asarray(g_ref.getScalingFactors())[:3]
    np.testing.assert_allclose(got[:3],
                               np.sqrt(eps)[:3] * (2.0 * sig[:3]) ** 6,
                               rtol=1e-12)

    st = ctx_ref.getState(getForces=True, groups={3})
    f = np.asarray(st.getForces())
    # Q1: grid forces written to rows 0..2 (loop index), rows 4..6 zero
    assert np.any(f[:3] != 0.0)
    np.testing.assert_array_equal(f[4:7], 0.0)

    ctx_cuda, g_cuda = build(None)
    # default: rmin convention and forces on the actual particle rows
    np.testing.assert_allclose(
        np.asarray(g_cuda.getScalingFactors())[:3],
        np.sqrt(eps)[:3] * (2.0 ** (1.0 / 6.0) * sig[:3]) ** 6, rtol=1e-12)
    f2 = np.asarray(ctx_cuda.getState(getForces=True,
                                      groups={3}).getForces())
    np.testing.assert_array_equal(f2[:3], 0.0)
