#!/usr/bin/env python
"""Measure the compensated (double-float32) evaluation tier on the real
TPU: f64-parity at the 1e-5 gate and in-scan throughput vs the plain f32
packed tier (VERDICT r3 next #2 'at what steps/s cost').

Sizing: the tier is for accuracy-gated pose scoring, so the benchmark
uses an 81^3 window of the REAL canonical charge grid (the compensated
row table for the full 13.2M-cell grid would be 6.75 GB — a ~18 min
upload at the tunnel's 6.3 MB/s; windows are how pose scoring would
deploy it). Timing follows CLAUDE.md rules: in-scan with a fake
dependency, >=200 iterations per dispatch.

Appends rows to BENCH_CANONICAL.jsonl (stage "compensated-tpu").
"""
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp

import bench_canonical as bc
from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.ops.compensated import (evaluate_compensated,
                                                 pack_grid_compensated)
from openmmgridforce_tpu.ops.packed import evaluate_packed, pack_grid

N_POINTS = int(os.environ.get("BENCH_COMP_POINTS", "47000"))
N_ITERS = int(os.environ.get("BENCH_COMP_ITERS", "200"))


def in_scan_rate(fn, pack, pos0, n_iters=N_ITERS):
    """steps/s of fn(pack, positions)->forces inside one lax.scan
    dispatch. ``pack`` is passed as a jit ARGUMENT — closing over a
    multi-hundred-MB coefficient table embeds it in the serialized HLO
    and the remote compiler rejects the request (HTTP 413; hit at the
    544 MB triquintic plain pack)."""

    @jax.jit
    def run(pk, p):
        def body(p, _):
            f = fn(pk, p)
            # fake dependency: nudge positions by a zero-scaled force
            return p + 0.0 * f, None
        p, _ = jax.lax.scan(body, p, None, length=n_iters)
        return p

    jax.block_until_ready(run(pack, pos0))    # compile + warm
    t0 = time.time()
    jax.block_until_ready(run(pack, pos0))
    return n_iters / (time.time() - t0)


def main():
    # BENCH_DEVICE=cpu runs the same measurement on the host backend —
    # a cost-RATIO proxy when the tunnel is down (the emitted row's
    # "device" field says which backend produced it).
    if os.environ.get("BENCH_DEVICE") == "cpu":
        # pin the whole process to the host backend BEFORE the first
        # device query (the backend choice is cached at first use, and
        # an uncommitted jnp op would otherwise try to init the tunnel)
        jax.config.update("jax_platforms", "cpu")
        dev = jax.devices("cpu")[0]
    else:
        dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)

    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="bspline",
                   choices=["bspline", "tricubic", "triquintic"])
    p.add_argument("--grid", default="charge", choices=bc.GRID_TYPES)
    p.add_argument("--window", type=int, default=40,
                   help="window half-extent in grid points")
    args = p.parse_args()
    methods = {"bspline": InterpolationMethod.BSPLINE,
               "tricubic": InterpolationMethod.TRICUBIC,
               "triquintic": InterpolationMethod.TRIQUINTIC}
    method = methods[args.method]
    hermite = args.method != "bspline"

    # (2w+1)^3 window of the REAL canonical grid, centred in the box
    c = [n // 2 for n in bc.COUNTS]
    w = args.window
    sl = tuple(slice(ci - w, ci + w + 1) for ci in c)
    sub_origin = (np.asarray(bc.ORIGIN)
                  + (np.asarray(c) - w) * np.asarray(bc.SPACING))
    if hermite:
        d27 = np.load(bc.derivs_cache(args.grid), mmap_mode="r")
        sub27 = np.ascontiguousarray(
            d27[(slice(None),) + sl]).astype(np.float32)
        sub = sub27[0]
        derivs32 = np.moveaxis(sub27, 0, -1)
    else:
        sub = np.load(bc.vals_cache(args.grid))[sl].astype(np.float32)
        derivs32 = None
    g32 = Grid.create(sub, bc.SPACING, sub_origin, derivs=derivs32,
                      interp_method=method, dtype=np.float32)

    rng = np.random.default_rng(3)
    lo = sub_origin + 0.1
    hi = sub_origin + (np.asarray(sub.shape) - 1) * np.asarray(
        bc.SPACING) - 0.1
    pos = rng.uniform(lo, hi, (N_POINTS, 3)).astype(np.float32)
    ones = jnp.ones((N_POINTS,), jnp.float32)

    plain = pack_grid(g32)
    t0 = time.time()
    comp = pack_grid_compensated(g32, origin=sub_origin,
                                 spacing=bc.SPACING)
    comp = jax.device_put(comp, dev)
    jax.block_until_ready(comp.coeffs)
    t_pack = time.time() - t0
    print(f"compensated pack+upload ({comp.coeffs.nbytes / 1e6:.0f} MB): "
          f"{t_pack:.1f}s", file=sys.stderr, flush=True)

    plain = jax.device_put(plain, dev)
    posd = jax.device_put(jnp.asarray(pos), dev)
    rate_plain = in_scan_rate(
        lambda pk, p: evaluate_packed(pk, p, ones).forces, plain, posd)
    rate_comp = in_scan_rate(
        lambda pk, p: evaluate_compensated(pk, p, ones).forces, comp,
        posd)
    print(f"plain {rate_plain:.1f} evals/s, compensated {rate_comp:.1f} "
          f"evals/s ({rate_plain / rate_comp:.1f}x cost)",
          file=sys.stderr, flush=True)

    # parity on device vs f64 CPU truth at 2000 of the points
    import jax.numpy as _j
    sel = rng.choice(N_POINTS, 2000, replace=False)
    got = np.asarray(
        evaluate_compensated(comp, posd[sel], ones[:2000]).per_atom_energy,
        np.float64)
    with jax.enable_x64():
        cpu = jax.devices("cpu")[0]
        g64 = Grid.create(
            sub.astype(np.float64), bc.SPACING, sub_origin,
            derivs=None if derivs32 is None
            else derivs32.astype(np.float64),
            interp_method=method, dtype=np.float64)
        from openmmgridforce_tpu.ops.interpolate import evaluate_grid
        with jax.default_device(cpu):
            truth = np.asarray(evaluate_grid(
                g64, pos[sel].astype(np.float64),
                np.ones(2000)).per_atom_energy)
    scale = np.abs(truth).max()
    max_rel = float(np.abs(got - truth).max() / scale)
    bc.emit({"stage": "compensated-tpu",
             "grid": f"{args.grid}-window-{2 * w + 1}",
             "method": args.method,
             "points": N_POINTS, "iters": N_ITERS,
             "plain_evals_per_s": round(rate_plain, 1),
             "compensated_evals_per_s": round(rate_comp, 1),
             "cost_ratio": round(rate_plain / rate_comp, 2),
             "pack_upload_s": round(t_pack, 1),
             "max_rel_vs_f64": max_rel, "gate": 1e-5,
             "pass": bool(max_rel < 1e-5),
             "device": str(dev)})


if __name__ == "__main__":
    main()
