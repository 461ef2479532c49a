"""Progressively rebuild _evaluate_compensated_core at d=6 to find the
stage that makes XLA:CPU runtime explode."""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["OMGF_NO_COMPILE_CACHE"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from openmmgridforce_tpu.ops.compensated import _cheb_df, _df_contract_last
from openmmgridforce_tpu.ops.twofloat import (df, df_mul, df_mul_f, df_sub,
                                              df_sum, df_to, df_where,
                                              fast_two_sum, two_sum)

T0 = time.time()


def t(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


d = 6
K = d ** 3
counts = (5, 5, 5)
pad = -(-2 * K // 128) * 128
ncells = 64
N = 8
rng = np.random.default_rng(0)
coeffs = jnp.asarray(rng.standard_normal((ncells, pad)), jnp.float32)
pos = jnp.asarray(rng.uniform(0.1, 0.3, (N, 3)), jnp.float32)
pos_lo_a = jnp.zeros_like(pos)
scaling = jnp.ones((N,), jnp.float32)
z3 = jnp.zeros((3,), jnp.float32)
isp = jnp.full((3,), 10.0, jnp.float32)
cor = jnp.full((3,), 0.4, jnp.float32)
sp3 = jnp.full((3,), 0.1, jnp.float32)


def geometry(pos_hi, pos_lo):
    t_ax, f_ax, ix_ax = [], [], []
    inside = None
    icounts = jnp.asarray(counts)
    for ax in range(3):
        r = df_sub((pos_hi[..., ax], pos_lo[..., ax]), (z3[ax], z3[ax]))
        tt = df_mul(r, (isp[ax], z3[ax]))
        ix = jnp.clip(jnp.floor(tt[0]).astype(jnp.int32), 0,
                      icounts[ax] - 2)
        fh, e = two_sum(tt[0], -ix.astype(jnp.float32))
        f = fast_two_sum(fh, e + tt[1])
        out = (f[0] < 0.0) | (f[0] > 1.0)
        f = (jnp.clip(f[0], 0.0, 1.0), jnp.where(out, 0.0, f[1]))
        over = df_sub(r, (cor[ax], z3[ax]))
        tol = jnp.float32(2e-13) * cor[ax]
        in_ax = ((r[0] + r[1] >= -tol) & (over[0] + over[1] <= tol))
        inside = in_ax if inside is None else (inside & in_ax)
        t_ax.append(tt)
        f_ax.append(f)
        ix_ax.append(ix)
    return f_ax, ix_ax, inside


def stage_A(pos_hi, pos_lo, scaling):
    f_ax, ix_ax, inside = geometry(pos_hi, pos_lo)
    ncx = ncy = ncz = counts[0] - 1
    cell = (ix_ax[0] * ncy + ix_ax[1]) * ncz + ix_ax[2]
    rows = jnp.take(coeffs, cell, axis=0)
    return rows.sum() + f_ax[0][0].sum() + inside.sum()


def stage_B(pos_hi, pos_lo, scaling):
    f_ax, ix_ax, inside = geometry(pos_hi, pos_lo)
    ncx = ncy = ncz = counts[0] - 1
    cell = (ix_ax[0] * ncy + ix_ax[1]) * ncz + ix_ax[2]
    rows = jnp.take(coeffs, cell, axis=0)
    R_hi = rows[..., :K].reshape(rows.shape[:-1] + (d, d, d))
    R_lo = rows[..., K:2 * K].reshape(rows.shape[:-1] + (d, d, d))
    Tx, dTx = _cheb_df(f_ax[0], d)
    Ty, dTy = _cheb_df(f_ax[1], d)
    Tz, dTz = _cheb_df(f_ax[2], d)
    A = _df_contract_last(R_hi, R_lo, Tz, d)
    By = _df_contract_last(A[0], A[1], Ty, d)
    interp = _df_contract_last(By[0], By[1], Tx, d)
    return df_to(df_sum(interp))


def stage_C(pos_hi, pos_lo, scaling):
    f_ax, ix_ax, inside = geometry(pos_hi, pos_lo)
    ncx = ncy = ncz = counts[0] - 1
    cell = (ix_ax[0] * ncy + ix_ax[1]) * ncz + ix_ax[2]
    rows = jnp.take(coeffs, cell, axis=0)
    R_hi = rows[..., :K].reshape(rows.shape[:-1] + (d, d, d))
    R_lo = rows[..., K:2 * K].reshape(rows.shape[:-1] + (d, d, d))
    Tx, dTx = _cheb_df(f_ax[0], d)
    Ty, dTy = _cheb_df(f_ax[1], d)
    Tz, dTz = _cheb_df(f_ax[2], d)
    A = _df_contract_last(R_hi, R_lo, Tz, d)
    Adz = _df_contract_last(R_hi, R_lo, dTz, d)
    By = _df_contract_last(A[0], A[1], Ty, d)
    Bdy = _df_contract_last(A[0], A[1], dTy, d)
    Bdz = _df_contract_last(Adz[0], Adz[1], Ty, d)
    interp = _df_contract_last(By[0], By[1], Tx, d)
    gx = _df_contract_last(By[0], By[1], dTx, d)
    gy = _df_contract_last(Bdy[0], Bdy[1], Tx, d)
    gz = _df_contract_last(Bdz[0], Bdz[1], Tx, d)
    grads = [df_mul(g, (isp[ax], z3[ax]))
             for ax, g in enumerate((gx, gy, gz))]
    energy_in = df_mul_f(interp, scaling)
    force_in = jnp.stack([-scaling * df_to(g) for g in grads], axis=-1)
    per_atom = df_where(inside & (scaling != 0.0), energy_in,
                        df(jnp.zeros_like(energy_in[0])))
    return df_to(df_sum(per_atom)) + force_in.sum()


for name, fn in (("A gather", stage_A), ("B interp", stage_B),
                 ("C full", stage_C)):
    j = jax.jit(fn)
    t(f"stage {name}: compile+run")
    out = j(pos, pos_lo_a, scaling)
    jax.block_until_ready(out)
    t(f"stage {name}: done {out}")
t("ALL DONE")


def barrier(x):
    return jax.lax.optimization_barrier(x)


def stage_D(pos_hi, pos_lo, scaling):
    f_ax, ix_ax, inside = geometry(pos_hi, pos_lo)
    ncx = ncy = ncz = counts[0] - 1
    cell = (ix_ax[0] * ncy + ix_ax[1]) * ncz + ix_ax[2]
    rows = jnp.take(coeffs, cell, axis=0)
    R_hi = rows[..., :K].reshape(rows.shape[:-1] + (d, d, d))
    R_lo = rows[..., K:2 * K].reshape(rows.shape[:-1] + (d, d, d))
    Tx, dTx = _cheb_df(f_ax[0], d)
    Ty, dTy = _cheb_df(f_ax[1], d)
    Tz, dTz = _cheb_df(f_ax[2], d)
    A = barrier(_df_contract_last(R_hi, R_lo, Tz, d))
    Adz = barrier(_df_contract_last(R_hi, R_lo, dTz, d))
    By = barrier(_df_contract_last(A[0], A[1], Ty, d))
    Bdy = barrier(_df_contract_last(A[0], A[1], dTy, d))
    Bdz = barrier(_df_contract_last(Adz[0], Adz[1], Ty, d))
    interp = barrier(_df_contract_last(By[0], By[1], Tx, d))
    gx = barrier(_df_contract_last(By[0], By[1], dTx, d))
    gy = barrier(_df_contract_last(Bdy[0], Bdy[1], Tx, d))
    gz = barrier(_df_contract_last(Bdz[0], Bdz[1], Tx, d))
    grads = [df_mul(g, (isp[ax], z3[ax]))
             for ax, g in enumerate((gx, gy, gz))]
    energy_in = df_mul_f(interp, scaling)
    force_in = jnp.stack([-scaling * df_to(g) for g in grads], axis=-1)
    per_atom = df_where(inside & (scaling != 0.0), energy_in,
                        df(jnp.zeros_like(energy_in[0])))
    return df_to(df_sum(per_atom)) + force_in.sum()


j = jax.jit(stage_D)
t("stage D barriered-full: compile+run")
out = j(pos, pos_lo_a, scaling)
jax.block_until_ready(out)
t(f"stage D barriered-full: done {out}")
t("D DONE")
