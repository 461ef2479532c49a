"""Bisect the d=6 compensated-eval runtime hang on XLA:CPU."""
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
from openmmgridforce_tpu.ops.twofloat import df, df_sum, df_to

T0 = time.time()


def t(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


N = 8
rng = np.random.default_rng(0)
f_hi = jnp.asarray(rng.uniform(0, 1, (N,)), jnp.float32)
f_lo = jnp.zeros_like(f_hi)


def piece_cheb(d):
    @jax.jit
    def fn(fh, fl):
        T, dT = _cheb_df((fh, fl), d)
        return sum(df_to(x) for x in T) + sum(df_to(x) for x in dT)
    t(f"cheb d={d}: compile+run")
    out = fn(f_hi, f_lo)
    jax.block_until_ready(out)
    t(f"cheb d={d}: done {out[0]}")


def piece_contract(d, levels):
    """Chain `levels` contractions starting from [N, d, ..., d]."""
    shape = (N,) + (d,) * levels
    R_hi = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    R_lo = jnp.asarray(rng.standard_normal(shape) * 1e-8, jnp.float32)

    @jax.jit
    def fn(rh, rl, fh, fl):
        T, dT = _cheb_df((fh, fl), d)
        hi, lo = rh, rl
        for _ in range(levels):
            hi, lo = _df_contract_last(hi, lo, T, d)
        return df_to(df_sum((hi, lo)))
    t(f"contract d={d} levels={levels}: compile+run")
    out = fn(R_hi, R_lo, f_hi, f_lo)
    jax.block_until_ready(out)
    t(f"contract d={d} levels={levels}: done {out}")


piece_cheb(4)
piece_cheb(6)
piece_contract(4, 3)
piece_contract(6, 1)
piece_contract(6, 2)
piece_contract(6, 3)
t("ALL DONE")
