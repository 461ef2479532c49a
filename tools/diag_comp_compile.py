"""Isolate the triquintic evaluate_compensated hang: compile vs run,
with tiny shapes, timing each phase. Also tries degree=4 for contrast."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from openmmgridforce_tpu.ops.compensated import _evaluate_compensated_core

T0 = time.time()


def t(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def run(d, counts=(5, 5, 5), n=8):
    K = d ** 3
    pad = -(-2 * K // 128) * 128
    ncells = (counts[0] - 1) * (counts[1] - 1) * (counts[2] - 1)
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(rng.standard_normal((ncells, pad)), jnp.float32)
    three = lambda v: jnp.asarray(v, jnp.float32)
    pos = jnp.asarray(rng.uniform(0.1, 0.3, (n, 3)), jnp.float32)
    zeros3 = three([0.0, 0.0, 0.0])
    args = dict(
        coeffs=coeffs,
        origin_hi=zeros3, origin_lo=zeros3,
        inv_spacing_hi=three([10.0] * 3), inv_spacing_lo=zeros3,
        corner_hi=three([0.4] * 3), corner_lo=zeros3,
        spacing=three([0.1] * 3),
        pos_hi=pos, pos_lo=jnp.zeros_like(pos),
        scaling=jnp.ones((n,), jnp.float32),
        counts=counts, degree=d, back_power=0.0, oob_k=100.0, K=K)
    t(f"d={d}: tracing/lowering")
    lowered = _evaluate_compensated_core.lower(**args)
    t(f"d={d}: lowered; HLO size {len(lowered.as_text())} chars; compiling")
    compiled = lowered.compile()
    t(f"d={d}: compiled; running")
    out = compiled(**{k: v for k, v in args.items()
                      if k not in ("counts", "degree", "back_power",
                                   "oob_k", "K")})
    jax.block_until_ready(out)
    t(f"d={d}: ran; energy={out[0]}")


run(4)
run(6)
t("ALL DONE")
