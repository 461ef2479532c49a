"""Driver entry points stay green (single-chip jit + virtual-mesh dryrun)."""

import importlib.util

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles_and_runs(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    pos, vel = out
    assert pos.shape == args[0].shape
    assert np.all(np.isfinite(np.asarray(pos)))


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(graft, n):
    if len(jax.devices()) < n:
        pytest.skip("needs virtual devices")
    graft.dryrun_multichip(n)


def test_dryrun_distributed_driver_env():
    """dryrun_distributed must be green when called the way a DRIVER
    would: fresh interpreter, axon plugin on PYTHONPATH, no platform
    pin. (The function itself runs all jax work in pinned-CPU
    subprocesses, so the calling interpreter's jax state is irrelevant —
    that is the property under test.)"""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    env.pop("OMGF_TEST_PLATFORM", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_distributed(); "
         "print('OK')"],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout


def test_dryrun_multichip_driver_env():
    """Run dryrun_multichip(8) the way the DRIVER does: a fresh
    interpreter with the axon plugin on PYTHONPATH and NO JAX_PLATFORMS
    pin — the entry itself must force the CPU virtual mesh (round-1
    regression: eager ops hit the broken tunneled TPU backend first)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # the entry must set the device-count flag
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    env.pop("OMGF_TEST_PLATFORM", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout
