"""Execute the README's Python quick-start blocks verbatim (with ONLY
documented size/path substitutions), so the published examples can never
drift from the real API surface again (round-1 regression: the README
called a method that didn't exist)."""

import re

import numpy as np
import pytest

README = "/root/repo/README.md"
FIXTURES = "/root/reference/python/prmtopcrd"


def _python_blocks():
    text = open(README).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def _substitute(src, subs):
    """Apply exact-string substitutions; every key MUST appear (so README
    edits that invalidate a substitution fail loudly here)."""
    for old, new in subs.items():
        assert old in src, f"README drifted: {old!r} not found"
        src = src.replace(old, new)
    return src


def test_readme_functional_quickstart(tmp_path):
    blocks = _python_blocks()
    assert len(blocks) >= 2
    src = _substitute(blocks[0], {
        '"receptor.prmtop"': f'"{FIXTURES}/receptor.prmtop"',
        '"receptor.inpcrd"': f'"{FIXTURES}/receptor.trans.inpcrd"',
        '"ligand.prmtop"': f'"{FIXTURES}/ligand.prmtop"',
        '"ligand.inpcrd"': f'"{FIXTURES}/ligand.trans.inpcrd"',
        # shrink for the 1-core CI box: coarse grid, 4 replicas, 4 steps
        "0.025": "0.1",
        "n_replicas=1000": "n_replicas=4",
        "n_steps=1000": "n_steps=4",
        "(1000,)": "(4,)",
        # the pallas generation kernel targets the TPU; CPU tests use jnp
        'backend="pallas"': 'backend="jnp"',
    })
    ns = {}
    exec(compile(src, "README-block-1", "exec"), ns)
    states = ns["states"]
    assert np.all(np.isfinite(np.asarray(states.positions)))
    assert states.positions.shape[0] == 4


def test_readme_api_quickstart(tmp_path, capsys):
    import openmmgridforce_tpu.api as gfp
    from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop
    from openmmgridforce_tpu.ops import gridgen

    # build the V3 grid file the snippet loads
    rec = load_prmtop(f"{FIXTURES}/receptor.prmtop")
    rec_x = load_inpcrd(f"{FIXTURES}/receptor.trans.inpcrd")
    lig_x = load_inpcrd(f"{FIXTURES}/ligand.trans.inpcrd")
    lo = lig_x.min(0) - 0.7
    counts = tuple(int(c) + 1
                   for c in np.ceil((lig_x.max(0) + 0.7 - lo) / 0.1))
    g = gridgen.generate_grid(counts, (0.1,) * 3, tuple(lo), "charge",
                              rec_x, rec.charges, rec.sigmas,
                              rec.epsilons, dtype=np.float64)
    gpath = str(tmp_path / "charge.grid")
    tmp = gfp.GridForce()
    tmp.addGridCounts(*counts)
    tmp.addGridSpacing(0.1, 0.1, 0.1)
    tmp.setGridOrigin(*lo)
    tmp.setGridValues(np.asarray(g.vals))
    tmp.setGridType("charge")
    tmp.saveToFile(gpath)

    src = _substitute(_python_blocks()[1], {
        '"charge.grid"': f'"{gpath}"',
        '"ligand.prmtop"': f'"{FIXTURES}/ligand.prmtop"',
        '"ligand.inpcrd"': f'"{FIXTURES}/ligand.trans.inpcrd"',
        "step(1000)": "step(5)",
    })
    ns = {}
    exec(compile(src, "README-block-2", "exec"), ns)
    out = capsys.readouterr().out
    assert "kJ/mol" in out or re.search(r"-?\d+\.\d+", out)
    pos = ns["ctx"].getPositions()
    assert np.all(np.isfinite(np.asarray(pos)))
