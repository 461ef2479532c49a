"""Native tile streamer (C++/ctypes) and out-of-core evaluation."""

import numpy as np
import pytest

from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.io import TiledGridWriter
from openmmgridforce_tpu.io.omgtile import num_tiles, tile_range
from openmmgridforce_tpu.ops import evaluate_grid

RNG = np.random.default_rng(97)
COUNTS = (40, 33, 37)
SPACING = (0.05, 0.06, 0.055)
ORIGIN = (0.3, -0.2, 0.1)
TILE = 8


@pytest.fixture(scope="module")
def tiled_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "grid.tiled")
    vals = RNG.standard_normal(COUNTS).astype(np.float32)
    derivs = RNG.standard_normal((27,) + COUNTS).astype(np.float32)
    with TiledGridWriter(path, COUNTS, SPACING, ORIGIN, tile_size=TILE,
                         has_derivatives=True) as w:
        for tx in range(w.ntx):
            for ty in range(w.nty):
                for tz in range(w.ntz):
                    x0, y0, z0, x1, y1, z1 = tile_range(COUNTS, TILE, tx,
                                                        ty, tz)
                    w.write_tile(tx, ty, tz, vals[x0:x1, y0:y1, z0:z1],
                                 derivs[:, x0:x1, y0:y1, z0:z1])
    return path, vals, derivs


def test_native_metadata_and_tiles(tiled_file):
    from openmmgridforce_tpu.io.native import NativeTileStream
    path, vals, derivs = tiled_file
    with NativeTileStream(path) as ts:
        assert ts.counts == COUNTS
        np.testing.assert_allclose(ts.spacing, SPACING)
        np.testing.assert_allclose(ts.origin, ORIGIN)
        assert ts.tile_size == TILE
        assert ts.has_derivatives
        v, d = ts.read_tile(1, 2, 3)
        x0, y0, z0, x1, y1, z1 = tile_range(COUNTS, TILE, 1, 2, 3)
        np.testing.assert_array_equal(v, vals[x0:x1, y0:y1, z0:z1])
        np.testing.assert_array_equal(d, derivs[:, x0:x1, y0:y1, z0:z1])


def test_native_region_assembly_with_clamping(tiled_file):
    from openmmgridforce_tpu.io.native import NativeTileStream
    path, vals, derivs = tiled_file
    with NativeTileStream(path) as ts:
        # interior region spanning tile boundaries
        v, d = ts.read_region((5, 6, 7), (20, 18, 22),
                              with_derivatives=True)
        np.testing.assert_array_equal(v, vals[5:25, 6:24, 7:29])
        np.testing.assert_array_equal(d, derivs[:, 5:25, 6:24, 7:29])

        # region hanging off every face: clamp == edge replication
        v2, _ = ts.read_region((-3, -2, -4), (10, 10, 10))
        idx_x = np.clip(np.arange(-3, 7), 0, COUNTS[0] - 1)
        idx_y = np.clip(np.arange(-2, 8), 0, COUNTS[1] - 1)
        idx_z = np.clip(np.arange(-4, 6), 0, COUNTS[2] - 1)
        want = vals[np.ix_(idx_x, idx_y, idx_z)]
        np.testing.assert_array_equal(v2, want)

        v3, _ = ts.read_region((35, 28, 30), (10, 10, 10))
        idx_x = np.clip(np.arange(35, 45), 0, COUNTS[0] - 1)
        idx_y = np.clip(np.arange(28, 38), 0, COUNTS[1] - 1)
        idx_z = np.clip(np.arange(30, 40), 0, COUNTS[2] - 1)
        np.testing.assert_array_equal(
            v3, vals[np.ix_(idx_x, idx_y, idx_z)])


def test_native_lru_cache(tiled_file):
    from openmmgridforce_tpu.io.native import NativeTileStream
    path, vals, _ = tiled_file
    tile_bytes = (TILE ** 3) * 4 * 28  # values + 27 derivs
    with NativeTileStream(path, budget_bytes=3 * tile_bytes) as ts:
        ts.read_tile(0, 0, 0)
        ts.read_tile(0, 0, 0)
        st = ts.cache_stats()
        assert st.hits == 1 and st.misses == 1
        ts.read_tile(0, 0, 1)
        ts.read_tile(0, 0, 2)
        ts.read_tile(0, 0, 3)  # must evict
        st = ts.cache_stats()
        assert st.evictions >= 1
        v, _ = ts.read_tile(0, 0, 0)  # still correct after churn
        np.testing.assert_array_equal(v, vals[0:TILE, 0:TILE, 0:TILE])


@pytest.mark.parametrize("method", [InterpolationMethod.TRILINEAR,
                                    InterpolationMethod.BSPLINE,
                                    InterpolationMethod.TRIQUINTIC])
def test_streamed_evaluation_matches_full_grid(tiled_file, method):
    from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator
    path, vals, derivs = tiled_file

    full = Grid.create(vals, SPACING, ORIGIN, derivs=derivs,
                       interp_method=method, dtype=np.float32)

    rng = np.random.default_rng(1234 + int(method))
    # atoms clustered in a sub-box + two outside the full grid
    lo = np.asarray(ORIGIN) + 4 * np.asarray(SPACING)
    hi = np.asarray(ORIGIN) + 20 * np.asarray(SPACING)
    pos = np.vstack([
        rng.uniform(lo, hi, (30, 3)),
        np.asarray(ORIGIN) - 0.3,
        np.asarray(ORIGIN) + COUNTS * np.asarray(SPACING) + 0.2,
    ]).astype(np.float32)
    scaling = rng.standard_normal(len(pos)).astype(np.float32)

    want = evaluate_grid(full, pos, scaling)

    ev = StreamedGridEvaluator(path, interp_method=method,
                               region_shape=(32, 32, 32),
                               oob_k=full.oob_k)
    got = ev.evaluate(pos, scaling)
    np.testing.assert_allclose(np.asarray(got.per_atom_energy),
                               np.asarray(want.per_atom_energy),
                               rtol=1e-5, atol=1e-5)
    # forces: region-local coordinates reassociate the cell-fraction
    # arithmetic; float32 agreement to ~1e-4 relative is expected
    np.testing.assert_allclose(np.asarray(got.forces),
                               np.asarray(want.forces), rtol=1e-4,
                               atol=5e-4)
    ev.close()


def test_evaluate_streamed_gap_mask():
    """Atoms inside the full grid but outside the resident region would
    silently take region-restraint values; return_gap_mask=True must
    flag exactly those (and only active ones) so direct callers of
    evaluate_streamed can't be silently wrong."""
    from openmmgridforce_tpu.io.streaming import evaluate_streamed
    from openmmgridforce_tpu.ops.packed import pack_grid

    vals = RNG.standard_normal((9, 9, 9)).astype(np.float32)
    spacing = (0.1, 0.1, 0.1)
    region_origin = np.array([1.0, 1.0, 1.0])
    region = Grid.create(vals, spacing, region_origin,
                         interp_method=InterpolationMethod.TRILINEAR,
                         dtype=np.float32)
    # full box extends 0.5 nm beyond the region on every side
    full_origin = region_origin - 0.5
    full_corner = region_origin + 0.8 + 0.5

    pos = np.array([
        [1.4, 1.4, 1.4],     # inside region: not flagged
        [1.0, 1.0, 0.7],     # in the gap (inside full, below region z)
        [2.0, 1.4, 1.4],     # in the gap (inside full, beyond region x)
        [0.2, 1.4, 1.4],     # outside the full box: restrained, no flag
        [1.4, 2.0, 1.4],     # in the gap but scaling 0: no flag
    ], dtype=np.float32)
    scaling = np.array([1.0, 1.0, 1.0, 1.0, 0.0], dtype=np.float32)

    for g in (region, pack_grid(region)):
        res, gap = evaluate_streamed(g, full_origin, full_corner, pos,
                                     scaling, oob_k=100.0,
                                     return_gap_mask=True)
        np.testing.assert_array_equal(
            np.asarray(gap), [False, True, True, False, False])
        # default call is unchanged (no mask, same values)
        plain = evaluate_streamed(g, full_origin, full_corner, pos,
                                  scaling, oob_k=100.0)
        np.testing.assert_array_equal(np.asarray(plain.per_atom_energy),
                                      np.asarray(res.per_atom_energy))
