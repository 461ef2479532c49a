"""Grid file format roundtrips (V3, OMGTILE, NetCDF, .dx)."""

import numpy as np
import pytest

from openmmgridforce_tpu.io import (TiledGridReader, TiledGridWriter,
                                    grid_from_file, load_v3, nc_to_v3,
                                    read_dx, read_netcdf, save_v3, write_dx,
                                    write_netcdf)
from openmmgridforce_tpu.io.omgtile import num_tiles, tile_range

RNG = np.random.default_rng(77)
COUNTS = (5, 6, 4)
SPACING = (0.1, 0.11, 0.12)
ORIGIN = (1.0, -0.5, 0.25)


def test_v3_roundtrip_values(tmp_path):
    vals = RNG.standard_normal(COUNTS)
    p = tmp_path / "g.grid"
    save_v3(p, COUNTS, SPACING, ORIGIN, vals, grid_type="lja",
            inv_power=2.0, inv_power_mode=2)
    d = load_v3(p)
    assert d.counts == COUNTS
    np.testing.assert_allclose(d.spacing, SPACING)
    np.testing.assert_allclose(d.origin, ORIGIN)
    np.testing.assert_array_equal(d.vals, vals)
    assert d.derivs is None
    assert d.grid_type == "lja"
    assert d.inv_power == 2.0
    assert d.inv_power_mode == 2


def test_v3_roundtrip_derivatives(tmp_path):
    derivs = RNG.standard_normal((27,) + COUNTS)
    p = tmp_path / "g.grid"
    save_v3(p, COUNTS, SPACING, ORIGIN, derivs[0], derivs=derivs,
            grid_type="charge")
    d = load_v3(p)
    np.testing.assert_array_equal(d.derivs, derivs)
    np.testing.assert_array_equal(d.vals, derivs[0])
    assert d.grid_type == "charge"


def test_v3_header_is_128_bytes_reference_layout(tmp_path):
    """Byte-level check against the reference's writer layout
    (GridForce.cpp:723-787)."""
    vals = np.zeros(COUNTS)
    p = tmp_path / "g.grid"
    save_v3(p, COUNTS, SPACING, ORIGIN, vals)
    raw = p.read_bytes()
    assert raw[:8] == b"OMGRID\x00\x00"
    import struct
    assert struct.unpack_from("<I", raw, 8)[0] == 3       # version
    assert struct.unpack_from("<I", raw, 12)[0] == 128    # header size
    assert struct.unpack_from("<iii", raw, 16) == COUNTS
    assert struct.unpack_from("<Q", raw, 56)[0] == 128    # data offset
    assert len(raw) == 128 + 8 * np.prod(COUNTS)


def test_v3_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.grid"
    p.write_bytes(b"NOTAGRID" + b"\x00" * 200)
    with pytest.raises(ValueError, match="magic"):
        load_v3(p)


def test_omgtile_roundtrip(tmp_path):
    counts = (10, 7, 9)
    tile_size = 4
    vals = RNG.standard_normal(counts).astype(np.float32)
    derivs = RNG.standard_normal((27,) + counts).astype(np.float32)
    p = tmp_path / "g.tiled"

    with TiledGridWriter(p, counts, SPACING, ORIGIN, tile_size=tile_size,
                         has_derivatives=True, inv_power=3.0,
                         inv_power_mode=1) as w:
        ntx, nty, ntz = num_tiles(counts, tile_size)
        for tx in range(ntx):
            for ty in range(nty):
                for tz in range(ntz):
                    x0, y0, z0, x1, y1, z1 = tile_range(counts, tile_size,
                                                        tx, ty, tz)
                    w.write_tile(tx, ty, tz, vals[x0:x1, y0:y1, z0:z1],
                                 derivs[:, x0:x1, y0:y1, z0:z1])

    with TiledGridReader(p) as r:
        assert r.counts == counts
        assert r.tile_size == tile_size
        assert r.has_derivatives
        assert r.inv_power == 3.0
        assert r.inv_power_mode == 1
        v, d = r.read_full()
    np.testing.assert_array_equal(v, vals)
    np.testing.assert_array_equal(d, derivs)


def test_grid_from_file_dispatch(tmp_path):
    vals = RNG.standard_normal(COUNTS)
    p1 = tmp_path / "a.grid"
    save_v3(p1, COUNTS, SPACING, ORIGIN, vals)
    g = grid_from_file(p1)
    assert g.counts == COUNTS
    np.testing.assert_allclose(np.asarray(g.vals), vals)

    p2 = tmp_path / "a.tiled"
    with TiledGridWriter(p2, COUNTS, SPACING, ORIGIN, tile_size=8) as w:
        for tx in range(w.ntx):
            for ty in range(w.nty):
                for tz in range(w.ntz):
                    x0, y0, z0, x1, y1, z1 = tile_range(COUNTS, 8, tx, ty,
                                                        tz)
                    w.write_tile(tx, ty, tz, vals[x0:x1, y0:y1, z0:z1])
    g2 = grid_from_file(p2)
    np.testing.assert_allclose(np.asarray(g2.vals), vals.astype(np.float32))


def test_netcdf_roundtrip(tmp_path):
    vals = RNG.standard_normal(COUNTS).reshape(-1)
    p = str(tmp_path / "g.nc")
    write_netcdf(p, COUNTS, SPACING, vals, ORIGIN)
    d = read_netcdf(p)
    assert d["counts"] == COUNTS
    np.testing.assert_allclose(d["spacing"], SPACING)
    np.testing.assert_allclose(d["origin"], ORIGIN)
    np.testing.assert_allclose(d["vals"], vals)


def test_dx_roundtrip_angstrom_conversion(tmp_path):
    vals = RNG.standard_normal(COUNTS).reshape(-1)
    for name in ["g.dx", "g.dx.gz"]:
        p = str(tmp_path / name)
        write_dx(p, COUNTS, SPACING, vals, ORIGIN)
        d = read_dx(p)
        np.testing.assert_array_equal(d["counts"], COUNTS)
        np.testing.assert_allclose(d["spacing"],
                                   np.asarray(SPACING) * 10.0, rtol=1e-12)
        np.testing.assert_allclose(d["origin"],
                                   np.asarray(ORIGIN) * 10.0, rtol=1e-12)
        np.testing.assert_allclose(d["vals"], vals, rtol=1e-5)


def test_nc_converter_units(tmp_path):
    """AlGDock NetCDF (Angstrom, kcal) -> V3 (nm, kJ)."""
    vals_kcal = RNG.standard_normal(COUNTS).reshape(-1)
    spacing_a = (0.25, 0.25, 0.25)
    nc = str(tmp_path / "g.nc")
    write_netcdf(nc, COUNTS, spacing_a, vals_kcal)
    out = str(tmp_path / "g.grid")
    nc_to_v3(nc, out)
    d = load_v3(out)
    np.testing.assert_allclose(d.spacing, np.asarray(spacing_a) * 0.1)
    np.testing.assert_allclose(d.vals.reshape(-1), vals_kcal * 4.184)


def test_v3_griddata_variant_roundtrip(tmp_path):
    """The GridData container writes values + legacy block + DERIVS
    trailer (GridData.cpp:180-265); our loader must read it back
    identically, derivatives included."""
    from openmmgridforce_tpu.io import load_v3, save_v3_griddata

    rng = np.random.default_rng(5)
    counts = (4, 3, 5)
    n = 60
    vals = rng.standard_normal(counts)
    derivs = rng.standard_normal((27,) + counts)
    p = str(tmp_path / "gd.grid")
    save_v3_griddata(p, counts, (0.1, 0.2, 0.3), (1.0, 2.0, 3.0), vals,
                     derivs=derivs, inv_power=2.0, inv_power_mode=2)
    d = load_v3(p)
    assert d.counts == counts
    np.testing.assert_array_equal(d.vals, vals)
    np.testing.assert_array_equal(d.derivs, derivs)
    assert d.origin == (1.0, 2.0, 3.0)
    assert d.inv_power == 2.0 and d.inv_power_mode == 2
    # trailer byte layout: tag + {0, 27} big-endian count
    raw = open(p, "rb").read()
    off = 128 + 8 * n + 4 + 24
    assert raw[off:off + 8] == b"DERIVS\x00\x1b"

    # values-only variant (no trailer) also round-trips
    p2 = str(tmp_path / "gd2.grid")
    save_v3_griddata(p2, counts, (0.1, 0.2, 0.3), (0.0, 0.0, 0.0), vals)
    d2 = load_v3(p2)
    np.testing.assert_array_equal(d2.vals, vals)
    assert d2.derivs is None


def test_read_dx_to_nm_inverts_write(tmp_path):
    from openmmgridforce_tpu.io.gridio import read_dx, write_dx

    rng = np.random.default_rng(6)
    counts = (3, 4, 5)
    vals = rng.standard_normal(60)
    p = str(tmp_path / "g.dx.gz")
    write_dx(p, counts, (0.05, 0.06, 0.07), vals, origin=(0.4, 0.5, 0.6))
    d_file = read_dx(p)                 # file units (Angstrom)
    np.testing.assert_allclose(d_file["spacing"], [0.5, 0.6, 0.7])
    d_nm = read_dx(p, to_nm=True)       # back to nm
    np.testing.assert_allclose(d_nm["spacing"], [0.05, 0.06, 0.07])
    np.testing.assert_allclose(d_nm["origin"], [0.4, 0.5, 0.6])
    np.testing.assert_allclose(d_nm["vals"], vals, rtol=1e-5)


def test_write_grid_tiled_roundtrip(tmp_path):
    """write_grid_tiled (in-memory Grid -> OMGTILE, the reference's
    TiledGridData-save analogue) round-trips values+derivs exactly at
    f32 through both TiledGridReader and grid_from_file."""
    import numpy as np

    from openmmgridforce_tpu.grid import InterpolationMethod, InvPowerMode
    from openmmgridforce_tpu.io import (TiledGridReader, grid_from_file,
                                        write_grid_tiled)
    from openmmgridforce_tpu.ops.gridgen import generate_grid

    rng = np.random.default_rng(23)
    rec = rng.uniform(0.1, 0.9, (10, 3))
    g = generate_grid((9, 8, 11), (0.1, 0.12, 0.09), (0.0,) * 3, "ljr",
                      rec, np.abs(rng.uniform(0.1, 0.5, 10)),
                      np.full(10, 0.3), np.full(10, 0.6),
                      compute_derivatives=True,
                      interp_method=InterpolationMethod.TRICUBIC,
                      inv_power=2.0, inv_power_mode=InvPowerMode.STORED)
    path = str(tmp_path / "rt.tiled")
    write_grid_tiled(path, g, tile_size=4)

    with TiledGridReader(path) as r:
        vals, derivs = r.read_full()
        assert r.inv_power == 2.0
        assert r.inv_power_mode == int(InvPowerMode.STORED)
    np.testing.assert_array_equal(vals,
                                  np.asarray(g.vals, np.float32))
    np.testing.assert_array_equal(
        derivs, np.moveaxis(np.asarray(g.derivs, np.float32), -1, 0))

    g2 = grid_from_file(path,
                        interp_method=InterpolationMethod.TRICUBIC)
    np.testing.assert_array_equal(np.asarray(g2.vals, np.float32),
                                  np.asarray(g.vals, np.float32))
