from .gridio import (nc_to_v3, read_dx, read_netcdf,  # noqa: F401
                     save_grid_as_dx, write_dx, write_netcdf)
from .omgtile import (TiledGridReader, TiledGridWriter,  # noqa: F401
                      write_grid_tiled)
from .v3 import (GridFileData, load_v3, save_v3,  # noqa: F401
                 save_v3_griddata)


def grid_from_file(path, **grid_kwargs):
    """Load a V3 or OMGTILE grid file into a Grid pytree."""
    from ..grid import Grid

    with open(path, "rb") as fh:
        magic = fh.read(8)
    if magic == b"OMGRID\x00\x00":
        data = load_v3(path)
        return Grid.create(
            data.vals, data.spacing, data.origin, derivs=data.derivs,
            inv_power=data.inv_power, inv_power_mode=data.inv_power_mode,
            grid_type=data.grid_type, **grid_kwargs)
    if magic == b"OMGTILE\x00":
        with TiledGridReader(path) as r:
            vals, derivs = r.read_full()
            return Grid.create(
                vals, r.spacing, r.origin, derivs=derivs,
                inv_power=r.inv_power, inv_power_mode=r.inv_power_mode,
                **grid_kwargs)
    raise ValueError(f"{path}: unrecognized grid file format")
