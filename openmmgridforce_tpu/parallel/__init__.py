from .replicas import (init_replica_states, make_ensemble_runner,  # noqa: F401
                       redraw_hot_velocities, replica_mesh,
                       replica_temperatures, shard_replica_states)
from .sharded_gridgen import generate_grid_sharded  # noqa: F401
from . import distributed  # noqa: F401  (multi-process / DCN scale-out)
