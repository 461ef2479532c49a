from .replicas import (init_replica_states, make_ensemble_runner,  # noqa: F401
                       replica_mesh, shard_replica_states)
from .sharded_gridgen import generate_grid_sharded  # noqa: F401
from . import distributed  # noqa: F401  (multi-process / DCN scale-out)
