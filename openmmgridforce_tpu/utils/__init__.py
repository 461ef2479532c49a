from .cache import enable_compilation_cache  # noqa: F401
from .checkpoint import (load_pytree, load_sampler, save_pytree,  # noqa: F401
                         save_sampler)
from .observe import (StateDataReporter, Timer, capture_trace,  # noqa: F401
                      trace, write_xyz_frame)
