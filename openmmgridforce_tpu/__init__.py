"""openmmgridforce_tpu: a TPU-native grid-force molecular dynamics engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`openmmgridforce` OpenMM plugin (grid-based implicit-receptor potentials for
docking and BPMF-style free-energy sampling): grid generation with analytic
derivatives, four interpolation orders with analytic forces, intra-ligand
nonbonded forces, Langevin MD with vmapped replicas, replica-exchange +
genetic Monte Carlo sampling, and the reference's grid file formats.
"""

from .utils import enable_compilation_cache  # noqa: F401

enable_compilation_cache()

from .grid import Grid, InterpolationMethod, InvPowerMode  # noqa: E402,F401
from .ops import GridEval, evaluate_grid, grid_energy  # noqa: E402,F401

__version__ = "0.1.0"
