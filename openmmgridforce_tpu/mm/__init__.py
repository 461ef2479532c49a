from .amber import AmberTopology, load_inpcrd, load_prmtop  # noqa: F401
from .integrators import (MDState, initialize_state,  # noqa: F401
                          instantaneous_temperature, kinetic_energy,
                          make_langevin_step, make_respa_langevin_step,
                          make_verlet_step, run_respa_segment,
                          run_segment, run_trajectory)
from .streamed_md import StreamedBatchMD, StreamSet  # noqa: F401
from .system import (GridBinding, System, energy_and_forces,  # noqa: F401
                     grid_energy, make_md_runner, potential_energy,
                     system_from_amber)
