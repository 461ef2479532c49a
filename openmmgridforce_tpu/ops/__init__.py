from .interpolate import GridEval, evaluate_grid, grid_energy  # noqa: F401
