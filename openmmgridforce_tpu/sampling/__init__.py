from .bat import bat_to_xyz, build_zmatrix, xyz_to_bat  # noqa: F401
from .sampler import Sampler, SamplerConfig, temperature_ladder  # noqa: F401
