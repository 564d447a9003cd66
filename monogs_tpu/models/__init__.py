from .gaussian_map import GaussianMap, MapHyper, new_map  # noqa: F401
