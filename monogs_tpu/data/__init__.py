from .synthetic import SyntheticDataset, make_synthetic_scene  # noqa: F401
