from .synthetic import synthetic_batch, SyntheticDataset  # noqa: F401
