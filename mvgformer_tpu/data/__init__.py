"""Data layer: typed batch pytrees, dataset loaders, synthetic data."""
