"""Offline tooling: evaluation, metrics, dataset preparation, benchmarking."""
