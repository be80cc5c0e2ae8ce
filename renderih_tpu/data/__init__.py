"""Data pipeline: datasets, device-side augmentation, providers."""

from renderih_tpu.data.synthetic import synthetic_batch

__all__ = ["synthetic_batch"]
