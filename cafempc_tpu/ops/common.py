"""Shared helpers for the fused Pallas kernels."""
import jax


def _interpret():
    """Pallas interpret mode on non-TPU backends (CPU test path)."""
    return jax.default_backend() != "tpu"
