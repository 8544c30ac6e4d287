"""Scalar/geometry/image/text function kernels (NumPy, Arrow-batched)."""
