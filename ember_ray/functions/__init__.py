"""Scalar / vectorized kernels used inside map_batches stages."""
