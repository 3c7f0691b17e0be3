"""Batched numerical primitives: closed-form small-matrix linear algebra,
Gaussian-mixture operations, resampling, and OSPA scoring."""
