"""phdslam_tpu — TPU-native Rao-Blackwellized GM-PHD / CPHD SLAM engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
cheesinglee/cuda-PHDSLAM (reference at /root/reference). Each particle carries
a vehicle pose plus a Gaussian-mixture PHD map over landmarks; the whole SLAM
step (pose prediction, per-particle measurement update with birth terms,
particle weighting, mixture prune/merge, resampling) is one jit-compiled
function over fixed-size padded mixtures, sharded over a TPU device mesh on
the particle axis.

Not a port: the reference's dynamic-shape machinery (thrust stream compaction,
host-side in/out-of-range splits, unbounded greedy merge) is replaced by
masks, top-k selection and bounded `lax.while_loop`s so the whole step stays
on-device under `jit`.
"""

import jax as _jax

# The SLAM math is small-matrix (2x2/4x4) float32 algebra where bf16-lowered
# dot_general (the TPU default for f32 matmuls) introduces ~2^-8 relative
# error — enough to visibly perturb Kalman covariances and merge decisions
# (measured 4.5e-3 absolute on Gaussian log-pdfs). These contractions are
# tiny, so full-f32 precision costs nothing; genuinely hot large matmuls
# (Pallas kernels) set their own preferred_element_type explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from phdslam_tpu.config import SlamConfig, load_config
from phdslam_tpu.filter.state import (SlamState, GaussianMixture,
                                      Gaussian2DMixture)

__version__ = "0.1.0"

__all__ = [
    "SlamConfig",
    "load_config",
    "SlamState",
    "GaussianMixture",
    "Gaussian2DMixture",
]
