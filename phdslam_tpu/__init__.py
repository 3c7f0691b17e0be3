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

from phdslam_tpu.config import SlamConfig, load_config
from phdslam_tpu.filter.state import SlamState, GaussianMixture

__version__ = "0.1.0"

__all__ = [
    "SlamConfig",
    "load_config",
    "SlamState",
    "GaussianMixture",
]
