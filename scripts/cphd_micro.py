"""Micro-probe: CPHD-with-Poisson-prior must confirm features like PHD.

With a Poisson predicted cardinality whose mean equals the intensity mass,
Vo's CPHD reduces exactly to the PHD filter — so a repeatedly-detected
feature's weight must follow the same confirmation trajectory in both
paths. One particle, one feature, one perfectly-aligned measurement per
step, plus optional clutter-like extra measurements. Prints both weight
trajectories side by side; a divergence localizes the CPHD bug.

Run on CPU: PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/cphd_micro.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from phdslam_tpu.config import load_config
from phdslam_tpu.filter import cphd as C
from phdslam_tpu.filter import update as U
from phdslam_tpu.filter.state import Gaussian2DMixture


def run(n_clutter=0, steps=10, w0=0.015):
    cfg = load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=1, maxFeatures=8, maxMeasurements=8,
        filterType=1, maxCardinality=63, gateBirths=False,
        birthWeight=1e-9,  # suppress birth interference
        usePallas=False)
    consts = C.make_constants(cfg)
    pose = jnp.zeros((1, 6), jnp.float32)
    M = cfg.maxMeasurements

    # one feature straight ahead at 5 m, birth-sized covariance
    var_r = (cfg.stdRange * cfg.birthNoiseFactor) ** 2
    var_b = (cfg.stdBearing * cfg.birthNoiseFactor) ** 2

    def fresh_map(w):
        z = jnp.zeros((1, 8), jnp.float32)
        return Gaussian2DMixture(
            w=z.at[0, 0].set(w), mx=z.at[0, 0].set(5.0), my=z,
            c00=z.at[0, 0].set(var_r), c01=z,
            c11=z.at[0, 0].set(25.0 * var_b))

    z_rb = jnp.zeros((M, 2), jnp.float32).at[0, 0].set(5.0)
    # clutter-ish extra measurements far away in bearing
    for i in range(n_clutter):
        z_rb = z_rb.at[1 + i, 0].set(6.0 + i).at[1 + i, 1].set(
            0.5 + 0.1 * i)
    z_valid = jnp.arange(M) < (1 + n_clutter)
    z_label = jnp.zeros((M,), jnp.int32)

    print(f"--- n_extra_meas={n_clutter} "
          f"kappa={cfg.clutterDensity:.3f} lambda_c={cfg.clutterRate} ---")
    print(f"{'step':>4} {'PHD w':>10} {'CPHD w':>10} {'CPHD E[n]':>10}")
    gm_p = fresh_map(w0)
    gm_c = fresh_map(w0)
    ncard = cfg.maxCardinality + 1
    cn = jnp.full((1, ncard), -np.log(ncard), jnp.float32)
    for t in range(steps):
        out_p = U.phd_update_static(pose, gm_p, z_rb, z_label, z_valid,
                                    cfg.replace(filterType=0))
        gm_p = out_p[0] if isinstance(out_p, tuple) else out_p
        gm_c, cn, _ = C.cphd_update(pose, gm_c, cn, z_rb, z_label,
                                    z_valid, cfg, consts)
        pmf = np.exp(np.asarray(cn[0], np.float64))
        pmf /= pmf.sum()
        en = (pmf * np.arange(ncard)).sum()
        wp = float(np.asarray(gm_p.w).max())
        wc = float(np.asarray(gm_c.w).max())
        print(f"{t:4d} {wp:10.4f} {wc:10.4f} {en:10.3f}")


if __name__ == "__main__":
    run(0)
    run(4)
