"""Merge-kernel tuning harness: times greedy_merge_pallas variants
(tile_p, block, vmem limit) on the realistic dense pool saved by
scripts/merge_profile.py (/tmp/dense_pool.npz).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/merge_tune.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from phdslam_tpu.utils import ensure_backend

ensure_backend()


def main():
    from phdslam_tpu.kernels.merge_pallas import greedy_merge_pallas
    from phdslam_tpu.ops.gm import fast_prune_renormalize

    d = np.load("/tmp/dense_pool.npz")
    F = int(d["F"])
    minsep = float(d["minsep"])
    chans = [jnp.asarray(d[k]) for k in ("w", "mx", "my", "c00", "c01",
                                         "c11")]
    fastw = jax.block_until_ready(
        fast_prune_renormalize(chans[0], float(d["mergeMinW"])))
    print(f"pool {chans[0].shape} -> {F}, minsep {minsep}")

    ref = {}
    for tile_p, block in ((128, 0), (128, 16), (128, 32), (256, 0),
                          (256, 16), (512, 0), (512, 16), (512, 32),
                          (1024, 16)):
        for label, w in (("exact", chans[0]), ("fast", fastw)):
            fn = jax.jit(lambda w, a, b, c, dd, e, tp=tile_p, bl=block:
                         greedy_merge_pallas(w, a, b, c, dd, e, minsep, F,
                                             tile_p=tp, block=bl))
            try:
                out = fn(w, *chans[1:])
                _ = np.asarray(out[0][:2, :2])
            except Exception as e:
                print(f"tile_p={tile_p} block={block} {label}: FAILED "
                      f"{type(e).__name__} {str(e)[:160]}", flush=True)
                continue
            t0 = time.time()
            for _ in range(5):
                out = fn(w, *chans[1:])
            _ = np.asarray(out[0][:2, :2])
            ms = (time.time() - t0) / 5 * 1000
            ow = np.asarray(out[0])
            ref.setdefault(label, ow)
            dev = np.abs(ow - ref[label]).max()
            print(f"tile_p={tile_p:4d} block={block:2d} {label}: "
                  f"{ms:8.2f} ms  clusters mean "
                  f"{(ow > 0).sum(1).mean():.0f}  "
                  f"max|dev vs base| {dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
