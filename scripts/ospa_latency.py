"""On-device latency + accuracy probe for the in-loop OSPA (ospa_jax).

Times the jitted auction-based OSPA on the real TPU at set sizes up to the
reference's measurement cap (M=256, src/phdfilter.cu:120) with host-fetch
sync (block_until_ready is a no-op through the tunnel), and records the
worst metric gap vs the exact JV solution (ospa_np). Writes
results/ospa_latency.json, rendered into RESULTS.md by eval_baselines.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from phdslam_tpu.ops.ospa import ospa_jax, ospa_np  # noqa: E402
from phdslam_tpu.utils import ensure_backend  # noqa: E402


def probe(n_pad: int, n_seeds: int = 8, n_time: int = 20):
    gaps = []
    lat_ms = None
    for seed in range(n_seeds):
        r = np.random.default_rng(seed)
        m_x = int(r.integers(n_pad // 2, n_pad + 1))
        m_y = int(r.integers(n_pad // 2, n_pad + 1))
        x = r.normal(0, 8, (n_pad, 2)).astype(np.float32)
        y = r.normal(0, 8, (n_pad, 2)).astype(np.float32)
        xv = np.arange(n_pad) < m_x
        yv = np.arange(n_pad) < m_y
        args = (jnp.asarray(x), jnp.asarray(xv), jnp.asarray(y),
                jnp.asarray(yv))
        je, jl, jc = ospa_jax(*args, p=1.0, c=5.0)
        ne, nl, nc = ospa_np(x[:m_x], y[:m_y], p=1, c=5)
        gaps.append(abs(float(je) - ne))
        if seed == 0:
            # timed window on the worst-case-shaped first draw
            float(np.asarray(je))  # warm/compile
            t0 = time.time()
            for _ in range(n_time):
                e, _, _ = ospa_jax(*args, p=1.0, c=5.0)
            float(np.asarray(e))   # the only honest sync on the tunnel
            lat_ms = (time.time() - t0) * 1e3 / n_time
    return dict(n=n_pad, ms=round(lat_ms, 3), max_gap=round(max(gaps), 5),
                seeds=n_seeds)


def main():
    ensure_backend()
    print("backend:", jax.default_backend())
    rows = [probe(n) for n in (16, 64, 256)]
    for r in rows:
        print(r)
    out = dict(backend=jax.default_backend(), rows=rows,
               note="jit ospa_jax latency (mean of 20 back-to-back calls, "
                    "host-fetch synced) and worst |ospa_jax - ospa_np| "
                    "over 8 random set pairs, p=1 c=5")
    os.makedirs("results", exist_ok=True)
    with open("results/ospa_latency.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
