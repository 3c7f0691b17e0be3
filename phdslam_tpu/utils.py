"""Small runtime utilities."""

from __future__ import annotations

import time


def pallas_opts(cfg):
    """Resolve ``(use_pallas, interpret)`` for the fused TPU kernels.

    ``cfg.pallasInterpret`` forces the Pallas code path in interpret mode
    (pure-XLA emulation) regardless of backend — this is how the virtual
    CPU mesh (multi-chip dryrun/tests) exercises the kernel path that a
    real TPU mesh runs compiled. ``cfg.pallasForce`` keeps the compiled
    kernels on when jitting/AOT-lowering for a TPU mesh from a process
    whose default backend is not a TPU (jax.export cross-platform
    lowering). Otherwise Pallas is used only when the process default
    backend is a TPU."""
    if not cfg.usePallas:
        return False, False
    if cfg.pallasInterpret:
        return True, True
    if cfg.pallasForce:
        return True, False
    import jax

    return jax.default_backend() in ("tpu", "axon"), False


def ensure_backend(retries: int = 5, delay_s: float = 3.0):
    """Initialize the default JAX backend with retries.

    The experimental TPU-tunnel plugin on this machine intermittently fails
    to register (transient RPC hiccup), leaving 'axon' unknown to JAX for
    the process lifetime. Retrying in fresh state is impossible in-process,
    but a plain retry of device initialization covers the common transient
    case; as a last resort fall back to the CPU backend so batch jobs
    degrade instead of dying.
    """
    import jax

    last = None
    for _ in range(retries):
        try:
            return jax.devices()
        except RuntimeError as e:  # backend init failure
            last = e
            time.sleep(delay_s)
    try:
        jax.config.update("jax_platforms", "cpu")
        devs = jax.devices()
        print(f"warning: default backend unavailable ({last}); "
              "falling back to CPU")
        return devs
    except RuntimeError:
        raise last


def tpu_expected() -> bool:
    """True when this machine is configured with the TPU tunnel plugin
    (its site dir is on PYTHONPATH or exists at the canonical location).
    Benchmark scripts use this to skip the re-exec retry loop entirely on
    machines that never had a TPU, instead of sleeping through every
    attempt before accepting the CPU fallback."""
    import os

    if os.environ.get("BENCH_EXPECT_TPU") in ("0", "false", "no"):
        return False
    if os.environ.get("BENCH_EXPECT_TPU"):
        return True
    site = "/root/.axon_site"
    in_path = any(p and "axon" in p
                  for p in os.environ.get("PYTHONPATH", "").split(":"))
    return in_path or os.path.isdir(site)


def tpu_reexec_retry(max_tries: int = 12, delay_s: float = 50.0):
    """Bounded fresh-process retry when the default backend is not a TPU.

    The experimental tunnel's registration is per-process and flaps for
    long stretches; a fresh process is the only retry that works. No-op
    (returns immediately) when the machine has no tunnel configured
    (`tpu_expected()` false) or the retry budget is exhausted."""
    import os
    import sys

    import jax

    if jax.default_backend() in ("tpu", "axon"):
        return
    if not tpu_expected():
        return
    tries = int(os.environ.get("BENCH_TPU_RETRIES", str(max_tries)))
    if tries <= 0:
        return
    print(f"tpu backend unavailable; re-exec retry "
          f"({tries} attempts left)", file=sys.stderr)
    time.sleep(delay_s)
    env = dict(os.environ, BENCH_TPU_RETRIES=str(tries - 1))
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
