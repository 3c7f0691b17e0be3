"""Small runtime utilities."""

from __future__ import annotations

import time


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
