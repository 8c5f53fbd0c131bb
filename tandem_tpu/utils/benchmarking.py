"""Honest device timing through remote (tunnel/IFRT-proxy) backends.

The axon tunnel backend runs in a deferred mode until the first host fetch of
any array: block_until_ready returns in ~0.05 ms — far below the network
round trip — so sync-per-iteration timings measure NOTHING. After the first
fetch every sync costs the real tunnel RTT (~26 ms here) while enqueues stay
~0.6 ms. Honest protocol, used by bench.py and docs/PERF.md numbers:

1. ``force_real_timing()``: fetch one jit output so all later syncs are real.
2. ``device_time(fn)``: enqueue K calls back-to-back, sync ONCE; per-call
   device time = (total - one RTT) / K. The device executes enqueued programs
   serially on its single stream, so this is the true per-call device cost
   as long as enqueue overhead < compute (checked via two K values).
"""

from __future__ import annotations

import time

import numpy as np


def force_real_timing():
    """Fetch one jit output so subsequent syncs reflect real round trips.

    Also enables the persistent compilation cache (same directory the
    test conftest uses): the 640x480 cascade costs up to ~25 min to
    compile through the remote backend, so cross-run reuse matters more
    for benches than for anything else. Harmless where the backend
    can't serialize executables — it simply doesn't cache.
    """
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TANDEM_JIT_CACHE",
                                     "/tmp/tandem_tpu_jit_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    y = jax.jit(lambda x: x * 2)(jnp.ones((8,), jnp.float32))
    np.asarray(y)


def measure_rtt(iters: int = 10) -> float:
    """Seconds per (dispatch + sync) of a trivial jit — the tunnel RTT."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2.0)
    x = jax.device_put(np.ones((8,), np.float32))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(f(x))
    return (time.perf_counter() - t0) / iters


def device_time(fn, iters: int = 20, warmup: int = 2) -> float:
    """True per-call device seconds of ``fn()`` (returns jax arrays).

    Enqueues ``iters`` calls without observing results, syncs once on the
    last output; subtracts one measured RTT.
    """
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    rtt = measure_rtt()

    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    total = time.perf_counter() - t0
    return max(total - rtt, 0.0) / iters
