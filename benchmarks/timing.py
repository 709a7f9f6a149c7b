"""Axon-safe timing shared by ``bench.py`` and ``benchmarks/``.

Two measured device-runtime hazards (ARCHITECTURE "Measurement hazard"):

1. **Result caching** — the runtime returns a repeated identical dispatch
   in ~0 ms without executing. Every timed call must use DISTINCT inputs
   (a fresh PRNG key or init draw: statistically identical workloads).
2. **Early return** — ``jax.block_until_ready`` on a raw remote output can
   return BEFORE execution completes (measured 2026-08-19: 0.2 ms return
   on a 187 ms kernel, non-deterministically — sometimes it does wait).
   Best-of-N over such timings selects exactly the artifact runs. The only
   reliable completion signal is pulling an ON-DEVICE REDUCTION of every
   output to the host.

So: the timed callable must return a small array whose value depends on
every output of the workload (see :func:`checksum`); :func:`timeit_pull`
times the host pull of that array and subtracts the measured fixed pull
cost (dispatch + tunnel round-trip, ~10-40 ms on axon).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def checksum(tree) -> jnp.ndarray:
    """f32 scalar depending on every array leaf (keeps the whole workload
    live inside the timed jit; NaN/inf in the value is fine — only the
    data dependency matters)."""
    total = jnp.zeros((), jnp.float32)
    for leaf in jax.tree.leaves(tree):
        arr = jnp.asarray(leaf)
        if arr.dtype == jnp.bool_:
            arr = arr.astype(jnp.float32)
        total = total + jnp.sum(arr).astype(jnp.float32)
    return total


_OVERHEAD = [None]


def pull_overhead() -> float:
    """Median fixed cost of one timed pull (trivial jitted reduction with
    distinct inputs), measured once per process."""
    if _OVERHEAD[0] is None:
        fn = jax.jit(jnp.sum)
        xs = [jnp.full((8,), float(i)) for i in range(8)]
        float(fn(xs[0]))  # compile
        samples = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            float(fn(x))
            samples.append(time.perf_counter() - t0)
        _OVERHEAD[0] = float(np.median(samples))
    return _OVERHEAD[0]


def timeit_pull(fn, variants):
    """Time ``fn`` (a jitted callable returning a scalar or small 1-D f32
    array that checksums its real workload): warm/compile on
    ``variants[0]``, then best-of-the-rest wall time of the host pull,
    minus the measured fixed pull cost.

    Returns ``(elapsed_seconds, values)`` where ``values`` is the pulled
    np.ndarray of the best-timed variant.
    """
    np.asarray(fn(*variants[0]))  # compile + warm
    best, best_vals = float("inf"), None
    for args in variants[1:]:
        t0 = time.perf_counter()
        vals = np.asarray(fn(*args))
        elapsed = time.perf_counter() - t0
        if elapsed < best:
            best, best_vals = elapsed, vals
    return max(best - pull_overhead(), 1e-9), best_vals
