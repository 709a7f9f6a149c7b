"""Compiled-program cache for the device-resident drivers.

The drivers (:func:`~blackjax_tpu.parallel.eca.run_eca`,
:func:`~blackjax_tpu.parallel.smc.run_adaptive_tempered_smc`) build their
``jax.jit(jax.shard_map(...))`` program from per-call configuration. A
fresh ``jit`` object per call owns a fresh tracing cache, so every call
would re-trace AND re-compile the whole device-resident loop — which for
a 60 ms tempering run is a multi-second overhead on each invocation.
Caching the jitted callable on the static configuration (the same things
``jax.jit`` would treat as static) restores jit's own call-to-call reuse.
"""
import jax

__all__ = ["cached_jit"]

_PROGRAMS: dict = {}


def cached_jit(key, build):
    """Return ``jax.jit(build())``, memoized on the hashable ``key``.

    ``key`` must capture everything ``build`` closes over that changes the
    traced program (functions by identity, meshes, static sizes, pytree
    structures). An unhashable key falls back to an uncached jit — correct,
    just re-traced per call, exactly the pre-cache behavior.
    """
    try:
        fn = _PROGRAMS.get(key)
    except TypeError:
        return jax.jit(build())
    if fn is None:
        fn = jax.jit(build())
        _PROGRAMS[key] = fn
    return fn
