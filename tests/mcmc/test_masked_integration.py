"""Masked fixed-trip integration loops for drawn-length kernels.

With per-chain drawn step counts under vmap, a traced-bound ``fori_loop``
lowers to an unpipelined while loop (measured 15x slower than a static loop
at 4096 chains on v5e). ``max_integration_steps`` switches to a
statically-bounded masked loop — these tests pin the contract: bit-identical
states to the traced-bound path (frozen steps change nothing, including the
key stream)."""
import jax
import jax.numpy as jnp
import numpy as np

from blackjax_tpu.mcmc import adjusted_mclmc_dynamic as amd
from blackjax_tpu.mcmc import dynamic_hmc as dh

D, C = 6, 12
LOGDENSITY = lambda x: -0.5 * jnp.sum(x**2 / (1 + jnp.arange(D)))


def _leaves(tree):
    return [
        jax.random.key_data(l)
        if jnp.issubdtype(l.dtype, jax.dtypes.prng_key)
        else l
        for l in jax.tree.leaves(tree)
    ]


def _assert_trees_equal(a, b):
    for x, y in zip(_leaves(a), _leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_masked_adjusted_mclmc_dynamic_bit_identical(rng_key):
    pos = 0.3 * jax.random.normal(rng_key, (C, D))
    keys = jax.random.split(jax.random.fold_in(rng_key, 1), C)
    init_keys = jax.random.split(jax.random.fold_in(rng_key, 2), C)
    states = jax.vmap(lambda p, k: amd.init(p, LOGDENSITY, k))(pos, init_keys)

    plain = amd.build_kernel()
    masked = amd.build_kernel(max_integration_steps=9)
    run = lambda k: jax.jit(
        jax.vmap(lambda kk, ss: k(kk, ss, LOGDENSITY, 0.1, 10.0, jnp.ones(D)))
    )(keys, states)
    s1, i1 = run(plain)
    s2, i2 = run(masked)
    _assert_trees_equal(s1, s2)
    np.testing.assert_array_equal(
        np.asarray(i1.acceptance_rate), np.asarray(i2.acceptance_rate)
    )


def test_masked_dynamic_hmc_bit_identical(rng_key):
    pos = 0.3 * jax.random.normal(rng_key, (C, D))
    keys = jax.random.split(jax.random.fold_in(rng_key, 1), C)
    init_keys = jax.random.split(jax.random.fold_in(rng_key, 2), C)
    states = jax.vmap(lambda p, k: dh.init(p, LOGDENSITY, k))(pos, init_keys)

    plain = dh.build_kernel()
    masked = dh.build_kernel(max_integration_steps=9)
    run = lambda k: jax.jit(
        jax.vmap(lambda kk, ss: k(kk, ss, LOGDENSITY, 0.2, jnp.ones(D)))
    )(keys, states)
    s1, _ = run(plain)
    s2, _ = run(masked)
    _assert_trees_equal(s1, s2)
