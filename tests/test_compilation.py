"""The logdensity function must trace a bounded number of times — JIT
compilation dominates wall time in many settings, and internal refactors
must not silently trigger retraces.

Parity model: reference ``tests/test_compilation.py`` (chex
``assert_max_traces`` pinned at 2 for init+kernel, 3 when a warmup kernel is
also built).
"""
import chex
import jax
import jax.numpy as jnp
import jax.scipy as jscipy

import blackjax_tpu
from blackjax_tpu.mcmc.hmc import multinomial_hmc_proposal


def _run_steps(step, state, rng_key, n=10):
    for i in range(n):
        state, _ = step(jax.random.fold_in(rng_key, i), state)
    return state


def test_hmc_traces_twice():
    """init traces once, the jitted kernel once more."""

    @chex.assert_max_traces(n=2)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x)

    chex.clear_trace_counter()
    state = blackjax_tpu.hmc.init(1.0, logdensity_fn)
    kernel = blackjax_tpu.hmc(
        logdensity_fn,
        step_size=1e-2,
        inverse_mass_matrix=jnp.array([1.0]),
        num_integration_steps=10,
    )
    _run_steps(jax.jit(kernel.step), state, jax.random.key(0))


def test_nuts_traces_four_times():
    """NUTS pins at 4: once in init, plus THREE static instantiations
    inside one kernel compile — the leaf-pair engine intentionally inlines
    the leaf body for the standalone first leaf and the two pair halves
    (graph size x3 for the integrator portion, zero extra runtime, and it
    is what buys the 1.5x pair speedup). The invariant guarded here is
    that repeated jitted steps cause NO FURTHER traces."""

    @chex.assert_max_traces(n=4)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x)

    chex.clear_trace_counter()
    state = blackjax_tpu.nuts.init(1.0, logdensity_fn)
    kernel = blackjax_tpu.nuts(
        logdensity_fn, step_size=1e-2, inverse_mass_matrix=jnp.array([1.0])
    )
    _run_steps(jax.jit(kernel.step), state, jax.random.key(0))


def test_multinomial_hmc_traces_twice():
    @chex.assert_max_traces(n=2)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x)

    chex.clear_trace_counter()
    state = blackjax_tpu.hmc.init(1.0, logdensity_fn)
    kernel = blackjax_tpu.hmc(
        logdensity_fn,
        step_size=1e-2,
        inverse_mass_matrix=jnp.array([1.0]),
        num_integration_steps=10,
        build_proposal=multinomial_hmc_proposal,
    )
    _run_steps(jax.jit(kernel.step), state, jax.random.key(0))


def test_hmc_warmup_traces_three_times():
    """init + warmup kernel + post-warmup sampling kernel."""

    @chex.assert_max_traces(n=3)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x)

    chex.clear_trace_counter()
    rng_key = jax.random.key(0)
    warmup = blackjax_tpu.window_adaptation(
        blackjax_tpu.hmc,
        logdensity_fn,
        target_acceptance_rate=0.8,
        num_integration_steps=10,
    )
    (state, parameters), _ = warmup.run(rng_key, 1.0, num_steps=100)
    step = jax.jit(blackjax_tpu.hmc(logdensity_fn, **parameters).step)
    _run_steps(step, state, rng_key)


def test_nuts_warmup_traces_seven_times():
    """init (1) + warmup kernel (3 pair-engine instantiations) + post-warmup
    kernel (3). Repeated steps add none."""

    @chex.assert_max_traces(n=7)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x)

    chex.clear_trace_counter()
    rng_key = jax.random.key(0)
    warmup = blackjax_tpu.window_adaptation(
        blackjax_tpu.nuts, logdensity_fn, target_acceptance_rate=0.8
    )
    (state, parameters), _ = warmup.run(rng_key, 1.0, num_steps=100)
    step = jax.jit(blackjax_tpu.nuts(logdensity_fn, **parameters).step)
    _run_steps(step, state, rng_key)


def test_mala_traces_twice():
    @chex.assert_max_traces(n=2)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x)

    chex.clear_trace_counter()
    algo = blackjax_tpu.mala(logdensity_fn, step_size=1e-2)
    state = algo.init(1.0)
    _run_steps(jax.jit(algo.step), state, jax.random.key(0))


def test_barker_traces_twice():
    @chex.assert_max_traces(n=2)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x)

    chex.clear_trace_counter()
    algo = blackjax_tpu.barker_proposal(logdensity_fn, step_size=1e-1)
    state = algo.init(1.0)
    _run_steps(jax.jit(algo.step), state, jax.random.key(0))


def test_mclmc_traces_three_times():
    """init (1) + two static instantiations inside the one kernel compile
    (the isokinetic integrator's position update and the final logdensity
    re-evaluation). Repeated jitted steps add none."""

    @chex.assert_max_traces(n=3)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x).sum()

    chex.clear_trace_counter()
    algo = blackjax_tpu.mclmc(logdensity_fn, L=1.0, step_size=0.1)
    state = algo.init(jnp.ones(2), jax.random.key(1))
    _run_steps(jax.jit(algo.step), state, jax.random.key(0))


def test_vmapped_chains_do_not_add_traces():
    """vmapping the kernel over a chain block must reuse the single trace
    of the jitted step (one batched trace, then cached)."""

    @chex.assert_max_traces(n=2)
    def logdensity_fn(x):
        return jscipy.stats.norm.logpdf(x).sum()

    chex.clear_trace_counter()
    algo = blackjax_tpu.mala(logdensity_fn, step_size=1e-2)
    states = jax.vmap(algo.init)(jnp.ones((8, 2)))
    step = jax.jit(jax.vmap(algo.step))
    for i in range(10):
        keys = jax.random.split(jax.random.fold_in(jax.random.key(0), i), 8)
        states, _ = step(keys, states)
