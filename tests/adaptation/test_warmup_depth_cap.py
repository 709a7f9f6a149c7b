"""Warmup-only treedepth cap on the auto-metric ensemble path.

With dispersed inits under the identity first-window metric, NUTS grows
pathologically deep trees before the metric is known; the staged engine
caps ``max_num_doublings`` at 5 during warmup ONLY when
``metric="auto"`` and ``n_chains > 1``. Scenario parity target:
``/root/reference/tests/adaptation/test_staged_adaptation.py`` (capped
warmup info, cap absent from returned parameters, non-NUTS kernels
untouched, non-auto paths unchanged).
"""
import jax
import jax.numpy as jnp
import pytest

import blackjax_tpu

D = 8
# ill-conditioned diagonal Gaussian: scales span 1e-2 .. 1
_SCALES = jnp.logspace(-2.0, 0.0, D)


def _logdensity(x):
    return -0.5 * jnp.sum((x / _SCALES) ** 2)


def _run(rng_key, *, metric, n_chains, num_steps=80, **extra):
    kwargs = dict(extra)
    if metric == "auto":
        kwargs["max_grad_budget"] = 40_000
    warmup = blackjax_tpu.staged_adaptation(
        blackjax_tpu.nuts,
        _logdensity,
        metric=metric,
        n_chains=n_chains,
        **kwargs,
    )
    init = 3.0 * jax.random.normal(rng_key, (n_chains, D)) * _SCALES
    return warmup.run(rng_key, init, num_steps=num_steps)


def test_auto_multichain_warmup_trees_are_capped(rng_key):
    """metric='auto' ensemble warmup never integrates past 2^5 - 1 = 31
    leapfrogs per transition, even at the default max_num_doublings=10."""
    _, info = _run(rng_key, metric="auto", n_chains=6)
    assert int(jnp.max(info.info.num_integration_steps)) <= 31


def test_non_auto_multichain_warmup_is_uncapped(rng_key):
    """The cap is auto-metric-only: the plain welford_diag ensemble warmup
    on the same dispersed ill-conditioned start grows past 31 leapfrogs."""
    _, info = _run(rng_key, metric="welford_diag", n_chains=6)
    assert int(jnp.max(info.info.num_integration_steps)) > 31


def test_cap_not_in_returned_parameters(rng_key):
    """The warmup-loop override must not leak: the returned parameters carry
    the user's max_num_doublings for the sampling phase."""
    results, _ = _run(
        rng_key, metric="auto", n_chains=6, num_steps=60, max_num_doublings=8
    )
    assert results.parameters["max_num_doublings"] == 8


def test_user_cap_below_five_wins(rng_key):
    """A user value already below the warmup cap is respected, not raised."""
    _, info = _run(
        rng_key, metric="auto", n_chains=6, num_steps=60, max_num_doublings=3
    )
    assert int(jnp.max(info.info.num_integration_steps)) <= 7


def test_hmc_auto_multichain_no_type_error(rng_key):
    """Kernels without a max_num_doublings kwarg must not have the cap
    injected: HMC under metric='auto' runs cleanly."""
    warmup = blackjax_tpu.staged_adaptation(
        blackjax_tpu.hmc,
        _logdensity,
        metric="auto",
        max_grad_budget=40_000,
        n_chains=6,
        num_integration_steps=8,
    )
    init = jax.random.normal(rng_key, (6, D)) * _SCALES
    results, _ = warmup.run(rng_key, init, num_steps=60)
    assert 0.0 < float(results.parameters["step_size"]) < 100.0
