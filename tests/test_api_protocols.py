"""Every public sampler's top-level API must conform to the declared
protocols: ``init(position[, rng_key]) -> State`` and
``step(rng_key, state) -> (State, Info)``.

Parity model: reference ``tests/test_api_protocols.py`` (factory-driven
parametrization over the registered algorithms :38-175, protocol shape
assertions :176-232).
"""
import inspect

import jax
import jax.numpy as jnp
import pytest

import blackjax_tpu
from blackjax_tpu.base import SamplingAlgorithm

_DIM = 2
_POSITION = jnp.ones(_DIM)


def _logdensity(x):
    return -0.5 * jnp.sum(x**2)


def _make_algorithm(name):
    cov = jnp.eye(_DIM)
    inv_mass = jnp.ones(_DIM)
    b = blackjax_tpu

    factories = {
        "hmc": lambda: b.hmc(
            _logdensity, step_size=0.1, inverse_mass_matrix=inv_mass,
            num_integration_steps=10,
        ),
        "nuts": lambda: b.nuts(
            _logdensity, step_size=0.1, inverse_mass_matrix=inv_mass
        ),
        "mala": lambda: b.mala(_logdensity, step_size=0.1),
        "mclmc": lambda: b.mclmc(_logdensity, L=1.0, step_size=0.1),
        "adjusted_mclmc": lambda: b.adjusted_mclmc(
            _logdensity, step_size=0.1, inverse_mass_matrix=inv_mass,
            num_integration_steps=10,
        ),
        "adjusted_mclmc_dynamic": lambda: b.adjusted_mclmc_dynamic(
            _logdensity, step_size=0.1, inverse_mass_matrix=inv_mass
        ),
        "barker": lambda: b.barker(_logdensity, step_size=0.1),
        "dhmc": lambda: b.dhmc(
            _logdensity, step_size=0.1, inverse_mass_matrix=inv_mass
        ),
        "mhmc": lambda: b.mhmc(
            _logdensity, step_size=0.1, inverse_mass_matrix=inv_mass,
            num_integration_steps=10,
        ),
        "dmhmc": lambda: b.dmhmc(
            _logdensity, step_size=0.1, inverse_mass_matrix=inv_mass
        ),
        "rmhmc": lambda: b.rmhmc(
            _logdensity, step_size=0.1, mass_matrix=cov, num_integration_steps=10
        ),
        "ghmc": lambda: b.ghmc(
            _logdensity, step_size=0.1, momentum_inverse_scale=inv_mass,
            alpha=0.5, delta=0.5,
        ),
        "elliptical_slice": lambda: b.elliptical_slice(
            _logdensity, mean=jnp.zeros(_DIM), cov=cov
        ),
        "additive_step_random_walk": lambda: (
            b.additive_step_random_walk.normal_random_walk(
                _logdensity, sigma=0.1 * cov
            )
        ),
        "rmh": lambda: b.rmh(
            _logdensity,
            proposal_generator=lambda key, x: x
            + 0.1 * jax.random.normal(key, x.shape),
        ),
        "irmh": lambda: b.irmh(
            _logdensity,
            proposal_distribution=lambda key: jax.random.normal(key, (_DIM,)),
        ),
        "slice_sampling": lambda: b.slice_sampling(_logdensity),
        "coordinate_slice": lambda: b.coordinate_slice(_logdensity, max_expansions=5),
        "gist_step_size": lambda: b.gist_step_size(
            _logdensity, inverse_mass_matrix=inv_mass, initial_step_size=0.1
        ),
        "gist_trajectory_length": lambda: b.gist_trajectory_length(
            _logdensity, inverse_mass_matrix=inv_mass, step_size=0.1
        ),
        "orbital_hmc": lambda: b.orbital_hmc(
            _logdensity, step_size=0.1, inverse_mass_matrix=inv_mass, period=5
        ),
    }
    if name not in factories:
        return None
    return factories[name]()


_NEEDS_RNG_KEY = {"mclmc", "ghmc", "adjusted_mclmc_dynamic", "dhmc", "dmhmc"}

_MCMC_ALGORITHMS = [
    "hmc",
    "nuts",
    "mala",
    "mclmc",
    "adjusted_mclmc",
    "adjusted_mclmc_dynamic",
    "barker",
    "dhmc",
    "mhmc",
    "dmhmc",
    "rmhmc",
    "ghmc",
    "elliptical_slice",
    "additive_step_random_walk",
    "rmh",
    "irmh",
    "slice_sampling",
    "coordinate_slice",
    "gist_step_size",
    "gist_trajectory_length",
    "orbital_hmc",
]


@pytest.mark.parametrize("name", _MCMC_ALGORITHMS)
class TestSamplingAlgorithmProtocol:
    def test_returns_sampling_algorithm(self, name):
        alg = _make_algorithm(name)
        assert isinstance(
            alg, SamplingAlgorithm
        ), f"{name} factory did not return a SamplingAlgorithm"

    def test_init_step_roundtrip(self, name):
        alg = _make_algorithm(name)
        init_key, step_key = jax.random.split(jax.random.key(0))
        if name in _NEEDS_RNG_KEY:
            state = alg.init(_POSITION, init_key)
        else:
            state = alg.init(_POSITION)
        new_state, info = alg.step(step_key, state)
        assert new_state is not None
        assert info is not None

    def test_step_is_jittable(self, name):
        alg = _make_algorithm(name)
        init_key, step_key = jax.random.split(jax.random.key(1))
        if name in _NEEDS_RNG_KEY:
            state = alg.init(_POSITION, init_key)
        else:
            state = alg.init(_POSITION)
        new_state, _ = jax.jit(alg.step)(step_key, state)
        jax.block_until_ready(jax.tree.leaves(new_state)[0])

    def test_init_fn_first_param_is_position(self, name):
        alg = _make_algorithm(name)
        params = list(inspect.signature(alg.init).parameters)
        assert params and params[0] == "position", (
            f"{name}.init first param is {params[:1]}, expected 'position'"
        )

    def test_step_fn_first_two_params(self, name):
        alg = _make_algorithm(name)
        params = list(inspect.signature(alg.step).parameters)
        assert len(params) >= 2, f"{name}.step has fewer than 2 parameters"
        assert params[0] == "rng_key", (
            f"{name}.step first param is '{params[0]}', expected 'rng_key'"
        )
        assert params[1] == "state", (
            f"{name}.step second param is '{params[1]}', expected 'state'"
        )


def test_rng_requiring_init_raises_clearly():
    """Algorithms whose init draws randomness (ghmc, mclmc, dynamic_hmc...)
    must fail with a clear message when called without an rng_key, not crash
    downstream with a cryptic PRNG type error."""
    import pytest

    import blackjax_tpu

    algo = blackjax_tpu.dynamic_hmc(
        lambda x: -0.5 * jnp.sum(x**2), step_size=0.4,
        inverse_mass_matrix=jnp.ones(2),
    )
    with pytest.raises(ValueError, match="rng_key"):
        algo.init(jnp.zeros(2))
    # with a key it constructs and steps
    state = algo.init(jnp.zeros(2), jax.random.key(0))
    state, info = algo.step(jax.random.key(1), state)
    assert jnp.isfinite(state.logdensity)
