"""Pytree positions through the sampling stack: the API accepts pytrees and
ravels internally at the boundary (SURVEY.md §7.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu


def _logdensity(tree):
    return (
        -0.5 * jnp.sum(tree["coefs"] ** 2 / jnp.array([1.0, 4.0]))
        - 0.5 * tree["scale"] ** 2 / 0.25
    )


_POSITION = {"coefs": jnp.zeros(2), "scale": jnp.asarray(0.0)}


@pytest.mark.parametrize("name", ["nuts", "hmc", "mala"])
def test_pytree_position_sampling(name, rng_key):
    kwargs = {
        "nuts": dict(step_size=0.4, inverse_mass_matrix=jnp.ones(3)),
        # mass matrix ~ target scales so the fixed trajectory cannot resonate
        "hmc": dict(
            step_size=0.3,
            inverse_mass_matrix=jnp.array([1.0, 4.0, 0.25]),
            num_integration_steps=10,
        ),
        "mala": dict(step_size=0.15),
    }[name]
    algo = getattr(blackjax_tpu, name)(_logdensity, **kwargs)
    # 4 chains: a single correlated chain's variance estimator has ~40% MC
    # error at this length — pooling keeps the check sharp AND stable across
    # the daily seed rotation
    n_chains = 4
    states0 = jax.vmap(algo.init)(
        jax.tree.map(lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), _POSITION)
    )
    run = jax.vmap(
        lambda key, st: blackjax_tpu.util.run_inference_algorithm(
            key, algo, 3000, initial_state=st
        )[1][0]
    )
    states = run(jax.random.split(rng_key, n_chains), states0)
    coefs = np.asarray(states.position["coefs"][:, 500:]).reshape(-1, 2)
    scale = np.asarray(states.position["scale"][:, 500:]).reshape(-1)
    np.testing.assert_allclose(coefs.var(0), [1.0, 4.0], rtol=0.35)
    np.testing.assert_allclose(scale.var(), 0.25, rtol=0.35)
    np.testing.assert_allclose(coefs.mean(0), 0.0, atol=0.4)


def test_pytree_position_window_adaptation(rng_key):
    warmup = blackjax_tpu.window_adaptation(blackjax_tpu.nuts, _logdensity)
    (state, params), _ = warmup.run(rng_key, _POSITION, num_steps=300)
    imm = np.asarray(params["inverse_mass_matrix"])
    assert imm.shape == (3,)
    # ravel order: coefs then scale
    np.testing.assert_allclose(imm, [1.0, 4.0, 0.25], rtol=0.6)
    assert set(state.position) == {"coefs", "scale"}
