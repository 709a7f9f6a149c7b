"""Fused (VMEM-resident) MCLMC kernel: exact deterministic parity with the
XLA isokinetic integrator, refresh statistics, and the fused-HMC registry
adapter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import integrators
from blackjax_tpu.ops.fused_leapfrog import (
    make_gaussian_target,
    make_hierarchical_gaussian_target,
)
from blackjax_tpu.ops.fused_mclmc import fused_mclmc


def test_deterministic_parity_with_xla_integrator():
    """refresh=False (L = inf) is deterministic: the kernel must reproduce
    the XLA isokinetic-mclachlan trajectory to f32 rounding."""
    d, C, S = 100, 8, 5
    target = make_hierarchical_gaussian_target(d)
    x0 = 0.3 * jax.random.normal(jax.random.key(0), (C, d), jnp.float32)
    m0 = jax.random.normal(jax.random.key(1), (C, d), jnp.float32)
    m0 = m0 / jnp.linalg.norm(m0, axis=1, keepdims=True)

    step = integrators.isokinetic_mclachlan(target.logdensity_fn, 1.0)

    def chain(x, m):
        st = integrators.IntegratorState(
            x, m, target.logdensity_fn(x), jax.grad(target.logdensity_fn)(x)
        )
        for _ in range(S):
            st, _ = step(st, jnp.float32(0.05))
        return st.position, st.momentum, st.logdensity

    xr, mr, lr = jax.vmap(chain)(x0, m0)
    xf, mf, lf, hist = fused_mclmc(
        x0, m0, jnp.ones(d), 0.05, 1.0,
        target=target, num_steps=S, refresh=False, track_dims=(0, 1),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xr, np.float32), atol=3e-6)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mr, np.float32), atol=3e-6)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr, np.float32), atol=2e-4)
    # tracked history's last row is the final state
    np.testing.assert_allclose(
        np.asarray(hist[:, -1, 0]), np.asarray(xf[:, 0]), rtol=0
    )
    assert hist.shape == (C, S, 2)


@pytest.mark.slow
def test_refresh_preserves_unit_momentum_and_samples():
    """With the O-U refresh on, momenta stay unit-norm and a long run keeps
    the chains finite and roughly on the target scale."""
    d, C, S = 16, 64, 300
    variances = jnp.linspace(0.5, 2.0, d)
    target = make_gaussian_target(d, variances)
    x0 = jax.random.normal(jax.random.key(0), (C, d), jnp.float32) * jnp.sqrt(
        variances
    )
    m0 = jax.random.normal(jax.random.key(1), (C, d), jnp.float32)
    m0 = m0 / jnp.linalg.norm(m0, axis=1, keepdims=True)

    xf, mf, lf, hist = fused_mclmc(
        x0, m0, variances, 0.2, 2.0,
        target=target, num_steps=S, track_dims=(0, d - 1), seed=3,
        interpret=True,
    )
    norms = np.linalg.norm(np.asarray(mf), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(xf)))
    # pooled over chains + the second half of the trajectory, the sampled
    # variance lands near the target variance for both tracked dims
    tail = np.asarray(hist[:, S // 2 :, :])
    v0 = tail[..., 0].var()
    v1 = tail[..., 1].var()
    assert 0.2 < v0 / float(variances[0]) < 2.5
    assert 0.2 < v1 / float(variances[-1]) < 2.5


def test_fused_hmc_registry_adapter():
    """blackjax_tpu.fused_hmc follows the SamplingAlgorithm protocol."""
    d = 4
    t = make_gaussian_target(d, jnp.array([1.0, 2.0, 0.5, 1.5]))
    algo = blackjax_tpu.fused_hmc(
        t, step_size=0.3, inverse_mass_matrix=jnp.ones(d),
        num_integration_steps=8, interpret=True,
    )
    state = algo.init(0.1 * jax.random.normal(jax.random.key(0), (16, d)))
    new_state, info = algo.step(jax.random.key(1), state)
    assert new_state.positions.shape == (16, d)
    assert np.all(np.asarray(info.acceptance_rate) >= 0)
    # build_kernel / init module surface (registry contract)
    from importlib import import_module

    mod = import_module("blackjax_tpu.ops.fused_hmc")
    st = mod.init(jnp.zeros((4, d)), t)
    kern = mod.build_kernel(interpret=True)
    st2, _ = kern(jax.random.key(2), st, t, 0.3, jnp.ones(d), 4)
    assert st2.positions.shape == (4, d)
