"""Integrator dynamics against closed-form solutions.

The energy/reversibility mechanics live in ``test_integrators.py``; this file
checks the *trajectories* — analytic flows, measured convergence orders, and
the stable ESH momentum-update algebra (behavioral parity targets:
``/root/reference/tests/mcmc/test_integrators.py:191,227,321,352``, re-derived
against the textbook solutions rather than stored endpoints).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import ellipj

from blackjax_tpu.mcmc import integrators, metrics

# All four euclidean schemes are 2nd-order palindromic (the multi-stage ones
# are minimum-norm error-constant optimizations, not higher-order methods —
# same convention as the reference family).
EUCLIDEAN = {
    "velocity_verlet": (integrators.velocity_verlet, 2),
    "mclachlan": (integrators.mclachlan, 2),
    "yoshida": (integrators.yoshida, 2),
    "omelyan": (integrators.omelyan, 2),
}


def _integrate(step, state, h, n):
    return jax.lax.fori_loop(0, n, lambda _, s: step(s, h), state)


# ---------------------------------------------------------------------------
# Analytic flows
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", EUCLIDEAN)
def test_harmonic_oscillator_matches_analytic_flow(name):
    """H = p^2/2 + k q^2/2: q(t) = q0 cos(wt) + p0/w sin(wt), w = sqrt(k)."""
    k = 4.0
    omega = 2.0
    q0, p0 = jnp.array([1.0]), jnp.array([0.5])
    logdensity = lambda q: -0.5 * k * jnp.sum(q**2)
    kinetic = lambda p: 0.5 * jnp.sum(p**2)

    step = EUCLIDEAN[name][0](logdensity, kinetic)
    state = integrators.new_integrator_state(logdensity, q0, p0)
    t, h = 2.0, 0.01
    out = _integrate(step, state, h, int(t / h))

    q_exact = float(q0[0]) * np.cos(omega * t) + float(p0[0]) / omega * np.sin(
        omega * t
    )
    p_exact = -float(q0[0]) * omega * np.sin(omega * t) + float(p0[0]) * np.cos(
        omega * t
    )
    np.testing.assert_allclose(float(out.position[0]), q_exact, atol=1e-3)
    np.testing.assert_allclose(float(out.momentum[0]), p_exact, atol=1e-3)


@pytest.mark.parametrize("name", EUCLIDEAN)
def test_kepler_circular_orbit_closes(name):
    """V(q) = -1/|q| with |q0|=1, tangential |p0|=1 is a circular orbit of
    period 2*pi: the trajectory must return to its start."""
    logdensity = lambda q: 1.0 / jnp.linalg.norm(q)
    kinetic = lambda p: 0.5 * jnp.sum(p**2)
    q0, p0 = jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0])

    step = EUCLIDEAN[name][0](logdensity, kinetic)
    state = integrators.new_integrator_state(logdensity, q0, p0)
    h = 2.0 * np.pi / 2000
    out = _integrate(step, state, h, 2000)
    np.testing.assert_allclose(np.asarray(out.position), np.asarray(q0), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.momentum), np.asarray(p0), atol=5e-3)


@pytest.mark.x64only  # measures asymptotic error ratios down to ~1e-5;
# f32 rounding floors the fine-h errors and corrupts the measured order
def test_measured_convergence_order():
    """Halving h must shrink the endpoint error by ~2^2 for every scheme, and
    the multi-stage schemes must buy a much smaller error CONSTANT per unit
    work than verlet (that is their entire point)."""
    logdensity = lambda q: -0.5 * jnp.sum(q**2)
    kinetic = lambda p: 0.5 * jnp.sum(p**2)
    q0, p0 = jnp.array([1.0]), jnp.array([0.0])
    state = integrators.new_integrator_state(logdensity, q0, p0)

    t = 1.0
    errors_at_01 = {}
    for name, (factory, order) in EUCLIDEAN.items():
        step = factory(logdensity, kinetic)
        errors = []
        for h in (0.1, 0.05, 0.025):
            out = _integrate(step, state, h, int(round(t / h)))
            errors.append(abs(float(out.position[0]) - np.cos(t)))
        measured = np.log2(np.array(errors[:-1]) / np.array(errors[1:]))
        # at least the nominal order; some schemes superconverge (order 4)
        # on quadratic potentials, so only bound from below
        assert np.all(measured > order - 0.5), (name, measured)
        errors_at_01[name] = errors[0]
    # minimum-norm schemes: materially smaller error constant at the same h
    assert errors_at_01["mclachlan"] < 0.5 * errors_at_01["velocity_verlet"]
    assert errors_at_01["omelyan"] < 0.5 * errors_at_01["velocity_verlet"]


def test_nonseparable_implicit_midpoint_closed_form():
    """H = p^2 (1+q^2)/2 - (q^2+1)/2 (Brofos & Lederman test problem): the
    flow from (q0, 0) is q(t) = q0 * cn(t sqrt(1+q0^2), q0^2/(1+q0^2))."""
    neg_potential = lambda q: -0.5 * (q**2 + 1.0)
    kinetic = lambda p, position=None: 0.5 * p**2 * (1.0 + position**2)

    step = integrators.implicit_midpoint(neg_potential, kinetic)
    q0 = jnp.array(-1.0)
    state = integrators.IntegratorState(
        q0, jnp.array(0.0), neg_potential(q0), jax.grad(neg_potential)(q0)
    )

    h, n = 1e-3, 5000

    def body(s, _):
        s = step(s, h)
        return s, s.position

    final, traj = jax.lax.scan(body, state, None, length=n)

    t = h * (1 + np.arange(n))
    m = float(q0**2 / (1 + q0**2))
    _, cn, _, _ = ellipj(t * np.sqrt(1 + float(q0) ** 2), m)
    np.testing.assert_allclose(np.asarray(traj), float(q0) * cn, atol=2e-3)

    e0 = -neg_potential(q0) + kinetic(jnp.array(0.0), position=q0)
    e1 = -neg_potential(final.position) + kinetic(
        final.momentum, position=final.position
    )
    assert abs(float(e1 - e0)) < 1e-4


# ---------------------------------------------------------------------------
# ESH / isokinetic algebra
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dims", [3, 5, 17])
def test_esh_kick_matches_textbook_formula(dims, rng_key):
    """The overflow-free zeta-form momentum update must equal the sinh/cosh
    expression of Robnik et al. (2023) eq. 16."""
    key_g, key_p = jax.random.split(rng_key)
    grad = jax.random.uniform(key_g, (dims,))
    u = jax.random.normal(key_p, (dims,))
    u = u / jnp.linalg.norm(u)
    dt = 1e-3

    gnorm = jnp.linalg.norm(grad)
    e = grad / gnorm
    delta = dt * gnorm / (dims - 1)
    naive = (
        u + e * (jnp.sinh(delta) + jnp.dot(e, u * (jnp.cosh(delta) - 1.0)))
    ) / (jnp.cosh(delta) + jnp.dot(e, u * jnp.sinh(delta)))

    kick, _ = integrators.esh_momentum_kick(1.0)
    stable, dK = kick(u, grad, dt)
    atol = 1e-12 if jax.config.jax_enable_x64 else 1e-6
    np.testing.assert_allclose(np.asarray(stable), np.asarray(naive), atol=atol)
    assert np.isfinite(float(dK))


def test_esh_kick_survives_huge_gradients(rng_key):
    """The zeta form must stay finite where sinh/cosh overflow. The gradient
    magnitude is capped so its NORM is representable (that part is the
    caller's dtype budget); the hyperbolic overflow the kick must survive
    happens far earlier, at delta ~ 90."""
    big = 1e30 if jax.config.jax_enable_x64 else 1e15
    u = jnp.array([0.6, 0.64, 0.48])
    kick, _ = integrators.esh_momentum_kick(1.0)
    new_u, dK = kick(u, big * jnp.array([1.0, -2.0, 0.5]), 1.0)
    assert np.all(np.isfinite(np.asarray(new_u)))
    assert np.isfinite(float(dK))
    atol = 1e-10 if jax.config.jax_enable_x64 else 1e-6
    np.testing.assert_allclose(float(jnp.linalg.norm(new_u)), 1.0, atol=atol)


def test_esh_kick_trivial_lrd_equals_diagonal(rng_key):
    """An LRD metric with U=0, lam=1 must reproduce the diagonal kick
    bit-for-bit (the metric stack's escalation invariant)."""
    d, k = 6, 2
    sigma = jnp.array([1.0, 2.0, 0.5, 1.5, 0.8, 1.2])
    lrd = metrics.LowRankInverseMassMatrix(
        sigma=sigma, U=jnp.zeros((d, k)), lam=jnp.ones(k)
    )
    key_g, key_p = jax.random.split(rng_key)
    grad = jax.random.normal(key_g, (d,))
    u = jax.random.normal(key_p, (d,))
    u = u / jnp.linalg.norm(u)

    kick_diag, fwd_diag = integrators.esh_momentum_kick(sigma**2)
    kick_lrd, fwd_lrd = integrators.esh_momentum_kick(lrd)
    u1, dk1 = kick_diag(u, grad, 0.1)
    u2, dk2 = kick_lrd(u, grad, 0.1)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(float(dk1), float(dk2))
    np.testing.assert_array_equal(np.asarray(fwd_diag(u)), np.asarray(fwd_lrd(u)))


@pytest.mark.parametrize(
    "factory",
    [
        integrators.isokinetic_velocity_verlet,
        integrators.isokinetic_mclachlan,
        integrators.isokinetic_yoshida,
        integrators.isokinetic_omelyan,
    ],
)
def test_isokinetic_energy_balance(factory, rng_key):
    """Over the isokinetic flow, the accumulated kinetic-energy change must
    cancel the logdensity change (the MCLMC energy-error identity)."""
    cov = jnp.array([[1.0, 0.5], [0.5, 2.0]])
    prec = jnp.linalg.inv(cov)
    logdensity = lambda x: -0.5 * x @ prec @ x

    key_q, key_p = jax.random.split(rng_key)
    q0 = jax.random.normal(key_q, (2,))
    p0 = jax.random.normal(key_p, (2,))
    p0 = p0 / jnp.linalg.norm(p0)

    step = factory(logdensity)
    state = integrators.new_integrator_state(logdensity, q0, p0)

    def body(s, _):
        s, dK = step(s, 1e-4)
        return s, dK

    final, dKs = jax.lax.scan(body, state, None, length=15)
    # the MCLMC energy proxy (mclmc.py:115): dE = dK - d(logdensity) per step
    tol = 1e-6 if jax.config.jax_enable_x64 else 2e-4
    potential_change = float(final.logdensity - state.logdensity)
    assert abs(float(dKs.sum()) - potential_change) < tol
