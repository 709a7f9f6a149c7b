"""Symplectic and isokinetic integrators for Hamiltonian-family dynamics.

Behavioral parity target: ``blackjax/mcmc/integrators.py`` (reference;
coefficient schemes at :321-369, ESH dynamics at :378-435, implicit midpoint
at :656). Built from scratch, TPU-first:

- each integrator is one pure function ``(state, step_size) -> state`` whose
  stage loop is *unrolled at trace time* (the coefficient list is static), so
  XLA sees a straight-line fused program per step — no Python control flow
  survives tracing;
- the velocity (gradient of the kinetic energy) is computed inside the drift
  stage, so palindromic schemes that end in a momentum kick never evaluate an
  unused velocity — the same short-circuit the reference implements by hand;
- everything is ``vmap``-transparent over a leading chain axis, which is how
  the chain-blocked ``(C, d)`` TPU layout consumes these.

A scheme is a flat list of coefficients ``[b1, a1, b2, ...]`` alternating
momentum kicks (even slots, scaled gradient updates) and position drifts (odd
slots, scaled velocity updates). All schemes are palindromic, hence symplectic
and reversible.
"""
from typing import Any, Callable, NamedTuple, TypeAlias

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.types import ArrayTree

__all__ = [
    "IntegratorState",
    "new_integrator_state",
    "velocity_verlet",
    "mclachlan",
    "yoshida",
    "omelyan",
    "isokinetic_velocity_verlet",
    "isokinetic_mclachlan",
    "isokinetic_yoshida",
    "isokinetic_omelyan",
    "partially_refresh_momentum",
    "with_isokinetic_maruyama",
    "implicit_midpoint",
    "solve_fixed_point_iteration",
    "generate_euclidean_integrator",
    "generate_isokinetic_integrator",
]


class IntegratorState(NamedTuple):
    """Point in phase space, carrying the cached logdensity and its gradient
    so one gradient evaluation per accepted stage suffices."""

    position: ArrayTree
    momentum: ArrayTree
    logdensity: Any
    logdensity_grad: ArrayTree


Integrator: TypeAlias = Callable[[IntegratorState, float], IntegratorState]


def _axpy(tree, update, scale):
    """tree + scale * update, leafwise."""
    return jax.tree.map(lambda x, u: x + scale * u, tree, update)


def new_integrator_state(logdensity_fn, position, momentum) -> IntegratorState:
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return IntegratorState(position, momentum, logdensity, logdensity_grad)


# ------------------------------------------------------------------------
# Coefficient schemes (palindromic: kick coefficients at even indices).
# velocity-Verlet is the classical (1/2, 1, 1/2) leapfrog. The 2-stage
# minimal-norm (McLachlan 1995), 3-stage (McLachlan), and 11-stage
# (Omelyan et al. 2003, used in lattice QCD) schemes trade extra gradient
# evaluations for lower energy error per unit step size.
# ------------------------------------------------------------------------
velocity_verlet_coefficients = [0.5, 1.0, 0.5]

_mn2_b = 0.1931833275037836
mclachlan_coefficients = [_mn2_b, 0.5, 1.0 - 2.0 * _mn2_b, 0.5, _mn2_b]

_y_b1, _y_a1 = 0.11888010966548, 0.29619504261126
yoshida_coefficients = [
    _y_b1,
    _y_a1,
    0.5 - _y_b1,
    1.0 - 2.0 * _y_a1,
    0.5 - _y_b1,
    _y_a1,
    _y_b1,
]

_o_b1, _o_a1 = 0.08398315262876693, 0.2539785108410595
_o_b2, _o_a2 = 0.6822365335719091, -0.03230286765269967
_o_b3 = 0.5 - _o_b1 - _o_b2
_o_a3 = 1.0 - 2.0 * (_o_a1 + _o_a2)
omelyan_coefficients = [
    _o_b1, _o_a1, _o_b2, _o_a2, _o_b3, _o_a3, _o_b3, _o_a2, _o_b2, _o_a1, _o_b1,
]


def generate_euclidean_integrator(coefficients: list[float]):
    """Build an integrator factory for Newtonian dynamics with a fixed
    (Euclidean) metric from a palindromic coefficient scheme."""

    def integrator(logdensity_fn: Callable, kinetic_energy_fn: Callable) -> Integrator:
        logdensity_and_grad = jax.value_and_grad(logdensity_fn)
        velocity_fn = jax.grad(kinetic_energy_fn)

        def one_step(state: IntegratorState, step_size) -> IntegratorState:
            position, momentum, logdensity, grad = state
            for stage, coef in enumerate(coefficients):
                if stage % 2 == 0:  # momentum kick along the potential gradient
                    momentum = _axpy(momentum, grad, coef * step_size)
                else:  # position drift along the velocity M^-1 p
                    velocity = velocity_fn(momentum)
                    position = _axpy(position, velocity, coef * step_size)
                    logdensity, grad = logdensity_and_grad(position)
            return IntegratorState(position, momentum, logdensity, grad)

        return one_step

    return integrator


velocity_verlet = generate_euclidean_integrator(velocity_verlet_coefficients)
mclachlan = generate_euclidean_integrator(mclachlan_coefficients)
yoshida = generate_euclidean_integrator(yoshida_coefficients)
omelyan = generate_euclidean_integrator(omelyan_coefficients)


# ------------------------------------------------------------------------
# Isokinetic (ESH / microcanonical Langevin) family.
# ------------------------------------------------------------------------


def _unit(x, tol=1e-13):
    norm = jnp.linalg.norm(x)
    return jnp.where(norm > tol, x / norm, x), norm


def esh_momentum_kick(inverse_mass_matrix=1.0):
    """One momentum update of the ESH dynamics (Ver Steeg & Galstyan 2021),
    in the overflow-free form: the update is expressed through
    ``zeta = exp(-delta)`` only, so large gradient norms cannot overflow.

    Supports diagonal and low-rank+diagonal (LRD) preconditioning: with an
    ``LowRankInverseMassMatrix(sigma, U, lam)``, gradients are pulled back to
    the whitened frame with ``adjoint_L`` and unit momenta pushed forward
    with ``forward_L`` where ``forward_L ∘ adjoint_L = M^{-1}``, both O(dk)
    (reference ``integrators.py:378-435``).

    Returns ``(kick, velocity_scale)`` where ``kick(momentum, grad, delta_t)
    -> (new_momentum, kinetic_energy_change)`` operates on flat arrays and
    ``velocity_scale(u)`` maps a unit momentum to the position-space velocity
    direction.
    """
    from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix, _low_rank_matvec

    if isinstance(inverse_mass_matrix, LowRankInverseMassMatrix):
        sigma, U = inverse_mass_matrix.sigma, inverse_mass_matrix.U
        sqrt_lam = jnp.sqrt(inverse_mass_matrix.lam)

        def adjoint_L(g):
            return _low_rank_matvec(sigma * g, U, sqrt_lam)

        def forward_L(u):
            return sigma * _low_rank_matvec(u, U, sqrt_lam)

    else:
        sqrt_imm = jnp.sqrt(inverse_mass_matrix)

        def adjoint_L(g):
            return g * sqrt_imm

        def forward_L(u):
            return u * sqrt_imm

    def kick(momentum_flat, grad_flat, delta_t):
        dims = momentum_flat.shape[0]
        g = adjoint_L(grad_flat)
        e, grad_norm = _unit(g)
        proj = jnp.dot(momentum_flat, e)
        delta = delta_t * grad_norm / (dims - 1)
        zeta = jnp.exp(-delta)
        unnormalized = (
            e * ((1.0 - zeta) * (1.0 + zeta + proj * (1.0 - zeta)))
            + 2.0 * zeta * momentum_flat
        )
        new_momentum, _ = _unit(unnormalized)
        dK = (dims - 1) * (
            delta - jnp.log(2.0) + jnp.log1p(proj + (1.0 - proj) * zeta**2)
        )
        return new_momentum, dK

    return kick, forward_L


def generate_isokinetic_integrator(coefficients: list[float]):
    """Build an isokinetic integrator factory from a palindromic scheme.

    The returned step has signature ``(state, step_size) -> (state, dK)``
    where ``dK`` is the accumulated kinetic-energy change of the momentum
    kicks (needed by MCLMC's energy-error control).
    """

    def integrator(logdensity_fn: Callable, inverse_mass_matrix=1.0):
        logdensity_and_grad = jax.value_and_grad(logdensity_fn)
        kick, forward_L = esh_momentum_kick(inverse_mass_matrix)

        def one_step(state: IntegratorState, step_size):
            position, momentum, logdensity, grad = state
            p_flat, unravel = ravel_pytree(momentum)
            kinetic_change = 0.0
            for stage, coef in enumerate(coefficients):
                if stage % 2 == 0:
                    g_flat, _ = ravel_pytree(grad)
                    p_flat, dK = kick(p_flat, g_flat, coef * step_size)
                    kinetic_change = kinetic_change + dK
                else:
                    velocity = unravel(forward_L(p_flat))
                    position = _axpy(position, velocity, coef * step_size)
                    logdensity, grad = logdensity_and_grad(position)
            return (
                IntegratorState(position, unravel(p_flat), logdensity, grad),
                kinetic_change,
            )

        return one_step

    return integrator


isokinetic_velocity_verlet = generate_isokinetic_integrator(velocity_verlet_coefficients)
isokinetic_mclachlan = generate_isokinetic_integrator(mclachlan_coefficients)
isokinetic_yoshida = generate_isokinetic_integrator(yoshida_coefficients)
isokinetic_omelyan = generate_isokinetic_integrator(omelyan_coefficients)


def partially_refresh_momentum(momentum, rng_key, step_size, L):
    """Ornstein-Uhlenbeck partial momentum refresh on the unit sphere with
    decoherence length ``L`` (reference ``integrators.py:543``). ``L = inf``
    leaves the momentum untouched."""
    m, unravel = ravel_pytree(momentum)
    dim = m.shape[0]
    nu = jnp.sqrt((jnp.exp(2.0 * step_size / L) - 1.0) / dim)
    noisy = m + nu * jax.random.normal(rng_key, m.shape, dtype=m.dtype)
    refreshed = unravel(noisy / jnp.linalg.norm(noisy))
    return jax.lax.cond(jnp.isinf(L), lambda: momentum, lambda: refreshed)


def with_isokinetic_maruyama(integrator):
    """Strang-split the deterministic isokinetic step between two half-step
    O-U momentum refreshes (reference ``integrators.py:575``)."""

    def stochastic_step(state: IntegratorState, step_size, L_proposal, rng_key):
        key_pre, key_post = jax.random.split(rng_key)
        momentum = partially_refresh_momentum(
            state.momentum, key_pre, 0.5 * step_size, L_proposal
        )
        state, kinetic_change = integrator(
            state._replace(momentum=momentum), step_size
        )
        momentum = partially_refresh_momentum(
            state.momentum, key_post, 0.5 * step_size, L_proposal
        )
        return state._replace(momentum=momentum), kinetic_change

    return stochastic_step


# ------------------------------------------------------------------------
# Implicit midpoint (Riemannian / position-dependent kinetic energy).
# ------------------------------------------------------------------------


class FixedPointIterationInfo(NamedTuple):
    success: Any
    norm: Any
    iters: Any


def solve_fixed_point_iteration(
    func: Callable,
    x0: ArrayTree,
    *,
    convergence_tol: float = 1e-6,
    divergence_tol: float = 1e10,
    max_iters: int = 100,
    norm_fn: Callable = lambda x: jnp.max(jnp.abs(x)),
):
    """Solve ``x = func(x)[0]`` by plain fixed-point iteration inside a
    bounded ``while_loop`` (reference ``integrators.py:619``)."""

    def distance(a, b):
        return norm_fn(ravel_pytree(jax.tree.map(jnp.subtract, a, b))[0])

    def cond(carry):
        n, _, _, norm = carry
        return (n < max_iters) & jnp.isfinite(norm) & (norm < divergence_tol) & (norm > convergence_tol)

    def body(carry):
        n, x, _, _ = carry
        new_x, aux = func(x)
        return n + 1, new_x, aux, distance(new_x, x)

    x1, aux = func(x0)
    iters, x, aux, norm = jax.lax.while_loop(cond, body, (0, x1, aux, distance(x1, x0)))
    success = jnp.isfinite(norm) & (norm <= convergence_tol)
    return x, aux, FixedPointIterationInfo(success, norm, iters)


def implicit_midpoint(
    logdensity_fn: Callable,
    kinetic_energy_fn: Callable,
    *,
    solver: Callable = solve_fixed_point_iteration,
    **solver_kwargs: Any,
) -> Integrator:
    """Implicit midpoint integrator for position-dependent kinetic energies
    (Brofos & Lederman 2021; reference ``integrators.py:656``). The midpoint
    is found by fixed-point iteration, then one explicit update is taken from
    the solved midpoint."""
    logdensity_and_grad = jax.value_and_grad(logdensity_fn)
    kinetic_grads = jax.grad(
        lambda q, p: kinetic_energy_fn(p, position=q), argnums=(0, 1)
    )

    def one_step(state: IntegratorState, step_size) -> IntegratorState:
        q0, p0 = state.position, state.momentum

        def half_step_from(q, p, dlogdq, origin):
            dTdq, dHdp = kinetic_grads(q, p)
            dHdq = jax.tree.map(jnp.subtract, dTdq, dlogdq)
            new_q = _axpy(origin[0], dHdp, 0.5 * step_size)
            new_p = _axpy(origin[1], dHdq, -0.5 * step_size)
            return new_q, new_p

        def midpoint_eq(args):
            q, p = args
            _, dlogdq = logdensity_and_grad(q)
            return half_step_from(q, p, dlogdq, (q0, p0)), dlogdq

        (q_mid, p_mid), _, _ = solver(midpoint_eq, (q0, p0), **solver_kwargs)

        # explicit half step from the midpoint completes the full step
        _, dlogdq = logdensity_and_grad(q_mid)
        q, p = half_step_from(q_mid, p_mid, dlogdq, (q_mid, p_mid))
        return IntegratorState(q, p, *logdensity_and_grad(q))

    return one_step
