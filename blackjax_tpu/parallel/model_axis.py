"""Model-axis (huge-d) sharding: HMC/NUTS with the position, momentum and
(diagonal) mass matrix sharded across a second mesh axis.

SURVEY §5.7(b): for states too large for one chip — or to scale bandwidth
with the model — shard the *dimension* axis over ICI. The only global
reductions in the whole HMC/NUTS stack are dot products over d: the kinetic
energy and the generalized U-turn criterion (reference
``blackjax/mcmc/metrics.py:293-304``); the log-density is the model's own
business (additive models psum their local terms). Everything else in the
integrator/trajectory/proposal machinery is either elementwise over the
(sharded) dimension or scalar logic that stays replicated because its psum
inputs are replicated.

Usage (inside ``shard_map`` over a mesh with a ``"model"`` axis, position
leaves sharded along it)::

    metric  = model_sharded_metric(local_imm, axis_name="model")
    logdens = additive_logdensity(local_term_fn, axis_name="model")
    kernel  = nuts.build_kernel()
    state, info = kernel(replicated_key, state, logdens, step_size, metric)

The transition key must be REPLICATED across the model axis (scalar
proposal/termination decisions must agree on every shard); per-shard
momentum noise is decorrelated internally by folding the shard index into
the sampling key.

Composes with chain parallelism: a 2-D ``Mesh((("chains", "model")))`` with
states sharded ``P("chains", "model")`` runs the same kernel under one
``shard_map`` — chain-axis code needs no change because nothing here
touches the chain axis.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.flatten_util import ravel_pytree

from blackjax_tpu.mcmc.metrics import Metric
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, Numeric, PRNGKey
from blackjax_tpu.util import generate_gaussian_noise

__all__ = ["additive_logdensity", "model_sharded_metric"]


def additive_logdensity(local_term_fn: Callable, axis_name: str = "model") -> Callable:
    """Global log-density of an additive model from its shard-local terms:
    ``logpi(x) = psum_shards(local_term_fn(x_local))``.

    ``jax.grad`` of the result is correct under ``shard_map`` with the
    DEFAULT ``check_vma=True``: the psum of a varying value is typed
    invariant and its transpose delivers each shard its own cotangent.
    Under ``check_vma=False`` the legacy psum transpose double-counts
    (gradients come out multiplied by the axis size) — do not disable the
    check on this path.
    """

    def logdensity(local_position):
        return lax.psum(local_term_fn(local_position), axis_name)

    return logdensity


def model_sharded_metric(
    local_inverse_mass_matrix: Array, axis_name: str = "model"
) -> Metric:
    """Euclidean diagonal metric over a dimension-sharded state.

    ``local_inverse_mass_matrix`` is this shard's block of the global
    diagonal (in the shard's ``ravel_pytree`` order). Dense mass matrices
    are deliberately unsupported: a dense M across shards would turn every
    momentum refresh and U-turn check into a cross-shard matvec; use the
    diagonal (or keep dense metrics on unsharded states).

    Cross-shard traffic per operation: ONE scalar (or small-vector) psum —
    kinetic energy psums one partial sum, the U-turn check psums the two
    partial dots stacked, and the batched (K-slot) check psums one
    ``(5k+1,)`` vector of partial reductions.
    """
    imm = jnp.asarray(local_inverse_mass_matrix)
    if imm.ndim != 1:
        raise ValueError(
            "model_sharded_metric needs the local block of a DIAGONAL "
            f"inverse mass matrix (1-D); got ndim={imm.ndim}."
        )
    local_sigma = 1.0 / jnp.sqrt(imm)  # momentum scale: p ~ N(0, M)

    def sample_momentum(rng_key: PRNGKey, position: ArrayLikeTree) -> ArrayTree:
        # decorrelate shards: the kernel passes one replicated key; each
        # shard folds its own coordinate so the global draw is a proper
        # d-dimensional Gaussian
        shard_key = jax.random.fold_in(rng_key, lax.axis_index(axis_name))
        return generate_gaussian_noise(shard_key, position, sigma=local_sigma)

    def kinetic_energy(
        momentum: ArrayLikeTree, position: Optional[ArrayLikeTree] = None
    ) -> Numeric:
        del position
        p, _ = ravel_pytree(momentum)
        return 0.5 * lax.psum(jnp.dot(p, imm * p), axis_name)

    def check_turning(
        momentum_left: ArrayLikeTree,
        momentum_right: ArrayLikeTree,
        momentum_sum: ArrayLikeTree,
        position_left: Optional[ArrayLikeTree] = None,
        position_right: Optional[ArrayLikeTree] = None,
    ):
        del position_left, position_right
        m_left, _ = ravel_pytree(momentum_left)
        m_right, _ = ravel_pytree(momentum_right)
        m_sum, _ = ravel_pytree(momentum_sum)
        rho = m_sum - 0.5 * (m_left + m_right)
        partial = jnp.stack(
            [jnp.dot(imm * m_left, rho), jnp.dot(imm * m_right, rho)]
        )
        dot_left, dot_right = lax.psum(partial, axis_name)
        return (dot_left <= 0) | (dot_right <= 0)

    def scale(
        position: ArrayLikeTree, element: ArrayLikeTree, *, inv: bool, trans: bool
    ) -> ArrayTree:
        del position, trans  # diagonal factors are symmetric
        e, unravel = ravel_pytree(element)
        factor = 1.0 / local_sigma if inv else local_sigma
        return unravel(factor * e)

    def check_turning_batched(
        ckpt_momentum, ckpt_momentum_sum, momentum_right, momentum_sum, active
    ):
        """All K slot criteria with ONE (5k+1,)-vector psum: every dot in
        the expanded slot test is a sum over d, so shards reduce locally
        and combine once (see metrics._batched_turning_from_apply for the
        unsharded algebra)."""
        m = momentum_right
        t = momentum_sum - 0.5 * m
        w = imm * m
        u = imm * t
        V = ckpt_momentum * imm[None, :]
        partials = jnp.concatenate(
            [
                jnp.dot(w, t)[None],
                ckpt_momentum_sum @ w,
                ckpt_momentum @ w,
                ckpt_momentum @ u,
                jnp.sum(V * ckpt_momentum_sum, axis=-1),
                jnp.sum(V * ckpt_momentum, axis=-1),
            ]
        )
        wt, Sw, Rw, Ru, VS, VR = jnp.split(
            lax.psum(partials, axis_name),
            np.cumsum([1] + [ckpt_momentum.shape[0]] * 4).tolist(),
        )
        turn_right = wt - Sw + 0.5 * Rw
        turn_left = Ru - VS + 0.5 * VR
        slot_turning = (turn_left <= 0) | (turn_right <= 0)
        return jnp.any(active & slot_turning)

    return Metric(
        sample_momentum, kinetic_energy, check_turning, scale, check_turning_batched
    )
