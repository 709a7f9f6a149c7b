"""Slice sampling (Neal 2003): univariate slices along random directions
(hit-and-run) or coordinate sweeps (slice-within-Gibbs), with stepping-out
or doubling interval procedures.

Behavioral parity target: ``blackjax/mcmc/slice.py`` (stepping-out :132,
doubling :188 with the Fig.-6 reversibility test :236, shrinkage :267,
hyperplane kernel :366, coordinate kernel :456).

TPU note: the doubling procedure is *vectorized* — all candidate doubled
brackets are evaluated with one ``vmap`` and the stopping level selected by
argmax, instead of a sequential expansion loop.

The ``slice_fn(t) -> (state, is_valid)`` contract lets proposals record
extra state and gate hard constraints (nested sampling reuses it).
"""
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
from jax import random
from jax.flatten_util import ravel_pytree

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.util import generate_gaussian_noise

__all__ = [
    "SliceState",
    "SliceInfo",
    "init",
    "stepping_out",
    "doubling",
    "build_kernel",
    "build_coordinate_kernel",
    "as_top_level_api",
    "coordinate_slice",
    "direction_proposal",
    "sample_direction",
    "random_order",
    "fixed_order",
]


class SliceState(NamedTuple):
    position: ArrayTree
    logdensity: float


class SliceInfo(NamedTuple):
    """Transition diagnostics; brackets are in the slice coordinate ``t``
    with the current point at ``t = 0``."""

    is_accepted: Array
    num_expansions: Array
    num_shrink: Array
    bracket_left: ArrayTree
    bracket_right: ArrayTree


def init(position: ArrayLikeTree, logdensity_fn: Callable) -> SliceState:
    return SliceState(position, logdensity_fn(position))


def stepping_out(
    rng_key: PRNGKey, in_slice: Callable, width: float, max_expansions: int
):
    """Neal Fig. 3: place a width-``width`` bracket uniformly around t=0 and
    push each end outward while it stays in the slice, splitting the
    expansion budget randomly between the two sides. Needs no acceptance
    test. Returns ``(left, right, num_expansions, accept_fn)``."""
    u_key, budget_key = random.split(rng_key)
    left = -width * random.uniform(u_key)
    right = left + width

    j = jnp.floor(max_expansions * random.uniform(budget_key)).astype(int)
    k = (max_expansions - 1) - j

    def expand(endpoint, budget, direction):
        def cond(carry):
            end, n = carry
            return in_slice(end) & (n > 0)

        def body(carry):
            end, n = carry
            return end + direction * width, n - 1

        return jax.lax.while_loop(cond, body, (endpoint, budget))

    left, j_left = expand(left, j, -1.0)
    right, k_right = expand(right, k, 1.0)
    num_expansions = (j - j_left) + (k - k_right)
    return left, right, num_expansions, lambda t: jnp.asarray(True)


def _best_interval(both_out: Array) -> Array:
    """Index of the first level at which both ends left the slice (falling
    back to the last level)."""
    k = both_out.shape[0]
    priority = jnp.arange(2 * k, k, -1, dtype=both_out.dtype)
    tiebreak = jnp.arange(k, dtype=both_out.dtype)
    return jnp.argmax(priority * both_out + tiebreak).astype(int)


def doubling(rng_key: PRNGKey, in_slice: Callable, width: float, max_expansions: int):
    """Neal Fig. 4 doubling, vectorized: precompute the whole ladder of
    doubled brackets (random side each level), test all endpoints in one
    batched call, select the first level with both ends outside the slice.
    Returns Neal's Fig. 6 test as the acceptance function (required for
    reversibility)."""
    place_key, side_key = random.split(rng_key)
    initial_left = -width * random.uniform(place_key)
    initial_right = initial_left + width

    levels = max_expansions + 1
    grow_left = random.bernoulli(side_key, 0.5, (levels,))
    grow_right = 1 - grow_left.astype(int)
    step_widths = width * (2.0 ** jnp.arange(levels))

    # exclusive cumulative growth: level j includes doublings 0..j-1
    left_growth = jnp.concatenate(
        [jnp.zeros(1), jnp.cumsum(step_widths * grow_left)[:-1]]
    )
    right_growth = jnp.concatenate(
        [jnp.zeros(1), jnp.cumsum(step_widths * grow_right)[:-1]]
    )
    lefts = initial_left - left_growth
    rights = initial_right + right_growth

    both_out = (~jax.vmap(in_slice)(lefts)) & (~jax.vmap(in_slice)(rights))
    idx = _best_interval(both_out.astype(int))
    left, right = lefts[idx], rights[idx]

    def accept_fn(t):
        return _doubling_accept(in_slice, t, left, right, width)

    return left, right, idx, accept_fn


def _doubling_accept(in_slice: Callable, t, left, right, width):
    """Neal Fig. 6: bisect the original bracket toward ``t``; reject if a
    doubling sequence started from ``t`` would have terminated earlier."""

    def keep_bisecting(carry):
        lo, hi, _, ok = carry
        return (hi - lo > 1.1 * width) & ok

    def bisect(carry):
        lo, hi, crossed, _ = carry
        mid = 0.5 * (lo + hi)
        # t and the origin land in different halves => the sequences diverge
        crossed = crossed | jnp.logical_xor(t < mid, 0.0 < mid)
        lo, hi = jnp.where(t < mid, lo, mid), jnp.where(t < mid, mid, hi)
        dead_bracket = ~in_slice(lo) & ~in_slice(hi)
        return lo, hi, crossed, ~(crossed & dead_bracket)

    *_, ok = jax.lax.while_loop(
        keep_bisecting, bisect, (left, right, jnp.asarray(False), jnp.asarray(True))
    )
    return ok


def _shrink(
    rng_key, slice_fn, level, accept_fn, left, right, current_state, max_shrinkage
):
    """Neal Fig. 5 shrinkage with a hard iteration budget; on exhaustion the
    chain stays put. The accepted candidate state (with anything the
    proposal recorded on it) is threaded out directly."""

    def unresolved(carry):
        *_, tries, _, found = carry
        return ~found & (tries < max_shrinkage)

    def try_point(carry):
        _, lo, hi, key, tries, state, _ = carry
        key, draw_key = random.split(key)
        t = lo + random.uniform(draw_key) * (hi - lo)
        candidate, is_valid = slice_fn(t)
        found = (candidate.logdensity >= level) & is_valid & accept_fn(t)
        # failed draws pull their side of the bracket in toward t = 0
        lo, hi = jnp.where(t < 0.0, t, lo), jnp.where(t < 0.0, hi, t)
        state = jax.tree.map(
            lambda new, old: jnp.where(found, new, old), candidate, state
        )
        return t, lo, hi, key, tries + 1, state, found

    *_, n, state, found = jax.lax.while_loop(
        unresolved,
        try_point,
        (0.0, left, right, rng_key, jnp.asarray(0), current_state, jnp.asarray(False)),
    )
    return state, n, found


def _univariate_slice(
    rng_key, slice_fn, current_state, width, interval, max_expansions, max_shrinkage
):
    level_key, interval_key, shrink_key = random.split(rng_key, 3)
    level = current_state.logdensity + jnp.log(random.uniform(level_key))

    def in_slice(t):
        candidate, is_valid = slice_fn(t)
        return (candidate.logdensity >= level) & is_valid

    left, right, num_expansions, accept_fn = interval(
        interval_key, in_slice, width, max_expansions
    )
    new_state, num_shrink, is_accepted = _shrink(
        shrink_key, slice_fn, level, accept_fn, left, right, current_state, max_shrinkage
    )
    return new_state, SliceInfo(is_accepted, num_expansions, num_shrink, left, right)


def build_kernel(
    interval: Callable = doubling,
    max_expansions: int = 10,
    max_shrinkage: int = 100,
) -> Callable:
    """Hyperplane slice kernel: one univariate slice through the proposal
    generator's ``slice_fn``."""

    def kernel(
        rng_key: PRNGKey,
        state: SliceState,
        logdensity_fn: Callable,
        proposal_generator: Callable,
        width: float = 1.0,
    ) -> tuple[SliceState, SliceInfo]:
        prop_key, slice_key = random.split(rng_key)
        slice_fn = proposal_generator(prop_key, state.position, logdensity_fn)
        return _univariate_slice(
            slice_key, slice_fn, state, width, interval, max_expansions, max_shrinkage
        )

    return kernel


def random_order(rng_key: PRNGKey, d: int) -> Array:
    return random.permutation(rng_key, d)


def fixed_order(rng_key: PRNGKey, d: int) -> Array:
    del rng_key
    return jnp.arange(d)


def coordinate_proposal(
    rng_key: PRNGKey, position: ArrayLikeTree, logdensity_fn: Callable, i: int
) -> Callable:
    """Unit step along flattened axis ``i``."""
    del rng_key
    flat, unravel = ravel_pytree(position)

    def slice_fn(t):
        x = unravel(flat.at[i].add(t))
        return SliceState(x, logdensity_fn(x)), True

    return slice_fn


def build_coordinate_kernel(
    interval: Callable = doubling,
    axis_proposal: Callable = coordinate_proposal,
    coordinate_order: Callable = random_order,
    initial_widths: Union[float, Array] = 1.0,
    max_expansions: int = 10,
    max_shrinkage: int = 100,
) -> Callable:
    """Slice-within-Gibbs sweep: one univariate slice per coordinate, in
    the order given by ``coordinate_order``."""

    def kernel(rng_key: PRNGKey, state: SliceState, logdensity_fn: Callable):
        flat0, unravel = ravel_pytree(state.position)
        d = flat0.shape[0]
        widths = jnp.broadcast_to(jnp.asarray(initial_widths, float).ravel(), (d,))

        order_key, scan_key = random.split(rng_key)
        order = coordinate_order(order_key, d)

        def body(carry, xs):
            position, logdensity = carry
            key, i, w = xs
            prop_key, slice_key = random.split(key)
            slice_fn = axis_proposal(prop_key, position, logdensity_fn, i)
            new_state, info = _univariate_slice(
                slice_key,
                slice_fn,
                SliceState(position, logdensity),
                w,
                interval,
                max_expansions,
                max_shrinkage,
            )
            return (new_state.position, new_state.logdensity), info

        keys = random.split(scan_key, order.shape[0])
        (final_pos, final_ld), swept = jax.lax.scan(
            body, (state.position, state.logdensity), (keys, order, widths[order])
        )

        def stitch(values):
            return unravel(jnp.zeros(d, values.dtype).at[order].set(values))

        info = SliceInfo(
            is_accepted=jnp.all(swept.is_accepted),
            num_expansions=jnp.sum(swept.num_expansions),
            num_shrink=jnp.sum(swept.num_shrink),
            bracket_left=stitch(swept.bracket_left),
            bracket_right=stitch(swept.bracket_right),
        )
        return SliceState(final_pos, final_ld), info

    return kernel


def sample_direction(
    rng_key: PRNGKey, position: ArrayLikeTree, scale: Union[float, Array] = 1.0
) -> ArrayTree:
    """Unit direction with covariance shape ``scale @ scale.T``."""
    noise = generate_gaussian_noise(rng_key, position, sigma=scale)
    flat, unravel = ravel_pytree(noise)
    return unravel(flat / jnp.linalg.norm(flat))


def direction_proposal(scale: Union[float, Array] = 1.0) -> Callable:
    """Hit-and-run proposal: slice along a random ``scale``-shaped unit
    direction."""

    def proposal_generator(rng_key, position, logdensity_fn):
        direction = sample_direction(rng_key, position, scale)

        def slice_fn(t):
            x = jax.tree.map(lambda p, d: p + t * d, position, direction)
            return SliceState(x, logdensity_fn(x)), True

        return slice_fn

    return proposal_generator


def as_top_level_api(
    logdensity_fn: Callable,
    *,
    proposal_generator: Callable = direction_proposal(),
    width: float = 1.0,
    interval: Callable = doubling,
    max_expansions: int = 10,
    max_shrinkage: int = 100,
) -> SamplingAlgorithm:
    """``blackjax_tpu.slice_sampling(...)``: hit-and-run multivariate slice."""
    kernel = build_kernel(interval, max_expansions, max_shrinkage)
    return build_sampling_algorithm(
        kernel, init, logdensity_fn, kernel_args=(proposal_generator, width)
    )


def coordinate_slice(
    logdensity_fn: Callable,
    *,
    max_expansions: int = 10,
    initial_widths: Union[float, Array] = 1.0,
    interval: Callable = doubling,
    coordinate_order: Callable = random_order,
    axis_proposal: Callable = coordinate_proposal,
    max_shrinkage: int = 100,
) -> SamplingAlgorithm:
    """``blackjax_tpu.coordinate_slice(...)``: coordinate-wise Gibbs slice."""
    kernel = build_coordinate_kernel(
        interval=interval,
        axis_proposal=axis_proposal,
        coordinate_order=coordinate_order,
        initial_widths=initial_widths,
        max_expansions=max_expansions,
        max_shrinkage=max_shrinkage,
    )
    return build_sampling_algorithm(kernel, init, logdensity_fn)
