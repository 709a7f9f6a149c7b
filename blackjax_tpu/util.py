"""Shared utilities: linear algebra dispatch, noise generation, the canonical
inference loop, and streaming expectation helpers.

Behavioral parity targets: ``blackjax/util.py`` (reference, file:line cited on
each function). Implementation is TPU-first and from scratch:

- ``linear_map`` dispatches diag-vs-dense with *highest* matmul precision so
  that metric algebra stays accurate in f32 on the MXU.
- the inference loop is one ``lax.scan`` — the whole run is a single XLA
  program, no host round-trips.
"""
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from blackjax_tpu.base import SamplingAlgorithm, VIAlgorithm
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "linear_map",
    "generate_gaussian_noise",
    "generate_unit_vector",
    "pytree_size",
    "index_pytree",
    "run_inference_algorithm",
    "store_only_expectation_values",
    "incremental_value_update",
    "thin_algorithm",
    "thin_kernel",
]


@partial(jax.jit, static_argnames=("precision",), inline=True)
def linear_map(diag_or_dense_a, b, *, precision="highest"):
    """``y = A x`` with diag-vs-dense dispatch (reference ``util.py:23``).

    A scalar or 1-d ``A`` is treated as (the diagonal of) a diagonal matrix
    and multiplied elementwise; a 2-d ``A`` uses a dense matvec at highest
    precision (three-pass bf16 on TPU ≈ f32 accuracy on the MXU).
    The result matches the promoted dtype of the inputs.
    """
    dtype = jnp.result_type(diag_or_dense_a.dtype, b.dtype)
    a = jnp.asarray(diag_or_dense_a, dtype=dtype)
    b = jnp.asarray(b, dtype=dtype)
    if a.ndim <= 1:
        return lax.mul(a, b)
    return lax.dot(a, b, precision=precision)


def generate_gaussian_noise(
    rng_key: PRNGKey,
    position: ArrayLikeTree,
    mu: float | Array = 0.0,
    sigma: float | Array = 1.0,
) -> ArrayTree:
    """Draw ``N(mu, sigma)`` noise shaped like ``position``
    (reference ``util.py:66``). ``sigma`` may be a scalar, a diagonal (1-d)
    or a dense (2-d) scale applied through :func:`linear_map`."""
    flat, unravel_fn = ravel_pytree(position)
    eps = jax.random.normal(rng_key, shape=flat.shape, dtype=flat.dtype)
    return unravel_fn(mu + linear_map(sigma, eps))


def generate_unit_vector(rng_key: PRNGKey, position: ArrayLikeTree) -> ArrayTree:
    """Uniform random unit vector shaped like ``position``
    (reference ``util.py:94``)."""
    flat, unravel_fn = ravel_pytree(position)
    eps = jax.random.normal(rng_key, shape=flat.shape, dtype=flat.dtype)
    return unravel_fn(eps / jnp.linalg.norm(eps))


def pytree_size(pytree: ArrayLikeTree) -> int:
    """Total number of elements in a pytree (reference ``util.py:116``)."""
    return sum(jnp.size(leaf) for leaf in jax.tree.leaves(pytree))


def index_pytree(input_pytree: ArrayLikeTree) -> ArrayTree:
    """Map each pytree element to its index in the raveled flat vector, so
    users can line up mass-matrix rows with pytree leaves."""
    flat, unravel_fn = ravel_pytree(input_pytree)
    return unravel_fn(jnp.arange(flat.shape[0], dtype=flat.dtype))


def run_inference_algorithm(
    rng_key: PRNGKey,
    inference_algorithm: SamplingAlgorithm | VIAlgorithm,
    num_steps: int,
    initial_state: ArrayLikeTree = None,
    initial_position: ArrayLikeTree = None,
    transform: Callable = lambda state, info: (state, info),
    progress_bar: bool = False,
    progress_output_file: str | None = None,
) -> tuple:
    """The canonical inference loop: one ``lax.scan`` over ``num_steps``
    kernel applications (reference ``util.py:150``).

    Does not apply to SGMCMC kernels, which take a minibatch per step.

    ``progress_bar=True`` posts asynchronous host callbacks from the device
    (~1% step granularity); ``progress_output_file`` additionally writes
    ``"{step} {num_steps}"`` atomically for out-of-process monitoring via
    ``blackjax_tpu.progress_reader``.

    Returns ``(final_state, history)`` where ``history`` is
    ``transform(state, info)`` stacked over steps.
    """
    if initial_state is None and initial_position is None:
        raise ValueError("Either `initial_state` or `initial_position` must be provided.")
    if initial_state is not None and initial_position is not None:
        raise ValueError("Only one of `initial_state` or `initial_position` must be provided.")

    if initial_state is None:
        rng_key, init_key = jax.random.split(rng_key)
        initial_state = inference_algorithm.init(initial_position, init_key)

    keys = jax.random.split(rng_key, num_steps)

    def one_step(state, xs):
        _, key = xs
        state, info = inference_algorithm.step(key, state)
        return state, transform(state, info)

    progress_state = None
    if progress_bar or progress_output_file is not None:
        from blackjax_tpu.progress_bar import progress_bar_factory

        wrap_body, progress_state = progress_bar_factory(
            num_steps, output_file=progress_output_file, use_tqdm=progress_bar
        )
        one_step = wrap_body(one_step)

    xs = (jnp.arange(num_steps), keys)
    final_state, history = lax.scan(one_step, initial_state, xs)
    if progress_state is not None:
        jax.block_until_ready(final_state)
        jax.effects_barrier()  # flush pending async host callbacks
        progress_state.close()
    return final_state, history


class StreamingState(NamedTuple):
    """Carry for streaming expectations: inner sampler state + running mean."""

    sampler_state: ArrayTree
    step: Array
    streaming_avg: tuple  # (total_weight, running_mean_pytree)


def safediv(numerator, denominator):
    """``numerator / denominator`` with 0/0 mapped to 0 (streaming-average
    guard for all-zero weights)."""
    return jnp.where(
        numerator == 0.0, 0.0, numerator / jnp.where(denominator == 0.0, 1.0, denominator)
    )


def incremental_value_update(
    expectation: ArrayTree,
    incremental_val: tuple,
    weight: float | Array = 1.0,
    zero_prevention: float | Array = 0.0,
):
    """One step of a weighted streaming mean (reference ``util.py:291``).

    ``incremental_val`` is ``(total, mean)``; returns the updated pair with
    ``mean <- (total*mean + weight*expectation) / (total + weight + zero_prevention)``.
    """
    total, avg = incremental_val
    avg = jax.tree.map(
        lambda a, e: safediv(total * a + weight * e, total + weight + zero_prevention),
        avg,
        expectation,
    )
    return total + weight, avg


def store_only_expectation_values(
    sampling_algorithm,
    state_transform: Callable = lambda x: x,
    incremental_value_transform: Callable = lambda x: x,
    burn_in: int = 0,
):
    """Wrap a sampler so the trace holds only streaming expectations of
    ``state_transform(state)`` — O(1) memory instead of O(num_steps)
    (reference ``util.py:216``)."""

    def init_fn(state):
        averaging_state = (0.0, state_transform(state))
        return StreamingState(state, jnp.asarray(0, dtype=jnp.int32), averaging_state)

    def update_fn(rng_key, state: StreamingState):
        sampler_state, step, streaming_avg = state
        sampler_state, info = sampling_algorithm.step(rng_key, sampler_state)
        expectation = state_transform(sampler_state)
        # zero weight during burn-in, with an epsilon to avoid 0/0
        weight = jnp.where(step < burn_in, 0.0, 1.0)
        zero_prevention = jnp.where(step < burn_in, 1e-30, 0.0)
        streaming_avg = incremental_value_update(
            expectation, streaming_avg, weight=weight, zero_prevention=zero_prevention
        )
        return StreamingState(sampler_state, step + 1, streaming_avg), info

    def transform(state: StreamingState, info):
        return incremental_value_transform(state.streaming_avg[1]), info

    return SamplingAlgorithm(init_fn, update_fn), transform


def thin_kernel(kernel: Callable, num_inner_steps: int) -> Callable:
    """Compose ``num_inner_steps`` applications of ``kernel`` into one step,
    returning the last info (reference ``util.py:386``)."""

    def thinned(rng_key, state, *args, **kwargs):
        keys = jax.random.split(rng_key, num_inner_steps)

        def body(state, key):
            state, info = kernel(key, state, *args, **kwargs)
            return state, info

        state, infos = lax.scan(body, state, keys)
        last_info = jax.tree.map(lambda x: x[-1], infos)
        return state, last_info

    return thinned


def thin_algorithm(algorithm: SamplingAlgorithm, num_inner_steps: int) -> SamplingAlgorithm:
    """Thin a sampling algorithm: each public step runs ``num_inner_steps``
    inner transitions (reference ``util.py:322``)."""
    return SamplingAlgorithm(algorithm.init, thin_kernel(algorithm.step, num_inner_steps))
