"""Core algorithm contracts.

The universal abstraction is the *kernel*: a pure function
``(rng_key, state) -> (new_state, info)`` paired with an
``init(position) -> state``. Everything else in the library — warmup, SMC
outer loops, ensemble adaptation, multi-device execution — is composition of
such kernels under JAX control-flow primitives.

Mirrors the protocol surface of the reference (``blackjax/base.py:24-151``)
while staying a from-scratch, TPU-first implementation: kernels here are
written to be ``jax.vmap``-transparent over a leading chain axis so that
chain-blocked ``(C, d)`` execution — the TPU-native layout — is always one
``vmap`` (or one ``shard_map``) away.
"""
from typing import Any, Callable, NamedTuple, Protocol

from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "InitFn",
    "UpdateFn",
    "SamplingAlgorithm",
    "VIAlgorithm",
    "AdaptationAlgorithm",
    "AdaptationResults",
    "RunFn",
]

State = ArrayTree
Info = ArrayTree


class InitFn(Protocol):
    """Builds an algorithm state from an initial position."""

    def __call__(self, position: ArrayLikeTree, rng_key: PRNGKey | None = None) -> State:
        ...


class UpdateFn(Protocol):
    """Moves the chain state one step forward; pure and jittable."""

    def __call__(self, rng_key: PRNGKey, state: State) -> tuple[State, Info]:
        ...


class SamplingAlgorithm(NamedTuple):
    """A pair ``(init, step)`` implementing a Markov transition kernel."""

    init: InitFn
    step: UpdateFn


class VIAlgorithm(NamedTuple):
    """Variational family: ``init`` the approximation, ``step`` the optimizer
    update, ``sample`` draws from the current approximation."""

    init: Callable
    step: Callable
    sample: Callable


class RunFn(Protocol):
    def __call__(self, rng_key: PRNGKey, position: ArrayLikeTree, num_steps: int) -> Any:
        ...


class AdaptationResults(NamedTuple):
    state: ArrayTree
    parameters: dict


class AdaptationInfo(NamedTuple):
    state: ArrayTree
    info: ArrayTree
    adaptation_state: ArrayTree


class AdaptationAlgorithm(NamedTuple):
    """Warmup: ``run(rng_key, position, num_steps) -> (results, info)``."""

    run: RunFn


def build_sampling_algorithm(
    kernel: Callable,
    init_state: Callable,
    logdensity_fn: Callable,
    init_args: tuple = (),
    kernel_args: tuple = (),
    *,
    pass_rng_key_to_init: bool = False,
) -> SamplingAlgorithm:
    """Close a general ``(rng_key, state, logdensity_fn, *args)`` kernel and
    its ``init`` over fixed parameters, yielding a ``SamplingAlgorithm``
    (reference ``base.py:154``). This is the boilerplate behind every
    ``as_top_level_api``."""

    def init_fn(position: ArrayLikeTree, rng_key: PRNGKey | None = None):
        import jax
        import jax.numpy as jnp

        # strengthen weak-typed leaves (python scalars): a weak-typed initial
        # state gives the first jitted step a different signature than every
        # later one — one silent extra XLA compile per chain start
        position = jax.tree.map(
            lambda x: jnp.asarray(x).astype(jnp.asarray(x).dtype), position
        )
        if pass_rng_key_to_init:
            if rng_key is None:
                raise ValueError(
                    "this algorithm's init requires an rng_key (it draws the "
                    "initial momentum / trajectory-length seed): call "
                    "algo.init(position, rng_key)"
                )
            return init_state(position, logdensity_fn, *init_args, rng_key)
        return init_state(position, logdensity_fn, *init_args)

    def step_fn(rng_key: PRNGKey, state: State) -> tuple[State, Info]:
        return kernel(rng_key, state, logdensity_fn, *kernel_args)

    return SamplingAlgorithm(init_fn, step_fn)
