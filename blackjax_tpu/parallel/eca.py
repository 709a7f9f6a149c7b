"""Ensemble Chain Adaptation (ECA): the multi-device execution layer.

Behavioral parity target: ``blackjax/eca.py`` (``eca_step`` :25, ``run_eca``
:158, ``ensemble_execute_fn`` :262, ``while_with_info`` :119).

This is THE distributed template of the framework: a 1-D ``Mesh`` over the
``"chains"`` axis (ICI links on TPU), ``shard_map`` entered exactly once per
launch, chains vmapped within each device shard, and per-step cross-device
traffic limited to one ``psum`` of O(1)-O(d) summary statistics — latency-
bound on ICI, fully fused into the step by XLA. The adaptation update runs
replicated on every device from the psum'd expectations, so no broadcast is
needed.

On a multi-slice system, put a second mesh axis on DCN and keep ``"chains"``
on ICI; the ``psum`` then lowers to a hierarchical reduction automatically.
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec

from blackjax_tpu.parallel._program_cache import cached_jit
from blackjax_tpu.diagnostics import splitR

__all__ = [
    "eca_step",
    "run_eca",
    "ensemble_execute_fn",
    "while_with_info",
    "add_splitR",
    "add_all_chains_info",
]


def eca_step(
    kernel: Callable,
    summary_statistics_fn: Callable,
    adaptation_update: Callable,
    num_chains: int,
    superchain_size: Optional[int] = None,
    all_chains_info: Optional[Callable] = None,
):
    """One per-device ECA step: vmap the kernel over the local chain block,
    psum the summary statistics over the ``"chains"`` mesh axis, and update
    the (replicated) adaptation state from the ensemble expectation."""

    def step(carry, xs):
        state, adaptation_state = carry  # state: (chains_per_device, ...) block
        _, keys_sampling, key_adaptation = xs

        state, info = jax.vmap(kernel, (0, 0, None))(
            keys_sampling, state, adaptation_state
        )
        stats = jax.vmap(summary_statistics_fn, (0, 0, None))(state, info, key_adaptation)
        expectations = jax.tree.map(
            lambda s: lax.psum(jnp.sum(s, axis=0), axis_name="chains") / num_chains,
            stats,
        )
        adaptation_state, info_to_be_stored = adaptation_update(
            adaptation_state, expectations
        )
        return (state, adaptation_state), info_to_be_stored

    return add_all_chains_info(
        add_splitR(step, num_chains, superchain_size), all_chains_info
    )


def sharded_splitR(position, num_chains, superchain_size, func=jnp.square):
    """Nested-R̂ over superchains computed across the sharded ensemble.

    ``position``: the LOCAL ``(chains_per_device, ...)`` block inside
    ``shard_map``. Superchains must be device-local groups
    (``chains_per_device % superchain_size == 0``), which holds by
    construction since :func:`ensemble_execute_fn` repeats keys contiguously.
    Cross-device moments ride one ``psum`` each; the result is replicated.

    Mirrors the semantics of :func:`blackjax_tpu.diagnostics.splitR`
    (reference ``diagnostics.py:285``) but with ``psum``-reduced
    between/within-superchain moments instead of a full gather.
    """
    fx = jax.vmap(func)(position)
    fx = fx.reshape(fx.shape[0], -1)  # (local_chains, nfunc)
    local_chains = fx.shape[0]
    n_super = num_chains // superchain_size
    fx = fx.reshape(local_chains // superchain_size, superchain_size, -1)

    mean_k = jnp.mean(fx, axis=1)  # (local_super, nfunc)
    within_k = jnp.var(fx, axis=1, ddof=1)
    within = lax.psum(jnp.sum(within_k, axis=0), "chains") / n_super
    sum_mean = lax.psum(jnp.sum(mean_k, axis=0), "chains")
    sum_sq = lax.psum(jnp.sum(mean_k**2, axis=0), "chains")
    grand_mean = sum_mean / n_super
    between = (sum_sq - n_super * grand_mean**2) / (n_super - 1)
    return jnp.sqrt(1.0 + between / within)


def add_splitR(step, num_chains, superchain_size):
    """Augment a step with nested-R̂ convergence statistics over superchains."""
    if superchain_size is None:
        return step

    def with_R(carry, xs):
        (state, adaptation_state), info = step(carry, xs)
        if superchain_size == 1:
            info["R_avg"] = 0.0
            info["R_max"] = 0.0
        else:
            R = sharded_splitR(state.position, num_chains, superchain_size)
            info["R_avg"] = jnp.mean(jnp.square(R) - 1)
            info["R_max"] = jnp.max(jnp.square(R) - 1)
        return (state, adaptation_state), info

    return with_R


def add_all_chains_info(step, all_chains_info):
    """Augment a step with a per-chain observable trace (memory heavy)."""
    if all_chains_info is None:
        return step

    def with_info(carry, xs):
        (state, adaptation_state), info = step(carry, xs)
        info["all_chains_info"] = jax.vmap(all_chains_info)(state.position)
        return (state, adaptation_state), info

    return with_info


def while_with_info(step, init, xs, length, while_cond):
    """``lax.scan``-shaped early-stoppable loop: run ``step`` while
    ``while_cond(info, i)`` holds, recording per-step info into a
    preallocated static-shape buffer. Returns ``(final, info, counter)``."""

    take = lambda tree, i: jax.tree.map(lambda a: a[i], tree)

    # probe one step (traced, not executed twice at runtime thanks to DCE of
    # the value) to learn the info pytree structure, then preallocate
    probe_info = step(init, take(xs, 0))[1]
    info_buffer = jax.tree.map(
        lambda x: jnp.zeros((length,) + jnp.shape(x), dtype=jnp.result_type(x)),
        probe_info,
    )

    def cond_fn(val):
        _, _, counter, keep_going = val
        return keep_going & (counter < length)

    def body_fn(val):
        carry, buffer, counter, _ = val
        new_carry, info = step(carry, take(xs, counter))
        buffer = jax.tree.map(lambda a, v: a.at[counter].set(v), buffer, info)
        return new_carry, buffer, counter + 1, while_cond(info, counter)

    final, info, counter, _ = jax.lax.while_loop(
        cond_fn, body_fn, (init, info_buffer, 0, while_cond(probe_info, 0))
    )
    return final, info, counter


def run_eca(
    rng_key,
    initial_state,
    kernel,
    adaptation,
    num_steps: int,
    num_chains: int,
    mesh,
    superchain_size: Optional[int] = None,
    all_chains_info: Optional[Callable] = None,
    early_stop: bool = False,
):
    """Run ECA over a device mesh.

    ``adaptation`` must expose ``initial_state``, ``summary_statistics_fn``,
    ``update`` and (when ``early_stop``) ``while_cond``. Control crosses the
    device boundary exactly once: the whole ``num_steps`` scan runs inside
    one ``shard_map``.
    """
    step = eca_step(
        kernel,
        adaptation.summary_statistics_fn,
        adaptation.update,
        num_chains,
        superchain_size=superchain_size,
        all_chains_info=all_chains_info,
    )

    def all_steps(initial_state, adaptation_initial, keys_sampling, keys_adaptation):
        carry = (initial_state, adaptation_initial)
        # keys_sampling: (chains_per_device, num_steps) -> scan over steps
        xs = (
            jnp.arange(num_steps),
            jnp.swapaxes(keys_sampling, 0, 1),
            keys_adaptation,
        )
        if early_stop:
            final, info, counter = while_with_info(
                step, carry, xs, num_steps, adaptation.while_cond
            )
        else:
            final, info = lax.scan(step, carry, xs)
            counter = num_steps
        final_state, final_adaptation_state = final
        return final_state, final_adaptation_state, info, counter

    p, replicated = PartitionSpec("chains"), PartitionSpec()
    # jit the shard_mapped program, memoized on the static config: un-jitted
    # shard_map executes eagerly — one primitive dispatch per host->device
    # crossing (measured 40x+ on the tunneled TPU for the SMC twin of this
    # driver) — and a fresh jit object per call re-traces the whole loop.
    # adaptation.initial_state rides as an ARGUMENT (not a closure capture)
    # so a cache hit can never resurrect stale initial adaptation data.
    parallel_execute = cached_jit(
        (
            "run_eca",
            kernel,
            adaptation.summary_statistics_fn,
            adaptation.update,
            getattr(adaptation, "while_cond", None) if early_stop else None,
            num_steps,
            num_chains,
            mesh,
            superchain_size,
            all_chains_info,
            early_stop,
            jax.tree.structure(adaptation.initial_state),
        ),
        lambda: jax.shard_map(
            all_steps,
            mesh=mesh,
            in_specs=(p, replicated, p, replicated),
            out_specs=(p, replicated, replicated, replicated),
        ),
    )

    key_sampling, key_adaptation = jax.random.split(rng_key)
    keys_adaptation = jax.random.split(key_adaptation, num_steps)
    keys_sampling = jax.device_put(
        jax.random.split(key_sampling, (num_chains, num_steps)),
        NamedSharding(mesh, p),
    )

    final_state, final_adaptation_state, info, counter = parallel_execute(
        initial_state, adaptation.initial_state, keys_sampling, keys_adaptation
    )
    # with early_stop the tail of the buffer is unused — trim it on the host
    info = jax.tree.map(lambda a: a[: int(counter)], info)
    return final_state, final_adaptation_state, info


def ensemble_execute_fn(
    func: Callable,
    rng_key,
    num_chains: int,
    mesh,
    x=None,
    args=None,
    summary_statistics_fn: Callable = lambda y: 0.0,
    superchain_size: Optional[int] = None,
):
    """Evaluate a sequential ``func(rng_key, x, args) -> y`` over a sharded
    ensemble and psum-average ``summary_statistics_fn(y)``. Used for sharded
    initialization. With ``superchain_size > 1`` key duplication makes chains
    within a superchain share their init (for nested R̂)."""
    p, replicated = PartitionSpec("chains"), PartitionSpec()

    if x is None:
        x = jax.device_put(jnp.zeros(num_chains), NamedSharding(mesh, p))

    inner = eca_step(
        func,
        lambda y, info, key: summary_statistics_fn(y),
        lambda _, expectations: (expectations, None),
        num_chains,
    )

    def on_device(x, keys, args):
        (y, expectations), _ = inner((x, args), (None, keys, None))
        return y, expectations

    args_specs = jax.tree.map(lambda _: replicated, args)
    # jit + memoize for the same reason as run_eca: eager shard_map
    # dispatches per-primitive; a per-call jit object re-traces every call
    parallel_execute = cached_jit(
        (
            "ensemble_execute_fn",
            func,
            summary_statistics_fn,
            num_chains,
            mesh,
            jax.tree.structure(args),
        ),
        lambda: jax.shard_map(
            on_device,
            mesh=mesh,
            in_specs=(p, p, args_specs),
            out_specs=(p, replicated),
        ),
    )

    if superchain_size is None or superchain_size == 1:
        keys = jax.random.split(rng_key, num_chains)
    else:
        keys = jnp.repeat(
            jax.random.split(rng_key, num_chains // superchain_size),
            superchain_size,
            axis=0,
        )
    keys = jax.device_put(keys, NamedSharding(mesh, p))
    return parallel_execute(x, keys, args)
