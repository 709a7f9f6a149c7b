"""The staged warmup engine: Stan's three-phase schedule driven entirely
inside one ``lax.scan`` with branch-free window dispatch.

Behavioral parity target: ``blackjax/adaptation/staged_adaptation.py``
(state :69, engine :111, schedule :315, entry point :519, multi-chain path
:875-962).

TPU-first notes:
- the whole warmup is ONE jitted scan; the schedule is a precomputed
  ``(num_steps, 2)`` int array consumed as scan xs, window dispatch is a
  ``lax.switch`` + ``lax.cond`` — no host round-trips mid-warmup;
- the multi-chain shared-ε path vmaps the kernel over an ``(M, ...)`` chain
  block and performs ONE dual-averaging update per step on the mean
  acceptance rate (M probes of the same ε are one observation, not M), and
  feeds ``(M, d)`` position blocks to the metric core in one batched call.
"""
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from blackjax_tpu.adaptation.base import AdaptationResults, return_all_adapt_info
from blackjax_tpu.adaptation.metric_recipes import MetricCore, MetricRecipe, lookup_recipe
from blackjax_tpu.adaptation.step_size import (
    DualAveragingAdaptationState,
    dual_averaging_adaptation,
)
from blackjax_tpu.base import AdaptationAlgorithm
from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey
from blackjax_tpu.util import pytree_size

__all__ = ["StagedAdaptationState", "build_schedule", "staged_adaptation"]

# warmup-only NUTS treedepth cap on the auto-metric ensemble path: 2^5 - 1
# = 31 leapfrogs per step, the equilibrated depth of a well-tuned chain
_WARMUP_DOUBLINGS_CAP = 5


class StagedAdaptationState(NamedTuple):
    ss_state: DualAveragingAdaptationState
    imm_state: Any
    step_size: float
    inverse_mass_matrix: Array


def _make_engine(
    metric_core: MetricCore,
    *,
    target_acceptance_rate: float,
    pool_acceptance: bool = False,
    axis_name: Optional[str] = None,
) -> tuple[Callable, Callable, Callable]:
    """Build ``(init, update, final)`` for the warmup host state. Step-size
    DA lives here; mass-matrix work is delegated to ``metric_core``.

    ``axis_name`` (with ``pool_acceptance``) makes the pooled path
    mesh-aware: the acceptance mean completes with a ``psum`` and the chain
    block is ``all_gather``-ed (tiled) before it reaches the metric core, so
    EVERY core — welford, fisher, ring-buffer low-rank — sees the identical
    full ensemble it would see on one device. The gather moves the whole
    ``(M, d)`` block once per step; moment-psum fast paths for the welford
    cores exist in :func:`blackjax_tpu.adaptation.mass_matrix.welford_algorithm`
    if that ever dominates."""
    da_init, da_update, da_final = dual_averaging_adaptation(target_acceptance_rate)

    def _da_step(ss_state, acceptance_rate):
        if pool_acceptance:
            if axis_name is not None:
                total = jax.lax.psum(jnp.sum(acceptance_rate), axis_name)
                count = acceptance_rate.shape[0] * jax.lax.axis_size(axis_name)
                return da_update(ss_state, total / count)
            return da_update(ss_state, jnp.mean(acceptance_rate))
        return da_update(ss_state, acceptance_rate)

    def init(position: ArrayLikeTree, initial_step_size: float) -> StagedAdaptationState:
        imm_state = metric_core.init(pytree_size(position))
        return StagedAdaptationState(
            da_init(initial_step_size),
            imm_state,
            initial_step_size,
            imm_state.inverse_mass_matrix,
        )

    def fast_update(position, grad, acceptance_rate, ws: StagedAdaptationState):
        del position, grad
        new_ss = _da_step(ws.ss_state, acceptance_rate)
        return StagedAdaptationState(
            new_ss, ws.imm_state, jnp.exp(new_ss.log_step_size), ws.inverse_mass_matrix
        )

    def _flatten(tree):
        """Metric cores operate on raveled coordinates; positions/grads may
        be arbitrary pytrees (with a leading chain axis when pooled)."""
        if tree is None:
            return None
        from jax.flatten_util import ravel_pytree

        if pool_acceptance:
            flat = jax.vmap(lambda t: ravel_pytree(t)[0])(tree)
            if axis_name is not None:
                flat = jax.lax.all_gather(flat, axis_name, tiled=True)
            return flat
        return ravel_pytree(tree)[0]

    def slow_update(position, grad, acceptance_rate, ws: StagedAdaptationState):
        new_imm_state = metric_core.update(
            ws.imm_state, _flatten(position), _flatten(grad)
        )
        new_ss = _da_step(ws.ss_state, acceptance_rate)
        return StagedAdaptationState(
            new_ss,
            new_imm_state,
            jnp.exp(new_ss.log_step_size),
            new_imm_state.inverse_mass_matrix,
        )

    def slow_final(ws: StagedAdaptationState) -> StagedAdaptationState:
        """Slow-window end: fold the window into a new IMM, restart DA from
        the current averaged step size."""
        new_imm_state = metric_core.final(ws.imm_state)
        new_ss = da_init(da_final(ws.ss_state))
        return StagedAdaptationState(
            new_ss,
            new_imm_state,
            jnp.exp(new_ss.log_step_size),
            new_imm_state.inverse_mass_matrix,
        )

    def update(
        adaptation_state: StagedAdaptationState,
        adaptation_stage,
        position,
        grad,
        acceptance_rate,
    ) -> StagedAdaptationState:
        stage, is_middle_window_end = adaptation_stage
        ws = jax.lax.switch(
            stage, (fast_update, slow_update), position, grad, acceptance_rate, adaptation_state
        )
        return jax.lax.cond(is_middle_window_end, slow_final, lambda x: x, ws)

    def final(ws: StagedAdaptationState):
        return jnp.exp(ws.ss_state.log_step_size_avg), ws.imm_state.inverse_mass_matrix

    return init, update, final


def build_schedule(
    num_steps: int,
    initial_buffer_size: int = 75,
    final_buffer_size: int = 50,
    first_window_size: int = 25,
) -> Array:
    """Stan's warmup schedule as a ``(num_steps, 2)`` int array of
    ``(stage_label, is_middle_window_end)``: a fast step-size buffer, then
    doubling slow (covariance) windows, then a final fast buffer. Window
    sizes shrink proportionally when ``num_steps`` is small; below 20 steps
    everything is fast (no mass-matrix adaptation)."""
    schedule = []
    if num_steps < 20:
        schedule = [(0, False)] * num_steps
    else:
        if initial_buffer_size + first_window_size + final_buffer_size > num_steps:
            initial_buffer_size = int(0.15 * num_steps)
            final_buffer_size = int(0.1 * num_steps)
            first_window_size = num_steps - initial_buffer_size - final_buffer_size

        schedule += [(0, False)] * initial_buffer_size

        final_buffer_start = num_steps - final_buffer_size
        window_start, window_size = initial_buffer_size, first_window_size
        while window_start < final_buffer_start:
            size = window_size
            # last window absorbs the remainder rather than leaving a stub
            if 3 * size > final_buffer_start - window_start:
                size = final_buffer_start - window_start
            else:
                window_size = 2 * size
            schedule += [(1, False)] * (size - 1) + [(1, True)]
            window_start += size

        schedule += [(0, False)] * final_buffer_size

    return jnp.array(schedule)


def _resolve_metric(
    metric, metric_options, *, max_grad_budget=None, n_chains=1, schedule_fn=None
) -> tuple[MetricCore, Callable]:
    """Resolve ``metric`` to a core plus the schedule to use. ``"auto"``
    builds the meta-adaptation controller (multi-chain variant when
    n_chains > 1) and defaults the schedule to the growing-window one —
    ONLY when the caller did not pass a schedule (None sentinel, so an
    explicit ``schedule_fn=build_schedule`` is preserved)."""
    if metric == "auto":
        if max_grad_budget is None:
            raise ValueError(
                "staged_adaptation: max_grad_budget is required when "
                "metric='auto'; e.g. staged_adaptation(nuts, logdensity_fn, "
                "metric='auto', max_grad_budget=50_000)."
            )
        from blackjax_tpu.adaptation.meta import (
            build_meta_adaptation_core,
            build_multi_chain_meta_core,
        )

        if n_chains > 1:
            core = build_multi_chain_meta_core(
                max_grad_budget, n_chains, **metric_options
            )
        else:
            core = build_meta_adaptation_core(max_grad_budget, **metric_options)
        if schedule_fn is None:
            from blackjax_tpu.adaptation.low_rank_adaptation import (
                build_growing_window_schedule,
            )

            schedule_fn = build_growing_window_schedule
        return core, schedule_fn

    resolved_schedule = build_schedule if schedule_fn is None else schedule_fn
    if isinstance(metric, MetricCore):
        return metric, resolved_schedule
    if isinstance(metric, MetricRecipe):
        return metric.build_core(**metric_options), resolved_schedule
    if isinstance(metric, str):
        return lookup_recipe(metric).build_core(**metric_options), resolved_schedule
    raise ValueError(
        f"metric must be a recipe name, MetricRecipe or MetricCore; got {metric!r}"
    )


def staged_adaptation(
    algorithm,
    logdensity_fn: Callable,
    *,
    metric: Union[str, MetricRecipe, MetricCore] = "welford_diag",
    metric_options: Optional[dict] = None,
    schedule_fn: Optional[Callable] = None,
    initial_step_size: float = 1.0,
    target_acceptance_rate: float = 0.80,
    initial_metric_state=None,
    adaptation_info_fn: Callable = return_all_adapt_info,
    n_chains: int = 1,
    max_grad_budget: Optional[int] = None,
    axis_name: Optional[str] = None,
    **extra_parameters,
) -> AdaptationAlgorithm:
    """Run the staged warmup for any HMC-family ``algorithm`` (a module-like
    object with ``init`` and ``build_kernel``).

    When ``n_chains > 1``, ``run`` expects ``position`` with a leading
    ``(n_chains, ...)`` axis; chains run vmapped at one shared step size with
    pooled acceptance and a metric estimated from the whole ensemble block.

    ``axis_name`` (requires ``n_chains > 1``) shards the ensemble over a
    mesh axis: call ``run`` inside ``jax.shard_map`` with this device's
    ``n_chains / axis_size`` block and a replicated key. Pooled acceptance
    completes with a psum and the metric core is fed the gathered global
    block, so the tuned parameters match the single-device vmap run.

    ``metric="auto"`` (experimental) activates the meta-adaptation
    controller (:mod:`blackjax_tpu.adaptation.meta`): diagonal that
    auto-escalates to the Fisher low-rank metric when the window signals
    support it. Requires ``max_grad_budget``; defaults the schedule to the
    growing-window one unless an explicit ``schedule_fn`` is given. Read the
    decision afterwards with ``extract_meta_verdict`` /
    ``extract_multi_chain_verdict``.
    """
    metric_core, schedule_fn = _resolve_metric(
        metric,
        metric_options or {},
        max_grad_budget=max_grad_budget,
        n_chains=n_chains,
        schedule_fn=schedule_fn,
    )
    build_kernel_kwargs = {}
    if "integrator" in extra_parameters:
        # integrator is a build-time choice for HMC-family kernels, not a
        # per-step parameter
        build_kernel_kwargs["integrator"] = extra_parameters.pop("integrator")
    mcmc_kernel = algorithm.build_kernel(**build_kernel_kwargs)
    multi_chain = n_chains > 1

    if axis_name is not None and not multi_chain:
        raise ValueError("axis_name requires n_chains > 1 (a sharded ensemble).")

    adapt_init, adapt_step, adapt_final = _make_engine(
        metric_core,
        target_acceptance_rate=target_acceptance_rate,
        pool_acceptance=multi_chain,
        axis_name=axis_name,
    )

    # Warmup-only treedepth cap on the auto-metric ensemble path. With M
    # dispersed inits under the identity first-window metric, NUTS grows
    # pathologically deep trees (hundreds of leapfrogs per step on
    # ill-conditioned targets vs ~31 equilibrated), burning the grad budget
    # before any metric is known. Cap max_num_doublings at 5 (31 leapfrogs)
    # for the warmup loop ONLY; the returned parameters keep the user's
    # (or default) value so sampling runs uncapped. Kernels without a
    # max_num_doublings kwarg (HMC, MALA, ...) are left untouched.
    # Behavioral parity: reference blackjax/adaptation/staged_adaptation.py
    # :883-899 (same cap, same auto+multichain+NUTS-only gating).
    warmup_parameters = extra_parameters
    if metric == "auto" and multi_chain:
        import inspect

        try:
            accepts_doublings = (
                "max_num_doublings" in inspect.signature(mcmc_kernel).parameters
            )
        except (TypeError, ValueError):  # pragma: no cover — builtin kernels
            accepts_doublings = False
        if accepts_doublings:
            user_doublings = extra_parameters.get("max_num_doublings", 10)
            warmup_parameters = {
                **extra_parameters,
                "max_num_doublings": min(user_doublings, _WARMUP_DOUBLINGS_CAP),
            }

    if initial_metric_state is not None:
        _base_init = adapt_init

        def adapt_init(position, step_size):  # noqa: F811
            state = _base_init(position, step_size)
            return state._replace(
                imm_state=initial_metric_state,
                inverse_mass_matrix=initial_metric_state.inverse_mass_matrix,
            )

    def one_step(carry, xs):
        _, rng_key, adaptation_stage = xs
        state, adaptation_state = carry

        if multi_chain:
            keys = jax.random.split(rng_key, n_chains)
            if axis_name is not None:
                local = n_chains // jax.lax.axis_size(axis_name)
                keys = jax.lax.dynamic_slice_in_dim(
                    keys, jax.lax.axis_index(axis_name) * local, local
                )
            new_state, info = jax.vmap(
                lambda k, s: mcmc_kernel(
                    k,
                    s,
                    logdensity_fn,
                    adaptation_state.step_size,
                    adaptation_state.inverse_mass_matrix,
                    **warmup_parameters,
                )
            )(keys, state)
        else:
            new_state, info = mcmc_kernel(
                rng_key,
                state,
                logdensity_fn,
                adaptation_state.step_size,
                adaptation_state.inverse_mass_matrix,
                **extra_parameters,
            )

        new_adaptation_state = adapt_step(
            adaptation_state,
            adaptation_stage,
            new_state.position,
            new_state.logdensity_grad,
            info.acceptance_rate,
        )
        return (
            (new_state, new_adaptation_state),
            adaptation_info_fn(new_state, info, new_adaptation_state),
        )

    def run(rng_key: PRNGKey, position: ArrayLikeTree, num_steps: int = 1000):
        if multi_chain:
            init_state = jax.vmap(lambda p: algorithm.init(p, logdensity_fn))(position)
            one_chain_position = jax.tree.map(lambda x: x[0], position)
            init_adaptation_state = adapt_init(one_chain_position, initial_step_size)
        else:
            init_state = algorithm.init(position, logdensity_fn)
            init_adaptation_state = adapt_init(position, initial_step_size)

        keys = jax.random.split(rng_key, num_steps)
        schedule = schedule_fn(num_steps)
        (last_state, last_adaptation_state), info = jax.lax.scan(
            one_step,
            (init_state, init_adaptation_state),
            (jnp.arange(num_steps), keys, schedule),
        )

        step_size, inverse_mass_matrix = adapt_final(last_adaptation_state)
        parameters = {
            "step_size": step_size,
            "inverse_mass_matrix": inverse_mass_matrix,
            **extra_parameters,
        }
        return AdaptationResults(last_state, parameters), info

    return AdaptationAlgorithm(run)
