"""No-U-Turn Sampler (iterative, multinomial).

Behavioral parity target: ``blackjax/mcmc/nuts.py`` (reference; ``NUTSInfo``
:36, kernel :77, iterative proposal :223).

TPU-first delta: the default engine is
:func:`blackjax_tpu.mcmc.trajectory.flattened_nuts` — a single bounded
``while_loop`` taking one leapfrog step per iteration with branch-free
doubling bookkeeping, so that ``vmap`` over thousands of chains runs in
lockstep with masked lanes instead of nested divergent loops. Set
``engine="nested"`` to use the reference-structured nested-loop engine (the
parity/validation path); both are statistically identical.
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import hmc, integrators, metrics, termination, trajectory
from blackjax_tpu.mcmc.proposal import Proposal
from blackjax_tpu.types import ArrayTree, PRNGKey

__all__ = [
    "NUTSInfo",
    "init",
    "build_kernel",
    "as_top_level_api",
    "build_fused_many_steps",
]


init = hmc.init


class NUTSInfo(NamedTuple):
    """Per-transition diagnostics of the NUTS kernel."""

    momentum: ArrayTree
    is_divergent: bool
    is_turning: bool
    energy: float
    trajectory_leftmost_state: integrators.IntegratorState
    trajectory_rightmost_state: integrators.IntegratorState
    num_trajectory_expansions: int
    num_integration_steps: int
    acceptance_rate: float


def iterative_nuts_proposal(
    integrator: Callable,
    kinetic_energy: Callable,
    uturn_check_fn: Callable,
    max_num_expansions: int = 10,
    divergence_threshold: float = 1000,
    *,
    engine: str = "flattened",
    batched_uturn_check_fn: Callable = None,
) -> Callable:
    """Build the NUTS proposal: trajectory doubling with multinomial
    progressive sampling and checkpointed U-turn termination.

    ``batched_uturn_check_fn`` (flattened engine only) evaluates all
    checkpoint slots at once — statistically equivalent to the sequential
    per-slot loop but ~2.3x faster on TPU at thousands of vmapped chains;
    summation order differs, so runs are not bit-identical to the nested
    engine."""

    if engine == "flattened":
        flat_propose = trajectory.flattened_nuts(
            integrator,
            kinetic_energy,
            uturn_check_fn,
            max_num_expansions,
            divergence_threshold,
            batched_uturn_check_fn=batched_uturn_check_fn,
        )

        def propose(rng_key, initial_state: integrators.IntegratorState, step_size):
            state, info = flat_propose(rng_key, initial_state, step_size)
            (
                proposal,
                left,
                right,
                _momentum_sum,
                num_states,
                depth,
                is_diverging,
                is_turning,
            ) = info
            acceptance_rate = jnp.exp(proposal.sum_log_p_accept) / jnp.maximum(
                num_states, 1
            )
            nuts_info = NUTSInfo(
                initial_state.momentum,
                is_diverging,
                is_turning,
                proposal.energy,
                left,
                right,
                depth,
                num_states,
                acceptance_rate,
            )
            return state, nuts_info

        return propose

    if engine != "nested":
        raise ValueError(f"Unknown NUTS engine {engine!r}; use 'flattened' or 'nested'.")

    new_termination_state, update_termination_state, is_criterion_met = (
        termination.iterative_uturn(uturn_check_fn)
    )
    trajectory_integrator = trajectory.dynamic_progressive_integration(
        integrator,
        kinetic_energy,
        update_termination_state,
        is_criterion_met,
        divergence_threshold,
    )
    expand = trajectory.dynamic_multiplicative_expansion(
        trajectory_integrator, uturn_check_fn, max_num_expansions
    )
    energy_fn = trajectory.hmc_energy(kinetic_energy)

    def propose(rng_key, initial_state: integrators.IntegratorState, step_size):
        initial_termination_state = new_termination_state(
            initial_state, max_num_expansions
        )
        initial_energy = energy_fn(initial_state)
        initial_proposal = Proposal(initial_state, initial_energy, 0.0, -jnp.inf)
        initial_trajectory = trajectory.Trajectory(
            initial_state, initial_state, initial_state.momentum, 0
        )
        initial_expansion_state = trajectory.DynamicExpansionState(
            0, initial_proposal, initial_trajectory, initial_termination_state
        )

        expansion_state, (is_diverging, is_turning) = expand(
            rng_key, initial_expansion_state, initial_energy, step_size
        )
        num_doublings, sampled_proposal, new_trajectory, _ = expansion_state
        acceptance_rate = jnp.exp(sampled_proposal.sum_log_p_accept) / jnp.maximum(
            new_trajectory.num_states, 1
        )

        info = NUTSInfo(
            initial_state.momentum,
            is_diverging,
            is_turning,
            sampled_proposal.energy,
            new_trajectory.leftmost_state,
            new_trajectory.rightmost_state,
            num_doublings,
            new_trajectory.num_states,
            acceptance_rate,
        )
        return sampled_proposal.state, info

    return propose


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: int = 1000,
    *,
    engine: str = "flattened",
    batched_uturn: bool = False,
):
    """Build the NUTS kernel. ``engine`` selects the flattened lockstep loop
    (default, TPU-native) or the nested reference-structured loop.
    ``batched_uturn=True`` opts into the distributive-matvec slot check
    (``Metric.check_turning_batched``); the default statically-unrolled
    per-slot check is bit-identical to the nested engine and measured
    faster at 4k chains."""

    def kernel(
        rng_key: PRNGKey,
        state: hmc.HMCState,
        logdensity_fn: Callable,
        step_size: float,
        inverse_mass_matrix: metrics.MetricTypes,
        max_num_doublings: int = 10,
    ) -> tuple[hmc.HMCState, NUTSInfo]:
        metric = metrics.default_metric(inverse_mass_matrix)
        symplectic_integrator = integrator(logdensity_fn, metric.kinetic_energy)
        proposal_generator = iterative_nuts_proposal(
            symplectic_integrator,
            metric.kinetic_energy,
            metric.check_turning,
            max_num_doublings,
            divergence_threshold,
            engine=engine,
            batched_uturn_check_fn=(
                metric.check_turning_batched if batched_uturn else None
            ),
        )

        key_momentum, key_integrator = jax.random.split(rng_key)
        position, logdensity, logdensity_grad = state
        momentum = metric.sample_momentum(key_momentum, position)

        integrator_state = integrators.IntegratorState(
            position, momentum, logdensity, logdensity_grad
        )
        proposal, info = proposal_generator(key_integrator, integrator_state, step_size)
        return (
            hmc.HMCState(proposal.position, proposal.logdensity, proposal.logdensity_grad),
            info,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    inverse_mass_matrix: metrics.MetricTypes,
    *,
    max_num_doublings: int = 10,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    engine: str = "flattened",
) -> SamplingAlgorithm:
    """``blackjax_tpu.nuts(...)``."""
    kernel = build_kernel(integrator, divergence_threshold, engine=engine)
    metric = metrics.default_metric(inverse_mass_matrix)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(step_size, metric, max_num_doublings),
    )


def build_fused_many_steps(
    logdensity_fn: Callable,
    step_size: float,
    inverse_mass_matrix: metrics.MetricTypes,
    *,
    num_steps: int,
    max_num_doublings: int = 10,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    track_fn: Callable = None,
    window_size: int = None,
    oversubscription: int = 1,
    unroll: int = 1,
    restart_every: int = 1,
):
    """Continuous many-transition NUTS runner: chains flow through their
    transitions WITHOUT a per-step barrier.

    The standard many-chain pattern — ``lax.scan`` over steps of a vmapped
    kernel — makes every chain wait for the slowest chain's trajectory at
    EVERY step: the cost per step is max-over-chains leaves, not
    mean-over-chains (measured ~12x waste at 4096 chains on the benchmark
    posterior). Here ONE ``while_loop`` advances every unfinished chain one
    leaf per iteration via :func:`trajectory.flattened_nuts_machine`; when a
    chain's transition completes it immediately starts its next one, so the
    straggler waste amortizes over the whole run instead of per step.

    The samples are BIT-IDENTICAL to the scan-of-kernel path: ``rng_keys``
    has shape ``(num_steps, num_chains)`` with exactly the keys the scan
    path would pass per step per chain, and the same per-transition key
    derivation is used.

    No reference counterpart — stock BlackJAX has no continuous runner;
    this is the TPU-first "chains are a first-class batch axis" design
    (SURVEY.md §7.1) applied across the step axis as well.

    Works unchanged under ``shard_map`` over a ``("chains",)`` mesh (shard
    ``rng_keys`` as ``P(None, "chains")`` and the states as
    ``P("chains")``): chains are independent, so each device's while loop
    completes its shard with no cross-device synchronization, and the
    results stay bit-identical to single-device execution.

    Parameters
    ----------
    track_fn
        ``IntegratorState -> (k,)`` values recorded per transition (default:
        the full position). History shape is ``(num_chains, num_steps, k)``.
    oversubscription
        ``m > 1`` runs the chains through ``num_chains / m`` physical SLOTS:
        each slot drains ``m`` logical chains back-to-back (slot ``s`` owns
        chains ``s, s+P, s+2P, ...``). Per-chain total work is heavy-tailed
        AND persistent (a slow chain is slow for the whole run), so with one
        slot per chain the loop runs until the slowest chain finishes —
        measured ~28% lane utilization at 4096 chains. Summing ``m``
        independent chains per slot concentrates the per-slot totals
        (relative spread ~ 1/sqrt(m)), converting the tail into bin-packing
        residue; it also cuts the while-carry HBM traffic per iteration by
        ``m`` (the loop is carry-bandwidth-bound, not FLOP-bound). Samples
        stay BIT-IDENTICAL: each chain consumes exactly the same keys and
        machine steps regardless of packing. Requires ``num_chains % m == 0``.
    unroll
        Machine-leaf steps per ``while_loop`` iteration (termination checked
        between blocks). Amortizes the loop's fixed per-iteration cost; at
        most ``unroll - 1`` overshoot leaves run as masked no-ops at the
        end. The transformation is exact (bit-identical under x64, where
        rounding is stable); under f32 the compiler may fuse (fma-contract)
        across the composed bodies, so samples can differ from ``unroll=1``
        at the ULP level — statistically identical, and measured +3% on the
        flagship config at ``unroll=4`` on v5e.
    restart_every
        Run the restart machinery (per-slot key derivation + momentum
        sampling + machine re-init) only in unrolled bodies whose in-block
        index is a multiple of this — a STATIC gate, no ``lax.cond`` over
        the carry. Closing chains park at most ``restart_every - 1`` leaves
        before their next transition; every chain still consumes exactly
        the same keys and leaves, so samples are unchanged (bit-identical
        under x64). Must divide into ``unroll`` sensibly
        (``1 <= restart_every <= unroll``).

    Returns
    -------
    ``run(rng_keys, init_states) -> (final_states, history, total_grads)``
    where ``init_states`` is a vmapped :class:`hmc.HMCState` batch,
    ``final_states`` is the IntegratorState batch after each chain's last
    transition, and ``total_grads`` counts integration steps across all
    chains (the ESS/grad denominator).
    """
    metric = metrics.default_metric(inverse_mass_matrix)
    symplectic_integrator = integrator(logdensity_fn, metric.kinetic_energy)
    machine_init, machine_leaf = trajectory.flattened_nuts_machine(
        symplectic_integrator,
        metric.kinetic_energy,
        metric.check_turning,
        max_num_doublings,
        divergence_threshold,
    )
    if track_fn is None:
        track_fn = lambda state: jnp.ravel(state.position)
    if oversubscription < 1:
        raise ValueError(f"oversubscription must be >= 1, got {oversubscription}")
    if unroll < 1:
        raise ValueError(f"unroll must be >= 1, got {unroll}")
    if restart_every < 1 or restart_every > unroll:
        raise ValueError(
            f"restart_every must be in [1, unroll={unroll}], got {restart_every}"
        )

    def _unrolled(body):
        """Run ``unroll`` machine-leaf bodies per while iteration, checking
        the termination condition only between blocks.  Amortizes the loop's
        fixed per-iteration cost and lets the compiler pipeline across
        bodies.  Bit-identical to ``unroll=1``: once a slot's work is done
        every consumer in the body is masked off, so the (at most
        ``unroll - 1``) overshoot iterations are no-ops on all carries.

        ``restart_every`` gates the restart machinery (per-slot key
        derivation + momentum sampling + machine re-init — comparable in
        cost to a leapfrog at small d) to bodies whose in-block index is a
        multiple of it, STATICALLY — no ``lax.cond`` over the carry.  A
        closing chain parks at most ``restart_every - 1`` leaves before its
        next transition starts; the work each chain does (keys, leaves,
        samples) is unchanged, only shifted to later loop iterations."""
        if unroll == 1:
            return lambda carry: body(carry, True)

        def block(carry):
            for i in range(unroll):
                carry = body(carry, i % restart_every == 0)
            return carry

        return block

    def _bselect(pred, a, b):
        """Per-chain select with the (C,) predicate broadcast over trailing
        dimensions of every leaf."""
        return jax.tree.map(
            lambda x, y: jnp.where(pred.reshape(pred.shape + (1,) * (x.ndim - 1)), x, y),
            a,
            b,
        )

    def start_transition(step_key, state):
        key_momentum, key_integrator = jax.random.split(step_key)
        momentum = metric.sample_momentum(key_momentum, state.position)
        integrator_state = integrators.IntegratorState(
            state.position, momentum, state.logdensity, state.logdensity_grad
        )
        return machine_init(key_integrator, integrator_state)

    def start_transition_from(step_key, position, logdensity, logdensity_grad):
        key_momentum, key_integrator = jax.random.split(step_key)
        momentum = metric.sample_momentum(key_momentum, position)
        return machine_init(
            key_integrator,
            integrators.IntegratorState(position, momentum, logdensity, logdensity_grad),
        )

    def _bsel(pred, a, b):
        return jax.tree.map(
            lambda x, y: jnp.where(pred.reshape(pred.shape + (1,) * (x.ndim - 1)), x, y),
            a,
            b,
        )

    def run_oversubscribed(rng_keys, init_states):
        """Slot-major execution: P = C/m slots, slot s drains chains
        s, s+P, ... with a per-slot cursor g in [0, m*S); chain = s +
        (g // S) * P, step = g % S. History and finals live slot-major and
        are unpermuted once at the end."""
        m = oversubscription
        num_chains = jax.tree.leaves(init_states.position)[0].shape[0]
        if num_chains % m:
            raise ValueError(
                f"oversubscription={m} must divide num_chains ({num_chains})"
            )
        P = num_chains // m
        S = num_steps
        T = m * S
        # the sliding write window in cursor space: slots concentrate (the
        # point of oversubscription), so one chain-length is generous. W must
        # stay <= S: the finals write assumes cursors within a width-2 slab
        # of chain-lengths (cursor//S - offset//S <= 1), which only holds
        # when the window cannot span more than one full chain
        W = S if window_size is None else min(window_size, S)

        slot_init = jax.tree.map(lambda x: x[:P], init_states)
        machines = jax.vmap(start_transition)(rng_keys[0, :P], slot_init)
        track_shape = jax.eval_shape(
            track_fn, jax.tree.map(lambda x: x[0], machines.proposal.state)
        )
        vz = jax.tree.leaves(init_states.position)[0].ravel()[0] * 0
        vzi = vz.astype(jnp.int32)
        # cursor-major layout: the sliding write window is a contiguous
        # leading-axis region, so the dynamic-slice/update-slice pair lowers
        # to a cheap in-place update (measured: the (P, T, k) layout's
        # minor-axis DUS copies the whole buffer every iteration — 248us vs
        # 44us per iteration on v5e)
        hist0 = (
            jnp.zeros((T, P, track_shape.shape[0]), track_shape.dtype)
            + vz.astype(track_shape.dtype)
        )
        cursor0 = jnp.zeros(P, jnp.int32) + vzi
        grads_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        grads0 = jnp.zeros((), grads_dtype) + vzi.astype(grads_dtype)
        last0 = machines.proposal.state
        # (m, P, ...) layout: the j-slab offset rides the LEADING axis so the
        # slice/update pair stays in place (same measured pathology as hist)
        finals0 = jax.tree.map(
            lambda x: jnp.zeros((m, P) + x.shape[1:], x.dtype) + vz.astype(x.dtype),
            last0,
        )
        running0 = jnp.ones(P, bool) | (vzi > 0)
        offset0 = jnp.zeros((), jnp.int32) + vzi

        def cond(carry):
            _, cursor, *_ = carry
            return jnp.any(cursor < T)

        def body(carry, do_restart=True):
            machines, cursor, running, offset, last_state, hist, finals, grads = carry
            active = cursor < T

            machines = jax.vmap(machine_leaf, (0, None))(machines, step_size)
            closed = machines.done & running
            out_state = machines.proposal.state
            vals = jax.vmap(track_fn)(out_state).astype(hist.dtype)

            # history: one-hot masked write inside the cursor window
            zero_i = jnp.zeros((), offset.dtype)
            window = jax.lax.dynamic_slice(
                hist, (offset, zero_i, zero_i), (W, P, hist.shape[-1])
            )
            in_window = (
                jnp.arange(W)[:, None] == (cursor - offset)[None, :]
            ) & closed[None, :]
            window = jnp.where(in_window[:, :, None], vals[None, :, :], window)
            hist = jax.lax.dynamic_update_slice(hist, window, (offset, zero_i, zero_i))

            # finals: a chain completes when its last transition closes.
            # cursors are confined to [offset, offset+W) with W <= S, so the
            # chain index j = cursor // S spans at most a width-2 slab.
            finishing = closed & (cursor % S == S - 1)
            j_off = jnp.minimum(offset // S, max(m - 2, 0)).astype(offset.dtype)
            slab_w = min(2, m)
            in_slab = (
                jnp.arange(slab_w)[:, None] == (cursor // S - j_off)[None, :]
            ) & finishing[None, :]

            def write_final(buf, val):
                slab = jax.lax.dynamic_slice(
                    buf,
                    (j_off,) + (zero_i,) * (buf.ndim - 1),
                    (slab_w,) + buf.shape[1:],
                )
                mask = in_slab.reshape(in_slab.shape + (1,) * (buf.ndim - 2))
                slab = jnp.where(mask, val[None], slab)
                return jax.lax.dynamic_update_slice(
                    buf, slab, (j_off,) + (zero_i,) * (buf.ndim - 1)
                )

            finals = jax.tree.map(write_final, finals, out_state)

            grads = grads + jnp.sum(
                jnp.where(closed, machines.num_states, 0).astype(grads.dtype)
            )
            last_state = _bsel(closed, out_state, last_state)

            next_cursor = cursor + closed.astype(cursor.dtype)
            running = running & ~closed
            new_offset = jnp.minimum(
                jnp.min(jnp.where(next_cursor < T, next_cursor, T)),
                jnp.int32(T - W),
            )
            offset = jnp.maximum(offset, new_offset.astype(offset.dtype))

            restart = (
                active
                & ~running
                & (next_cursor < T)
                & (next_cursor - offset < W)
            )
            t_next = jnp.minimum(next_cursor % S, S - 1)
            chain_next = jnp.clip(
                jnp.arange(P) + (next_cursor // S) * P, 0, num_chains - 1
            )
            next_keys = rng_keys[t_next, chain_next]
            # a cursor crossing a chain boundary restarts from that chain's
            # INITIAL state; otherwise from the state captured at close
            new_chain = next_cursor % S == 0
            base_pos = _bsel(
                new_chain,
                jax.tree.map(lambda x: x[chain_next], init_states.position),
                last_state.position,
            )
            base_ld = jnp.where(
                new_chain, init_states.logdensity[chain_next], last_state.logdensity
            )
            base_ldg = _bsel(
                new_chain,
                jax.tree.map(lambda x: x[chain_next], init_states.logdensity_grad),
                last_state.logdensity_grad,
            )
            fresh = jax.vmap(start_transition_from)(next_keys, base_pos, base_ld, base_ldg)
            slim_fresh = fresh._replace(ckpt_momentum=(), ckpt_momentum_sum=())
            slim_mach = machines._replace(ckpt_momentum=(), ckpt_momentum_sum=())
            merged = _bsel(restart, slim_fresh, slim_mach)
            machines = merged._replace(
                ckpt_momentum=machines.ckpt_momentum,
                ckpt_momentum_sum=machines.ckpt_momentum_sum,
            )
            running = running | restart
            return machines, next_cursor, running, offset, last_state, hist, finals, grads

        machines, cursor, running, offset, last_state, hist, finals, grads = (
            jax.lax.while_loop(
                cond,
                _unrolled(body),
                (machines, cursor0, running0, offset0, last0, hist0, finals0, grads0),
            )
        )
        # unpermute cursor-major (T, P, k) -> chain-major (C, S, k): cursor
        # g = j*S + t of slot s belongs to chain c = s + j*P at step t
        hist_chains = (
            hist.reshape(m, S, P, hist.shape[-1])
            .transpose(2, 0, 1, 3)  # (P, m, S, k), rows [s, j]
            .swapaxes(0, 1)  # (m, P, S, k): flatten -> c = j*P + s
            .reshape(num_chains, S, hist.shape[-1])
        )
        # (m, P, ...) flattens row-major straight to chain order c = j*P + s
        final_states = jax.tree.map(
            lambda x: x.reshape((num_chains,) + x.shape[2:]), finals
        )
        return final_states, hist_chains, grads

    def run(rng_keys, init_states):
        num_chains = jax.tree.leaves(init_states.position)[0].shape[0]
        S = num_steps

        machines = jax.vmap(start_transition)(rng_keys[0], init_states)
        track_shape = jax.eval_shape(
            track_fn, jax.tree.map(lambda x: x[0], machines.proposal.state)
        )
        # constant-initialized carries are promoted with a data-derived zero
        # so their varying-manual-axes type matches the loop body under
        # shard_map (see trajectory._with_vma_of); a no-op unsharded
        vz = jax.tree.leaves(init_states.position)[0].ravel()[0] * 0
        vzi = vz.astype(jnp.int32)
        hist0 = (
            jnp.zeros((num_chains, S, track_shape.shape[0]), track_shape.dtype)
            + vz.astype(track_shape.dtype)
        )
        steps0 = jnp.zeros(num_chains, jnp.int32) + vzi
        grads_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        grads0 = jnp.zeros((), grads_dtype) + vzi.astype(grads_dtype)
        last0 = machines.proposal.state  # overwritten at each chain's close
        running0 = jnp.ones(num_chains, bool) | (vzi > 0)
        offset0 = jnp.zeros((), jnp.int32) + vzi
        # Optional sliding history window: chains pause before starting a
        # transition more than W steps ahead of the slowest chain, so
        # history writes stay inside W step-rows. MEASURED: at 4096 chains
        # the chain-step spread far exceeds any small W and the pausing
        # couples every chain to the slowest one (6x slowdown at W=64), so
        # the DEFAULT is the full width (no pausing); pass a window_size to
        # bound the per-iteration history traffic on long memory-bound runs.
        W = S if window_size is None else min(window_size, S)

        def cond(carry):
            _, steps, *_ = carry
            return jnp.any(steps < S)

        def body(carry, do_restart=True):
            machines, steps, running, offset, last_state, hist, grads = carry
            active = steps < S

            # advance EVERY machine one leaf. Paused and finished chains
            # keep evolving garbage, deliberately: every consumer below is
            # masked on `closed = done & running`, and the returned chain
            # state comes from the dedicated `last_state` carry — so the
            # expensive full-carry freeze select is unnecessary.
            machines = jax.vmap(machine_leaf, (0, None))(machines, step_size)

            closed = machines.done & running
            out_state = machines.proposal.state
            vals = jax.vmap(track_fn)(out_state).astype(hist.dtype)
            # one-hot masked write restricted to the sliding window (TPU
            # scatters serialize per index — 287us/iter measured — and a
            # full-width masked write costs the whole buffer's traffic)
            if W == S:
                in_window = (jnp.arange(S)[None, :] == steps[:, None]) & closed[:, None]
                hist = jnp.where(in_window[:, :, None], vals[:, None, :], hist)
            else:
                zero_i = jnp.zeros((), offset.dtype)
                window = jax.lax.dynamic_slice(
                    hist, (zero_i, offset, zero_i), (num_chains, W, hist.shape[-1])
                )
                in_window = (
                    jnp.arange(W)[None, :] == (steps - offset)[:, None]
                ) & closed[:, None]
                window = jnp.where(in_window[:, :, None], vals[:, None, :], window)
                hist = jax.lax.dynamic_update_slice(
                    hist, window, (zero_i, offset, zero_i)
                )
            grads = grads + jnp.sum(
                jnp.where(closed, machines.num_states, 0).astype(grads.dtype)
            )
            last_state = _bselect(closed, out_state, last_state)

            next_steps = steps + closed.astype(steps.dtype)
            running = running & ~closed
            # the window only moves forward; keep it inside the buffer
            new_offset = jnp.minimum(
                jnp.min(jnp.where(next_steps < S, next_steps, S)),
                jnp.int32(S - W),
            )
            offset = jnp.maximum(offset, new_offset.astype(offset.dtype))

            if do_restart:
                # restart any non-running active chain whose next transition
                # still writes inside the window (newly closed or parked)
                restart = (
                    active
                    & ~running
                    & (next_steps < S)
                    & (next_steps - offset < W)
                )
                next_keys = rng_keys[
                    jnp.minimum(next_steps, S - 1), jnp.arange(num_chains)
                ]
                # restart from the state captured AT close (last_state): a
                # parked chain's machine keeps garbage-evolving after done,
                # so its proposal.state is not readable when it restarts
                fresh = jax.vmap(start_transition)(next_keys, last_state)
                # the checkpoint slot scheme never reads a slot that was not
                # written earlier in the SAME subtree (slot 0 is rewritten
                # at every subtree's leaf 0), so stale buffers from the
                # previous transition are harmless — skip the (K, d) select
                slim_fresh = fresh._replace(ckpt_momentum=(), ckpt_momentum_sum=())
                slim_mach = machines._replace(ckpt_momentum=(), ckpt_momentum_sum=())
                merged = _bselect(restart, slim_fresh, slim_mach)
                machines = merged._replace(
                    ckpt_momentum=machines.ckpt_momentum,
                    ckpt_momentum_sum=machines.ckpt_momentum_sum,
                )
                running = running | restart
            return machines, next_steps, running, offset, last_state, hist, grads

        machines, steps, running, offset, last_state, hist, grads = (
            jax.lax.while_loop(
                cond,
                _unrolled(body),
                (machines, steps0, running0, offset0, last0, hist0, grads0),
            )
        )
        return last_state, hist, grads

    return run_oversubscribed if oversubscription > 1 else run
