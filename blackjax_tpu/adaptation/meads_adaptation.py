"""MEADS: Maximum-Eigenvalue Adaptation of Damping and Step size for
generalized HMC (Hoffman & Sountsov 2022, Algorithm 3).

K-fold cross-chain scheme: chains are split into K folds; at step t fold
``t mod K`` is frozen, each fold's step size comes from its left neighbor's
preconditioned-gradient eigenvalue estimate, damping from the fold's own
positions, and all chains reshuffle across folds every K steps.

Behavioral parity target: ``blackjax/adaptation/meads_adaptation.py``
(state :31, base :55, ``meads_adaptation`` :316, ``maximum_eigenvalue``
:790, opt-in pooled low-rank momentum metric :323-420 with the
window-accumulated covariance, the 2d support gate, the epsilon-decouple
fix [step size never whitened by the low-rank basis] and the eigenvalue
floor :292-313).
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.adaptation.base import AdaptationResults, return_all_adapt_info
from blackjax_tpu.adaptation.metric_buffers import MomentBlock, cgl_update_batch
from blackjax_tpu.parallel.exchange import ring_gather
from blackjax_tpu.adaptation.metric_estimators import sample_covariance_eigh_low_rank
from blackjax_tpu.base import AdaptationAlgorithm
from blackjax_tpu.mcmc import ghmc
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey

__all__ = ["MEADSAdaptationState", "base", "meads_adaptation", "maximum_eigenvalue"]

# rank-deficient ensembles can give lam ~ 0 (or slightly negative from f32
# eigh) whose sqrt is NaN in the whitening transforms
_LRD_EIGENVALUE_FLOOR = 1e-6


def _axis_mean(x: Array, axis_name: Optional[str] = None, axis_index_groups=None):
    """Mean over the leading (chain) axis, completed over the named mesh
    axis (optionally per group of devices) when given."""
    if axis_name is None:
        return jnp.mean(x, axis=0)
    total = jax.lax.psum(
        jnp.sum(x, axis=0), axis_name, axis_index_groups=axis_index_groups
    )
    group = (
        jax.lax.axis_size(axis_name)
        if axis_index_groups is None
        else len(axis_index_groups[0])
    )
    return total / (x.shape[0] * group)


def _low_rank_apply(element: Array, U: Array, lam_pow: Array) -> Array:
    """Batched ``element + U @ ((lam_pow - 1) (U^T element))`` over (n, d)
    rows — the O(dk) low-rank operator shared by the whitening paths."""
    coeff = element @ U
    return element + (coeff * (lam_pow - 1.0)) @ U.T


def _low_rank_precondition_pos(pos, sigma, U, lam):
    """``M^{1/2} pos`` for the low-rank metric; reduces to ``pos / sigma``
    at ``lam == 1`` (bit-for-bit the diagonal path)."""
    return _low_rank_apply(pos, U, 1.0 / jnp.sqrt(lam)) / sigma


def _ensemble_std(flat_positions: Array, axis_name=None) -> Array:
    """Population std over the (possibly sharded) chain axis. Kept OUTSIDE
    the lax.cond branches below: a collective may not appear in only one
    branch of a conditional."""
    mu = _axis_mean(flat_positions, axis_name)
    return jnp.sqrt(_axis_mean((flat_positions - mu) ** 2, axis_name))


def _lrd_diagonal_fallback(ensemble_sigma: Array, k: int):
    """Pre-window fallback: a single ensemble snapshot is p >> n
    noise-dominated, so return a PURELY diagonal metric (``lam = 1`` makes
    the low-rank correction vanish; U's columns multiply a zero coefficient
    and any orthonormal set works)."""
    sigma = jnp.where(ensemble_sigma <= 0.0, 1.0, ensemble_sigma)
    d = ensemble_sigma.shape[-1]
    return sigma, jnp.eye(d, k), jnp.ones((k,))


class MEADSAdaptationState(NamedTuple):
    """Per-fold GHMC parameters."""

    current_iteration: int
    step_size: Array  # (num_folds,)
    position_sigma: ArrayLikeTree  # leaves (num_folds, ...)
    alpha: Array
    delta: Array


def maximum_eigenvalue(
    matrix: ArrayLikeTree,
    axis_name: Optional[str] = None,
    axis_index_groups=None,
) -> Array:
    """Low-variance estimate of the largest eigenvalue of the second-moment
    matrix of a batch of vectors: the unbiased ratio
    ``E[sum lambda_i^2] / E[sum lambda_i]``.

    Two algebraically IDENTICAL evaluations (``sum(gram^2) - sum(diag^2) =
    ||X^T X||_F^2 - sum_i ||x_i||^4``):

    - the (n, n) Gram form (the reference's, ``meads_adaptation.py:790``) —
      O(n^2 d), right when chains are few;
    - the (d, d) covariance form — one ``X^T X`` matmul (MXU-shaped),
      O(n d^2), right for the many-chain TPU regime, and the only form whose
      cross-device completion is a single O(d^2) ``psum`` when the batch is
      sharded over ``axis_name`` (optionally per fold via
      ``axis_index_groups``).
    """
    X = jax.vmap(lambda m: ravel_pytree(m)[0])(matrix)
    n, d = X.shape
    if axis_name is None and n <= d:
        gram = X @ X.T
        diag = jnp.diagonal(gram)
        first_moment = jnp.sum(diag) / n
        second_moment = (jnp.sum(gram**2) - jnp.sum(diag**2)) / (n * (n - 1))
        return second_moment / first_moment

    def complete(x):
        if axis_name is None:
            return x
        return jax.lax.psum(x, axis_name, axis_index_groups=axis_index_groups)

    if axis_name is not None:
        group = (
            jax.lax.axis_size(axis_name)
            if axis_index_groups is None
            else len(axis_index_groups[0])
        )
        n = n * group
    C = complete(X.T @ X)  # (d, d) second-moment matrix (unnormalized)
    row_sq = jnp.sum(X**2, axis=1)
    sum_diag_sq = complete(jnp.sum(row_sq**2))
    first_moment = jnp.trace(C) / n
    second_moment = (jnp.sum(C**2) - sum_diag_sq) / (n * (n - 1))
    return second_moment / first_moment


def base(
    num_folds: int = 4,
    step_size_multiplier: float = 0.5,
    damping_slowdown: float = 1.0,
    axis_name: Optional[str] = None,
):
    """Return ``(init, update)`` of the MEADS controller over per-fold
    parameter arrays. With ``axis_name`` the ensemble statistics pool over
    the named mesh axis (positions are this device's chain block)."""
    if num_folds < 1:
        raise ValueError(f"num_folds must be >= 1, got {num_folds}.")

    def compute_parameters(positions, logdensity_grad, current_iteration):
        mean_position = jax.tree.map(
            lambda p: _axis_mean(p, axis_name), positions
        )
        sd_position = jax.tree.map(
            lambda p, mu: jnp.sqrt(_axis_mean((p - mu) ** 2, axis_name)),
            positions,
            mean_position,
        )
        normalized = jax.tree.map(
            lambda p, mu, sd: (p - mu) / sd, positions, mean_position, sd_position
        )
        scaled_grads = jax.tree.map(lambda g, sd: g * sd, logdensity_grad, sd_position)

        # Alg. 3 line 8: step size from the largest curvature of the
        # preconditioned gradients
        epsilon = jnp.minimum(
            step_size_multiplier
            / jnp.sqrt(maximum_eigenvalue(scaled_grads, axis_name)),
            1.0,
        )
        # lines 9-10: damping from the slowest direction of the ensemble,
        # floored early in the run
        gamma = jnp.maximum(
            1.0 / jnp.sqrt(maximum_eigenvalue(normalized, axis_name)),
            damping_slowdown / ((current_iteration + 1) * epsilon),
        )
        alpha = 1.0 - jnp.exp(-2.0 * epsilon * gamma)
        return epsilon, sd_position, alpha, alpha / 2.0

    def init(positions: ArrayLikeTree, logdensity_grad: ArrayLikeTree):
        step_size, sd_position, alpha, delta = compute_parameters(
            positions, logdensity_grad, 0
        )
        return MEADSAdaptationState(
            0,
            jnp.full((num_folds,), step_size),
            jax.tree.map(lambda s: jnp.repeat(s[None], num_folds, axis=0), sd_position),
            jnp.full((num_folds,), alpha),
            jnp.full((num_folds,), delta),
        )

    def update(
        adaptation_state: MEADSAdaptationState,
        positions: ArrayLikeTree,
        logdensity_grad: ArrayLikeTree,
        source_fold: int,
    ) -> MEADSAdaptationState:
        """Write parameters computed from ``source_fold``'s chains into the
        slot of fold ``source_fold + 1``."""
        target = (source_fold + 1) % num_folds
        t = adaptation_state.current_iteration
        step_size, sigma, alpha, delta = compute_parameters(positions, logdensity_grad, t)
        return MEADSAdaptationState(
            t + 1,
            adaptation_state.step_size.at[target].set(step_size),
            jax.tree.map(
                lambda s, v: s.at[target].set(v), adaptation_state.position_sigma, sigma
            ),
            adaptation_state.alpha.at[target].set(alpha),
            adaptation_state.delta.at[target].set(delta),
        )

    return init, update


def meads_adaptation(
    logdensity_fn: Callable,
    num_chains: int,
    num_folds: int = 4,
    step_size_multiplier: float = 0.5,
    damping_slowdown: float = 1.0,
    adaptation_info_fn: Callable = return_all_adapt_info,
    low_rank_rank: Optional[int] = None,
    low_rank_window_fraction: float = 0.5,
    axis_name: Optional[str] = None,
) -> AdaptationAlgorithm:
    """Cross-chain MEADS warmup for GHMC. ``run(rng_key, positions,
    num_steps)`` takes positions with a leading ``(num_chains, ...)`` axis
    and returns tuned ``(step_size, momentum_inverse_scale, alpha, delta)``.

    ``low_rank_rank=k`` (MEADS-LRD, opt-in) replaces the per-fold diagonal
    momentum scale with ONE rank-k :class:`LowRankInverseMassMatrix` pooled
    over all chains, estimated from a covariance accumulated over the last
    ``low_rank_window_fraction`` of warmup (gated on 2d pooled samples; the
    pre-gate fallback is purely diagonal). The damping heuristic whitens by
    this shared metric; the step-size heuristic deliberately does NOT (a
    noisy eigenbasis couples epsilon to whichever direction it currently
    over-weights and collapses it at high d).

    ``axis_name`` shards the ensemble over a mesh axis (call ``run`` inside
    ``jax.shard_map`` with this device's chain block and a replicated key).
    The chain layout is fold-major and the axis size must be a multiple of
    ``num_folds``, so each device's block lies in exactly ONE fold: per-fold
    statistics complete with fold-grouped ``psum``s, the K cross-fold
    parameter vectors assemble with one one-hot ``psum``, and the every-K
    reshuffle is a ring exchange (no gather of the full ensemble anywhere).
    """
    if num_folds < 1:
        raise ValueError(f"num_folds must be >= 1, got {num_folds}.")
    if num_chains % num_folds != 0:
        raise ValueError(
            f"num_chains ({num_chains}) must be divisible by num_folds ({num_folds})."
        )
    n_per_fold = num_chains // num_folds

    low_rank_k: Optional[int] = None
    if low_rank_rank is not None:
        low_rank_k = min(low_rank_rank, num_chains - 1)
        if low_rank_k < 1:
            raise ValueError(
                f"low_rank_rank={low_rank_rank} needs num_chains - 1 >= 1 "
                f"(got num_chains={num_chains})."
            )
        if not 0.0 <= low_rank_window_fraction <= 1.0:
            raise ValueError(
                "low_rank_window_fraction must be in [0, 1], got "
                f"{low_rank_window_fraction}."
            )

    ghmc_kernel = ghmc.build_kernel()
    adapt_init, _ = base(
        num_folds, step_size_multiplier, damping_slowdown, axis_name=axis_name
    )
    batch_init = jax.vmap(lambda p, r: ghmc.init(p, logdensity_fn, r))

    def _global_lrd(lrd_accum, flat_all_pos, in_window):
        """Shared global (sigma, U, lam): window-accumulated eigh estimate
        once 2d pooled samples support it, else the diagonal fallback."""
        d = flat_all_pos.shape[-1]
        enough = lrd_accum.count >= 2 * d

        def from_accum(acc):
            payload = sample_covariance_eigh_low_rank(acc.m2, acc.count, low_rank_k)
            return payload.sigma, payload.U, payload.lam

        fallback_sigma = _ensemble_std(flat_all_pos, axis_name)
        sigma, U, lam = jax.lax.cond(
            jnp.logical_and(in_window, enough),
            from_accum,
            lambda _: _lrd_diagonal_fallback(fallback_sigma, low_rank_k),
            lrd_accum,
        )
        return sigma, U, jnp.maximum(lam, _LRD_EIGENVALUE_FLOOR)

    def one_step(carry, xs):
        rng_key, in_window = xs
        states, adaptation_state, lrd_accum = carry
        t = adaptation_state.current_iteration
        fold_to_skip = t % num_folds

        keys = jax.random.split(rng_key, num_chains + 1)
        chain_keys, shuffle_key = keys[:num_chains], keys[num_chains]

        def to_folds(x):
            return x.reshape((num_folds, n_per_fold) + x.shape[1:])

        folded_pos = jax.tree.map(to_folds, states.position)
        folded_grads = jax.tree.map(to_folds, states.logdensity_grad)
        folded_scales = jax.tree.map(lambda p: p.std(axis=1), folded_pos)
        precond_grads = jax.tree.map(
            lambda g, s: g * jnp.expand_dims(s, axis=1), folded_grads, folded_scales
        )

        def fold_step_size(grads_k):
            return jnp.minimum(
                step_size_multiplier / jnp.sqrt(maximum_eigenvalue(grads_k)), 1.0
            )

        step_size_own = jax.vmap(fold_step_size)(precond_grads)
        # fold k samples with the step size and momentum scale of fold k-1
        step_size_rolled = jnp.roll(step_size_own, 1)
        scales_rolled = jax.tree.map(lambda s: jnp.roll(s, 1, axis=0), folded_scales)

        # MEADS-LRD: one shared rank-k metric pooled over ALL chains — a
        # single fold's n_per_fold snapshot gives step-to-step eigenvector
        # jitter that destabilizes ghmc's persistent momentum. The step-size
        # heuristic above deliberately stays on the per-fold diagonal scale
        # (epsilon-decouple).
        if low_rank_rank is not None:
            flat_all_pos = jax.vmap(lambda p: ravel_pytree(p)[0])(states.position)
            new_lrd_accum = jax.lax.cond(
                in_window,
                lambda a: cgl_update_batch(a, flat_all_pos),
                lambda a: a,
                lrd_accum,
            )
            global_sigma, global_U, global_lam = _global_lrd(
                new_lrd_accum, flat_all_pos, in_window
            )
        else:
            new_lrd_accum = lrd_accum

        def fold_damping(pos_k, eps_k):
            centered = jax.tree.map(lambda p: p - p.mean(axis=0), pos_k)
            gamma = jnp.maximum(
                1.0 / jnp.sqrt(maximum_eigenvalue(centered)),
                damping_slowdown / ((t + 1) * eps_k),
            )
            alpha = 1.0 - jnp.exp(-2.0 * eps_k * gamma)
            return alpha, alpha / 2.0

        if low_rank_rank is not None:
            # damping whitens by the SAME shared metric ghmc samples with
            d = flat_all_pos.shape[-1]
            flat_folded_pos = flat_all_pos.reshape((num_folds, n_per_fold, d))
            precond_pos = jax.vmap(
                _low_rank_precondition_pos, in_axes=(0, None, None, None)
            )(flat_folded_pos, global_sigma, global_U, global_lam)
        else:
            precond_pos = jax.tree.map(
                lambda p, s: p / jnp.expand_dims(s, axis=1), folded_pos, folded_scales
            )
        alphas, deltas = jax.vmap(fold_damping)(precond_pos, step_size_rolled)

        chain_step_sizes = jnp.repeat(step_size_rolled, n_per_fold)
        if low_rank_rank is not None:
            # every chain gets the same global metric this step (no rolling:
            # there is only one metric)
            chain_momentum_scale = LowRankInverseMassMatrix(
                sigma=jnp.repeat(global_sigma[None], num_chains, axis=0),
                U=jnp.repeat(global_U[None], num_chains, axis=0),
                lam=jnp.repeat(global_lam[None], num_chains, axis=0),
            )
        else:
            chain_momentum_scale = jax.tree.map(
                lambda s: jnp.repeat(s, n_per_fold, axis=0), scales_rolled
            )
        chain_alphas = jnp.repeat(alphas, n_per_fold)
        chain_deltas = jnp.repeat(deltas, n_per_fold)

        new_states, info = jax.vmap(ghmc_kernel, in_axes=(0, 0, None, 0, 0, 0, 0))(
            chain_keys,
            states,
            logdensity_fn,
            chain_step_sizes,
            chain_momentum_scale,
            chain_alphas,
            chain_deltas,
        )

        if num_folds > 1:
            # frozen fold does not advance this step
            chain_is_skipped = jnp.repeat(
                jnp.arange(num_folds) == fold_to_skip, n_per_fold
            )

            def restore(new_val, old_val):
                mask = chain_is_skipped.reshape(
                    chain_is_skipped.shape + (1,) * (new_val.ndim - 1)
                )
                return jnp.where(mask, old_val, new_val)

            new_states = jax.tree.map(restore, new_states, states)

        new_adaptation_state = MEADSAdaptationState(
            t + 1, step_size_rolled, scales_rolled, alphas, deltas
        )

        if num_folds > 1:
            # reshuffle chains across folds every K steps
            perm = jax.random.permutation(shuffle_key, num_chains)
            new_states = jax.lax.cond(
                (t + 1) % num_folds == 0,
                lambda s: jax.tree.map(lambda x: x[perm], s),
                lambda s: s,
                new_states,
            )

        return (new_states, new_adaptation_state, new_lrd_accum), adaptation_info_fn(
            new_states, info, new_adaptation_state
        )

    # ---- sharded path ------------------------------------------------------
    # Chain layout is fold-major and each device's block lies in exactly one
    # fold, so per-fold statistics are fold-grouped psums; the (num_folds,)
    # parameter vectors assemble with a one-hot psum; the every-K reshuffle
    # is a ring exchange at the end of each K-step block (the scan runs over
    # blocks with the K inner steps unrolled, so no collective ever sits
    # inside a lax.cond branch).

    def _fold_topology():
        ndev = jax.lax.axis_size(axis_name)
        if ndev % num_folds != 0:
            raise ValueError(
                f"sharded MEADS needs the '{axis_name}' axis size ({ndev}) "
                f"to be a multiple of num_folds ({num_folds})."
            )
        me = jax.lax.axis_index(axis_name)
        dev_per_fold = ndev // num_folds
        groups = [
            [f * dev_per_fold + i for i in range(dev_per_fold)]
            for f in range(num_folds)
        ]
        return ndev, me, me // dev_per_fold, dev_per_fold, groups

    def sharded_one_step(carry, key, in_window, local_chains):
        states, adaptation_state, lrd_accum = carry
        t = adaptation_state.current_iteration
        fold_to_skip = t % num_folds
        ndev, me, my_fold, dev_per_fold, fold_groups = _fold_topology()

        # same global key stream as the vmap path (num_chains + 1 splits,
        # last one is the shuffle key); take our chain block
        keys = jax.random.split(key, num_chains + 1)
        chain_keys = jax.lax.dynamic_slice_in_dim(
            keys[:num_chains], me * local_chains, local_chains
        )
        shuffle_key = keys[num_chains]
        fold_onehot = jnp.arange(num_folds) == my_fold

        def fold_mean(x):
            return _axis_mean(x, axis_name, fold_groups)

        def fold_vector(value):
            """Replicated (num_folds,)+shape vector of each fold's value."""
            expand = fold_onehot.reshape((num_folds,) + (1,) * jnp.ndim(value))
            return (
                jax.lax.psum(jnp.where(expand, value[None], 0), axis_name)
                / dev_per_fold
            )

        # per-fold position scale (population std over the fold's chains)
        my_scale = jax.tree.map(
            lambda p: jnp.sqrt(fold_mean((p - fold_mean(p)) ** 2)),
            states.position,
        )
        precond_grads = jax.tree.map(
            lambda g, s: g * s, states.logdensity_grad, my_scale
        )
        my_raw_step = jnp.minimum(
            step_size_multiplier
            / jnp.sqrt(maximum_eigenvalue(precond_grads, axis_name, fold_groups)),
            1.0,
        )

        step_size_own = fold_vector(my_raw_step)
        step_size_rolled = jnp.roll(step_size_own, 1)
        my_eps = step_size_rolled[my_fold]
        scales_own = jax.tree.map(fold_vector, my_scale)
        scales_rolled = jax.tree.map(lambda s: jnp.roll(s, 1, axis=0), scales_own)
        my_momentum_scale = jax.tree.map(lambda s: s[my_fold], scales_rolled)

        if low_rank_rank is not None:
            flat_all_pos = jax.vmap(lambda p: ravel_pytree(p)[0])(states.position)
            updated = cgl_update_batch(lrd_accum, flat_all_pos, axis_name)
            new_lrd_accum = jax.tree.map(
                lambda a, b: jnp.where(in_window, a, b), updated, lrd_accum
            )
            global_sigma, global_U, global_lam = _global_lrd(
                new_lrd_accum, flat_all_pos, in_window
            )
            whitened = _low_rank_precondition_pos(
                flat_all_pos, global_sigma, global_U, global_lam
            )
            centered = whitened - fold_mean(whitened)
        else:
            new_lrd_accum = lrd_accum
            centered = jax.tree.map(
                lambda p, s: p / s - fold_mean(p / s), states.position, my_scale
            )
        gamma = jnp.maximum(
            1.0 / jnp.sqrt(maximum_eigenvalue(centered, axis_name, fold_groups)),
            damping_slowdown / ((t + 1) * my_eps),
        )
        my_alpha = 1.0 - jnp.exp(-2.0 * my_eps * gamma)
        my_delta = my_alpha / 2.0
        alphas = fold_vector(my_alpha)
        deltas = fold_vector(my_delta)

        if low_rank_rank is not None:
            momentum_scale = LowRankInverseMassMatrix(
                global_sigma, global_U, global_lam
            )
        else:
            momentum_scale = my_momentum_scale
        new_states, info = jax.vmap(
            ghmc_kernel, in_axes=(0, 0, None, None, None, None, None)
        )(chain_keys, states, logdensity_fn, my_eps, momentum_scale, my_alpha, my_delta)

        if num_folds > 1:
            skip = my_fold == fold_to_skip
            new_states = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(skip, (1,) * new.ndim), old, new
                ),
                new_states,
                states,
            )

        new_adaptation_state = MEADSAdaptationState(
            t + 1, step_size_rolled, scales_rolled, alphas, deltas
        )
        return (
            (new_states, new_adaptation_state, new_lrd_accum),
            adaptation_info_fn(new_states, info, new_adaptation_state),
            shuffle_key,
        )

    def sharded_block_step(carry, xs, local_chains):
        """num_folds inner steps (unrolled), then the cross-fold reshuffle as
        one ring exchange."""
        block_keys, block_windows = xs
        infos = []
        for j in range(num_folds):
            carry, info, shuffle_key = sharded_one_step(
                carry, block_keys[j], block_windows[j], local_chains
            )
            infos.append(info)

        states, adaptation_state, lrd_accum = carry
        if num_folds > 1:
            ndev, me, _, _, _ = _fold_topology()
            perm = jax.random.permutation(shuffle_key, num_chains)
            targets = jax.lax.dynamic_slice_in_dim(
                perm, me * local_chains, local_chains
            )
            states = ring_gather(states, targets, axis_name)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *infos)
        return (states, adaptation_state, lrd_accum), stacked

    def run(rng_key: PRNGKey, positions: ArrayLikeTree, num_steps: int = 1000):
        key_init, key_adapt = jax.random.split(rng_key)
        init_keys = jax.random.split(key_init, num_chains)
        if axis_name is not None:
            ndev = jax.lax.axis_size(axis_name)
            local_chains = num_chains // ndev
            init_keys = jax.lax.dynamic_slice_in_dim(
                init_keys, jax.lax.axis_index(axis_name) * local_chains, local_chains
            )
        init_states = batch_init(positions, init_keys)
        init_adaptation_state = adapt_init(positions, init_states.logdensity_grad)

        nonlocal low_rank_k
        if low_rank_rank is not None:
            flat_init = jax.vmap(lambda p: ravel_pytree(p)[0])(init_states.position)
            d = flat_init.shape[-1]
            # rank-d equals the dense metric; clamping keeps the two cond
            # branches shape-compatible
            low_rank_k = min(low_rank_k, d)
            window_start = int(low_rank_window_fraction * num_steps)
            init_lrd_accum = MomentBlock(
                jnp.zeros(()), jnp.zeros((d,)), jnp.zeros((d, d))
            )
        else:
            window_start = num_steps
            init_lrd_accum = MomentBlock(jnp.zeros(()), jnp.zeros(1), jnp.zeros(1))
        in_window_flags = jnp.arange(num_steps) >= window_start

        keys = jax.random.split(key_adapt, num_steps)
        if axis_name is None:
            (last_states, last_adaptation_state, last_lrd_accum), info = jax.lax.scan(
                one_step,
                (init_states, init_adaptation_state, init_lrd_accum),
                (keys, in_window_flags),
            )
        else:
            if num_steps % num_folds != 0:
                raise ValueError(
                    f"sharded MEADS runs in {num_folds}-step blocks; num_steps "
                    f"({num_steps}) must be a multiple of num_folds."
                )
            blocks = num_steps // num_folds
            (last_states, last_adaptation_state, last_lrd_accum), info = jax.lax.scan(
                lambda c, xs: sharded_block_step(c, xs, local_chains),
                (init_states, init_adaptation_state, init_lrd_accum),
                (
                    keys.reshape((blocks, num_folds) + keys.shape[1:]),
                    in_window_flags.reshape(blocks, num_folds),
                ),
            )
            # (blocks, num_folds, ...) -> (num_steps, ...)
            info = jax.tree.map(
                lambda a: a.reshape((num_steps,) + a.shape[2:]), info
            )

        if low_rank_rank is not None:
            flat_final = jax.vmap(lambda p: ravel_pytree(p)[0])(last_states.position)
            sigma, U, lam = _global_lrd(
                last_lrd_accum, flat_final, jnp.asarray(True)
            )
            momentum_inverse_scale = LowRankInverseMassMatrix(sigma, U, lam)
        else:
            momentum_inverse_scale = jax.tree.map(
                lambda s: s.mean(axis=0), last_adaptation_state.position_sigma
            )

        parameters = {
            "step_size": last_adaptation_state.step_size.mean(),
            "momentum_inverse_scale": momentum_inverse_scale,
            "alpha": last_adaptation_state.alpha.mean(),
            "delta": last_adaptation_state.delta.mean(),
        }
        return AdaptationResults(last_states, parameters), info

    return AdaptationAlgorithm(run)
