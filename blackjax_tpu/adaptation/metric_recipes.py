"""MetricCore plugin layer: pluggable inverse-mass-matrix estimators for the
staged warmup engine, plus the named recipe registry.

Behavioral parity target: ``blackjax/adaptation/metric_recipes.py``
(``MetricCore`` protocol :120, recipe dataclass with construction-time
``needs ⊆ provides`` validation :312-393, cores: welford :499, fisher diag
:548, fisher low-rank [nutpie Algorithm 1] :601, accumulating partial-forget
variant :703, sample-covariance low-rank [MEADS Scheme B] :873, registry
:961, sigma seeding :229).

A ``MetricCore`` is ``(init, update, final)`` over an opaque state exposing
``.inverse_mass_matrix``:

- ``init(n_dims) -> state``
- ``update(state, position, grad) -> state`` — streaming accumulation;
  accepts a single ``(d,)`` draw or an ``(M, d)`` chain block.
- ``final(state) -> state`` — slow-window boundary: recompute the IMM,
  reset/rotate the window buffer.
"""
import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.adaptation.mass_matrix import (
    FisherMassMatrixAdaptationState,
    mass_matrix_adaptation,
)
from blackjax_tpu.adaptation.metric_estimators import (
    _compute_low_rank_metric,
    fisher_score_diagonal_from_moments,
    sample_covariance_eigh_low_rank,
)
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.types import Array, ArrayLikeTree

__all__ = [
    "MetricCore",
    "MetricRecipe",
    "LowRankMetricCoreState",
    "REGISTRY",
    "lookup_recipe",
    "seed_low_rank_sigma_from_grad",
]


class MetricCore(NamedTuple):
    init: Callable
    update: Callable
    final: Callable


class LowRankMetricCoreState(NamedTuple):
    """Low-rank core state: the current payload plus a circular
    draw/gradient buffer and the partial-forget bookkeeping."""

    inverse_mass_matrix: LowRankInverseMassMatrix
    mu_star: Array
    draws_buffer: Array
    grads_buffer: Array
    buffer_idx: Array
    background_split: Array
    recompute_counter: Array


@dataclasses.dataclass(frozen=True)
class MetricRecipe:
    """A named, parameterized MetricCore constructor. ``needs`` declares the
    per-step inputs the core consumes and is validated against ``provides``
    at construction time — never inside a traced region."""

    name: str
    build_core: Callable  # (**kwargs) -> MetricCore
    needs: frozenset = frozenset({"positions"})
    provides: frozenset = frozenset({"positions", "gradients"})
    emits: str = "diag"  # "diag" | "dense" | "low_rank"
    provenance: str = ""

    def __post_init__(self):
        if not set(self.needs) <= set(self.provides):
            raise ValueError(
                f"Recipe {self.name!r} declares needs={set(self.needs)} outside "
                f"provides={set(self.provides)}."
            )

    @property
    def provides_dense(self) -> bool:
        return self.emits == "dense"


def seed_low_rank_sigma_from_grad(
    state: LowRankMetricCoreState, grad: ArrayLikeTree
) -> LowRankMetricCoreState:
    """nutpie's gradient-based init: seed ``sigma_i = 1/sqrt(|grad_i|)`` so
    the initial diagonal IMM is ``1/|grad_i|`` (a diagonal Hessian proxy at
    the starting point) instead of the identity."""
    grad_flat, _ = ravel_pytree(grad)
    sigma = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(grad_flat), 1e-20, 1e20))
    return state._replace(
        inverse_mass_matrix=state.inverse_mass_matrix._replace(sigma=sigma)
    )


def _shift_buffer_left(buf: Array, shift) -> Array:
    """Drop the first ``shift`` rows under the static-shape rule (pad with
    zeros, dynamic-slice forward)."""
    capacity = buf.shape[0]
    shift = jnp.clip(shift, 0, capacity)
    padded = jnp.concatenate([buf, jnp.zeros_like(buf)], axis=0)
    return jax.lax.dynamic_slice_in_dim(padded, shift, capacity, axis=0)


# ---------------------------------------------------------------------------
# Cores
# ---------------------------------------------------------------------------


def _build_welford_core(
    *,
    is_diagonal: bool,
    imm_shrinkage_to_previous: float = 0.0,
    initial_inverse_mass_matrix: Optional[Array] = None,
) -> MetricCore:
    mm_init, mm_update, mm_final = mass_matrix_adaptation(
        is_diagonal_matrix=is_diagonal,
        imm_shrinkage_to_previous=imm_shrinkage_to_previous,
        diagonal_estimator="welford",
    )

    def init(n_dims: int):
        return mm_init(n_dims, initial_inverse_mass_matrix)

    def update(state, position, grad=None):
        return mm_update(state, position, grad)

    return MetricCore(init, update, mm_final)


def _build_fisher_diag_core(
    *, initial_inverse_mass_matrix: Optional[Array] = None
) -> MetricCore:
    """Diagonal Fisher: IMM = sqrt(Var[x]/Var[grad]) from the window's
    accumulated moment block, stitched in at the boundary."""
    mm_init, mm_update, mm_final = mass_matrix_adaptation(
        is_diagonal_matrix=True, diagonal_estimator="fisher"
    )

    def init(n_dims: int):
        return mm_init(n_dims, initial_inverse_mass_matrix)

    def update(state, position, grad=None):
        return mm_update(state, position, grad)

    def final(state: FisherMassMatrixAdaptationState):
        block = state.fisher_block
        denom = jnp.maximum(block.count - 1.0, 1.0)
        new_imm = fisher_score_diagonal_from_moments(
            block.m2_x / denom, block.m2_g / denom
        )
        reset = mm_final(state)
        return FisherMassMatrixAdaptationState(new_imm, reset.fisher_block)

    return MetricCore(init, update, final)


def _low_rank_init(n_dims: int, buffer_size: int, max_rank: int) -> LowRankMetricCoreState:
    return LowRankMetricCoreState(
        inverse_mass_matrix=LowRankInverseMassMatrix(
            sigma=jnp.ones(n_dims),
            U=jnp.zeros((n_dims, max_rank)),
            lam=jnp.ones(max_rank),
        ),
        mu_star=jnp.zeros(n_dims),
        draws_buffer=jnp.zeros((buffer_size, n_dims)),
        grads_buffer=jnp.zeros((buffer_size, n_dims)),
        buffer_idx=jnp.zeros((), jnp.int32),
        background_split=jnp.zeros((), jnp.int32),
        recompute_counter=jnp.zeros((), jnp.int32),
    )


def _buffer_write(state: LowRankMetricCoreState, position, grad):
    """Write one (or a block of) draw/grad rows into the circular buffers."""
    pos_flat = jnp.atleast_2d(
        jax.vmap(lambda p: ravel_pytree(p)[0])(position)
        if jnp.ndim(jax.tree.leaves(position)[0]) > 1
        else ravel_pytree(position)[0]
    )
    grad_flat = jnp.atleast_2d(
        jax.vmap(lambda g: ravel_pytree(g)[0])(grad)
        if jnp.ndim(jax.tree.leaves(grad)[0]) > 1
        else ravel_pytree(grad)[0]
    )
    B = state.draws_buffer.shape[0]
    rows = pos_flat.shape[0]
    idx = state.buffer_idx % B
    zero = jnp.zeros((), idx.dtype)
    new_draws = jax.lax.dynamic_update_slice(state.draws_buffer, pos_flat, (idx, zero))
    new_grads = jax.lax.dynamic_update_slice(state.grads_buffer, grad_flat, (idx, zero))
    return new_draws, new_grads, state.buffer_idx + rows


def _build_fisher_low_rank_core(
    *,
    buffer_size: int,
    max_rank: int = 10,
    gamma: float = 1e-5,
    cutoff: float = 2.0,
) -> MetricCore:
    """Reset-policy Fisher low-rank core: accumulate draws/grads through the
    window, recompute the metric at the boundary, hard-reset the buffer."""

    def init(n_dims: int) -> LowRankMetricCoreState:
        return _low_rank_init(n_dims, buffer_size, max_rank)

    def update(state: LowRankMetricCoreState, position, grad=None):
        new_draws, new_grads, new_idx = _buffer_write(state, position, grad)
        return state._replace(
            draws_buffer=new_draws, grads_buffer=new_grads, buffer_idx=new_idx
        )

    def final(state: LowRankMetricCoreState) -> LowRankMetricCoreState:
        def recompute():
            return _compute_low_rank_metric(
                state.draws_buffer,
                state.grads_buffer,
                state.buffer_idx,
                max_rank,
                gamma,
                cutoff,
            )

        def keep():
            imm = state.inverse_mass_matrix
            return imm.sigma, state.mu_star, imm.U, imm.lam

        sigma, mu_star, U, lam = jax.lax.cond(state.buffer_idx >= 3, recompute, keep)
        return LowRankMetricCoreState(
            LowRankInverseMassMatrix(sigma, U, lam),
            mu_star,
            jnp.zeros_like(state.draws_buffer),
            jnp.zeros_like(state.grads_buffer),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )

    return MetricCore(init, update, final)


def _build_fisher_low_rank_accumulating_core(
    *,
    buffer_size: int,
    max_rank: int = 10,
    gamma: float = 1e-5,
    cutoff: float = 2.0,
    recompute_every: int = 1,
) -> MetricCore:
    """nutpie's partial-forget buffer (``switch`` semantics): mid-window
    periodic recomputes from the full buffer; at each boundary pop the
    previous background rows, force-recompute from the remainder, and mark
    it as the next background."""

    def init(n_dims: int) -> LowRankMetricCoreState:
        return _low_rank_init(n_dims, buffer_size, max_rank)

    def update(state: LowRankMetricCoreState, position, grad=None):
        new_draws, new_grads, new_idx = _buffer_write(state, position, grad)
        new_counter = state.recompute_counter + 1
        due = jnp.logical_and(new_counter % recompute_every == 0, new_idx >= 3)

        def recompute():
            return _compute_low_rank_metric(
                new_draws, new_grads, new_idx, max_rank, gamma, cutoff
            )

        def keep():
            imm = state.inverse_mass_matrix
            return imm.sigma, state.mu_star, imm.U, imm.lam

        sigma, mu_star, U, lam = jax.lax.cond(due, recompute, keep)
        next_counter = jnp.where(due, 0, new_counter)
        return LowRankMetricCoreState(
            LowRankInverseMassMatrix(sigma, U, lam),
            mu_star,
            new_draws,
            new_grads,
            new_idx,
            state.background_split,
            next_counter,
        )

    def final(state: LowRankMetricCoreState) -> LowRankMetricCoreState:
        shift = state.background_split
        new_draws = _shift_buffer_left(state.draws_buffer, shift)
        new_grads = _shift_buffer_left(state.grads_buffer, shift)
        new_n_valid = state.buffer_idx - shift

        def recompute():
            return _compute_low_rank_metric(
                new_draws, new_grads, new_n_valid, max_rank, gamma, cutoff
            )

        def keep():
            imm = state.inverse_mass_matrix
            return imm.sigma, state.mu_star, imm.U, imm.lam

        sigma, mu_star, U, lam = jax.lax.cond(new_n_valid >= 3, recompute, keep)
        return LowRankMetricCoreState(
            LowRankInverseMassMatrix(sigma, U, lam),
            mu_star,
            new_draws,
            new_grads,
            new_n_valid,
            new_n_valid,
            jnp.zeros((), jnp.int32),
        )

    return MetricCore(init, update, final)


def _build_sample_cov_low_rank_core(*, buffer_size: int, max_rank: int = 10) -> MetricCore:
    """Draws-only low-rank core (MEADS Scheme B): masked sample covariance
    of the window's draws, eigh, raw top-k."""

    def init(n_dims: int) -> LowRankMetricCoreState:
        return _low_rank_init(n_dims, buffer_size, max_rank)

    def update(state: LowRankMetricCoreState, position, grad=None):
        zeros_grad = jax.tree.map(jnp.zeros_like, position)
        new_draws, _, new_idx = _buffer_write(state, position, zeros_grad)
        return state._replace(draws_buffer=new_draws, buffer_idx=new_idx)

    def final(state: LowRankMetricCoreState) -> LowRankMetricCoreState:
        B, d = state.draws_buffer.shape
        n = state.buffer_idx
        mask = (jnp.arange(B) < n).astype(state.draws_buffer.dtype)
        n_safe = jnp.maximum(n, 2).astype(state.draws_buffer.dtype)
        mean = (mask[:, None] * state.draws_buffer).sum(0) / n_safe
        centered = mask[:, None] * (state.draws_buffer - mean[None, :])
        m2 = centered.T @ centered

        def recompute():
            payload = sample_covariance_eigh_low_rank(m2, n_safe, max_rank)
            return payload.sigma, jnp.zeros(d), payload.U, payload.lam

        def keep():
            imm = state.inverse_mass_matrix
            return imm.sigma, state.mu_star, imm.U, imm.lam

        sigma, mu_star, U, lam = jax.lax.cond(n >= 3, recompute, keep)
        return LowRankMetricCoreState(
            LowRankInverseMassMatrix(sigma, U, lam),
            mu_star,
            jnp.zeros_like(state.draws_buffer),
            jnp.zeros_like(state.grads_buffer),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )

    return MetricCore(init, update, final)


class DrawsSVDCoreState(NamedTuple):
    inverse_mass_matrix: LowRankInverseMassMatrix
    ring: "RawDrawRingState"


def _build_draws_svd_low_rank_core(
    *, capacity: int, max_rank: int = 10, min_support: int = 3
) -> MetricCore:
    """Streaming draws-SVD low-rank core (the MCLMC-LRD pilot estimator fed
    by the raw-draw ring): the ring PERSISTS across split boundaries with
    row-granular forgetting (last ``capacity`` draws), and the metric is
    recomputed at every boundary from the masked thin SVD.

    Closes the ``requires_draws`` gap (reference wiring:
    ``blackjax/adaptation/metric_buffers.py:861``,
    ``metric_estimators.py:468``)."""
    from blackjax_tpu.adaptation.metric_buffers import raw_draw_ring_buffer
    from blackjax_tpu.adaptation.metric_estimators import (
        draws_singular_value_low_rank,
    )

    def init(n_dims: int) -> DrawsSVDCoreState:
        ring = raw_draw_ring_buffer(n_dims, capacity)
        return DrawsSVDCoreState(
            LowRankInverseMassMatrix(
                sigma=jnp.ones(n_dims),
                U=jnp.zeros((n_dims, max_rank)),
                lam=jnp.ones(max_rank),
            ),
            ring.init(),
        )

    def update(state: DrawsSVDCoreState, position, grad=None):
        del grad
        ring = raw_draw_ring_buffer(state.ring.draws.shape[1], capacity)
        flat = jnp.atleast_2d(
            jax.vmap(lambda p: ravel_pytree(p)[0])(position)
            if jnp.ndim(jax.tree.leaves(position)[0]) > 1
            else ravel_pytree(position)[0]
        )
        return state._replace(ring=ring.update(state.ring, flat))

    def final(state: DrawsSVDCoreState) -> DrawsSVDCoreState:
        n_valid = jnp.minimum(state.ring.count, capacity)
        mask = jnp.arange(capacity) < n_valid

        def recompute():
            payload = draws_singular_value_low_rank(
                state.ring.draws, max_rank, row_mask=mask
            )
            return payload.sigma, payload.U, payload.lam

        def keep():
            imm = state.inverse_mass_matrix
            return imm.sigma, imm.U, imm.lam

        sigma, U, lam = jax.lax.cond(n_valid >= min_support, recompute, keep)
        return DrawsSVDCoreState(
            LowRankInverseMassMatrix(sigma, U, lam), state.ring
        )

    return MetricCore(init, update, final)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

REGISTRY: dict[str, MetricRecipe] = {
    "welford_diag": MetricRecipe(
        "welford_diag",
        lambda **kw: _build_welford_core(is_diagonal=True, **kw),
        needs=frozenset({"positions"}),
        emits="diag",
        provenance="Stan-default diagonal Welford covariance (the baseline).",
    ),
    "welford_dense": MetricRecipe(
        "welford_dense",
        lambda **kw: _build_welford_core(is_diagonal=False, **kw),
        needs=frozenset({"positions"}),
        emits="dense",
        provenance="Dense Welford covariance (O(d^2); small d with strong "
        "correlation structure).",
    ),
    "fisher_diag": MetricRecipe(
        "fisher_diag",
        lambda **kw: _build_fisher_diag_core(**kw),
        needs=frozenset({"positions", "gradients"}),
        emits="diag",
        provenance="Fisher diagonal sqrt(Var[x]/Var[grad]); situational — "
        "helps concentrated-anisotropy hierarchies, hurts correlated blocks.",
    ),
    "fisher_low_rank": MetricRecipe(
        "fisher_low_rank",
        lambda **kw: _build_fisher_low_rank_core(**kw),
        needs=frozenset({"positions", "gradients"}),
        emits="low_rank",
        provenance="Fisher-divergence low-rank (nutpie Algorithm 1); "
        "max_rank=10, gamma=1e-5, cutoff=2 defaults; prefer x64.",
    ),
    "fisher_low_rank_accumulating": MetricRecipe(
        "fisher_low_rank_accumulating",
        lambda **kw: _build_fisher_low_rank_accumulating_core(**kw),
        needs=frozenset({"positions", "gradients"}),
        emits="low_rank",
        provenance="nutpie partial-forget buffer variant with mid-window "
        "periodic recomputes.",
    ),
    "sample_cov_low_rank": MetricRecipe(
        "sample_cov_low_rank",
        lambda **kw: _build_sample_cov_low_rank_core(**kw),
        needs=frozenset({"positions"}),
        emits="low_rank",
        provenance="Draws-only sample-covariance eigh low-rank (MEADS "
        "Scheme B): raw top-k, no regularization.",
    ),
    "draws_svd_low_rank": MetricRecipe(
        "draws_svd_low_rank",
        lambda **kw: _build_draws_svd_low_rank_core(**kw),
        needs=frozenset({"positions"}),
        emits="low_rank",
        provenance="Streaming raw-draw ring + masked thin-SVD low-rank (the "
        "MCLMC-LRD pilot estimator); persists across splits with "
        "row-granular forgetting.",
    ),
}


def lookup_recipe(name: str) -> MetricRecipe:
    try:
        return REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown metric recipe {name!r}; available: {sorted(REGISTRY)}"
        ) from None
