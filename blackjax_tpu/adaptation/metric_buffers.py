"""Buffer layer for metric adaptation: CGL-mergeable moment blocks instead
of raw draw rings.

Behavioral parity target: ``blackjax/adaptation/metric_buffers.py``
(``MomentBlock`` :171, Chan-Golub-LeVeque merge :334, batch fold :396, block
ring :454, policies: hard-reset window :809, split-granular accumulating
ring :861, ensemble batch feed :918, late start :992).

Design: every policy is a fixed-shape scan-carry-safe state machine exposing
the :class:`MetricBuffer` callable bundle. Blocks store O(d) / O(d^2)
sufficient statistics ``(count, mean, M2)``; merging blocks reconstructs the
window estimate, and dropping the oldest block implements exact
split-granular forgetting. Ensemble ``(n_chains, d)`` batches fold all
chains into the active block (a "split" partitions the draw axis, never the
chain axis) — between-chain dispersion deliberately enters the covariance.
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from blackjax_tpu.types import Array

__all__ = [
    "MetricBuffer",
    "MomentBlock",
    "RawDrawRingState",
    "cgl_merge_two",
    "cgl_update_batch",
    "merge_block_ring",
    "diag_from_moment_block",
    "raw_draw_ring_buffer",
    "reset_window_buffer",
    "accumulating_split_pop_buffer",
    "ensemble_batch_buffer",
    "late_start",
]


class MetricBuffer(NamedTuple):
    """A buffer policy: init / update(batch) / push_split (finalize the
    active accumulation) / get_moments (merged block) / get_support /
    get_diag_reference (Bessel variance for the step-size proxy channel)."""

    init: Callable
    update: Callable
    push_split: Callable
    get_moments: Callable
    get_support: Callable
    get_diag_reference: Callable


class MomentBlock(NamedTuple):
    """CGL sufficient statistics: ``m2`` is the SUM of squared deviations
    (dense ``(d, d)`` or diagonal ``(d,)``), not the covariance."""

    count: Array
    mean: Array
    m2: Array


def cgl_merge_two(block_a: MomentBlock, block_b: MomentBlock) -> MomentBlock:
    """Exact parallel merge (Chan, Golub & LeVeque 1983); empty blocks
    (count 0) are absorbed correctly."""
    n_a, n_b = block_a.count, block_b.count
    n_ab = n_a + n_b
    delta = block_b.mean - block_a.mean
    safe_n = jnp.where(n_ab > 0, n_ab, jnp.ones_like(n_ab))

    mean_ab = block_a.mean + delta * (n_b / safe_n)
    if block_a.m2.ndim == 1:
        cross = delta * delta * (n_a * n_b / safe_n)
    else:
        cross = jnp.outer(delta, delta) * (n_a * n_b / safe_n)
    m2_ab = block_a.m2 + block_b.m2 + cross

    mean_ab = jnp.where(n_ab > 0, mean_ab, jnp.zeros_like(mean_ab))
    m2_ab = jnp.where(n_ab > 0, m2_ab, jnp.zeros_like(m2_ab))
    return MomentBlock(n_ab, mean_ab, m2_ab)


def cgl_update_batch(
    block: MomentBlock, batch: Array, axis_name: Optional[str] = None
) -> MomentBlock:
    """Fold a raw ``(n_b, d)`` batch into a block (inline batch statistics,
    no temporary block allocation). With ``axis_name`` the batch is pooled
    over the named mesh axis too (one psum per moment), so a sharded chain
    block feeds ONE replicated global block."""
    n_a = block.count
    n_b = jnp.asarray(batch.shape[0], dtype=n_a.dtype)
    if axis_name is None:
        mean_b = jnp.mean(batch, axis=0)
    else:
        n_b = n_b * jax.lax.axis_size(axis_name)
        mean_b = jax.lax.psum(jnp.sum(batch, axis=0), axis_name) / n_b
    centered = batch - mean_b[None, :]
    if block.m2.ndim == 1:
        m2_b = jnp.sum(centered**2, axis=0)
    else:
        m2_b = centered.T @ centered
    if axis_name is not None:
        m2_b = jax.lax.psum(m2_b, axis_name)
    return cgl_merge_two(block, MomentBlock(n_b, mean_b, m2_b))


def merge_block_ring(counts: Array, means: Array, m2s: Array) -> MomentBlock:
    """Reduce a ring of k blocks into one; k = 1 short-circuits to a slice
    (no scan compiled)."""
    k = counts.shape[0]
    if k == 1:
        return MomentBlock(counts[0], means[0], m2s[0])

    zero = MomentBlock(
        jnp.zeros((), counts.dtype),
        jnp.zeros(means.shape[1:], means.dtype),
        jnp.zeros(m2s.shape[1:], m2s.dtype),
    )

    def step(acc, i):
        return cgl_merge_two(acc, MomentBlock(counts[i], means[i], m2s[i])), None

    merged, _ = jax.lax.scan(step, zero, jnp.arange(k))
    return merged


def diag_from_moment_block(block: MomentBlock) -> Array:
    """Bessel-corrected per-coordinate variance; ones when count < 2 (the
    isotropic fallback a step-size proxy needs instead of 0 or NaN)."""
    denom = jnp.maximum(block.count - 1.0, 1.0)
    var = (jnp.diag(block.m2) if block.m2.ndim == 2 else block.m2) / denom
    return jnp.where(block.count >= 2, var, jnp.ones_like(var))


class AccumulatingSplitPopState(NamedTuple):
    """Ring of k blocks: one active (at ``write_pos``) plus up to k-1
    completed; wrapping overwrites (forgets) the oldest split."""

    counts: Array  # (k,)
    means: Array  # (k, d)
    m2s: Array  # (k, d, d) or (k, d)
    write_pos: Array  # () int32


class LateStartState(NamedTuple):
    inner: NamedTuple
    num_skipped: Array


class RawDrawRingState(NamedTuple):
    """Circular raw-draw window: the last ``capacity`` rows, masked while
    filling. ``count`` is the lifetime total (support); ``write_pos`` the
    next slot."""

    draws: Array  # (capacity, d)
    count: Array  # () float — lifetime rows written
    write_pos: Array  # () int32


def raw_draw_ring_buffer(d: int, capacity: int) -> MetricBuffer:
    """Raw-draw ring for ``requires_draws`` estimators (the draws-SVD
    low-rank pilot, :func:`blackjax_tpu.adaptation.metric_estimators.
    draws_singular_value_low_rank`).

    Behavioral counterpart of the reference's raw-draw accumulating ring
    (``blackjax/adaptation/metric_buffers.py:861`` ff.), with one deliberate
    divergence: forgetting is row-granular (a fixed ``capacity``-row window)
    rather than split-granular — a static-shape circular write instead of a
    per-split row inventory, which is what a scan-resident TPU warmup wants.
    ``push_split`` is therefore a no-op.

    ``get_moments`` masks unfilled slots, so the block is exact over the
    valid rows; the draws themselves are exposed through the state for the
    SVD path (zero-masked rows contribute nothing to ``X^T X``, so a masked
    SVD is exact too).
    """
    if capacity < 2:
        raise ValueError(f"capacity must be >= 2, got {capacity}")

    def init() -> RawDrawRingState:
        return RawDrawRingState(
            jnp.zeros((capacity, d)), jnp.zeros(()), jnp.zeros((), jnp.int32)
        )

    def update(state: RawDrawRingState, batch: Array) -> RawDrawRingState:
        if batch.ndim == 1:
            batch = batch[None, :]
        rows = batch.shape[0]
        if rows > capacity:
            raise ValueError(
                f"batch of {rows} rows exceeds ring capacity {capacity}"
            )
        # wrap each row independently (one-hot scatter keeps this a dense
        # static-shape op; rows is small)
        slots = (state.write_pos + jnp.arange(rows)) % capacity
        draws = state.draws.at[slots].set(batch)
        return RawDrawRingState(
            draws, state.count + rows, (state.write_pos + rows) % capacity
        )

    def push_split(state: RawDrawRingState) -> RawDrawRingState:
        return state  # row-granular window: split boundaries don't forget

    def valid_mask(state: RawDrawRingState) -> Array:
        return jnp.arange(capacity) < jnp.minimum(state.count, capacity)

    def get_moments(state: RawDrawRingState) -> MomentBlock:
        mask = valid_mask(state)
        n = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(jnp.where(mask[:, None], state.draws, 0.0), axis=0) / n
        centered = jnp.where(mask[:, None], state.draws - mean[None, :], 0.0)
        return MomentBlock(jnp.sum(mask), mean, centered.T @ centered)

    def get_support(state: RawDrawRingState):
        n_valid = jnp.minimum(state.count, capacity)
        # mask in the buffer's own float dtype (hard-coding float64 raises
        # under jax_enable_x64=False)
        return n_valid, valid_mask(state).astype(state.draws.dtype)

    def get_diag_reference(state: RawDrawRingState) -> Array:
        return diag_from_moment_block(get_moments(state))

    return MetricBuffer(
        init, update, push_split, get_moments, get_support, get_diag_reference
    )


def _make_ring_buffer(
    d: int,
    k: int,
    diagonal: bool,
    n_chains_per_update: Optional[int],
    requires_draws: bool,
) -> MetricBuffer:
    if requires_draws:
        # raw rows instead of moment blocks; k doubles as the row capacity
        # multiplier (k splits of nominal size d/2 rows ~ the reference's
        # split sizing) — callers wanting exact control use
        # raw_draw_ring_buffer directly
        return raw_draw_ring_buffer(d, max(2, k * max(d // 2, 2)))
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m2_shape = (d,) if diagonal else (d, d)

    def init() -> AccumulatingSplitPopState:
        return AccumulatingSplitPopState(
            counts=jnp.zeros((k,)),
            means=jnp.zeros((k, d)),
            m2s=jnp.zeros((k,) + m2_shape),
            write_pos=jnp.zeros((), jnp.int32),
        )

    def update(state: AccumulatingSplitPopState, batch: Array):
        if batch.ndim == 1:
            batch = batch[None, :]
        if n_chains_per_update is not None and batch.shape[0] != n_chains_per_update:
            raise ValueError(
                f"ensemble_batch_buffer expects batch.shape[0]="
                f"{n_chains_per_update}, got {batch.shape[0]}; partial batches "
                "are not supported."
            )
        wp = state.write_pos
        updated = cgl_update_batch(
            MomentBlock(state.counts[wp], state.means[wp], state.m2s[wp]), batch
        )
        return AccumulatingSplitPopState(
            state.counts.at[wp].set(updated.count),
            state.means.at[wp].set(updated.mean),
            state.m2s.at[wp].set(updated.m2),
            wp,
        )

    def push_split(state: AccumulatingSplitPopState):
        """Advance the ring to a fresh slot (zeroing the oldest on wrap).
        For k = 1 this is the Stan hard-reset. Read moments BEFORE pushing."""
        new_wp = (state.write_pos + 1) % k
        return AccumulatingSplitPopState(
            state.counts.at[new_wp].set(0.0),
            state.means.at[new_wp].set(jnp.zeros(d)),
            state.m2s.at[new_wp].set(jnp.zeros(m2_shape)),
            new_wp,
        )

    def get_moments(state: AccumulatingSplitPopState) -> MomentBlock:
        return merge_block_ring(state.counts, state.means, state.m2s)

    def get_support(state: AccumulatingSplitPopState):
        return jnp.sum(state.counts), state.counts

    def get_diag_reference(state: AccumulatingSplitPopState) -> Array:
        return diag_from_moment_block(get_moments(state))

    return MetricBuffer(init, update, push_split, get_moments, get_support, get_diag_reference)


def reset_window_buffer(
    d: int, *, diagonal: bool = False, requires_draws: bool = False
) -> MetricBuffer:
    """Stan semantics: one block, hard reset at every split boundary."""
    return _make_ring_buffer(d, 1, diagonal, None, requires_draws)


def accumulating_split_pop_buffer(
    d: int, k: int, *, diagonal: bool = False, requires_draws: bool = False
) -> MetricBuffer:
    """Rolling window of the last k splits with exact split-granular
    forgetting (pop-oldest on wrap)."""
    return _make_ring_buffer(d, k, diagonal, None, requires_draws)


def ensemble_batch_buffer(
    d: int,
    n_chains: int,
    k: int = 1,
    *,
    diagonal: bool = False,
    requires_draws: bool = False,
) -> MetricBuffer:
    """Ensemble feed: every update folds a full ``(n_chains, d)`` snapshot
    into the active block (trace-time shape guard); splits partition time,
    never chains."""
    return _make_ring_buffer(d, k, diagonal, n_chains, requires_draws)


def late_start(inner_buffer: MetricBuffer, offset_steps: int) -> MetricBuffer:
    """Suppress the first ``offset_steps`` updates of each split (skip the
    still-transient draws right after a window boundary)."""

    def init(*args, **kwargs) -> LateStartState:
        return LateStartState(inner_buffer.init(*args, **kwargs), jnp.zeros(()))

    def update(state: LateStartState, batch: Array) -> LateStartState:
        skip = state.num_skipped < offset_steps
        new_inner = jax.tree.map(
            lambda skipped, updated: jnp.where(skip, skipped, updated),
            state.inner,
            inner_buffer.update(state.inner, batch),
        )
        return LateStartState(
            new_inner, jnp.minimum(state.num_skipped + 1.0, float(offset_steps))
        )

    def push_split(state: LateStartState) -> LateStartState:
        return LateStartState(inner_buffer.push_split(state.inner), jnp.zeros(()))

    def get_moments(state: LateStartState):
        return inner_buffer.get_moments(state.inner)

    def get_support(state: LateStartState):
        return inner_buffer.get_support(state.inner)

    def get_diag_reference(state: LateStartState):
        return inner_buffer.get_diag_reference(state.inner)

    return MetricBuffer(init, update, push_split, get_moments, get_support, get_diag_reference)
