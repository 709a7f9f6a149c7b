"""Iterative U-turn termination for NUTS (checkpointing scheme).

Behavioral parity target: ``blackjax/mcmc/termination.py`` (reference,
numpyro-style criterion at :31-106). Same mathematical scheme — O(max_depth
* d) checkpoint state, one store per even leaf, subtree checks at odd leaves
— but the check loop here is a *masked fixed-trip scan over all checkpoint
slots* instead of a data-dependent ``while_loop``: with max_depth ~ 10 slots
the masked form costs a handful of extra d-length dot products and keeps the
lockstep multi-chain NUTS loop free of nested dynamic control flow.

Scheme (leaves indexed 0.. within the current subtree):
- running flat momentum sum ``S_i`` after leaf i is carried by the caller;
- even leaf n stores ``(m_n, S_n)`` at slot ``popcount(n >> 1)``;
- odd leaf n checks subtrees of sizes 2, 4, ... ending at n: slots
  ``idx_min .. idx_max`` with ``idx_max = popcount(n >> 1)`` and
  ``idx_min = idx_max - trailing_ones(n) + 1``; the subtree momentum sum is
  reconstructed as ``S_n - S_stored + m_stored``.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.types import Array

__all__ = ["IterativeUTurnState", "iterative_uturn"]


class IterativeUTurnState(NamedTuple):
    momentum_ckpts: Array  # (max_depth, d)
    momentum_sum_ckpts: Array  # (max_depth, d)
    idx_min: Array
    idx_max: Array


def _checkpoint_slots(leaf_idx):
    """(idx_min, idx_max) checkpoint slot range for a leaf index."""
    idx_max = jnp.bitwise_count(leaf_idx >> 1).astype(jnp.int32)
    trailing_ones = jnp.bitwise_count(((~leaf_idx) & (leaf_idx + 1)) - 1).astype(
        jnp.int32
    )
    return idx_max - trailing_ones + 1, idx_max


def iterative_uturn(is_turning):
    """Return ``(new_state, update, is_criterion_met)`` implementing the
    checkpointing U-turn criterion for a given metric ``is_turning``."""

    def new_state(chain_state, max_num_doublings) -> IterativeUTurnState:
        flat, _ = ravel_pytree(chain_state.position)
        d = flat.shape[0]
        zeros = jnp.zeros((max_num_doublings, d), dtype=flat.dtype)
        return IterativeUTurnState(
            zeros, zeros, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)
        )

    def update(state: IterativeUTurnState, momentum_sum, momentum, leaf_idx):
        r, _ = ravel_pytree(momentum)
        r_sum, _ = ravel_pytree(momentum_sum)
        idx_min, idx_max = _checkpoint_slots(leaf_idx)
        is_even = (leaf_idx % 2) == 0
        # masked store: write slot idx_max only on even leaves
        row = jax.lax.broadcasted_iota(jnp.int32, state.momentum_ckpts.shape, 0)
        write = is_even & (row == idx_max)
        momentum_ckpts = jnp.where(write, r[None, :], state.momentum_ckpts)
        momentum_sum_ckpts = jnp.where(write, r_sum[None, :], state.momentum_sum_ckpts)
        return IterativeUTurnState(momentum_ckpts, momentum_sum_ckpts, idx_min, idx_max)

    def is_criterion_met(state: IterativeUTurnState, momentum_sum, momentum):
        r, _ = ravel_pytree(momentum)
        r_sum, _ = ravel_pytree(momentum_sum)
        ckpt_r, ckpt_s, idx_min, idx_max = state
        max_depth = ckpt_r.shape[0]

        # statically unrolled slot checks: literal indices are static slices
        # and the whole check fuses into one straight-line kernel (both a
        # lax.fori and a batched (K, d) rewrite measured ~2x slower
        # whole-kernel at 4k vmapped chains). Initialized from a
        # data-derived False so the value type matches under shard_map VMA.
        turning = (r[0] * 0) > 0
        for i in range(max_depth):
            active = (i >= idx_min) & (i <= idx_max)
            subtree_sum = r_sum - ckpt_s[i] + ckpt_r[i]
            turning = turning | (active & is_turning(ckpt_r[i], r, subtree_sum))
        return turning

    return new_state, update, is_criterion_met


# Alias matching the reference public name (``termination.py:31``).
iterative_uturn_numpyro = iterative_uturn
