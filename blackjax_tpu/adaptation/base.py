"""Shared adaptation result containers (reference ``adaptation/base.py``)."""
from typing import NamedTuple, Set

import jax

from blackjax_tpu.types import ArrayTree

__all__ = [
    "AdaptationResults",
    "AdaptationInfo",
    "return_all_adapt_info",
    "get_filter_adapt_info_fn",
]


class AdaptationResults(NamedTuple):
    state: ArrayTree
    parameters: dict


class AdaptationInfo(NamedTuple):
    state: ArrayTree
    info: ArrayTree
    adaptation_state: ArrayTree


def return_all_adapt_info(state, info, adaptation_state) -> AdaptationInfo:
    """Trace everything — O(num_steps * state size) memory."""
    return AdaptationInfo(state, info, adaptation_state)


def get_filter_adapt_info_fn(
    state_keys: Set[str] = set(),
    info_keys: Set[str] = set(),
    adapt_state_keys: Set[str] = set(),
):
    """Build an info filter keeping only the named fields of each NamedTuple
    (memory control for long warmups, reference ``adaptation/base.py:39``)."""

    def _select(named_tuple, keys):
        return jax.tree.map(
            lambda x: x,
            type(named_tuple)(
                **{
                    field: (getattr(named_tuple, field) if field in keys else None)
                    for field in named_tuple._fields
                }
            ),
        )

    def filter_fn(state, info, adaptation_state) -> AdaptationInfo:
        return AdaptationInfo(
            _select(state, state_keys),
            _select(info, info_keys),
            _select(adaptation_state, adapt_state_keys),
        )

    return filter_fn
