"""MetricCore plugin layer: pluggable inverse-mass-matrix estimators for the
staged warmup engine.

Behavioral parity target: ``blackjax/adaptation/metric_recipes.py`` (protocol
:120, recipe dataclass :312, registry :961). This module currently ships the
Welford cores (diag/dense); Fisher and low-rank cores are layered on in
``low_rank_recipes``-style additions.

A ``MetricCore`` is an ``(init, update, final)`` triple over an opaque state
exposing ``.inverse_mass_matrix``:

- ``init(n_dims) -> state``
- ``update(state, position, grad) -> state`` — streaming accumulation; must
  accept either a single ``(d,)`` position or a chain block ``(M, d)``.
- ``final(state) -> state`` — slow-window boundary: recompute the IMM,
  reset the window buffer.
"""
import dataclasses
from typing import Callable, NamedTuple, Optional

from blackjax_tpu.adaptation.mass_matrix import mass_matrix_adaptation

__all__ = ["MetricCore", "MetricRecipe", "REGISTRY", "lookup_recipe"]


class MetricCore(NamedTuple):
    init: Callable
    update: Callable
    final: Callable


@dataclasses.dataclass(frozen=True)
class MetricRecipe:
    """A named, parameterized MetricCore constructor. ``needs`` declares the
    per-step inputs the core consumes; validated against what the engine
    provides at construction time (never inside a traced region)."""

    name: str
    build_core: Callable  # (**kwargs) -> MetricCore
    needs: frozenset = frozenset({"position"})
    provides_dense: bool = False

    def __post_init__(self):
        allowed = {"position", "grad"}
        if not set(self.needs) <= allowed:
            raise ValueError(
                f"Recipe {self.name!r} declares needs={set(self.needs)}, but the "
                f"engine only provides {allowed}."
            )


def _build_welford_core(is_diagonal_matrix: bool, imm_shrinkage_to_previous: float = 0.0):
    mm_init, mm_update, mm_final = mass_matrix_adaptation(
        is_diagonal_matrix, imm_shrinkage_to_previous
    )

    def update(state, position, grad=None):
        del grad
        return mm_update(state, position)

    return MetricCore(mm_init, update, mm_final)


REGISTRY: dict[str, MetricRecipe] = {
    "welford_diag": MetricRecipe(
        "welford_diag",
        lambda **kw: _build_welford_core(True, **kw),
        frozenset({"position"}),
        provides_dense=False,
    ),
    "welford_dense": MetricRecipe(
        "welford_dense",
        lambda **kw: _build_welford_core(False, **kw),
        frozenset({"position"}),
        provides_dense=True,
    ),
}


def lookup_recipe(name: str) -> MetricRecipe:
    try:
        return REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown metric recipe {name!r}; available: {sorted(REGISTRY)}"
        ) from None
