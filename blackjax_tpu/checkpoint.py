"""Exact-resume checkpointing for long runs.

The reference has no checkpoint subsystem by design (every algorithm state
is a small pytree and every entry point accepts ``initial_state`` —
``SURVEY.md`` §5.4, reference ``util.py:150-213``); resume is "serialize the
pytree". This module adds the orbax-backed helper the TPU build needs for
long multi-chip runs: state + PRNG key fully determine the trajectory, so a
snapshot of ``(state, rng_key, step)`` is an exact-resume point.
"""
import os
from typing import Any, Callable, NamedTuple, Optional

import jax

__all__ = ["save_state", "load_state", "CheckpointedLoop", "run_with_checkpoints"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: Any) -> None:
    """Write a pytree snapshot to ``path`` (orbax PyTree format)."""
    _checkpointer().save(os.path.abspath(path), state, force=True)


def load_state(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree snapshot; ``template`` (an abstract or concrete
    pytree of matching structure) restores exact dtypes/shardings."""
    import orbax.checkpoint as ocp

    if template is not None:
        return _checkpointer().restore(
            os.path.abspath(path), args=ocp.args.PyTreeRestore(template)
        )
    return _checkpointer().restore(os.path.abspath(path))


class CheckpointedLoop(NamedTuple):
    state: Any
    rng_key: Any
    step: int


def run_with_checkpoints(
    rng_key,
    step_fn: Callable,
    initial_state,
    num_steps: int,
    checkpoint_dir: str,
    checkpoint_every: int = 1000,
    resume: bool = True,
):
    """Drive ``step_fn(key, state) -> (state, info)`` for ``num_steps`` with
    periodic host-side snapshots of ``(state, rng_key, step)``.

    The loop is chunked: each chunk of ``checkpoint_every`` steps is one
    jitted ``lax.scan``; between chunks the carry is snapshotted. On restart
    with ``resume=True`` the latest snapshot is restored and the run
    continues bit-exactly (the per-step keys are derived by ``fold_in`` of
    the run key with the global step index).
    """
    import jax.numpy as jnp

    latest = os.path.join(checkpoint_dir, "latest")
    start_step = 0
    state = initial_state
    if resume and os.path.exists(latest):
        snapshot = load_state(latest, CheckpointedLoop(initial_state, rng_key, 0))
        state, rng_key, start_step = snapshot.state, snapshot.rng_key, int(snapshot.step)

    @jax.jit
    def run_chunk(state, step_indices):
        def body(state, i):
            key = jax.random.fold_in(rng_key, i)
            state, info = step_fn(key, state)
            return state, None

        state, _ = jax.lax.scan(body, state, step_indices)
        return state

    step = start_step
    while step < num_steps:
        chunk = min(checkpoint_every, num_steps - step)
        state = run_chunk(state, jnp.arange(step, step + chunk))
        jax.block_until_ready(state)
        step += chunk
        save_state(latest, CheckpointedLoop(state, rng_key, step))
    return state
