"""Progress-bar subsystem tests.

Parity model: reference ``tests/test_progress_bar.py`` — the context
manager must count the OUTERMOST scan's steps exactly once per step
(also under vmap), write the atomic progress file, and restore
``jax.lax.scan`` on exit.
"""
import os

import jax
import jax.numpy as jnp
import pytest

import blackjax_tpu
from blackjax_tpu.progress_bar import progress_bar, progress_bar_factory
from blackjax_tpu.progress_reader import read_progress


def test_progress_bar_context_counts_outer_scan(tmp_path):
    out = str(tmp_path / "progress.txt")
    original_scan = jax.lax.scan

    def body(carry, x):
        # nested scan inside the body must NOT be instrumented
        inner, _ = jax.lax.scan(lambda c, _: (c + 1, None), 0, length=3)
        return carry + x + 0 * inner, carry

    xs = jnp.arange(10.0)
    with progress_bar(output_file=out, print_rate=1):
        final, hist = jax.lax.scan(body, jnp.zeros((), xs.dtype), xs)
        jax.block_until_ready(final)
    jax.effects_barrier()

    assert jax.lax.scan is original_scan  # restored on exit
    assert float(final) == sum(range(10))
    step, total = read_progress(out)
    assert (step, total) == (10, 10)


def test_progress_bar_context_under_vmap(tmp_path):
    """The injected counter stays unbatched: one callback per step for the
    whole batch (counted via the file, which records the max step seen)."""
    out = str(tmp_path / "progress_vmap.txt")

    def run(x0):
        return jax.lax.scan(lambda c, _: (c * 1.01, c), x0, length=20)

    with progress_bar(output_file=out, print_rate=1):
        finals, hist = jax.vmap(run)(jnp.arange(1.0, 5.0))
        jax.block_until_ready(finals)
    jax.effects_barrier()
    step, total = read_progress(out)
    assert (step, total) == (20, 20)


def test_progress_bar_via_run_inference(tmp_path):
    out = str(tmp_path / "progress_run.txt")
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    algo = blackjax_tpu.mala(logdensity, step_size=0.3)
    state = algo.init(jnp.zeros(3))
    _, _ = blackjax_tpu.util.run_inference_algorithm(
        jax.random.key(0),
        algo,
        50,
        initial_state=state,
        progress_bar=True,
        progress_output_file=out,
    )
    jax.effects_barrier()
    step, total = read_progress(out)
    assert total == 50 and step == 50


def test_progress_factory_phase_reset():
    """A smaller step means a new phase: the state resets instead of
    going backwards."""
    wrap, state = progress_bar_factory(10, print_rate=1, use_tqdm=False)
    state.update(9)
    assert state.step == 9
    state.update(2)  # new phase
    assert state.step == 2


def test_sequential_scans_adjust_total(tmp_path):
    """A second scan of a different length inside the same context is a new
    phase: the recorded total switches to the new length and the count
    completes (reference case: sequential scans of different lengths)."""
    out = str(tmp_path / "progress_seq.txt")
    with progress_bar(output_file=out, print_rate=1):
        a, _ = jax.lax.scan(lambda c, _: (c + 1, None), 0, length=5)
        jax.block_until_ready(a)
        b, _ = jax.lax.scan(lambda c, _: (c + 1, None), 0, length=12)
        jax.block_until_ready(b)
    jax.effects_barrier()
    assert int(a) == 5 and int(b) == 12
    step, total = read_progress(out)
    assert (step, total) == (12, 12)


def test_scan_restored_after_exception(tmp_path):
    """jax.lax.scan must be restored even when the body raises."""
    original_scan = jax.lax.scan
    with pytest.raises(RuntimeError, match="boom"):
        with progress_bar(output_file=str(tmp_path / "p.txt"), print_rate=1):
            raise RuntimeError("boom")
    assert jax.lax.scan is original_scan


def test_patched_scan_results_identical_to_unpatched():
    """Instrumentation must not change any numerical output."""
    xs = jnp.arange(7.0)
    f = lambda c, x: (c + x * x, c - x)
    with progress_bar(print_rate=3):
        final_p, ys_p = jax.lax.scan(f, jnp.zeros(()), xs)
    final_u, ys_u = jax.lax.scan(f, jnp.zeros(()), xs)
    assert float(final_p) == float(final_u)
    assert jnp.array_equal(ys_p, ys_u)


def test_unwritable_output_file_does_not_crash(tmp_path):
    """An unwritable progress path must not break the computation."""
    bad = str(tmp_path / "no_such_dir" / "progress.txt")
    with progress_bar(output_file=bad, print_rate=1):
        final, _ = jax.lax.scan(lambda c, _: (c + 1, None), 0, length=6)
        jax.block_until_ready(final)
    jax.effects_barrier()
    assert int(final) == 6
