"""Progress-bar breadth: fire counts under vmap, outermost-only patching,
degenerate print rates, compile-cache staleness, kwargs passthrough, and
reader edge cases.

Scenario parity target: the reference's ``tests/test_progress_bar.py``
(vmap fire count, outermost-only, print_rate zero, jit cache staleness,
kwargs passthrough, reader behavior).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu import progress_bar as pb
from blackjax_tpu.progress_bar import (
    ProgressState,
    progress_bar,
    progress_bar_factory,
    progress_bar_scan,
)
from blackjax_tpu.progress_reader import read_progress


def _count_updates(monkeypatch):
    """Instrument ProgressState.update to count callback arrivals."""
    calls = []
    original = ProgressState.update

    def counting(self, step):
        calls.append(int(step))
        return original(self, step)

    monkeypatch.setattr(ProgressState, "update", counting)
    return calls


def test_vmap_fire_count_once_per_step(monkeypatch):
    """The context's step counter is unbatched: vmapping over 16 chains must
    not multiply the callback count."""
    calls = _count_updates(monkeypatch)
    n_steps, n_chains = 40, 16

    def one_chain(x0):
        def body(c, _):
            return c * 1.000001, None
        final, _ = jax.lax.scan(body, x0, None, length=n_steps)
        return final

    with progress_bar(print_rate=1):
        out = jax.jit(jax.vmap(one_chain))(jnp.ones(n_chains))
    jax.effects_barrier()
    assert out.shape == (n_chains,)
    assert len(calls) == n_steps  # once per step, not per chain


def test_outermost_scan_only(monkeypatch):
    """Nested scans inside the instrumented body are untouched: the report
    count reflects only the OUTER length."""
    calls = _count_updates(monkeypatch)
    outer, inner = 10, 50

    def body(c, _):
        def inner_body(ci, _):
            return ci + 1.0, None
        ci, _ = jax.lax.scan(inner_body, c, None, length=inner)
        return ci, None

    with progress_bar(print_rate=1):
        final, _ = jax.lax.scan(body, jnp.zeros(()), None, length=outer)
    jax.effects_barrier()
    np.testing.assert_allclose(float(final), outer * inner)
    assert len(calls) == outer


def test_factory_reports_last_step(monkeypatch):
    """Whatever the print rate, the final step always reports (so the bar
    reaches 100%)."""
    calls = _count_updates(monkeypatch)
    n = 37
    wrap, state = progress_bar_factory(n, print_rate=10, use_tqdm=False)

    @jax.jit
    def run():
        body = wrap(lambda c, xs: (c + 1, None))
        final, _ = jax.lax.scan(body, 0, (jnp.arange(n),))
        return final

    run()
    jax.effects_barrier()
    assert state.step == n  # index n-1 reported -> step n
    assert calls[-1] == n


def test_print_rate_zero_does_not_crash():
    """Degenerate print_rate=0 must not poison the run (the never-raise
    callback invariant): the scan completes and produces correct results."""
    n = 16
    wrap, state = progress_bar_factory(n, print_rate=0, use_tqdm=False)

    @jax.jit
    def run():
        body = wrap(lambda c, xs: (c + 1, None))
        final, _ = jax.lax.scan(body, 0, (jnp.arange(n),))
        return final

    assert int(run()) == n
    jax.effects_barrier()


def test_compiled_before_context_keeps_unpatched_scan(monkeypatch):
    """Functions compiled BEFORE entering the context have the unpatched
    scan baked in (documented caveat): no callbacks fire for them."""
    calls = _count_updates(monkeypatch)

    @jax.jit
    def run(x):
        return jax.lax.scan(lambda c, _: (c + x, None), 0.0, None, length=20)[0]

    run(1.0)  # compile outside the context
    jax.effects_barrier()
    before = len(calls)
    with progress_bar(print_rate=1):
        run(1.0)  # cached executable: no instrumentation
    jax.effects_barrier()
    assert len(calls) == before


def test_patched_scan_kwargs_passthrough():
    """reverse= and unroll= ride through the patch unchanged and produce
    bitwise-identical results."""
    xs = jnp.arange(12.0)

    def body(c, x):
        return c + x, c

    expected_fwd = jax.lax.scan(body, 0.0, xs, unroll=3)
    expected_rev = jax.lax.scan(body, 0.0, xs, reverse=True)
    with progress_bar(print_rate=100):
        got_fwd = jax.lax.scan(body, 0.0, xs, unroll=3)
        got_rev = jax.lax.scan(body, 0.0, xs, reverse=True)
    np.testing.assert_array_equal(np.asarray(expected_fwd[1]), np.asarray(got_fwd[1]))
    np.testing.assert_array_equal(np.asarray(expected_rev[1]), np.asarray(got_rev[1]))
    np.testing.assert_allclose(float(expected_rev[0]), float(got_rev[0]))


def test_scan_is_restored_even_with_no_scans():
    original = jax.lax.scan
    with progress_bar():
        pass
    assert jax.lax.scan is original


def test_reader_missing_and_malformed_files(tmp_path):
    assert read_progress(str(tmp_path / "nope")) is None
    bad = tmp_path / "bad"
    bad.write_text("not numbers")
    assert read_progress(str(bad)) is None
    good = tmp_path / "good"
    good.write_text("7 100")
    assert read_progress(str(good)) == (7, 100)


def test_progress_file_atomic_write_roundtrip(tmp_path):
    out = tmp_path / "progress"
    state = ProgressState(50, output_file=str(out), use_tqdm=False)
    for s in (1, 10, 50):
        state.update(s)
        assert read_progress(str(out)) == (s, 50)
    # phase reset: a smaller step restarts the count
    state.update(3)
    assert read_progress(str(out)) == (3, 50)
    state.close()


def test_decorator_form_counts(monkeypatch, tmp_path):
    calls = _count_updates(monkeypatch)
    n = 25
    out = tmp_path / "p"

    @jax.jit
    def run():
        @progress_bar_scan(n, print_rate=5, output_file=str(out))
        def body(c, xs):
            return c + 1, None

        final, _ = jax.lax.scan(body, 0, (jnp.arange(n),))
        return final

    assert int(run()) == n
    jax.effects_barrier()
    # reports at 0, 5, 10, 15, 20 and the final step 24
    assert len(calls) == 6
    assert read_progress(str(out)) == (n, n)
