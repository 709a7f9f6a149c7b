"""Context-manager lifecycle depth tier for the progress bar.

Mirrors the reference's patch-lifecycle scenarios
(``/root/reference/tests/test_progress_bar.py:355-563``: concurrent first
enter, non-LIFO two-context restore, foreign patch chaining) against our
``jax.lax.scan`` interception: overlapping contexts must always leave the
pristine scan installed once every context has exited, regardless of exit
order, thread interleaving, or foreign wrappers installed around ours.
"""
import threading

import jax
import jax.numpy as jnp
import numpy as np

from blackjax_tpu.progress_bar import progress_bar


def _run_scan(n=8):
    def body(c, _):
        return c + 1, c

    final, ys = jax.lax.scan(body, jnp.int32(0), None, length=n)
    return int(final)


def test_lifo_nested_contexts_restore_pristine():
    pristine = jax.lax.scan
    with progress_bar(print_rate=100):
        with progress_bar(print_rate=100):
            assert jax.lax.scan is not pristine
            assert _run_scan() == 8
        assert jax.lax.scan is not pristine  # outer still installed
    assert jax.lax.scan is pristine


def test_nonlifo_exit_order_restores_pristine():
    # enter A, enter B, exit A, exit B: the naive "restore what I saw"
    # strategy leaves B's patch permanently installed after both exit
    pristine = jax.lax.scan
    a = progress_bar(print_rate=100)
    b = progress_bar(print_rate=100)
    a.__enter__()
    b.__enter__()
    try:
        assert _run_scan() == 8
    finally:
        a.__exit__(None, None, None)
        # B must still be functional after A spliced itself out
        assert _run_scan() == 8
        b.__exit__(None, None, None)
    assert jax.lax.scan is pristine


def test_three_contexts_middle_exits_first():
    pristine = jax.lax.scan
    ctxs = [progress_bar(print_rate=100) for _ in range(3)]
    for c in ctxs:
        c.__enter__()
    ctxs[1].__exit__(None, None, None)  # middle of the chain
    assert _run_scan() == 8
    ctxs[0].__exit__(None, None, None)
    ctxs[2].__exit__(None, None, None)
    assert jax.lax.scan is pristine


def test_foreign_patch_installed_after_ours_is_not_clobbered():
    # a foreign wrapper that does NOT participate in our chain protocol
    # replaces scan wholesale after our context entered; our exit must
    # leave the foreign patch alone (we cannot safely splice blind)
    pristine = jax.lax.scan
    ctx = progress_bar(print_rate=100)
    ctx.__enter__()

    ours = jax.lax.scan
    calls = {"n": 0}

    def foreign(f, init, xs=None, length=None, **kw):
        calls["n"] += 1
        return ours(f, init, xs, length=length, **kw)

    jax.lax.scan = foreign
    ctx.__exit__(None, None, None)
    assert jax.lax.scan is foreign
    assert _run_scan() == 8
    assert calls["n"] == 1
    jax.lax.scan = pristine  # manual cleanup, as a foreign patcher would


def test_foreign_chain_participant_is_spliced_through():
    # a foreign wrapper that DOES follow the chain protocol (stores the
    # previous scan in __bjt_original_scan__): exiting our inner context
    # relinks the foreign node to the pristine scan
    pristine = jax.lax.scan
    ctx = progress_bar(print_rate=100)
    ctx.__enter__()
    ours = jax.lax.scan

    def foreign(f, init, xs=None, length=None, **kw):
        return foreign.__bjt_original_scan__(f, init, xs, length=length, **kw)

    foreign.__bjt_original_scan__ = ours
    jax.lax.scan = foreign

    ctx.__exit__(None, None, None)
    assert jax.lax.scan is foreign
    assert foreign.__bjt_original_scan__ is pristine
    assert _run_scan() == 8
    jax.lax.scan = pristine


def test_concurrent_enters_never_capture_each_other_midinstall():
    # hammer enter/exit from several threads; afterwards the pristine scan
    # must be back and no patch may have captured a half-installed peer
    # (which would surface as a RecursionError or a leaked patch)
    pristine = jax.lax.scan
    barrier = threading.Barrier(4)
    errors = []

    def worker():
        try:
            barrier.wait(timeout=10)
            for _ in range(10):
                with progress_bar(print_rate=1000):
                    pass
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    assert jax.lax.scan is pristine
    assert _run_scan() == 8


def test_results_bit_identical_under_patch():
    def body(c, x):
        c = 0.999 * c + jnp.sin(x)
        return c, c

    xs = jnp.linspace(0.0, 3.0, 64)
    init = jnp.asarray(0.1, xs.dtype)
    ref_final, ref_ys = jax.lax.scan(body, init, xs)
    with progress_bar(print_rate=16):
        got_final, got_ys = jax.lax.scan(body, init, xs)
    np.testing.assert_array_equal(np.asarray(ref_ys), np.asarray(got_ys))
    np.testing.assert_array_equal(np.asarray(ref_final), np.asarray(got_final))


def test_exception_inside_context_still_restores():
    pristine = jax.lax.scan
    try:
        with progress_bar(print_rate=100):
            _run_scan()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert jax.lax.scan is pristine


def test_update_survives_promoted_warnings(tmp_path, recwarn):
    # warnings-as-errors must not poison the host callback (the state
    # update path is wrapped; a raise inside a JAX callback can wedge the
    # runtime) — mirror of the reference's
    # test_step_callback_survives_promoted_warnings
    import warnings

    out = tmp_path / "prog.txt"
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        with progress_bar(print_rate=2, output_file=str(out)):
            assert _run_scan(16) == 16
    assert out.exists()


def test_zero_length_xs_no_crash():
    with progress_bar(print_rate=1):
        def body(c, x):
            return c + x, c

        zs = jnp.zeros((0,))
        final, ys = jax.lax.scan(body, jnp.asarray(0.0, zs.dtype), zs)
    assert ys.shape == (0,)
