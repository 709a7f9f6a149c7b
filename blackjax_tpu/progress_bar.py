"""Progress tracing for on-device inference loops.

Behavioral parity target: ``blackjax/progress_bar.py`` (host-side
``ProgressState`` with a never-raise step callback :44-95, atomic
progress-file writes :115-120, multi-phase reset detection :103-113,
out-of-process monitoring via ``progress_reader``).

TPU-first delta: the reference hooks scan steps by monkeypatching
``lax.scan`` through the optional ``jax-tap`` package. Here progress is
wired explicitly with ``jax.debug.callback`` — a documented, compiler-visible
mechanism: :func:`progress_bar_scan` wraps a scan body so the device posts a
host callback every ``print_rate`` steps (the callback is asynchronous and
does not stall the device pipeline), and
``util.run_inference_algorithm(..., progress_bar=True)`` uses it.
"""
import os
import threading
from contextlib import contextmanager
from typing import Callable, Optional

import jax

__all__ = [
    "ProgressState",
    "progress_bar",
    "progress_bar_scan",
    "progress_bar_factory",
]

# serializes install/uninstall of the lax.scan patch across threads (the
# patch itself is process-global, so bookkeeping must be too)
_PATCH_LOCK = threading.Lock()


class ProgressState:
    """Host-side mutable progress record.

    Invariant: nothing called from a JAX callback may ever raise — a raised
    exception inside a host callback can poison the runtime. Every update
    is wrapped accordingly. Callbacks arrive on JAX runtime threads, so
    updates are serialized with a lock rather than gated by thread identity.
    """

    def __init__(self, num_steps: int, output_file: Optional[str] = None, use_tqdm: bool = True):
        self.num_steps = num_steps
        self.step = 0
        self.output_file = output_file
        self._lock = threading.Lock()
        self._bar = None
        if use_tqdm:
            try:  # tqdm is optional; fall back to file/stderr-only silently
                from tqdm.auto import tqdm

                self._bar = tqdm(total=num_steps, desc="sampling")
            except Exception:
                self._bar = None

    def update(self, step: int) -> None:
        try:
            self._lock.acquire()
            step = int(step)
            if step < self.step:
                # a smaller step means a new phase (e.g. warmup -> sampling)
                # started reusing the same progress state; reset
                self.step = 0
                if self._bar is not None:
                    self._bar.reset()
            advance = step - self.step
            self.step = step
            if self._bar is not None and advance > 0:
                self._bar.update(advance)
            if self.output_file is not None:
                self._write_file()
        except Exception:
            pass  # never raise from a host callback
        finally:
            try:
                self._lock.release()
            except Exception:
                pass

    def _write_file(self) -> None:
        """Atomic progress-file write: temp file + rename so a concurrent
        reader never sees a partial line."""
        tmp = f"{self.output_file}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"{self.step} {self.num_steps}")
        os.replace(tmp, self.output_file)

    def close(self) -> None:
        try:
            if self._bar is not None:
                self._bar.close()
        except Exception:
            pass


def progress_bar_factory(
    num_steps: int,
    print_rate: Optional[int] = None,
    output_file: Optional[str] = None,
    use_tqdm: bool = True,
):
    """Return ``(wrap_body, state)``: ``wrap_body(body_fn)`` decorates a scan
    body of signature ``(carry, (index, *xs)) -> (carry, ys)`` so the host
    observes step ``index`` every ``print_rate`` steps."""
    state = ProgressState(num_steps, output_file, use_tqdm)
    if print_rate is None:
        print_rate = max(1, num_steps // 100)

    def _host_update(step):
        state.update(int(step) + 1)

    def wrap_body(body_fn: Callable) -> Callable:
        def wrapped(carry, xs):
            index = xs[0] if isinstance(xs, tuple) else xs
            should_report = (index % print_rate == 0) | (index == num_steps - 1)
            jax.lax.cond(
                should_report,
                lambda i: jax.debug.callback(_host_update, i, ordered=False),
                lambda i: None,
                index,
            )
            return body_fn(carry, xs)

        return wrapped

    return wrap_body, state


def progress_bar_scan(
    num_steps: int,
    print_rate: Optional[int] = None,
    output_file: Optional[str] = None,
):
    """Decorator form: ``@progress_bar_scan(n)`` over a scan body whose xs
    lead with the step index."""
    wrap_body, _ = progress_bar_factory(num_steps, print_rate, output_file)
    return wrap_body


@contextmanager
def progress_bar(label: str = "blackjax_tpu", print_rate=None, output_file=None):
    """Add a progress bar to any sampling call without touching its code.

    Behavioral parity target: ``blackjax/progress_bar.py:210`` — the
    reference delegates the ``lax.scan`` interception to the optional
    ``jaxtap`` package; here the outermost-scan patch is implemented
    directly (no extra dependency): for the duration of the ``with`` block,
    ``jax.lax.scan`` threads an UNBATCHED int32 step counter through the
    outermost scan's carry (the counter depends only on itself, so it stays
    unbatched under ``vmap`` — the host callback fires once per step
    regardless of chain count) and posts progress via :class:`ProgressState`
    (atomic ``output_file`` writes readable with
    ``python -m blackjax_tpu.progress_reader <path>``).

    Caveats (same boundaries as the reference): the patch is process-global
    for the block's duration; functions COMPILED before entering the context
    keep the unpatched scan baked in (call ``jax.clear_caches()`` first);
    an earlier ``from jax.lax import scan`` alias bypasses the patch; nested
    scans inside the instrumented body are untouched.
    """
    guard = threading.local()
    holder = {"state": None}

    def patched_scan(f, init, xs=None, length=None, **kwargs):
        import jax.numpy as jnp

        # read the downstream scan through the attribute (not a closure):
        # a non-LIFO exit of an overlapping context splices the chain by
        # rewriting this attribute
        original_scan = patched_scan.__bjt_original_scan__
        if getattr(guard, "depth", 0) > 0:
            return original_scan(f, init, xs, length=length, **kwargs)
        if length is not None:
            num_steps = int(length)
        else:
            leaves = jax.tree.leaves(xs)
            if not leaves:
                return original_scan(f, init, xs, length=length, **kwargs)
            num_steps = int(leaves[0].shape[0])

        if holder["state"] is None:
            holder["state"] = ProgressState(num_steps, output_file)
        state = holder["state"]
        state.num_steps = num_steps  # later phases may have a new length
        rate = print_rate if print_rate is not None else max(1, num_steps // 20)

        def _host_update(step):
            state.update(int(step) + 1)

        def body(carry, x):
            step, real = carry
            should_report = (step % rate == 0) | (step == num_steps - 1)
            jax.lax.cond(
                should_report,
                lambda i: jax.debug.callback(_host_update, i, ordered=False),
                lambda i: None,
                step,
            )
            real, y = f(real, x)
            return (step + jnp.int32(1), real), y

        guard.depth = 1
        try:
            (_, final), ys = original_scan(
                body, (jnp.int32(0), init), xs, length=length, **kwargs
            )
        finally:
            guard.depth = 0
        return final, ys

    # install under a lock so two threads entering concurrently cannot
    # capture each other's half-installed patch as their "original"
    with _PATCH_LOCK:
        patched_scan.__bjt_original_scan__ = jax.lax.scan
        jax.lax.scan = patched_scan
    try:
        yield
    finally:
        with _PATCH_LOCK:
            cur = jax.lax.scan
            if cur is patched_scan:
                # LIFO exit (the common case): pop ourselves off the top
                jax.lax.scan = patched_scan.__bjt_original_scan__
            else:
                # non-LIFO exit: we are somewhere inside a chain of
                # patches (ours or a foreign wrapper installed after us).
                # Splice ourselves out by relinking whichever node points
                # at us; if no node does (a foreign patch replaced the
                # whole chain), leave it untouched — restoring here would
                # clobber the foreign patch.
                node = cur
                while node is not None:
                    nxt = getattr(node, "__bjt_original_scan__", None)
                    if nxt is patched_scan:
                        node.__bjt_original_scan__ = (
                            patched_scan.__bjt_original_scan__
                        )
                        break
                    node = nxt
        jax.effects_barrier()
        if holder["state"] is not None:
            holder["state"].close()
