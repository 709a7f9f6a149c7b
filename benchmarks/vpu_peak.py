"""Measured VPU speed-of-light for the dc NUTS roofline (VERDICT r3 #7).

The dc machine (``ops/fused_nuts_dc.py``) keeps its entire state in VMEM
and does almost no HBM traffic or MXU work per leaf — it is bound by
VPU (8x128 vector unit) element throughput on ``(dim_pad, tile)`` f32
blocks: fmas for the leapfrog, compare+select for the lockstep
bookkeeping. A spec-sheet ceiling for that mix doesn't exist, so this
microbenchmark MEASURES it on the same shapes the kernel uses:

- ``fma``:    x = x * a + b              (1 vector fma / element / iter)
- ``select``: x = where(x>t, x*a+b, x+c) (cmp + 2 arith + select)

The block height sweeps (64..1024) x 128 f32 — from the dc kernel's own
13-vreg operand height (104, 128) up to 128 vregs — because sustained
rate depends on live-register pressure and per-op pipelining, not just
ALU count. `a`/`b` are runtime operands (nothing constant-folds).

Timing protocol (both axon hazards):
- every timed dispatch gets DISTINCT inputs (the runtime result-caches a
  repeated identical dispatch — ARCHITECTURE "Measurement hazard"), and
- the kernel output is reduced to a scalar ON DEVICE and the scalar is
  pulled; ``block_until_ready`` on a raw remote output returns before
  execution completes (measured: an 80 us return on a 5 ms kernel).
- two-point slope (iters vs 4*iters) cancels the ~30 ms tunnel
  round-trip + dispatch overhead out of the rate.

Run on the TPU box: ``python -m benchmarks.vpu_peak``.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COLS = 128
ITERS = 200_000


def _kernel(x_ref, a_ref, o_ref, *, iters, mode):
    x = x_ref[:]
    a = a_ref[0]
    b = a * 0.5
    t = a * 0.25

    def body(_, x):
        if mode == "fma":
            return x * a + b
        # the dc kernel's dominant instruction mix: masked update
        return jnp.where(x > t, x * a + b, x + b)

    o_ref[:] = jax.lax.fori_loop(0, iters, body, x)


@functools.partial(jax.jit, static_argnames=("mode", "iters", "rows"))
def _run(x, a, mode, iters, rows):
    out = pl.pallas_call(
        functools.partial(_kernel, iters=iters, mode=mode),
        out_shape=jax.ShapeDtypeStruct((rows, COLS), jnp.float32),
        in_specs=[
            pl.BlockSpec((rows, COLS), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, COLS), lambda: (0, 0), memory_space=pltpu.VMEM
        ),
    )(x, a)
    # reduce ON DEVICE; the scalar pull is the only reliable completion
    # signal on the axon remote backend
    return jnp.sum(out)


def measure(mode: str, rows: int, iters: int = ITERS) -> float:
    """Sustained VPU element-updates/s for the given instruction mix."""
    # scale keeps x in a no-overflow fixed point: a ~ 0.999
    a = jnp.full((1,), 0.999, jnp.float32)
    xs = [
        0.5 + 0.01 * jax.random.normal(jax.random.key(i), (rows, COLS))
        for i in range(4)
    ]
    float(_run(xs[0], a, mode, iters, rows))  # compile + warm
    float(_run(xs[1], a, mode, 4 * iters, rows))
    t0 = time.perf_counter()
    float(_run(xs[2], a, mode, iters, rows))
    t1 = time.perf_counter()
    float(_run(xs[3], a, mode, 4 * iters, rows))
    t2 = time.perf_counter()
    return rows * COLS * (3 * iters) / ((t2 - t1) - (t1 - t0))


def main():
    print(f"{'rows':>6s} {'vregs':>6s} {'fma':>10s} {'select':>10s}  (G element-updates/s)")
    for rows in (64, 104, 128, 256, 512, 1024):
        rates = [measure(mode, rows) for mode in ("fma", "select")]
        print(
            f"{rows:6d} {rows // 8:6d} {rates[0] / 1e9:10.1f} {rates[1] / 1e9:10.1f}"
        )


if __name__ == "__main__":
    main()
