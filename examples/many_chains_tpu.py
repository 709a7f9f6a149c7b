"""Many-chains NUTS on one chip: the canonical TPU workload — 4,096 vmapped
chains flowing barrier-free through the continuous NUTS runner.

Run: ``python examples/many_chains_tpu.py`` (auto-scales down on CPU).
"""
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS even when the environment's sitecustomize already
# pinned a backend at interpreter startup
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp

import blackjax_tpu
from blackjax_tpu.models.targets import hierarchical_gaussian

DIM = 100
NUM_CHAINS = 4096 if jax.devices()[0].platform != "cpu" else 64
NUM_STEPS = 128 if jax.devices()[0].platform != "cpu" else 16


def main():
    target = hierarchical_gaussian(DIM)
    rng_key = jax.random.key(0)
    warm_key, init_key, run_key = jax.random.split(rng_key, 3)

    warmup = blackjax_tpu.window_adaptation(blackjax_tpu.nuts, target.logdensity_fn)
    (_, params), _ = warmup.run(warm_key, jnp.zeros(DIM), num_steps=400)

    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    algo = blackjax_tpu.nuts(target.logdensity_fn, **params, max_num_doublings=8)
    init_keys = jax.random.split(init_key, NUM_CHAINS)
    positions = 0.5 * jax.vmap(lambda k: jax.random.normal(k, (DIM,)))(init_keys)
    states = jax.vmap(algo.init)(positions)

    # the continuous runner: no per-step barrier across chains; samples are
    # bit-identical to scanning the vmapped kernel with these keys
    step_keys = jax.random.split(run_key, NUM_STEPS)
    rng_keys = jax.vmap(lambda k: jax.random.split(k, NUM_CHAINS))(step_keys)
    run = jax.jit(
        build_fused_many_steps(
            target.logdensity_fn,
            params["step_size"],
            params["inverse_mass_matrix"],
            num_steps=NUM_STEPS,
            max_num_doublings=8,
            track_fn=lambda s: s.position[:1],
        )
    )

    # compile, then time
    out = run(rng_keys, states)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    final, hist, grads = run(rng_keys, states)
    jax.block_until_ready(hist)
    elapsed = time.perf_counter() - t0

    print(f"{NUM_CHAINS} chains x {NUM_STEPS} steps on {jax.devices()[0].device_kind}")
    print(f"{elapsed:.2f}s  |  {int(grads) / elapsed / 1e6:.2f}M grad-evals/sec")
    ess = blackjax_tpu.ess(hist[:, :, 0][:, :, None])
    print(f"min ESS(theta_0): {float(jnp.min(ess)):.1f}")


if __name__ == "__main__":
    main()
