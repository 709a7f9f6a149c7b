"""Quickstart: NUTS with window adaptation on an anisotropic Gaussian.

Run: ``python examples/quickstart_nuts.py``
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS even when the environment's sitecustomize already
# pinned a backend at interpreter startup (config.update still wins if no
# backend has been touched yet)
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp

import blackjax_tpu

VARIANCES = jnp.array([0.25, 1.0, 4.0, 9.0])


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


def main():
    rng_key = jax.random.key(0)
    warm_key, sample_key = jax.random.split(rng_key)

    # Stan-style warmup: dual-averaging step size + windowed Welford metric
    warmup = blackjax_tpu.window_adaptation(blackjax_tpu.nuts, logdensity)
    (state, parameters), _ = warmup.run(warm_key, jnp.zeros(4), num_steps=500)
    print("adapted step_size:", float(parameters["step_size"]))
    print("adapted IMM diag:", parameters["inverse_mass_matrix"])

    algo = blackjax_tpu.nuts(logdensity, **parameters)
    final, (states, infos) = blackjax_tpu.util.run_inference_algorithm(
        sample_key, algo, 2000, initial_state=state
    )

    samples = states.position[500:]
    print("posterior variances:", jnp.var(samples, axis=0))
    # ess expects (chains, samples, dims)
    print("min ESS:", float(jnp.min(blackjax_tpu.ess(samples[None, :, :]))))
    print("mean acceptance:", float(jnp.mean(infos.acceptance_rate)))


if __name__ == "__main__":
    main()
