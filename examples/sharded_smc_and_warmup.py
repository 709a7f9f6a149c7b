"""Particle-sharded SMC and mesh-sharded cross-chain warmup in one script.

1. Adaptive tempered SMC with particles sharded over a ``("particles",)``
   mesh: the resampling exchange is a static-shape ring pass over the ICI,
   the ESS solver completes with psums, and the whole prior-to-posterior
   tempering loop runs inside one ``shard_map``.
2. ChEES cross-chain warmup with chains sharded over a ``("chains",)``
   mesh: every ensemble reduction (harmonic-mean acceptance, the ChEES
   gradient, pooled Welford moments) is psum-completed, so the tuned
   parameters match the single-device vmap run.

Run on N devices, or simulate on CPU:
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python examples/sharded_smc_and_warmup.py``
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
try:
    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec

from blackjax_tpu.adaptation.chees_adaptation import chees_adaptation
from blackjax_tpu.mcmc import mala
from blackjax_tpu.parallel import smc as psmc


def main():
    devices = np.array(jax.devices()[:8])
    print(f"devices: {len(devices)} x {devices[0].platform}")

    # --- 1. particle-sharded adaptive tempered SMC -------------------------
    d, n_particles = 4, 4096
    obs = jnp.array([1.0, -0.5, 0.3, 0.0])
    logprior_fn = lambda x: -0.5 * jnp.sum(x**2) / 9.0
    loglikelihood_fn = lambda x: -0.5 * jnp.sum((x - obs) ** 2)

    result = psmc.run_adaptive_tempered_smc(
        jax.random.key(0),
        3.0 * jax.random.normal(jax.random.key(1), (n_particles, d)),
        logprior_fn,
        loglikelihood_fn,
        mala.build_kernel(),
        mala.init,
        {"step_size": 0.15},
        Mesh(devices, ("particles",)),
        target_ess=0.6,
        num_mcmc_steps=5,
    )
    w = np.asarray(result.weights)
    mean = (w[:, None] * np.asarray(result.particles)).sum(0)
    print(
        f"SMC: lambda={float(result.tempering_param):.2f} in "
        f"{int(result.num_steps)} adaptive steps, "
        f"logZ={float(result.log_likelihood):.3f}, "
        f"posterior mean~{np.round(mean, 3)}"
    )

    # --- 1b. waste-free variant: the resample exchange moves only N/p seeds
    result_wf = psmc.run_adaptive_tempered_smc(
        jax.random.key(4),
        3.0 * jax.random.normal(jax.random.key(1), (n_particles, d)),
        logprior_fn,
        loglikelihood_fn,
        mala.build_kernel(),
        mala.init,
        {"step_size": 0.15},
        Mesh(devices, ("particles",)),
        target_ess=0.6,
        num_mcmc_steps=None,
        waste_free_p=4,
    )
    w = np.asarray(result_wf.weights)
    mean = (w[:, None] * np.asarray(result_wf.particles)).sum(0)
    print(
        f"SMC (waste-free p=4): lambda={float(result_wf.tempering_param):.2f} "
        f"in {int(result_wf.num_steps)} steps, posterior mean~{np.round(mean, 3)}"
    )

    # --- 2. chain-sharded ChEES warmup --------------------------------------
    num_chains, dim = 256, 16
    scales = jnp.linspace(0.5, 3.0, dim)
    logdensity_fn = lambda x: -0.5 * jnp.sum((x / scales) ** 2)

    warmup = chees_adaptation(
        logdensity_fn, num_chains, mass_matrix_estimation="diagonal",
        axis_name="chains",
    )
    mesh = Mesh(devices, ("chains",))
    p, rep = PartitionSpec("chains"), PartitionSpec()

    def run(key, positions):
        results, _ = warmup.run(key, positions, 0.3, optax.adam(0.25), 300)
        return (
            results.parameters["step_size"],
            results.parameters["inverse_mass_matrix"],
        )

    step_size, imm = jax.shard_map(
        run, mesh=mesh, in_specs=(rep, p), out_specs=(rep, rep), check_vma=False
    )(
        jax.random.key(2),
        jax.random.normal(jax.random.key(3), (num_chains, dim)) * scales,
    )
    print(
        f"ChEES (sharded): step_size={float(step_size):.3f}, "
        f"IMM/true-variance ratio range "
        f"[{float(jnp.min(imm / scales**2)):.2f}, "
        f"{float(jnp.max(imm / scales**2)):.2f}]"
    )


if __name__ == "__main__":
    main()
