"""Ensemble-chain adaptation over a device mesh: chains sharded across
devices, per-step summary statistics psum'd over the ICI, one replicated
adaptation state (here: dual-averaging the NUTS step size on the pooled
acceptance).

Run on N devices, or simulate on CPU:
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python examples/multichip_eca.py``
"""
from types import SimpleNamespace

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Some environments import jax at interpreter startup (sitecustomize) and pin
# a platform there, which silently overrides the JAX_PLATFORMS env var. Honor
# the documented invocation: re-apply the env var before first backend use.
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp

import blackjax_tpu
from blackjax_tpu.adaptation.step_size import dual_averaging_adaptation
from blackjax_tpu.parallel import eca

DIM = 16
CHAINS_PER_DEVICE = 8


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / jnp.linspace(0.5, 4.0, DIM))


def main():
    devices = jax.devices()
    mesh = jax.sharding.Mesh(devices, ("chains",))
    num_chains = CHAINS_PER_DEVICE * len(devices)
    rng_key = jax.random.key(0)

    nuts_kernel = blackjax_tpu.nuts.build_kernel()
    da_init, da_update, da_final = dual_averaging_adaptation(target=0.8)

    def kernel(key, state, adaptation_state):
        return nuts_kernel(
            key,
            state,
            logdensity,
            jnp.exp(adaptation_state.log_step_size),
            jnp.ones(DIM),
            max_num_doublings=6,
        )

    adaptation = SimpleNamespace(
        initial_state=da_init(0.5),
        summary_statistics_fn=lambda state, info, key: {
            "acc": info.acceptance_rate
        },
        update=lambda a, E: (da_update(a, E["acc"]), {"acc": E["acc"]}),
    )

    def init_one(key, x, args):
        position = 0.5 * jax.random.normal(key, (DIM,))
        return blackjax_tpu.nuts.init(position, logdensity), None

    initial_state, _ = eca.ensemble_execute_fn(init_one, rng_key, num_chains, mesh)

    final_state, final_da, info = eca.run_eca(
        jax.random.fold_in(rng_key, 1),
        initial_state,
        kernel,
        adaptation,
        num_steps=100,
        num_chains=num_chains,
        mesh=mesh,
    )
    print(f"devices: {len(devices)}  chains: {num_chains}")
    print("pooled acceptance (last step): %.3f" % float(info["acc"][-1]))
    print("adapted step size: %.4f" % float(jnp.exp(final_da.log_step_size_avg)))


if __name__ == "__main__":
    main()
