"""Huge-d NUTS with the position DIMENSION-sharded across devices.

When a single state no longer fits (or no longer should live) on one chip,
shard the model axis instead of the chain axis: the standard NUTS kernel
runs unchanged inside ``shard_map`` over a ``("model",)`` mesh, with

- ``additive_logdensity``: the global log-density psum'd from shard-local
  terms (gradients correct under the default ``check_vma=True``), and
- ``model_sharded_metric``: a diagonal metric whose only cross-device
  traffic is ONE small psum per kinetic-energy / U-turn evaluation
  (the only global reductions NUTS needs — reference
  ``blackjax/mcmc/metrics.py:293-304``).

Run on N devices, or simulate on CPU:
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python examples/model_axis_nuts.py``
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from blackjax_tpu.mcmc import hmc as hmc_mod
from blackjax_tpu.mcmc import nuts as nuts_mod
from blackjax_tpu.parallel.model_axis import (
    additive_logdensity,
    model_sharded_metric,
)


def main():
    devices = jax.devices()
    n_dev = len(devices)
    mesh = Mesh(np.array(devices), ("model",))
    d = 2**15 if n_dev >= 8 else 2**12  # global dimension
    d_local = d // n_dev
    num_steps = 20
    print(f"{n_dev} devices, d = {d} ({d_local} per shard)")

    # anisotropic Gaussian: scales vary over the global coordinate index
    global_scales = 0.5 + 1.5 * jnp.arange(d) / d

    def local_term(scales_local):
        return lambda x_local: -0.5 * jnp.sum(x_local**2 / scales_local**2)

    # leapfrog error grows with dimension: the classic d^(-1/4) scaling,
    # anchored at the smallest coordinate scale (0.5)
    step_size = 0.5 * d ** (-0.25)
    kernel = nuts_mod.build_kernel()

    def sharded_chain(x0_local, scales_local, keys):
        """Runs entirely shard-local except the psums inside the metric and
        log-density — each device owns d/n coordinates of the ONE chain."""
        logdensity = additive_logdensity(local_term(scales_local))
        metric = model_sharded_metric(jnp.ones(d_local))
        state = hmc_mod.init(x0_local, logdensity)
        # align the scan carry's varying-manual-axes type: the psum'd
        # logdensity starts axis-invariant while the stepped carry is
        # varying (already-varying leaves are left alone)
        def _to_varying(x):
            try:
                return jax.lax.pcast(x, ("model",), to="varying")
            except ValueError:
                return x

        state = jax.tree.map(_to_varying, state)

        def one_step(state, key):
            state, info = kernel(
                key, state, logdensity, step_size, metric, 8
            )
            return state, (info.acceptance_rate, info.num_trajectory_expansions)

        state, (acc, expansions) = jax.lax.scan(one_step, state, keys)
        # the scalar diagnostics are numerically identical on every shard
        # (they flow from psum'd reductions); pmax certifies the replication
        return (
            state.position,
            jax.lax.pmax(acc, "model"),
            jax.lax.pmax(expansions, "model"),
        )

    run = jax.jit(
        jax.shard_map(
            sharded_chain,
            mesh=mesh,
            in_specs=(
                PartitionSpec("model"),
                PartitionSpec("model"),
                PartitionSpec(),  # replicated per-step keys
            ),
            out_specs=(PartitionSpec("model"), PartitionSpec(), PartitionSpec()),
        )
    )

    x0 = 0.1 * jax.random.normal(jax.random.key(0), (d,))
    keys = jax.random.split(jax.random.key(1), num_steps)

    t0 = time.time()
    position, acc, expansions = run(x0, global_scales, keys)
    jax.block_until_ready(position)
    compile_and_first = time.time() - t0

    t0 = time.time()
    position, acc, expansions = run(x0, global_scales, keys)
    jax.block_until_ready(position)
    steady = time.time() - t0

    print(f"compile+run {compile_and_first:.2f}s, steady run {steady:.3f}s")
    print(f"mean acceptance {float(jnp.mean(acc)):.3f}")
    print(f"mean trajectory doublings {float(jnp.mean(expansions)):.2f}")
    print(f"position shards healthy: {bool(jnp.isfinite(position).all())}")


if __name__ == "__main__":
    main()
