"""Model-axis (huge-d) sharding: NUTS/HMC over a dimension-sharded state.

The sharded path runs the STANDARD kernels inside ``shard_map`` over a
``("model",)`` mesh with :func:`model_sharded_metric` (psum-completed
kinetic energy and U-turn dots — the only global reductions, reference
``blackjax/mcmc/metrics.py:293-304``) and :func:`additive_logdensity`.
Parity is checked against a single-device run that reproduces the sharded
momentum draw (per-shard ``fold_in`` keys) with full-d reductions; the two
differ only in psum summation order.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from blackjax_tpu.mcmc import hmc as hmc_mod
from blackjax_tpu.mcmc import nuts as nuts_mod
from blackjax_tpu.mcmc.metrics import Metric, gaussian_euclidean
from blackjax_tpu.parallel.model_axis import (
    additive_logdensity,
    model_sharded_metric,
)
from blackjax_tpu.util import generate_gaussian_noise

N_DEV = 8


def _mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 (virtual) devices")
    return Mesh(np.array(jax.devices()[:N_DEV]), ("model",))


def _scales(d):
    return 0.5 + jnp.linspace(0.0, 1.5, d)


def _local_term(scales_local):
    def term(x_local):
        return -0.5 * jnp.sum(x_local**2 / scales_local**2)

    return term


def _emulated_metric(imm_full, d_local):
    """Single-device metric reproducing the sharded momentum draw exactly:
    shard i draws with ``fold_in(key, i)`` over its block."""
    base = gaussian_euclidean(imm_full)
    local_sigma = 1.0 / jnp.sqrt(imm_full.reshape(N_DEV, d_local))

    def sample_momentum(rng_key, position):
        blocks = [
            generate_gaussian_noise(
                jax.random.fold_in(rng_key, i),
                jnp.zeros(d_local),
                sigma=local_sigma[i],
            )
            for i in range(N_DEV)
        ]
        return jnp.concatenate(blocks)

    return Metric(
        sample_momentum, base.kinetic_energy, base.check_turning, base.scale, None
    )


def test_additive_logdensity_grad_matches_full():
    mesh = _mesh()
    d = 64
    scales = _scales(d)
    x = jax.random.normal(jax.random.key(0), (d,))

    full = lambda y: -0.5 * jnp.sum(y**2 / scales**2)
    expected_val, expected_grad = jax.value_and_grad(full)(x)

    def shard_fn(x_local, scales_local):
        logdens = additive_logdensity(_local_term(scales_local))
        return jax.value_and_grad(logdens)(x_local)

    val, grad = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(PartitionSpec("model"), PartitionSpec("model")),
            out_specs=(PartitionSpec(), PartitionSpec("model")),
        )
    )(x, scales)
    np.testing.assert_allclose(float(val), float(expected_val), rtol=(1e-12 if jax.config.jax_enable_x64 else 1e-5))
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expected_grad), rtol=(1e-12 if jax.config.jax_enable_x64 else 1e-5))


@pytest.mark.parametrize("kernel_kind", ["nuts", "hmc"])
def test_model_sharded_step_matches_single_device(rng_key, kernel_kind):
    """Several transitions of the dimension-sharded kernel must match the
    single-device emulation to summation-order tolerance."""
    mesh = _mesh()
    d = 64
    d_local = d // N_DEV
    scales = _scales(d)
    imm_full = jnp.ones(d) * 0.8
    step_size = 0.2
    num_steps = 5
    x0 = 0.3 * jax.random.normal(rng_key, (d,))
    step_keys = jax.random.split(jax.random.fold_in(rng_key, 7), num_steps)

    # --- single-device emulation ---------------------------------------
    full_logdensity = lambda y: -0.5 * jnp.sum(y**2 / scales**2)
    metric_emu = _emulated_metric(imm_full, d_local)
    if kernel_kind == "nuts":
        kern = nuts_mod.build_kernel()
        args = (step_size, metric_emu, 6)
    else:
        kern = hmc_mod.build_kernel()
        args = (step_size, metric_emu, 8)
    stepper = jax.jit(lambda k, st: kern(k, st, full_logdensity, *args)[0])
    state = hmc_mod.init(x0, full_logdensity)
    expected = []
    for k in step_keys:
        state = stepper(k, state)
        expected.append(np.asarray(state.position))

    # --- sharded run ----------------------------------------------------
    def sharded_run(x_local, scales_local, imm_local, keys):
        logdens = additive_logdensity(_local_term(scales_local))
        metric = model_sharded_metric(imm_local)
        if kernel_kind == "nuts":
            kern_s = nuts_mod.build_kernel()
            kargs = (step_size, metric, 6)
        else:
            kern_s = hmc_mod.build_kernel()
            kargs = (step_size, metric, 8)
        st = hmc_mod.init(x_local, logdens)
        # promote the psum-invariant initial logdensity to the varying type
        # the kernel's outputs carry (see trajectory._with_vma_of)
        st = st._replace(logdensity=st.logdensity + 0.0 * x_local[0])

        def one(st, k):
            st, _ = kern_s(k, st, logdens, *kargs)
            return st, st.position

        _, hist = jax.lax.scan(one, st, keys)
        return hist  # (num_steps, d_local)

    hist = jax.jit(
        jax.shard_map(
            sharded_run,
            mesh=mesh,
            in_specs=(
                PartitionSpec("model"),
                PartitionSpec("model"),
                PartitionSpec("model"),
                PartitionSpec(),
            ),
            out_specs=PartitionSpec(None, "model"),
        )
    )(x0, scales, imm_full, step_keys)

    got = np.asarray(hist)
    want = np.stack(expected)
    # identical math up to psum summation order; under x64 the paths track
    # each other through all accept/reject decisions at this horizon
    np.testing.assert_allclose(
        got, want,
        # psum vs emulated full-d reduction differ in summation order only
        rtol=1e-8 if jax.config.jax_enable_x64 else 2e-4,
        atol=1e-8 if jax.config.jax_enable_x64 else 2e-4,
    )


def test_model_sharded_huge_d_smoke():
    """One NUTS transition at d = 2**17 on the virtual mesh: must run,
    stay finite, and move the chain (SURVEY §5.7(b) scale point)."""
    mesh = _mesh()
    d = 2**17
    x0 = 0.99 * jax.random.normal(jax.random.key(11), (d,))
    imm = jnp.ones(d)

    def run(x_local, imm_local):
        logdens = additive_logdensity(lambda y: -0.5 * jnp.sum(y**2))
        metric = model_sharded_metric(imm_local)
        kern = nuts_mod.build_kernel()
        st = hmc_mod.init(x_local, logdens)
        st, info = kern(jax.random.key(3), st, logdens, 0.02, metric, 4)
        # pmax collapses the (identical-valued) varying counter to an
        # invariant so the replicated out_spec typechecks
        return st.position, jax.lax.pmax(info.num_integration_steps, "model")

    pos, nsteps = jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(PartitionSpec("model"), PartitionSpec("model")),
            out_specs=(PartitionSpec("model"), PartitionSpec()),
        )
    )(x0, imm)
    pos = np.asarray(pos)
    assert np.isfinite(pos).all()
    assert int(nsteps) >= 1
    assert np.abs(pos - np.asarray(x0)).max() > 0.0
