"""Chain-blocked HMC on the fused Pallas leapfrog.

Reference counterpart: ``blackjax/mcmc/hmc.py`` semantics (velocity-Verlet
trajectory + MH accept on the energy difference), but chain-blocked from the
start per SURVEY.md §7.1: the state is a ``(C, d)`` array, momentum
sampling / accept run as batched XLA, and the entire trajectory runs inside
:func:`blackjax_tpu.ops.fused_leapfrog` (one HBM round-trip per step call).

This is the registered-target fast path; arbitrary logdensities keep the
generic ``blackjax_tpu.hmc`` vmap path.
"""
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.ops.fused_leapfrog import (
    TargetKernel,
    fused_leapfrog,
    get_registered_target,
)
from blackjax_tpu.types import Array, PRNGKey

__all__ = [
    "FusedHMCState",
    "FusedHMCInfo",
    "fused_hmc",
    "init",
    "build_kernel",
    "as_top_level_api",
]


class FusedHMCState(NamedTuple):
    positions: Array  # (C, d)
    logdensities: Array  # (C,)


class FusedHMCInfo(NamedTuple):
    acceptance_rate: Array  # (C,)
    is_accepted: Array  # (C,)
    energy: Array  # (C,) proposal energies


class fused_hmc:
    """Batched-chain HMC sampler bound to a registered analytic target.

    ``init(positions)`` takes a ``(C, d)`` block; ``step(rng_key, state)``
    advances every chain one MH-adjusted trajectory.
    """

    def __init__(
        self,
        target: TargetKernel,
        step_size: float,
        inverse_mass_matrix: Array,
        num_integration_steps: int,
        *,
        tile_chains: int = 256,
        interpret: bool = False,
    ):
        self.target = target
        self.step_size = step_size
        self.inverse_mass_matrix = jnp.broadcast_to(
            jnp.asarray(inverse_mass_matrix, jnp.float32), (target.dim,)
        )
        self.num_integration_steps = num_integration_steps
        self.tile_chains = tile_chains
        self.interpret = interpret

    def init(self, positions: Array) -> FusedHMCState:
        positions = jnp.asarray(positions, jnp.float32)
        return FusedHMCState(positions, self.target.logdensity_fn(positions))

    def step(self, rng_key: PRNGKey, state: FusedHMCState):
        C, d = state.positions.shape
        key_momentum, key_accept = jax.random.split(rng_key)
        # momentum ~ N(0, M): sample in the M^{1/2} basis
        z = jax.random.normal(key_momentum, (C, d), jnp.float32)
        momenta = z / jnp.sqrt(self.inverse_mass_matrix)[None, :]
        kinetic0 = 0.5 * jnp.sum(
            momenta**2 * self.inverse_mass_matrix[None, :], axis=1
        )
        energy0 = -state.logdensities + kinetic0

        x_new, m_new, energy1 = fused_leapfrog(
            state.positions,
            momenta,
            self.inverse_mass_matrix,
            self.step_size,
            target=self.target,
            num_steps=self.num_integration_steps,
            tile_chains=self.tile_chains,
            interpret=self.interpret,
        )

        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        p_accept = jnp.clip(jnp.exp(delta), max=1.0)
        accept = jax.random.uniform(key_accept, (C,)) < p_accept

        new_positions = jnp.where(accept[:, None], x_new, state.positions)
        new_logdensities = jnp.where(
            accept,
            # energy1 already contains -logdensity(x_end) + KE(m_end)
            -(energy1 - 0.5 * jnp.sum(m_new**2 * self.inverse_mass_matrix, axis=1)),
            state.logdensities,
        )
        return (
            FusedHMCState(new_positions, new_logdensities),
            FusedHMCInfo(p_accept, accept, energy1),
        )


# ---------------------------------------------------------------------------
# SamplingAlgorithm protocol adapters (same registry contract as the generic
# samplers: init / build_kernel / as_top_level_api)
# ---------------------------------------------------------------------------


def _resolve_target(target, dim=None) -> TargetKernel:
    if isinstance(target, TargetKernel):
        return target
    return get_registered_target(target, dim)


def init(position: Array, target: Union[TargetKernel, str], dim=None):
    """``position``: a ``(C, d)`` chain block (this sampler is chain-blocked
    by construction; a single chain is a ``(1, d)`` block)."""
    target = _resolve_target(target, dim if dim is not None else position.shape[-1])
    positions = jnp.atleast_2d(jnp.asarray(position, jnp.float32))
    return FusedHMCState(positions, target.logdensity_fn(positions))


def build_kernel(tile_chains: int = 256, interpret: bool = False):
    def kernel(
        rng_key: PRNGKey,
        state: FusedHMCState,
        target: Union[TargetKernel, str],
        step_size: float,
        inverse_mass_matrix: Array,
        num_integration_steps: int,
    ):
        target = _resolve_target(target, state.positions.shape[-1])
        sampler = fused_hmc(
            target,
            step_size,
            inverse_mass_matrix,
            num_integration_steps,
            tile_chains=tile_chains,
            interpret=interpret,
        )
        return sampler.step(rng_key, state)

    return kernel


def as_top_level_api(
    target: Union[TargetKernel, str],
    step_size: float,
    inverse_mass_matrix: Array,
    num_integration_steps: int,
    *,
    dim=None,
    tile_chains: int = 256,
    interpret: bool = False,
) -> SamplingAlgorithm:
    """``blackjax_tpu.fused_hmc(...)`` — the registered-analytic-target HMC
    fast path as a standard :class:`SamplingAlgorithm`. ``target`` is a
    :class:`TargetKernel` or a registered target name (resolved against
    ``dim``, defaulting to the position block's trailing dimension)."""
    kernel = build_kernel(tile_chains=tile_chains, interpret=interpret)

    def init_fn(position, rng_key=None):
        del rng_key
        return init(position, target, dim)

    def step_fn(rng_key: PRNGKey, state):
        return kernel(
            rng_key, state, target, step_size, inverse_mass_matrix,
            num_integration_steps,
        )

    return SamplingAlgorithm(init_fn, step_fn)
