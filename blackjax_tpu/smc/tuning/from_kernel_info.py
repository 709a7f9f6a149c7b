"""Static inner-kernel tuning from MCMC transition info.

Behavioral parity target: ``blackjax/smc/tuning/from_kernel_info.py``.
"""
import jax
import jax.numpy as jnp

__all__ = ["update_scale_from_acceptance_rate"]


def update_scale_from_acceptance_rate(
    scales: jax.Array,
    acceptance_rates: jax.Array,
    target_acceptance_rate: float = 0.234,
) -> jax.Array:
    """Per-chain multiplicative scale update toward the target acceptance
    rate, shrunk halfway to the population mean to share information across
    chains."""
    updated = jnp.exp(jnp.log(scales) + acceptance_rates - target_acceptance_rate)
    return 0.5 * (updated + updated.mean())
