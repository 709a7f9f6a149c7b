"""Mesh and precision configuration for multi-chip runs.

SURVEY.md §5.6: the reference has no config system (kwargs + closures);
the TPU build adds exactly one tiny dataclass so mesh construction and the
precision policy live in one declared place instead of being rebuilt ad hoc
at every call site.
"""
import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["MeshConfig", "chains_spec", "replicated_spec"]


def chains_spec() -> PartitionSpec:
    """The canonical chain-data-parallel PartitionSpec."""
    return PartitionSpec("chains")


def replicated_spec() -> PartitionSpec:
    return PartitionSpec()


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """One declared place for the run's mesh and precision policy.

    ``axis_sizes`` maps axis names to sizes; the default is the 1-D
    ``("chains",)`` mesh over every available device (the layout every
    cross-chain algorithm in this package uses — ECA, LAPS, ChEES, MEADS,
    the staged multi-chain warmup and the sharded continuous NUTS runner).
    A second ``"dcn"`` axis (multi-slice) goes FIRST so chains stay on ICI
    within a slice.

    ``compute_dtype`` is the state dtype (f32 — MCMC positions need it);
    ``accum_dtype`` is for energy/moment accumulation (f64 when x64 is on).
    """

    axis_names: Sequence[str] = ("chains",)
    axis_sizes: Optional[Sequence[int]] = None
    compute_dtype: jnp.dtype = jnp.float32
    accum_dtype: Optional[jnp.dtype] = None

    def build(self, devices=None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        if self.axis_sizes is None:
            sizes = [len(devices)] + [1] * (len(self.axis_names) - 1)
        else:
            sizes = list(self.axis_sizes)
            if len(sizes) != len(self.axis_names):
                raise ValueError(
                    f"axis_sizes {sizes} does not match axis_names "
                    f"{self.axis_names}"
                )
        total = 1
        for s in sizes:
            total *= s
        if total > len(devices):
            raise ValueError(
                f"mesh needs {total} devices but only {len(devices)} available"
            )
        import numpy as np

        grid = np.array(devices[:total]).reshape(sizes)
        return Mesh(grid, tuple(self.axis_names))

    def shard_chains(self, mesh: Mesh, tree):
        """Place a pytree with a leading chain axis onto the mesh."""
        return jax.device_put(tree, NamedSharding(mesh, chains_spec()))

    def effective_accum_dtype(self):
        if self.accum_dtype is not None:
            return self.accum_dtype
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
