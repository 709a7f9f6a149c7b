"""Static-shape cross-device gathers for sharded ensembles.

``ring_gather`` fetches arbitrary global rows of a sharded ``(n, ...)``
block: the block is rotated around the mesh-axis ring with ``ppermute`` and
each device claims, per round, whichever of its requested rows live in the
block it currently holds. Bytes moved equal one all-gather of the block, but
peak memory stays at 2x the local block (vs ``ndev``x for a naive
``all_gather`` + index) and the rounds pipeline on the ICI ring.

This is the communication primitive behind the sharded SMC resample
(:mod:`blackjax_tpu.parallel.smc`, where the claims come fused with the
inverse-CDF search) and the MEADS cross-fold reshuffle (reference
``blackjax/adaptation/meads_adaptation.py:316`` does ``x[perm]`` on one
device).
"""
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["ring_gather"]


def ring_gather(tree: Any, global_indices: jnp.ndarray, axis_name: str) -> Any:
    """Gather rows ``global_indices`` (one per local output slot) of a
    sharded pytree whose leaves have leading dim ``n_local`` per device and
    global row ``g`` living on device ``g // n_local`` at offset
    ``g % n_local``."""
    ndev = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    n_local = jax.tree.leaves(tree)[0].shape[0]
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    src_shard = global_indices // n_local
    offset = global_indices % n_local

    def one_round(r, carry):
        acc, blk = carry
        holding = (me - r) % ndev  # shard whose block we hold this round
        claim = src_shard == holding
        acc = jax.tree.map(
            lambda a, b: jnp.where(
                claim.reshape((-1,) + (1,) * (b.ndim - 1)), b[offset], a
            ),
            acc,
            blk,
        )
        return acc, jax.tree.map(lambda x: lax.ppermute(x, axis_name, perm), blk)

    acc, _ = lax.fori_loop(0, ndev, one_round, (tree, tree))
    return acc
