"""Type aliases shared across the library.

TPU-native rebuild of the contracts in the reference library
(``blackjax/types.py``): everything is a pytree of arrays, PRNG keys are
JAX typed keys or uint32 key arrays.
"""
from typing import Any, Union

import jax

__all__ = ["Array", "ArrayLike", "ArrayTree", "ArrayLikeTree", "PRNGKey", "Numeric"]

Array = jax.Array
ArrayLike = Union[jax.Array, Any]

# A pytree whose leaves are arrays / array-likes. JAX has no recursive pytree
# type, so these are aliases used for documentation purposes.
ArrayTree = Any
ArrayLikeTree = Any

PRNGKey = jax.Array
Numeric = Union[jax.Array, float, int]
