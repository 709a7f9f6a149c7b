"""blackjax_tpu — a TPU-native Bayesian sampling framework.

Every algorithm module follows the ``(init, build_kernel, as_top_level_api)``
convention; this package reflects each into a callable registry entry so that
``blackjax_tpu.nuts(...)`` builds a ``SamplingAlgorithm`` while
``blackjax_tpu.nuts.init`` / ``.build_kernel`` stay reachable (the
``GenerateSamplingAPI`` pattern of the reference, ``blackjax/__init__.py:71-107``).
"""
import dataclasses
from typing import Callable

from blackjax_tpu import diagnostics, util
from blackjax_tpu.base import (
    AdaptationAlgorithm,
    SamplingAlgorithm,
    VIAlgorithm,
    build_sampling_algorithm,
)
from blackjax_tpu.mcmc import hmc as _hmc
from blackjax_tpu.mcmc import nuts as _nuts

__version__ = "0.1.0"


@dataclasses.dataclass
class GenerateSamplingAPI:
    """Callable wrapper exposing an algorithm module's full surface."""

    differentiable: Callable
    init: Callable
    build_kernel: Callable

    def __call__(self, *args, **kwargs) -> SamplingAlgorithm:
        return self.differentiable(*args, **kwargs)

    def register_factory(self, name, callable):
        setattr(self, name, callable)


@dataclasses.dataclass
class GenerateVariationalAPI:
    differentiable: Callable
    init: Callable
    step: Callable
    sample: Callable

    def __call__(self, *args, **kwargs) -> VIAlgorithm:
        return self.differentiable(*args, **kwargs)


def generate_top_level_api_from(module) -> GenerateSamplingAPI:
    return GenerateSamplingAPI(
        module.as_top_level_api, module.init, module.build_kernel
    )


# --- MCMC -----------------------------------------------------------------
hmc = generate_top_level_api_from(_hmc)
nuts = generate_top_level_api_from(_nuts)

__all__ = [
    "__version__",
    "SamplingAlgorithm",
    "VIAlgorithm",
    "AdaptationAlgorithm",
    "build_sampling_algorithm",
    "diagnostics",
    "util",
    "hmc",
    "nuts",
]
