"""blackjax_tpu — a TPU-native Bayesian sampling framework.

Every algorithm module follows the ``(init, build_kernel, as_top_level_api)``
convention; this package reflects each into a callable registry entry so that
``blackjax_tpu.nuts(...)`` builds a ``SamplingAlgorithm`` while
``blackjax_tpu.nuts.init`` / ``.build_kernel`` stay reachable (the
``GenerateSamplingAPI`` pattern of the reference, ``blackjax/__init__.py:71-107``).
"""
import dataclasses
import functools
from typing import Callable

from blackjax_tpu import diagnostics, util
from blackjax_tpu.diagnostics import effective_sample_size as ess
from blackjax_tpu.diagnostics import ess_bulk, ess_tail, pareto_khat, rhat
from blackjax_tpu.optimizers import dual_averaging, lbfgs
from blackjax_tpu.progress_bar import progress_bar
from blackjax_tpu.adaptation.adjusted_mclmc_adaptation import (
    adjusted_mclmc_find_L_and_step_size,
)
from blackjax_tpu.adaptation.chees_adaptation import chees_adaptation
from blackjax_tpu.adaptation.low_rank_adaptation import window_adaptation_low_rank
from blackjax_tpu.adaptation.mclmc_adaptation import mclmc_find_L_and_step_size
from blackjax_tpu.adaptation.mclmc_lrd_adaptation import mclmc_lrd_warmup
from blackjax_tpu.adaptation.meads_adaptation import meads_adaptation
from blackjax_tpu.adaptation.pathfinder_adaptation import pathfinder_adaptation
from blackjax_tpu.adaptation.staged_adaptation import staged_adaptation
from blackjax_tpu.adaptation.step_size import dual_averaging_adaptation
from blackjax_tpu.adaptation.window_adaptation import window_adaptation
from blackjax_tpu.base import (
    AdaptationAlgorithm,
    SamplingAlgorithm,
    VIAlgorithm,
    build_sampling_algorithm,
)
from blackjax_tpu.mcmc import adjusted_mclmc as _adjusted_mclmc
from blackjax_tpu.mcmc import adjusted_mclmc_dynamic as _adjusted_mclmc_dynamic
from blackjax_tpu.mcmc import barker as _barker
from blackjax_tpu.mcmc import dynamic_hmc as _dynamic_hmc
from blackjax_tpu.mcmc import elliptical_slice as _elliptical_slice
from blackjax_tpu.mcmc import marginal_latent_gaussian as _marginal_latent_gaussian
from blackjax_tpu.mcmc import periodic_orbital as _periodic_orbital
from blackjax_tpu.mcmc import rmhmc as _rmhmc
from blackjax_tpu.mcmc import slice as _slice
from blackjax_tpu.mcmc import ghmc as _ghmc
from blackjax_tpu.mcmc import gist_step_size as _gist_step_size
from blackjax_tpu.mcmc import gist_trajectory_length as _gist_trajectory_length
from blackjax_tpu.mcmc import hmc as _hmc
from blackjax_tpu.mcmc import laplace_dynamic_hmc as _laplace_dynamic_hmc
from blackjax_tpu.mcmc import laplace_hmc as _laplace_hmc
from blackjax_tpu.mcmc import marginal_latent_gaussian as _mlg_unused  # noqa: F401
from blackjax_tpu.mcmc import mala as _mala
from blackjax_tpu.mcmc import mclmc as _mclmc
from blackjax_tpu.mcmc import nuts as _nuts
from blackjax_tpu.mcmc import random_walk
from blackjax_tpu.ns import nss as _nss
from blackjax_tpu.sgmcmc import csgld as _csgld
from blackjax_tpu.sgmcmc import sghmc as _sghmc
from blackjax_tpu.sgmcmc import sgld as _sgld
from blackjax_tpu.sgmcmc import sgnht as _sgnht
from blackjax_tpu.smc import adaptive_persistent_sampling as _adaptive_persistent
from blackjax_tpu.smc import adaptive_tempered as _adaptive_tempered
from blackjax_tpu.smc import inner_kernel_tuning as _inner_kernel_tuning
from blackjax_tpu.smc import partial_posteriors_path as _partial_posteriors_smc
from blackjax_tpu.smc import persistent_sampling as _persistent_sampling
from blackjax_tpu.smc import pretuning as _pretuning
from blackjax_tpu.smc import tempered as _tempered
from blackjax_tpu.vi import fullrank_vi as _fullrank_vi
from blackjax_tpu.vi import meanfield_vi as _meanfield_vi
from blackjax_tpu.vi import multipathfinder as _multipathfinder
from blackjax_tpu.vi import pathfinder as _pathfinder
from blackjax_tpu.vi import schrodinger_follmer as _schrodinger_follmer
from blackjax_tpu.vi import svgd as _svgd

__version__ = "0.1.0"


def _canonicalize_init(init: Callable) -> Callable:
    """Convert the user's position leaves to committed arrays before ``init``
    runs. Weak-typed Python scalars (``init(1.0, ...)``) would otherwise give
    the first jitted ``step`` call a different signature than every later
    one — a silent extra XLA compile per chain start (caught by
    tests/test_compilation.py)."""
    import jax as _jax
    import jax.numpy as _jnp

    def strengthen(x):
        a = _jnp.asarray(x)
        # astype with an explicit dtype drops the weak-type flag
        return a.astype(a.dtype)

    @functools.wraps(init)
    def wrapped(position, *args, **kwargs):
        position = _jax.tree.map(strengthen, position)
        return init(position, *args, **kwargs)

    return wrapped


@dataclasses.dataclass
class GenerateSamplingAPI:
    """Callable wrapper exposing an algorithm module's full surface."""

    differentiable: Callable
    init: Callable
    build_kernel: Callable

    def __post_init__(self):
        self.init = _canonicalize_init(self.init)

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


@dataclasses.dataclass
class GeneratePathfinderAPI:
    differentiable: Callable
    approximate: Callable
    sample: Callable

    def __call__(self, *args, **kwargs):
        return self.differentiable(*args, **kwargs)


def generate_top_level_api_from(module) -> GenerateSamplingAPI:
    return GenerateSamplingAPI(
        module.as_top_level_api, module.init, module.build_kernel
    )


# --- MCMC -----------------------------------------------------------------
hmc = generate_top_level_api_from(_hmc)
nuts = generate_top_level_api_from(_nuts)
mala = generate_top_level_api_from(_mala)
ghmc = generate_top_level_api_from(_ghmc)
mclmc = generate_top_level_api_from(_mclmc)
adjusted_mclmc = generate_top_level_api_from(_adjusted_mclmc)
adjusted_mclmc_dynamic = generate_top_level_api_from(_adjusted_mclmc_dynamic)
dhmc = generate_top_level_api_from(_dynamic_hmc)
dynamic_hmc = dhmc

rmh = GenerateSamplingAPI(
    random_walk.rmh_as_top_level_api, random_walk.init, random_walk.build_rmh
)
irmh = GenerateSamplingAPI(
    random_walk.irmh_as_top_level_api, random_walk.init, random_walk.build_irmh
)
additive_step_random_walk = GenerateSamplingAPI(
    random_walk.additive_step_random_walk,
    random_walk.init,
    random_walk.build_additive_step,
)
additive_step_random_walk.register_factory(
    "normal_random_walk", random_walk.normal_random_walk
)
# migration parity: the reference also exports this convenience at top level
# (reference ``__init__.py`` normal_random_walk)
normal_random_walk = random_walk.normal_random_walk

mhmc = GenerateSamplingAPI(
    functools.partial(_hmc.as_top_level_api, build_proposal=_hmc.multinomial_hmc_proposal),
    _hmc.init,
    functools.partial(_hmc.build_kernel, build_proposal=_hmc.multinomial_hmc_proposal),
)
multinomial_hmc = mhmc

dmhmc = GenerateSamplingAPI(
    functools.partial(
        _dynamic_hmc.as_top_level_api, build_proposal=_hmc.multinomial_hmc_proposal
    ),
    _dynamic_hmc.init,
    functools.partial(
        _dynamic_hmc.build_kernel, build_proposal=_hmc.multinomial_hmc_proposal
    ),
)

hmc_family = [hmc, nuts, mhmc]

barker = generate_top_level_api_from(_barker)
barker_proposal = barker
rmhmc = generate_top_level_api_from(_rmhmc)
elliptical_slice = generate_top_level_api_from(_elliptical_slice)
slice_sampling = generate_top_level_api_from(_slice)
coordinate_slice = GenerateSamplingAPI(
    _slice.coordinate_slice, _slice.init, _slice.build_coordinate_kernel
)
orbital_hmc = generate_top_level_api_from(_periodic_orbital)
mgrad_gaussian = generate_top_level_api_from(_marginal_latent_gaussian)
gist_step_size = generate_top_level_api_from(_gist_step_size)
gist_trajectory_length = generate_top_level_api_from(_gist_trajectory_length)

# Pallas fast path: registered-analytic-target chain-blocked HMC (the
# package attribute `ops.fused_hmc` is shadowed by the class, so resolve the
# MODULE through importlib)
import importlib as _importlib  # noqa: E402

fused_hmc = generate_top_level_api_from(
    _importlib.import_module("blackjax_tpu.ops.fused_hmc")
)

laplace_hmc = generate_top_level_api_from(_laplace_hmc)
laplace_mhmc = GenerateSamplingAPI(
    functools.partial(
        _laplace_hmc.as_top_level_api, build_proposal=_hmc.multinomial_hmc_proposal
    ),
    _laplace_hmc.init,
    functools.partial(
        _laplace_hmc.build_kernel, build_proposal=_hmc.multinomial_hmc_proposal
    ),
)
laplace_dhmc = generate_top_level_api_from(_laplace_dynamic_hmc)
laplace_dmhmc = GenerateSamplingAPI(
    functools.partial(
        _laplace_dynamic_hmc.as_top_level_api,
        build_proposal=_hmc.multinomial_hmc_proposal,
    ),
    _laplace_dynamic_hmc.init,
    functools.partial(
        _laplace_dynamic_hmc.build_kernel,
        build_proposal=_hmc.multinomial_hmc_proposal,
    ),
)

# --- SMC ------------------------------------------------------------------
tempered_smc = generate_top_level_api_from(_tempered)
adaptive_tempered_smc = generate_top_level_api_from(_adaptive_tempered)
inner_kernel_tuning = generate_top_level_api_from(_inner_kernel_tuning)
partial_posteriors_smc = generate_top_level_api_from(_partial_posteriors_smc)
persistent_sampling_smc = generate_top_level_api_from(_persistent_sampling)
adaptive_persistent_sampling_smc = generate_top_level_api_from(_adaptive_persistent)
pretuning = generate_top_level_api_from(_pretuning)
smc_family = [
    tempered_smc,
    adaptive_tempered_smc,
    partial_posteriors_smc,
    persistent_sampling_smc,
    adaptive_persistent_sampling_smc,
]

# --- Nested sampling ------------------------------------------------------
nss = GenerateSamplingAPI(_nss.as_top_level_api, _nss.init, _nss.build_kernel)
nsswig = GenerateSamplingAPI(
    _nss.swig_as_top_level_api, _nss.init, _nss.build_swig_kernel
)
ns_family = [nss, nsswig]

# --- SGMCMC ---------------------------------------------------------------
sgld = generate_top_level_api_from(_sgld)
sghmc = generate_top_level_api_from(_sghmc)
sgnht = generate_top_level_api_from(_sgnht)
csgld = generate_top_level_api_from(_csgld)

# --- Variational inference ------------------------------------------------
svgd = generate_top_level_api_from(_svgd)
meanfield_vi = GenerateVariationalAPI(
    _meanfield_vi.as_top_level_api,
    _meanfield_vi.init,
    _meanfield_vi.step,
    _meanfield_vi.sample,
)
fullrank_vi = GenerateVariationalAPI(
    _fullrank_vi.as_top_level_api,
    _fullrank_vi.init,
    _fullrank_vi.step,
    _fullrank_vi.sample,
)
schrodinger_follmer = GenerateVariationalAPI(
    _schrodinger_follmer.as_top_level_api,
    _schrodinger_follmer.init,
    _schrodinger_follmer.step,
    _schrodinger_follmer.sample,
)
pathfinder = GeneratePathfinderAPI(
    _pathfinder.as_top_level_api, _pathfinder.approximate, _pathfinder.sample
)
multipathfinder = _multipathfinder.as_top_level_api

__all__ = [
    "tempered_smc",
    "adaptive_tempered_smc",
    "inner_kernel_tuning",
    "partial_posteriors_smc",
    "persistent_sampling_smc",
    "adaptive_persistent_sampling_smc",
    "pretuning",
    "smc_family",
    "nss",
    "nsswig",
    "ns_family",
    "sgld",
    "sghmc",
    "sgnht",
    "csgld",
    "svgd",
    "meanfield_vi",
    "fullrank_vi",
    "schrodinger_follmer",
    "pathfinder",
    "multipathfinder",
    "__version__",
    "SamplingAlgorithm",
    "VIAlgorithm",
    "AdaptationAlgorithm",
    "build_sampling_algorithm",
    "diagnostics",
    "ess",
    "ess_bulk",
    "ess_tail",
    "pareto_khat",
    "rhat",
    "lbfgs",
    "progress_bar",
    "util",
    "dual_averaging",
    "hmc",
    "fused_hmc",
    "mhmc",
    "multinomial_hmc",
    "nuts",
    "dhmc",
    "dmhmc",
    "dynamic_hmc",
    "mala",
    "rmh",
    "irmh",
    "additive_step_random_walk",
    "normal_random_walk",
    "ghmc",
    "mclmc",
    "adjusted_mclmc",
    "adjusted_mclmc_dynamic",
    "barker",
    "barker_proposal",
    "rmhmc",
    "elliptical_slice",
    "slice_sampling",
    "coordinate_slice",
    "orbital_hmc",
    "mgrad_gaussian",
    "gist_step_size",
    "gist_trajectory_length",
    "laplace_hmc",
    "laplace_mhmc",
    "laplace_dhmc",
    "laplace_dmhmc",
    "staged_adaptation",
    "mclmc_lrd_warmup",
    "adjusted_mclmc_find_L_and_step_size",
    "window_adaptation",
    "window_adaptation_low_rank",
    "dual_averaging_adaptation",
    "chees_adaptation",
    "meads_adaptation",
    "pathfinder_adaptation",
    "mclmc_find_L_and_step_size",
    "hmc_family",
]
