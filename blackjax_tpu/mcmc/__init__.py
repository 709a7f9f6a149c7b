"""MCMC kernel family: HMC mechanics (integrators/metrics/trajectory/
proposal/termination) plus every sampler module, grouped by mechanism."""
# HMC mechanics (L2)
from blackjax_tpu.mcmc import diffusions as diffusions
from blackjax_tpu.mcmc import integrators as integrators
from blackjax_tpu.mcmc import metrics as metrics
from blackjax_tpu.mcmc import proposal as proposal
from blackjax_tpu.mcmc import termination as termination
from blackjax_tpu.mcmc import trajectory as trajectory

# Hamiltonian samplers
from blackjax_tpu.mcmc import dynamic_hmc as dynamic_hmc
from blackjax_tpu.mcmc import ghmc as ghmc
from blackjax_tpu.mcmc import hmc as hmc
from blackjax_tpu.mcmc import nuts as nuts
from blackjax_tpu.mcmc import periodic_orbital as periodic_orbital
from blackjax_tpu.mcmc import rmhmc as rmhmc

# Microcanonical family
from blackjax_tpu.mcmc import adjusted_mclmc as adjusted_mclmc
from blackjax_tpu.mcmc import adjusted_mclmc_dynamic as adjusted_mclmc_dynamic
from blackjax_tpu.mcmc import mclmc as mclmc

# Gibbs self-tuning family
from blackjax_tpu.mcmc import gist as gist
from blackjax_tpu.mcmc import gist_step_size as gist_step_size
from blackjax_tpu.mcmc import gist_trajectory_length as gist_trajectory_length

# Gradient-based non-Hamiltonian samplers
from blackjax_tpu.mcmc import barker as barker
from blackjax_tpu.mcmc import mala as mala

# Slice / random-walk / specialized samplers
from blackjax_tpu.mcmc import elliptical_slice as elliptical_slice
from blackjax_tpu.mcmc import laplace_dynamic_hmc as laplace_dynamic_hmc
from blackjax_tpu.mcmc import laplace_hmc as laplace_hmc
from blackjax_tpu.mcmc import laplace_marginal as laplace_marginal
from blackjax_tpu.mcmc import marginal_latent_gaussian as marginal_latent_gaussian
from blackjax_tpu.mcmc import random_walk as random_walk
from blackjax_tpu.mcmc import slice as slice  # noqa: A004

__all__ = [name for name in dir() if not name.startswith("_")]
