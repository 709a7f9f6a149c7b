from blackjax_tpu.ns import adaptive, base, from_mcmc, integrator, utils

__all__ = ["adaptive", "base", "from_mcmc", "integrator", "utils"]
