from blackjax_tpu.sgmcmc import csgld, diffusions, gradients, sghmc, sgld, sgnht

__all__ = ["csgld", "diffusions", "gradients", "sghmc", "sgld", "sgnht"]
