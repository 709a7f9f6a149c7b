from blackjax_tpu.optimizers import dual_averaging

__all__ = ["dual_averaging"]
