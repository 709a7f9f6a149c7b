from blackjax_tpu.parallel import eca

__all__ = ["eca"]
