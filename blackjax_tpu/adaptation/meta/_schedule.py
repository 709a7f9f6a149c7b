"""Window schedule for the multi-chain meta-adaptation path.

Behavioral parity target: ``blackjax/adaptation/meta/_schedule.py``
(``_build_mc_window_schedule`` :21): the detection-relevant sample count is
the POOLED ``M * n``, so the first main window is sized ``ceil(8 (k+1) / M)``
per chain — restoring early-escalation eligibility that a single-chain-sized
schedule loses at M >= 4.
"""
from blackjax_tpu.adaptation.low_rank_adaptation import build_growing_window_schedule
from blackjax_tpu.adaptation.meta._calibration import _MIN_TRAIN_K_RATIO


def _build_mc_window_schedule(num_steps: int, M: int, actual_rank: int):
    """Pooled-aware growing-window schedule: first main window ``n1`` chosen
    so ``n1 * M >= 8 (actual_rank + 1)`` (the projected-tier R^2 floor)."""
    min_n_proj = 2 * _MIN_TRAIN_K_RATIO * (actual_rank + 1)
    n1 = max(-(-min_n_proj // M), 1)
    return build_growing_window_schedule(
        num_steps, early_window=0.0, window_size=n1, window_growth=1.5
    )
