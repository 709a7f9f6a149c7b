"""Warmup/adaptation engines, grouped by what they tune."""
# Step-size and mass-matrix primitives
from blackjax_tpu.adaptation import mass_matrix as mass_matrix
from blackjax_tpu.adaptation import step_size as step_size

# The staged warmup engine and its metric plugin stack
from blackjax_tpu.adaptation import metric_buffers as metric_buffers
from blackjax_tpu.adaptation import metric_estimators as metric_estimators
from blackjax_tpu.adaptation import metric_recipes as metric_recipes
from blackjax_tpu.adaptation import staged_adaptation as staged_adaptation
from blackjax_tpu.adaptation import window_adaptation as window_adaptation

# Specialized warmups
from blackjax_tpu.adaptation import low_rank_adaptation as low_rank_adaptation
from blackjax_tpu.adaptation import meta as meta
from blackjax_tpu.adaptation import pathfinder_adaptation as pathfinder_adaptation

# Cross-chain / ensemble adaptation
from blackjax_tpu.adaptation import chees_adaptation as chees_adaptation
from blackjax_tpu.adaptation import laps as laps
from blackjax_tpu.adaptation import laps_burn_in as laps_burn_in
from blackjax_tpu.adaptation import meads_adaptation as meads_adaptation

# Microcanonical tuners
from blackjax_tpu.adaptation import adjusted_mclmc_adaptation as adjusted_mclmc_adaptation
from blackjax_tpu.adaptation import mclmc_adaptation as mclmc_adaptation
from blackjax_tpu.adaptation import mclmc_lrd_adaptation as mclmc_lrd_adaptation

# Result containers
from blackjax_tpu.adaptation.base import AdaptationInfo as AdaptationInfo
from blackjax_tpu.adaptation.base import AdaptationResults as AdaptationResults

__all__ = [name for name in dir() if not name.startswith("_")]
