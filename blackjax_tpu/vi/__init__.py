from blackjax_tpu.vi import (
    fullrank_vi,
    meanfield_vi,
    multipathfinder,
    pathfinder,
    schrodinger_follmer,
    svgd,
)

__all__ = [
    "fullrank_vi",
    "meanfield_vi",
    "multipathfinder",
    "pathfinder",
    "schrodinger_follmer",
    "svgd",
]
