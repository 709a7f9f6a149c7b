"""Back-compatibility shim — import from :mod:`blackjax_tpu.adaptation.meta`.

Behavioral parity target: ``blackjax/adaptation/meta_adaptation.py`` (the
reference keeps this module as a deprecated re-export after reorganising the
controller into the ``meta`` sub-package).
"""
import warnings as _warnings

_warnings.warn(
    "blackjax_tpu.adaptation.meta_adaptation is deprecated; "
    "import from blackjax_tpu.adaptation.meta instead.",
    DeprecationWarning,
    stacklevel=1,
)

from blackjax_tpu.adaptation.meta import (  # noqa: E402,F401
    MetaAdaptationCoreState,
    MetaAdaptationVerdict,
    MultiChainMetaAdaptationCoreState,
    build_meta_adaptation_core,
    build_multi_chain_meta_core,
    extract_meta_verdict,
    extract_multi_chain_verdict,
)
from blackjax_tpu.adaptation.meta._calibration import (  # noqa: E402,F401
    _ASSUMED_AVG_LEAPFROGS_PER_STEP,
    _MAX_RANK_CAP,
)
