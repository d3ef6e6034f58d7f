"""Debug helpers: NaN checking.

The TPU-native analogue of the reference's ``np.seterr(all="raise")`` +
assert-on-overflow guards in its legacy generator
(``dataset_generation.py:64,129-132``) — see SURVEY.md §5: with
``jax_debug_nans`` every jitted computation re-runs un-jitted on NaN
production and raises at the exact primitive.
"""

from __future__ import annotations

import jax


def enable_nan_checks(enable: bool = True) -> None:
    """Globally enable/disable NaN detection in jitted code.

    Costly (disables async dispatch on error paths) — use while debugging
    diverging runs, not in production training.
    """
    jax.config.update("jax_debug_nans", enable)
