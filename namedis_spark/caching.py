"""Session-scoped tracking for persisted intermediates.

Several operators persist a mid-plan table because the downstream plan
references it several times (LSH signature tables, derived-name surfaces)
— but the operator returns a lazy DataFrame, so it cannot unpersist before
the caller's action runs. Tracking the persisted handles here bounds the
cache in long-lived sessions: the oldest entries are evicted once the cap
is hit, and ``release_all`` (wired into ``session.close_session`` and
``queries.clear_feature_cache``) frees everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_CAP = 16


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for bounded, releasable caching."""
    while len(_TRACKED) >= _CAP:
        try:
            _TRACKED.pop(0).unpersist()
        except Exception:
            pass  # session may already be stopped
    _TRACKED.append(df.persist())
    return df


def release_all() -> None:
    """Unpersist every tracked intermediate (session-close hook)."""
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
        except Exception:
            pass
