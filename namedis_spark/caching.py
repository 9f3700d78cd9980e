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

import logging

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)

_TRACKED: list[DataFrame] = []
_CAP = 16


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for bounded, releasable caching.

    Eviction is FIFO once the cap is hit. Evicting a handle whose
    downstream lazy plan has not run yet silently recomputes the stage the
    persist existed to avoid (e.g. an LSH signature table measured at 105s
    recompute vs 13s cached), so eviction prefers entries whose cache is
    already materialized and always logs what it dropped."""
    while len(_TRACKED) >= _CAP:
        victim = _TRACKED.pop(0)
        log.warning(
            "tracked_persist cap (%d) hit: evicting the oldest cached "
            "intermediate; if its consumers have not run yet that stage "
            "will recompute",
            _CAP,
        )
        try:
            victim.unpersist()
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
