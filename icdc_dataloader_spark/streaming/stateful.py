"""Custom stateful streaming operator: per-key change-burst sessions.

The reference has no analogue (its SQS loop is stateless per message);
this is the training-data-pipeline operator a 10^10-event CDC stream needs
for hot-key hygiene: group change events per repo into BURSTS (sessions
closed by a quiet gap), so downstream policy (rate limiting, bot filtering,
compaction hints for hot repos) keys off (repo, burst) instead of raw rows.

Spark surface: ``groupBy(key).applyInPandasWithState`` — Arrow-batched
per-key state (count / span / last-seen), sessions emitted when a gap
closes them or the state times out.  State size is O(live keys), not rows;
the stream stays one shuffle (the groupBy) wide.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "repo string, burst_start timestamp, burst_end timestamp,"
    " n_events long, closed_by string"
)
STATE_SCHEMA = "start long, last long, n long"


def _burst_fn(gap_seconds: int, use_timeout: bool):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (repo,) = key
        if use_timeout and state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"repo": [repo],
                 "burst_start": [pd.Timestamp(start, unit="us")],
                 "burst_end": [pd.Timestamp(last, unit="us")],
                 "n_events": [n], "closed_by": ["timeout"]}
            )
            return
        ts = pd.concat([p["ts"] for p in pdfs]).dropna()
        # NaT would become INT64_MIN and poison min(start, t) for the
        # key's open burst — nulls carry no event time, drop them
        us = sorted(ts.astype("datetime64[us]").astype("int64").tolist())
        start, last, n = state.get if state.exists else (None, None, 0)
        out = {"repo": [], "burst_start": [], "burst_end": [],
               "n_events": [], "closed_by": []}
        for t in us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                out["repo"].append(repo)
                out["burst_start"].append(pd.Timestamp(start, unit="us"))
                out["burst_end"].append(pd.Timestamp(last, unit="us"))
                out["n_events"].append(n)
                out["closed_by"].append("gap")
                start, last, n = t, t, 1
            else:
                # cross-batch late arrival: t can be BELOW the state's
                # span — the burst must only ever widen (a moved-back
                # `last` emitted end<start and split real bursts)
                start, last, n = min(start, t), max(last, t), n + 1
        if start is None:
            # batch carried only null timestamps for a fresh key: storing
            # (None, None, 0) would register a timeout that later emits a
            # garbage NaT/0-event burst row — leave no state behind
            return
        state.update((start, last, n))
        if use_timeout:
            state.setTimeoutDuration(gap_seconds * 1000)
        if out["repo"]:
            yield pd.DataFrame(out)

    return fn


def change_bursts(
    events: DataFrame,
    gap_seconds: int = 300,
    key_col: str = "repo",
    ts_col: str = "ts",
    idle_timeout: bool = False,
) -> DataFrame:
    """Streaming DataFrame of closed bursts (append mode).

    Bursts close when a later event exceeds the gap; open bursts stay in
    state.  ``idle_timeout=True`` additionally closes them by
    processing-time timeout — use in continuous deployments; leave off for
    ``availableNow`` drains (a pending timeout keeps the trigger loop
    alive until it fires, so the drain would not terminate).
    """
    from pyspark.sql import functions as F

    src = events.select(F.col(key_col).alias("repo"), F.col(ts_col).alias("ts"))
    return src.groupBy("repo").applyInPandasWithState(
        _burst_fn(gap_seconds, idle_timeout),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
