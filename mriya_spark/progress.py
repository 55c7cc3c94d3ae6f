"""Progress/observability surface (§2.11).

The reference reports progress with a driver-side terminal bar, a
spinner, and a success-count check over DML results
(`/root/reference/project_utils.py:8-35`, `:38-46`, `:48-54`) — all
driven by its serial chunk loops. A distributed engine can't count a
loop on the driver; the equivalents here are event-driven:

- streaming     -> ``ProgressLog``, a ``StreamingQueryListener`` that
                   accumulates per-micro-batch progress (rows, rates,
                   batch durations, state size) for every query on the
                   session — the data behind any bar/spinner UI, plus
                   a ``success_ratio``-style summary.
- batch writes  -> the connector's commit messages already aggregate
                   ``n_rows``/``n_calls`` per partition
                   (`connector/salesforce.py` ``_WriteResult``), the
                   success_records_check analogue at the sink.

The listener keeps only compact dicts (one per batch), so attaching it
for a session's lifetime is O(batches) driver memory.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed_counts(
    df: DataFrame, *, success: Column | None = None, name: str = "progress"
) -> tuple[DataFrame, Observation]:
    """Batch-side progress: attach an ``Observation`` counting rows
    (and successes, given a predicate) to a plan; metrics materialize
    with the FIRST action on the returned frame at zero extra cost —
    no second count() pass over the data.

    The ``success_records_check`` analogue (`/root/reference/
    project_utils.py:38-46`): the reference re-walked its result list
    to count ``success==True``; here the pipeline's own action
    produces ``{"n_rows": ..., "n_success": ...}`` via
    ``observation.get``.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if success is not None:
        metrics.append(
            F.sum(F.when(success, 1).otherwise(0)).alias("n_success")
        )
    return df.observe(obs, *metrics), obs


class ProgressLog(StreamingQueryListener):
    """Accumulates streaming progress events; query by name or id.

    Usage::

        plog = ProgressLog.attach(spark)
        ... run streaming queries ...
        plog.summary("my_query")   # {"batches": 3, "rows": 10000, ...}
        plog.detach(spark)
    """

    def __init__(self) -> None:
        self.started: list[dict[str, Any]] = []
        self.progress: list[dict[str, Any]] = []
        self.terminated: list[dict[str, Any]] = []

    # -- listener callbacks (called from Spark's listener bus) ----------
    def onQueryStarted(self, event) -> None:
        self.started.append(
            {"id": str(event.id), "name": event.name, "ts": event.timestamp}
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        # event.progress fields arrive as a typed object backed by the
        # driver's JSON payload; keep the compact dict form
        self.progress.append(json.loads(p.json))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(
            {"id": str(event.id), "exception": event.exception}
        )

    # -- reporting -------------------------------------------------------
    def batches(self, name_or_id: str) -> list[dict[str, Any]]:
        return [
            p
            for p in self.progress
            if p.get("name") == name_or_id or p.get("id") == name_or_id
        ]

    def summary(self, name_or_id: str) -> dict[str, Any]:
        """Rolled-up progress for one query — the numbers a progress
        bar renders (``printProgress(iteration=batches, ...)``) plus
        the failure count ``success_records_check`` would report.
        Failures are scoped to THIS query's run ids (one name can map
        to several ids across restarts)."""
        bs = self.batches(name_or_id)
        rows = sum(int(b.get("numInputRows") or 0) for b in bs)
        ms = sum(
            int((b.get("durationMs") or {}).get("triggerExecution") or 0)
            for b in bs
        )
        last_state = next(
            (
                int(s.get("numRowsTotal") or 0)
                for b in reversed(bs)
                for s in (b.get("stateOperators") or [])[:1]
            ),
            0,
        )
        my_ids = {name_or_id} | {
            s["id"] for s in self.started if s["name"] == name_or_id
        }
        failed = [
            t for t in self.terminated if t["exception"] and t["id"] in my_ids
        ]
        return {
            "batches": len(bs),
            "rows": rows,
            "trigger_ms": ms,
            "rows_per_sec": round(rows / (ms / 1000), 1) if ms else None,
            "last_state_rows": last_state,
            "failures": len(failed),
        }

    # -- lifecycle -------------------------------------------------------
    @classmethod
    def attach(cls, spark: SparkSession) -> "ProgressLog":
        inst = cls()
        spark.streams.addListener(inst)
        return inst

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)
