"""Custom stateful streaming operator — applyInPandasWithState.

Sessionization over the events stream: per user, events within
`gap_minutes` of each other belong to one session; a watermark-driven
timeout closes sessions. This is the engine's custom-stateful-operator
surface (the task's `applyInPandasWithState` capability); the reference
pipeline itself is batch (SURVEY.md §2.11).

The batch twin (`sessionize_batch`) computes identical sessions with window
functions; equality for drained static input is asserted in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state in integer MICROSECONDS: float seconds lose sub-microsecond
# precision and Arrow refuses the lossy ns->us timestamp cast on output
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin: session = maximal run of a user's events with inter-event
    gap <= gap_minutes (lag + cumulative session index)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond-exact gaps (unix_micros), matching the streaming twin —
    # whole-second casts would merge sessions whose gap exceeds the limit
    # by a sub-second amount
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    with_break = events.withColumn(
        "brk",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    with_sess = with_break.withColumn(
        "sess",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sess.groupBy("user_id", "sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    gap_minutes: int = 30,
):
    """Streaming sessionization with per-user GroupState and processing-time
    timeout. Sessions are emitted when a newer event closes them (gap
    exceeded) or the processing-time timeout fires; sessions still open when
    a drain finishes remain in state (flushed by the next trigger).

    ORDERED-ARRIVAL CONTRACT: like any processing-time sessionizer, this
    requires per-key arrival in event-time order across micro-batches. NOTE
    Spark's file source orders files by MODIFICATION TIME (not path), so a
    file-backed stream must write its time-range chunks with increasing
    mtimes; Kafka needs per-key partition ordering. An out-of-order-robust
    variant would buffer events in state under an event-time watermark
    before emitting — heavier state, same output schema."""

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                rows.append((user_id, s, last, n))
                state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(pdf["ts"].astype("int64").values // 1000)  # ns -> us
            ts.sort()
            if state.exists:
                s, last, n = state.get
            else:
                s, last, n = None, None, 0
            for t in ts:
                if s is None:
                    s, last, n = t, t, 1
                elif t - last <= gap_us:
                    last, n = t, n + 1
                else:
                    rows.append((user_id, s, last, n))
                    s, last, n = t, t, 1
            if s is not None:
                state.update((int(s), int(last), int(n)))
                state.setTimeoutDuration(gap_us // 1000)
        out = pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        if len(out):
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        else:
            out = out.astype(
                {"session_start": "datetime64[ns]", "session_end": "datetime64[ns]"}
            )
        yield out

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
