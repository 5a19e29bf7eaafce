"""Custom stateful streaming (sessionization) vs batch twin + the
input_hint lossy-codec PSNR gate."""

import numpy as np
import pandas as pd

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.operators.multimodal import (
    decode_image,
    encode_qraw,
    psnr_db,
)
from gtfs_conflation_pipeline_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)


def test_stream_sessions_match_batch_closed_sessions(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts"
    )
    src = str(tmp_path / "src")
    # ordered-arrival contract: Spark's file source orders files by
    # MODIFICATION TIME, so each time-range chunk is written sequentially
    # (strictly increasing mtimes) to guarantee time-ordered arrival (the
    # processing-time sessionizer's documented requirement)
    import time as _time

    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window as W2

    n = events.count()
    per = n // 5 + 1
    ranked = events.withColumn("_rk", F2.row_number().over(W2.orderBy("ts")))
    for k in range(5):
        chunk = ranked.filter(
            (F2.col("_rk") > k * per) & (F2.col("_rk") <= (k + 1) * per)
        ).drop("_rk")
        chunk.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct whole-second mtimes
    from pyspark.sql import functions as F

    batch = sessionize_batch(
        spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    ).toPandas()

    q = sessionize_stream(spark, src, str(tmp_path / "ck"), events.schema)
    q.awaitTermination(180)
    got = spark.table("sessions").toPandas()

    # stream emits only CLOSED sessions; each user's final session stays
    # open in state at end of drain -> batch minus per-user last session
    batch_sorted = batch.sort_values(["user_id", "session_start"])
    closed = batch_sorted.groupby("user_id").apply(
        lambda g: g.iloc[:-1], include_groups=False
    )
    closed = closed.reset_index(level=0)[
        ["user_id", "session_start", "session_end", "n_events"]
    ].reset_index(drop=True)
    got = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    closed = closed.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(got) == len(closed)
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64"}), closed.astype({"n_events": "int64"})
    )
    assert len(got) > 50  # meaningful session count


def test_qraw_codec_psnr_gate():
    """input_hint: decoded-pixel allclose with PSNR >= 40 dB for lossy."""
    for i in range(10):
        pix = FX.image_pixels(i)
        buf = encode_qraw(pix)
        dec = decode_image(buf, pix.shape[0], pix.shape[1], "qraw")
        assert dec.shape == pix.shape
        p = psnr_db(pix, dec)
        assert p >= 40.0, p
        assert np.abs(dec.astype(int) - pix.astype(int)).max() <= 2


def test_raw_codec_exact():
    pix = FX.image_pixels(3)
    assert np.array_equal(
        decode_image(pix.tobytes(), pix.shape[0], pix.shape[1], "raw"), pix
    )
