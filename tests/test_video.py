"""Video modality: raw-concatenated frame decode, frame sampling into the
image operator family, and temporal stats."""

import numpy as np
import pytest

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.operators import multimodal as M


def test_frame_sample_matches_direct_generation(spark):
    vids = FX.video_table(spark, 12, partitions=3)
    frames = M.frame_sample(vids, every_k=1).collect()
    assert frames
    for r in frames:
        i = int(r.video_id[4:])
        want = FX.video_frame(i, r.frame_idx)
        got = np.frombuffer(bytes(r.bytes), np.uint8).reshape(r.w, r.h, 3)
        assert np.array_equal(got, want), (r.video_id, r.frame_idx)


def test_frame_sample_every_k_and_image_bridge(spark):
    """every_k=2 halves the frames; sampled frames run through the image
    operators (decode_stats + transcode-to-dct) unchanged."""
    vids = FX.video_table(spark, 10, partitions=2)
    n_frames = {r.video_id: r.n_frames for r in vids.select("video_id", "n_frames").collect()}
    frames = M.frame_sample(vids, every_k=2)
    counts = {r.video_id: r.n for r in frames.groupBy("video_id").count().withColumnRenamed("count", "n").collect()}
    for v, nf in n_frames.items():
        assert counts[v] == -(-nf // 2)
    stats = M.decode_stats(frames).collect()
    assert len(stats) == sum(counts.values())
    dct = M.transcode(frames, to_fmt="dct", quality=90)
    redecoded = M.decode_stats(dct.join(frames.select("image_id"), "image_id"))
    assert redecoded.count() == len(stats)


def test_video_stats_motion_semantics(spark):
    """Fixture clips drift one intensity step per frame -> small positive
    motion; a static clip reports exactly 0 motion."""
    vids = FX.video_table(spark, 8, partitions=2)
    stats = {r.video_id: r for r in M.video_stats(vids).collect()}
    for v, s in stats.items():
        assert s.mean_motion > 0.0
        assert s.duration_sec == pytest.approx(s.n_frames / 10.0)
    # static clip: repeat frame 0
    f0 = FX.video_frame(3, 0)
    static = spark.createDataFrame(
        [("vid_static", f0.tobytes() * 4, f0.shape[0], f0.shape[1], 4, 10, "rawv")],
        "video_id string, bytes binary, w int, h int, n_frames int, fps int, fmt string",
    )
    s = M.video_stats(static).collect()[0]
    assert s.mean_motion == 0.0
    assert s.mean_px == pytest.approx(float(f0.mean()))


def test_unknown_video_codec_is_honestly_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_video(b"", 2, 2, 1, "mp4")
