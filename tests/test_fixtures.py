"""Fixture determinism + the per-row payload invariants from
BASELINE.json input_hint: decoded-pixel allclose + caption equality."""

import numpy as np

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark import kernels as K


def test_phash_roundtrip():
    i = np.arange(500)
    _, _, lon, lat = FX.shape_point(i)
    ph = FX.phash_from_lonlat(lon, lat)
    lon2, lat2 = FX.lonlat_from_phash(ph)
    assert np.allclose(lon, lon2, atol=1e-5)
    assert np.allclose(lat, lat2, atol=1e-5)


def test_images_batch_deterministic_and_partition_invariant():
    a = FX.images_batch(np.arange(100))
    b = FX.images_batch(np.arange(100))
    assert a.equals(b)
    # partition invariance: generating rows in two halves == one batch
    c1 = FX.images_batch(np.arange(0, 50))
    c2 = FX.images_batch(np.arange(50, 100))
    import pandas as pd

    c = pd.concat([c1, c2], ignore_index=True)
    assert (a["image_id"] == c["image_id"]).all()
    assert (a["phash"] == c["phash"]).all()
    assert all(x == y for x, y in zip(a["bytes"], c["bytes"]))


def test_pixel_decode_invariant():
    # input_hint: decode(bytes) allclose vs regenerated pixels (fmt=raw -> exact)
    df = FX.images_batch(np.arange(20))
    for k in range(20):
        pix = np.frombuffer(df["bytes"][k], dtype=np.uint8).reshape(
            df["w"][k], df["h"][k], 3
        )
        assert np.array_equal(pix, FX.image_pixels(k))


def test_payload_ramp_matches_formula():
    """The _RAMP slice path must stay byte-identical to the FIXTURES.md
    closed-form rule (arange(n) + splitmix64(i)&0xFF) & 0xFF — an
    independent transcription, not a comparison of two _RAMP consumers."""
    ids = np.array([0, 1, 7, 12345, 999_999, 7_999_999], dtype=np.int64)
    df = FX.images_batch(ids)
    h64, w, hh = FX.image_dims(ids)
    for k in range(ids.size):
        n = int(w[k]) * int(hh[k]) * 3
        formula = (
            (np.arange(n, dtype=np.uint64) + (h64[k] & np.uint64(0xFF)))
            & np.uint64(0xFF)
        ).astype(np.uint8)
        assert df["bytes"][k] == formula.tobytes()
    # video frames add the frame index before the mask
    for idx, fr in [(0, 0), (0, 3), (12345, 11)]:
        h64, w, hh = FX.image_dims(np.array([idx]))
        n = int(w[0]) * int(hh[0]) * 3
        formula = (
            (np.arange(n, dtype=np.uint64) + (h64[0] & np.uint64(0xFF)) + np.uint64(fr))
            & np.uint64(0xFF)
        ).astype(np.uint8)
        assert np.array_equal(FX.video_frame(idx, fr).ravel(), formula)


def test_caption_format():
    df = FX.images_batch(np.array([0, 7, 61]), with_bytes=False)
    assert df["caption"][0] == "shape shp_00000 seg 0 pt 0"
    assert df["caption"][1] == "shape shp_00000 seg 0 pt 7"
    assert df["caption"][2] == "shape shp_00001 seg 1 pt 11"


def test_shapes_are_smooth_and_long_enough():
    # shapes should be a few km (exercises the >2km split path) and smooth
    # (few bearing splits)
    i = np.arange(FX.PTS_PER_SHAPE)
    _, _, lon, lat = FX.shape_point(i)
    L = K.polyline_length_km(lon, lat)
    assert 1.0 < L < 10.0
    assert K.bearing_split_indices(lon, lat).size <= 3


def test_osm_segments_modes():
    n_chunks = FX.PTS_PER_SHAPE // FX.CHUNK
    df = FX.osm_segment_batch(np.arange(20 * n_chunks))
    # dropped segments exist: slots where (s+c)%10==0 are absent
    slots = set()
    for g in np.arange(20 * n_chunks):
        s, c = g // n_chunks, g % n_chunks
        if (s + c) % 10 != 0:
            slots.add(g * 2)
    assert set(df[df.segment_id % 2 == 0].segment_id) == slots
    # distractors exist and are ~300m offset
    d = df[df.segment_id % 2 == 1]
    assert len(d) > 0
    assert df.length_km.min() > 0.1


def test_spark_generators_match_numpy(spark):
    img = FX.images_table(spark, 200, partitions=4).orderBy("image_id").toPandas()
    ref = FX.images_batch(np.arange(200))
    assert (img["image_id"].values == ref["image_id"].values).all()
    assert (img["phash"].values == ref["phash"].values).all()
    assert (img["caption"].values == ref["caption"].values).all()
    assert all(bytes(x) == y for x, y in zip(img["bytes"], ref["bytes"]))


def test_raw_tables_consistent(spark):
    img = FX.images_table(spark, 500, partitions=4, with_bytes=False)
    raw = FX.raw_tables(spark, img)
    shapes = raw["shapes"].toPandas()
    assert len(shapes) == 500
    # Spark-derived coords equal numpy closed form (phash round-trip)
    i = np.arange(500)
    _, _, lon, lat = FX.shape_point(i)
    sh = shapes.sort_values(["shape_id", "shape_pt_sequence"]).reset_index(drop=True)
    assert np.allclose(sh["shape_pt_lon"].values, lon, atol=1.1e-5)
    assert np.allclose(sh["shape_pt_lat"].values, lat, atol=1.1e-5)
    stops = raw["stops"].toPandas()
    assert len(stops) == 500 // FX.STOP_EVERY
    st = raw["stop_times"].toPandas()
    trips = raw["trips"].toPandas()
    assert len(trips) == (500 // FX.PTS_PER_SHAPE) * FX.TRIPS_PER_SHAPE
    assert len(st) == len(trips) * (FX.PTS_PER_SHAPE // FX.STOP_EVERY)
    assert set(st.trip_id) == set(trips.trip_id)
