"""Audio modality: REAL pcm16 decode + numpy-FFT feature extraction
(spectral centroid / band energies) and linear resampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.operators import multimodal as M


def _tone_df(spark, freq_hz: float, sr: int = 8000, n: int = 8000):
    t = np.arange(n) / sr
    x = np.clip(np.round(0.5 * np.sin(2 * np.pi * freq_hz * t) * 32767), -32768, 32767)
    buf = x.astype("<i2").tobytes()
    return spark.createDataFrame(
        [("tone", buf, sr, n, "pcm16")],
        "audio_id string, bytes binary, sample_rate int, n_samples int, fmt string",
    )


def test_pure_tone_centroid_and_band(spark):
    """A 1 kHz tone must report centroid ~1000 Hz and put essentially all
    band energy in the covering band (16 linear bands over 0-4 kHz ->
    band 4 covers 1000-1250 Hz)."""
    out = M.audio_features(_tone_df(spark, 1000.0), n_bands=16).collect()[0]
    assert out.spectral_centroid_hz == pytest.approx(1000.0, abs=15.0)
    be = np.asarray(out.band_energy)
    assert be.argmax() == 4
    assert be[4] >= 0.99
    assert out.duration_sec == pytest.approx(1.0)
    assert out.rms == pytest.approx(0.5 / np.sqrt(2), rel=0.01)


def test_audio_features_deterministic_on_fixture(spark):
    a = M.audio_features(FX.audio_table(spark, 30, partitions=4)).orderBy("audio_id").collect()
    b = M.audio_features(FX.audio_table(spark, 30, partitions=2)).orderBy("audio_id").collect()
    assert len(a) == 30
    for x, y in zip(a, b):
        assert x.audio_id == y.audio_id
        assert x.spectral_centroid_hz == y.spectral_centroid_hz
        assert np.array_equal(np.asarray(x.band_energy), np.asarray(y.band_energy))
        assert abs(np.linalg.norm(np.asarray(x.band_energy)) - 1.0) < 1e-9


def test_resample_preserves_duration_and_tone(spark):
    """Resampling 8 kHz -> 4 kHz halves the sample count, keeps duration,
    and a 500 Hz tone still reads as ~500 Hz afterwards."""
    res = M.resample_audio(_tone_df(spark, 500.0), target_rate=4000)
    row = res.collect()[0]
    assert row.sample_rate == 4000
    assert row.n_samples == pytest.approx(4000, abs=1)
    feat = M.audio_features(res).collect()[0]
    assert feat.duration_sec == pytest.approx(1.0, abs=0.01)
    assert feat.spectral_centroid_hz == pytest.approx(500.0, abs=20.0)


def test_unknown_audio_codec_is_honestly_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"\x00\x00", "opus")


def test_audio_band_energy_feeds_similarity(spark):
    """The band-energy vector works as an embedding column: identical clips
    pair at cosine 1.0 through the near-dup operator."""
    from gtfs_conflation_pipeline_spark.operators import similarity

    feats = M.audio_features(FX.audio_table(spark, 25, partitions=4))
    twin = feats.select(
        F.concat(F.col("audio_id"), F.lit("_dup")).alias("audio_id"), "band_energy"
    )
    both = feats.select("audio_id", "band_energy").unionByName(twin)
    pairs = similarity.embedding_near_dups(
        both, dim=16, threshold=0.9999, c_id="audio_id", c_vec="band_energy"
    ).toPandas()
    twins = {
        (a, b) for a, b in zip(pairs.id_a, pairs.id_b) if b == a + "_dup"
    }
    assert len(twins) == 25
