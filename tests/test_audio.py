"""Audio decode + MFCC fingerprint tests, including the per-row invariant
from BASELINE.json input_hint: decoded PCM allclose at SNR ≥ 30 dB and
byte-exact transcript passthrough."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapping_analysis_spark.datagen.clips import (
    _encode_wav,
    _pcm_to_s16le,
    _pcm_to_s24le,
    cluster_pcm,
    generate_clips_pdf,
)
from mapping_analysis_spark.functions.audio import (
    decode_pcm_py,
    fingerprint_cosine,
    fingerprint_py,
    mfcc_fingerprint,
    mfcc_py,
)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    n = min(len(ref), len(test))
    noise = ref[:n] - test[:n]
    p_sig = float(np.mean(ref[:n] ** 2))
    p_noise = float(np.mean(noise**2))
    if p_noise == 0:
        return float("inf")
    return 10 * np.log10(p_sig / p_noise)


@pytest.mark.parametrize("codec", ["pcm_s16le", "pcm_s24le", "wav"])
def test_roundtrip_snr(codec):
    rng = np.random.default_rng(7)
    pcm = cluster_pcm(rng, 16000, 1000)
    if codec == "pcm_s16le":
        data = _pcm_to_s16le(pcm)
    elif codec == "pcm_s24le":
        data = _pcm_to_s24le(pcm)
    else:
        data = _encode_wav(_pcm_to_s16le(pcm), 16000)
    decoded = decode_pcm_py(data, codec)
    assert len(decoded) == len(pcm)
    assert snr_db(pcm, decoded) >= 30.0


def test_generator_rows_satisfy_snr_invariant():
    pdf = generate_clips_pdf(10, seed=42)
    for c, grp in pdf.groupby("gold_cluster"):
        rng = np.random.default_rng((42, int(c)))
        # re-derive reference pcm exactly as the generator does
        from mapping_analysis_spark.datagen.clips import SR_CHOICES, base_transcript

        base_transcript(rng)
        sr = SR_CHOICES[int(rng.integers(0, len(SR_CHOICES)))]
        dur_ms = int(rng.integers(500, 5001))
        ref = cluster_pcm(rng, sr, dur_ms)
        for _, row in grp.iterrows():
            decoded = decode_pcm_py(row["bytes"], row["codec"])
            assert snr_db(ref, decoded) >= 30.0, row["clip_id"]


def test_mfcc_same_cluster_similar_different_cluster_not():
    rng = np.random.default_rng(1)
    a = cluster_pcm(np.random.default_rng((42, 1)), 16000, 2000)
    b = cluster_pcm(np.random.default_rng((42, 2)), 16000, 2000)
    fa = mfcc_py(a, 16000)
    fa2 = mfcc_py(a * 1.01 + rng.normal(0, 1e-4, len(a)), 16000)
    fb = mfcc_py(b, 16000)

    def cos(x, y):
        return float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))

    assert cos(fa, fa2) > 0.99
    assert cos(fa, fb) < cos(fa, fa2)


def test_spark_fingerprint_and_cosine(spark):
    pdf = generate_clips_pdf(5, seed=42)
    sdf = spark.createDataFrame(pdf)
    fp = sdf.select(
        "clip_id",
        "gold_cluster",
        mfcc_fingerprint(F.col("bytes"), F.col("codec"), F.col("sr_hz")).alias("fp"),
    )
    pairs = (
        fp.alias("l")
        .join(fp.alias("r"), F.col("l.clip_id") < F.col("r.clip_id"))
        .select(
            (F.col("l.gold_cluster") == F.col("r.gold_cluster")).alias("same"),
            fingerprint_cosine(F.col("l.fp"), F.col("r.fp")).alias("sim"),
        )
        .collect()
    )
    same = [p.sim for p in pairs if p.same]
    diff = [p.sim for p in pairs if not p.same]
    assert same and diff
    assert min(same) > 0.99
    assert np.mean(diff) < np.mean(same)


def test_transcript_passthrough(spark):
    pdf = generate_clips_pdf(5, seed=42)
    sdf = spark.createDataFrame(pdf)
    back = {r.clip_id: r.transcript for r in sdf.select("clip_id", "transcript").collect()}
    for _, row in pdf.iterrows():
        assert back[row["clip_id"]] == row["transcript"]


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_pcm_py(b"\x00\x01", "mp3")


def test_fingerprint_py_none():
    assert fingerprint_py(None, "wav", 16000) is None
