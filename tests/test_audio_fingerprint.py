"""Round-11 audio fingerprint near-dedup: the WAV member of the
banded near-dup family (eclipse_spark.operators.multimodal
.audio_fingerprint_bands + encode_tone_wav), reusing the image dHash
join engine (dhash_near_pairs) verbatim. Reference parity:
the reference's capability here is modality-generic near-dup over
opaque payloads; the engine expresses it as decode-kernel ->
fixed-width fingerprint -> guarded banded LSH self-join."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from eclipse_spark.operators import multimodal as mm

HSETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_fingerprint(did: int) -> np.ndarray:
    """Pure-numpy replay of encode_tone_wav + audio_fingerprint_bands:
    the 64 energy-delta bits, computed without any Spark or codec."""
    n = 1040 + did % 257
    i = np.arange(n, dtype=np.int64)
    f, j = i // 16, i % 16
    s = (
        f * j * (did % 17 + 3)
        + 23 * f * (did % 13 + 1)
        + 7 * j * (did % 11 + 1)
        + 31 * did
    ) % 4001 - 2000
    e = (s[: 16 * 65] ** 2).reshape(65, 16).sum(axis=1)
    return (e[1:] > e[:-1]).astype(np.int64)


def _bands_from_bits(bits: np.ndarray) -> list[int]:
    vals = bits << (np.arange(64) % 16)
    return [int(vals[16 * t : 16 * t + 16].sum()) for t in range(4)]


def test_tone_wav_roundtrip(spark):
    """encode_tone_wav emits REAL RIFF/WAVE payloads: wav_decode
    recovers the exact formula samples, rate, and length."""
    ids = spark.range(0, 7).select(F.col("id"))
    rows = mm.encode_tone_wav(ids, id_col="id").collect()
    assert len(rows) == 7
    for r in rows:
        rate, samples = mm.wav_decode(bytes(r["bytes"]))
        d = r["id"]
        n = 1040 + d % 257
        assert rate == 8000 and len(samples) == n
        i = np.arange(n, dtype=np.int64)
        f, j = i // 16, i % 16
        want = (
            f * j * (d % 17 + 3)
            + 23 * f * (d % 13 + 1)
            + 7 * j * (d % 11 + 1)
            + 31 * d
        ) % 4001 - 2000
        assert (samples.astype(np.int64) == want).all()


def test_fingerprint_bit_exact_vs_numpy(spark):
    """The Spark kernel's band integers equal the pure-numpy replay of
    the formula for every id — a flipped gradient bit or a wrong band
    packing position fails here before any oracle does."""
    ids = spark.range(0, 40).select(F.col("id"))
    fp = mm.audio_fingerprint_bands(mm.encode_tone_wav(ids, id_col="id"))
    got = {r["id"]: [r["b0"], r["b1"], r["b2"], r["b3"]] for r in fp.collect()}
    assert len(got) == 40
    for d, bands in got.items():
        assert bands == _bands_from_bits(_ref_fingerprint(d)), f"id {d}"


def test_planted_duplicates_hamming_zero(spark):
    """Exact-duplicate payloads under shifted ids surface at hamming 0
    through the SAME guarded banded join the image path uses."""
    ids = spark.range(0, 60).select(F.col("id"))
    wavs = mm.encode_tone_wav(ids, id_col="id")
    planted = wavs.filter(F.col("id") % 10 == 0).select(
        (F.col("id") + 100000).alias("id"), "bytes"
    )
    fp = mm.audio_fingerprint_bands(wavs.unionByName(planted))
    pairs = mm.dhash_near_pairs(fp, max_hamming=3).collect()
    planted_pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in pairs
        if r["id_b"] == r["id_a"] + 100000
    }
    assert set(planted_pairs) == {(d, d + 100000) for d in range(0, 60, 10)}
    assert all(h == 0 for h in planted_pairs.values())


def test_short_payload_raises(spark):
    """encode_pattern_wav's 64-120 sample clips cannot carry the 65
    frames the fingerprint is defined over — loud failure, never a
    truncated/padded fingerprint that would silently miscompare."""
    ids = spark.range(0, 3).select(F.col("id"))
    short = mm.encode_pattern_wav(ids, id_col="id")
    with pytest.raises(Exception, match="samples < 1040 required"):
        mm.audio_fingerprint_bands(short).collect()


def test_audio_pipeline_accounting(spark, sf_smoke):
    """media_audio_pipeline invariants on the smoke corpus: bucket
    counts nest (kept <= quality <= seen), every planted duplicate
    whose ORIGINAL also passed the quality gate is dropped (greedy
    min-id representative), and the kept average duration is the
    exact dyadic mean."""
    import __spark_entry__ as em

    rows = em.queries()["media_audio_pipeline"](spark, sf_smoke).collect()
    assert rows, "pipeline returned no buckets"
    tot = {c: sum(r[c] for r in rows) for c in ("n_audio", "n_quality",
                                                "n_kept")}
    assert tot["n_kept"] <= tot["n_quality"] <= tot["n_audio"]
    for r in rows:
        assert r["n_kept"] <= r["n_quality"] <= r["n_audio"]
        if r["n_kept"] == 0:
            assert r["kept_avg_dur_ms"] is None
        else:
            # durations are n/8 ms with n = 1040 + pid % 257, so any
            # mean lies inside the corpus duration envelope
            assert 130.0 <= r["kept_avg_dur_ms"] <= 162.125

    # cross-check the dedup semantics directly: a planted copy whose
    # original survives the gate shares its fingerprint (hamming 0),
    # carries the larger id, and must NOT be among the keeps
    fp_pairs = em.queries()["media_audio_fingerprint"](
        spark, sf_smoke
    ).collect()
    planted_pairs = [r for r in fp_pairs if r["id_b"] == r["id_a"] + 100000]
    assert planted_pairs and all(r["hamming"] == 0 for r in planted_pairs)


def _np_fingerprint_bands(samples: np.ndarray) -> list[int]:
    """Reference fingerprint over arbitrary PCM (not the tone formula):
    the spec audio_fingerprint_bands implements, in four numpy lines."""
    a = samples[: 16 * 65].astype(np.int64)
    e = (a * a).reshape(65, 16).sum(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.int64)
    vals = bits << (np.arange(64) % 16)
    return [int(vals[16 * t : 16 * t + 16].sum()) for t in range(4)]


@HSETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_extra=st.integers(min_value=0, max_value=300),
)
def test_fingerprint_property_arbitrary_pcm(spark, seed, n_extra):
    """On ARBITRARY int16 PCM (any length >= 1040, any rate) the Spark
    kernel equals the numpy spec — the codec round-trip and the kernel
    are exercised beyond the tone corpus, including full-scale
    amplitudes and constant runs."""
    rng = np.random.default_rng(seed)
    n = 1040 + n_extra
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int64)
    if seed % 3 == 0:
        samples[100:400] = 0  # constant run: ties must be bit=0
    if seed % 3 == 1:
        samples[:] = np.abs(samples)  # one-sided signal
    samples = samples.astype(np.int16)
    rate = 4000 + (seed % 5) * 4000
    payload = mm.wav_encode(samples, rate)
    df = spark.createDataFrame([(7, bytearray(payload))], "id long, bytes binary")
    row = mm.audio_fingerprint_bands(df).collect()[0]
    assert [row["b0"], row["b1"], row["b2"], row["b3"]] == \
        _np_fingerprint_bands(samples)


@HSETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    frame_idx=st.integers(min_value=0, max_value=64),
)
def test_fingerprint_locality_single_frame_perturbation(
    spark, seed, frame_idx
):
    """Provable locality invariant: perturbing samples inside ONE
    16-sample frame changes that frame's energy only, which can flip
    at most the two delta bits adjacent to it (bit frame_idx-1 and bit
    frame_idx) — total Hamming <= 2. This is the property that makes
    the fingerprint a NEAR-dup key (local edits stay within the
    banded-join Hamming budget) rather than a content hash."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-2000, 2001, size=1100, dtype=np.int16)
    mutated = samples.copy()
    lo = frame_idx * 16
    mutated[lo : lo + 16] = rng.integers(-2000, 2001, size=16)
    df = spark.createDataFrame(
        [(0, bytearray(mm.wav_encode(samples, 8000))),
         (1, bytearray(mm.wav_encode(mutated, 8000)))],
        "id long, bytes binary",
    )
    got = {r["id"]: [r["b0"], r["b1"], r["b2"], r["b3"]]
           for r in mm.audio_fingerprint_bands(df).collect()}
    ham = sum(
        bin(a ^ b).count("1") for a, b in zip(got[0], got[1])
    )
    assert ham <= 2


def test_audio_candidate_guard_fires(spark):
    """The pre-join candidate-volume audit guards the audio path with
    the same max_pairs discipline as images: a degenerate corpus (all
    payloads identical -> every pair cohabits every band bucket) must
    REFUSE before scheduling the quadratic join."""
    ids = spark.range(0, 80).select(F.lit(5).alias("src"), "id")
    one = mm.encode_tone_wav(ids.select(F.col("src").alias("id")).limit(1))
    clones = ids.crossJoin(one.select("bytes")).select("id", "bytes")
    fp = mm.audio_fingerprint_bands(clones)
    with pytest.raises(ValueError, match="candidate pairs > max_pairs"):
        mm.dhash_near_pairs(fp, max_hamming=3, max_pairs=1000)
