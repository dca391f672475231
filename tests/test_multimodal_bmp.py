"""Vendored BMP codec + real media decode/resize kernels (VERDICT r5
task 3: promote the multimodal component from stub-only to real pixel
decoding with zero native dependencies)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from eclipse_spark.operators.multimodal import (
    _pixel_features,
    bmp_decode,
    bmp_encode,
    decode_features,
    encode_pattern_bmp,
    read_binary_dir,
    resize_media,
)


def _rand(h, w, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_bmp_roundtrip_all_padding_widths():
    # widths 1..8 cover every row-padding residue (w*3 mod 4)
    for w in range(1, 9):
        for h in (1, 3, 7):
            arr = _rand(h, w, seed=w * 10 + h)
            w2, h2, dec = bmp_decode(bmp_encode(arr))
            assert (w2, h2) == (w, h)
            assert np.array_equal(dec, arr)


def test_bmp_decode_topdown_and_32bpp():
    arr = _rand(2, 3, seed=9)
    rows = b""
    for y in range(2):
        for x in range(3):
            r, g, b = arr[y, x]
            rows += bytes([b, g, r, 255])
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 3, -2, 1, 32, 0, len(rows), 0, 0, 0, 0
    )
    w2, h2, dec = bmp_decode(hdr + info + rows)
    assert (w2, h2) == (3, 2)
    assert np.array_equal(dec, arr)


def test_bmp_decode_rejects_garbage():
    for bad in (b"", b"BM", b"PNG\x00" * 20, b"BM" + b"\x00" * 60):
        with pytest.raises(ValueError):
            bmp_decode(bad)
    # compressed / paletted BMPs are out of scope and must not
    # silently mis-decode
    arr = _rand(2, 2, seed=1)
    enc = bytearray(bmp_encode(arr))
    struct.pack_into("<I", enc, 30, 1)  # compression = BI_RLE8
    with pytest.raises(ValueError):
        bmp_decode(bytes(enc))


def test_pixel_features_exact_integer_recipe():
    arr = _rand(5, 9, seed=3)
    f = _pixel_features(arr, 9, 5)
    a = arr.astype(np.int64)
    n = 45
    s = int(a.sum())
    q = int((a * a).sum())
    assert f[0] == int(a[..., 0].sum()) / (n * 255)
    assert f[3] == s / (3 * n * 255)
    assert f[4] == math.sqrt(float(3 * n * q - s * s)) / (3 * n * 255)
    assert f[5] == 9 / 5 and f[6] == 0.009 and f[7] == 0.005


def test_decode_features_real_path_parses_actual_bmps(spark):
    ids = spark.range(0, 40).selectExpr("id")
    feats = {
        r.id: r.features
        for r in decode_features(
            encode_pattern_bmp(ids), fake=False
        ).collect()
    }
    assert len(feats) == 40
    for d in (0, 7, 13, 39):
        w, h = 8 + d % 9, 8 + d % 7
        xs, ys, cs = np.arange(w), np.arange(h), np.arange(3)
        v = (
            3 * xs[None, :, None]
            + 7 * ys[:, None, None]
            + 11 * cs[None, None, :]
            + d
        ) % 256
        expect = _pixel_features(v.astype(np.uint8), w, h)
        assert feats[d] == expect


def test_decode_features_real_path_fails_loudly_on_non_bmp(spark):
    # PIL is absent in this container: a non-BMP payload must raise,
    # never silently emit stub features
    df = spark.createDataFrame([(1, bytearray(b"not an image"))],
                               "id long, bytes binary")
    with pytest.raises(Exception, match="not an uncompressed BMP"):
        decode_features(df, fake=False).collect()


def test_resize_media_real_path_roundtrips(spark):
    ids = spark.range(0, 12).selectExpr("id")
    bmps = encode_pattern_bmp(ids)
    out = {
        r.id: r
        for r in resize_media(bmps, width=12, height=10, fake=False).collect()
    }
    assert len(out) == 12
    for d in (0, 5, 11):
        w2, h2, arr = bmp_decode(bytes(out[d].bytes))
        assert (w2, h2) == (12, 10)
        w0, h0 = 8 + d % 9, 8 + d % 7
        for yo, xo in ((0, 0), (9, 11), (4, 6)):
            sx, sy = (xo * w0) // 12, (yo * h0) // 10
            for c in range(3):
                assert arr[yo, xo, c] == (3 * sx + 7 * sy + 11 * c + d) % 256


def test_binary_file_source_roundtrips_bmp_fixtures(spark, tmp_path):
    """BMP fixtures written to disk, ingested via the binaryFile
    source, and really decoded — the full media ingest path."""
    fix = tmp_path / "bmps"
    fix.mkdir()
    expected = {}
    for d in range(6):
        arr = _rand(4 + d, 5 + d, seed=d)
        (fix / f"img_{d}.bmp").write_bytes(bmp_encode(arr))
        expected[d] = _pixel_features(arr, 5 + d, 4 + d)
    df = read_binary_dir(spark, str(fix)).selectExpr(
        "CAST(regexp_extract(path, 'img_(\\\\d+)', 1) AS LONG) AS id",
        "content AS bytes",
    )
    got = {r.id: r.features for r in decode_features(df, fake=False).collect()}
    assert got == expected


# -- audio: vendored WAV codec (round 7) --------------------------------


def test_wav_roundtrip_and_chunk_walk():
    """encode->decode is identity; a LIST chunk between fmt and data
    (legal RIFF) is skipped; odd-sized chunks honor word alignment."""
    import struct

    import numpy as np

    from eclipse_spark.operators.multimodal import wav_decode, wav_encode

    samples = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    rate, got = wav_decode(wav_encode(samples, 44100))
    assert rate == 44100 and np.array_equal(got, samples)

    # rebuild with an interleaved odd-sized LIST chunk before data
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = samples.tobytes()
    inner = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # padded to 4
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(inner)) + inner
    rate2, got2 = wav_decode(payload)
    assert rate2 == 8000 and np.array_equal(got2, samples)


def test_wav_decode_rejects_garbage_loudly():
    import struct

    import numpy as np
    import pytest

    from eclipse_spark.operators.multimodal import wav_decode, wav_encode

    for bad in (b"", b"RIFF", b"RIFFxxxxWAVE", b"\x00" * 100):
        with pytest.raises(ValueError):
            wav_decode(bad)
    # stereo/8-bit/non-PCM all refused (no silent degradation)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)  # 2 channels
    inner = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
             + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="ch=2"):
        wav_decode(b"RIFF" + struct.pack("<I", len(inner)) + inner)
    ok = wav_encode(np.array([5, -5], dtype=np.int16), 8000)
    with pytest.raises(ValueError):  # truncated data chunk
        wav_decode(ok[:-2])


def test_audio_features_match_direct_computation(spark):
    """The Spark kernel must recover, from actual RIFF bytes, exactly
    the statistics computed directly from the generating formula."""
    import numpy as np

    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(0, 40)
    out = {
        r.id: r
        for r in mm.audio_features(mm.encode_pattern_wav(ids)).collect()
    }
    for d in range(40):
        n = 64 + d % 57
        rate = 8000 + (d % 4) * 2000
        i = np.arange(n, dtype=np.int64)
        v = (31 * d + 7 * i) % 4001 - 2000
        r = out[d]
        assert r.n_samples == n and r.sample_rate == rate
        assert r.duration_ms == round(n * 1000.0 / rate, 6)
        assert r.mean_amp == round(int(v.sum()) / n, 6)
        assert r.rms_amp == round(float(np.sqrt(int((v * v).sum()) / n)), 6)
        assert r.peak_amp == int(np.abs(v).max())


def test_audio_frames_energy_exact(spark):
    """Per-frame integer energies (incl. the partial tail frame) match
    the formula; frame indices tile the sample run."""
    import numpy as np

    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(0, 10)
    rows = mm.audio_frames(mm.encode_pattern_wav(ids), frame=16).collect()
    got = {(r.id, r.frame_idx): (r.n, r.energy) for r in rows}
    for d in range(10):
        n = 64 + d % 57
        i = np.arange(n, dtype=np.int64)
        v = (31 * d + 7 * i) % 4001 - 2000
        n_frames = -(-n // 16)
        assert {k[1] for k in got if k[0] == d} == set(range(n_frames))
        for f0 in range(n_frames):
            win = v[f0 * 16 : f0 * 16 + 16]
            assert got[(d, f0)] == (len(win), int((win * win).sum()))


# -- video: EBMV container + real frame decode (round 7) ----------------


def test_video_container_roundtrip_and_errors():
    import numpy as np
    import pytest

    from eclipse_spark.operators import multimodal as mm

    frames = [
        mm.bmp_encode(np.full((4, 5, 3), v, dtype=np.uint8)) for v in (0, 99, 255)
    ]
    payload = mm.video_encode(frames)
    assert mm.video_frame_count(payload) == 3
    for i, f in enumerate(frames):
        assert mm.video_decode_frame(payload, i) == f
        w, h, arr = mm.bmp_decode(mm.video_decode_frame(payload, i))
        assert (w, h) == (5, 4) and arr.flat[0] == (0, 99, 255)[i]
    with pytest.raises(ValueError):
        mm.video_decode_frame(payload, 3)          # out of range
    with pytest.raises(ValueError):
        mm.video_decode_frame(b"XXXX" + payload[4:], 0)  # bad magic
    with pytest.raises(ValueError):
        mm.video_decode_frame(payload[:-5], 2)     # truncated data


def test_video_frame_features_match_formula(spark):
    """Sampled-frame features recovered from real container+BMP parsing
    must equal the per-frame pixel-formula computation."""
    import numpy as np

    from eclipse_spark.operators import multimodal as mm

    ids = spark.range(0, 25)
    rows = mm.video_frame_features(mm.encode_pattern_video(ids), every_n=2).collect()
    got = {(r.id, r.frame_idx): (r.mean_all, r.std_all) for r in rows}
    for d in range(25):
        n_frames = 3 + d % 5
        w, h = 8 + d % 9, 8 + d % 7
        expect_idx = set(range(0, n_frames, 2))
        assert {k[1] for k in got if k[0] == d} == expect_idx
        for f in expect_idx:
            xs, ys, cs = np.arange(w), np.arange(h), np.arange(3)
            v = (3 * xs[None, :, None] + 7 * ys[:, None, None]
                 + 11 * cs[None, None, :] + d + 13 * f) % 256
            feats = mm._pixel_features(v.astype(np.uint8), w, h)
            assert got[(d, f)] == (round(feats[3], 6), round(feats[4], 6))
