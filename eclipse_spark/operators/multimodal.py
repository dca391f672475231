"""Multimodal column operators (north-star).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract run as Arrow-batched pandas stages
over ``mapInPandas``. The decode kernels themselves are STUBBED (the
image/audio libraries are not in this container): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder exercises the full Spark-side plumbing —
schema, batching, partition sizing — which IS real and tested.

Scale notes: binary payloads are heavy — operators never shuffle the
bytes; metadata-only projections go first (column pruning drops the
binary column at the scan when untouched), and per-batch memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, kind string, bytes binary, "
    "meta struct<width:int, height:int, mime:string>"
)


def read_binary_dir(spark, path: str) -> DataFrame:
    """Ingest a directory of files as (path, modificationTime, length,
    content) — Spark's binaryFile source; the standard way raw media
    enters the engine."""
    return spark.read.format("binaryFile").load(path)


def with_content_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Cheap metadata without decoding: byte length + content hash
    (for exact dedup of media blobs). Pure built-ins."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(bytes_col)),
            "content_hash": F.sha2(F.col(bytes_col), 256),
        }
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image decoder: 8 floats derived
    from the content hash. Lets the pipeline be end-to-end testable
    without PIL/ffmpeg."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def _pil_image_module():
    """Probe-import PIL at call time; None when the env lacks it."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _pil_decode(image_mod, payload: bytes) -> list[float]:
    """Real image kernel (runs only when PIL is installed): decode,
    normalize to RGB, downsample to 8x8, emit 8 floats (mean R/G/B,
    global mean/std, aspect, and original dims scaled). Same 8-float
    shape as the stub so the schema is identical either way."""
    import io

    import numpy as np

    img = image_mod.open(io.BytesIO(payload)).convert("RGB")
    w, h = img.size
    a = np.asarray(img.resize((8, 8)), dtype="float64") / 255.0
    mr, mg, mb = a[..., 0].mean(), a[..., 1].mean(), a[..., 2].mean()
    return [
        float(mr), float(mg), float(mb),
        float(a.mean()), float(a.std()),
        float(w) / max(h, 1), float(w) / 1000.0, float(h) / 1000.0,
    ]


def decode_features(
    df: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "id",
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage:
    (id, features array<double>). ``fake=True`` always uses the
    deterministic stub (oracle-checkable). ``fake=False`` probe-imports
    PIL per executor batch and runs the real 8x8 RGB kernel when
    present; without PIL it raises at plan-build time — the operator
    signature, output schema, and Arrow batching are identical in every
    mode."""
    if not fake and _pil_image_module() is None:
        raise NotImplementedError(
            "real media decode requires PIL (not in this container); "
            "use fake=True to exercise the pipeline with the deterministic stub"
        )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # probed on the executor too — fns must not capture module objects
        image_mod = None if fake else _pil_image_module()
        if not fake and image_mod is None:
            # a driver with PIL but executors without must FAIL, not
            # silently emit stub features for some partitions
            raise RuntimeError(
                "decode_features(fake=False): PIL missing on this executor"
            )

        def one(b) -> list[float]:
            payload = bytes(b) if b is not None else b""
            if image_mod is None:
                return _fake_decode(payload)
            return _pil_decode(image_mod, payload)

        for pdf in batches:
            yield pd.DataFrame({"id": pdf[id_col], "features": pdf[bytes_col].map(one)})

    return df.select(id_col, bytes_col).mapInPandas(_run, schema="id long, features array<double>")


def resize_media(
    df: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "id",
    width: int = 64,
    height: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Resize stage (bytes -> bytes), completing the decode /
    feature-extract / RESIZE / frame-sample set: an Arrow-batched
    mapInPandas kernel emitting (id, bytes, width, height) with the
    payload re-encoded at the target size. ``fake=True`` runs the
    deterministic stub — the output payload is the content's sha256
    digest tiled to exactly width*height*3 bytes, so downstream code
    sees correctly-sized buffers and an external oracle can recompute
    the payload from the digest. ``fake=False`` probe-imports PIL and
    re-encodes a real ``resize((width, height))`` as PNG; without PIL
    it raises at plan-build time. Binary payloads stay inside the
    map stage — nothing here shuffles bytes."""
    if not fake and _pil_image_module() is None:
        raise NotImplementedError(
            "real media resize requires PIL (not in this container); "
            "use fake=True to exercise the pipeline with the deterministic stub"
        )
    n_out = width * height * 3

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if fake else _pil_image_module()
        if not fake and image_mod is None:
            # mixed driver/executor environments must fail loudly, not
            # degrade to the deterministic stub per-partition
            raise RuntimeError(
                "resize_media(fake=False): PIL missing on this executor"
            )

        def one(b) -> bytes:
            payload = bytes(b) if b is not None else b""
            if image_mod is None:
                digest = hashlib.sha256(payload).digest()
                reps = -(-n_out // len(digest))
                return (digest * reps)[:n_out]
            import io

            img = image_mod.open(io.BytesIO(payload)).convert("RGB")
            out = io.BytesIO()
            img.resize((width, height)).save(out, format="PNG")
            return out.getvalue()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "bytes": pdf[bytes_col].map(one),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(
        _run, schema="id long, bytes binary, width int, height int"
    )


def frame_sample_plan(
    df: DataFrame, id_col: str = "id", bytes_col: str = "bytes", every_n: int = 30
) -> DataFrame:
    """Video frame-sampling plumbing: emits (id, frame_idx) rows for a
    stubbed decoder — frame count faked deterministically from byte
    length (real impl: ffprobe). Demonstrates the explode-style fanout
    with the binary column pruned from the shuffle."""
    n_frames = (F.length(F.col(bytes_col)) % 300 + F.lit(1)).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
