"""Operator-chain plan capture for the r14 optimization evidence: the
queries whose operators materialize eagerly (localCheckpoint tails)
return a trivial `Scan ExistingRDD` plan, so the plan evidence for
their *construction-side* chains is captured here instead — the
encode -> bands -> banded-join chains exactly as the operators build
them, before any eager action.

Usage: python tools/capture_opchains.py <tag> <suffix>
Writes plans/<tag>/opchain_<name>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from eclipse_spark.operators import multimodal as mm  # noqa: E402
from eclipse_spark.operators import dedup  # noqa: E402


def main(tag: str, suffix: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture_opchains")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ids = docs.select(F.col("doc_id").alias("id"))

    chains = {
        # the image near-dup chain (media_dhash / media_incremental_dedup /
        # media_curation_pipeline / cross_modal_* image leg)
        "dhash_pairs": mm.dhash_near_pairs(
            mm.dhash_bands(mm.encode_textured_bmp(ids)), max_pairs=None
        ),
        # the audio fingerprint chain (media_audio_pipeline / audio legs)
        "audio_pairs": mm.dhash_near_pairs(
            mm.audio_fingerprint_bands(mm.encode_tone_wav(ids)),
            max_pairs=None,
        ),
        # the video temporal chain (media_video_near_dup)
        "video_pairs": mm.video_near_pairs(
            mm.video_dhash_bands(mm.encode_textured_video(ids)),
            max_pairs=None,
        ),
        # the wide-hash chain (media_dhash_wide)
        "dhash_wide": mm.dhash_bands_wide(mm.encode_textured_bmp(ids)),
    }
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name, df in chains.items():
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"opchain_{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
