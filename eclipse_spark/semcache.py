"""Semantic cache — the Orthrus equivalent (SURVEY §2.3, §4).

Eclipse's one genuinely novel runtime feature is a per-node cache of
*intermediate results* keyed ``"<appname>_<inputfile>"``: on a repeat
run, cached map output is replayed into the new job's shuffle and the
client skips the map function entirely (hit path
``src/file_distributor/fileserver.hh:556-585``, client skip
``src/mapreduce/dht/mapreduce.hh:849-884``, LRU eviction
``src/orthrus/cache.hh:45-128``, 1 GB budget
``src/mapreduce/definitions.hh:30``).

Spark reuses shuffle files only within a job; cross-job reuse needs
engine code. This module is that code:

- cache key = op-DAG fingerprint (plans/dag.py) + input snapshot
  versions — strictly finer than Eclipse's (app, file) key, so an
  edited operator or mutated input can never serve a stale hit (the
  risk-register item in SURVEY §7).
- hit  -> read the materialized parquet, skip the whole compute
  subtree (the map-skip analogue, but for arbitrary plans).
- miss -> compute, materialize, register; LRU-evict over budget like
  ``cache.hh:72-94`` (evict unlocked tail until the new entry fits).

At 100 TB the cache directory lives on shared storage (S3/HDFS) so a
hit is a parquet scan — still a win when the cached subtree contains
shuffles or Python UDF stages.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0


class SemanticCache:
    _MANIFEST = "_semcache_manifest.json"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        budget_bytes: int = 1 << 30,  # Eclipse's CACHESIZE default: 1 GB
    ):
        self.spark = spark
        self.root = root
        self.budget_bytes = budget_bytes
        self.stats = CacheStats()
        os.makedirs(root, exist_ok=True)
        # entries: fingerprint -> {"bytes": int, "last_access": float}
        self._entries: dict[str, dict] = {}
        # Entries handed out by lookup() this session: their DataFrames
        # are lazy reads over the cache path, so eviction must not rmtree
        # them out from under an unexecuted plan (use-after-evict).
        self._pinned: set[str] = set()
        self._load_manifest()

    # -- manifest -------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, self._MANIFEST)

    def _load_manifest(self) -> None:
        try:
            with open(self._manifest_path()) as f:
                self._entries = json.load(f)
        except (OSError, ValueError):
            self._entries = {}

    def _save_manifest(self) -> None:
        # Write-and-rename so a concurrent session reading the manifest
        # never observes a torn file.
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._entries, f)
        os.replace(tmp, self._manifest_path())

    def _entry_path(self, fp: str) -> str:
        return os.path.join(self.root, f"{fp}.parquet")

    @staticmethod
    def _dir_bytes(path: str) -> int:
        total = 0
        for dirpath, _dirnames, filenames in os.walk(path):
            for fn in filenames:
                total += os.path.getsize(os.path.join(dirpath, fn))
        return total

    # -- core protocol --------------------------------------------------
    def lookup(self, fingerprint: str) -> DataFrame | None:
        """Icache-hit path: return the materialized result, or None."""
        entry = self._entries.get(fingerprint)
        path = self._entry_path(fingerprint)
        if entry is None or not os.path.exists(path):
            self.stats.misses += 1
            return None
        entry["last_access"] = time.time()  # move-to-front (cache.hh:52-60)
        self._save_manifest()
        self.stats.hits += 1
        self._pinned.add(fingerprint)  # see _pinned: lazy reads must survive
        return self.spark.read.parquet(path)

    def materialize(self, fingerprint: str, df: DataFrame) -> DataFrame:
        """Icache-write path: persist the result, register, evict LRU
        entries until under budget, and return the cached read (so the
        caller's downstream plan reads parquet, not the live subtree)."""
        path = self._entry_path(fingerprint)
        df.write.mode("overwrite").parquet(path)
        self._entries[fingerprint] = {
            "bytes": self._dir_bytes(path),
            "last_access": time.time(),
        }
        self._evict(keep=fingerprint)
        self._save_manifest()
        return self.spark.read.parquet(path)

    def get_or_compute(
        self, fingerprint: str, compute: Callable[[], DataFrame]
    ) -> tuple[DataFrame, bool]:
        hit = self.lookup(fingerprint)
        if hit is not None:
            return hit, True
        return self.materialize(fingerprint, compute()), False

    # -- eviction -------------------------------------------------------
    def _evict(self, keep: str | None = None) -> None:
        total = sum(e["bytes"] for e in self._entries.values())
        if total <= self.budget_bytes:
            return
        # Oldest-access first; the just-written entry and every entry
        # handed out this session are locked, like Eclipse skipping
        # locked entries at the LRU tail (cache.hh:78-86).
        for fp, _e in sorted(self._entries.items(), key=lambda kv: kv[1]["last_access"]):
            if total <= self.budget_bytes:
                break
            if fp == keep or fp in self._pinned:
                continue
            total -= self._entries[fp]["bytes"]
            shutil.rmtree(self._entry_path(fp), ignore_errors=True)
            del self._entries[fp]
            self.stats.evictions += 1

    def invalidate(self, fingerprint: str | None = None) -> None:
        targets = [fingerprint] if fingerprint else list(self._entries)
        for fp in targets:
            shutil.rmtree(self._entry_path(fp), ignore_errors=True)
            self._entries.pop(fp, None)
            self._pinned.discard(fp)
        self._save_manifest()

    def unpin(self, fingerprint: str | None = None) -> None:
        """Release session pins (all, or one) once the caller has
        executed its plans — makes the entries evictable again."""
        if fingerprint is None:
            self._pinned.clear()
        else:
            self._pinned.discard(fingerprint)
