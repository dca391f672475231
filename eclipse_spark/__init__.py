"""eclipse_spark — a PySpark-native analytics engine with the capability
surface of DICL/Eclipse (reference: /root/reference, an experimental
MapReduce framework with DHT-placed storage, the Orthrus semantic cache,
and EM-KDE cache-aware scheduling).

This is NOT a port: Eclipse's socket-level execution machinery (master /
slave / fileserver processes, shuffle routing, spill/merge) maps onto
Spark built-ins (DAGScheduler stages, shuffle service, Tungsten spill).
What we re-express Spark-first:

- the MapReduce *API surface* (map / emit / group-reduce with arbitrary
  per-key user logic) -> ``eclipse_spark.pipeline.Pipeline``
- the DHT storage commands (mrput/mrcat/mrls/mrrm, ref
  ``src/bin/mrput``, ``src/file_distributor/fd_core.cc``) ->
  ``eclipse_spark.storage.Catalog`` over parquet
- the Orthrus intermediate-result cache keyed ``[app]_[inputfile]``
  (ref ``src/file_distributor/fileserver.hh:354-359``) ->
  ``eclipse_spark.semcache.SemanticCache`` keyed by logical-plan
  fingerprint + input snapshot version
- the three canonical workloads (word count, inverted index,
  aggregation; ref ``doc/CourseReport'14/report.tex``) ->
  ``eclipse_spark.apps``
- plus the relational layer, streaming windows, and LLM-data-pipeline
  operators (dedup, similarity search, multimodal, text analysis) that
  the north star adds on top.

Every operator is designed for 100 TB: declarative DataFrame plans so
Catalyst can push down / prune / broadcast, shuffle-conscious layouts,
AQE on, no driver-side collects in any transform.
"""

from eclipse_spark.session import get_spark, stop_spark
from eclipse_spark.storage import Catalog
from eclipse_spark.pipeline import Pipeline
from eclipse_spark.semcache import SemanticCache
from eclipse_spark.admin import EngineStatus, status

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "Catalog",
    "Pipeline",
    "SemanticCache",
    "EngineStatus",
    "status",
    "__version__",
]
