"""Admin/status surface — the Eclipse `client` CLI re-expressed
(SURVEY §2.4 X3).

Reference: ``src/client/dht/client.cc:67-96`` sends
``stop | numslave | numclient | numjob | numtask`` to the master
(handlers ``src/master/dht/master.cc:480-605``). On Spark the master's
bookkeeping is the scheduler's; this module reads it via
``SparkContext.statusTracker()`` instead of a socket protocol.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class EngineStatus:
    n_executors: int        # "numslave" — task-running workers
    n_active_jobs: int      # "numjob"
    n_active_stages: int    # stage-level view of "numtask" pressure
    default_parallelism: int


def status(spark: SparkSession) -> EngineStatus:
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # local mode reports no separate executors; defaultParallelism is
    # the honest "slots" number in both local and cluster mode
    return EngineStatus(
        n_executors=max(sc._jsc.sc().getExecutorMemoryStatus().size() - 1, 1),
        n_active_jobs=len(tracker.getActiveJobsIds()),
        n_active_stages=len(tracker.getActiveStageIds()),
        default_parallelism=sc.defaultParallelism,
    )


def stop(spark: SparkSession) -> None:
    """``client stop`` — shut the engine down."""
    spark.stop()
