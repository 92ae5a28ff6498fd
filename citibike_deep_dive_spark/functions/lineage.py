"""Lineage truncation for iterative driver loops.

``cache()`` keeps iteration *data* hot but lets the *logical plan*
compound — audited plans for connected-components/PageRank/k-means
reached 306/48/37 exchanges before truncation, i.e. per-iteration
analyzer cost growing with iteration count. Checkpointing truncates the
plan, but the two flavors trade differently:

- ``checkpoint()`` (reliable) writes to the SparkContext checkpoint
  directory (HDFS/S3 on a cluster): lineage is truncated AND the data
  survives executor loss — recovery re-reads the checkpoint file. This
  is the 100 TB production mode; set
  ``spark.sparkContext.setCheckpointDir(...)`` and
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` so
  superseded checkpoint files are reclaimed.
- ``localCheckpoint()`` stores blocks non-replicated on executors:
  lineage is truncated but a lost executor makes those blocks
  UNRECOVERABLE and fails the job — acceptable for local mode and for
  short loops where a retry re-runs the whole query, wrong for long
  cluster jobs. Superseded blocks are reclaimed by the ContextCleaner
  once the superseded frame's reference is dropped (periodic, not
  immediate).

``truncate_lineage`` picks the reliable flavor automatically whenever a
checkpoint dir is configured, so the same operator code is fault-
tolerant on a production cluster and dependency-free on local[n].
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` (on first action if ``eager=False``) and
    truncate its logical plan — reliable ``checkpoint()`` if the session
    has a checkpoint dir, else ``localCheckpoint()`` (see module
    docstring for the tradeoff). ``eager=False`` is for shared
    intermediates inside lazy query builders: no job runs at build
    time, and the checkpoint happens once when the query first
    executes."""
    sc = df.sparkSession.sparkContext
    # Public API (Spark >= 3.1) — works under Spark Connect too, unlike
    # probing sc._jsc.sc().checkpointDir() through py4j internals.
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
