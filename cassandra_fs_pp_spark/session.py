"""SparkSession construction and runtime tuning.

The reference is a single-process pandas pipeline with no notion of a session
(`cassandra_fs_pp/fs_pp.py` is eager module-level code); here the session IS
the engine handle. Two entry points:

* :func:`get_spark` — build a tuned local session (tests / bench / CLI).
* :func:`tune` — apply runtime-settable conf to an EXISTING session (the
  correctness driver owns its own session; every public query calls this
  defensively so semantics don't depend on who built the session).

Scale notes (100 TB design stance):
* ``spark.sql.session.timeZone=UTC`` pins naive-timestamp semantics to match
  the reference's tz-naive indexes (SURVEY §1.2) and DuckDB's UTC-naive
  timestamps for oracle comparison.
* AQE on: runtime partition coalescing + skew-join splitting replace any
  hand-tuned shuffle sizing when data volume jumps 1000x.
* shuffle partitions default to cluster parallelism locally; on a real
  cluster AQE's coalescing makes the initial number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable (SQLConf) knobs — safe to apply to a foreign session.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE re-optimize (coalesce/skew-split) stages that sit under a
    # cached plan.  Default false pins a persisted intermediate's full
    # shuffle fan-out forever, so every pass over a small cached table
    # (logreg GD rounds, staged pipelines) pays shuffle-partition-count
    # task launches; with AQE sizing by bytes this stays a no-op once
    # partitions are production-sized.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # r18 (VERDICT r17 item 4): the r17 shuffled-hash-join confs
    # (preferSortMergeJoin=false + maxShuffledHashJoinLocalMapThreshold)
    # are REMOVED as dead knobs — AQE FINAL executed plans
    # (isFinalPlan=true, plans/r18/*_aqe_final.txt) show ZERO
    # ShuffledHashJoin across the join-heavy suite (fleet_udg_filter's
    # three SMJs stay SMJ at runtime), so the conf never fired and its
    # claimed r17 win was not attributable to it; the static flip also
    # carried ADVICE r17's OOM concern (static SHJ picks trust planner
    # estimates and cannot fall back to sort).  lsh_topk's explicit
    # shuffle_hash HINTS are unaffected (hints bypass the preference).
    # Arrow for any pandas_udf / toPandas interop (multimodal + similarity).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bound Arrow batch size so mapInPandas over fat binary payloads
    # (multimodal media) can't assemble multi-GB batches per executor.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # Keep timestamp parquet reads stable across writers.
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
}


def tune(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply engine runtime conf to an existing session (idempotent)."""
    conf = dict(RUNTIME_CONF)
    if shuffle_partitions is None:
        try:
            shuffle_partitions = spark.sparkContext.defaultParallelism
        except Exception:  # Spark Connect — no SparkContext
            shuffle_partitions = None
    if shuffle_partitions:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    for key, value in conf.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # non-runtime-settable on this build; keep going
    return spark


def local_table(spark: SparkSession, rows, schema: str):
    """Driver-resident rows -> DataFrame via the Arrow/pandas path.

    ``createDataFrame(list)`` builds a PICKLED-ROW RDD: every scan of the
    table (each broadcast build, each noop write) launches a
    defaultParallelism-wide job whose tasks spin Python workers just to
    unpickle a handful of rows — measured 850 ms per materialization for
    a 16-row codebook table at local[32], serialized per broadcast.  The
    pandas route plans a JVM ``LocalTableScan`` instead (~66 ms, no
    Python workers, and broadcast builds read it driver-side).  Values
    are bit-identical: int64/float64/strings/array<double> round-trip
    exactly through Arrow, and the explicit ``schema`` pins types on
    both routes.  Falls back to the plain path for empty inputs or when
    pandas/Arrow conversion rejects the shape (r17).
    """
    # materialize first: the comprehension below iterates ``rows`` once
    # per COLUMN, so a generator input would exhaust on the first column
    # and silently build an empty frame before the fallback ever saw the
    # data (ADVICE r17)
    rows = list(rows)
    if rows:
        try:
            import pandas as pd

            cols = [f.split(None, 1)[0] for f in _split_ddl(schema)]
            pdf = pd.DataFrame(
                {c: [r[i] for r in rows] for i, c in enumerate(cols)}
            )
            return spark.createDataFrame(pdf, schema=schema)
        except Exception:
            pass
    return spark.createDataFrame(rows, schema)


def _split_ddl(schema: str) -> list[str]:
    """Split a DDL column list on top-level commas (array<...> et al.
    contain commas of their own)."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def get_spark(
    app_name: str = "cassandra_fs_pp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned local session.

    Honors ``SPARK_GRAFT_CPUS`` for local core count (driver contract).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
    )
    spark = builder.getOrCreate()
    return tune(spark, shuffle_partitions)
