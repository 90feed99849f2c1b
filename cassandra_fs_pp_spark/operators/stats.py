"""Distributed exact ranking/statistics primitives.

``Window.orderBy`` with no partition key moves every row through ONE
partition — fine for a single station's series (reference-parity mode),
fatal at 100 TB. :func:`global_row_number` is the scale path: a total
order is established by range repartitioning + in-partition sort, local
indices are assigned NARROWLY (no shuffle) per partition, and the global
rank is local index + a broadcast per-partition offset (the same
two-level cumsum decomposition ``windows.sweep_concurrency`` uses for
day baselines).

Determinism: ranks depend only on the TOTAL order (callers must pass
tiebreak columns), not on where range boundaries land, so the output is
reproducible even though the range sampler's boundaries may vary.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def global_row_number(
    df: DataFrame,
    order_by: Sequence[str | Column],
    *,
    out_col: str = "rn",
    materialize: bool = True,
) -> DataFrame:
    """Exact global 1-based row_number over ``order_by`` without a
    single-partition window.

    Plan shape: one range shuffle (repartitionByRange) + narrow Arrow
    pass adding ``(partition_id, local_index)`` + a partition-count
    aggregate (rows = #partitions) whose running sum becomes broadcast
    offsets. Zero full-data ORDER BY through a single executor.

    ``materialize=True`` (default) localCheckpoints the indexed data so
    the offset-count branch reads it back instead of re-running the
    range shuffle + sort (both consumers of a diverging lineage would
    otherwise recompute it — the cache-where-reused discipline, same as
    the iterative graph ops). Pass False to keep a pure-lazy lineage.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    sorted_df = df.repartitionByRange(*cols).sortWithinPartitions(*cols)

    # build a NEW StructType — StructType.add mutates in place, and
    # df.schema hands back the df's cached instance, so chaining .add on
    # it would poison the source df's schema with phantom columns
    schema = StructType(
        list(sorted_df.schema.fields)
        + [StructField("__pid", IntegerType()), StructField("__lidx", LongType())]
    )

    def add_idx(batches: Iterator) -> Iterator:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        i = 0
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.assign(__pid=pid, __lidx=range(i, i + n))
            i += n
            yield pdf

    with_idx = sorted_df.mapInPandas(add_idx, schema)
    if materialize:
        with_idx = with_idx.localCheckpoint()
    counts = with_idx.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__c").over(w), F.lit(0))
    ).select("__pid", "__off")
    return (
        with_idx.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__lidx") + F.col("__off") + 1).cast("long"))
        .drop("__pid", "__lidx")
    )


def global_running_sum(
    df: DataFrame,
    val_col: str,
    order_by: Sequence[str | Column],
    *,
    out_col: str = "running_sum",
    exclusive: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Exact global running sum of ``val_col`` over ``order_by`` without a
    single-partition window — the prefix-sum sibling of
    :func:`global_row_number`, same two-level decomposition.

    Plan shape: one range shuffle establishes the total order, a narrow
    Arrow pass computes per-partition LOCAL cumulative sums, and a
    #partitions-row aggregate of per-partition totals becomes broadcast
    carry-in offsets. ``exclusive=True`` gives the sum of all STRICTLY
    preceding rows (the "start offset" shape sequence packing needs);
    ``False`` includes the current row. The value depends only on the
    total order (pass tiebreak columns), never on where range boundaries
    land.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    sorted_df = df.repartitionByRange(*cols).sortWithinPartitions(*cols)

    schema = StructType(
        list(sorted_df.schema.fields)
        + [StructField("__pid", IntegerType()), StructField("__lcum", LongType())]
    )

    def add_cum(batches: Iterator) -> Iterator:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        carry = 0
        for pdf in batches:
            v = pdf[val_col].fillna(0).astype("int64")
            inc = v.cumsum() + carry
            pdf = pdf.assign(
                __pid=pid, __lcum=(inc - v) if exclusive else inc
            )
            carry = int(inc.iloc[-1]) if len(pdf) else carry
            yield pdf

    with_cum = sorted_df.mapInPandas(add_cum, schema)
    if materialize:
        with_cum = with_cum.localCheckpoint()
    totals = with_cum.groupBy("__pid").agg(
        F.sum(F.coalesce(F.col(val_col), F.lit(0))).alias("__s")
    )
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__s").over(w), F.lit(0))
    ).select("__pid", "__off")
    return (
        with_cum.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__lcum") + F.col("__off")).cast("long"))
        .drop("__pid", "__lcum", "__off")
    )


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    *,
    k: int,
    capacity: int = 1000,
) -> DataFrame:
    """Exact top-``k`` most frequent values via a Misra-Gries prefilter.

    The plain ``groupBy(col).count().orderBy(...)`` answer shuffles EVERY
    distinct value — at 100 TB of tokens that is a full-vocabulary
    exchange dominated by the singleton tail. This runs the classic
    sketch-then-verify pattern instead:

    1. **Map-side Misra-Gries** (``mapInPandas``, one pass, ``capacity``
       counters per partition): any value with global frequency
       > N/capacity survives in at least one partition summary, so the
       union of survivors is a guaranteed superset of every true top-k
       whose count exceeds that bound (pick ``capacity >> k``; with
       capacity=1000 the bound is 0.1% of rows — far below any credible
       top-20 token). Summary size: <= capacity rows per partition.
    2. **Exact recount of candidates only**: broadcast semi-join of the
       tiny candidate set against the stream, then an ordinary count —
       the shuffle now carries only candidate rows.
    3. Deterministic top-k: count desc, value asc tie-break.

    The result is EXACT (the sketch only prunes, never estimates), so the
    SQL oracle is the plain group-by top-k.
    """
    import pandas as pd

    schema = StructType([StructField("cand", df.schema[col].dataType, False)])

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Weighted Misra-Gries: merge vectorized per-batch value_counts,
        # then bleed off uniform mass while over capacity (each bleed of m
        # removes >= (capacity+1)*m total, preserving the N/capacity
        # undercount bound of the unit-decrement original).
        counters: dict[object, int] = {}
        for pdf in batches:
            for v, c in pdf[col].dropna().value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            while len(counters) > capacity:
                m = min(counters.values())
                counters = {
                    key: n - m for key, n in counters.items() if n > m
                }
        yield pd.DataFrame({"cand": list(counters.keys())})

    cands = df.select(col).mapInPandas(mg, schema).distinct()
    counted = (
        df.join(
            F.broadcast(cands), df[col] == cands["cand"], "left_semi"
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(col).asc())
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .drop("rk")
    )
