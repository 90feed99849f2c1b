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

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)


def _two_level_prefix(
    df: DataFrame,
    order_by: Sequence[str | Column],
    *,
    local_pass: Callable[[StructType], Callable[[Iterator], Iterator]],
    local_field: StructField,
    totals_agg: Column,
    combine: Callable[[Column, Column], Column],
    out_col: str,
    materialize: bool,
) -> DataFrame:
    """Shared two-level prefix decomposition behind
    :func:`global_row_number` / :func:`global_running_sum`.

    One range shuffle establishes the total order; a narrow Arrow pass
    attaches ``(__pid, <local statistic>)`` per partition; a
    #partitions-row aggregate of per-partition totals becomes broadcast
    carry-in offsets; ``combine(local, offset)`` yields the global
    value. The offset Window orders only #partitions rows (benign
    single-partition WindowExec warning), never the corpus.

    ``materialize=True`` localCheckpoints the locally-annotated data so
    the offset-totals branch reads it back instead of re-running the
    range shuffle + sort (both consumers of a diverging lineage would
    otherwise recompute it — the cache-where-reused discipline, same as
    the iterative graph ops). CAPACITY NOTE: localCheckpoint is EAGER
    and pins one corpus-sized copy in executor block storage
    (MEMORY_AND_DISK) until the session GC's it — acceptable O(n) with
    disk spill, but budget executor storage for the largest input that
    flows through here, or pass ``materialize=False`` to trade the copy
    for one extra range shuffle + sort recompute.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    sorted_df = df.repartitionByRange(*cols).sortWithinPartitions(*cols)

    # build a NEW StructType — StructType.add mutates in place, and
    # df.schema hands back the df's cached instance, so chaining .add on
    # it would poison the source df's schema with phantom columns
    schema = StructType(
        list(sorted_df.schema.fields)
        + [StructField("__pid", IntegerType()), local_field]
    )

    with_local = sorted_df.mapInPandas(local_pass(schema), schema)
    if materialize:
        with_local = with_local.localCheckpoint(eager=False)
    totals = with_local.groupBy("__pid").agg(totals_agg.alias("__c"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__c").over(w), F.lit(0))
    ).select("__pid", "__off")
    local_name = local_field.name
    return (
        with_local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, combine(F.col(local_name), F.col("__off")))
        .drop("__pid", local_name, "__off")
    )


def global_row_number(
    df: DataFrame,
    order_by: Sequence[str | Column],
    *,
    out_col: str = "rn",
    materialize: bool = True,
) -> DataFrame:
    """Exact global 1-based row_number over ``order_by`` without a
    single-partition window.

    Plan shape (via :func:`_two_level_prefix`): one range shuffle
    (repartitionByRange) + narrow Arrow pass adding
    ``(partition_id, local_index)`` + a partition-count aggregate
    (rows = #partitions) whose running sum becomes broadcast offsets.
    Zero full-data ORDER BY through a single executor. See the helper's
    docstring for ``materialize`` semantics and the capacity note.
    """

    def local_pass(_schema: StructType) -> Callable[[Iterator], Iterator]:
        def add_idx(batches: Iterator) -> Iterator:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            i = 0
            for pdf in batches:
                n = len(pdf)
                pdf = pdf.assign(__pid=pid, __lidx=range(i, i + n))
                i += n
                yield pdf

        return add_idx

    return _two_level_prefix(
        df,
        order_by,
        local_pass=local_pass,
        local_field=StructField("__lidx", LongType()),
        totals_agg=F.count(F.lit(1)),
        combine=lambda lidx, off: (lidx + off + 1).cast("long"),
        out_col=out_col,
        materialize=materialize,
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
    :func:`global_row_number`, same two-level decomposition (see
    :func:`_two_level_prefix` for the plan shape, ``materialize``
    semantics, and the capacity note).

    ``exclusive=True`` gives the sum of all STRICTLY preceding rows (the
    "start offset" shape sequence packing needs); ``False`` includes the
    current row. The value depends only on the total order (pass
    tiebreak columns), never on where range boundaries land.

    NULL policy (matches a ``SUM(...) OVER w - col`` window and the
    DuckDB oracle of ``pack_sequences``): a NULL ``val_col`` contributes
    0 to every other row's prefix but its OWN ``out_col`` is NULL — a
    null token count must poison its own pack_id, not silently count as
    an empty document. ``val_col`` must be an integral type; fractional
    inputs would be silently truncated by the int64 cumsum, so they are
    rejected at entry.
    """
    if not isinstance(
        df.schema[val_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        raise TypeError(
            f"global_running_sum requires an integral val_col; got "
            f"{df.schema[val_col].dataType.simpleString()!r} for {val_col!r} "
            "(cast explicitly if truncation is intended)"
        )

    def local_pass(_schema: StructType) -> Callable[[Iterator], Iterator]:
        def add_cum(batches: Iterator) -> Iterator:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            carry = 0
            for pdf in batches:
                v = pdf[val_col]
                mask = v.notna()
                filled = v.fillna(0).astype("int64")
                inc = filled.cumsum() + carry
                lcum = (inc - filled) if exclusive else inc
                pdf = pdf.assign(
                    __pid=pid, __lcum=lcum.astype("Int64").where(mask)
                )
                carry = int(inc.iloc[-1]) if len(pdf) else carry
                yield pdf

        return add_cum

    return _two_level_prefix(
        df,
        order_by,
        local_pass=local_pass,
        local_field=StructField("__lcum", LongType()),
        totals_agg=F.sum(F.coalesce(F.col(val_col), F.lit(0))),
        combine=lambda lcum, off: (lcum + off).cast("long"),
        out_col=out_col,
        materialize=materialize,
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
