"""Deduplication operators.

Reference semantics (SURVEY §2.3):
* P2 full-row dedup — ``drop_duplicates()`` at ``cassandra_fs_pp/fs_pp.py:100,259,295``.
* P3 keep-FIRST time dedup — ``ds[~ds.index.duplicated()]`` at
  ``cassandra_fs_pp/fs_pp.py:103``: pandas keeps the first occurrence in
  concatenation order (file order, then row order). Spark's
  ``dropDuplicates(keys)`` keeps an ARBITRARY row, so the deterministic
  variant here carries explicit ordering columns through a row_number window.

Scale notes: both shapes are single-shuffle (hash partition by the dedup
key). For 100 TB the key (event time / doc hash) is high-cardinality, so the
shuffle is well-spread; AQE coalesces the tail. No driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P2 — exact duplicate-row removal (whole row or a column subset)."""
    return df.dropDuplicates(list(subset) if subset else None)


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """P3 — deterministic keep-first dedup.

    ``order_by`` defines "first" (e.g. ``[file_seq, RECORD]`` for the
    reference's concat order, or an event id). One shuffle on ``keys``.
    """
    if "__rn" in df.columns:
        raise ValueError("dedup_keep_first: input already has a __rn column")
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def debounce_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap_s: float,
    *,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Burst-collapse dedup (P3 with time tolerance).

    Within each key's time-ordered series, a new *burst* starts whenever the
    gap since the previous event exceeds ``gap_s``; only the first event of
    each burst survives, annotated with ``burst_n`` (how many events it
    absorbed). The time-tolerant cousin of exact keyed dedup — the shape
    used to collapse retry storms / duplicate sensor transmissions where
    timestamps differ slightly (exact-key P3 at
    ``cassandra_fs_pp/fs_pp.py:103`` can't catch those).

    Gaps-and-islands over microsecond epochs (exact integer arithmetic — no
    float timestamps), planned as ONE shuffle: the kept row of a burst is
    by definition the row where the gap breaks, so no islands-id
    partitioning is needed — ``burst_n`` falls out of row-number
    arithmetic (next kept row's position − mine) over the SAME ``keys``
    partitioning, which survives the filter, so Catalyst inserts no second
    exchange. At 100 TB ``keys`` must be a real series key (site, sensor,
    event_type) so no single ordering dominates an executor.
    """
    order = [F.col(ts)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    # round, not int(): truncation makes a gap of EXACTLY gap_s break or
    # not depending on gap_s's binary representation (0.3s -> 299999us)
    gap_us = round(gap_s * 1_000_000)
    brk = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    annotated = (
        df.withColumn("__brk", brk)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__tot", F.count(F.lit(1)).over(full))
    )
    kept = annotated.filter(F.col("__brk") == 1)
    w2 = Window.partitionBy(*keys).orderBy("__rn")
    return (
        kept.withColumn(
            "burst_n",
            (
                F.coalesce(F.lead("__rn").over(w2), F.col("__tot") + 1)
                - F.col("__rn")
            ).cast("long"),
        )
        .drop("__brk", "__rn", "__tot")
    )
