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
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
