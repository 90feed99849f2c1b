"""Validity-bounding operators: out-of-range values become NULL.

Reference semantics (SURVEY §2.3):
* P7 range-validity nulling — ``x.where(x<=vmax).where(x>=vmin)`` per
  configured column family at ``cassandra_fs_pp/fs_pp.py:309-337`` with the
  spec in ``cassandra_fs_pp/valid_data_ranges.toml``. Family specs expand
  over the actual column set by regex (``TDR_T`` -> ``TDR[0-9]*_T``,
  ``EC`` -> ``EC([0-9]+)``) — the expansion is recomputed per input schema,
  never hard-coded (SURVEY §7.4 "dynamic schemas").
* P8 quality-flag predicate — UDG kept only where ``150 <= Q <= 210``; a
  NULL flag is treated as 150 (``cassandra_fs_pp/fs_pp.py:546-552``).

All pure column expressions: stay inside whole-stage codegen, no shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def in_range_or_null(col: Column, lo: float, hi: float) -> Column:
    """P7 core expr: value if lo<=x<=hi else NULL (NULL stays NULL)."""
    return F.when(col.between(F.lit(lo), F.lit(hi)), col)


def _family_regex(spec_key: str) -> str:
    """Translate a family spec key into the reference's column regex.

    ``TDR_<var>`` fans out over ``TDR[0-9]*_<var>``; a bare family name
    ``EC`` matches numbered members ``EC(1)..EC(n)`` as well as itself
    (cf. cassandra_fs_pp/fs_pp.py:322-331).
    """
    if spec_key.startswith("TDR_"):
        return r"TDR[0-9]*_" + re.escape(spec_key[4:]) + r"$"
    return re.escape(spec_key) + r"(\([0-9]+\))?$"


def null_out_of_range(
    df: DataFrame, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """P7 — apply a validity spec to every matching column family member."""
    exprs: dict[str, Column] = {}
    for spec_key, (lo, hi) in ranges.items():
        pat = re.compile(_family_regex(spec_key))
        for c in df.columns:
            if pat.match(c):
                checked = in_range_or_null(
                    exprs.get(c, F.col(c)), lo, hi
                )
                # two spec keys matching one column COMPOSE (intersection
                # of ranges), mirroring the reference's sequential
                # .where() filters — last-wins would be insertion-order-
                # dependent
                exprs[c] = checked
    if not exprs:
        return df
    return df.withColumns(exprs)


def quality_gate(
    value: Column,
    flag: Column,
    lo: int = 150,
    hi: int = 210,
    null_flag_default: int = 150,
) -> Column:
    """P8 — keep ``value`` only where the quality flag is in range."""
    eff = F.coalesce(flag, F.lit(null_flag_default))
    return F.when(eff.between(F.lit(lo), F.lit(hi)), value)
