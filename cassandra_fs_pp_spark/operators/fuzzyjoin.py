"""Blocked fuzzy (edit-distance) join — entity-resolution primitive.

The reference engine has no string-similarity surface; this fills the
"match a dirty probe list against a master table" slot every large-scale
curation pipeline needs (URL/title/author reconciliation, near-duplicate
source names, OCR noise).

Both blocking schemes below are EXACTLY equivalent to the naive cross
join + ``levenshtein(a, b) <= t`` filter — they only prune, never drop a
true match (differential-tested against the cross join):

* ``method="length"`` — band key ``length(s) div (t+1)``: distance <= t
  changes length by <= t, so matches land in the same or adjacent band.
  Cheap to build but weak when strings share lengths (a same-length
  corpus collapses into one band and the verify step goes quadratic).

* ``method="pigeonhole"`` (default) — the Ed-Join/PartEnum scheme: split
  each master string into ``t+1`` segments; at most ``t`` edits can
  touch at most ``t`` segments, so one segment survives VERBATIM in any
  probe within distance ``t``, displaced by at most ``t`` positions (the
  net insert/delete drift). The probe side enumerates every (master
  length in ``len±t``, segment index, shift in ``±t``) substring — a
  constant ``(2t+1)^2 (t+1)`` fan-out — and candidates become an exact
  hash equi-join on ``(master_len, segment_idx, segment_text)``. An
  aligned ~|s|/(t+1)-char verbatim match is a drastically stronger
  filter than a shared length band: at sf0.1 (1k probes x 20k masters)
  it cuts the levenshtein verify volume ~50x.

At 100 TB: candidates shuffle on the segment key (short string + two
ints); skewed segment values (e.g. a constant prefix across the corpus)
are the hot-key risk — pick segment count > t+1 with the same guarantee
weakened, or salt the hot segments. Verification uses Spark's 3-arg
``levenshtein`` (banded DP, early exit past the threshold), and runs
over DISTINCT values only (dedup-verify-reexpand): repeated names —
the norm in brand/title/host columns — are verified once, then two
hash joins restore full rows and multiplicities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_bounds_expr(i: int, nseg: int, length: str) -> tuple[str, str]:
    """(0-based start, seg length) SQL exprs of segment ``i`` of ``nseg``
    even segments over a string of SQL length expression ``length``."""
    start = f"cast(floor({i} * ({length}) / {nseg}) as int)"
    end = f"cast(floor({i + 1} * ({length}) / {nseg}) as int)"
    return start, f"({end} - {start})"


def blocked_levenshtein_join(
    probes: DataFrame,
    master: DataFrame,
    probe_col: str,
    master_col: str,
    *,
    threshold: int,
    method: str = "pigeonhole",
) -> DataFrame:
    """All (probe, master) pairs with ``levenshtein <= threshold``.

    Result = cross-join semantics at hash-equi-join cost. Columns of both
    inputs are kept, plus ``dist`` (int). The caller guarantees the two
    sides share no column names.
    """
    if method not in ("pigeonhole", "length"):
        raise ValueError("method must be 'pigeonhole' or 'length'")
    t = int(threshold)
    # Dedup-verify-reexpand: candidate generation and the levenshtein
    # verify run over DISTINCT string values only — real-world name
    # columns are heavily repeated (brands, titles, hosts), and the edit
    # distance of a pair depends only on the values. The verified value-
    # pair table then re-expands through two hash joins, restoring full
    # rows AND multiplicities (exactly the cross join's semantics).
    # r17: the probe-value dedup feeds the (2t+1)^2(t+1)-way segment
    # explode — a CPU-bound stage whose bytes are tiny, so AQE's
    # byte-based coalescing would starve it to 1-2 tasks.  An explicit
    # repartition BY VALUE with a pinned count (AQE never coalesces a
    # user-specified partition count) both dedups in one exchange
    # (hash clustering satisfies dropDuplicates) and keeps the explode
    # at cluster width.
    n_parts = probes.sparkSession.sparkContext.defaultParallelism
    pv = (
        probes.select(probe_col)
        .repartition(n_parts, probe_col)
        .dropDuplicates()
    )
    mv = master.select(master_col).distinct()
    if method == "length":
        cand = _length_band_candidates(pv, mv, probe_col, master_col, t)
    else:
        cand = _pigeonhole_candidates(pv, mv, probe_col, master_col, t)
    # 3-arg levenshtein (Spark 3.5+) early-exits the DP past the
    # threshold and returns -1 — one banded evaluation, reused as dist.
    verified = (
        cand.filter(
            F.abs(F.length(probe_col) - F.length(master_col)) <= F.lit(t)
        )
        .withColumn(
            "dist", F.levenshtein(F.col(probe_col), F.col(master_col), t)
        )
        .filter(F.col("dist") >= 0)
    )
    return probes.join(verified, on=probe_col).join(master, on=master_col)


def _length_band_candidates(
    probes: DataFrame,
    master: DataFrame,
    probe_col: str,
    master_col: str,
    t: int,
) -> DataFrame:
    band = t + 1
    p = probes.withColumn(
        "__pband", F.floor(F.length(probe_col) / band).cast("long")
    ).withColumn(
        "__band",
        F.explode(
            F.array(F.col("__pband") - 1, F.col("__pband"), F.col("__pband") + 1)
        ),
    )
    m = master.withColumn(
        "__band", F.floor(F.length(master_col) / band).cast("long")
    )
    return p.join(m, on="__band").drop("__band", "__pband")


def _pigeonhole_candidates(
    probes: DataFrame,
    master: DataFrame,
    probe_col: str,
    master_col: str,
    t: int,
) -> DataFrame:
    nseg = t + 1
    # Master side: its own nseg segment keys (L, i, seg).
    mkeys = []
    for i in range(nseg):
        start, slen = _seg_bounds_expr(i, nseg, f"length({master_col})")
        mkeys.append(
            f"named_struct('L', length({master_col}), 'i', {i},"
            f" 'seg', substring({master_col}, {start} + 1, {slen}))"
        )
    m = master.withColumn(
        "__k", F.explode(F.expr(f"array({', '.join(mkeys)})"))
    ).select(F.col("__k.L").alias("__L"), F.col("__k.i").alias("__i"),
             F.col("__k.seg").alias("__seg"), "*").drop("__k")
    # Probe side: candidate master length L = len(p)+dl, segment i, shift
    # sh — extract the aligned substring; out-of-range extractions are
    # dropped (they cannot equal a full-length master segment). The
    # (dl, i, sh) grid is a LITERAL struct array transformed by one
    # lambda: a single expression tree instead of (2t+1)^2(t+1) copies
    # (analysis/codegen cost scales with tree size, not row work).
    triples = ", ".join(
        f"named_struct('dl', {dl}, 'i', {i}, 'sh', {sh})"
        for dl in range(-t, t + 1)
        for i in range(nseg)
        for sh in range(-t, t + 1)
    )
    ln = f"(length({probe_col}) + tr.dl)"
    start = f"(cast(floor(tr.i * {ln} / {nseg}) as int) + tr.sh)"
    slen = (
        f"(cast(floor((tr.i + 1) * {ln} / {nseg}) as int)"
        f" - cast(floor(tr.i * {ln} / {nseg}) as int))"
    )
    probe_keys = f"""
      array_distinct(filter(transform(array({triples}), tr ->
        named_struct('L', {ln}, 'i', tr.i,
          'seg', if({start} >= 0 and {start} + {slen} <= length({probe_col})
                    and {ln} >= 0,
                    substring({probe_col}, {start} + 1, {slen}), null))),
        k -> k.seg is not null))
    """
    p = (
        probes.withColumn("__k", F.explode(F.expr(probe_keys)))
        .select(
            F.col("__k.L").alias("__L"),
            F.col("__k.i").alias("__i"),
            F.col("__k.seg").alias("__seg"),
            "*",
        )
        .drop("__k")
    )
    joined = p.join(m, on=["__L", "__i", "__seg"]).drop("__L", "__i", "__seg")
    # A pair can meet through several (i, shift) keys — dedup before the
    # (comparatively) expensive verify.  r17: explicit pair-keyed
    # repartition (pinned count, so AQE can't byte-coalesce it) — the
    # hash clustering satisfies the dedup AND the banded-DP levenshtein
    # verify downstream runs at cluster width instead of the 1-2 tasks
    # runtime coalescing left it (its bytes are small; its CPU is not).
    n_parts = probes.sparkSession.sparkContext.defaultParallelism
    return (
        joined.repartition(n_parts, probe_col, master_col).dropDuplicates()
    )
