"""Blocked fuzzy (edit-distance) join — entity-resolution primitive.

The reference engine has no string-similarity surface; this fills the
"match a dirty probe list against a master table" slot every large-scale
curation pipeline needs (URL/title/author reconciliation, near-duplicate
source names, OCR noise).

Spark-first shape: a *blocked* join that is EXACTLY equivalent to the
naive cross join + ``levenshtein(a, b) <= t`` filter, but never builds
the cross product. Blocking key = ``length(s) div (t + 1)``: an edit
distance of at most ``t`` changes the length by at most ``t``, so two
strings within distance ``t`` land in the same or adjacent length band
— the probe side fans out to bands ``{b-1, b, b+1}`` (3 rows) and the
master side stays single-band, making the candidate join a plain hash
equi-join. Each qualifying pair meets on exactly one band value, so no
dedup pass is needed.

At 100 TB: the band key alone is coarse (many strings share a length);
compose it with any exact-prefilter predicate that is cheap JVM-side —
here ``abs(len_a - len_b) <= t`` prunes before the O(len^2) levenshtein
runs, and Spark's built-in ``levenshtein(l, r, threshold)`` 3-arg form
early-exits the DP once the threshold is exceeded (banded Ukkonen cut).
For master tables with highly skewed length bands, salt the band key or
sub-block on a q-gram-count signature (also an exact lower bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_join(
    probes: DataFrame,
    master: DataFrame,
    probe_col: str,
    master_col: str,
    *,
    threshold: int,
) -> DataFrame:
    """All (probe, master) pairs with ``levenshtein <= threshold``.

    Result = cross-join semantics at hash-equi-join cost. Columns of both
    inputs are kept, plus ``dist`` (int). The caller guarantees the two
    sides share no column names.
    """
    band = threshold + 1
    p = probes.withColumn(
        "__pband", F.floor(F.length(probe_col) / band).cast("long")
    ).withColumn(
        "__band",
        F.explode(
            F.array(
                F.col("__pband") - 1, F.col("__pband"), F.col("__pband") + 1
            )
        ),
    )
    m = master.withColumn(
        "__band", F.floor(F.length(master_col) / band).cast("long")
    )
    cand = p.join(m, on="__band").filter(
        F.abs(F.length(probe_col) - F.length(master_col))
        <= F.lit(int(threshold))
    )
    # 3-arg levenshtein (Spark 3.5+) early-exits the DP past the
    # threshold and returns -1 — one banded evaluation, reused as dist.
    out = cand.withColumn(
        "dist",
        F.levenshtein(F.col(probe_col), F.col(master_col), int(threshold)),
    ).filter(F.col("dist") >= 0)
    return out.drop("__band", "__pband")
