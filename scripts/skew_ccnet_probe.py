"""Skewed-cohort probe for the CCNet bucket valve (VERDICT r12 item 4).

SCALE.md's r12 rows probed `curation_ccnet_buckets_banded` on the
BALANCED synthetic sources (20 cohorts of equal mass) — comparable by
construction, so the valve's actual claim was untested: at CCNet scale
the cohort key is the LANGUAGE and a head language can hold half the
corpus, which makes `ccnet_buckets`'s per-source ntile a single-task
sort while the banded twin stays one hash aggregation.

This probe builds N× corpora where ONE source holds ~50% of all
documents (copies 0..N/2-1 are remapped to a single `srchead` source;
the rest keep shifted per-copy source names, so the cohort COUNT also
grows), then times:

* end-to-end: both operators as shipped (KN scoring included);
* isolated valve: the post-scoring stage alone over a materialized
  (doc_id, source, ppl) input — ntile window vs histogram+band join —
  which is the apples-to-apples test of the sort-vs-aggregate claim.

Usage: python scripts/skew_ccnet_probe.py [N ...]   (default: 8 64)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_fs_pp_spark.functions.curation import (
    ccnet_buckets,
    ccnet_buckets_banded,
)
from cassandra_fs_pp_spark.functions.text import kn_perplexity
from cassandra_fs_pp_spark.session import get_spark
from cassandra_fs_pp_spark.sources.tables import load_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 10_000_000  # scale_probe.py FACT_SHIFT stride


def synthesize_skewed(spark, n: int, out_dir: str) -> None:
    """N× documents with doc_ids shifted per copy; copies 0..n/2-1 fold
    into ONE `srchead` source (~50% of the corpus), the rest keep
    per-copy-suffixed source names (cohort count grows ~10×n)."""
    df = load_table(spark, BASE, "documents")
    copies = []
    for i in range(n):
        c = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
        if i < n // 2:
            c = c.withColumn("source", F.lit("srchead"))
        else:
            c = c.withColumn(
                "source", F.concat(F.col("source"), F.lit(f"_{i}"))
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def _walls(fn, repeats: int = 2) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def ntile_stage(scored):
    w = Window.partitionBy("source").orderBy(
        F.col("ppl").asc(), F.col("doc_id").asc()
    )
    return scored.withColumn("bucket", F.ntile(3).over(w))


def banded_stage(scored, band_decimals: int = 2):
    scale = 10 ** band_decimals
    d = scored.withColumn(
        "band", F.floor(F.col("ppl") * scale).cast("long")
    )
    hist = d.groupBy("source", "band").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("source").orderBy("band")
    wt = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "band",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("n"),
    )
    cuts = cum.groupBy("source").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 2) div 3"), F.col("band"))
        ).alias("c1"),
        F.min(
            F.when(F.col("cum") >= F.expr("(2 * n + 2) div 3"), F.col("band"))
        ).alias("c2"),
    )
    bucket = (
        F.when(F.col("band") <= F.col("c1"), F.lit(1))
        .when(F.col("band") <= F.col("c2"), F.lit(2))
        .otherwise(F.lit(3))
    )
    return d.join(F.broadcast(cuts), "source").withColumn("bucket", bucket)


def probe(spark, sf_dir: str, tag: str) -> None:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    head = (
        docs.groupBy("source").count().orderBy(F.desc("count")).first()
    )
    print(
        f"[{tag}] docs={n_docs} head_source={head['source']} "
        f"head_share={head['count'] / n_docs:.2f}"
    )
    # action must CONSUME the bucket column: a bare count() lets the
    # optimizer prune the ntile window out of the plan entirely (first
    # probe draft measured exactly that nothing)
    e2e_ntile = _walls(
        lambda: ccnet_buckets(docs).groupBy("bucket").count().collect()
    )
    e2e_band = _walls(
        lambda: ccnet_buckets_banded(docs).groupBy("bucket").count().collect()
    )
    scored = (
        kn_perplexity(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "ppl")
        .localCheckpoint()
    )
    scored.count()
    v_ntile = _walls(
        lambda: ntile_stage(scored).groupBy("bucket").count().collect()
    )
    v_band = _walls(
        lambda: banded_stage(scored).groupBy("bucket").count().collect()
    )
    print(
        f"[{tag}] e2e ntile={e2e_ntile}s banded={e2e_band}s | "
        f"valve-only ntile={v_ntile}s banded={v_band}s "
        f"(valve ratio ntile/banded={v_ntile / v_band:.2f})"
    )


def valve_scale(spark, rows: int) -> None:
    """Sort-vs-aggregate crossover at VALVE scale: a synthesized scored
    input (no text, no KN) with one source holding 50% of `rows` — the
    regime the valve exists for, reachable without materializing a
    multi-GB text corpus.  ppl values are hash-derived doubles on a
    ~10k-value 2dp grid (so the histogram stays band-bounded, as with
    real perplexities)."""
    scored = (
        spark.range(rows)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.lit("srchead"))
            .otherwise(F.concat(F.lit("src"), F.pmod(F.hash("id"), F.lit(200))))
            .alias("source"),
            (
                F.pmod(F.hash(F.col("id") * 7 + 3), F.lit(10000)).cast("double")
                / 100.0
            ).alias("ppl"),
        )
        .localCheckpoint()
    )
    scored.count()
    v_ntile = _walls(
        lambda: ntile_stage(scored).groupBy("bucket").count().collect()
    )
    v_band = _walls(
        lambda: banded_stage(scored).groupBy("bucket").count().collect()
    )
    print(
        f"[valve-{rows // 1_000_000}M-rows, head=50%] "
        f"ntile={v_ntile}s banded={v_band}s "
        f"(ratio ntile/banded={v_ntile / v_band:.2f})"
    )
    scored.unpersist()


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [8, 64]
    spark = get_spark("skew_ccnet_probe")
    probe(spark, BASE, "1x-balanced")
    for n in ns:
        tmp = tempfile.mkdtemp(prefix=f"skewccnet{n}x_")
        try:
            synthesize_skewed(spark, n, tmp)
            probe(spark, tmp, f"{n}x-skewed")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    for rows in (2_000_000, 16_000_000, 64_000_000):
        valve_scale(spark, rows)


if __name__ == "__main__":
    main()
