"""Round-17 probes (scale_probe protocol).

Three legs:

  --skew-ab  The VERDICT r16 item-1 done-criterion exhibit: on the
             boilerplate skew corpus (scale_probe.synthesize_skew_twin —
             a fixed 48-token phrase prepended to ~20% of sf0.1 docs, so
             every one of its k-shingles is shared by ~10k documents),
             run each de-skewed text-dedup operator in BOTH forms —
             the r17 groupBy+agg+join-back form (engine) and the r16
             per-shingle/per-token WindowExec form (inline diagnostic
             replicas below, kept ONLY as measurement controls) — and
             report wall time plus the MAX single-task time read from
             the Spark status REST API.  The window form funnels every
             occurrence of a hot key into one sorted task; the agg form
             partial-aggregates it map-side, so its max task stays
             bounded.

  --depth    The VERDICT r16 item-4 done-criterion: greedy batched BPE
             training with the sym_cap=4 symbol-diversity pool on the
             r16 50k-doc high-entropy hex corpus — same
             rounds/batch/topk as the r16 capstone (60/32/512), so the
             rules-per-round fill is directly comparable to r16's
             16/round plateau.

  (no flag)  1x/8x shifted-corpus ratio table for the r17 new/changed
             query set (the five de-skewed text-dedup queries + the
             sym_cap trainer + the r16-late trio), scale_probe's
             standard per-query min-of-2 fresh-JVM protocol.

Usage: python scripts/r17_probe.py [--skew-ab] [--depth] [--skip-synth]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_fs_pp_spark.session import get_spark  # noqa: E402
from scale_probe import (  # noqa: E402  (sibling)
    BASE,
    run_bench,
    synthesize,
    synthesize_cells_twin,
    synthesize_skew_twin,
)

PROBE = [
    "dedup_chain_spans",
    "dedup_verbatim_spans",
    "dedup_strip_verbatim",
    "dedup_setsim_join",
    "dedup_containment",
    "text_bpe_merges_batched",
    "text_bpe_pipeline",
    "a_bottomk_quantiles",
    "a_bloom_membership",
]

SKEW_DIR = os.path.join("/tmp", "scale_probe_skew")


# ---------------------------------------------------------------- REST

def _completed_stages(spark) -> set[tuple[int, int]]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        data = json.load(r)
    return {(s["stageId"], s["attemptId"]) for s in data}


def _run_with_max_task(spark, df) -> tuple[float, float]:
    """noop-write the plan; return (wall_sec, max_single_task_sec) over
    the stages the run completed (status REST taskSummary, q=1.0)."""
    before = _completed_stages(spark)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    mx = 0.0
    for sid, att in _completed_stages(spark) - before:
        url = (f"{base}/api/v1/applications/{app}/stages/{sid}/{att}"
               f"/taskSummary?quantiles=1.0")
        try:
            with urllib.request.urlopen(url) as r:
                s = json.load(r)
            mx = max(mx, float(s["executorRunTime"][0]) / 1000.0)
        except Exception:
            pass  # stage with no task metrics
    return wall, mx


# ------------------------------------------- r16 window-form replicas
# Diagnostic CONTROLS for the --skew-ab exhibit only: these reproduce
# the r16 per-shingle/per-token WindowExec forms the engine no longer
# ships (operators/textdedup.py moved to groupBy+agg+join-back in r17).
# Row-for-row identical to the engine forms on every corpus — the A/B
# difference under measurement is purely task-skew behavior.

def _shingles(docs, k: int):
    from cassandra_fs_pp_spark.functions.text import whitespace_tokens

    return (
        docs.select(F.col("doc_id"), whitespace_tokens(F.col("text")).alias("__ws"))
        .where(F.size("__ws") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(__ws) - {k}),"
                    f" i -> array_join(slice(__ws, i + 1, {k}), ' '))"
                )
            ).alias("pos", "shingle"),
        )
    )


def verbatim_spans_window_form(docs, *, k: int = 8):
    from pyspark.sql import Window

    sh = _shingles(docs, k)
    hit = (
        sh.withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("shingle")))
        .where(F.col("__n") >= 2)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = hit.withColumn("__grp", F.col("pos") - F.row_number().over(w))
    return runs.groupBy("doc_id", "__grp").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
    ).select(
        "doc_id", "span_start", "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
    )


def suffix_chain_window_form(docs, *, k: int = 8):
    from pyspark.sql import Window

    sh = _shingles(docs, k)
    occ = (
        sh.withColumn(
            "__src",
            F.min(F.struct(F.col("doc_id").alias("d"), F.col("pos").alias("p")))
            .over(Window.partitionBy("shingle")),
        )
        .where(~((F.col("doc_id") == F.col("__src.d")) & (F.col("pos") == F.col("__src.p"))))
        .select(
            "doc_id", "pos", F.col("__src.d").alias("src_doc"),
            (F.col("pos") - F.col("__src.p")).alias("diag"),
        )
    )
    wrun = Window.partitionBy("doc_id", "src_doc", "diag").orderBy("pos")
    runs = occ.withColumn("__grp", F.col("pos") - F.row_number().over(wrun))
    return runs.groupBy("doc_id", "src_doc", "diag", "__grp").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
    ).select(
        "doc_id", "span_start", "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        "src_doc",
        (F.col("span_start") - F.col("diag")).cast("long").alias("src_start"),
    )


def token_df_window_form(toks):
    """The PPJoin document-frequency ranking step, r16 window form:
    count over partitionBy(token) on the exploded (doc, token) frame —
    the contested stage of dedup_setsim_join / dedup_containment
    (everything downstream is identical in both forms)."""
    from pyspark.sql import Window

    tok = toks.select(
        F.col("doc_id").alias("__id"),
        F.explode(F.array_distinct(F.col("toks"))).alias("__tok"),
    )
    return tok.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("__tok"))
    )


def token_df_agg_form(toks):
    tok = toks.select(
        F.col("doc_id").alias("__id"),
        F.explode(F.array_distinct(F.col("toks"))).alias("__tok"),
    )
    dfreq = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    return tok.join(dfreq, "__tok")


def probe_skew_ab() -> None:
    import __spark_entry__ as entrymod
    from cassandra_fs_pp_spark.operators.textdedup import (
        suffix_chain_spans,
        verbatim_spans,
    )

    spark = get_spark("r17_skew_ab")
    if not os.path.exists(os.path.join(SKEW_DIR, "documents.parquet")):
        t0 = time.time()
        synthesize_skew_twin(spark, SKEW_DIR)
        print(f"synthesized skew twin at {SKEW_DIR} in {time.time()-t0:.0f}s")
    docs = spark.read.parquet(os.path.join(SKEW_DIR, "documents.parquet"))
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__ws")
    ).select(
        "doc_id",
        F.expr(
            "case when size(__ws) >= 4 then"
            " transform(sequence(0, size(__ws) - 4),"
            " i -> concat_ws(' ', __ws[i], __ws[i+1], __ws[i+2], __ws[i+3]))"
            " else cast(array() as array<string>) end"
        ).alias("toks"),
    )
    pairs = [
        ("verbatim_spans", lambda: verbatim_spans(docs, k=8),
         lambda: verbatim_spans_window_form(docs, k=8)),
        ("suffix_chain_spans", lambda: suffix_chain_spans(docs, k=8),
         lambda: suffix_chain_window_form(docs, k=8)),
        ("ppjoin_token_df", lambda: token_df_agg_form(toks),
         lambda: token_df_window_form(toks)),
    ]
    lines = [
        "| operator (skew corpus) | agg wall | agg max-task |"
        " window wall | window max-task |",
        "|---|---|---|---|---|",
    ]
    for name, agg_fn, win_fn in pairs:
        # warm both (JIT/footer caches), then measure best-of-2 each
        agg_fn().write.format("noop").mode("overwrite").save()
        win_fn().write.format("noop").mode("overwrite").save()
        aw, am, ww, wm = 1e9, 0.0, 1e9, 0.0
        for _ in range(2):
            w1, m1 = _run_with_max_task(spark, agg_fn())
            if w1 < aw:
                aw, am = w1, m1
            w2, m2 = _run_with_max_task(spark, win_fn())
            if w2 < ww:
                ww, wm = w2, m2
        lines.append(
            f"| {name} | {aw:.2f}s | {am:.2f}s | {ww:.2f}s | {wm:.2f}s |"
        )
        print(lines[-1])
    print("\n".join(lines))


def probe_bpe_depth() -> None:
    """VERDICT r16 item-4 done-criterion: sym_cap=4 fill on the r16
    depth corpus, same rounds/batch/topk as the r16 capstone."""
    from cassandra_fs_pp_spark.functions.text import bpe_train_merges_batched
    from r16_probe import synth_hex_corpus  # noqa: E402 (sibling)

    spark = get_spark("bpe_depth17")
    docs = synth_hex_corpus(spark).localCheckpoint()
    t0 = time.time()
    rows = bpe_train_merges_batched(
        docs, rounds=60, batch=32, topk=512, sym_cap=4
    ).collect()
    wall = time.time() - t0
    per_round: dict[int, int] = {}
    for r in rows:
        per_round[r["round"]] = per_round.get(r["round"], 0) + 1
    n_rounds = max(per_round) if per_round else 0
    fills = [per_round.get(i, 0) for i in range(1, n_rounds + 1)]
    steady = fills[len(fills) // 2:]
    print(
        f"depth(sym_cap=4): {len(rows)} rules / {n_rounds} rounds /"
        f" {wall:.1f}s ({wall / max(len(rows), 1):.2f} s/rule);"
        f" per-round fill={fills};"
        f" steady(last half) mean={sum(steady) / max(len(steady), 1):.1f}"
    )


def main() -> None:
    if "--skew-ab" in sys.argv:
        probe_skew_ab()
        return
    if "--depth" in sys.argv:
        probe_bpe_depth()
        return
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8]
    if "--skip-synth" not in sys.argv:
        spark = get_spark("r17_synth")
        for n in ns:
            out = os.path.join("/tmp", f"scale_probe_{n}x")
            t0 = time.time()
            synthesize(spark, n, out)
            synthesize_cells_twin(
                spark, n, out, os.path.join("/tmp", f"scale_probe_{n}x_cells")
            )
            print(f"synthesized {n}x at {out} in {time.time()-t0:.0f}s")
        spark.stop()
    base = run_bench(BASE, queries=PROBE)
    for n in ns:
        big = run_bench(os.path.join("/tmp", f"scale_probe_{n}x"), queries=PROBE)
        print(f"| query | 1x sec | {n}x sec | ratio |")
        print("|---|---|---|---|")
        for q in PROBE:
            t1, t2 = base["queries"].get(q), big["queries"].get(q)
            if t1 and t2:
                print(f"| {q} | {t1} | {t2} | {round(t2 / t1, 1)} |")


if __name__ == "__main__":
    main()
