"""Round-16 new/changed-query scale probe (scale_probe protocol).

Synthesizes the shifted 8x/64x corpora (scale_probe.synthesize — key
spaces GROW per copy; embeddings cells twin for the IVF contract rows),
then times the r16 probe set at 1x/8x via per-query min-of-2 fresh-JVM
bench runs, printing the SCALE.md addendum table. Probe set = the
queries new or changed since the r15 artifacts: the suffix-chain span
dedup (new), the greedy-batched BPE trainer (selection rule + params
changed), the staged-barrier flagship (barrier form changed), and the
cache-to-the-end logreg.

Special probe (VERDICT r15 item 3 done-criterion):
  --depth    trains the GREEDY batched BPE to >= 1024 learned rules on
             a 50k-doc high-entropy hex corpus (the r15 343-rule row's
             corpus class) and prints rules/round + s/rule — the
             production-vocabulary depth row. The r15 conservative rule
             capped fill at ~3.5-5.8 rules/round; greedy fill rises
             with the symbol space, so rule depth per counting round
             compounds.

Usage: python scripts/r16_probe.py [--skip-synth] [--depth] [N ...]
       (no flags: the 1x/8x table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe import (  # noqa: E402  (sibling)
    BASE,
    run_bench,
    synthesize,
    synthesize_cells_twin,
)
from cassandra_fs_pp_spark.session import get_spark  # noqa: E402

PROBE = [
    "dedup_chain_spans",
    "text_bpe_merges_batched",
    "curation_pretrain_pipeline",
    "curation_logreg_trained",
]


def synth_hex_corpus(spark, n_docs: int = 50_000, words: int = 30):
    """High-entropy synthetic corpus: ``n_docs`` docs of ``words``
    8-hex-char md5-derived words — word types barely repeat, so the
    BPE type table stays large and pair counts stay dense for deep
    training (the r15 343-rule row's corpus class)."""
    from pyspark.sql import functions as F

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {int(words)}),"
            " i -> substr(md5(concat(cast(id as string), '_',"
            " cast(i as string))), 1, 8)))"
        ).alias("text"),
    )


def probe_bpe_depth() -> None:
    """Item-3 done-criterion: greedy batched training to >= 1024 rules."""
    from cassandra_fs_pp_spark.functions.text import bpe_train_merges_batched

    spark = get_spark("bpe_depth16")
    docs = synth_hex_corpus(spark).localCheckpoint()
    t0 = time.time()
    rows = bpe_train_merges_batched(
        docs, rounds=60, batch=32, topk=512
    ).collect()
    wall = time.time() - t0
    per_round: dict[int, int] = {}
    for r in rows:
        per_round[r["round"]] = per_round.get(r["round"], 0) + 1
    n_rounds = max(per_round) if per_round else 0
    print(f"greedy batched train: {len(rows)} rules in {n_rounds} rounds, "
          f"{wall:.1f}s ({wall / max(len(rows), 1):.2f} s/rule, "
          f"{wall / max(n_rounds, 1):.2f} s/round)")
    print("rules/round:", dict(sorted(per_round.items())))


def probe_bpe_depth_apply() -> None:
    """Capstone: the FULL tokenizer pipeline at production vocabulary
    depth — train the greedy batched table to ~1k rules on the
    high-entropy corpus, then apply it with the rank-table tokenizer
    (the shape the replace-chain form cannot compile at this depth)."""
    from cassandra_fs_pp_spark.functions.text import (
        bpe_tokenize_counts_trie,
        bpe_train_merges_batched,
    )

    spark = get_spark("bpe_depth_apply16")
    docs = synth_hex_corpus(spark).localCheckpoint()
    t0 = time.time()
    rules = [
        (r["lhs"], r["rhs"], r["merged"])
        for r in bpe_train_merges_batched(
            docs, rounds=80, batch=32, topk=512
        ).orderBy("round", "rnk").collect()
    ]
    t_train = time.time() - t0
    t0 = time.time()
    out = bpe_tokenize_counts_trie(docs, rules=rules)
    agg = out.selectExpr(
        "count(*) AS docs", "sum(n_words) AS words",
        "sum(n_bpe_tokens) AS toks",
        "round(sum(n_chars) / sum(n_bpe_tokens), 4) AS compression",
    ).collect()[0]
    t_apply = time.time() - t0
    print(f"train: {len(rules)} rules in {t_train:.1f}s; apply to "
          f"{agg['docs']} docs / {agg['words']} words: {t_apply:.1f}s "
          f"({agg['toks']} tokens, compression {agg['compression']})")


def main() -> None:
    if "--depth-apply" in sys.argv:
        probe_bpe_depth_apply()
        return
    if "--depth" in sys.argv:
        probe_bpe_depth()
        return
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8]
    if "--skip-synth" not in sys.argv:
        spark = get_spark("r16_synth")
        for n in ns:
            out = f"/tmp/scale_probe_{n}x"
            t0 = time.time()
            synthesize(spark, n, out)
            synthesize_cells_twin(spark, n, out, f"/tmp/scale_probe_{n}x_cells")
            print(f"synthesized {n}x in {time.time() - t0:.0f}s")
        spark.stop()
    base = run_bench(BASE, queries=PROBE)
    print("1x:", base["queries"])
    for n in ns:
        big = run_bench(f"/tmp/scale_probe_{n}x", queries=PROBE)
        print(f"{n}x:", big["queries"])
        for q in PROBE:
            t1, t2 = base["queries"].get(q), big["queries"].get(q)
            if t1 and t2:
                print(f"| {q} | {t1} | {t2} | {round(t2 / t1, 1)} |")


if __name__ == "__main__":
    main()
