"""BPE application-depth probe (VERDICT r13 item 5 / "what's wrong" 3).

Question: does BPE application survive a PRODUCTION merge count?  The
replace-chain form (`bpe_tokenize_counts`) compiles one literal
`replace` per rule into the plan — expression depth grows linearly with
the vocabulary, so a real 32k-merge tokenizer explodes the expression
tree.  The rank-table form (`bpe_tokenize_counts_trie`) carries rules
as a closure constant inside ONE Arrow-batched mapInPandas over the
word-TYPE table, so application cost is independent of plan size.

Protocol: train a REAL merge table at the deepest depth once (pure
Python over the collected word-type table — identical greedy semantics
to the distributed trainer; training cost is not what this probe
grades), then time BOTH apply forms at increasing rule depths on the
same corpus, min-of-2 noop-write runs each, fresh cache-free plans.
The replace chain is attempted under try/except: past a few hundred
rules it is expected to die (codegen/analysis blowup), and that failure
IS the result.

Usage: python scripts/bpe_depth_probe.py [depths...]   (default 8 128 1024)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_fs_pp_spark.functions.text import (
    bpe_tokenize_counts,
    bpe_tokenize_counts_trie,
    whitespace_tokens,
)
from cassandra_fs_pp_spark.session import get_spark
from cassandra_fs_pp_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def train_local(vocab: Counter, merges: int) -> list[tuple[str, str, str]]:
    """Greedy BPE over the word-type table — same semantics as
    bpe_train_merges (count desc, lhs asc, rhs asc ties; left-to-right
    non-overlapping merge), pure Python for depth, not distribution."""
    vocab = Counter({tuple(w): f for w, f in vocab.items()})
    rules: list[tuple[str, str, str]] = []
    for _ in range(merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        (a, b), _cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((a, b, a + b))
        nxt: Counter = Counter()
        for syms, freq in vocab.items():
            if a not in syms or b not in syms:
                nxt[syms] += freq
                continue
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += freq
        vocab = nxt
    return rules


def time_noop(df, repeats: int = 2) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    depths = [int(a) for a in sys.argv[1:]] or [8, 128, 1024]
    spark = get_spark("bpe_depth_probe")
    docs = load_table(spark, SF_DIR, "documents")
    t0 = time.time()
    vocab_rows = (
        docs.select(F.explode(whitespace_tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .filter(~F.col("w").rlike(r"[()]"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    )
    vocab = Counter({r["w"]: int(r["freq"]) for r in vocab_rows})
    print(f"word types: {len(vocab)} ({time.time()-t0:.0f}s)")
    t0 = time.time()
    rules = train_local(vocab, max(depths))
    print(f"trained {len(rules)} merges in {time.time()-t0:.0f}s")

    for d in depths:
        sub = rules[:d]
        if len(sub) < d:
            # the corpus vocabulary caps learnable merges (sf0.1 has 31
            # word types -> 89 merges); pad to the requested depth with
            # NEVER-MATCHING rules (symbols outside the corpus alphabet)
            # — output is identical, so this isolates pure depth cost:
            # the replace chain pays one plan-level replace() per rule
            # (StackOverflowError at parse by 1024), the trie pays one
            # closure-constant list entry
            print(
                f"depth {d}: only {len(sub)} learnable merges on this "
                f"corpus — padding with {d - len(sub)} no-op rules"
            )
            sub = sub + [
                (f"§{i}", f"¶{i}", f"§{i}¶{i}")
                for i in range(d - len(sub))
            ]
        t_trie = time_noop(bpe_tokenize_counts_trie(docs, rules=sub))
        try:
            t_chain = time_noop(bpe_tokenize_counts_chain_rules(docs, sub))
        except Exception as e:  # noqa: BLE001 — the blowup IS the datum
            t_chain = f"FAILED ({type(e).__name__})"
        print(f"depth {len(sub)}: trie={t_trie}s replace-chain={t_chain}s",
              flush=True)
    spark.stop()


def bpe_tokenize_counts_chain_rules(docs, rules):
    """bpe_tokenize_counts's replace-chain with a PRE-TRAINED rule list
    (the registry form retrains; this probe times application only)."""

    def _sq(x: str) -> str:
        return x.replace("\\", "\\\\").replace("'", "\\'")

    enc = "concat('(', array_join(split(w, ''), ')('), ')')"
    for a, b, m in rules:
        enc = "replace({e}, '({a})({b})', '({m})')".format(
            e=enc, a=_sq(a), b=_sq(b), m=_sq(m)
        )
    ws = whitespace_tokens(F.col("text"))
    return (
        docs.select("doc_id", ws.alias("__ws"))
        .select("doc_id", F.expr("filter(__ws, w -> w <> '')").alias("__w"))
        .select(
            "doc_id",
            F.size("__w").cast("long").alias("n_words"),
            F.expr(
                "aggregate(__w, cast(0 as bigint), (acc, w) -> acc + length(w))"
            ).alias("n_chars"),
            F.expr(
                "aggregate(transform(__w, w -> CASE WHEN w rlike '[()]'"
                " THEN cast(1 as bigint)"
                f" ELSE cast(size(regexp_extract_all({enc}, '\\\\(([^)]*)\\\\)', 1)) as bigint) END),"
                " cast(0 as bigint), (acc, t) -> acc + t)"
            ).alias("n_bpe_tokens"),
        )
    )


if __name__ == "__main__":
    main()
