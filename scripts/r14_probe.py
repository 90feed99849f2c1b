"""Round-14 new/changed-query scale probe (scale_probe protocol).

Synthesizes the shifted 8x/64x corpora (scale_probe.synthesize — key
spaces GROW per copy), then times the r14 probe set at 1x/8x/64x via
per-query min-of-2 fresh-JVM bench runs, printing the SCALE.md addendum
table. Probe set = the queries new or plan-changed since the r13
artifacts: dsir (bigram + HOF fix), trie BPE, trained logreg, semantic
decontamination, repetition flags, CDC chunking (row-exploded rewrite),
and the residual-encoded IVF-PQ pair.

Usage: python scripts/r14_probe.py [--skip-synth]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe import BASE, run_bench, synthesize  # noqa: E402  (sibling)
from cassandra_fs_pp_spark.session import get_spark  # noqa: E402

PROBE = [
    "curation_dsir_select",
    "text_bpe_tokenize_trie",
    "curation_logreg_trained",
    "curation_semantic_decontaminate",
    "text_repetition_flags",
    "text_cdc_chunks",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_serving",
]


def main() -> None:
    dirs = {8: "/tmp/scale_probe_8x", 64: "/tmp/scale_probe_64x"}
    if "--skip-synth" not in sys.argv:
        spark = get_spark("r14_probe_synth")
        for n, d in dirs.items():
            synthesize(spark, n, d)
            print(f"synthesized {n}x at {d}")
        spark.stop()
    base = run_bench(BASE, queries=PROBE)
    print("1x:", base["queries"])
    b8 = run_bench(dirs[8], queries=PROBE)
    print("8x:", b8["queries"])
    b64 = run_bench(dirs[64], queries=PROBE)
    print("64x:", b64["queries"])
    print()
    print("| query | 1x sec | 8x sec | ratio | 64x sec | ratio | ratio/64 |")
    print("|---|---|---|---|---|---|---|")
    for q in PROBE:
        t1, t8, t64 = (d["queries"].get(q) for d in (base, b8, b64))
        if not (t1 and t8 and t64):
            print(f"| {q} | {t1} | {t8} | - | {t64} | - | - |")
            continue
        print(
            f"| {q} | {t1} | {t8} | {round(t8 / t1, 1)} | {t64} |"
            f" {round(t64 / t1, 1)} | {round(t64 / t1 / 64, 2)} |"
        )


if __name__ == "__main__":
    main()
