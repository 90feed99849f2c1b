"""r18 core-scaling leg (VERDICT r17 item 6).

The driver's 8-vs-32-core comparison at sf0.1 measures scheduling
overhead only: every sf0.1 table is ONE single-row-group parquet file,
so scans cannot parallelize and all 47 core-ratios read ~1.  This probe
re-asks the question at a data size where the answer is informative:
the standing 8x shifted-key twin (scale_probe.synthesize — written by
Spark as MULTI-FILE parquet, so scans split), timed at 32 and at 8
cores with bench.py's own warm + best-of-2 discipline, fresh JVM per
leg, min over ``repeats`` processes.

Usage: python scripts/r18_core_probe.py [--skip-synth] [--n=8]
                                        [--queries=q1,q2,...]
Prints the 8c/32c ratio table for SCALE.md (ratio -> 1.0 means the
query no longer parallelizes; healthy CPU-bound rows should approach
the 4x core ratio as compute dominates).  ``--n=64`` runs the deep leg:
the r18 finding at 8x is that per-query wall is still fixed-latency
dominated (all ratios 0.84-1.22), so the core ratio only becomes
informative once executor compute dominates — which needs the 64x
corpus for the tokenize/shingle-heavy rows.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import (  # noqa: E402
    CELLS_PROPORTIONAL,
    run_bench,
    synthesize,
    synthesize_cells_twin,
)

# the 12 heaviest headline rows + the serving twins (the VERDICT item-6
# "heavy CPU rows": pq/adc/bpe/dsir must show ratio >= 2)
PROBE = [
    "ann_ivf_pq_topk",
    "ann_ivf_pq_serving",
    "ann_ivf_adc_topk",
    "ann_ivf_adc_serving",
    "ann_lsh_topk",
    "text_bpe_tokenize_trie",
    "text_bpe_merges_batched",
    "curation_dsir_select",
    "curation_logreg_trained",
    "curation_pretrain_pipeline",
    "curation_decontaminate",
    "dedup_verbatim_spans",
    "dedup_chain_spans",
    "dedup_minhash_cluster",
    "text_repetition_flags",
]


def main() -> None:
    n = 8
    repeats = 2
    probe = list(PROBE)
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--queries="):
            probe = [q.strip() for q in a.split("=", 1)[1].split(",")]
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
    out_dir = os.path.join(tempfile.gettempdir(), f"scale_probe_{n}x")
    cells_dir = os.path.join(tempfile.gettempdir(), f"scale_probe_{n}x_cells")
    if "--skip-synth" not in sys.argv:
        from cassandra_fs_pp_spark.session import get_spark

        spark = get_spark("r18_core_probe_synth")
        t0 = time.time()
        synthesize(spark, n, out_dir)
        synthesize_cells_twin(spark, n, out_dir, cells_dir)
        spark.stop()
        print(f"synthesized {n}x at {out_dir} in {time.time()-t0:.0f}s")
    for t in ("documents", "embeddings", "lineitem", "events"):
        parts = glob.glob(os.path.join(out_dir, f"{t}.parquet", "*.parquet"))
        print(f"  {t}: {len(parts)} part files")

    legs: dict[int, dict] = {}
    for cpus in (32, 8):
        os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
        cells_q = [q for q in probe if q in CELLS_PROPORTIONAL]
        fixed_q = [q for q in probe if q not in CELLS_PROPORTIONAL]
        res = run_bench(out_dir, repeats=repeats, queries=fixed_q)
        if cells_q:
            cres = run_bench(cells_dir, repeats=repeats, queries=cells_q)
            res["queries"].update(cres["queries"])
        legs[cpus] = res
        print(f"{cpus}c suite: {round(sum(res['queries'].values()), 3)}s "
              f"(calib {res['calib']})")

    lines = [
        "| query | 32c sec | 8c sec | 8c/32c |",
        "|---|---|---|---|",
    ]
    for q in probe:
        t32 = legs[32]["queries"].get(q)
        t8 = legs[8]["queries"].get(q)
        if t32 and t8:
            tag = " (cells∝n)" if q in CELLS_PROPORTIONAL else ""
            lines.append(f"| {q}{tag} | {t32} | {t8} | {round(t8 / t32, 2)} |")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
