"""Constant-density growing-territory probe for geo_grid_join.

The main scale probe grows point COUNT inside a FIXED 100 km box, so
pair density per cell — and the true answer's row count — grows
superlinearly; SCALE.md attributes geo_grid_join's residual 64x ratio
(5.6) to that output density, not the plan. This probe tests the claim
directly: grow the x-extent linearly WITH the point count (new stations
come with new territory), holding density — and therefore expected
pairs-per-point — constant. A healthy plan should read ~linear wall
(ratio well under N, like the other bucketed queries); a superlinear
ratio here would be a real plan defect.

Usage:
  python scripts/geo_density_probe.py run <factor>   # one timed pass
  python scripts/geo_density_probe.py                # min-of-2 fresh JVMs
                                                     # at 1x/8x/64x + table
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 200_000
RADIUS = 300


def run_once(factor: int) -> None:
    from pyspark.sql import functions as F

    from cassandra_fs_pp_spark.operators.geo import grid_radius_join
    from cassandra_fs_pp_spark.session import get_spark

    spark = get_spark()
    n = N_BASE * factor
    extent = 100_000 * factor  # territory grows with the fleet
    md5 = F.md5(F.concat(F.lit("g"), F.col("id").cast("string")))
    pts = spark.range(n).select(
        F.col("id"),
        (F.conv(F.substring(md5, 1, 15), 16, 10).cast("long") % extent)
        .alias("x"),
        (F.conv(F.substring(md5, 16, 15), 16, 10).cast("long") % 100_000)
        .alias("y"),
    )
    t0 = time.time()
    pairs = grid_radius_join(pts, radius=RADIUS).count()
    print(
        json.dumps(
            {
                "factor": factor,
                "n_points": n,
                "pairs": pairs,
                "sec": round(time.time() - t0, 3),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "run":
        run_once(int(sys.argv[2]))
        return
    results = {}
    for factor in (1, 8, 64):
        best = None
        for _ in range(2):  # min over fresh JVMs (SCALE.md protocol)
            p = subprocess.run(
                [sys.executable, __file__, "run", str(factor)],
                capture_output=True,
                text=True,
            )
            line = [
                l for l in p.stdout.splitlines() if l.startswith("{")
            ][-1]
            r = json.loads(line)
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[factor] = best
        print(f"factor {factor}: {best}", file=sys.stderr)
    base = results[1]["sec"]
    print(json.dumps(results))
    for f in (8, 64):
        r = results[f]
        print(
            f"| {f}x | {r['n_points']:,} pts | {r['pairs']:,} pairs | "
            f"{r['sec']} s | ratio {round(r['sec'] / base, 1)} |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
