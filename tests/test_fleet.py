"""Multi-site fleet pipeline: N stations through one partitioned lineage.

The reference processes one station per run (``bin/fs_process_l2.py``).
The engine's fleet path must (a) produce per-site results identical to
running the single-site parity path per station, and (b) contain NO
unpartitioned window or global grid — every Window node partitions by
site, so the plan scales with the number of stations (the "designed for
100 TB" claim cashed out on the reference's own workload).
"""

from __future__ import annotations

import datetime as dt
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cassandra_fs_pp_spark.config import SiteConfig
from cassandra_fs_pp_spark.plans.levels import (
    fleet_level1_to_level2,
    fleet_normalise_udg,
    filter_udg,
    level1_to_level2,
    normalise_udg,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

# per-site: (sampling step, value offset, height-change events)
SITES = {
    "FS_A": (900, 0.0, [[T0, 1.0]]),                       # install only
    "FS_B": (1800, 0.35, [[T0, 1.2], [T0 + dt.timedelta(days=3)]]),  # +auto
    "FS_C": (900, -0.2, [[T0, 0.8], [T0 + dt.timedelta(days=3), -0.31]]),
}
N_DAYS = 6


def _site_frame(step_s: int, offset: float, events) -> pd.DataFrame:
    n = N_DAYS * 86400 // step_s
    ts, tcdt, q, t107, ec = [], [], [], [], []
    jump_at = events[1][0] if len(events) > 1 else None
    for i in range(n):
        t = T0 + dt.timedelta(seconds=i * step_s)
        ts.append(t)
        base = 2.0 + offset if (jump_at is None or t < jump_at) else 1.76 + offset
        # one spike to exercise the despike filter, one bad-quality point
        tcdt.append(5.0 if i == 30 else base + (0.01 * (i % 3)))
        q.append(300 if i == 40 else 180)
        t107.append(50.0 if i == 25 else -20.0 - (i % 5))  # i==25 out of range
        ec.append(0.4 + 0.001 * (i % 7))
    return pd.DataFrame(
        {"TIMESTAMP": ts, "TCDT": tcdt, "Q": q, "T107_C": t107, "EC(1)": ec}
    )


def _cfg(site: str, events) -> SiteConfig:
    return SiteConfig(
        site=site,
        raw={
            "site": site,
            "level0_1": {"index_col": "TIMESTAMP"},
            "level1_2": {
                "udg_height_change": [
                    [e[0], e[1]] if len(e) > 1 else [e[0]] for e in events
                ],
                "remove_columns": [],
            },
        },
    )


CALIB = {"EC(1)": (2.0, 0.1)}


@pytest.fixture(scope="module")
def fleet_l1(spark):
    frames = []
    for site, (step, off, events) in SITES.items():
        pdf = _site_frame(step, off, events)
        sdf = spark.createDataFrame(pdf).withColumn("site", F.lit(site))
        frames.append(sdf)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def test_fleet_matches_per_site_pipeline(spark, fleet_l1):
    """fleet_level1_to_level2 over 3 sites == level1_to_level2 per site."""
    events_by_site = {s: ev for s, (_, _, ev) in SITES.items()}
    fleet = fleet_level1_to_level2(
        fleet_l1,
        _cfg("FLEET", []),
        events_by_site,
        CALIB,
    )
    got = {
        (r["site"], r["TIMESTAMP"]): r.asDict()
        for r in fleet.collect()
    }

    n_rows = 0
    for site, (step, off, events) in SITES.items():
        single = level1_to_level2(
            fleet_l1.filter(F.col("site") == site).drop("site"),
            _cfg(site, events),
            CALIB,
        )
        for r in single.collect():
            n_rows += 1
            key = (site, r["TIMESTAMP"])
            assert key in got, f"fleet missing {key}"
            frow = got[key]
            for c, v in r.asDict().items():
                fv = frow[c]
                if isinstance(v, float):
                    assert fv == pytest.approx(v, abs=1e-9), (key, c, v, fv)
                else:
                    assert fv == v, (key, c, v, fv)
    assert n_rows == len(got)


def test_fleet_normalise_matches_sequential(spark, fleet_l1):
    """The one-pass fleet delta aggregation reproduces the sequential
    per-site driver recurrence (incl. the auto-derived delta at FS_B)."""
    events_by_site = {s: ev for s, (_, _, ev) in SITES.items()}
    fleet = fleet_normalise_udg(fleet_l1, events_by_site)
    got = {
        (r["site"], r["TIMESTAMP"]): r["TCDT"] for r in fleet.collect()
    }
    for site, (_, _, events) in SITES.items():
        single = normalise_udg(
            fleet_l1.filter(F.col("site") == site).drop("site"), events=events
        )
        for r in single.collect():
            assert got[(site, r["TIMESTAMP"])] == pytest.approx(
                r["TCDT"], abs=1e-12, nan_ok=True
            ), (site, r["TIMESTAMP"])


def test_udg_event_dims_local_table(spark, fleet_l1):
    """r18 (VERDICT r17 item 8): the driver-resident UDG event dimension
    tables (the medians probe table and the per-site delta array) must
    plan as pure-JVM LocalTableScan, never as a pickled-row ExistingRDD
    whose every broadcast build spins Python workers.  Value equality
    with the old route is pinned by the sequential differentials above
    (timestamps land as session-tz UTC on both routes)."""
    events_by_site = {s: ev for s, (_, _, ev) in SITES.items()}
    fleet = fleet_normalise_udg(fleet_l1, events_by_site)
    plan = fleet._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan
    assert "ExistingRDD" not in plan, plan


def _formatted_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    spark = df.sparkSession
    return jqe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_fleet_plan_has_no_unpartitioned_window(spark, fleet_l1):
    """Every Window node in the fleet plan partitions by site — no global
    sort, no single-partition window, whatever the station count."""
    events_by_site = {s: ev for s, (_, _, ev) in SITES.items()}
    fleet = fleet_level1_to_level2(
        fleet_l1, _cfg("FLEET", []), events_by_site, CALIB
    )
    plan = _formatted_plan(fleet)
    # node details are "(NN) Window\n...\nArguments: [...], [partition], [sort]"
    # blocks separated by blank lines
    windows = [
        blk
        for blk in plan.split("\n\n")
        if re.match(r"\(\d+\) Window\b", blk)
    ]
    assert windows, "expected Window nodes in the fleet plan"
    for body in windows:
        arg_line = next(
            (ln for ln in body.splitlines() if ln.startswith("Arguments:")), ""
        )
        assert re.search(r"\[site#\d+[L]?\]", arg_line), (
            f"unpartitioned window:\n{arg_line}"
        )
    # and no single-partition exchange anywhere in the pipeline
    assert "SinglePartition" not in plan, plan


def test_fleet_tdr_depth_matches_per_site(spark):
    """fleet_calc_depth_tdr == calc_depth_tdr run per site (the fleet
    form swaps the per-site first-reading collect for a window)."""
    from cassandra_fs_pp_spark.plans.levels import (
        calc_depth_tdr,
        fleet_calc_depth_tdr,
    )

    rows = []
    for s in ("A", "B"):
        off = 0.3 if s == "B" else 0.0
        for i in range(60):
            # triangular surface with a melt-out dip
            base = (i % 20) * 0.05 if (i % 40) < 20 else (20 - i % 20) * 0.05
            rows.append(
                (s, T0 + i * dt.timedelta(hours=6), base + off)
            )
    df = spark.createDataFrame(rows, "site string, TIMESTAMP timestamp, TCDT double")

    fleet = fleet_calc_depth_tdr(df, T0, -0.4)
    got = {(r["site"], r["TIMESTAMP"]): r["depth"] for r in fleet.collect()}
    n = 0
    for s in ("A", "B"):
        single = calc_depth_tdr(
            df.filter(F.col("site") == s).drop("site"), T0, -0.4
        )
        for r in single.collect():
            n += 1
            assert got[(s, r["TIMESTAMP"])] == pytest.approx(
                r["depth"], abs=1e-12
            )
    assert n == len(got) == 120
