"""Level-0 -> Level-1 -> Level-2 pipelines (SURVEY §3 query lifecycle).

Reference-parity flows, re-expressed as lazy DataFrame lineages:

* :func:`level0_to_level1` — the reference's ``level0_to_level1``
  (``cassandra_fs_pp/fs_pp.py:68-106``): per-dataset TOA5 scans (bales /
  onefile / serviced append, ``:109-217``), outer union, all-NaN column
  prune, exact dedup, deterministic keep-first time dedup.
* :func:`normalise_udg` — ``_normalise_udg`` (``fs_pp.py:452-511``): the
  piecewise height-change offset (W9) with auto-derived deltas from
  pre/post-event medians (A1).
* :func:`filter_udg` — ``_filter_udg`` (``fs_pp.py:514-567``): quality gate
  (P8), dominant-frequency regularization + limited ffill (A3/W5), trailing
  rolling-median despike (W1/P9), re-alignment to original timestamps (J2).
* :func:`calibrate_ec` — ``_calibrate_ec`` (``fs_pp.py:570-608``): per-sensor
  linear calibration with fallback-to-mean coefficients (J1).
* :func:`level1_to_level2` — ``level1_to_level2`` (``fs_pp.py:263-299``):
  validity nulling (P7), column drops (P4), regex rename (P6), UDG
  normalize+filter, calibrated EC overwrite (J5), final dedup.
* :func:`calc_depth_tdr` — ``_calc_depth_tdr`` (``fs_pp.py:611-644``): the
  surface-ratchet burial depth, via the verified closed form (W8) instead of
  the reference's sequential loop.
* :func:`chain_installation_depths` — ``chain_installation_depths``
  (``fs_pp.py:427-449``): driver-side chain geometry -> sensor dim table (R3).

Scale stance: every per-row transformation stays a single lazy lineage that
Catalyst optimizes end-to-end; the only driver-side actions are O(#events)
scalar medians (auto height-change deltas) and O(1) scalars (dominant
sampling frequency, UDG-at-install) — each computed on a pruned
two-column projection, so at 100 TB each action scans one column family,
not the wide table. Single-station series use unpartitioned time windows
(parity mode); a fleet of stations partitions every window by site —
all window helpers here accept ``partition_by``.
"""

from __future__ import annotations

import datetime as _dt
import glob
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_fs_pp_spark.config import DEFAULT_VALID_RANGES, SiteConfig
from cassandra_fs_pp_spark.operators.dedup import dedup_keep_first
from cassandra_fs_pp_spark.operators.projection import (
    DEFAULT_L2_RENAME,
    build_l2_rename,
    prune_all_null_columns,
    rename_columns,
)
from cassandra_fs_pp_spark.operators.validity import null_out_of_range, quality_gate
from cassandra_fs_pp_spark.operators.windows import (
    dominant_freq_seconds,
    ratchet_depth,
    resample_ffill,
    rolling_median,
    time_frame,
)
from cassandra_fs_pp_spark.sources.toa5 import read_toa5

TIME = "TIMESTAMP"


# --------------------------------------------------------------------------- #
# Level-0 -> Level-1
# --------------------------------------------------------------------------- #


def resolve_level0_paths(cfg: SiteConfig, data_root: str) -> list[list[str]]:
    """Driver-side path resolution for every configured level-0 dataset,
    in config order (S2/S3; reference ``fs_pp.py:109-217``).

    Bales expand to ``MainTable{i}.dat`` for i in [bales_start, bales_stop];
    ``onefile`` is the configured subpath. The LAST dataset also appends a
    single ``serviced/*MainTable*`` file when present (``fs_pp.py:132-149``).
    Pure metadata plane: a handful of ``os.path`` operations per site.
    """
    names = list(cfg.datasets)
    out: list[list[str]] = []
    for n, name in enumerate(names):
        ds = cfg.datasets[name]
        paths: list[str] = []
        if ds["type"] == "bales":
            root = os.path.join(data_root, name, ds.get("subpath", ""))
            for i in range(ds["bales_start"], ds["bales_stop"] + 1):
                paths.append(os.path.join(root, f"MainTable{i}.dat"))
            serviced_root = os.path.join(root, "serviced")
        elif ds["type"] == "onefile":
            paths.append(os.path.join(data_root, name, ds["subpath"]))
            serviced_root = os.path.join(
                data_root, name, os.path.split(ds["subpath"])[0], "serviced"
            )
        else:
            raise ValueError(f"dataset {name}: unknown type {ds['type']!r}")
        if n == len(names) - 1 and os.path.isdir(serviced_root):
            found = glob.glob(os.path.join(serviced_root, "*MainTable*"))
            if len(found) == 1:
                paths.append(found[0])
        out.append(paths)
    return out


def level0_to_level1(
    spark: SparkSession,
    cfg: SiteConfig,
    data_root: str,
    *,
    keep_provenance: bool = False,
) -> DataFrame:
    """L0 -> L1: scan all datasets, union, prune, dedup (``fs_pp.py:68-106``).

    Determinism: pandas resolves duplicate timestamps by concat order
    (file order, then row order). Spark's ``dropDuplicates`` keeps an
    arbitrary row, so the lineage carries an explicit ``(_seq, RECORD)``
    ordering — ``_seq`` is the global file index, ``RECORD`` the logger's
    per-file monotone sequence number — and both dedups are keep-first
    row_number windows over it (SURVEY §7.4).
    """
    per_dataset = resolve_level0_paths(cfg, data_root)
    flat = [p for ds_paths in per_dataset for p in ds_paths]
    seq_of = {os.path.abspath(p): i for i, p in enumerate(flat)}

    frames: list[DataFrame] = []
    for ds_paths in per_dataset:
        # one scan per dataset: datasets may have different logger programs
        # (schemas); files within a dataset share one program.
        df = read_toa5(spark, ds_paths, with_provenance=True)
        frames.append(df)
    union = frames[0]
    for df in frames[1:]:
        union = union.unionByName(df, allowMissingColumns=True)

    # _file (a file:// URI) -> global sequence number, as a literal map:
    # a few entries per site, folded into the plan (no join, no shuffle).
    # input_file_name() percent-encodes the URI, so match BOTH the raw
    # path and its quoted form (a space in data_root would otherwise
    # silently NULL every _seq and break keep-first determinism).
    from urllib.parse import quote as _quote

    seq_expr = F.lit(None).cast("int")
    for path, i in seq_of.items():
        cond = F.col("_file").endswith(path)
        q = _quote(path)
        if q != path:
            cond = cond | F.col("_file").endswith(q)
        seq_expr = F.when(cond, F.lit(i)).otherwise(seq_expr)
    union = union.withColumn("_seq", seq_expr).drop("_file")

    # P1 all-null column prune (one count pass, then Catalyst prunes the scan)
    union = prune_all_null_columns(union, protect=(TIME, "RECORD", "_seq"))
    data_cols = [c for c in union.columns if c != "_seq"]

    # P2 exact row dedup, keep-first in concat order (provenance excluded)
    union = dedup_keep_first(union, keys=data_cols, order_by=["_seq"])
    # P3 keep-first time dedup
    union = dedup_keep_first(union, keys=[TIME], order_by=["_seq", "RECORD"])

    if not keep_provenance:
        union = union.drop("_seq")
    return union


# --------------------------------------------------------------------------- #
# UDG normalization + filtering
# --------------------------------------------------------------------------- #


def _round2_half_up(x: float) -> float:
    """2-dp HALF_UP round matching Spark's ``F.round(col, 2)`` on doubles
    (Spark rounds BigDecimal.valueOf(d) = the shortest decimal repr, which
    is exactly what ``repr(float)`` yields)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def _to_ts(d) -> _dt.datetime:
    if isinstance(d, _dt.datetime):
        return d
    if isinstance(d, _dt.date):
        return _dt.datetime(d.year, d.month, d.day)
    return _dt.datetime.fromisoformat(str(d))


def normalise_udg(
    l1: DataFrame,
    *,
    udg_col: str = "TCDT",
    events: Sequence[Sequence] = (),
    t: str = TIME,
) -> DataFrame:
    """W9 — stitch UDG height-change jumps (``fs_pp.py:452-511``).

    ``events``: config ``udg_height_change`` rows, ``[date, delta]`` or
    ``[date]``. The FIRST event zeroes the series at the install height
    (delta required). Later events subtract a user delta, or an
    auto-derived one: ``round(median(date..date+1d]) -
    median([date-1d..date-4h]), 2)`` with both medians rounded to 2dp
    first — computed on the series WITH all earlier offsets applied, so
    events evaluate sequentially driver-side (O(#events) actions, each an
    aggregate over a pruned (time, udg) projection).

    Returns ``(t, udg_col)`` — the normalized series.
    """
    u = l1.select(t, udg_col)
    first = True
    for ev in events:
        if isinstance(ev, (list, tuple)) and len(ev) == 2:
            date, user_delta = _to_ts(ev[0]), float(ev[1])
        else:
            date = _to_ts(ev[0] if isinstance(ev, (list, tuple)) else ev)
            user_delta = None
        if first:
            if user_delta is None:
                raise ValueError("first udg_height_change event needs a height")
            delta = user_delta
            first = False
        elif user_delta is not None:
            delta = user_delta
        else:
            tc = F.col(t)
            pre = u.filter(
                tc.between(
                    F.lit(date - _dt.timedelta(days=1)),
                    F.lit(date - _dt.timedelta(hours=4)),
                )
            ).agg(F.round(F.median(udg_col), 2).alias("m"))
            post = u.filter(
                tc.between(F.lit(date), F.lit(date + _dt.timedelta(days=1)))
            ).agg(F.round(F.median(udg_col), 2).alias("m"))
            pre_m = pre.collect()[0]["m"]
            post_m = post.collect()[0]["m"]
            if pre_m is None or post_m is None:
                raise ValueError(f"no UDG data around height change at {date}")
            delta = round(post_m - pre_m, 2)
        u = u.withColumn(
            udg_col,
            F.when(F.col(t) >= F.lit(date), F.col(udg_col) - F.lit(delta)).otherwise(
                F.col(udg_col)
            ),
        )
    return u


def filter_udg(
    l1: DataFrame,
    *,
    udg: DataFrame | None = None,
    udg_col: str = "TCDT",
    q_col: str = "Q",
    t: str = TIME,
    med_window_s: int = 2 * 86400,
    threshold: float = 0.5,
    ffill_limit: int = 3,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """P8 + W5 + W1 + P9 + J2 — the UDG despike filter (``fs_pp.py:514-567``).

    1. quality gate: keep only ``150 <= Q <= 210`` (null Q -> 150);
    2. regularize to the dominant sampling grid, forward-fill <= 3 steps;
    3. trailing ``med_window_s`` rolling median over the regular grid
       (pandas ``closed='right'`` frame: the point exactly window-start is
       excluded -> range frame ``[-(w-1), 0]`` on whole-second grids);
    4. null out points ``abs(median - x) >= threshold``;
    5. re-align onto the original (irregular) timestamps.

    ``udg`` (optional) supplies an already-normalized ``(t, udg_col)``
    series; Q always comes from ``l1``.
    """
    keys = list(partition_by or [])
    src = (udg if udg is not None else l1.select(*keys, t, udg_col)).join(
        l1.select(*keys, t, q_col), on=keys + [t], how="left"
    )
    gated = src.select(
        *keys, t, quality_gate(F.col(udg_col), F.col(q_col)).alias(udg_col)
    )

    # fleet mode (partition keys): per-key dominant frequency, fully lazy;
    # single-station parity mode: one driver-side scalar (A3)
    freq_s = None if keys else dominant_freq_seconds(gated, t)
    filled = resample_ffill(
        gated, t, freq_s, limit=ffill_limit, partition_by=keys, origin="start_day"
    )
    frame = time_frame(t, before_s=med_window_s - 1, partition_by=keys)
    despiked = filled.select(
        *keys,
        t,
        F.when(
            F.abs(rolling_median(udg_col, frame) - F.col(udg_col))
            < F.lit(float(threshold)),
            F.col(udg_col),
        ).alias(udg_col),
    )
    # J2: back to the original sampling instants
    original_t = (udg if udg is not None else l1).select(*keys, t)
    return despiked.join(original_t, on=keys + [t], how="inner")


def fleet_normalise_udg(
    l1: DataFrame,
    events_by_site: dict[str, Sequence[Sequence]],
    *,
    udg_col: str = "TCDT",
    site_col: str = "site",
    t: str = TIME,
) -> DataFrame:
    """W9, fleet form — :func:`normalise_udg` for N stations at once.

    The single-station path (reference ``fs_pp.py:452-511`` parity) takes
    O(#events) driver-side median actions per site; a fleet would pay
    O(sites x events) sequential Spark jobs. Here ALL sites' auto-delta
    medians come from ONE distributed aggregation: a broadcast-sized
    (site, event, date) table range-joins the fleet frame, pre/post
    medians aggregate per (site, event) in a single shuffle, and one
    collect of #auto_events rows lets the driver finish the (cheap,
    order-dependent) rounding recurrence. Offsets re-enter the lineage as
    a per-site event array via one broadcast join; the subtraction runs
    per event in config order (``acc - delta``), matching the sequential
    path's float arithmetic exactly.

    Assumes consecutive events at a site sit >2 days apart (true of the
    reference's field visits) so an event's ±1-day median windows never
    straddle an earlier step — then the raw medians are offset-invariant
    and equal the sequential path's (differential-tested in
    tests/test_fleet.py).

    Returns ``(site_col, t, udg_col)``.
    """
    spark = l1.sparkSession
    u = l1.select(site_col, t, udg_col)

    # -- driver-side event bookkeeping (metadata plane) --
    auto_rows = []  # (site, event_index, date)
    parsed: dict[str, list[tuple[int, _dt.datetime, float | None]]] = {}
    for site, events in events_by_site.items():
        out = []
        for k, ev in enumerate(events):
            if isinstance(ev, (list, tuple)) and len(ev) == 2:
                date, user_delta = _to_ts(ev[0]), float(ev[1])
            else:
                date = _to_ts(ev[0] if isinstance(ev, (list, tuple)) else ev)
                user_delta = None
            if k == 0 and user_delta is None:
                raise ValueError(
                    f"site {site}: first udg_height_change event needs a height"
                )
            if user_delta is None:
                auto_rows.append((site, k, date))
            out.append((k, date, user_delta))
        parsed[site] = out
        # validate the >2-day spacing the offset-invariance argument
        # rests on: an AUTO event whose ±1-day median windows straddle
        # the previous step would silently produce a corrupt delta
        # (explicit user deltas don't use the windows, so they're exempt)
        for (_, d0, _), (_, d1_, later_user_delta) in zip(out, out[1:]):
            if later_user_delta is None and (d1_ - d0) <= _dt.timedelta(days=2):
                raise ValueError(
                    f"site {site}: auto udg_height_change event at {d1_} is "
                    f"<=2 days after the {d0} event — its ±1-day median "
                    "window would straddle the earlier step; supply the "
                    "height explicitly"
                )

    # -- one distributed aggregation for every auto event's medians --
    raw_medians: dict[tuple[str, int], tuple[float | None, float | None]] = {}
    if auto_rows:
        # r18 (VERDICT r17 item 8): LocalTableScan route instead of a
        # pickled-row RDD — the broadcast build below reads it driver-
        # side with no Python-worker job.  Naive datetimes land as
        # session-tz (UTC) timestamps on BOTH routes; value equality is
        # pinned by tests/test_fleet.py::test_udg_event_dims_local_table
        from cassandra_fs_pp_spark.session import local_table

        ev_df = local_table(
            spark, auto_rows, f"{site_col} string, __k int, __date timestamp"
        )
        d1 = F.expr("INTERVAL 1 DAY")
        h4 = F.expr("INTERVAL 4 HOURS")
        near = u.join(
            F.broadcast(ev_df),
            (u[site_col] == ev_df[site_col])
            & (F.col(t) >= F.col("__date") - d1)
            & (F.col(t) <= F.col("__date") + d1),
        ).select(
            ev_df[site_col].alias("__site"),
            "__k",
            F.when(
                (F.col(t) >= F.col("__date") - d1)
                & (F.col(t) <= F.col("__date") - h4),
                F.col(udg_col),
            ).alias("__pre"),
            F.when(F.col(t) >= F.col("__date"), F.col(udg_col)).alias("__post"),
        )
        med = near.groupBy("__site", "__k").agg(
            F.median("__pre").alias("pre_m"), F.median("__post").alias("post_m")
        )
        for r in med.collect():
            raw_medians[(r["__site"], r["__k"])] = (r["pre_m"], r["post_m"])

    # -- cheap sequential rounding recurrence per site (driver, no jobs) --
    deltas_by_site: dict[str, list[tuple[_dt.datetime, float]]] = {}
    for site, events in parsed.items():
        off = 0.0
        out = []
        for k, date, user_delta in events:
            if user_delta is not None:
                delta = user_delta
            else:
                pre_raw, post_raw = raw_medians.get((site, k), (None, None))
                if pre_raw is None or post_raw is None:
                    raise ValueError(
                        f"site {site}: no UDG data around height change at {date}"
                    )
                # identical arithmetic to the sequential path, which rounds
                # the offset-applied medians (median commutes with the shift)
                # with F.round = HALF_UP — Python round() is banker's and
                # diverges by 0.01 on exact .xx5 medians, so use HALF_UP here
                delta = round(
                    _round2_half_up(post_raw - off) - _round2_half_up(pre_raw - off),
                    2,
                )
            off += delta
            out.append((date, delta))
        deltas_by_site[site] = out

    # -- re-enter the lineage: per-site event array via one broadcast join --
    # r18: dict-shaped struct cells so the Arrow/pandas LocalTableScan
    # route can convert them (tuples fall back to the pickled path);
    # both routes accept dicts, so the fallback stays value-identical
    from cassandra_fs_pp_spark.session import local_table

    dim = local_table(
        spark,
        [
            (site, [{"d": d, "delta": float(dl)} for d, dl in evs])
            for site, evs in deltas_by_site.items()
        ],
        f"{site_col} string, __evs array<struct<d:timestamp,delta:double>>",
    )
    tc = F.col(t)
    # coalesce: a site with NO configured events folds over an empty
    # array (pass-through) — a NULL __evs from the left join would
    # otherwise NULL the site's whole series
    applied = F.aggregate(
        F.filter(
            F.coalesce(
                F.col("__evs"),
                F.expr("CAST(array() AS array<struct<d:timestamp,delta:double>>)"),
            ),
            lambda e: e["d"] <= tc,
        ),
        F.col(udg_col).cast("double"),
        lambda acc, e: acc - e["delta"],
    )
    return (
        u.join(F.broadcast(dim), on=site_col, how="left")
        .select(site_col, t, applied.alias(udg_col))
    )


def fleet_level1_to_level2(
    l1: DataFrame,
    cfg: SiteConfig,
    events_by_site: dict[str, Sequence[Sequence]],
    calibrations: dict[str, tuple[float, float]] | None = None,
    *,
    site_col: str = "site",
    valid_ranges: dict[str, tuple[float, float]] = DEFAULT_VALID_RANGES,
    rename_mapping: Sequence[tuple[str, str]] = DEFAULT_L2_RENAME,
    t: str = TIME,
) -> DataFrame:
    """L1 -> L2 for a FLEET: ``l1`` carries ``site_col`` and every window /
    grid / join in the UDG chain partitions by it (per-site dominant
    frequency via :func:`per_key_dominant_freq`, no unpartitioned window
    anywhere — asserted in tests/test_fleet.py). The reference runs one
    station at a time (``bin/fs_process_l2.py``); this is the same
    semantics at any number of stations with one pass over the data.

    Sites share a logger program (one schema, one valid-range spec, one
    rename mapping — the realistic fleet deployment); per-site metadata
    (height-change events) arrives via ``events_by_site``.
    """
    bounded = null_out_of_range(l1, valid_ranges)

    udg_col = cfg.udg_key
    norm = fleet_normalise_udg(
        bounded, events_by_site, udg_col=udg_col, site_col=site_col, t=t
    )
    udg_l2 = filter_udg(
        bounded, udg=norm, udg_col=udg_col, t=t, partition_by=[site_col]
    )

    ec_exprs = calibrate_ec(bounded, calibrations) if calibrations else {}
    level2 = bounded.drop(*cfg.remove_columns)
    level2 = level2.withColumns(ec_exprs) if ec_exprs else level2
    rename = build_l2_rename(
        [c for c in level2.columns if c != site_col], rename_mapping
    )
    level2 = rename_columns(level2, rename)

    udg_l2_name = rename.get(udg_col, udg_col)
    level2 = level2.drop(udg_l2_name).join(
        udg_l2.select(site_col, t, F.col(udg_col).alias(udg_l2_name)),
        on=[site_col, t],
        how="left",
    )
    return level2.dropDuplicates()


def fleet_calc_depth_tdr(
    udg: DataFrame,
    install_date,
    install_depth: float,
    *,
    site_col: str = "site",
    udg_col: str = "TCDT",
    t: str = TIME,
    out_col: str = "depth",
) -> DataFrame:
    """W8, fleet form — :func:`calc_depth_tdr` for N stations in one pass.

    The single-station path collects the first at/after-install UDG
    reading driver-side (one action per site); here the per-site
    normalization constant is a ``first`` window over (site, time) — no
    action, no per-site loop — followed by the same ratchet closed form
    partitioned by site. Shared install date/depth (the common fleet
    deployment); per-site installs would join a site->install dim first.

    Returns ``(site_col, t, out_col)`` from the install date onward.
    """
    from pyspark.sql import Window as _W

    date = _to_ts(install_date)
    after = udg.filter(F.col(t) >= F.lit(date)).filter(
        F.col(udg_col).isNotNull()
    )
    w = (
        _W.partitionBy(site_col)
        .orderBy(t)
        .rowsBetween(_W.unboundedPreceding, _W.unboundedFollowing)
    )
    norm = after.select(
        site_col,
        t,
        (F.col(udg_col) - F.first(udg_col).over(w)).alias("__u"),
    )
    return norm.select(
        site_col,
        t,
        ratchet_depth(
            "__u", t, float(install_depth), partition_by=[site_col]
        ).alias(out_col),
    )


# --------------------------------------------------------------------------- #
# EC calibration
# --------------------------------------------------------------------------- #


def calibrate_ec(
    l1: DataFrame,
    calibrations: dict[str, tuple[float, float]],
    *,
    ec_pattern: str = r"EC\([0-9]+\)",
    transform: bool = True,
) -> dict[str, F.Column]:
    """J1 (wide form) — per-sensor linear calibration ``m*(1-x)+c`` with
    fallback to the mean coefficients on a missing sensor
    (``fs_pp.py:570-608``).

    ``calibrations``: ``{column_name: (m, c)}`` — a broadcast-sized dim
    (<=16 sensors/chain) folded into literal column expressions: zero
    shuffle, fully codegen'd. The long-form broadcast-join variant lives in
    ``operators.joins.calibration_join`` (used by the oracle-checked
    ``j1_calibration_fallback`` query).

    Returns ``{column: calibrated expr}`` for ``withColumns``.
    """
    import re

    pat = re.compile(ec_pattern)
    avg_m = sum(m for m, _ in calibrations.values()) / len(calibrations)
    avg_c = sum(c for _, c in calibrations.values()) / len(calibrations)
    out: dict[str, F.Column] = {}
    for col in l1.columns:
        if not pat.fullmatch(col):
            continue
        m, c = calibrations.get(col, (avg_m, avg_c))
        x = (F.lit(1.0) - F.col(col)) if transform else F.col(col)
        out[col] = F.lit(float(m)) * x + F.lit(float(c))
    return out


def load_level1_csv(
    spark: SparkSession, path: str, *, t: str = TIME
) -> DataFrame:
    """S4 — re-read a written L1 CSV (``fs_pp.py:168-183``): header row,
    inferred numeric dtypes, timestamp index column parsed."""
    df = spark.read.csv(
        path,
        header=True,
        inferSchema=True,
        nullValue="",
        timestampFormat="yyyy-MM-dd HH:mm:ss",
    )
    if dict(df.dtypes).get(t) == "string":
        df = df.withColumn(t, F.to_timestamp(t, "yyyy-MM-dd HH:mm:ss"))
    return df


def load_position_csv(spark: SparkSession, path: str) -> list[float]:
    """S7 — 1-column position CSV -> driver-side vector (the reference's
    ``pd.read_csv(...).squeeze()``, ``bin/fs_process_l2.py:151``)."""
    df = spark.read.csv(path, header=True, inferSchema=True)
    col = df.columns[-1]
    return [float(r[col]) for r in df.collect()]


def load_calibrations(spark: SparkSession, path: str) -> dict[str, tuple[float, float]]:
    """S5 — calibration-coefficients scan: CSV ``(sensor, m, c, r2)`` ->
    driver dict (broadcast-sized dim; ``fs_pp.py:597-603``)."""
    rows = (
        spark.read.csv(path, header=True, inferSchema=True)
        .select(F.col("_c0").alias("sensor"), "m", "c")
        .collect()
    )
    return {r["sensor"]: (float(r["m"]), float(r["c"])) for r in rows}


# --------------------------------------------------------------------------- #
# Level-1 -> Level-2
# --------------------------------------------------------------------------- #


def level1_to_level2(
    l1: DataFrame,
    cfg: SiteConfig,
    calibrations: dict[str, tuple[float, float]] | None = None,
    *,
    valid_ranges: dict[str, tuple[float, float]] = DEFAULT_VALID_RANGES,
    rename_mapping: Sequence[tuple[str, str]] = DEFAULT_L2_RENAME,
    t: str = TIME,
) -> DataFrame:
    """L1 -> L2 (``fs_pp.py:263-299``): validity nulling -> column drops ->
    regex rename -> UDG normalize+filter -> calibrated EC overwrite -> dedup.

    One lazy lineage except the O(#events)+O(1) driver scalars documented on
    :func:`normalise_udg` / :func:`filter_udg`. The UDG series re-enters by
    an equi-join on time (the reference's index-aligned column assign, J5) —
    broadcast-sized for a single station, shuffle-on-time for a fleet.
    """
    # P7 — validity BEFORE rename: EC ranges apply to raw millivolts
    bounded = null_out_of_range(l1, valid_ranges)

    # UDG chain runs on the validity-bounded L1 (reference order, :271-287)
    udg_col = cfg.udg_key
    norm = normalise_udg(bounded, udg_col=udg_col, events=cfg.udg_height_changes, t=t)
    udg_l2 = filter_udg(bounded, udg=norm, udg_col=udg_col, t=t)

    # EC calibration on bounded mV (reference :291)
    ec_exprs = (
        calibrate_ec(bounded, calibrations) if calibrations else {}
    )

    level2 = bounded.drop(*cfg.remove_columns)
    level2 = level2.withColumns(ec_exprs) if ec_exprs else level2
    rename = build_l2_rename(level2.columns, rename_mapping)
    level2 = rename_columns(level2, rename)

    # J5: overwrite the renamed UDG column with the normalized+filtered series
    udg_l2_name = rename.get(udg_col, udg_col)
    level2 = (
        level2.drop(udg_l2_name)
        .join(
            udg_l2.select(t, F.col(udg_col).alias(udg_l2_name)),
            on=t,
            how="left",
        )
    )
    # P2 final dedup (keep-first determinism not needed: L2 rows are unique
    # by time already; plain dropDuplicates matches the reference)
    return level2.dropDuplicates()


# --------------------------------------------------------------------------- #
# Depth products (R3 + W8)
# --------------------------------------------------------------------------- #


def chain_installation_depths(
    positions_mm: Sequence[float], first_sensor: int, depth: float
) -> dict[int, float]:
    """R3 ⊙ — chain geometry -> per-sensor install depth (``fs_pp.py:427-449``).

    ``positions_mm``: positive millimetres along the chain (S6/S7 output).
    ``first_sensor``: 1-based id of the sensor whose depth was measured.
    ``depth``: that sensor's depth, negative below surface, metres.

    Driver-side (chain length <= dozens); emits the sensor dimension table
    joined against long-form chain data (J6).
    """
    metres = [p * 1e-3 * -1 for p in positions_mm]
    ref = metres[first_sensor - 1]
    return {i + 1: m - ref + depth for i, m in enumerate(metres)}


def calc_depth_tdr(
    udg: DataFrame,
    install_date,
    install_depth: float,
    *,
    udg_col: str = "TCDT",
    t: str = TIME,
    out_col: str = "depth",
) -> DataFrame:
    """W8 — time-varying TDR burial depth with melt-out ratchet
    (``fs_pp.py:611-644``).

    Reference semantics: normalize UDG to its first reading at/after the
    install date, then walk the series with a mutable offset that resets
    when the sensor melts out. Implemented via the verified closed form
    (SURVEY §2.7 W8): ``D_t = min(0, u_t - max(-d0, cummax(u)_t))`` over the
    normalized series ``u`` — one running-max window, no sequential state.

    ``udg`` is a ``(t, udg_col)`` series (typically L2-filtered). Returns
    ``(t, out_col)`` from the install date onward.
    """
    date = _to_ts(install_date)
    after = udg.filter(F.col(t) >= F.lit(date)).filter(F.col(udg_col).isNotNull())
    first_row = after.orderBy(t).limit(1).collect()
    if not first_row:
        raise ValueError(f"no UDG data at/after install date {date}")
    udg_at_install = float(first_row[0][udg_col])
    norm = after.select(t, (F.col(udg_col) - F.lit(udg_at_install)).alias("__u"))
    return norm.select(
        t, ratchet_depth("__u", t, float(install_depth)).alias(out_col)
    )
