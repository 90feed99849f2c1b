"""TOA5 ingest + reference-parity L0->L1->L2 pipeline tests.

Synthetic TOA5 fixture (shaped per FIXTURES.md §1, generated here — nothing
read from the reference repo) with deliberate mess: exact duplicate rows
across bales, a conflicting duplicate timestamp, an all-null column,
out-of-range values, bad/missing quality flags, a UDG spike, and an
unlogged height-change step. Differential checks against short pandas
re-implementations of the reference semantics where the math is nontrivial
(UDG despike filter, ratchet depth).
"""

from __future__ import annotations

import datetime as dt
import textwrap

import numpy as np
import pandas as pd
import pytest

from cassandra_fs_pp_spark.config import load_config
from cassandra_fs_pp_spark.plans.levels import (
    calc_depth_tdr,
    chain_installation_depths,
    filter_udg,
    level0_to_level1,
    level1_to_level2,
    load_calibrations,
    normalise_udg,
)
from cassandra_fs_pp_spark.sinks import encode_fixed_point
from cassandra_fs_pp_spark.sources.toa5 import (
    read_toa5,
    read_toa5_header,
    read_toa5_positions,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
FREQ = dt.timedelta(minutes=15)
N = 241  # through 2024-01-03 12:00
EVENT = dt.datetime(2024, 1, 2, 12, 0, 0)  # index 144: unlogged UDG step
SPIKE_I = 50  # TCDT=5.0 for one sample
BADQ_I = 60  # Q=300 -> UDG dropped
NULLQ_I = (70, 71, 72)  # Q=NAN -> treated as 150, kept

COLS = [
    "TIMESTAMP", "RECORD", "BattV_Min", "PTemp_C_Min", "T107_C", "TCDT", "Q",
    "DT", "TDR1_VWC", "TDR1_T", "TDR2_VWC", "TDR2_T", "EC(1)", "EC(2)",
    "DTC1(1)", "DTC1(2)", "Dead",
]


def _row(i: int, record: int) -> list[str]:
    t = T0 + i * FREQ
    tcdt = 5.0 if i == SPIKE_I else (2.00 if t < EVENT else 1.76)
    q = "300" if i == BADQ_I else ("NAN" if i in NULLQ_I else "180")
    t107 = "50.0" if i == 40 else "-20.5"  # index 40: out of [-50, 10]
    return [
        f'"{t:%Y-%m-%d %H:%M:%S}"', str(record), "13.04", "-19.0", t107,
        f"{tcdt}", q, "0.1", "0.35", "-14.0", "0.40", "-13.5",
        "0.9", "0.8", "-10.0", "-11.0", "NAN",
    ]


def _toa5_file(path, rows: list[list[str]], names=COLS) -> None:
    quoted = ",".join(f'"{c}"' for c in names)
    units = ",".join(['"TS"', '"RN"'] + ['"unit"'] * (len(names) - 2))
    aggs = ",".join(['""', '""'] + ['"Smp"'] * (len(names) - 2))
    body = "\n".join(",".join(r) for r in rows)
    path.write_text(
        f'"TOA5","TESTFS","CR800","1234","CR800.Std","CPU:x.CR8","5678","Main"\n'
        f"{quoted}\n{units}\n{aggs}\n{body}\n"
    )


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    """A full synthetic site: 2 bales + serviced file + config + dims."""
    root = tmp_path_factory.mktemp("site")
    ds = root / "fielddata"
    ds.mkdir()
    # bale 1: rows 0..99 | bale 2: rows 96..199 (4 exact dups) + one
    # conflicting duplicate timestamp (index 95, different battv+record)
    _toa5_file(ds / "MainTable1.dat", [_row(i, i) for i in range(0, 100)])
    conflict = _row(95, 500)
    conflict[2] = "99.0"
    _toa5_file(
        ds / "MainTable2.dat",
        [_row(i, i) for i in range(96, 200)] + [conflict],
    )
    serviced = ds / "serviced"
    serviced.mkdir()
    _toa5_file(serviced / "MainTable9.dat", [_row(i, i) for i in range(200, N)])

    pos = root / "DTC1_Diag.dat"
    _toa5_file(
        pos,
        [['"2024-01-01 00:00:00"', "0", "0", "150", "300", "450"]],
        names=["TIMESTAMP", "RECORD", "P(1)", "P(2)", "P(3)", "P(4)"],
    )
    (root / "cal.csv").write_text(
        ",m,c,r2\nEC(1),2.0,0.1,0.99\nEC(3),4.0,0.3,0.98\n"
    )
    cfg_file = root / "site.toml"
    cfg_file.write_text(
        textwrap.dedent(
            """\
            site="TESTFS"
            tz='UTC'
            [level0_1]
            index_col='TIMESTAMP'
            udg_key='TCDT'
            [level1_2]
            udg_height_change=[[2024-01-01, 2.00], [2024-01-02T12:00:00]]
            remove_columns=["RECORD", "PTemp_C_Min", "DT"]
            [level1_2.tdr_info]
            1=[2024-01-01,-0.48,false]
            [level0]
            [level0.fielddata]
            subpath=""
            type="bales"
            bales_start=1
            bales_stop=2
            """
        )
    )
    return root


@pytest.fixture(scope="module")
def l1(spark, site):
    cfg = load_config(str(site / "site.toml"))
    return level0_to_level1(spark, cfg, str(site)).cache()


def pandas_frame(n=N):
    """The same synthetic series as a pandas frame (dedup'd ground truth)."""
    idx = pd.date_range(T0, periods=n, freq="15min")
    tcdt = np.where(
        np.arange(n) == SPIKE_I, 5.0, np.where(idx < EVENT, 2.00, 1.76)
    )
    q = np.where(
        np.isin(np.arange(n), NULLQ_I), np.nan,
        np.where(np.arange(n) == BADQ_I, 300.0, 180.0),
    )
    return pd.DataFrame({"TCDT": tcdt, "Q": q}, index=idx)


# --------------------------------------------------------------------------- #
# reader
# --------------------------------------------------------------------------- #


def test_toa5_header_and_schema(spark, site):
    hdr = read_toa5_header(str(site / "fielddata" / "MainTable1.dat"))
    assert hdr.names[:2] == ("TIMESTAMP", "RECORD")
    assert hdr.units_map["TIMESTAMP"] == "TS"
    df = read_toa5(spark, str(site / "fielddata" / "MainTable1.dat"))
    assert df.schema["TIMESTAMP"].dataType.typeName() == "timestamp"
    assert df.schema["RECORD"].dataType.typeName() == "long"
    assert df.schema["TCDT"].dataType.typeName() == "double"
    assert df.count() == 100
    # NAN sentinel -> null (Dead is all-NAN)
    assert df.where(df["Dead"].isNotNull()).count() == 0


def test_toa5_positions(spark, site):
    pos = read_toa5_positions(spark, str(site / "DTC1_Diag.dat"))
    assert pos == [0.0, 150.0, 300.0, 450.0]


# --------------------------------------------------------------------------- #
# L0 -> L1
# --------------------------------------------------------------------------- #


def test_level0_to_level1_dedup(l1):
    # 100 + 105 + 41 raw rows -> N distinct timestamps
    assert l1.count() == N
    assert l1.select("TIMESTAMP").distinct().count() == N
    # keep-first: the conflicting duplicate (battv 99.0, file 2) lost to file 1
    i95 = l1.where(l1["TIMESTAMP"] == T0 + 95 * FREQ).collect()[0]
    assert i95["BattV_Min"] == pytest.approx(13.04)
    assert i95["RECORD"] == 95


def test_level0_to_level1_prunes_all_null(l1):
    assert "Dead" not in l1.columns
    assert "TCDT" in l1.columns


# --------------------------------------------------------------------------- #
# UDG normalize + filter (differential vs pandas reference semantics)
# --------------------------------------------------------------------------- #


def test_normalise_udg_auto_step(l1, site):
    cfg = load_config(str(site / "site.toml"))
    norm = normalise_udg(l1, events=cfg.udg_height_changes).orderBy("TIMESTAMP")
    rows = norm.collect()
    # zeroed at install height, and the auto-detected -0.24 step re-zeroes
    assert rows[0]["TCDT"] == pytest.approx(0.0, abs=1e-9)
    assert rows[-1]["TCDT"] == pytest.approx(0.0, abs=1e-9)
    # spike survives normalization (filtering is a separate stage)
    assert max(r["TCDT"] for r in rows) == pytest.approx(3.0)


def test_filter_udg_matches_pandas(spark, l1):
    out = filter_udg(l1).orderBy("TIMESTAMP").toPandas().set_index("TIMESTAMP")

    pdf = pandas_frame()
    q = np.where(np.isnan(pdf["Q"]), 150, pdf["Q"])
    udg = pdf["TCDT"].where(q >= 150).where(q <= 210)
    freq = pd.DataFrame(udg.index[1:] - udg.index[:-1]).mode().iloc[0, 0]
    udg_reg = udg.resample(freq).ffill(limit=3)
    med = udg_reg.rolling("2D").median()
    filt = udg_reg.where(np.abs(med - udg_reg) < 0.5)
    expected = filt[udg.index]

    assert len(out) == N
    got = out["TCDT"].reindex(expected.index)
    assert (got.isna() == expected.isna()).all()
    mask = ~expected.isna()
    assert np.allclose(got[mask], expected[mask])
    # the spike itself must be gone
    assert np.isnan(got.loc[T0 + SPIKE_I * FREQ])


# --------------------------------------------------------------------------- #
# L1 -> L2 end-to-end
# --------------------------------------------------------------------------- #


def test_level1_to_level2(spark, l1, site):
    cfg = load_config(str(site / "site.toml"))
    cal = load_calibrations(spark, str(site / "cal.csv"))
    assert cal == {"EC(1)": (2.0, 0.1), "EC(3)": (4.0, 0.3)}

    l2 = level1_to_level2(l1, cfg, cal).cache()
    assert l2.count() == N
    # P4 drops + P6 renames
    for gone in ("RECORD", "PTemp_C_Min", "DT"):
        assert gone not in l2.columns
    for c in ("TCDT(m)", "TDR1_VWC(m3/m3)", "TDR2_T(C)", "DTC1_1(C)", "DTC1_2(C)"):
        assert c in l2.columns

    first = l2.orderBy("TIMESTAMP").limit(1).collect()[0]
    # J1: EC(1) has own coefficients 2*(1-0.9)+0.1; EC(2) falls back to the
    # mean of (2,4)/(0.1,0.3): 3*(1-0.8)+0.2
    assert first["EC(1)"] == pytest.approx(0.3)
    assert first["EC(2)"] == pytest.approx(0.8)
    # UDG normalized to ~0 and despiked
    assert first["TCDT(m)"] == pytest.approx(0.0, abs=1e-9)
    assert (
        l2.where(l2["TIMESTAMP"] == T0 + SPIKE_I * FREQ).collect()[0]["TCDT(m)"]
        is None
    )
    # P7: out-of-range T107_C nulled
    assert (
        l2.where(l2["TIMESTAMP"] == T0 + 40 * FREQ).collect()[0]["T107_C"] is None
    )


# --------------------------------------------------------------------------- #
# depth products
# --------------------------------------------------------------------------- #


def test_chain_installation_depths():
    d = chain_installation_depths([0, 150, 300, 450], first_sensor=1, depth=-0.17)
    assert d == pytest.approx({1: -0.17, 2: -0.32, 3: -0.47, 4: -0.62})


def test_calc_depth_tdr_matches_reference_loop(spark):
    rng = np.random.default_rng(7)
    n = 400
    idx = pd.date_range("2024-06-01", periods=n, freq="h")
    # noisy melt season: mostly rising udg (surface lowering) with dips
    udg = pd.Series(np.cumsum(rng.normal(0.004, 0.02, n)) + 2.0, index=idx)

    install_depth = -0.25
    # reference sequential semantics (fs_pp.py:636-641), re-stated
    u = udg - udg.iloc[0]
    offset = install_depth
    expected = []
    for ut in u:
        dt_ = min(0.0, ut + offset)
        if dt_ == 0.0:
            offset = -ut
        expected.append(dt_)

    sdf = spark.createDataFrame(
        pd.DataFrame({"TIMESTAMP": idx, "TCDT": udg.values})
    )
    got = (
        calc_depth_tdr(sdf, idx[0].to_pydatetime(), install_depth)
        .orderBy("TIMESTAMP")
        .toPandas()["depth"]
        .to_numpy()
    )
    assert np.allclose(got, np.array(expected), atol=1e-12)


# --------------------------------------------------------------------------- #
# sinks
# --------------------------------------------------------------------------- #


def test_encode_fixed_point(spark):
    df = spark.createDataFrame(
        [(1.2345, None), (None, 2.0)], "a double, b double"
    )
    rows = encode_fixed_point(df).collect()
    vals = {(r["a"], r["b"]) for r in rows}
    assert vals == {(1234, -9999), (-9999, 2000)}


# --------------------------------------------------------------------------- #
# S12 BeadedStream CSV variant
# --------------------------------------------------------------------------- #


def test_beadedstream_csv(spark, tmp_path):
    from cassandra_fs_pp_spark.sources.toa5 import read_beadedstream_csv

    f = tmp_path / "dtc.csv"
    f.write_text(
        "exported by beadedstream v2\n"
        "TIMESTAMP,0.05 m,0.35 m,0.65 m\n"
        "2022-04-01 00:00:00,-8.0,-9.5,NAN\n"
        "2022-04-01 01:00:00,-7.9,-9.4,-10.1\n"
    )
    df = read_beadedstream_csv(spark, str(f), skiprows=1)
    assert df.columns == ["TIMESTAMP", "0.05 m", "0.35 m", "0.65 m"]
    rows = df.orderBy("TIMESTAMP").collect()
    assert len(rows) == 2
    assert rows[0]["0.05 m"] == -8.0
    assert rows[0]["0.65 m"] is None
    assert df.schema["TIMESTAMP"].dataType.typeName() == "timestamp"


def test_l1_csv_roundtrip(spark, l1, tmp_path):
    """K1 write -> S4 re-read preserves rows, columns, timestamps."""
    from cassandra_fs_pp_spark.plans.levels import load_level1_csv
    from cassandra_fs_pp_spark.sinks import write_csv_single

    out = str(tmp_path / "l1csv")
    write_csv_single(l1, out)
    back = load_level1_csv(spark, out)
    assert back.count() == l1.count()
    assert set(back.columns) == set(l1.columns)
    assert back.schema["TIMESTAMP"].dataType.typeName() == "timestamp"
    a = l1.orderBy("TIMESTAMP").select("TIMESTAMP", "TCDT").collect()
    b = back.orderBy("TIMESTAMP").select("TIMESTAMP", "TCDT").collect()
    assert a == b


def test_load_position_csv(spark, tmp_path):
    from cassandra_fs_pp_spark.plans.levels import load_position_csv

    f = tmp_path / "ec.csv"
    f.write_text("depth_m\n0.05\n0.35\n0.65\n")
    assert load_position_csv(spark, str(f)) == [0.05, 0.35, 0.65]


def test_filter_udg_fleet_partitioned(spark):
    """Fleet mode: filter_udg(partition_by=['site']) despikes each site's
    series on its own dominant grid, matching per-site pandas."""
    import numpy as np
    import pandas as pd

    from cassandra_fs_pp_spark.plans.levels import filter_udg

    frames = []
    pandas_truth = {}
    for site, freq_min, spike_i in (("A", 15, 30), ("B", 60, 40)):
        idx = pd.date_range("2024-01-01", periods=120, freq=f"{freq_min}min")
        tcdt = np.full(120, 2.0)
        tcdt[spike_i] = 9.0
        q = np.full(120, 180.0)
        q[10] = 300.0  # gated out
        frames.append(
            pd.DataFrame(
                {"site": site, "TIMESTAMP": idx, "TCDT": tcdt, "Q": q}
            )
        )
        s = pd.Series(tcdt, index=idx)
        s = s.where((q >= 150) & (q <= 210))
        reg = s.resample(f"{freq_min}min").ffill(limit=3)
        med = reg.rolling("2D").median()
        filt = reg.where((med - reg).abs() < 0.5)
        pandas_truth[site] = filt[s.index]

    sdf = spark.createDataFrame(pd.concat(frames))
    out = (
        filter_udg(sdf, partition_by=["site"])
        .orderBy("site", "TIMESTAMP")
        .toPandas()
    )
    for site in ("A", "B"):
        got = out[out["site"] == site].set_index("TIMESTAMP")["TCDT"]
        want = pandas_truth[site]
        assert (got.isna().to_numpy() == want.isna().to_numpy()).all()
        m = ~want.isna().to_numpy()
        assert np.allclose(got.to_numpy()[m], want.to_numpy()[m])


def test_engine_facade_and_cli(spark, site, tmp_path):
    """SiteEngine drives L0->L1->L2 end-to-end; the CLI twins run both
    stages against the same synthetic site."""
    from cassandra_fs_pp_spark.cli import main as cli_main
    from cassandra_fs_pp_spark.engine import SiteEngine

    eng = SiteEngine(spark, str(site / "site.toml"), str(site))
    l1 = eng.level0_to_level1()
    assert l1.count() == N
    l1_path = str(tmp_path / "l1out")
    eng.write_l1(l1, l1_path)
    back = eng.load_level1(l1_path)
    cal = eng.load_calibrations(str(site / "cal.csv"))
    l2 = eng.level1_to_level2(back, cal)
    assert "TCDT(m)" in l2.columns and l2.count() == N
    assert eng.chain_depths([0, 150], 1, -0.17)[2] == pytest.approx(-0.32)

    # CLI: l1 (with overwrite guard) then l2
    out1 = str(tmp_path / "cli_l1")
    assert cli_main(["l1", str(site / "site.toml"), str(site), "-o", out1]) == 0
    assert cli_main(["l1", str(site / "site.toml"), str(site), "-o", out1]) == 1
    out2 = str(tmp_path / "cli_l2")
    nc = str(tmp_path / "cli_l2.nc")
    assert (
        cli_main(
            ["l2", str(site / "site.toml"), str(site), "--l1", out1,
             "-o", out2, "--calibration", str(site / "cal.csv"),
             "--netcdf", nc]
        )
        == 0
    )
    l2cli = spark.read.csv(out2, header=True, inferSchema=True)
    assert l2cli.count() == N

    # --netcdf now writes a REAL classic .nc (built-in writer, no xarray):
    # scan it back (S11) and cross-check a value against the CSV export
    from cassandra_fs_pp_spark.sources.netcdf import load_netcdf

    nc_df = load_netcdf(spark, nc, time_col="TIMESTAMP")
    assert nc_df.count() == N
    a = l2cli.orderBy("TIMESTAMP").select("TCDT(m)").limit(5).collect()
    b = nc_df.orderBy("TIMESTAMP").select("TCDT(m)").limit(5).collect()
    for ra, rb in zip(a, b):
        va, vb = ra["TCDT(m)"], rb["TCDT(m)"]
        if va is None:
            assert vb is None
        else:
            assert vb == pytest.approx(va, abs=0.0005)


def test_toa5_malformed_rows_tolerated(spark, tmp_path):
    """Ragged data rows (fields missing or extra — logger glitches /
    truncated radio transfers): short rows null-fill the tail, long rows
    drop the surplus, the file keeps loading (PERMISSIVE parse — the
    reference's pandas read would need error_bad_lines handling)."""
    f = tmp_path / "glitch.dat"
    f.write_text(
        '"TOA5","FS1","CR1000X","1","prog","sig","t1","MainTable"\n'
        '"TIMESTAMP","RECORD","BattV","T107"\n'
        '"TS","RN","Volts","Deg C"\n'
        '"","","Min","Smp"\n'
        '"2024-01-01 00:00:00",1,13.1,-20.5\n'
        '"2024-01-01 00:15:00",2,13.0\n'              # short row
        '"2024-01-01 00:30:00",3,12.9,-20.1,99.9\n'   # extra field
        '"2024-01-01 00:45:00",4,NAN,-19.8\n'
    )
    df = read_toa5(spark, str(f), with_provenance=False)
    rows = {r["RECORD"]: r for r in df.orderBy("TIMESTAMP").collect()}
    assert len(rows) == 4
    assert rows[2]["T107"] is None          # short row null-filled
    assert rows[3]["T107"] == -20.1         # surplus field dropped
    assert rows[4]["BattV"] is None         # NAN sentinel
    assert df.columns == ["TIMESTAMP", "RECORD", "BattV", "T107"]
