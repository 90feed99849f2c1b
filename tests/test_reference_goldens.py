"""Reference-parity goldens (SURVEY §5, FIXTURES.md §1-4).

Rebuilds the reference test fixture's SHAPE synthetically — 217 rows of
15-min TOA5 data spanning 2021-04-30 18:00 -> 2021-05-03 00:00, UDG
install height 2.06, an unlogged height change at 2021-05-02 22:00 with
auto-detected step ~-0.24, DTC/EC chains at 0..1650 mm — and asserts the
same golden values the reference's own pytest suite hard-codes
(tests/test_fs_pp.py:38-104): span days, position 1650, renames, UDG ~0 at
both ends, EC(1) calibrated ~0, install depths -0.17/-0.32 and -0.16/-0.31.
"""

from __future__ import annotations

import datetime as dt
import textwrap

import pytest
from pyspark.sql import functions as F

from cassandra_fs_pp_spark.config import load_config
from cassandra_fs_pp_spark.plans.levels import (
    chain_installation_depths,
    level0_to_level1,
    level1_to_level2,
    load_calibrations,
)
from cassandra_fs_pp_spark.sources.toa5 import read_toa5_positions
from tests.test_toa5_pipeline import _toa5_file

T0 = dt.datetime(2021, 4, 30, 18, 0, 0)
STEP_AT = dt.datetime(2021, 5, 2, 22, 0, 0)
FREQ = dt.timedelta(minutes=15)
N = 217

COLS = ["TIMESTAMP", "RECORD", "TCDT", "Q", "TDR1_VWC", "EC(1)",
        "DTC1(1)", "DTC1(2)"]


def _row(i: int) -> list[str]:
    t = T0 + i * FREQ
    tcdt = 2.069 if i == 0 else (2.05 if t < STEP_AT else 1.81)
    return [f'"{t:%Y-%m-%d %H:%M:%S}"', str(i), f"{tcdt}", "180",
            "0.35", "0.9", "-10.0", "-11.0"]


@pytest.fixture(scope="module")
def golden_site(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden")
    ds = root / "fielddata"
    ds.mkdir()
    third = N // 3
    _toa5_file(ds / "MainTable1.dat", [_row(i) for i in range(third)], COLS)
    _toa5_file(ds / "MainTable2.dat", [_row(i) for i in range(third, 2 * third)], COLS)
    _toa5_file(ds / "MainTable3.dat", [_row(i) for i in range(2 * third, N)], COLS)

    pos_names = ["TIMESTAMP", "RECORD"] + [f"P({j})" for j in range(1, 13)]
    pos_row = ['"2021-04-30 18:00:00"', "0"] + [str(150 * j) for j in range(12)]
    _toa5_file(root / "DTC1_Diag.dat", [pos_row], pos_names)

    # EC(1) calibrated = m*(1-0.9)+c = 2.0*0.1 - 0.2 = 0  (reference golden:
    # example calibration maps the fixture EC value to ~0)
    (root / "cal.csv").write_text(",m,c,r2\nEC(1),2.0,-0.2,0.99\n")

    cfg = root / "site.toml"
    cfg.write_text(textwrap.dedent("""\
        site="GOLDEN"
        tz='UTC'
        [level0_1]
        index_col='TIMESTAMP'
        udg_key='TCDT'
        [level1_2]
        udg_height_change=[[2021-04-30, 2.06], [2021-05-02T22:00:00]]
        remove_columns=["RECORD"]
        [level0]
        [level0.fielddata]
        subpath=""
        type="bales"
        bales_start=1
        bales_stop=3
        """))
    return root


@pytest.fixture(scope="module")
def golden_l1(spark, golden_site):
    cfg = load_config(str(golden_site / "site.toml"))
    return level0_to_level1(spark, cfg, str(golden_site)).cache()


def test_golden_span_and_count(golden_l1):
    # reference: 217 records, index days 30 -> 3 (test_fs_pp.py:38-40)
    assert golden_l1.count() == 217
    lo, hi = golden_l1.agg(
        F.min("TIMESTAMP"), F.max("TIMESTAMP")
    ).collect()[0]
    assert (lo.day, lo.month) == (30, 4)
    assert (hi.day, hi.month) == (3, 5)


def test_golden_position_1650(spark, golden_site):
    # reference: last chain position ~1650 mm (test_fs_pp.py:46-48)
    pos = read_toa5_positions(spark, str(golden_site / "DTC1_Diag.dat"))
    assert pos[-1] == pytest.approx(1650.0)
    assert pos[:3] == [0.0, 150.0, 300.0]


def test_golden_l2(spark, golden_l1, golden_site):
    cfg = load_config(str(golden_site / "site.toml"))
    cal = load_calibrations(spark, str(golden_site / "cal.csv"))
    l2 = level1_to_level2(golden_l1, cfg, cal).cache()

    # renames (test_fs_pp.py:50-56)
    for c in ("DTC1_1(C)", "DTC1_2(C)", "TDR1_VWC(m3/m3)", "TCDT(m)"):
        assert c in l2.columns

    rows = l2.orderBy("TIMESTAMP").collect()
    # UDG normalizes to ~0 at both ends (test_fs_pp.py:58-64): first reading
    # 2.069 - 2.06 install height; last 1.81 + 0.24 auto step - 2.06
    assert abs(rows[0]["TCDT(m)"]) < 0.015
    assert abs(rows[-1]["TCDT(m)"]) < 0.015
    # auto-detected step ~ -0.24 (FIXTURES.md §1): interior post-step values
    # re-zeroed, so max |TCDT(m)| over the series stays tiny
    assert max(abs(r["TCDT(m)"]) for r in rows if r["TCDT(m)"] is not None) < 0.02
    # calibrated EC(1) ~ 0 (test_fs_pp.py:79-81)
    assert rows[0]["EC(1)"] == pytest.approx(0.0, abs=1e-9)


def test_golden_install_depths():
    # reference: DTC depths -0.17/-0.32, EC depths -0.16/-0.31
    # (test_fs_pp.py:83-99)
    pos_mm = [150.0 * j for j in range(12)]
    dtc = chain_installation_depths(pos_mm, first_sensor=1, depth=-0.17)
    assert dtc[1] == pytest.approx(-0.17)
    assert dtc[2] == pytest.approx(-0.32)
    ec = chain_installation_depths(pos_mm, first_sensor=1, depth=-0.16)
    assert ec[1] == pytest.approx(-0.16)
    assert ec[2] == pytest.approx(-0.31)
