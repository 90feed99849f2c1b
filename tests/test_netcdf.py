"""K3 NetCDF export — end-to-end file write + re-read (SURVEY §2.2 K3/K6).

The reference writes L2 products with xarray
(``bin/fs_process_l2.py:177-204``) using encoding int32 / scale_factor
0.001 / _FillValue -9999 (``:196-200``) and ``time`` as the unlimited
dim. These tests exercise the engine's pure-python classic-NetCDF
writer against its reader AND against byte-level format invariants
(magic number, record-dim layout), so the actual ``.nc`` write path is
executed — not just the encode arithmetic.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pytest

from cassandra_fs_pp_spark.netcdf3 import (
    Nc3Variable,
    read_netcdf3,
    write_netcdf3,
)
from cassandra_fs_pp_spark.sinks import (
    FILL_VALUE,
    SCALE_FACTOR,
    encode_fixed_point,
    to_netcdf,
    to_netcdf_long,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_netcdf3_writer_reader_roundtrip(tmp_path):
    """Raw format round-trip: fixed var, 1-D + 2-D record vars, attrs."""
    path = str(tmp_path / "raw.nc")
    depth = np.array([0.05, 0.35, 0.65], dtype="float64")
    temp = np.arange(12, dtype="int32").reshape(4, 3)
    tvals = np.array([0.0, 3600.0, 7200.0, 10800.0], dtype="float64")
    write_netcdf3(
        path,
        {"time": None, "sensor": 3},
        [
            Nc3Variable("time", ("time",), tvals, {"units": "s"}),
            Nc3Variable("depth", ("sensor",), depth, {"positive": "down"}),
            Nc3Variable(
                "temp", ("time", "sensor"), temp,
                {"scale_factor": 0.001, "_FillValue": -9999},
            ),
        ],
        {"site": "FS_TEST", "rev": 2},
    )
    with open(path, "rb") as f:
        assert f.read(4) == b"CDF\x01"  # classic CDF-1 magic
    dims, gattrs, varlist = read_netcdf3(path)
    assert dims == {"time": None, "sensor": 3}
    assert gattrs["site"] == "FS_TEST" and gattrs["rev"] == 2
    v = {x.name: x for x in varlist}
    assert v["time"].dims == ("time",) and v["time"].data.shape == (4,)
    np.testing.assert_array_equal(v["time"].data, tvals)
    np.testing.assert_array_equal(v["depth"].data, depth)
    assert v["depth"].attrs["positive"] == "down"
    assert v["temp"].dims == ("time", "sensor")
    assert v["temp"].data.dtype == np.dtype(">i4") or v["temp"].data.dtype == np.dtype("int32")
    np.testing.assert_array_equal(v["temp"].data.astype("int32"), temp)
    assert v["temp"].attrs["_FillValue"] == -9999
    assert v["temp"].attrs["scale_factor"] == 0.001


def test_netcdf3_cdf2_roundtrip(tmp_path):
    """CDF-2 ("64-bit offset") variant: magic byte 2, 8-byte begin fields.

    Guards the reader's version branch — a CDF-2 file parsed with 32-bit
    begin offsets would misalign every data slab (ADVICE r2: netcdf3.py
    accepted version byte 2 but always unpacked '>iii')."""
    path = str(tmp_path / "v2.nc")
    depth = np.array([0.05, 0.35, 0.65], dtype="float64")
    temp = np.arange(12, dtype="int32").reshape(4, 3)
    tvals = np.array([0.0, 3600.0, 7200.0, 10800.0], dtype="float64")
    write_netcdf3(
        path,
        {"time": None, "sensor": 3},
        [
            Nc3Variable("time", ("time",), tvals, {"units": "s"}),
            Nc3Variable("depth", ("sensor",), depth),
            Nc3Variable("temp", ("time", "sensor"), temp),
        ],
        {"site": "FS_TEST"},
        version=2,
    )
    with open(path, "rb") as f:
        assert f.read(4) == b"CDF\x02"
    dims, gattrs, varlist = read_netcdf3(path)
    assert dims == {"time": None, "sensor": 3}
    v = {x.name: x for x in varlist}
    np.testing.assert_array_equal(v["time"].data, tvals)
    np.testing.assert_array_equal(v["depth"].data, depth)
    np.testing.assert_array_equal(v["temp"].data.astype("int32"), temp)


def test_netcdf3_single_short_record_var_unpadded(tmp_path):
    """Spec special case: a LONE byte/char/short record variable is laid
    out with unpadded per-record slabs (Unidata classic spec, vsize note).

    With one int16 record var over a 3-wide dim, each record is 6 bytes;
    padded layout would burn 8 bytes/record and external readers (which
    honor the spec) would read garbage from record 1 onward."""
    path = str(tmp_path / "short.nc")
    vals = np.arange(12, dtype="int16").reshape(4, 3)
    write_netcdf3(
        path,
        {"time": None, "sensor": 3},
        [Nc3Variable("v", ("time", "sensor"), vals)],
    )
    import os as _os

    # header + 4 records x 6 bytes, no per-record padding: file must be
    # exactly begin + 24 bytes (the padded layout would be begin + 32).
    import struct as _struct

    with open(path, "rb") as f:
        raw = f.read()
    # vsize field of the only variable must be the unpadded 6.
    # (find it by scanning: last 12 bytes of var metadata are type,vsize,begin)
    dims, _, varlist = read_netcdf3(path)
    np.testing.assert_array_equal(varlist[0].data.astype("int16"), vals)
    begin = len(raw) - 4 * 6  # 4 records x 6 bytes each, unpadded
    tail = raw[begin:]
    expect = vals.astype(">i2").tobytes()
    assert tail == expect, "record slabs must be contiguous/unpadded"
    # mixed case: ADD a second record var -> padding returns
    path2 = str(tmp_path / "short2.nc")
    write_netcdf3(
        path2,
        {"time": None, "sensor": 3},
        [
            Nc3Variable("v", ("time", "sensor"), vals),
            Nc3Variable("t", ("time",), np.arange(4, dtype="float64")),
        ],
    )
    _, _, varlist2 = read_netcdf3(path2)
    v2 = {x.name: x for x in varlist2}
    np.testing.assert_array_equal(v2["v"].data.astype("int16"), vals)
    np.testing.assert_array_equal(v2["t"].data, np.arange(4, dtype="float64"))


def test_to_netcdf_end_to_end(spark, tmp_path):
    """Spark L2-shaped frame -> real .nc on disk -> re-read: dims, attrs,
    int32/0.001/-9999 encoding, and value fidelity to half a scale step."""
    rows = [
        (T0 + i * dt.timedelta(hours=1),
         None if i == 3 else -19.0 + i * 0.125,
         1.76 + i * 0.001,
         i)
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, t107 double, tcdt double, q int"
    )
    path = str(tmp_path / "l2.nc")
    to_netcdf(
        df,
        path,
        global_attrs={"site": "FS1", "latitude": 66.18},
        var_attrs={"t107": {"units": "degC", "standard_name": "soil_temperature"}},
    )
    dims, gattrs, varlist = read_netcdf3(path)
    v = {x.name: x for x in varlist}

    assert dims["time"] is None  # unlimited record dim, like the reference
    assert gattrs["site"] == "FS1"
    assert gattrs["latitude"] == pytest.approx(66.18)
    assert gattrs["institution"] == "cassandra_fs_pp_spark"

    assert v["time"].attrs["units"].startswith("seconds since 1970-01-01")
    t_expected = np.array(
        [(T0 + i * dt.timedelta(hours=1)).timestamp() for i in range(6)]
    )
    np.testing.assert_allclose(v["time"].data.astype("float64"), t_expected)

    for c in ("t107", "tcdt"):
        assert v[c].data.astype("int32").dtype == np.dtype("int32")
        assert v[c].attrs["scale_factor"] == SCALE_FACTOR
        assert v[c].attrs["_FillValue"] == FILL_VALUE
    assert v["t107"].attrs["units"] == "degC"

    enc = v["t107"].data.astype("int32")
    assert enc[3] == FILL_VALUE  # null -> fill sentinel
    dec = enc.astype("float64") * SCALE_FACTOR
    orig = np.array([-19.0 + i * 0.125 for i in range(6)])
    mask = np.arange(6) != 3
    np.testing.assert_allclose(dec[mask], orig[mask], atol=SCALE_FACTOR / 2)

    # int column passes through un-scaled
    np.testing.assert_array_equal(
        v["q"].data.astype("int32"), np.arange(6, dtype="int32")
    )


def test_to_netcdf_matches_encode_fixed_point(spark, tmp_path):
    """The bytes on disk carry EXACTLY encode_fixed_point's arithmetic
    (same half-even rounding), so the .nc and parquet export paths agree."""
    vals = [0.0005, 0.0015, 1.2345, -2.7185, None, 42.0]
    rows = [(T0 + i * dt.timedelta(hours=1), vals[i]) for i in range(6)]
    df = spark.createDataFrame(rows, "time timestamp, x double")
    path = str(tmp_path / "enc.nc")
    to_netcdf(df, path)
    _, _, varlist = read_netcdf3(path)
    nc_ints = {x.name: x for x in varlist}["x"].data.astype("int32").tolist()
    spark_ints = [
        r["x"]
        for r in encode_fixed_point(df.select("x")).collect()
    ]
    assert sorted(nc_ints) == sorted(spark_ints)


def test_to_netcdf_long_2d_chain(spark, tmp_path):
    """Long (time, sensor, value) rows -> 2-D time x sensor record var
    with a per-sensor install-depth coordinate (reference
    ``bin/fs_process_l2.py:80-95`` subsurf DataArray shape)."""
    sensors = ["DTC1_1", "DTC1_2", "DTC1_3"]
    rows = [
        (T0 + i * dt.timedelta(hours=1), s, -10.0 - i - j * 0.5)
        for i in range(4)
        for j, s in enumerate(sensors)
    ]
    df = spark.createDataFrame(rows, "time timestamp, sensor_id string, value double")
    path = str(tmp_path / "chain.nc")
    to_netcdf_long(
        df,
        path,
        var_name="dtc_temp",
        sensor_coords={"install_depth": {"DTC1_1": -0.17, "DTC1_2": -0.32, "DTC1_3": -0.47}},
        var_attrs={"units": "degC"},
    )
    dims, _, varlist = read_netcdf3(path)
    v = {x.name: x for x in varlist}
    assert dims["sensor"] == 3 and dims["time"] is None
    assert v["dtc_temp"].dims == ("time", "sensor")
    assert v["dtc_temp"].data.shape == (4, 3)
    np.testing.assert_allclose(
        v["install_depth"].data.astype("float64"), [-0.17, -0.32, -0.47]
    )
    # decode cell (2, DTC1_2): -10 - 2 - 0.5 = -12.5
    got = v["dtc_temp"].data.astype("int32")[2, 1] * SCALE_FACTOR
    assert got == pytest.approx(-12.5, abs=SCALE_FACTOR / 2)
    names = [
        b"".join(row).decode().rstrip("\x00")
        for row in v["sensor_name"].data
    ]
    assert names == sensors


def test_s11_netcdf_scan_roundtrip(spark, tmp_path):
    """S11 — write an L2-shaped .nc, scan it back as a DataFrame: packed
    int32 vars unpack to doubles (scale 0.001), fills -> null, timestamps
    decode from the CF epoch units (reference plot_L2.py reads L2 .nc)."""
    from cassandra_fs_pp_spark.sources.netcdf import load_netcdf

    rows = [
        (T0 + i * dt.timedelta(hours=1),
         None if i == 2 else -15.0 + i * 0.25,
         i)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "time timestamp, t107 double, q int")
    path = str(tmp_path / "scan.nc")
    to_netcdf(df, path, global_attrs={"site": "FS1"})

    back = load_netcdf(spark, path)
    assert dict(back.dtypes) == {"time": "timestamp", "t107": "double", "q": "bigint"}
    got = {r["time"]: r for r in back.collect()}
    assert len(got) == 5
    for i in range(5):
        t = T0 + i * dt.timedelta(hours=1)
        if i == 2:
            assert got[t]["t107"] is None
        else:
            assert got[t]["t107"] == pytest.approx(-15.0 + i * 0.25, abs=SCALE_FACTOR / 2)
        assert got[t]["q"] == i


# --------------------------------------------------------------------------- #
# property-based: arbitrary shapes/dtypes/attrs round-trip the raw format
# --------------------------------------------------------------------------- #

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n_rec=st.integers(min_value=1, max_value=9),
    n_fix=st.integers(min_value=1, max_value=5),
    dtype=st.sampled_from(["int32", "float64", "float32", "int16"]),
    wide=st.integers(min_value=1, max_value=4),
    attr_val=st.one_of(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=12,
        ),
    ),
)
def test_netcdf3_property_roundtrip(tmp_path_factory, n_rec, n_fix, dtype, wide, attr_val):
    import numpy as np

    path = str(tmp_path_factory.mktemp("nc") / "p.nc")
    rng = np.random.RandomState(n_rec * 31 + n_fix)
    rec = (rng.randint(-1000, 1000, size=(n_rec, wide))).astype(dtype)
    fix = (rng.randint(-1000, 1000, size=(n_fix,))).astype("float64")
    write_netcdf3(
        path,
        {"t": None, "s": wide, "f": n_fix},
        [
            Nc3Variable("t", ("t",), np.arange(n_rec, dtype="float64")),
            Nc3Variable("v", ("t", "s"), rec, {"a": attr_val}),
            Nc3Variable("g", ("f",), fix),
        ],
        {"ga": attr_val},
    )
    dims, gattrs, varlist = read_netcdf3(path)
    v = {x.name: x for x in varlist}
    assert dims == {"t": None, "s": wide, "f": n_fix}
    np.testing.assert_array_equal(
        v["v"].data.astype(dtype), rec
    )
    np.testing.assert_array_equal(v["g"].data.astype("float64"), fix)
    got = gattrs["ga"]
    if isinstance(attr_val, float):
        assert got == attr_val
    elif isinstance(attr_val, int):
        assert got == attr_val
    else:
        assert got == attr_val


def test_netcdf_long_roundtrip(spark, tmp_path):
    """to_netcdf_long -> load_netcdf_long round-trips the long chain
    layout (time, sensor_id, value) through a real 2-D .nc file."""
    from cassandra_fs_pp_spark.sources.netcdf import load_netcdf_long

    sensors = ["DTC1_1", "DTC1_2"]
    rows = [
        (T0 + i * dt.timedelta(hours=1), s, None if (i, j) == (1, 0) else -5.0 - i - j)
        for i in range(3)
        for j, s in enumerate(sensors)
    ]
    df = spark.createDataFrame(rows, "time timestamp, sensor_id string, value double")
    path = str(tmp_path / "long.nc")
    to_netcdf_long(df, path, var_name="dtc")

    back = load_netcdf_long(spark, path, var_name="dtc")
    got = {(r["time"], r["sensor_id"]): r["value"] for r in back.collect()}
    assert len(got) == 6
    for t, s, val in rows:
        if val is None:
            assert got[(t, s)] is None
        else:
            assert got[(t, s)] == pytest.approx(val, abs=SCALE_FACTOR / 2)


def test_netcdf4_hdf5_reader_structures(tmp_path):
    """read_netcdf4 parses a real HDF5-layout NETCDF4 file (test-local
    from-spec writer): superblock v0, symbol-table group, v1 object
    headers, contiguous + multi-chunk layouts, vlen-string attrs via the
    global heap, DIMENSION_LIST refs, unlimited record dim, pure dims."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    path = str(tmp_path / "nc4.nc")
    truth = write_netcdf4(path)
    dims, _gattrs, variables = read_netcdf4(path)
    v = {x.name: x for x in variables}
    assert dims == {"time": None, "sensor": truth["n_sensor"]}
    assert "sensor" not in v  # pure dimension, not a variable
    assert np.array_equal(v["time"].data, truth["time"])
    assert np.array_equal(v["t_air"].data, truth["t_air"])  # contiguous
    assert np.array_equal(v["batt"].data, truth["batt"])
    assert np.array_equal(v["depth"].data, truth["depth"])  # 2 chunks
    assert v["t_air"].dims == ("time",)
    assert v["depth"].dims == ("time", "sensor")
    assert v["t_air"].attrs["units"] == "degree_Celsius"  # vlen via GCOL
    assert v["t_air"].attrs["scale_factor"] == 0.001
    assert v["t_air"].attrs["_FillValue"] == -9999


def test_s11_netcdf4_scan_end_to_end(spark, tmp_path):
    """load_netcdf on a NETCDF4/HDF5 file: CF unpacking (int32 * 0.001,
    -9999 -> null) and record-dim time decode work identically to the
    classic path; load_netcdf_long assembles the 2-D chunked chain var."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.sources.netcdf import (
        load_netcdf,
        load_netcdf_long,
    )

    path = str(tmp_path / "nc4.nc")
    truth = write_netcdf4(path)
    df = load_netcdf(spark, path)
    rows = sorted(df.collect(), key=lambda r: r["time"])
    assert len(rows) == truth["n_time"]
    base = dt.datetime(2024, 1, 1)
    assert rows[0]["time"] == base
    assert rows[2]["time"] == base + dt.timedelta(hours=2)
    # packed var unpacks; fill row is null
    assert rows[5]["t_air"] is None
    assert rows[0]["t_air"] == pytest.approx(
        int(truth["t_air"][0]) * 0.001, abs=1e-12
    )
    assert rows[7]["batt"] == int(truth["batt"][7])

    long_df = load_netcdf_long(spark, path, var_name="depth")
    got = {
        (r["time"], r["sensor_id"]): r["value"] for r in long_df.collect()
    }
    assert len(got) == truth["n_time"] * truth["n_sensor"]
    assert got[(base, "0")] == pytest.approx(truth["depth"][0, 0], abs=0)
    assert got[
        (base + dt.timedelta(hours=30), "2")
    ] == pytest.approx(truth["depth"][30, 2], abs=0)


def test_netcdf4_honest_gates(tmp_path):
    """Subset-exceeding HDF5 features raise NotImplementedError naming
    the feature (and _read_any re-raises when netCDF4 isn't installed)."""
    import struct as _struct
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.sources.netcdf import _read_any

    path = str(tmp_path / "nc4.nc")
    write_netcdf4(path)
    buf = bytearray(open(path, "rb").read())
    # corrupt the superblock version -> unsupported version gate
    bad = bytes(buf[:8]) + bytes([9]) + bytes(buf[9:])
    p9 = str(tmp_path / "bad_ver.nc")
    open(p9, "wb").write(bad)
    with pytest.raises(NotImplementedError, match="superblock version"):
        _read_any(p9)
    del _struct


def test_netcdf4_deflate_pipeline_roundtrip(tmp_path):
    """r9: filter pipelines decode from spec with the stdlib — v1
    deflate on the coordinate, v2 shuffle+deflate+fletcher32 (verified)
    on the 2-D variable; a defined fill-value message fills the
    deliberately-unwritten second chunk; result is bit-equal to the
    uncompressed twin's truth arrays."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    path = str(tmp_path / "nc4_deflate.nc")
    truth = write_netcdf4(path, compress=True)
    dims, _gattrs, variables = read_netcdf4(path)
    v = {x.name: x for x in variables}
    assert dims == {"time": None, "sensor": truth["n_sensor"]}
    assert np.array_equal(v["time"].data, truth["time"])  # v1 deflate
    assert np.array_equal(v["t_air"].data, truth["t_air"])
    # v2 shuffle+deflate+fletcher32 chunk 0; missing chunk 1 <- fill
    assert np.array_equal(v["depth"].data, truth["depth"])
    half = truth["n_time"] // 2
    assert (truth["depth"][half:] == -1.0).all()  # fill actually exercised


def test_netcdf4_deflate_load_matches_uncompressed_twin(spark, tmp_path):
    """load_netcdf on the deflate-chunked file equals load_netcdf on the
    uncompressed twin row-for-row (shared columns; depth is chunked so
    only the 1-D vars flow through load_netcdf)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.sources.netcdf import load_netcdf

    plain = str(tmp_path / "plain.nc")
    packed = str(tmp_path / "deflate.nc")
    write_netcdf4(plain)
    write_netcdf4(packed, compress=True)
    a = sorted(load_netcdf(spark, plain).collect(), key=lambda r: r["time"])
    b = sorted(load_netcdf(spark, packed).collect(), key=lambda r: r["time"])
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_netcdf4_v2_headers_superblock_v3_roundtrip(tmp_path):
    """r9: libver='latest' flavor — superblock v3, OHDR v2 headers whose
    last message ends exactly at the chunk-0 boundary, link-message root
    group with an OCHK continuation, attribute v3 messages — parses to
    the same truth as the v0 layout; compress composes orthogonally."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    for compress in (False, True):
        path = str(tmp_path / f"nc4_v2_{compress}.nc")
        truth = write_netcdf4(path, compress=compress, fmt="v2")
        dims, _gattrs, variables = read_netcdf4(path)
        v = {x.name: x for x in variables}
        assert dims == {"time": None, "sensor": truth["n_sensor"]}
        assert "sensor" not in v
        assert np.array_equal(v["time"].data, truth["time"])
        assert np.array_equal(v["t_air"].data, truth["t_air"])
        assert np.array_equal(v["batt"].data, truth["batt"])  # via OCHK link
        assert np.array_equal(v["depth"].data, truth["depth"])
        assert v["t_air"].attrs["units"] == "degree_Celsius"  # attr v3
        assert v["t_air"].attrs["scale_factor"] == 0.001
        assert v["t_air"].dims == ("time",)
        assert v["depth"].dims == ("time", "sensor")


def test_netcdf4_dense_attribute_and_link_storage(tmp_path):
    """r9: REAL dense storage decodes — t_air's attributes live in a
    fractal heap indexed by a type-8 v2 B-tree (the h5py-'latest'
    >8-attrs shape) and the root group's links in dense link storage
    (type-5 B-tree, 7-byte heap IDs); truth arrays, dims, unpacking
    attrs, and DIMENSION_LIST binding all survive the round-trip."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    path = str(tmp_path / "dense.nc")
    truth = write_netcdf4(path, fmt="v2", dense_attrs=True)
    dims, _gattrs, variables = read_netcdf4(path)
    v = {x.name: x for x in variables}
    assert dims == {"time": None, "sensor": truth["n_sensor"]}
    assert np.array_equal(v["t_air"].data, truth["t_air"])
    assert np.array_equal(v["depth"].data, truth["depth"])
    assert v["t_air"].attrs["scale_factor"] == 0.001  # from the heap
    assert v["t_air"].attrs["_FillValue"] == -9999
    assert v["t_air"].attrs["units"] == "degree_Celsius"  # vlen via GCOL
    assert v["t_air"].dims == ("time",)  # DIMENSION_LIST from the heap


def test_netcdf4_dense_storage_honest_gates(tmp_path):
    """Dense-storage features beyond the subset gate honestly: a
    multi-level name B-tree and a filtered fractal heap both raise
    NotImplementedError (routing to the optional netCDF4 library), never
    silently dropping attributes."""
    import struct as _s
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    path = str(tmp_path / "dense.nc")
    write_netcdf4(path, fmt="v2", dense_attrs=True)
    orig = open(path, "rb").read()

    # depth=1 in the attribute-name BTHD -> multi-level gate
    buf = bytearray(orig)
    at = buf.find(b"BTHD")  # first BTHD is tair_attrs (placed first)
    _s.pack_into("<H", buf, at + 12, 1)
    p1 = str(tmp_path / "deep_btree.nc")
    open(p1, "wb").write(bytes(buf))
    with pytest.raises(NotImplementedError, match="multi-level"):
        read_netcdf4(p1)

    # nonzero I/O-filter length in the FRHP header -> filtered-heap gate
    buf = bytearray(orig)
    at = buf.find(b"FRHP")
    _s.pack_into("<H", buf, at + 7, 12)
    p2 = str(tmp_path / "filtered_heap.nc")
    open(p2, "wb").write(bytes(buf))
    with pytest.raises(NotImplementedError, match="filtered fractal heap"):
        read_netcdf4(p2)


def test_netcdf4_fletcher32_checksum():
    """Engine's vectorized fletcher32 == naive H5checksum.c translation
    on assorted lengths (even/odd, multi-block), and a corrupted chunk
    checksum raises instead of returning garbage."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import fletcher32_naive, write_netcdf4

    from cassandra_fs_pp_spark.hdf5 import _fletcher32, read_netcdf4

    rng = np.random.default_rng(11)
    for n in (0, 1, 2, 3, 7, 719, 720, 721, 1440, 5000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _fletcher32(data) == fletcher32_naive(data), n

    # corrupt one byte inside the depth chunk payload -> mismatch
    import struct as _s

    path = "/tmp/_flet.nc"
    write_netcdf4(path, compress=True)
    buf = bytearray(open(path, "rb").read())
    idx = buf.find(b"GCOL") - 40  # somewhere inside stored chunk bytes
    del idx
    # locate the depth chunk by recompressing the known payload
    import zlib as _z

    truth = write_netcdf4(path, compress=True)
    half = truth["n_time"] // 2
    raw = truth["depth"][:half].astype("<f8").tobytes()
    shuffled = (
        np.frombuffer(raw, dtype=np.uint8)
        .reshape(len(raw) // 8, 8)
        .T.tobytes()
    )
    comp = _z.compress(shuffled, 6)
    pos = bytes(buf).find(comp)
    assert pos > 0
    buf[pos + 5] ^= 0xFF
    open(path, "wb").write(bytes(buf))
    with pytest.raises((ValueError, _z.error)):
        read_netcdf4(path)
    del _s


def test_netcdf4_layout_v4_indexes(tmp_path):
    """r9: data layout v4 chunk indexes decode — single chunk (time),
    implicit dense grid (batt, 4 chunks), fixed array (depth, 2 chunks;
    filtered client-1 entries + missing-chunk fill under compress);
    extensible-array and v2-B-tree indexes gate honestly."""
    import struct as _s
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4_layout_v4

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    for compress in (False, True):
        path = str(tmp_path / f"v4_{compress}.nc")
        truth = write_netcdf4_layout_v4(path, compress=compress)
        dims, _gattrs, variables = read_netcdf4(path)
        v = {x.name: x for x in variables}
        assert dims == {
            "time": truth["n_time"],
            "sensor": truth["n_sensor"],
        }
        assert np.array_equal(v["time"].data, truth["time"])  # single
        assert np.array_equal(v["t_air"].data, truth["t_air"])
        assert np.array_equal(v["batt"].data, truth["batt"])  # implicit
        assert np.array_equal(v["depth"].data, truth["depth"])  # farr
        assert v["t_air"].attrs["scale_factor"] == 0.001
        assert v["depth"].dims == ("time", "sensor")
        if compress:
            half = truth["n_time"] // 2
            assert (truth["depth"][half:] == -2.5).all()  # fill path

    # patch depth's index type 3 -> 5: v2-B-tree honest gate (the
    # extensible-array index is implemented as of r17 — see
    # test_netcdf4_layout_ea below)
    path = str(tmp_path / "v4_False.nc")
    buf = bytearray(open(path, "rb").read())
    # the layout message dims for depth: (24, 3, 8) as 8-byte LE each,
    # followed by the index-type byte
    sig = b"".join(_s.pack("<Q", d) for d in (24, 3, 8)) + b"\x03"
    at = buf.find(sig)
    assert at > 0
    buf[at + len(sig) - 1] = 5
    p = str(tmp_path / "v4_bt2.nc")
    open(p, "wb").write(bytes(buf))
    with pytest.raises(NotImplementedError, match="v2 B-tree"):
        read_netcdf4(p)


def test_netcdf4_layout_ea(tmp_path):
    """r17 (VERDICT r16 item 8): the extensible-array chunk index —
    libhdf5's pick for unlimited dims under libver='latest' — decodes
    through every block class the fixture lays out from HAND-WRITTEN
    literal schedules (never the reader's formula): inline index-block
    elements, a direct data block (defaults: 6 direct slots + 25
    super-block slots), client-1 filtered inline records with a
    never-written chunk reading as fill, and materialized EASB super
    blocks (custom small params: two 4-element blocks in s2, a partial
    8-element block in s3) with an intra-block missing chunk."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4_layout_ea

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    path = str(tmp_path / "ea.nc")
    truth = write_netcdf4_layout_ea(path)
    dims, _gattrs, variables = read_netcdf4(path)
    v = {x.name: x for x in variables}
    # time is the unlimited/record dim -> None (netcdf3-style contract)
    assert dims == {"time": None, "sensor": truth["n_sensor"]}
    # defaults params: 4 inline chunks + 4 chunks in the direct dblock
    assert np.array_equal(v["time"].data, truth["time"])
    # client 1: deflate records inline; chunk 3 never written -> fill
    assert np.array_equal(v["press"].data, truth["press"])
    assert (v["press"].data[15:] == -9.9).all()
    # custom params: inline + 2 direct dblocks (chunk 5 missing -> fill)
    # + super blocks s2 (full) and s3 (partial)
    assert np.array_equal(v["depth"].data, truth["depth"])
    assert (v["depth"].data[5] == -99).all()
    assert v["depth"].dims == ("time", "sensor")


@pytest.mark.parametrize("n_time,n_sensor", [(6, 1), (47, 2), (96, 5)])
@pytest.mark.parametrize("fmt", ["v0", "v2"])
def test_netcdf4_shape_matrix(tmp_path, n_time, n_sensor, fmt):
    """Round-trip across layouts and odd sizes (47 forces a ragged
    second chunk) for both header formats, compressed and not."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    for compress in (False, True):
        path = str(tmp_path / f"m_{n_time}_{n_sensor}_{fmt}_{compress}.nc")
        truth = write_netcdf4(
            path, n_time, n_sensor, compress=compress, fmt=fmt
        )
        _dims, _g, variables = read_netcdf4(path)
        v = {x.name: x for x in variables}
        assert np.array_equal(v["time"].data, truth["time"])
        assert np.array_equal(v["t_air"].data, truth["t_air"])
        assert np.array_equal(v["depth"].data, truth["depth"])


def test_load_netcdf_fleet_distributed(spark, tmp_path):
    """r9: distributed .nc ingestion — binaryFile ships bytes to
    executors where the from-spec readers parse a MIXED directory
    (classic CDF-1, HDF5 v0, HDF5 v2+deflate) into the long fleet
    shape with CF unpacking; values match per-file truths exactly."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.sources.netcdf import load_netcdf_fleet

    d = tmp_path / "fleet"
    d.mkdir()
    t4 = write_netcdf4(str(d / "st_a.nc"), n_time=24)
    t5 = write_netcdf4(str(d / "st_b.nc"), n_time=24, compress=True, fmt="v2")
    tvals = np.array([0.0, 3600.0, 7200.0], dtype="float64")
    packed = np.array([1234, -9999, 5678], dtype="int32")
    write_netcdf3(
        str(d / "st_c.nc"),
        {"time": None},
        [
            Nc3Variable(
                "time", ("time",), tvals,
                {"units": "seconds since 2024-01-01 00:00:00"},
            ),
            Nc3Variable(
                "t107", ("time",), packed,
                {"scale_factor": 0.001, "_FillValue": -9999},
            ),
        ],
    )

    df = load_netcdf_fleet(spark, str(d / "*.nc"))
    rows = df.collect()
    got = {
        (r["src_file"], r["var"], r["time"]): r["value"] for r in rows
    }
    base = dt.datetime(2024, 1, 1)
    # classic file: packed var unpacks, fill -> null
    assert got[("st_c.nc", "t107", base)] == pytest.approx(1.234)
    assert got[("st_c.nc", "t107", base + dt.timedelta(hours=1))] is None
    # HDF5 v0: t_air at row 0; batt plain int
    assert got[("st_a.nc", "t_air", base)] == pytest.approx(
        int(t4["t_air"][0]) * 0.001
    )
    assert got[("st_a.nc", "batt", base + dt.timedelta(hours=7))] == float(
        t4["batt"][7]
    )
    # HDF5 v2 + deflate pipeline decoded executor-side
    assert got[("st_b.nc", "batt", base)] == float(t5["batt"][0])
    n_files = len({r["src_file"] for r in rows})
    assert n_files == 3


def test_netcdf4_dense_attrs_indirect_heap(tmp_path):
    """Dense attributes whose fractal heap is rooted at an INDIRECT
    block (FHIB, one object per row-0/1 direct block) decode through
    the reader's row/column walk identically to the root-direct form."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import write_netcdf4

    from cassandra_fs_pp_spark.hdf5 import read_netcdf4

    path = str(tmp_path / "dense_ind.nc")
    truth = write_netcdf4(path, fmt="v2", dense_attrs=True, dense_indirect=True)
    _dims, _g, variables = read_netcdf4(path)
    v = {x.name: x for x in variables}
    assert np.array_equal(v["t_air"].data, truth["t_air"])
    assert v["t_air"].attrs["scale_factor"] == 0.001
    assert v["t_air"].attrs["_FillValue"] == -9999
    assert v["t_air"].attrs["units"] == "degree_Celsius"
    assert v["t_air"].dims == ("time",)


def test_load_netcdf_cf_unit_spellings(spark, tmp_path):
    """CF epoch units beyond 'seconds/days/hours': minutes and
    milliseconds (and singular spellings) decode to the same instants."""
    from cassandra_fs_pp_spark.sources.netcdf import load_netcdf

    for units, vals, want_h in [
        ("minutes since 2024-01-01 00:00:00", [0.0, 60.0, 120.0], [0, 1, 2]),
        ("milliseconds since 2024-01-01 00:00:00",
         [0.0, 3.6e6, 7.2e6], [0, 1, 2]),
        ("hour since 2024-01-01 00:00:00", [0.0, 1.0, 2.0], [0, 1, 2]),
    ]:
        path = str(tmp_path / f"u_{units.split()[0]}.nc")
        write_netcdf3(
            path,
            {"time": None},
            [
                Nc3Variable("time", ("time",), np.array(vals), {"units": units}),
                Nc3Variable(
                    "v", ("time",), np.array([1.0, 2.0, 3.0])
                ),
            ],
        )
        rows = sorted(load_netcdf(spark, path).collect(), key=lambda r: r["time"])
        base = dt.datetime(2024, 1, 1)
        assert [r["time"] for r in rows] == [
            base + dt.timedelta(hours=h) for h in want_h
        ], units


def test_load_netcdf_add_offset_and_unit_errors(spark, tmp_path):
    """ADVICE r9: CF unpacking applies add_offset (raw*scale+offset,
    _FillValue -> null) on every load path; an unknown CF time unit
    raises a named ValueError, not a bare KeyError; 'ms'/'usec'
    spellings decode."""
    from cassandra_fs_pp_spark.sources.netcdf import (
        load_netcdf,
        load_netcdf_fleet,
    )

    path = str(tmp_path / "packed.nc")
    write_netcdf3(
        path,
        {"time": None},
        [
            Nc3Variable(
                "time",
                ("time",),
                np.array([0.0, 1000.0, 2000.0]),
                {"units": "ms since 2024-01-01 00:00:00"},
            ),
            Nc3Variable(
                "t_air",
                ("time",),
                np.array([100, -9999, 300], dtype="int32"),
                {
                    "scale_factor": 0.001,
                    "add_offset": 2.0,
                    "_FillValue": np.int32(-9999),
                },
            ),
        ],
    )
    rows = sorted(load_netcdf(spark, path).collect(), key=lambda r: r["time"])
    base = dt.datetime(2024, 1, 1)
    assert [r["time"] for r in rows] == [
        base + dt.timedelta(seconds=s) for s in (0, 1, 2)
    ]
    assert [r["t_air"] for r in rows] == [
        pytest.approx(2.1),
        None,
        pytest.approx(2.3),
    ]
    # fleet path: same unpacking, vectorized
    fleet = sorted(
        load_netcdf_fleet(spark, str(tmp_path / "*.nc")).collect(),
        key=lambda r: r["time"],
    )
    assert [r["value"] for r in fleet] == [
        pytest.approx(2.1),
        None,
        pytest.approx(2.3),
    ]

    bad = str(tmp_path / "bad_unit.nc")
    write_netcdf3(
        bad,
        {"time": None},
        [
            Nc3Variable(
                "time",
                ("time",),
                np.array([0.0]),
                {"units": "fortnights since 2024-01-01 00:00:00"},
            ),
            Nc3Variable("v", ("time",), np.array([1.0])),
        ],
    )
    with pytest.raises(ValueError, match="unsupported CF time unit"):
        load_netcdf(spark, bad).collect()


def test_read_any_error_routing(tmp_path):
    """ADVICE r9: only a failed signature sniff maps to the 'neither
    signature' error; a valid HDF5 signature with corrupt internals
    propagates its structural message."""
    from cassandra_fs_pp_spark.sources.netcdf import _read_any

    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="neither classic NetCDF nor HDF5"):
        _read_any(str(junk))

    corrupt = tmp_path / "corrupt.h5"
    corrupt.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\xff" * 256)
    with pytest.raises((ValueError, NotImplementedError)) as ei:
        _read_any(str(corrupt))
    assert "neither" not in str(ei.value)
