"""Export sinks (SURVEY §2.2 K1-K3, §2.8 F10).

* :func:`write_csv_single` — the reference's time-indexed wide CSV contract
  (``cassandra_fs_pp/fs_pp.py:154-165``, ``bin/fs_process_l2.py:68``): one
  ordered file. Engine-canonical storage is partitioned Parquet
  (:func:`write_parquet`); the single-CSV shape exists for interop parity.
* :func:`encode_fixed_point` — the NetCDF encoding arithmetic
  (``bin/fs_process_l2.py:196-200``): 3-decimal fixed point as int32 with
  ``_FillValue=-9999``. Pure column expressions, testable without netCDF.
* :func:`to_netcdf` — driver-side xarray materialization of a (small,
  final) L2 frame with CF-style attrs. xarray/netCDF4 are OPTIONAL deps;
  absent -> ImportError with guidance. At 100 TB the canonical output is
  Parquet; NetCDF is a per-site driver-side export of an already-reduced
  product (one station's series fits trivially in driver memory).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FILL_VALUE = -9999
SCALE_FACTOR = 0.001


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Engine-canonical sink: partitioned Parquet (partition pruning +
    column pruning + predicate pushdown on re-read)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_by: Sequence[str],
    n_buckets: int = 32,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted table layout: the pre-shuffled join/agg format.

    Two tables bucketed on the same key with the same bucket count join
    with ZERO Exchange (verified in tests/test_layout.py) — the 100 TB
    co-location lever for repeated joins on a hot key. Registered in the
    session catalog as ``table`` with data at ``path``.
    """
    writer = df.write.bucketBy(int(n_buckets), *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.option("path", path).mode(mode).saveAsTable(table)


def write_csv_single(
    df: DataFrame, path: str, *, order_by: str = "TIMESTAMP", mode: str = "overwrite"
) -> None:
    """K1/K2 — single ordered CSV (a directory with one part file).

    ``coalesce(1)`` serializes the final write (fine for per-site L1/L2
    interop files); large exports should use :func:`write_parquet`.
    """
    (
        df.orderBy(order_by)
        .coalesce(1)
        .write.mode(mode)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )


def encode_fixed_point(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    scale: float = SCALE_FACTOR,
    fill: int = FILL_VALUE,
) -> DataFrame:
    """F10 — ``int32 = round(x / scale)``, null -> ``fill``
    (``bin/fs_process_l2.py:196-200``: dtype int32, scale_factor 0.001,
    _FillValue -9999). Applied to every double column by default.

    ``bround`` (half-even), matching numpy/xarray's ``np.around`` in the
    reference's NetCDF encode path — Spark's ``round`` is half-up."""
    if cols is None:
        cols = [c for c, d in df.dtypes if d == "double"]
    return df.withColumns(
        {
            c: F.coalesce(
                F.bround(F.col(c) / F.lit(float(scale))).cast("int"), F.lit(int(fill))
            )
            for c in cols
        }
    )


DEFAULT_GLOBAL_ATTRS = {
    "institution": "cassandra_fs_pp_spark",
    "license": "CC-BY-4.0",
}


def to_netcdf(
    df: DataFrame,
    path: str,
    *,
    time_col: str = "time",
    global_attrs: Mapping[str, object] | None = None,
    var_attrs: Mapping[str, Mapping[str, object]] | None = None,
    encode: bool = True,
) -> None:
    """K3 — driver-side NetCDF export of a reduced per-site product.

    Collects ``df`` (ordered by time) to pandas, assembles an
    ``xarray.Dataset`` with ``time`` as the unlimited dim, attaches global +
    per-variable attrs, and writes with the reference encoding
    (int32 / scale_factor 0.001 / _FillValue -9999, zlib off —
    ``bin/fs_process_l2.py:196-204``). Requires the optional ``xarray`` +
    ``netCDF4`` deps.
    """
    try:
        import xarray as xr  # noqa: F401
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "NetCDF export needs the optional 'xarray' + 'netCDF4' packages; "
            "the engine-canonical sink is write_parquet()"
        ) from e

    pdf = df.orderBy(time_col).toPandas().set_index(time_col)
    pdf.index.name = "time"
    ds = xr.Dataset.from_dataframe(pdf)
    ds.attrs.update(DEFAULT_GLOBAL_ATTRS)
    ds.attrs.update(dict(global_attrs or {}))
    for var, attrs in (var_attrs or {}).items():
        if var in ds:
            ds[var].attrs.update(dict(attrs))
    encoding = None
    if encode:
        encoding = {
            v: {
                "dtype": "int32",
                "scale_factor": SCALE_FACTOR,
                "zlib": False,
                "_FillValue": FILL_VALUE,
            }
            for v in ds.data_vars
            if str(ds[v].dtype).startswith("float")
        }
    ds.to_netcdf(path, unlimited_dims=["time"], encoding=encoding)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Line-delimited JSON export — the corpus interchange format LLM data
    pipelines exchange (one document object per line). Nested structs/
    arrays serialize naturally; at scale pair with ``partition_by`` (e.g.
    split or date) and a splittable ``compression`` (none/'gzip' per-file;
    prefer none + outer parquet for re-processing)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
