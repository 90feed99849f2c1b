"""Spectral analysis of per-key series — the grouped-map UDF surface.

The engine's stance is built-ins first (SURVEY §2.11: no UDF needed for
reference parity); this module is the sanctioned escape hatch pattern for
math that genuinely has no SQL form. ``applyInPandas`` ships each series to
one Arrow batch, numpy does the heavy lifting, and the result is a narrow
per-key frame.

At scale: one shuffle on the series key; each group must fit an executor
(fine for sensor series — years of 15-min samples ≈ 35k points; chunk by
(key, year) for unbounded series).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def dominant_period(
    df: DataFrame,
    keys: list[str],
    *,
    t_col: str = "ts",
    value_col: str = "value",
    min_samples: int = 8,
) -> DataFrame:
    """Per-key dominant cycle via real FFT over the (regularly resampled)
    series: returns (keys..., period_s, amplitude, n).

    Irregular input is linearly interpolated onto its median sampling grid
    inside the batch (numpy), then the strongest non-DC rFFT bin wins.
    """
    out_schema = StructType(
        [df.schema[k] for k in keys]
        + [
            StructField("period_s", DoubleType()),
            StructField("amplitude", DoubleType()),
            StructField("n", DoubleType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col)
        kv = {k: pdf[k].iloc[0] for k in keys}
        t = pdf[t_col].astype("int64").to_numpy() / 1e9
        y = pdf[value_col].to_numpy(dtype=float)
        ok = ~np.isnan(y)
        t, y = t[ok], y[ok]
        if t.size < min_samples:
            return pd.DataFrame(
                [{**kv, "period_s": np.nan, "amplitude": np.nan, "n": float(t.size)}]
            )
        step = float(np.median(np.diff(t)))
        grid = np.arange(t[0], t[-1] + step / 2, step)
        yg = np.interp(grid, t, y)
        yg = yg - yg.mean()
        spec = np.abs(np.fft.rfft(yg))
        freqs = np.fft.rfftfreq(grid.size, d=step)
        i = int(np.argmax(spec[1:])) + 1  # skip DC
        return pd.DataFrame(
            [
                {
                    **kv,
                    "period_s": float(1.0 / freqs[i]),
                    "amplitude": float(2.0 * spec[i] / grid.size),
                    "n": float(grid.size),
                }
            ]
        )

    return df.groupBy(*keys).applyInPandas(per_group, schema=out_schema)
