"""K4 — PNG plot export (reference ``bin/plot_L2.py:84-169``,
``pp_dtcs.py:32-39``, ``investigate_2022_fs_data.py:111-156``).

The reference renders per-variable time-series figures, depth-colored
scatter and heatmaps with matplotlib over collected pandas frames.
Spark-first split of the same product:

* the PIXEL-GRID aggregation runs IN SPARK — time is bucketed to at most
  ``width`` bins (``groupBy(xbin [, series]) → avg``), so the driver
  collects ≤ ``width × n_series`` points (heatmap: ≤ ``width × height``
  cells) no matter whether the input is 60 k rows or 100 TB;
* rasterization is then a bounded numpy pass, written through the repo's
  own from-spec PNG encoder (:func:`..functions.multimodal.encode_png`).

No matplotlib, no Pillow: the output is a real PNG any viewer opens, and
the repo's own :func:`..functions.multimodal.decode_png` round-trips it
in tests.  The smoothing the reference applies before plotting
(``rolling('24H').median()`` / ``.mean()``) is NOT re-implemented here —
per SURVEY §2.2 K4 the engine's W-ops supply the smoothed frame and this
module only renders what it is given.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.multimodal import encode_png

# ---------------------------------------------------------------------------
# 5x7 bitmap font (hand-drawn here; '#' = on).  Enough coverage for tick
# labels (digits, sign, dot, colon) and legend/axis text (A-Z, space, _-/).
# ---------------------------------------------------------------------------

_GLYPHS_RAW: Mapping[str, tuple[str, ...]] = {
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "..##.", ".#...", "#....", "#####"),
    "3": (".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": (".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."),
    "-": (".....", ".....", ".....", "#####", ".....", ".....", "....."),
    "+": (".....", "..#..", "..#..", "#####", "..#..", "..#..", "....."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    ":": (".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."),
    "/": ("....#", "....#", "...#.", "..#..", ".#...", "#....", "#...."),
    "_": (".....", ".....", ".....", ".....", ".....", ".....", "#####"),
    " ": (".....", ".....", ".....", ".....", ".....", ".....", "....."),
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
}

_GLYPHS: dict[str, np.ndarray] = {
    ch: np.array([[c == "#" for c in row] for row in rows], dtype=bool)
    for ch, rows in _GLYPHS_RAW.items()
}

_GW, _GH = 5, 7  # glyph cell (1px inter-glyph gap added when blitting)

# Series palette (distinct hues on white; own constants, not a library's).
PALETTE: tuple[tuple[int, int, int], ...] = (
    (31, 90, 166),   # blue
    (196, 78, 40),   # red-orange
    (44, 140, 60),   # green
    (128, 60, 160),  # purple
    (180, 140, 20),  # ochre
    (0, 150, 160),   # teal
    (200, 60, 130),  # magenta
    (90, 90, 90),    # grey
)

_BLACK = (0, 0, 0)
_GRID = (225, 225, 225)


def _draw_text(canvas: np.ndarray, x: int, y: int, s: str, color=_BLACK) -> None:
    """Blit ``s`` (uppercased; unknown chars → space) at top-left (x, y)."""
    h, w, _ = canvas.shape
    for i, ch in enumerate(s.upper()):
        g = _GLYPHS.get(ch, _GLYPHS[" "])
        x0 = x + i * (_GW + 1)
        if x0 + _GW > w or y + _GH > h or x0 < 0 or y < 0:
            continue
        canvas[y : y + _GH, x0 : x0 + _GW][g] = color


def _text_width(s: str) -> int:
    return len(s) * (_GW + 1) - 1 if s else 0


def _draw_line(canvas: np.ndarray, x0, y0, x1, y1, color, thick: int = 1) -> None:
    """Polyline segment by dense sampling (vectorized; no per-pixel loop)."""
    h, w, _ = canvas.shape
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.rint(np.linspace(x0, x1, n)).astype(np.int64)
    ys = np.rint(np.linspace(y0, y1, n)).astype(np.int64)
    for dx in range(thick):
        for dy in range(thick):
            xx = np.clip(xs + dx, 0, w - 1)
            yy = np.clip(ys + dy, 0, h - 1)
            canvas[yy, xx] = color


def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n ticks at 1/2/5 × 10^k steps covering [lo, hi]."""
    if not (math.isfinite(lo) and math.isfinite(hi)):
        return []
    if hi <= lo:
        return [lo]
    raw = (hi - lo) / max(n, 1)
    mag = 10.0 ** math.floor(math.log10(raw))
    for mult in (1.0, 2.0, 5.0, 10.0):
        if raw <= mult * mag:
            step = mult * mag
            break
    first = math.ceil(lo / step) * step
    out = []
    t = first
    while t <= hi + 1e-9 * step:
        out.append(0.0 if abs(t) < 1e-12 * step else t)
        t += step
    return out


def _fmt_num(v: float) -> str:
    s = f"{v:g}"
    return s.replace("e+0", "e").replace("e-0", "e-")


def _fmt_ts(us: float, span_us: float) -> str:
    """Epoch-µs tick label; granularity follows the plotted span."""
    sec = us / 1e6
    d = math.floor(sec / 86400.0)  # floor, not truncate: negative epochs
    # land on the correct civil day
    # civil date from day number (proleptic Gregorian, epoch 1970-01-01)
    z = d + 719468
    era = z // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    day = doy - (153 * mp + 2) // 5 + 1
    month = mp + 3 if mp < 10 else mp - 9
    if month <= 2:
        y += 1
    if span_us <= 3 * 86400 * 1e6:
        rem = int(sec) % 86400
        return f"{int(month):02d}-{int(day):02d} {rem // 3600:02d}:{(rem % 3600) // 60:02d}"
    return f"{y:04d}-{int(month):02d}-{int(day):02d}"


# ---------------------------------------------------------------------------
# Colormap (own 4-anchor ramp: deep blue → teal → yellow-green → warm yellow)
# ---------------------------------------------------------------------------

_CMAP_ANCHORS = np.array(
    [(40, 25, 100), (30, 140, 140), (130, 200, 60), (250, 220, 50)], dtype=np.float64
)


def colormap(v: np.ndarray) -> np.ndarray:
    """Map values in [0, 1] (NaN → light grey) to (n, 3) uint8 RGB."""
    v = np.asarray(v, dtype=np.float64)
    out = np.empty(v.shape + (3,), dtype=np.uint8)
    nan = ~np.isfinite(v)
    vv = np.clip(np.where(nan, 0.0, v), 0.0, 1.0) * (len(_CMAP_ANCHORS) - 1)
    i = np.minimum(vv.astype(np.int64), len(_CMAP_ANCHORS) - 2)
    frac = (vv - i)[..., None]
    rgb = _CMAP_ANCHORS[i] * (1 - frac) + _CMAP_ANCHORS[i + 1] * frac
    out[...] = np.rint(rgb).astype(np.uint8)
    out[nan] = (235, 235, 235)
    return out


# ---------------------------------------------------------------------------
# Spark-side pixel-grid aggregation
# ---------------------------------------------------------------------------

_ML, _MR, _MT, _MB = 52, 10, 10, 22  # margins: left/right/top/bottom


def _t_us(time_col: str):
    """Epoch-µs expression — the ONE definition both the bounds agg and
    every renderer's binning use, so numeric (epoch-second) and timestamp
    columns can't disagree on units."""
    return F.unix_micros(F.col(time_col).cast("timestamp"))


def _time_bounds(df: DataFrame, time_col: str) -> tuple[int, int]:
    t = _t_us(time_col)
    row = df.agg(F.min(t).alias("lo"), F.max(t).alias("hi")).collect()[0]
    if row["lo"] is None:
        raise ValueError(f"no rows / all-null {time_col}")
    lo, hi = int(row["lo"]), int(row["hi"])
    return lo, max(hi, lo + 1)


def _xbin(time_col: str, lo: int, hi: int, nbins: int):
    return F.least(
        F.lit(nbins - 1),
        ((_t_us(time_col) - F.lit(lo)) * nbins / F.lit(hi - lo)).cast("long"),
    )


def _draw_x_labels(canvas, lo: int, hi: int, pw: int, width: int, height: int):
    for t in _nice_ticks(lo, hi, 6):
        x = _ML + int((t - lo) / (hi - lo) * (pw - 1))
        if _ML <= x < _ML + pw:
            lbl = _fmt_ts(t, hi - lo)
            _draw_text(
                canvas,
                min(max(_ML, x - _text_width(lbl) // 2), width - _text_width(lbl) - 1),
                height - _MB + 6,
                lbl,
            )


def _draw_colorbar(canvas, cx: int, ph: int, flo: float, fhi: float):
    ramp = colormap(np.linspace(1.0, 0.0, ph))
    canvas[_MT : _MT + ph, cx : cx + 10] = ramp[:, None, :]
    for t in _nice_ticks(flo, fhi, 4):
        y = _MT + int(round((fhi - t) / (fhi - flo) * (ph - 1)))
        if _MT <= y < _MT + ph:
            canvas[y, cx + 10 : cx + 13] = _BLACK
            _draw_text(canvas, cx + 15, y - _GH // 2, _fmt_num(t))


def _grid_agg(
    df: DataFrame, time_col: str, value_cols: Sequence[str], nbins: int
) -> tuple[list, int, int]:
    """groupBy(xbin) → avg(value_cols): the scale valve.  One shuffle of
    ≤ nbins rows leaves the cluster regardless of input size."""
    lo, hi = _time_bounds(df, time_col)
    xbin = _xbin(time_col, lo, hi, nbins)
    rows = (
        df.where(F.col(time_col).isNotNull())
        .groupBy(xbin.alias("__xbin"))
        .agg(*[F.avg(F.col(c).cast("double")).alias(c) for c in value_cols])
        .orderBy("__xbin")
        .collect()
    )
    return rows, lo, hi


# ---------------------------------------------------------------------------
# Public sinks
# ---------------------------------------------------------------------------


def render_timeseries(
    df: DataFrame,
    time_col: str,
    value_cols: Sequence[str],
    *,
    width: int = 960,
    height: int = 480,
    title: str | None = None,
    legend: bool = True,
) -> bytes:
    """Multi-series time-series line plot → PNG bytes (reference
    ``plot_L2.py:102-116`` sensor line plots and ``:157-169`` raw+smoothed
    overlays — the caller supplies each series, smoothed or raw)."""
    pw = width - _ML - _MR  # plot-area pixels
    ph = height - _MT - _MB
    rows, lo, hi = _grid_agg(df, time_col, value_cols, pw)

    canvas = np.full((height, width, 3), 255, dtype=np.uint8)
    # y range over all series
    vals = np.array(
        [[r[c] if r[c] is not None else np.nan for c in value_cols] for r in rows],
        dtype=np.float64,
    ).reshape(len(rows), len(value_cols))
    finite = vals[np.isfinite(vals)]
    ylo, yhi = (float(finite.min()), float(finite.max())) if finite.size else (0.0, 1.0)
    if yhi <= ylo:
        ylo, yhi = ylo - 0.5, yhi + 0.5
    pad = 0.05 * (yhi - ylo)
    ylo, yhi = ylo - pad, yhi + pad

    x_of = lambda b: _ML + int(b)
    y_of = lambda v: _MT + int(round((yhi - v) / (yhi - ylo) * (ph - 1)))

    # gridlines + ticks + labels
    for t in _nice_ticks(ylo, yhi):
        y = y_of(t)
        if _MT <= y < _MT + ph:
            canvas[y, _ML : _ML + pw] = _GRID
            lbl = _fmt_num(t)
            _draw_text(canvas, _ML - 4 - _text_width(lbl), y - _GH // 2, lbl)
    for t in _nice_ticks(lo, hi, 6):
        x = _ML + int((t - lo) / (hi - lo) * (pw - 1))
        if _ML <= x < _ML + pw:
            canvas[_MT : _MT + ph, x] = _GRID
    _draw_x_labels(canvas, lo, hi, pw, width, height)
    # frame
    canvas[_MT, _ML : _ML + pw] = _BLACK
    canvas[_MT + ph - 1, _ML : _ML + pw] = _BLACK
    canvas[_MT : _MT + ph, _ML] = _BLACK
    canvas[_MT : _MT + ph, _ML + pw - 1] = _BLACK

    # series polylines; a bin with no rows OR a null average breaks the
    # line (no fabricated segment across an outage)
    by_bin = {int(r["__xbin"]): r for r in rows}
    for si, c in enumerate(value_cols):
        color = PALETTE[si % len(PALETTE)]
        prev = None
        for b in range(pw):
            r = by_bin.get(b)
            v = r[c] if r is not None else None
            if v is None or not math.isfinite(v):
                prev = None
                continue
            pt = (x_of(b), y_of(float(v)))
            if prev is not None:
                _draw_line(canvas, prev[0], prev[1], pt[0], pt[1], color)
            else:
                canvas[pt[1] : pt[1] + 1, pt[0] : pt[0] + 1] = color
            prev = pt

    if title:
        _draw_text(canvas, _ML, 2, title)
    if legend:
        lx = _ML + 8
        for si, c in enumerate(value_cols):
            ly = _MT + 6 + si * (_GH + 4)
            canvas[ly : ly + _GH, lx : lx + 8] = PALETTE[si % len(PALETTE)]
            _draw_text(canvas, lx + 12, ly, c)
    return encode_png(canvas)


def render_heatmap(
    df: DataFrame,
    time_col: str,
    y_col: str,
    value_col: str,
    *,
    width: int = 960,
    height: int = 480,
    title: str | None = None,
    vmin: float | None = None,
    vmax: float | None = None,
) -> bytes:
    """(time × category) → value heatmap with colorbar (reference
    ``plot_L2.py:148-155`` EC profile / ``investigate_2022_fs_data.py``
    `.T` heatmaps).  ``y_col`` is categorical (sensor id / depth level):
    rows of the heatmap, sorted ascending.  Cells aggregate in Spark
    (groupBy(xbin, y) → avg), driver sees ≤ pw × n_levels cells."""
    cbar_w = 40
    pw = width - _ML - _MR - cbar_w
    ph = height - _MT - _MB
    lo, hi = _time_bounds(df, time_col)
    cells = (
        df.where(F.col(time_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(_xbin(time_col, lo, hi, pw).alias("__xbin"), F.col(y_col).alias("__y"))
        .agg(F.avg(F.col(value_col).cast("double")).alias("__v"))
        .collect()
    )
    levels = sorted({r["__y"] for r in cells})
    if not levels:
        raise ValueError("no cells to plot")
    lidx = {l: i for i, l in enumerate(levels)}
    grid = np.full((len(levels), pw), np.nan)
    for r in cells:
        if r["__v"] is not None:
            grid[lidx[r["__y"]], int(r["__xbin"])] = r["__v"]

    finite = grid[np.isfinite(grid)]
    flo = vmin if vmin is not None else (float(finite.min()) if finite.size else 0.0)
    fhi = vmax if vmax is not None else (float(finite.max()) if finite.size else 1.0)
    if fhi <= flo:
        fhi = flo + 1.0
    rgb = colormap((grid - flo) / (fhi - flo))

    canvas = np.full((height, width, 3), 255, dtype=np.uint8)
    # nearest-neighbour upscale rows → plot height
    row_of = (np.arange(ph) * len(levels)) // ph
    canvas[_MT : _MT + ph, _ML : _ML + pw] = rgb[row_of][:, :pw]

    # y tick labels: level values at band centers (top band = first level)
    for i, lvl in enumerate(levels):
        y = _MT + int((i + 0.5) / len(levels) * ph) - _GH // 2
        lbl = _fmt_num(float(lvl)) if isinstance(lvl, (int, float)) else str(lvl)[:7]
        _draw_text(canvas, _ML - 4 - _text_width(lbl), y, lbl)
    _draw_x_labels(canvas, lo, hi, pw, width, height)
    _draw_colorbar(canvas, width - _MR - cbar_w + 10, ph, flo, fhi)
    if title:
        _draw_text(canvas, _ML, 2, title)
    return encode_png(canvas)


def render_depth_scatter(
    df: DataFrame,
    time_col: str,
    depth_col: str,
    value_col: str,
    *,
    width: int = 960,
    height: int = 480,
    title: str | None = None,
) -> bytes:
    """TDR-style scatter: y = measured depth, marker colored by value
    (reference ``plot_L2.py:86-99``).  Spark buckets (xbin, ybin) → avg;
    driver draws ≤ pw×ph/9 3×3 markers."""
    cbar_w = 40
    pw = width - _ML - _MR - cbar_w
    ph = height - _MT - _MB
    nx, ny = pw // 3, ph // 3
    lo, hi = _time_bounds(df, time_col)
    drow = df.agg(
        F.min(F.col(depth_col).cast("double")).alias("lo"),
        F.max(F.col(depth_col).cast("double")).alias("hi"),
    ).collect()[0]
    if drow["lo"] is None:
        raise ValueError(f"no rows / all-null {depth_col}")
    dlo, dhi = float(drow["lo"]), float(drow["hi"])
    if dhi <= dlo:
        dhi = dlo + 1.0
    xbin = _xbin(time_col, lo, hi, nx)
    ybin = F.least(
        F.lit(ny - 1),
        (
            (F.col(depth_col).cast("double") - F.lit(dlo)) * ny / F.lit(dhi - dlo)
        ).cast("long"),
    )
    cells = (
        df.where(F.col(time_col).isNotNull() & F.col(depth_col).isNotNull())
        .groupBy(xbin.alias("__x"), ybin.alias("__y"))
        .agg(F.avg(F.col(value_col).cast("double")).alias("__v"))
        .collect()
    )
    vs = np.array([r["__v"] for r in cells if r["__v"] is not None])
    flo, fhi = (float(vs.min()), float(vs.max())) if vs.size else (0.0, 1.0)
    if fhi <= flo:
        fhi = flo + 1.0

    canvas = np.full((height, width, 3), 255, dtype=np.uint8)
    live = [r for r in cells if r["__v"] is not None]
    if live:
        colors = colormap(
            (np.array([r["__v"] for r in live]) - flo) / (fhi - flo)
        )
        for r, color in zip(live, colors):
            x = _ML + int(r["__x"]) * 3
            # depth axis increases downward data-wise
            y = _MT + ph - 3 - int(r["__y"]) * 3
            canvas[y : y + 3, x : x + 3] = color
    # frame + axes labels
    canvas[_MT, _ML : _ML + pw] = _BLACK
    canvas[_MT + ph - 1, _ML : _ML + pw] = _BLACK
    canvas[_MT : _MT + ph, _ML] = _BLACK
    canvas[_MT : _MT + ph, _ML + pw - 1] = _BLACK
    for t in _nice_ticks(dlo, dhi):
        y = _MT + ph - 1 - int(round((t - dlo) / (dhi - dlo) * (ph - 1)))
        if _MT <= y < _MT + ph:
            lbl = _fmt_num(t)
            _draw_text(canvas, _ML - 4 - _text_width(lbl), y - _GH // 2, lbl)
    _draw_x_labels(canvas, lo, hi, pw, width, height)
    _draw_colorbar(canvas, width - _MR - cbar_w + 10, ph, flo, fhi)
    if title:
        _draw_text(canvas, _ML, 2, title)
    return encode_png(canvas)


def save_png(png: bytes, path: str) -> None:
    with open(path, "wb") as f:
        f.write(png)


def render_l2_variable(
    df: DataFrame,
    time_col: str,
    var: str,
    *,
    width: int = 960,
    height: int = 480,
    smooth_hours: int = 24,
    min_periods: int = 10,
) -> bytes:
    """The reference's per-variable L2 product (``plot_L2.py:157-169``):
    raw series + centered ``smooth_hours`` rolling-median overlay.  The
    smoothing runs IN SPARK via the engine's own W2 rolling median (the
    SURVEY K4 contract: W-ops supply the smoothed frame, the sink only
    renders), then both series go through the pixel-grid aggregation."""
    from .operators.windows import rolling_median, time_frame

    half = smooth_hours * 3600 // 2
    frame = time_frame(time_col, before_s=half, after_s=half)
    both = df.select(
        time_col,
        F.col(var).cast("double").alias(var),
        rolling_median(var, frame, min_periods=min_periods).alias(f"{var} {smooth_hours}H MED"),
    )
    return render_timeseries(
        both, time_col, [var, f"{var} {smooth_hours}H MED"],
        width=width, height=height, title=var,
    )
