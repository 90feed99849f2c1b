"""Property-based differential tests (hypothesis): the window/time-series
operators vs their pandas reference semantics on randomized sparse series,
and the salted join vs the plain join.

Each example builds a small irregular series with holes and checks the
Spark operator's output element-for-element against pandas. Example counts
are capped — every example is a full Spark job."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_fs_pp_spark.operators.skew import salted_join
from cassandra_fs_pp_spark.operators.windows import (
    interpolate_linear,
    ratchet_depth,
    resample_ffill,
)

T0 = pd.Timestamp("2024-01-01 00:00:00")

# a sparse series: step offsets (in 15-min units, strictly increasing via
# cumsum of positive gaps) + values with holes
series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),  # gap in grid steps
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
    ),
    min_size=2,
    max_size=25,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _to_series(spec):
    steps = np.cumsum([g for g, _ in spec])
    idx = pd.DatetimeIndex([T0 + pd.Timedelta(minutes=15 * int(s)) for s in steps])
    vals = [v for _, v in spec]
    return pd.Series(vals, index=idx, dtype=float)


@given(spec=series_strategy)
@SETTINGS
def test_resample_ffill_matches_pandas(spark, spec):
    s = _to_series(spec)
    s = s[~s.index.duplicated()]
    want = s.resample("15min").ffill(limit=3)

    sdf = spark.createDataFrame(
        pd.DataFrame({"t": s.index, "v": s.values})
    )
    got = (
        resample_ffill(sdf, "t", 900, limit=3, origin="start_day")
        .orderBy("t")
        .toPandas()
        .set_index("t")["v"]
    )
    assert list(got.index) == list(want.index)
    assert (got.isna().to_numpy() == want.isna().to_numpy()).all()
    m = ~want.isna().to_numpy()
    assert np.allclose(got.to_numpy()[m], want.to_numpy()[m])


@given(spec=series_strategy)
@SETTINGS
def test_interpolate_matches_pandas(spark, spec):
    s = _to_series(spec)
    s = s[~s.index.duplicated()]
    want = s.interpolate(method="index")  # time-weighted, pandas default on
    # a datetime index via 'index'; trailing NaNs ffilled, leading stay

    sdf = spark.createDataFrame(pd.DataFrame({"t": s.index, "v": s.values}))
    got = (
        sdf.select("t", interpolate_linear("v", "t").alias("v"))
        .orderBy("t")
        .toPandas()
        .set_index("t")["v"]
    )
    assert (got.isna().to_numpy() == want.isna().to_numpy()).all()
    m = ~want.isna().to_numpy()
    assert np.allclose(got.to_numpy()[m], want.to_numpy()[m])


@given(
    walk=st.lists(st.floats(-0.1, 0.1, allow_nan=False), min_size=2, max_size=40),
    depth=st.floats(-1.0, -0.05, allow_nan=False),
)
@SETTINGS
def test_ratchet_matches_reference_loop(spark, walk, depth):
    udg = np.cumsum(np.asarray(walk)) + 1.0
    idx = pd.date_range("2024-06-01", periods=len(udg), freq="h")

    u = udg - udg[0]
    offset, expected = depth, []
    for ut in u:
        d = min(0.0, ut + offset)
        if d == 0.0:
            offset = -ut
        expected.append(d)

    sdf = spark.createDataFrame(pd.DataFrame({"t": idx, "u": u}))
    got = (
        sdf.select("t", ratchet_depth("u", "t", depth).alias("d"))
        .orderBy("t")
        .toPandas()["d"]
        .to_numpy()
    )
    assert np.allclose(got, np.asarray(expected), atol=1e-12)


@given(
    keys=st.lists(st.integers(0, 3), min_size=1, max_size=40),
    salt_n=st.sampled_from([2, 8, 16]),
)
@SETTINGS
def test_salted_join_equals_plain_join(spark, keys, salt_n):
    big = spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": np.arange(len(keys), dtype=float)})
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [0, 1, 2], "name": ["a", "b", "c"]})
    )
    got = salted_join(big, dim, ["k"], how="left", salt_n=salt_n)
    want = big.join(dim, on="k", how="left")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_per_key_resample_ffill_fleet(spark):
    """Fleet mode: two series with DIFFERENT sampling frequencies each
    regularize on their own per-key dominant grid (no global scalar)."""
    idx15 = pd.date_range("2024-01-01", periods=20, freq="15min")
    idx60 = pd.date_range("2024-01-01", periods=20, freq="60min")
    a = pd.DataFrame({"site": "A", "t": idx15, "v": np.arange(20.0)})
    b = pd.DataFrame({"site": "B", "t": idx60, "v": np.arange(20.0) * 10})
    # knock holes in both (drop rows -> new grid labels must ffill<=2)
    a = a.drop(index=[3, 4, 10])
    b = b.drop(index=[5])
    both = pd.concat([a, b])

    sdf = spark.createDataFrame(both)
    out = (
        resample_ffill(sdf, "t", None, limit=2, partition_by=["site"])
        .orderBy("site", "t")
        .toPandas()
    )

    for site, pdf, freq in (("A", a, "15min"), ("B", b, "60min")):
        want = (
            pdf.set_index("t")["v"].resample(freq).ffill(limit=2)
        )
        got = out[out["site"] == site].set_index("t")["v"]
        assert list(got.index) == list(want.index)
        assert (got.isna().to_numpy() == want.isna().to_numpy()).all()
        m = ~want.isna().to_numpy()
        assert np.allclose(got.to_numpy()[m], want.to_numpy()[m])


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.floats(-10, 10, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_dedup_keep_first_matches_pandas(spark, rows):
    """dedup_keep_first == pandas drop_duplicates(keep='first') in arrival
    order, whatever the partition layout."""
    from cassandra_fs_pp_spark.operators.dedup import dedup_keep_first

    pdf = pd.DataFrame(rows, columns=["k", "v"])
    pdf["seq"] = np.arange(len(pdf))
    want = pdf.drop_duplicates(subset=["k"], keep="first")

    sdf = spark.createDataFrame(pdf).repartition(7)
    got = (
        dedup_keep_first(sdf, keys=["k"], order_by=["seq"])
        .orderBy("k")
        .toPandas()
    )
    want = want.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert np.allclose(got["v"].to_numpy(), want["v"].to_numpy())
    assert got["seq"].tolist() == want["seq"].tolist()


@given(
    lt=st.lists(st.integers(0, 200), min_size=1, max_size=25),
    rt=st.lists(st.integers(0, 200), min_size=1, max_size=25),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 1800]),
)
@SETTINGS
def test_asof_join_matches_pandas_merge_asof(spark, lt, rt, direction, tol):
    """asof_join == pd.merge_asof for both directions, with/without
    tolerance, on random (deduplicated) minute offsets."""
    from cassandra_fs_pp_spark.operators.joins import asof_join

    lts = sorted(set(lt))
    rts = sorted(set(rt))
    left = pd.DataFrame(
        {"ts": [T0 + pd.Timedelta(minutes=m) for m in lts],
         "lv": np.arange(len(lts), dtype=float)}
    )
    right = pd.DataFrame(
        {"ts": [T0 + pd.Timedelta(minutes=m) for m in rts],
         "rv": np.arange(len(rts), dtype=float) * 10}
    )
    kw = dict(direction=direction)
    if tol is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tol)
    want = pd.merge_asof(left, right, on="ts", **kw)

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            value_cols=["rv"],
            direction=direction,
            tolerance_s=tol,
        )
        .orderBy("ts")
        .toPandas()
    )
    assert got["ts"].tolist() == want["ts"].tolist()
    assert (got["rv"].isna().to_numpy() == want["rv"].isna().to_numpy()).all()
    m = ~want["rv"].isna().to_numpy()
    assert np.allclose(got["rv"].to_numpy()[m], want["rv"].to_numpy()[m])


@given(
    gaps=st.lists(st.integers(min_value=0, max_value=900), min_size=2, max_size=40),
    gap_s=st.sampled_from([60, 300, 600]),
)
@SETTINGS
def test_debounce_matches_python_loop(spark, gaps, gap_s):
    """debounce_keep_first vs a direct sequential burst walk."""
    from cassandra_fs_pp_spark.operators.dedup import debounce_keep_first

    times = np.cumsum(gaps)
    rows = [
        ("k", (T0 + pd.Timedelta(seconds=int(s))).to_pydatetime(), i)
        for i, s in enumerate(times)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long")
    got = {
        r.id: r.burst_n
        for r in debounce_keep_first(
            df, keys=["k"], ts="ts", gap_s=gap_s, tiebreak=["id"]
        ).collect()
    }

    # reference: new burst when gap since PREVIOUS event > gap_s
    want: dict[int, int] = {}
    head = None
    for i, s in enumerate(times):
        if head is None or (s - times[i - 1]) > gap_s:
            head = i
            want[head] = 0
        want[head] += 1
    assert got == want


@given(
    spec=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=600),
            st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=30,
    )
)
@SETTINGS
def test_time_weighted_avg_matches_numpy(spark, spec):
    from cassandra_fs_pp_spark.operators.windows import time_weighted_avg

    t = np.cumsum([g for g, _ in spec])
    v = np.array([x for _, x in spec], dtype=float)
    rows = [
        ("k", (T0 + pd.Timedelta(seconds=int(s))).to_pydatetime(), float(x), i)
        for i, (s, x) in enumerate(zip(t, v))
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, id long")
    out = time_weighted_avg(df, keys=["k"], t="ts", x="v", tiebreak=["id"]).collect()

    dur = np.diff(t).astype(float)
    if dur.sum() == 0:
        # all samples simultaneous -> every duration 0 -> sum(dur)=0
        assert len(out) == 1 and (out[0].twa_value is None or np.isnan(out[0].twa_value))
        return
    want = float((v[:-1] * dur).sum() / dur.sum())
    assert out[0].twa_value == pytest.approx(want, rel=1e-9)
    assert out[0].span_s == pytest.approx(float(dur.sum()))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 3),            # user key
            st.integers(0, 50_000),       # start offset seconds
            st.integers(0, 20_000),       # duration seconds (may span buckets)
        ),
        min_size=1, max_size=25,
    )
)
def test_interval_overlap_join_matches_naive(spark, data):
    """Property: the bucketized equi-join form returns EXACTLY the naive
    range-join pair set, for any interval layout (zero-length intervals,
    multi-bucket spans, bucket-boundary touches)."""
    from cassandra_fs_pp_spark.operators.joins import interval_overlap_join

    base = 1_600_000_000
    rows = [
        (u, i, base + s, base + s + d) for i, (u, s, d) in enumerate(data)
    ]
    left = spark.createDataFrame(
        rows, "user_id long, a_id long, s long, e long"
    ).select(
        "user_id", "a_id",
        F.timestamp_seconds("s").alias("a_start"),
        F.timestamp_seconds("e").alias("a_end"),
    )
    right = spark.createDataFrame(
        rows, "user_id long, b_id long, s long, e long"
    ).select(
        "user_id", "b_id",
        F.timestamp_seconds("s").alias("b_start"),
        F.timestamp_seconds("e").alias("b_end"),
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            left, right, l_start="a_start", l_end="a_end",
            r_start="b_start", r_end="b_end",
            bucket_s=3600, keys=("user_id",),
        ).collect()
    )
    want = sorted(
        (a[1], b[1])
        for a in rows for b in rows
        if a[0] == b[0] and a[2] <= b[3] and b[2] <= a[3]
    )
    assert got == want


@given(
    data=st.binary(min_size=0, max_size=3000),
)
@settings(max_examples=60, deadline=None)
def test_fletcher32_vectorized_matches_naive(data):
    """hdf5._fletcher32 (numpy-blocked) == the fixture's straight
    H5checksum.c translation on arbitrary byte strings (even/odd
    lengths, multi-block folds)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from hdf5_fixture import fletcher32_naive

    from cassandra_fs_pp_spark.hdf5 import _fletcher32

    assert _fletcher32(data) == fletcher32_naive(data)


@given(
    data=st.data(),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_geofence_tag_matches_join_on_random_polygons(spark, data):
    """point_in_polygon_tag == point_in_polygon_join on random point
    clouds against random (possibly concave, even self-intersecting)
    polygons: both implement the same even-odd integer ray-cast, so
    they must agree point-for-point regardless of polygon shape."""
    from cassandra_fs_pp_spark.operators.geo import (
        point_in_polygon_join,
        point_in_polygon_tag,
    )

    n_regions = data.draw(st.integers(1, 3))
    polygons = []
    for rid in range(1, n_regions + 1):
        nv = data.draw(st.integers(3, 7))
        verts = [
            (
                data.draw(st.integers(0, 2000)),
                data.draw(st.integers(0, 2000)),
            )
            for _ in range(nv)
        ]
        polygons.append((rid, verts))
    pts = [
        (
            i,
            data.draw(st.integers(-100, 2100)),
            data.draw(st.integers(-100, 2100)),
        )
        for i in range(data.draw(st.integers(1, 40)))
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    via_join = {
        (r["id"], r["region_id"])
        for r in point_in_polygon_join(df, polygons, cell=500).collect()
    }
    via_tag = {
        (r["id"], r["region_id"])
        for r in point_in_polygon_tag(df, polygons)
        .select("id", "region_id")
        .collect()
    }
    assert via_tag == via_join


# ---------------------------------------------------------------------------
# verbatim-span dedup vs a brute-force pure-Python reference
# ---------------------------------------------------------------------------

corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(list("abcd")),  # tiny alphabet -> dense repeats
        min_size=0,
        max_size=18,
    ),
    min_size=1,
    max_size=6,
)


def _brute_verbatim(docs: dict[int, list[str]], k: int):
    """Reference semantics, O(everything): maximal runs of positions
    whose k-shingle occurs >= 2 times corpus-wide."""
    from collections import Counter

    counts = Counter()
    for toks in docs.values():
        for i in range(len(toks) - k + 1):
            counts[tuple(toks[i : i + k])] += 1
    spans = set()
    for d, toks in docs.items():
        hits = [
            i
            for i in range(len(toks) - k + 1)
            if counts[tuple(toks[i : i + k])] >= 2
        ]
        run: list[int] = []
        for i in hits + [None]:
            if run and (i is None or i != run[-1] + 1):
                spans.add((d, run[0], run[-1] + k - 1, run[-1] - run[0] + k))
                run = []
            if i is not None:
                run.append(i)
    return spans


def _brute_strip(docs: dict[int, list[str]], k: int):
    """Keep-first rewrite reference: rank shingle occurrences in
    (doc, pos) order; rank>1 occurrences drop their k covered tokens."""
    from collections import defaultdict

    occ = defaultdict(list)
    for d in sorted(docs):
        toks = docs[d]
        for i in range(len(toks) - k + 1):
            occ[tuple(toks[i : i + k])].append((d, i))
    dropped = defaultdict(set)
    for sites in occ.values():
        if len(sites) >= 2:
            for d, i in sorted(sites)[1:]:
                dropped[d].update(range(i, i + k))
    out = {}
    for d, toks in docs.items():
        kept = [t for j, t in enumerate(toks) if j not in dropped[d]]
        out[d] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@given(corpus_strategy)
@SETTINGS
def test_verbatim_spans_matches_bruteforce(spark, spec):
    from cassandra_fs_pp_spark.operators.textdedup import verbatim_spans

    k = 3
    docs = {i: toks for i, toks in enumerate(spec)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in verbatim_spans(df, k=k).collect()
    }
    # whitespace tokenization of "" yields [''], matching a 0-token doc
    # only through the size >= k guard — mirror by dropping empties
    want = _brute_verbatim({d: t for d, t in docs.items() if t}, k)
    assert got == want


def _brute_chain_spans(docs: dict[int, list[str]], k: int):
    """Reference semantics for suffix_chain_spans, O(everything): every
    duplicated k-shingle occurrence pairs with its (doc, pos)-min
    canonical site; lockstep runs merge on the (doc, src_doc, diag)
    diagonal."""
    from collections import defaultdict

    occ = defaultdict(list)
    for d in sorted(docs):
        toks = docs[d]
        for i in range(len(toks) - k + 1):
            occ[tuple(toks[i : i + k])].append((d, i))
    diag = defaultdict(list)  # (doc, src_doc, p - p0) -> positions
    for sites in occ.values():
        d0, p0 = min(sites)
        for d, p in sites:
            if (d, p) != (d0, p0):
                diag[(d, d0, p - p0)].append(p)
    spans = set()
    for (d, d0, dg), ps in diag.items():
        run: list[int] = []
        for p in sorted(ps) + [None]:
            if run and (p is None or p != run[-1] + 1):
                spans.add(
                    (d, run[0], run[-1] + k - 1,
                     run[-1] - run[0] + k, d0, run[0] - dg)
                )
                run = []
            if p is not None:
                run.append(p)
    return spans


@given(corpus_strategy)
@SETTINGS
def test_suffix_chain_spans_matches_bruteforce(spark, spec):
    """r16: the suffix-chain span operator vs the pure-Python reference
    on random tiny-alphabet corpora — dense shingle repeats stress the
    canonical-site tie-breaks, within-doc overlaps, and diagonal run
    splits."""
    from cassandra_fs_pp_spark.operators.textdedup import suffix_chain_spans

    k = 3
    docs = {i: toks for i, toks in enumerate(spec) if toks}
    if not docs:
        return
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"],
         r["n_tokens"], r["src_doc"], r["src_start"])
        for r in suffix_chain_spans(df, k=k).collect()
    }
    assert got == _brute_chain_spans(docs, k)


@given(corpus_strategy)
@SETTINGS
def test_strip_verbatim_matches_bruteforce(spark, spec):
    from cassandra_fs_pp_spark.operators.textdedup import strip_verbatim

    k = 3
    docs = {i: toks for i, toks in enumerate(spec) if toks}
    if not docs:
        return
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_dropped"])
        for r in strip_verbatim(df, k=k).collect()
    }
    assert got == _brute_strip(docs, k)


@given(corpus_strategy)
@SETTINGS
def test_kn_perplexity_matches_reference_on_random_corpora(spark, spec):
    """r11: the KN bigram LM vs the pure-Python reference on random
    tiny-alphabet corpora — dense bigram repeats stress the continuation
    counts, and empty/single-token docs must drop out of both sides."""
    from test_text_similarity import _kn_reference

    from cassandra_fs_pp_spark.functions.text import kn_perplexity

    rows = [(i, " ".join(toks)) for i, toks in enumerate(spec)]
    if not any(len(t.split()) >= 2 for _, t in rows):
        return  # no bigrams anywhere: both sides are empty
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_nano"], r["ppl"])
        for r in kn_perplexity(df).collect()
    }
    assert got == _kn_reference(rows)


def _ivf_adc_reference(vecs, cells, *, k, nprobe, rerank, query_mod, levels=255):
    """Pure-Python IVF+ADC+rerank with Spark's exact float semantics:
    left-fold dot products, away-from-zero code rounding, (score desc,
    id/cell asc) tie-breaks."""
    import math

    d = len(vecs[0])
    ids = sorted(vecs)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    # scalar quantization (per-dim min/max, away-from-zero round)
    mn = [min(vecs[i][j] for i in ids) for j in range(d)]
    mx = [max(vecs[i][j] for i in ids) for j in range(d)]
    def dq(i):
        out = []
        for j in range(d):
            rng = mx[j] - mn[j]
            if rng == 0:
                code = 0
            else:
                x = ((vecs[i][j] - mn[j]) / rng) * float(levels)
                code = int(math.copysign(math.floor(abs(x) + 0.5), x))
            out.append(mn[j] + float(code) * (rng / float(levels)))
        return out

    # per-cell mean centroids (sum order irrelevant at test tolerance;
    # probe boundaries on random data are far above ulp)
    cent = {}
    for c in set(cells.values()):
        members = [i for i in ids if cells[i] == c]
        cent[c] = [
            sum(vecs[i][j] for i in members) / len(members) for j in range(d)
        ]
    out = {}
    for q in ids:
        if q % query_mod != 0:
            continue
        qv, qn = vecs[q], norm(vecs[q])
        probes = sorted(
            cent, key=lambda c: (-(dot(qv, cent[c]) / (qn * norm(cent[c]))), c)
        )[:nprobe]
        cand = [i for i in ids if cells[i] in probes and i != q]
        adc = sorted(
            cand,
            key=lambda i: (-(dot(qv, dq(i)) / (qn * norm(dq(i)))), i),
        )[:rerank]
        ranked = sorted(
            adc, key=lambda i: (-(dot(qv, vecs[i]) / (qn * norm(vecs[i]))), i)
        )[:k]
        for rank, i in enumerate(ranked, 1):
            out[(q, rank)] = (i, dot(qv, vecs[i]) / (qn * norm(vecs[i])))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # cell
            # draw coords from a small POOL so duplicate vectors occur
            # and the id tie-break is actually exercised. The pool is
            # deliberately DYADIC (exact binary fractions): sums and
            # products stay exact in float64, so the per-cell avg()
            # centroid is identical regardless of Spark's accumulation
            # order and probe ties resolve the same way in both
            # implementations — don't replace with arbitrary floats.
            st.lists(
                st.sampled_from([0.25, 0.5, 0.75, 1.0]), min_size=3, max_size=3
            ),
        ),
        min_size=4,
        max_size=24,
    )
)
def test_ivf_adc_topk_matches_reference(spark, data):
    """r11: the composed IVF+ADC+rerank vs a pure-Python replay of every
    stage (quantize, probe, ADC rank, exact rerank) with Spark's fold
    order and tie-breaks — including deliberate duplicate vectors."""
    from cassandra_fs_pp_spark.operators.similarity import ivf_adc_topk

    vecs = {i: v for i, (_, v) in enumerate(data)}
    cells = {i: c for i, (c, _) in enumerate(data)}
    df = spark.createDataFrame(
        [(i, cells[i], vecs[i]) for i in vecs],
        "vec_id long, label int, embedding array<double>",
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_adc_topk(
            df, k=3, nprobe=2, rerank=5, query_mod=3
        ).collect()
    }
    want = _ivf_adc_reference(
        vecs, cells, k=3, nprobe=2, rerank=5, query_mod=3
    )
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], (key, got[key], want[key])
        assert abs(got[key][1] - want[key][1]) < 1e-12


@given(corpus_strategy)
@SETTINGS
def test_kn3_perplexity_matches_reference_on_random_corpora(spark, spec):
    """r12: the trigram-KN LM vs the pure-Python reference on random
    tiny-alphabet corpora — dense trigram repeats stress every backoff
    level's continuation counts; docs under 3 tokens must drop out of
    both sides."""
    from test_text_similarity import _kn3_reference

    from cassandra_fs_pp_spark.functions.text import kn3_perplexity

    rows = [(i, " ".join(toks)) for i, toks in enumerate(spec)]
    if not any(len(t.split()) >= 3 for _, t in rows):
        return  # no trigrams anywhere: both sides are empty
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_trigrams"], r["nll_nano"], r["ppl"])
        for r in kn3_perplexity(df).collect()
    }
    assert got == _kn3_reference(rows)


@given(corpus_strategy)
@SETTINGS
def test_kn5_perplexity_matches_reference_on_random_corpora(spark, spec):
    """r13: the 5-gram-KN LM vs the pure-Python recursive reference on
    random tiny-alphabet corpora — dense n-gram repeats stress every one
    of the four backoff levels' continuation counts; docs under 5 tokens
    must drop out of both sides."""
    from test_text_similarity import _kn5_reference

    from cassandra_fs_pp_spark.functions.text import kn5_perplexity

    rows = [(i, " ".join(toks)) for i, toks in enumerate(spec)]
    if not any(len(t.split()) >= 5 for _, t in rows):
        return  # no 5-grams anywhere: both sides are empty
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_5grams"], r["nll_nano"], r["ppl"])
        for r in kn5_perplexity(df).collect()
    }
    assert got == _kn5_reference(rows)


def _ivf_pq_reference(vecs, cells, *, m, ks, iterations, k, nprobe, rerank,
                      query_mod):
    """Pure-Python IVF-PQ with Spark's exact arithmetic: quantized-integer
    training distances (ties to the lowest code), fixed-point centroid
    means replayed in the same op order (int-sum -> /1e9 -> /n),
    left-fold dots, (score desc, id/cell asc) tie-breaks.  r14: RESIDUAL
    encoding — coarse centroids are fixed-point means, codes quantize
    ``x - centroid(cell)``, and the ADC vector is centroid + residual
    reconstruction (the FAISS IVF,PQ form)."""
    import math

    SCALE = 1_000_000_000
    d = len(vecs[0])
    dsub = d // m
    ids = sorted(vecs)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def round_away(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    def qdist(sub, cent):
        return sum(
            round_away((x - c) * (x - c) * SCALE) for x, c in zip(sub, cent)
        )

    cent = {}
    for c in set(cells.values()):
        members = [i for i in ids if cells[i] == c]
        cent[c] = [
            float(sum(round_away(vecs[i][j] * SCALE) for i in members))
            / float(SCALE)
            / len(members)
            for j in range(d)
        ]
    rvecs = {
        i: [vecs[i][j] - cent[cells[i]][j] for j in range(d)] for i in ids
    }

    def subv(i, j):
        return rvecs[i][j * dsub : (j + 1) * dsub]

    cb = [[list(subv(c, j)) for c in range(ks)] for j in range(m)]

    def assign(i, j):
        ds = [qdist(subv(i, j), cb[j][c]) for c in range(ks)]
        best = min(range(ks), key=lambda c: (ds[c], c))
        return best

    for _ in range(iterations):
        codes = {(i, j): assign(i, j) for i in ids for j in range(m)}
        for j in range(m):
            for c in range(ks):
                members = [i for i in ids if codes[(i, j)] == c]
                if not members:
                    continue  # empty cell keeps previous centroid
                cb[j][c] = [
                    float(sum(round_away(subv(i, j)[p] * SCALE)
                              for i in members))
                    / float(SCALE)
                    / len(members)
                    for p in range(dsub)
                ]

    def pqv(i):
        rec = []
        for j in range(m):
            rec.extend(cb[j][assign(i, j)])
        return [c + r for c, r in zip(cent[cells[i]], rec)]

    out = {}
    for q in ids:
        if q % query_mod != 0:
            continue
        qv, qn = vecs[q], norm(vecs[q])
        probes = sorted(
            cent, key=lambda c: (-(dot(qv, cent[c]) / (qn * norm(cent[c]))), c)
        )[:nprobe]
        cand = [i for i in ids if cells[i] in probes and i != q]
        adc = sorted(
            cand,
            key=lambda i: (-(dot(qv, pqv(i)) / (qn * norm(pqv(i)))), i),
        )[:rerank]
        ranked = sorted(
            adc, key=lambda i: (-(dot(qv, vecs[i]) / (qn * norm(vecs[i]))), i)
        )[:k]
        for rank, i in enumerate(ranked, 1):
            out[(q, rank)] = (i, dot(qv, vecs[i]) / (qn * norm(vecs[i])))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # cell
            # DYADIC coordinate pool (exact binary fractions): training
            # sums/products stay exact so the fixed-point means and the
            # per-cell avg centroids are accumulation-order-free, and
            # duplicate vectors exercise every tie-break. See the ADC
            # twin test above for why NOT arbitrary floats.
            st.lists(
                st.sampled_from([0.25, 0.5, 0.75, 1.0]), min_size=4, max_size=4
            ),
        ),
        min_size=4,
        max_size=20,
    )
)
def test_ivf_pq_topk_matches_reference(spark, data):
    """r13: the composed IVF-PQ (codebook training + code assignment +
    LUT reconstruction + probe + ADC + exact rerank) vs a pure-Python
    replay of every stage with Spark's fold orders and tie-breaks —
    a third implementation beside the engine and the SQL oracle, so a
    formula error mirrored into the oracle still gets caught."""
    from cassandra_fs_pp_spark.operators.similarity import ivf_pq_topk

    vecs = {i: v for i, (_, v) in enumerate(data)}
    cells = {i: c for i, (c, _) in enumerate(data)}
    ks = 2
    if len(vecs) < ks:
        return
    df = spark.createDataFrame(
        [(i, cells[i], vecs[i]) for i in vecs],
        "vec_id long, label int, embedding array<double>",
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_pq_topk(
            df, dim=4, m=2, ks=ks, iterations=2, k=2, nprobe=2, rerank=4,
            query_mod=3,
        ).collect()
    }
    want = _ivf_pq_reference(
        vecs, cells, m=2, ks=ks, iterations=2, k=2, nprobe=2, rerank=4,
        query_mod=3,
    )
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], (key, got[key], want[key])
        assert abs(got[key][1] - want[key][1]) < 1e-12
