"""VERDICT r10 item 3 probe: transformWithStateInPandas (Spark 4.x TWS)
vs applyInPandasWithState framework overhead on the many-tiny-groups
drain that SCALE.md r10 measured at ~2 ms/group.

Workload: the causal target-encode fold (two-long state per key) over
N_GROUPS keys x ROWS_PER_GROUP rows, drained availableNow — the exact
shape of the stream_target_encode 64x probe (48k groups -> 92 s vs the
batch twin's 2.9 s). Both variants compute identical output (asserted);
the only difference is the stateful-operator API and its state store
(TWS requires RocksDB; AIPWS runs the default HDFS-backed store, and is
also probed on RocksDB to separate API cost from store cost).

Usage: python scripts/probe_tws.py [n_groups] [rows_per_group]
Prints one JSON line per variant: {"variant": ..., "wall_s": ..., ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from cassandra_fs_pp_spark.session import get_spark  # noqa: E402
from cassandra_fs_pp_spark.streaming.filestream import (  # noqa: E402
    run_available_now,
    target_encode_prefix_stateful,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)

OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("k", LongType()),
        StructField("cents", LongType()),
        StructField("prefix_cents_mean", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("s", LongType()), StructField("n", LongType())]
)


def _make_input(n_groups: int, rows_per_group: int) -> str:
    d = tempfile.mkdtemp(prefix="tws_probe_")
    n = n_groups * rows_per_group
    rng = np.arange(n, dtype="int64")
    pdf = pd.DataFrame(
        {
            # ts strictly increasing within each key (in-order contract)
            "event_id": rng,
            "ts": rng,
            "k": rng % n_groups,
            "cents": (rng * 37) % 10_000,
        }
    )
    pdf.to_parquet(os.path.join(d, "part-0.parquet"), index=False)
    return d


def _stream(spark, path: str):
    schema = (
        "event_id long, ts long, k long, cents long"
    )
    return spark.readStream.schema(schema).parquet(path)


def _fold(pdf: pd.DataFrame, s: int, n: int):
    """Shared vectorized prefix-mean fold (identical to the operator's)."""
    pdf = pdf.sort_values(["ts", "event_id"])
    c = pdf["cents"].to_numpy(dtype="int64")
    cs = np.cumsum(c)
    prior = s + np.concatenate(([0], cs[:-1])) if len(c) else cs
    cnt = n + np.arange(len(c), dtype="int64")
    with np.errstate(divide="ignore", invalid="ignore"):
        means = np.where(cnt > 0, prior.astype("float64") / cnt, np.nan)
    out = pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy(),
            "cents": c,
            "prefix_cents_mean": means,
        }
    )
    if len(c):
        s += int(cs[-1])
        n += len(c)
    return out, s, n


def run_aipws(spark, path: str):
    df = _stream(spark, path)
    return run_available_now(
        target_encode_prefix_stateful(
            df, key_cols=["k"], ts_col="ts", id_col="event_id"
        )
    )


def run_tws(spark, path: str):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PrefixEncode(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._st.exists():
                s, n = self._st.get()
            else:
                s, n = 0, 0
            for pdf in rows:
                out, s, n = _fold(pdf, s, n)
                out.insert(1, "k", key[0])
                yield out
            self._st.update((s, n))

        # close(): the base class ships a no-op default — no override
        # needed (nothing to tear down; state lives in the store).

    df = _stream(spark, path)
    return run_available_now(
        df.groupBy("k").transformWithStateInPandas(
            PrefixEncode(),
            outputStructType=OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def main() -> None:
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
    rows_per_group = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("tws-probe")
    path = _make_input(n_groups, rows_per_group)
    n_rows = n_groups * rows_per_group

    results = {}
    variants = [
        ("aipws_hdfs", run_aipws, HDFS),
        ("aipws_rocksdb", run_aipws, ROCKSDB),
    ]
    # TWS's Python runner is a protobuf service (pyspark's generated
    # stubs import google.protobuf at worker init); without the runtime
    # the query crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION_
    # FAILURE. Probe it only where the dependency exists — the same
    # honest environment gate as the h5py-dependent HDF5 corners.
    try:
        import google.protobuf  # noqa: F401

        variants.append(("tws_rocksdb", run_tws, ROCKSDB))
    except ImportError:
        print(
            json.dumps(
                {
                    "variant": "tws_rocksdb",
                    "skipped": "google.protobuf not installed; "
                    "transformWithStateInPandas runner requires it",
                }
            ),
            flush=True,
        )
    outputs = {}
    for name, fn, provider in variants:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = fn(spark, path)
            rows = out.collect()
            best = min(best, time.time() - t0)
        outputs[name] = sorted(
            (r["event_id"], r["k"], r["cents"], r["prefix_cents_mean"])
            for r in rows
        )
        results[name] = best
        print(
            json.dumps(
                {
                    "variant": name,
                    "wall_s": round(best, 2),
                    "ms_per_group": round(best * 1000.0 / n_groups, 3),
                    "n_groups": n_groups,
                    "n_rows": n_rows,
                }
            ),
            flush=True,
        )

    # drain parity: every variant computes the identical encoding
    assert outputs["aipws_hdfs"] == outputs["aipws_rocksdb"]
    summary = {"parity": True}
    if "tws_rocksdb" in results:
        assert outputs["aipws_hdfs"] == outputs["tws_rocksdb"], "mismatch"
        summary["speedup_tws_vs_aipws"] = round(
            results["aipws_hdfs"] / results["tws_rocksdb"], 2
        )
    print(json.dumps(summary))
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
