"""RocksDB state-store provider probe (round-11 verdict item 3).

Round 10 measured the streaming session-state law with the default
HDFSBackedStateStoreProvider and PRESCRIBED the RocksDB provider past
~10^6 active sessions/executor, extrapolating from the measured 100x
epoch-4 spike (7.3 s). This probe runs the prescription instead of
extrapolating it: the identical session workload (probe_streaming_state
.probe_sessions — gap sessions, watermark eviction, availableNow epochs)
at the 100x scale and one decade beyond (1M active keys, the named
switch point), under BOTH providers in one session on one quiet box:

  * hdfs    — default HDFSBackedStateStoreProvider (in-memory map +
              per-batch delta files; the snapshot/maintenance cost is
              what spikes at scale)
  * rocksdb — spark.sql.streaming.stateStore.providerClass =
              RocksDBStateStoreProvider (off-heap LSM; changelog
              commits, state spills to disk)

Recorded per run: per-epoch trigger wall (the spike signature),
state rows (must be identical — same semantics, different store),
state disk bytes and total wall — the state-disk/commit-time trade
the verdict asked to see. Output rows also assert the two providers
emit the SAME number of sessions (a correctness pin, not just perf).

Run alone (quiet-bench rule).
Usage: python tools/probe_rocksdb_state.py [out_json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from pyspark.sql import SparkSession  # noqa: E402

from probe_streaming_state import probe_sessions  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)

SCALES = [("100x", 2_000_000, 100_000), ("1000x", 20_000_000, 1_000_000)]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/probe_rocksdb_state.json"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe_rocksdb_state")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for label, rows, keys in SCALES:
        row = {"scale": label, "rows": rows, "keys": keys}
        for pname, pclass in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", pclass
            )
            base = tempfile.mkdtemp(prefix=f"probe_rdb_{pname}_{rows}_")
            try:
                r = probe_sessions(spark, base, rows, keys)
            finally:
                shutil.rmtree(base, ignore_errors=True)
            row[pname] = {
                "wall_s": r["wall_s"],
                "epoch_batch_ms": [e["batch_ms"] for e in r["epochs"]],
                "state_rows": [e["state_rows_total"] for e in r["epochs"]],
                "state_disk_bytes": r["state_disk_bytes"],
                "sessions_emitted": r["sessions_emitted"],
            }
            print(label, pname, json.dumps(row[pname]), flush=True)
        same = (
            row["hdfs"]["sessions_emitted"] == row["rocksdb"]["sessions_emitted"]
        )
        row["sessions_match"] = same
        results.append(row)

    Path(out_path).write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
