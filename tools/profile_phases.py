"""Phase-level wall-clock profiler for the heavy streaming-lifecycle
queries (guide §1: measure first, isolate with the noop sink).

Monkeypatches the shared lifecycle seams (_write_epoch_waves /
_drain_waves / the per-batch operator bodies) with timing wrappers, runs
each named query exactly as bench.py does (fn + noop write), and prints a
per-phase breakdown: fixture build+write, per-micro-batch body time,
stream-machinery residue, final read + noop.

Usage: python tools/profile_phases.py m14b_streaming_threshold_dedup ...
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from apache_spark_streaming_project_spark import get_spark  # noqa: E402
from apache_spark_streaming_project_spark import entry_queries as eq  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/sparklogs"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "profile_phases",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
        },
    )
    # warm-up identical to bench.py
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        spark.read.parquet(str(p)).limit(1).count()
    warm = eq.QUERIES["s25_priority_stats"].fn(spark, sf_dir)
    warm.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    phases: dict[str, list[float]] = {}

    def timed(tag, fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                phases.setdefault(tag, []).append(time.perf_counter() - t0)

        return wrapper

    # lifecycle seams
    eq._write_epoch_waves = timed("write_waves", eq._write_epoch_waves)
    orig_drain = eq._drain_waves

    def drain_wrapper(spark_, in_dir, ckpt, body, schema):
        t0 = time.perf_counter()
        orig_drain(spark_, in_dir, ckpt, timed("batch_body", body), schema)
        phases.setdefault("drain_total", []).append(time.perf_counter() - t0)

    eq._drain_waves = drain_wrapper

    for name in names:
        phases.clear()
        spec = eq.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t_fn = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t1
        spark.catalog.clearCache()
        body = phases.get("batch_body", [])
        drain = sum(phases.get("drain_total", []))
        out = {
            "query": name,
            "total": round(t_fn + t_noop, 2),
            "fn": round(t_fn, 2),
            "final_noop": round(t_noop, 2),
            "write_waves": round(sum(phases.get("write_waves", [])), 2),
            "drain_total": round(drain, 2),
            "n_batches": len(body),
            "batch_bodies": [round(x, 2) for x in body],
            "stream_machinery": round(drain - sum(body), 2),
        }
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
