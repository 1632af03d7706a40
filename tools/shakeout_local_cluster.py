"""local-cluster shakeout of the heavy tail (round-11 verdict item 6).

All per-round evidence runs on ``local[32]`` — one JVM, where shuffles
are in-process memory copies and nothing ever crosses a real
serialization boundary. ``local-cluster[2,8,8192]`` launches two REAL
executor JVMs with real shuffle transport, real broadcast distribution,
and executor-side Python workers — the closest a single box gets to the
brief's 1000-executor lens, and exactly where lurking closure-capture /
serialization bugs surface.

Protocol: take the N most expensive registered queries by the latest
quiet-median bench, run each once under local[8] and once under
local-cluster[2,8,8192] (fresh session each side; same sf dir), and
compare the driver-contract value hash (order-insensitive, same
normalization as tools/oracle_check.py). Streaming/foreachBatch
lifecycles are INCLUDED deliberately — checkpoint commit and
availableNow restart across real executors is half the point.

Usage: python tools/shakeout_local_cluster.py [sf_dir] [n_queries|all]
Writes tools/shakeout_local_cluster.json. ``all`` (round-12 verdict item
6) runs the ENTIRE registry — the top-20 shakeout caught the one
Pandas-UDF deployment seam; the long tail holds the other
Python-touching paths (pydatasource, stateful kernels, multimodal).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from oracle_check import value_hash  # noqa: E402

MEDIANS = REPO / "tools" / "bench_r11b_medians.json"


def top_queries(n: int) -> list[str]:
    doc = json.loads(MEDIANS.read_text())
    qs = doc["queries"]
    return [q for q, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]


def run_side(master: str, names: list[str], sf_dir: str) -> dict[str, dict]:
    """One SparkSession per side; returns name -> {hash, rows} (or err)."""
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(master)
        .appName(f"shakeout_{master.split('[')[0]}")
        .config("spark.sql.shuffle.partitions", "8")
    )
    if master.startswith("local-cluster"):
        # real executor JVMs need their memory set explicitly; python
        # workers on executors inherit this process's interpreter
        builder = builder.config("spark.executor.memory", "6g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if master.startswith("local-cluster"):
        # Real executors do not share the driver's cwd/PYTHONPATH: any
        # Pandas-UDF closure that references the package needs it SHIPPED,
        # exactly like --py-files on a real cluster. (Found by this
        # shakeout: 19/20 heavy-tail queries are pure JVM expressions and
        # pass without this; x8_ivfpq_batch_retrieval's Arrow kernel was
        # the one ModuleNotFoundError.)
        import shutil
        import tempfile

        pkg = REPO / "apache_spark_streaming_project_spark"
        zip_base = Path(tempfile.mkdtemp(prefix="shakeout_pkg_")) / "pkg"
        shutil.make_archive(str(zip_base), "zip", REPO, pkg.name)
        spark.sparkContext.addPyFile(str(zip_base) + ".zip")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            out[name] = {
                "rows": len(rows),
                "hash": value_hash(df.columns, rows),
            }
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:300]}
        print(f"  {master.split('[')[0]:14s} {name}: {out[name].get('rows', 'ERR')}", flush=True)
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    arg = sys.argv[2] if len(sys.argv) > 2 else "20"
    if arg == "all":
        import __spark_entry__ as entry_mod

        names = sorted(entry_mod.queries())
        print(f"FULL registry: {len(names)} queries")
    elif "," in arg or not arg.isdigit():
        names = arg.split(",")
        print(f"explicit: {names}")
    else:
        n = int(arg)
        names = top_queries(n)
        print(f"heavy tail ({n}): {names}")

    local = run_side("local[8]", names, sf_dir)
    cluster = run_side("local-cluster[2,8,8192]", names, sf_dir)

    report = {"sf_dir": sf_dir, "queries": {}}
    mismatches = 0
    for name in names:
        a, b = local[name], cluster[name]
        ok = "hash" in a and "hash" in b and a["hash"] == b["hash"]
        if not ok:
            mismatches += 1
        report["queries"][name] = {"local": a, "cluster": b, "match": ok}
        print(f"{'OK  ' if ok else 'FAIL'} {name}")
    report["mismatches"] = mismatches
    Path("tools/shakeout_local_cluster.json").write_text(
        json.dumps(report, indent=1)
    )
    print(f"wrote tools/shakeout_local_cluster.json; mismatches={mismatches}")
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
