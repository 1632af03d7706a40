"""Parse a Spark event log (rolling dir layout, zstd) produced by
profile_phases.py and attribute job wall-time vs driver gaps per query
(jobs are labelled profile:<query> via setJobDescription).

Usage: python tools/evlog_jobs.py /tmp/sparklogs
"""

from __future__ import annotations

import glob
import json
import subprocess
import sys
from collections import defaultdict


def main() -> None:
    evdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparklogs"
    files = sorted(glob.glob(f"{evdir}/*/events_*"))
    jobs = []
    for f in files:
        if f.endswith(".zstd"):
            raw = subprocess.run(
                ["zstd", "-dc", f], capture_output=True, check=True
            ).stdout.decode()
        else:
            raw = open(f).read()
        for line in raw.splitlines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e["Event"] == "SparkListenerJobStart":
                jobs.append(
                    {
                        "id": e["Job ID"],
                        "t0": e["Submission Time"],
                        "desc": e.get("Properties", {}).get(
                            "spark.job.description", ""
                        ),
                        "nstages": len(e["Stage Infos"]),
                    }
                )
            elif e["Event"] == "SparkListenerJobEnd":
                for j in jobs:
                    if j["id"] == e["Job ID"]:
                        j["t1"] = e["Completion Time"]
    per = defaultdict(lambda: {"n": 0, "job_s": 0.0, "gap_s": 0.0, "stages": 0})
    jobs.sort(key=lambda j: j["t0"])
    prev_end = None
    prev_desc = None
    for j in jobs:
        d = j["desc"] or "(none)"
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000
        p = per[d]
        p["n"] += 1
        p["job_s"] += dur
        p["stages"] += j["nstages"]
        if prev_end is not None and prev_desc == d:
            p["gap_s"] += max(0.0, (j["t0"] - prev_end) / 1000)
        prev_end = j.get("t1", j["t0"])
        prev_desc = d
    for d, p in sorted(per.items(), key=lambda kv: -(kv[1]["job_s"] + kv[1]["gap_s"])):
        print(
            f'{p["job_s"] + p["gap_s"]:7.2f}s  jobs={p["n"]:3d} stages={p["stages"]:4d} '
            f'exec={p["job_s"]:6.2f}s gaps={p["gap_s"]:6.2f}s  {d[:70]}'
        )


if __name__ == "__main__":
    main()
