"""Fresh-JVM isolated per-query benchmark (the VERDICT r7/r8 A/B
protocol, now a committed tool): one subprocess per query, each with its
own SparkSession, one warm-up query, then N timed reps — removes the
in-session cache/JIT interference `bench.py`'s shared session carries.

    python tools/isolated_reps.py scd2_merge stream_session --reps 5
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
name, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
from kusuma_metamorph_etl_spark import registry
from kusuma_metamorph_etl_spark.session import get_session
spark = get_session()
spark.sparkContext.setLogLevel("ERROR")
qs = registry.queries()
qs["agg_groupby_single"](spark, sf_dir).write.mode("overwrite").format("noop").save()
runs = []
for _ in range(reps):
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    runs.append(round(time.perf_counter() - t0, 3))
print("ISOLATED_RESULT " + json.dumps({"query": name, "reps": runs}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    results = {}
    for name in args.queries:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, name, args.sf_dir, str(args.reps)],
            capture_output=True,
            text=True,
            timeout=900,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("ISOLATED_RESULT ")),
            None,
        )
        if line is None:
            print(f"{name}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            return 1
        payload = json.loads(line[len("ISOLATED_RESULT "):])
        reps = payload["reps"]
        med = sorted(reps)[len(reps) // 2]
        results[name] = {"reps": reps, "median": med, "min": min(reps)}
        print(f"{name}: median={med} min={min(reps)} reps={reps}")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
