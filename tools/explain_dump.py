"""Dump `.explain("formatted")` for headline queries to plans/r19/.

Usage:
    python tools/explain_dump.py <suffix> [query ...]

Writes plans/r19/<query>_<suffix>.txt for each named query (default: every
headline query in bench.py that is a plain registry query).  Construction
runs any eager driver-side work the operator does; the file captures the
final DataFrame's formatted physical plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTRA, HEADLINE  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kusuma_metamorph_etl_spark import registry
    from kusuma_metamorph_etl_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    if not names:
        names = [n for n in HEADLINE if n not in EXTRA]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r19"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name in EXTRA:
            print(f"{name}: EXTRA (no single plan), skipped")
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc}")
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: ok ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
