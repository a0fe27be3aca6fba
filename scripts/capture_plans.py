"""Capture .explain("formatted") for declared queries into plans/<dir>
($FF_PLANS_DIR, default plans/r14).

Usage: python scripts/capture_plans.py <suffix> [query ...]
e.g. python scripts/capture_plans.py before lm_family dedup_ids

Plans are captured at sf0.01 (plan SHAPE is scale-invariant for these
queries; building at sf0.1 pays full fit cost per capture). Suffix
"before"/"after" matches the judge's expected file names.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get(
    "FF_PLANS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "plans", "r14"),
)


def main() -> int:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    os.environ.setdefault("FF_APPROX_QUANTILES", "1")
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    suffix = sys.argv[1]
    names = sys.argv[2:] or list(entry.queries())
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ff-capture-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    qs = entry.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building {name}: {e}"
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
        entry.release_fitted_frames()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
