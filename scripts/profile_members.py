"""Per-member timing breakdown for the family queries (guide §1: measure
first). For each requested family, every member's build (fits + eager
audits) and noop materialization are timed SEPARATELY and sequentially,
so the numbers attribute the family's wall time to specific members —
the bench's concurrent member builds hide which member is the straggler.

Usage: python scripts/profile_members.py [family ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    os.environ.setdefault("FF_APPROX_QUANTILES", "1")
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ff-profile-members")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in entry.TABLES:
        if t == "events":
            entry._events(spark, SF_DIR).count()
        else:
            entry._t(spark, SF_DIR, t).count()
    # warm python workers/Arrow like bench.py
    spark.range(int(CPUS) * 4).repartition(int(CPUS)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    wanted = sys.argv[1:] or list(entry._FAMILY_DOC)
    out: dict[str, dict[str, dict[str, float]]] = {}
    for fam in wanted:
        fn = entry._REGISTRY[fam][0]
        specs = fn.__defaults__[0] if fn.__defaults__ else None
        if not specs:  # standalone query, time it whole
            specs = [(fam, fn, None, None, None)]
        out[fam] = {}
        for op, mfn, *_ in specs:
            spark.sparkContext.setJobDescription(f"{fam}:{op}")
            t0 = time.perf_counter()
            try:
                df = mfn(spark, SF_DIR)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                out[fam][op] = {
                    "build": round(t1 - t0, 3),
                    "mat": round(t2 - t1, 3),
                    "total": round(t2 - t0, 3),
                }
            except Exception as e:  # noqa: BLE001
                out[fam][op] = {"error": str(e)[:200]}  # type: ignore[dict-item]
            finally:
                entry.release_fitted_frames()
                spark.sparkContext._jvm.System.gc()
            print(f"{fam:22s} {op:28s} {json.dumps(out[fam][op])}", flush=True)
    with open("/tmp/profile_members.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
