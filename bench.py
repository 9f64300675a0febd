#!/usr/bin/env python
"""Benchmark harness: run the suite's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from magmapandas_spark.relational import suite
    from magmapandas_spark.session import get_spark

    spark = get_spark(app_name="magmapandas-bench")

    # warm the JVM/IO/codegen path once so the first timed query
    # measures steady-state execution, not classloading
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the Python/Arrow worker pool too — otherwise the first
    # pandas-UDF query in the run is charged ~1 worker spawn per core
    def _identity(it):
        yield from it

    spark.range(256).repartition(32).mapInPandas(
        _identity, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in suite.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop write materializes the FULL plan (incl. sorts that
        # count() would optimize away)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        n = -1
        timings[name] = round(dt, 4)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
