"""Isolated re-measure of named bench entries, bracketed by the frozen
calibration probe (round 12, VERDICT r11 ask #6): run the calibration
probe, then each named query with the exact bench methodology (AQE off,
plan-once/execute-hot, min-of-warm, cache cleared per attempt), then
the probe again — so the reading can be normalized against host load
taken immediately around it, separating hypervisor drift from plan
regressions for sub-2s entries.

Usage: python tools/isolated_measure.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from priority_data_pipeline_azure_sql_db_spark.queries import QUERIES  # noqa: E402
from priority_data_pipeline_azure_sql_db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_probe(spark) -> float:
    # the FROZEN bench.py calibration probe, verbatim work size
    probe = spark.range(0, 800_000_000, 1, 32).select(
        F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000))).alias("h"))
    attempts = []
    for _ in range(6):
        t0 = time.time()
        probe.write.format("noop").mode("overwrite").save()
        attempts.append(round(time.time() - t0, 3))
    best = min(attempts[1:])
    print(f"[isolated] calibration attempts={attempts} best={best:.3f}",
          file=sys.stderr)
    return best


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: isolated_measure.py <query> [...]")
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("isolated-measure",
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.range(1).count()
    calib_before = run_probe(spark)
    out: dict[str, float] = {}
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        attempts: list[float] = []
        for attempt in range(9):
            spark.catalog.clearCache()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            attempts.append(round(time.time() - t0, 3))
        best = min(attempts[1:])
        print(f"[isolated] {name}: attempts={attempts} best={best:.3f}",
              file=sys.stderr)
        out[name] = best
    calib_after = run_probe(spark)
    print(json.dumps({
        "sf_dir": SF_DIR,
        "calibration_before": calib_before,
        "calibration_after": calib_after,
        "queries": out,
        "per_calib": {n: round(v / calib_before, 2) for n, v in out.items()},
    }))


if __name__ == "__main__":
    main()
