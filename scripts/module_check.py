"""Fast iteration CLI for module-pipeline golden parity.

    python scripts/module_check.py <module> <fileset> [fixture ...]

Runs every shipped fixture of the fileset through the compiled
pipeline (`beats_spark/module_fixtures.py` harness) and prints the
per-fixture mismatch count plus the first few mismatching fields.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from beats_spark.module_fixtures import diff_rows, fixture_names, run_fixture


def main() -> int:
    module, fileset = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [n + ".log" if not n.endswith((".log", ".json"))
                             else n for n in fixture_names(module, fileset)]
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        try:
            got, expected, spec = run_fixture(spark, module, fileset, name)
            bad = diff_rows(got, expected, spec.compare_timestamp)
        except Exception as e:  # noqa: BLE001 — iteration tool
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            rc = 1
            continue
        print(f"{name}: {len(expected)} events, {len(bad)} mismatches")
        for m in bad[:12]:
            print("   ", m)
        rc = rc or (1 if bad else 0)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
