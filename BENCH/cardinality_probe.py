"""Exact vs HLL cardinality: measured shuffle volume (VERDICT r04 item 6).

The claim to evidence: ES's `cardinality` agg is HLL BY DESIGN because
an exact per-bucket distinct must shuffle every distinct (bucket,
value) pair surviving map-side partial dedup — data-DEPENDENT volume —
while `approx_count_distinct` shuffles one fixed-size HLL++ sketch per
(map partition × bucket): data-INDEPENDENT.  This probe runs the same
date-histogram-shaped aggregation (30 day buckets, 200k distinct users,
12M events — deterministic from spark.range, no external data) both
ways and reads actual shuffle write bytes/records from the Spark REST
status API (the UI's numbers, not an estimate).

Usage: python BENCH/cardinality_probe.py [n_rows]   (one JSON line)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
DAYS, USERS = 30, 200_000


def shuffle_totals(ui: str) -> tuple[int, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
    by = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    rec = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    return by, rec


def run_one(mode: str) -> dict:
    # session.get_spark disables the UI (and with it the REST status
    # API); this probe needs the API, so it builds its own session
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"card_{mode}")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    ev = spark.range(N, numPartitions=32).select(
        F.pmod(F.col("id"), F.lit(DAYS)).alias("day"),
        F.pmod(F.xxhash64("id"), F.lit(USERS)).alias("user_id"),
    )
    agg = (F.approx_count_distinct("user_id", 0.05) if mode == "approx"
           else F.countDistinct("user_id"))
    t0 = time.time()
    rows = ev.groupBy("day").agg(agg.alias("users")).collect()
    wall = time.time() - t0
    by, rec = shuffle_totals(spark.sparkContext.uiWebUrl)
    total_users = sum(r["users"] for r in rows)
    spark.stop()
    return {"mode": mode, "wall_sec": round(wall, 3),
            "shuffle_bytes": by, "shuffle_records": rec,
            "sum_bucket_users": total_users}


def main() -> None:
    # each mode in its own SparkSession/app so REST totals attribute
    # cleanly; sessions run sequentially in one process (the generate
    # stage is identical and shuffle-free — spark.range + projections)
    exact = run_one("exact")
    approx = run_one("approx")
    print(json.dumps({
        "n_rows": N, "days": DAYS, "distinct_users": USERS,
        "exact": exact, "approx": approx,
        "bytes_ratio": round(exact["shuffle_bytes"]
                             / max(approx["shuffle_bytes"], 1), 1),
        "records_ratio": round(exact["shuffle_records"]
                               / max(approx["shuffle_records"], 1), 1),
    }))


if __name__ == "__main__":
    main()
