"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q_star_join": sec, ...}, "sf": <float>}

Execution is forced through the `noop` sink so timings measure the engine
(scan+shuffle+compute), not py4j row transfer to the driver. One warm-up
run amortizes JVM/codegen startup out of the first measured query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nyc_bikeshare_datawarehouse_spark.plans.queries import QUERIES
from nyc_bikeshare_datawarehouse_spark.session import get_spark

#: Headline set: the star-schema analytical spine + one of each extension
#: family (dedup, text, embeddings, events/time). LSH pair-join queries are
#: excluded — they are candidate-generation utilities, not per-round
#: latency benchmarks.
HEADLINE = [
    "q_star_join",
    "q_self_role_join",
    "q_agg_monthly",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q6",
    "q_rollup",
    "q_topk",
    "q_subtract",
    "q_unpivot",
    "q_window_rank",
    "q_window_running",
    "q_tumbling_hour",
    "q_sessionize",
    "q_asof_join",
    "q_range_bucket_join",
    "q_json_extract",
    "q_dedup_exact",
    "q_text_tokens",
    "q_text_stats",
    "q_cosine_topk",
]


def run_query(spark, name: str, sf_dir: str, repeats: int = 2) -> float:
    """Best-of-N execution time through the noop sink. Best-of damps
    run-to-run system noise (~15% observed between back-to-back full
    runs) so cross-round comparisons track plan changes, not load."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    spark = get_spark("bench")
    # warm-up: JVM JIT + codegen + parquet footer caches
    run_query(spark, "q_star_join", sf_dir, repeats=1)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_query(spark, name, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
