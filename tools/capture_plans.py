"""Capture `.explain("formatted")` for bench HEADLINE queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (guide §1: measure first; the judge checks plan claims
against these files).

Usage: python tools/capture_plans.py <tag> <suffix> [name ...]
  e.g. python tools/capture_plans.py r12 before
       python tools/capture_plans.py r12 after kcore_decomposition
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    tag, suffix = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]

    from bench import HEADLINE
    from real_time_big_data_iot_monitoring_pipeline_spark.plans import REGISTRY
    from real_time_big_data_iot_monitoring_pipeline_spark.session import get_session

    names = only or HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].build(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        joins = sorted(
            {
                j
                for j in (
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin",
                    "CartesianProduct",
                )
                if j in plan
            }
        )
        py = sorted(
            {
                p
                for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow", "FlatMapGroupsInPandas")
                if p in plan
            }
        )
        print(f"{name}: exchanges={n_ex} joins={joins} python={py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
