"""Registry-wide plan + timing audit (optimization-round tooling).

For every registered query at $SPARK_GRAFT_SF_DIR: build the DataFrame,
capture the formatted physical plan, extract shape signals (Exchange
count, join strategies, Python-eval nodes, cartesian products, scan
pushdown), and optionally execute through the noop sink with wall-clock
timing. One JSON line per query to the output file.

Usage:
    python tools/audit_plans.py out.jsonl [--run] [--sf DIR] [name ...]

Plan-only (default) is cheap (driver-side analysis). --run executes each
query through the noop sink and records seconds — run it on an idle box.
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, ".")


def plan_signals(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b(?! hashpartitioning REUSED)", plan))
        - len(re.findall(r"ReusedExchange", plan)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "python_eval": len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan)),
        "map_in_arrow": len(re.findall(r"MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "generates": len(re.findall(r"\bGenerate\b", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed_any": bool(re.search(r"PushedFilters: \[(?!\])", plan)),
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = args.pop(0) if args and not args[0].startswith("--") else "/tmp/audit.jsonl"
    run = "--run" in args
    args = [a for a in args if a != "--run"]
    sf = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    only = set(args)

    from sinker_spark.queries import REGISTRY, _load
    from sinker_spark.session import get_spark

    _load()
    spark = get_spark("audit")
    spark.range(1).count()
    from sinker_spark.catalog import load_tables

    for df in load_tables(spark, sf).values():
        df.limit(1).count()

    names = [n for n in REGISTRY if not only or n in only]
    with open(out_path, "w") as fh:
        for i, name in enumerate(names):
            row: dict = {"name": name}
            try:
                t0 = time.perf_counter()
                df = REGISTRY[name].fn(spark, sf)
                row["build_s"] = round(time.perf_counter() - t0, 3)
                plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                row.update(plan_signals(plan))
                if run:
                    spark.sparkContext.setJobDescription(f"audit: {name}")
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    row["run1_s"] = round(time.perf_counter() - t0, 3)
                    # second (warm) run: codegen + file listing amortized
                    df2 = REGISTRY[name].fn(spark, sf)
                    t0 = time.perf_counter()
                    df2.write.format("noop").mode("overwrite").save()
                    row["run2_s"] = round(time.perf_counter() - t0, 3)
                    spark.sparkContext.setJobDescription(None)
            except Exception as ex:  # noqa: BLE001
                row["error"] = f"{type(ex).__name__}: {ex}"[:300]
            fh.write(json.dumps(row) + "\n")
            fh.flush()
            if (i + 1) % 25 == 0:
                print(f"{i + 1}/{len(names)}", file=sys.stderr)
    print(f"wrote {out_path} ({len(names)} queries)")


if __name__ == "__main__":
    main()
