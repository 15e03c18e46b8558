"""Round-6 optimization measurement harness (bench.py is FROZEN; this
file holds the extra instrumentation the optimization guide asks for).

- isolates individual declared queries with the noop sink (guide 1.4)
  so the computation is timed, not the collect/count sink;
- labels jobs (guide 1.5);
- optionally dumps .explain("formatted") per query to plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--explain TAG] q1 q2 ...

With --explain TAG each query's formatted plan is written to
plans/r06/<query>_<TAG>.txt (and the query still timed).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    repeats = 2
    explain_tag = None
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    if "--explain" in args:
        i = args.index("--explain")
        explain_tag = args[i + 1]
        del args[i : i + 2]
    names = args

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from raster_tools_spark import queries as Q
    from raster_tools_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(master=f"local[{cpus}]", app_name="bench_extra")
    qcat = Q.queries()
    timings = {}
    try:
        for name in names:
            fn = qcat[name]
            if explain_tag:
                os.makedirs("plans/r06", exist_ok=True)
                df = fn(spark, sf_dir)
                with open(f"plans/r06/{name}_{explain_tag}.txt", "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
            best = None
            for r in range(repeats):
                spark.sparkContext.setJobDescription(f"{name} run{r}")
                t0 = time.time()
                (fn(spark, sf_dir).write.format("noop")
                 .mode("overwrite").save())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
            timings[name] = round(best, 3)
            print(f"  {name:28s} {best:8.3f} s", file=sys.stderr)
        print(json.dumps({"sf": sf_dir, "noop_best": timings,
                          "loadavg": os.getloadavg()[0]}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
