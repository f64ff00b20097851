"""Profile one or more declared queries: wall, JVM exec_ms, top stages,
and .explain('formatted') saved to plans/r10/<name>_<tag>.txt.

Usage: python tools/profile_query.py [--tag before|after] [--repeat N] name...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    tag = "probe"
    repeat = 1
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from graphdb_neo4j_spark import get_spark
    from graphdb_neo4j_spark.workloads import QUERY_FNS

    spark = get_spark(
        "profile",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    ep = f"{ui}/api/v1/applications/{app}/stages?status=complete"

    def stages():
        with urllib.request.urlopen(ep, timeout=10) as r:
            return json.load(r)

    plans_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
    )
    plans_dir.mkdir(parents=True, exist_ok=True)

    # warm the input tables (not counted)
    from graphdb_neo4j_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).count()

    for name in names:
        for r_i in range(repeat):
            seen = {s["stageId"] for s in stages()}
            df = QUERY_FNS[name](spark, SF_DIR)
            if r_i == 0:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                (plans_dir / f"{name}_{tag}.txt").write_text(plan)
            spark.sparkContext.setJobDescription(f"{name} run{r_i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            time.sleep(1.0)
            new = [s for s in stages() if s["stageId"] not in seen]
            tot = sum(s.get("executorRunTime", 0) for s in new)
            cpu = sum(int(s.get("executorCpuTime", 0)) // 1_000_000 for s in new)
            print(
                f"== {name} run{r_i}: wall={wall:.2f}s exec={tot}ms "
                f"cpu={cpu}ms stages={len(new)}"
            )
            for s in sorted(
                new, key=lambda s: -s.get("executorRunTime", 0)
            )[:12]:
                print(
                    f"   stage {s['stageId']:>4} exec={s['executorRunTime']:>8} "
                    f"cpu={int(s.get('executorCpuTime',0))//1_000_000:>8} "
                    f"tasks={s.get('numCompleteTasks')} "
                    f"in={s.get('inputBytes',0)>>20}MB "
                    f"sh_r={s.get('shuffleReadBytes',0)>>20}MB "
                    f"sh_w={s.get('shuffleWriteBytes',0)>>20}MB "
                    f"gc={s.get('jvmGcTime',0)}ms  "
                    f"{(s.get('description') or s.get('name',''))[:80]}"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
