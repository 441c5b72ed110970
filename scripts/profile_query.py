"""Per-stage profile of one headline query (round-7 optimization, guide §1).

Runs the query exactly as bench.py does (.count()), with the Spark UI
enabled, then dumps per-stage wall/task times and shuffle bytes from the
REST API so the expensive operator is identifiable without a browser.

Usage: python scripts/profile_query.py q88_lm_perplexity [sf_dir] [--noop]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf1.0"
    noop = "--noop" in sys.argv

    from arxiv_crawler_spark.session import get_spark
    from arxiv_crawler_spark.plans.analytics import SPARK_QUERIES

    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/readers on a trivial action so the profile is not JIT
    spark.read.parquet(f"{sf}/documents.parquet").limit(1).count()

    spark.sparkContext.setJobDescription(name)
    df = SPARK_QUERIES[name](spark, sf)
    t0 = time.monotonic()
    if noop:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.count()
    wall = time.monotonic() - t0
    print(f"== {name} wall {wall:.3f}s (noop={noop}) ==")

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    tot_run = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"stages: {len(stages)}, total executorRunTime {tot_run/1000:.2f}s")
    for s in stages[:20]:
        sub = time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        comp = time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        print(
            f"stage {s['stageId']:>3} att{s['attemptId']} tasks={s['numCompleteTasks']:>4} "
            f"run={s['executorRunTime']/1000:7.2f}s cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
            f"wall~{time.mktime(comp)-time.mktime(sub):5.0f}s "
            f"shufR={s.get('shuffleReadBytes',0)/1e6:8.1f}MB shufW={s.get('shuffleWriteBytes',0)/1e6:8.1f}MB "
            f"in={s.get('inputBytes',0)/1e6:8.1f}MB | {s['name'].splitlines()[0][:70]}"
        )
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    print(f"jobs: {len(jobs)}")


if __name__ == "__main__":
    main()
