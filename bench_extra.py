"""Round-7 optimization harness (bench.py is frozen — guide §1).

Times each headline query exactly like bench.py (``.count()``), optionally
with a noop-sink isolation run (``--noop``: full-column materialization per
guide §1.4), and captures ``.explain("formatted")`` into plans/r07/.

Usage:
  python bench_extra.py [--sf DIR] [--queries q88,q90] [--plans SUFFIX]
                        [--noop] [--repeat N]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None, help="comma list; default = bench.py HEADLINE")
    ap.add_argument("--plans", default=None, help="write plans/r07/<q>_<SUFFIX>.txt")
    ap.add_argument("--noop", action="store_true", help="time via noop sink instead of count()")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    from bench import HEADLINE
    from arxiv_crawler_spark.session import get_spark
    from arxiv_crawler_spark.plans.analytics import SPARK_QUERIES

    names = args.queries.split(",") if args.queries else list(HEADLINE)
    spark = get_spark(app_name="bench-extra-r07")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        if args.plans:
            df = SPARK_QUERIES[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "plans", "r07", f"{name}_{args.plans}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        ts = []
        for _ in range(args.repeat):
            # time construction + action, exactly like bench.py (iterative
            # operators run driver-side jobs during construction)
            t0 = time.monotonic()
            df = SPARK_QUERIES[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = ts
        print(json.dumps({"q": name, "sec": ts}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "noop": args.noop, "all": out}))


if __name__ == "__main__":
    main()
