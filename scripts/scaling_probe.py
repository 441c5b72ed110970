"""Quick scaling probe (dev tool): same crawl at two core counts."""
import json
import subprocess
import sys

CODE = '''
import os, time, tempfile, sys
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "56g")
sys.path.insert(0, "/root/repo")
from arxiv_crawler_spark.session import get_spark
from arxiv_crawler_spark.crawl import CrawlConfig, CrawlEngine
from arxiv_crawler_spark.fixtures import arxiv_id_of
import bench
cores, docs, wave, rounds = {cores}, {docs}, {wave}, {rounds}
spark = get_spark(master=f"local[{cores}]", shuffle_partitions={cores})
spark.sparkContext.setLogLevel("ERROR")
pages = bench.synth_pages(spark, docs).repartition(4 * {cores})
if docs <= 400000: pages = pages.cache()
pages.count()
cfg = CrawlConfig(mode="wave", max_papers=docs, wave_size=wave, round_seconds=1e9, n_buckets=32, exact_lineage={lineage})
eng = CrawlEngine(spark, tempfile.mkdtemp(), pages, cfg)
eng.bootstrap([arxiv_id_of(i) for i in range(0, docs, max(1, docs // wave))])
eng.run_round(); eng.run_round()  # two warm rounds excluded (JIT drift)
t=time.monotonic(); rs = eng.run(max_rounds=rounds); dt=time.monotonic()-t
pops = sum(r.waved for r in rs)
print("RESULT", pops, round(dt,1), round(pops/dt,1))
for r in rs: print("  round", r.round_no, r.waved, round(r.seconds,1))
'''


def run(cores, docs, wave, rounds, lineage=False):
    out = subprocess.run(
        [sys.executable, "-c", CODE.format(cores=cores, docs=docs, wave=wave, rounds=rounds, lineage=lineage)],
        capture_output=True, text=True, timeout=1800,
    )
    res = None
    for ln in out.stdout.splitlines():
        print(ln)
        if ln.startswith("RESULT"):
            res = ln.split()[1:]
    if res is None:
        print(out.stdout[-1500:], out.stderr[-2500:])
        raise SystemExit(1)
    return res


if __name__ == "__main__":
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    wave = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    r32 = run(32, docs, wave, rounds)
    r8 = run(8, docs, wave, rounds)
    eff = float(r32[2]) / (4 * float(r8[2]))
    print(json.dumps({"local32_urls_s": float(r32[2]), "local8_urls_s": float(r8[2]), "efficiency": round(eff, 3)}))
