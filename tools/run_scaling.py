"""Two-parallelism scaling evidence (sandbox protocol for the north
rule's N -> 4N executor criterion): run the identical index-build +
task-set workload at local[8] and local[32] in separate JVMs, assert the
top-k results are rank-identical across parallelism, and report
throughput at both plus scaling efficiency into BENCH/BASELINE.md.

Usage: python tools/run_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from iresearch_spark.corpus import generate_pages
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import And, Or, Phrase, Prefix, SearchEngine, Term
from iresearch_spark.session import get_spark

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2])
spark = get_spark(f"scaling-{cpus}", cores=cpus, shuffle_partitions=cpus)
pages = generate_pages(spark, n_pages, seed=42).cache()
pages.count()  # exclude generation from build timing

t0 = time.perf_counter()
idx = build_index(pages, id_col=None, sort_key="url", analyzer="segmentation",
                  seg_bits=10)
idx.cache(); idx.postings.count(); idx.term_stats.count(); idx.docs.count()
t_build = time.perf_counter() - t0

engine = SearchEngine(idx)
engine.search(Term("the"), k=1).collect()  # warmup
tasks = {
    "HighTerm": Term("ref"), "LowTerm": Term("projectile"),
    "AndHighHigh": And([Term("ref"), Term("second")]),
    "OrHighHigh": Or([Term("ref"), Term("second")]),
    "Or4High": Or([Term(t) for t in ["ref", "second", "state", "south"]]),
    "MinMatch2": Or([Term(t) for t in ["ref", "second", "state"]], min_match=2),
    "Phrase": Phrase(["ref", "second"]),
    "Prefix3": Prefix("sta"),
    "WandHigh": Term("ref"),
}
results, t_search = {}, 0.0
for name, node in tasks.items():
    mode = "wand" if name == "WandHigh" else "exhaustive"
    t1 = time.perf_counter()
    rows = engine.search(node, k=10, mode=mode).collect()
    dt = time.perf_counter() - t1
    t1 = time.perf_counter()
    rows = engine.search(node, k=10, mode=mode).collect()
    dt = min(dt, time.perf_counter() - t1)
    t_search += dt
    results[name] = [[r["doc_id"], round(r["score"], 9)] for r in rows]
out = {
    "cpus": cpus, "n_pages": n_pages, "build_sec": round(t_build, 3),
    "docs_per_sec": round(n_pages / t_build, 1),
    "search_sec": round(t_search, 4),
    "queries_per_sec": round(len(tasks) / t_search, 3),
    "results": results,
}
print("SCALING_JSON:" + json.dumps(out))
"""


def run(cpus: int, n_pages: int) -> dict:
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_pages)],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("SCALING_JSON:"):
            return json.loads(line[len("SCALING_JSON:"):])
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{p.stderr[-3000:]}")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    lo = run(8, n_pages)
    hi = run(32, n_pages)
    assert lo["results"] == hi["results"], (
        "rank/score mismatch across parallelism!"
    )
    build_eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (32 / 8)
    search_speedup = hi["queries_per_sec"] / lo["queries_per_sec"]
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    md = f"""# BENCH/BASELINE — measured scaling evidence (sandbox protocol)

Same job, same input ({n_pages} synthetic pages, seed=42), two
parallelism levels in separate JVMs. Top-k results verified
RANK-IDENTICAL (doc ids + scores to 1e-9) across parallelism.

| measurement | local[8] | local[32] | ratio | efficiency (per-core) |
|---|---|---|---|---|
| index build (docs/sec) | {lo['docs_per_sec']} | {hi['docs_per_sec']} | {hi['docs_per_sec']/lo['docs_per_sec']:.2f}x | {build_eff:.2f} |
| index build (sec) | {lo['build_sec']} | {hi['build_sec']} | — | — |
| task-set search (q/s) | {lo['queries_per_sec']} | {hi['queries_per_sec']} | {search_speedup:.2f}x | {search_speedup/4:.2f} |

Notes: local-mode "scaling" measures thread-level scaling inside one
JVM (shared driver, shared page cache), the sandbox stand-in for the
north rule's N->4N executor criterion. Search latency at this corpus
size is dominated by Spark job-scheduling floor, not compute; the
docs/sec build number is the throughput-bound measurement. Efficiency
>= 0.8 target applies to the throughput-bound path.

Raw: {json.dumps({'local8': lo, 'local32': hi})[:1]}...
"""
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(md)
        f.write("\n```json\n")
        f.write(json.dumps({"local8": {k: v for k, v in lo.items() if k != 'results'},
                            "local32": {k: v for k, v in hi.items() if k != 'results'}}, indent=1))
        f.write("\n```\n")
    print(json.dumps({"build_efficiency": round(build_eff, 3),
                      "rank_identical": True,
                      "local8_docs_per_sec": lo["docs_per_sec"],
                      "local32_docs_per_sec": hi["docs_per_sec"]}))


if __name__ == "__main__":
    main()
