"""Cluster-path block-max WAND crossover experiment.

The sf0.1 bench row records forced cluster WAND as SLOWER than the
one-job exhaustive scan at 100k pages: WAND's driver-side bound walk
costs ~3 serialized Spark jobs vs 1, and at that corpus size the job
floor (~0.3 s each) dwarfs the decode work pruning saves.  This tool
measures both modes on the SAME site-skewed topical corpus at a
configurable size (default 1M pages, 10x the bench row) to locate the
crossover where pruned decode work pays for the extra jobs — the
regime the reference's wanderator (formats_10.cpp:2426-2642) lives in
permanently because it walks skip metadata in memory with no job
floor.

Interleaved best-of-R (exhaustive, wand, exhaustive, wand, ...) so
shared-host weather hits both modes alike; rank-identity asserted.

Usage: python tools/wand_crossover.py [n_pages] [cpus] [repeat]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iresearch_spark.corpus import build_vocab, generate_pages
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import Or, SearchEngine, Term
from iresearch_spark.session import get_spark


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark("wand-crossover", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    pages = generate_pages(spark, n_pages, site_skew=True).cache()
    pages.count()

    t0 = time.perf_counter()
    idx = build_index(
        pages, id_col=None, sort_field="url", sort_key="url",
        analyzer="segmentation", seg_bits=10, bucket_bits=16,
    )
    idx.cache()
    idx.postings.count()
    idx.term_stats.count()
    idx.docs.count()
    build_sec = time.perf_counter() - t0
    pages.unpersist()

    vocab = build_vocab(30000)
    topical = [str(vocab[120 + j]) for j in range(4)]
    node = Or([Term(t) for t in topical])

    eng_exh = SearchEngine(idx, preload_stats=True)
    eng_wand = SearchEngine(idx, preload_stats=True)
    eng_wand.collect_wand_stats = True
    eng_exh.search(Term(topical[0]), k=1).collect()  # warm workers

    def busy_ticks():
        # this VM's cumulative non-idle CPU ticks (user+nice+system);
        # the sandbox VM runs nothing else, so per-phase deltas are the
        # pipeline's own CPU work (steal is accounted separately)
        with open("/proc/stat") as f:
            p = f.readline().split()
        return int(p[1]) + int(p[2]) + int(p[3])

    exh_times, wand_times = [], []
    exh_ticks = wand_ticks = 0
    rows_exh = rows_wand = None
    for _ in range(repeat):
        c0, t0 = busy_ticks(), time.perf_counter()
        rows_exh = eng_exh.search(node, k=10).collect()
        exh_times.append(time.perf_counter() - t0)
        exh_ticks += busy_ticks() - c0
        c0, t0 = busy_ticks(), time.perf_counter()
        rows_wand = eng_wand.search(node, k=10, mode="wand").collect()
        wand_times.append(time.perf_counter() - t0)
        wand_ticks += busy_ticks() - c0

    ids_exh = [(r["doc_id"], round(r["score"], 9)) for r in rows_exh]
    ids_wand = [(r["doc_id"], round(r["score"], 9)) for r in rows_wand]
    assert ids_exh == ids_wand, "WAND result differs from exhaustive"

    stats = eng_wand.last_wand_stats or {}
    # total candidate postings volume of the query's terms (the decode
    # work exhaustive must do and WAND prunes)
    df_total = 0
    for t in topical:
        row = (
            idx.term_stats.where(idx.term_stats.term == t)
            .select("df").collect()
        )
        if row:
            df_total += row[0][0]

    out = {
        "metric": "cluster wand-vs-exhaustive crossover",
        "n_pages": n_pages,
        "cpus": cpus,
        "build_sec": round(build_sec, 2),
        "exhaustive_sec": [round(t, 4) for t in exh_times],
        "wand_sec": [round(t, 4) for t in wand_times],
        "exhaustive_best": round(min(exh_times), 4),
        "wand_best": round(min(wand_times), 4),
        "wand_wins": min(wand_times) < min(exh_times),
        "exhaustive_cpu_sec": round(exh_ticks / 100.0, 2),
        "wand_cpu_sec": round(wand_ticks / 100.0, 2),
        "blocks_total": stats.get("blocks_total"),
        "blocks_kept": stats.get("blocks_kept"),
        "query_postings": df_total,
        "rank_identical": True,
    }
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        out["host_user_ticks"] = int(parts[1])
        out["host_steal_ticks"] = int(parts[8])
    except Exception:
        pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
