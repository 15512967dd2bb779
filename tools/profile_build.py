"""Stage-by-stage build profiling at one parallelism level.

Usage: python tools/profile_build.py <cpus> [n_pages]
Prints per-stage wall times to isolate where 8->32 scaling breaks.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from iresearch_spark.corpus import generate_pages
from iresearch_spark.index.builder import assign_doc_ids, build_segments, NORM_TERM
from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.session import get_spark


def main():
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
    spark = get_spark(f"profile-{cpus}", cores=cpus, shuffle_partitions=cpus)
    timings = {}

    t0 = time.perf_counter()
    pages = generate_pages(spark, n_pages, seed=42).cache()
    pages.count()
    timings["gen"] = time.perf_counter() - t0

    # pre-warm python workers
    spark.range(cpus * 4, numPartitions=cpus * 2).mapInPandas(
        lambda it: it, "id long"
    ).count()

    t0 = time.perf_counter()
    with_ids = assign_doc_ids(pages, "url").cache()
    with_ids.count()
    timings["assign_ids"] = time.perf_counter() - t0

    ana = get_analyzer("segmentation")
    t0 = time.perf_counter()
    blocks = build_segments(with_ids, ana, "text", "doc_id", True, 11)
    blocks.cache()
    n_blocks = blocks.count()
    timings["segments"] = time.perf_counter() - t0
    timings["n_blocks"] = n_blocks

    t0 = time.perf_counter()
    postings = blocks.filter(F.col("term") != NORM_TERM)
    term_stats = postings.groupBy("term").agg(
        F.sum("n_docs").alias("df"), F.sum("block_cf").alias("cf")
    )
    term_stats.count()
    timings["term_stats"] = time.perf_counter() - t0

    timings["cpus"] = cpus
    timings["n_pages"] = n_pages
    print("PROFILE:" + json.dumps({k: round(v, 3) if isinstance(v, float) else v
                                   for k, v in timings.items()}))


if __name__ == "__main__":
    main()
