"""spark-submit entry point: consolidate an incremental index's
segments into one compacted index (the reference's
`IndexWriter::Consolidate` + merge policy, `core/utils/index_utils.hpp`
/ `index_writer.cpp:1340`, as a batch job).

Reads every committed segment from the incremental manifest, unions
them (doc-id ranges are disjoint by construction, so the k-way segment
merge is a plain union — merge.py), optionally re-blocks posting lists
to full 128-doc blocks, purges deleted docs if a delete mask exists,
and writes one term-bucket-partitioned index directory.

Usage:
  spark-submit --py-files iresearch_spark.zip jobs/consolidate_job.py \
      --index /path/to/incremental_index --output /path/to/compacted \
      [--reblock] [--bucket-bits 16]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="incremental index dir (with segments/ + manifest)")
    ap.add_argument("--output",
                    help="full compaction target dir (omit with --policy "
                         "for partial in-place consolidation)")
    ap.add_argument("--policy",
                    choices=["tier", "count", "bytes", "bytes_accum",
                             "docs_live", "docs_fill"],
                    help="merge only the segments this policy selects "
                         "(index_utils.hpp ConsolidateTier/Bytes/...), "
                         "atomically swapping them in the manifest")
    ap.add_argument("--threshold", type=float, default=1.0,
                    help="policy threshold (count: first N segments; "
                         "bytes/docs_*: the formula threshold)")
    ap.add_argument("--tier-min", type=int, default=2)
    ap.add_argument("--tier-max", type=int, default=10)
    ap.add_argument("--reblock", action="store_true",
                    help="rewrite posting lists into full 128-doc blocks "
                         "(decode + re-encode; use after many small "
                         "segment appends fragmented the lists)")
    ap.add_argument("--bucket-bits", type=int, default=16)
    ap.add_argument("--encrypt-keys", default=None,
                    help="master-key secrets file (name[@vN]:base64 "
                         "lines) for encrypted segments; the merged "
                         "output is re-encrypted (add --jars "
                         "jars/iresearch-kms.jar on a cluster)")
    args = ap.parse_args()

    from iresearch_spark.index.merge import consolidate, purge_deleted
    from iresearch_spark.streaming.incremental import IncrementalIndexer

    spark = SparkSession.builder.appName("iresearch-consolidate").getOrCreate()
    enc = None
    if args.encrypt_keys:
        from iresearch_spark.index.encryption import IndexEncryption

        enc = IndexEncryption.from_key_file(args.encrypt_keys)
    ix = IncrementalIndexer(index_dir=args.index, encryption=enc)
    if args.policy:
        if args.policy == "count":
            opts = {"threshold": int(args.threshold)}
        elif args.policy == "tier":
            opts = {"min_segments": args.tier_min,
                    "max_segments": args.tier_max}
        else:
            opts = {"threshold": args.threshold}
        plan = ix.plan_consolidation(policy=args.policy, spark=spark, **opts)
        new_id = ix.consolidate_segments(
            spark, plan, reblock=args.reblock, bucket_bits=args.bucket_bits
        )
        print(f"policy={args.policy} selected {plan} -> "
              f"{new_id or 'nothing to merge'}")
        return
    if not args.output:
        raise SystemExit("--output is required without --policy")
    idx = ix.read(spark)
    if idx is None:
        raise SystemExit(f"no committed segments under {args.index}")
    if idx.deleted is not None:
        idx = purge_deleted(idx, args.bucket_bits)
    elif args.reblock:
        idx = consolidate(idx, args.bucket_bits)
    idx.save(args.output, encryption=enc)
    print(
        f"consolidated {idx.field_stats.n_docs} docs, "
        f"{idx.field_stats.total_term_freq} tokens -> {args.output}"
    )


if __name__ == "__main__":
    main()
