"""spark-submit entry point: build (or incrementally extend) an index.

Usage:
  spark-submit --py-files iresearch_spark.zip jobs/build_index_job.py \
      --input /path/to/pages_parquet --output /path/to/index \
      [--analyzer segmentation] [--text-col text] [--sort-key url] \
      [--seg-bits 16] [--no-positions] [--incremental --checkpoint DIR] \
      [--sort-field warc_ts --sort-desc]   # sorted index (Comparer)

Package with:  python jobs/package.py   (writes dist/iresearch_spark.zip)
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--analyzer", default="segmentation")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--sort-key", default="url")
    ap.add_argument("--seg-bits", type=int, default=16)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--with-offsets", action="store_true",
                    help="store per-occurrence char spans (OFFS) for "
                    "SearchEngine.highlight()")
    ap.add_argument("--payload-delimiter", default=None,
                    help="delimited-payload convention: token suffix "
                    "after the LAST delimiter = per-occurrence payload "
                    "bytes (PAY stream, SearchEngine.payloads())")
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    # sorted index (Comparer analogue): lay doc ids out in
    # (--sort-field, --sort-key) order; --sort-desc reverses
    ap.add_argument("--sort-field", default=None)
    ap.add_argument("--sort-desc", action="store_true")
    ap.add_argument(
        "--lang-col",
        default=None,
        help="per-document language routing: analyze each doc with its "
        "language's text chain (column values = lang-id codes, e.g. "
        "the pages table's `lang`); one unified dictionary, still a "
        "single shuffle",
    )
    ap.add_argument(
        "--encrypt-keys",
        default=None,
        help="master-key secrets file (name:base64 lines): seal every "
        "index table with Parquet Modular Encryption (add --jars "
        "jars/iresearch-kms.jar on a cluster)",
    )
    ap.add_argument(
        "--snapshot",
        action="store_true",
        help="commit as a NEW snapshot under --output (Iceberg-style: "
        "immutable v{N} data version + atomic pointer swap; previous "
        "versions stay readable via InvertedIndex.load(snapshot_id=))",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("iresearch-build").getOrCreate()

    if args.incremental:
        from iresearch_spark.streaming.incremental import IncrementalIndexer

        enc = None
        if args.encrypt_keys:
            from iresearch_spark.index.encryption import IndexEncryption

            enc = IndexEncryption.from_key_file(args.encrypt_keys)

        stream = spark.readStream.format("parquet").schema(
            spark.read.parquet(args.input).schema
        ).load(args.input)
        ix = IncrementalIndexer(
            index_dir=args.output,
            analyzer=args.analyzer,
            text_col=args.text_col,
            sort_key=args.sort_key,
            with_positions=not args.no_positions,
            with_offsets=args.with_offsets,
            payload_delimiter=args.payload_delimiter,
            encryption=enc,
        )
        q = ix.start(stream, checkpoint_dir=args.checkpoint or args.output + "_ckpt")
        q.awaitTermination()
        return

    from iresearch_spark.index.builder import build_index

    df = spark.read.parquet(args.input)
    analyzer = args.analyzer
    if args.lang_col:
        # per-document routing: one text chain per language, the CLI
        # --analyzer value is superseded (build_index requires a
        # LangRoutedAnalyzer when lang_col is set)
        from iresearch_spark.analysis.multilang import lang_routed_analyzer

        analyzer = lang_routed_analyzer()
    idx = build_index(
        df,
        text_col=args.text_col,
        id_col=args.id_col,
        sort_key=args.sort_key if args.id_col is None else None,
        analyzer=analyzer,
        with_positions=not args.no_positions,
        with_offsets=args.with_offsets,
        payload_delimiter=args.payload_delimiter,
        seg_bits=args.seg_bits,
        sort_field=args.sort_field,
        sort_ascending=not args.sort_desc,
        lang_col=args.lang_col,
    )
    enc = None
    if args.encrypt_keys:
        from iresearch_spark.index.encryption import IndexEncryption

        enc = IndexEncryption.from_key_file(args.encrypt_keys)
    if args.snapshot:
        sid = idx.save_snapshot(args.output, encryption=enc)
        print(
            f"indexed {idx.field_stats.n_docs} docs, "
            f"{idx.field_stats.total_term_freq} tokens -> "
            f"{args.output} (snapshot {sid})"
        )
    else:
        idx.save(args.output, encryption=enc)
        print(
            f"indexed {idx.field_stats.n_docs} docs, "
            f"{idx.field_stats.total_term_freq} tokens -> {args.output}"
        )


if __name__ == "__main__":
    main()
