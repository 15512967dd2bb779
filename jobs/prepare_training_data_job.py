"""spark-submit entry point: the end-to-end training-data preparation
pipeline — every cleaning / dedup / scoring / sampling op in this repo
chained in the published-pipeline order (CCNet / C4 / Gopher / GPT-3
decontamination / RefinedWeb), with per-stage row-count metrics.

Stage order (each toggleable):
  0. text normalization (NFC etc.)     (--normalize)
  0b. domain blocklist filter          (--url-col + --blocklist-parquet)
  1. URL canonicalization dedup        (--url-col)
  2. exact text dedup                  (default on; --no-exact-dedup)
  3. repeated-paragraph removal        (--drop-repeated-paragraphs)
  4. C4 line/doc cleaning rules        (--c4)
  5. Gopher quality-rule filter        (--gopher)
  6. PII scrubbing                     (--scrub-pii)
  7. MinHash+LSH near-dup clustering   (--minhash, keep-one per cluster)
  8. benchmark decontamination         (--eval-parquet PATH)
  9. LM perplexity filter              (--lm-ref-parquet PATH --max-ppl X)
 10. annotation (lang id, quality,
     token counts)                     (--annotate)
 11. sampling: hash rate or
     stratified quota                  (--sample-rate / --stratify-col+--quota)
 12. sequence packing plan             (--pack-seq-len N)

Outputs under --output:
  documents/   surviving (optionally annotated) docs, parquet
  packing/     (doc, sequence) span assignments, parquet (if --pack-seq-len)
  metrics/     one row per stage: (stage, rows_in, rows_out), parquet —
               the per-stage lineage record a 100 TB run needs to audit
               what each filter removed.

Usage:
  spark-submit --master 'local[8]' --py-files dist/iresearch_spark.zip \
    jobs/prepare_training_data_job.py --input docs.parquet --output out/ \
    --c4 --gopher --scrub-pii --minhash --annotate --pack-seq-len 2048

Scale notes: every stage is a declarative DataFrame op from
iresearch_spark.ops (JVM expressions / bounded joins — see each op's
docstring for its shuffle shape); the only driver-side values are the
per-stage counts. Stages compose lazily; each stage's count() is the
one materialization per stage and doubles as the metrics record.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession, functions as F


def run_pipeline(
    spark: SparkSession,
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    normalize: bool = False,
    blocklist_df: DataFrame | None = None,
    exact_dedup: bool = True,
    drop_repeated_paras: bool = False,
    para_sep: str = "\n",
    c4: bool = False,
    gopher: bool = False,
    scrub: bool = False,
    minhash: bool = False,
    minhash_threshold: float = 0.7,
    eval_df: DataFrame | None = None,
    decontaminate_n: int = 13,
    lm_ref_df: DataFrame | None = None,
    max_ppl: float | None = None,
    annotate: bool = False,
    sample_rate: float | None = None,
    stratify_col: str | None = None,
    quota: int = 0,
    seed: int = 0,
    pack_seq_len: int = 0,
) -> tuple[DataFrame, DataFrame | None, list[dict]]:
    """Run the pipeline; returns (documents, packing_or_None, metrics).

    Each metrics entry is {"stage", "rows_in", "rows_out"} in execution
    order. Importable (tests / notebooks) — `main()` only parses args,
    reads parquet, and writes the three outputs.
    """
    from iresearch_spark.ops import dedup as D
    from iresearch_spark.ops import lm as L
    from iresearch_spark.ops import sampling as S
    from iresearch_spark.ops import textstats as T
    from iresearch_spark.ops import urls as U

    metrics: list[dict] = []
    n = df.count()

    def step(name: str, out: DataFrame) -> DataFrame:
        nonlocal n
        m = out.count()
        metrics.append({"stage": name, "rows_in": n, "rows_out": m})
        n = m
        return out

    if normalize:
        df = step("normalize_text", T.normalize_text(df, text_col=text_col))
    if url_col and blocklist_df is not None:
        df = step(
            "domain_blocklist",
            U.filter_blocked_domains(df, blocklist_df, url_col=url_col),
        )
    if url_col:
        df = step(
            "url_dedup", U.dedup_by_canonical_url(df, url_col=url_col)
        )
    if exact_dedup:
        flags = D.exact_duplicates(df, text_col=text_col, id_col=id_col)
        keep = flags.filter(~F.col("is_duplicate")).select(
            F.col("doc_id").alias(id_col)
        )
        df = step("exact_dedup", df.join(keep, id_col, "left_semi"))
    if drop_repeated_paras:
        df = step(
            "repeated_paragraphs",
            D.drop_repeated_paragraphs(
                df, id_col=id_col, text_col=text_col, sep=para_sep
            ),
        )
    if c4:
        df = step(
            "c4_clean",
            T.c4_clean(df, id_col=id_col, text_col=text_col, sep=para_sep),
        )
    if gopher:
        g = T.gopher_quality_filter(df, text_col=text_col, id_col=id_col)
        keep = g.filter(F.col("keep") == 1).select(id_col)
        df = step("gopher_filter", df.join(keep, id_col, "left_semi"))
    if scrub:
        df = step("pii_scrub", T.scrub_pii(df, text_col=text_col))
    if minhash:
        pairs = D.minhash_lsh_pairs(
            df,
            text_col=text_col,
            id_col=id_col,
            threshold=minhash_threshold,
            hash_family="xxhash",
        )
        df = step(
            "minhash_dedup", D.drop_duplicate_docs(df, pairs, id_col=id_col)
        )
    if eval_df is not None:
        df = step(
            "decontaminate",
            D.decontaminate(
                df, eval_df, id_col=id_col, text_col=text_col,
                n=decontaminate_n,
            ),
        )
    if lm_ref_df is not None and max_ppl is not None:
        df = step(
            "perplexity_filter",
            L.perplexity_filter(
                df, lm_ref_df, max_ppl=max_ppl, id_col=id_col,
                text_col=text_col,
            ),
        )
    if annotate:
        # the annotation ops emit their id as "doc_id"; re-key and drop
        # any columns the input already carries (e.g. n_chars)
        ann = (
            T.lang_id_ngram(df, text_col=text_col, id_col=id_col)
            .join(
                T.quality_score(df, text_col=text_col, id_col=id_col),
                "doc_id",
            )
            .join(
                T.token_counts(df, text_col=text_col, id_col=id_col),
                "doc_id",
            )
            .withColumnRenamed("doc_id", id_col)
        )
        dup = [c for c in ann.columns if c != id_col and c in df.columns]
        df = step("annotate", df.join(ann.drop(*dup), id_col))
    if sample_rate is not None:
        df = step(
            "hash_sample", S.hash_rate_sample(df, id_col, sample_rate, seed)
        )
    if stratify_col and quota > 0:
        df = step(
            "stratified_sample",
            S.stratified_quota_sample(
                df, stratify_col, quota=quota, key_col=id_col, seed=seed
            ),
        )
    packing = None
    if pack_seq_len > 0:
        packing = S.pack_sequences(
            df, seq_len=pack_seq_len, id_col=id_col, text_col=text_col
        )
    return df, packing, metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--normalize", action="store_true",
                    help="NFC + typography/control/whitespace cleanup first")
    ap.add_argument("--blocklist-parquet", default=None,
                    help="one-column (domain) parquet; rows whose URL's "
                         "registered domain matches are dropped")
    ap.add_argument("--report", action="store_true",
                    help="also write a per-(lang, source) corpus_report "
                         "table for the surviving docs")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--drop-repeated-paragraphs", action="store_true")
    ap.add_argument("--para-sep", default="\n")
    ap.add_argument("--c4", action="store_true")
    ap.add_argument("--gopher", action="store_true")
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--minhash", action="store_true")
    ap.add_argument("--minhash-threshold", type=float, default=0.7)
    ap.add_argument("--eval-parquet", default=None)
    ap.add_argument("--decontaminate-n", type=int, default=13)
    ap.add_argument("--lm-ref-parquet", default=None)
    ap.add_argument("--max-ppl", type=float, default=None)
    ap.add_argument("--annotate", action="store_true")
    ap.add_argument("--sample-rate", type=float, default=None)
    ap.add_argument("--stratify-col", default=None)
    ap.add_argument("--quota", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pack-seq-len", type=int, default=0)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("prepare-training-data").getOrCreate()
    df = spark.read.parquet(args.input)
    docs, packing, metrics = run_pipeline(
        spark,
        df,
        id_col=args.id_col,
        text_col=args.text_col,
        url_col=args.url_col,
        normalize=args.normalize,
        blocklist_df=(
            spark.read.parquet(args.blocklist_parquet)
            if args.blocklist_parquet
            else None
        ),
        exact_dedup=not args.no_exact_dedup,
        drop_repeated_paras=args.drop_repeated_paragraphs,
        para_sep=args.para_sep,
        c4=args.c4,
        gopher=args.gopher,
        scrub=args.scrub_pii,
        minhash=args.minhash,
        minhash_threshold=args.minhash_threshold,
        eval_df=(
            spark.read.parquet(args.eval_parquet) if args.eval_parquet else None
        ),
        decontaminate_n=args.decontaminate_n,
        lm_ref_df=(
            spark.read.parquet(args.lm_ref_parquet)
            if args.lm_ref_parquet
            else None
        ),
        max_ppl=args.max_ppl,
        annotate=args.annotate,
        sample_rate=args.sample_rate,
        stratify_col=args.stratify_col,
        quota=args.quota,
        seed=args.seed,
        pack_seq_len=args.pack_seq_len,
    )
    docs.write.mode("overwrite").parquet(args.output + "/documents")
    if args.report:
        from iresearch_spark.ops.textstats import corpus_report

        strata = tuple(
            c for c in ("lang", "source") if c in docs.columns
        ) or (args.id_col,)
        corpus_report(
            docs, strata_cols=strata, text_col=args.text_col,
            id_col=args.id_col,
        ).coalesce(1).write.mode("overwrite").parquet(args.output + "/report")
    if packing is not None:
        packing.write.mode("overwrite").parquet(args.output + "/packing")
    spark.createDataFrame(
        [(m["stage"], m["rows_in"], m["rows_out"]) for m in metrics],
        "stage string, rows_in long, rows_out long",
    ).coalesce(1).write.mode("overwrite").parquet(args.output + "/metrics")
    for m in metrics:
        print(f"{m['stage']}: {m['rows_in']} -> {m['rows_out']}")


if __name__ == "__main__":
    main()
