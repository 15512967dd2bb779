"""End-to-end training-data preparation pipeline (jobs/
prepare_training_data_job.run_pipeline): every stage removes exactly
the doc planted to trip it, metrics record the lineage, survivors come
out annotated and packed."""

import pytest
from pyspark.sql import functions as F

from jobs.prepare_training_data_job import run_pipeline


def _good_text(k: int, nlines: int = 5) -> str:
    # passes C4 (>=5 words/line, terminal '.', >=3 lines) and Gopher
    # (>=50 words, sane word lengths, stopword hits); doc-unique tokens
    # keep cross-doc shingle jaccard far below the near-dup threshold
    return "\n".join(
        f"token{k}x{i} token{k}y{i} token{k}z{i} goes with the and of "
        f"that story number{k}item{i}."
        for i in range(nlines)
    )


EVAL_SPAN = " ".join(f"evalspan{i:02d}" for i in range(13))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, _good_text(0), "http://a.com/page"),
        (1, _good_text(0), "http://a.com:80/page"),       # url dup of 0
        (2, _good_text(0), "http://b.com/two"),           # exact text dup
        (3, _good_text(0).replace("token0y2", "changed"), # near dup of 0
         "http://c.com/three"),
        (4, "no terminal punctuation on this line\nshort line\nbad",
         "http://d.com/four"),                            # C4 kills
        (5, "\n".join(
            f"tiny{i} doc with the and of filler." for i in range(3)
        ), "http://e.com/five"),                          # Gopher kills (<50 w)
        (6, _good_text(6) + "\ncontact me at bob@example.com for the "
            "and of details today.", "http://f.com/six"), # PII scrub
        (7, _good_text(7, nlines=4) + f"\n{EVAL_SPAN} with the and done.",
         "http://g.com/seven"),                           # contaminated
        (8, _good_text(8), "http://h.com/eight"),         # clean survivor
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, url string")


def test_full_pipeline(spark, corpus):
    eval_df = spark.createDataFrame([(EVAL_SPAN,)], "text string")
    ref = spark.createDataFrame(
        [(_good_text(99),)], "text string"
    )
    docs, packing, metrics = run_pipeline(
        spark,
        corpus,
        url_col="url",
        c4=True,
        gopher=True,
        scrub=True,
        minhash=True,
        eval_df=eval_df,
        lm_ref_df=ref,
        max_ppl=1e9,
        annotate=True,
        pack_seq_len=32,
    )
    stages = [(m["stage"], m["rows_in"], m["rows_out"]) for m in metrics]
    assert stages == [
        ("url_dedup", 9, 8),
        ("exact_dedup", 8, 7),
        ("c4_clean", 7, 6),
        ("gopher_filter", 6, 5),
        ("pii_scrub", 5, 5),
        ("minhash_dedup", 5, 4),
        ("decontaminate", 4, 3),
        ("perplexity_filter", 3, 3),
        ("annotate", 3, 3),
    ]
    out = {r["doc_id"]: r for r in docs.collect()}
    assert sorted(out) == [0, 6, 8]
    assert "bob@example.com" not in out[6]["text"]
    assert "<EMAIL>" in out[6]["text"]
    # annotations present
    for r in out.values():
        assert r["pred_lang"] is not None
        assert 0.0 <= r["quality"] <= 1.0
        assert r["n_tokens"] > 0
    # packing covers every surviving token exactly once
    spans = packing.collect()
    assert {r["doc_id"] for r in spans} == {0, 6, 8}
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], 0)
        per_doc[r["doc_id"]] += r["doc_end"] - r["doc_start"]
    for d, r in out.items():
        n = len([t for t in r["text"].split() if t])
        assert per_doc[d] == n


def test_pipeline_stages_optional(spark, corpus):
    docs, packing, metrics = run_pipeline(spark, corpus)
    # only the default exact-dedup stage runs
    assert [m["stage"] for m in metrics] == ["exact_dedup"]
    assert packing is None
    assert docs.count() == 7  # ids 1,2 are exact dups of 0


def test_pipeline_sampling_stages(spark, corpus):
    docs, _, metrics = run_pipeline(
        spark, corpus, exact_dedup=False, sample_rate=1.0,
        stratify_col="url", quota=1,
    )
    names = [m["stage"] for m in metrics]
    assert names == ["hash_sample", "stratified_sample"]
    assert docs.count() == 9  # every url unique -> quota 1 keeps all


def test_pipeline_normalize_and_blocklist(spark, corpus):
    bl = spark.createDataFrame([("d.com",)], "domain string")
    messy = spark.createDataFrame(
        [(100, "curly “text” here", "https://sub.d.com/blocked")],
        "doc_id long, text string, url string",
    )
    docs, _, metrics = run_pipeline(
        spark,
        corpus.unionByName(messy),
        url_col="url",
        normalize=True,
        blocklist_df=bl,
        exact_dedup=False,
    )
    names = [(m["stage"], m["rows_in"], m["rows_out"]) for m in metrics]
    assert names == [
        ("normalize_text", 10, 10),
        ("domain_blocklist", 10, 8),   # docs 4 + 100 are on d.com
        ("url_dedup", 8, 7),           # ids 0/1 share a canonical url
    ]
    kept = {r["doc_id"] for r in docs.collect()}
    assert 100 not in kept and 4 not in kept
