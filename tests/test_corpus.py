"""Synthetic pages corpus: partition-independence, extraction parity,
schema contract (FIXTURES.md §1)."""

from pyspark.sql import functions as F

from iresearch_spark.corpus import extract_text, generate_pages


def test_pages_schema_and_determinism(spark):
    a = generate_pages(spark, 300, seed=42).collect()
    b = generate_pages(spark.range(0).sparkSession, 300, seed=42).repartition(
        7
    ).collect()
    rows_a = sorted((r["url"], r["text"], r["lang"]) for r in a)
    rows_b = sorted((r["url"], r["text"], r["lang"]) for r in b)
    assert rows_a == rows_b
    urls = [r["url"] for r in a]
    assert len(set(urls)) == 300
    langs = {r["lang"] for r in a}
    assert "en" in langs and langs <= {"en", "de", "fr"}
    n_tokens = [len(r["text"].split()) for r in a]
    assert min(n_tokens) >= 5 and max(n_tokens) <= 500


def test_extract_text_is_byte_identical(spark):
    """Per-row invariant (BASELINE.json input_hint): extraction from html
    reproduces `text` byte-identically for every url."""
    pages = generate_pages(spark, 200, seed=42)
    mismatches = (
        pages.withColumn("extracted", extract_text(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_pages_seed_changes_content(spark):
    a = {r["url"]: r["text"] for r in generate_pages(spark, 50, seed=1).collect()}
    b = {r["url"]: r["text"] for r in generate_pages(spark, 50, seed=2).collect()}
    assert any(a[u] != b.get(u) for u in a)
