"""Round-4: model-bound analyzers — `nearest_neighbors` and
`classification` (the last §2.1 rows).

The reference binds both to a fastText binary
(nearest_neighbors_stream.cpp, classification_stream.cpp); here the
model is an embedding TABLE (word -> vector), the Spark-native
equivalent a user materializes from any public embedding source.
Semantics mirrored exactly:
- nearest_neighbors: per whitespace token, top_k cosine neighbors
  (query word excluded), neighbors of one token share a position and
  positions advance per emitting token (increment 1 on each token's
  first neighbor, 0 after — :250-251).
- classification: whole input -> top_k labels above `threshold`, all
  at position 0 (:255-283); scores are softmax probabilities so the
  threshold filters like the reference's option.
"""

import numpy as np
import pytest
from pyspark.sql import SparkSession

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.index.builder import build_index
from iresearch_spark.search import SearchEngine, Term

# a tiny deterministic embedding space: animal words cluster, tool
# words cluster, one oddball off-axis
VOCAB = {
    "cat":     [1.0, 0.1, 0.0],
    "kitten":  [0.9, 0.2, 0.0],
    "dog":     [0.8, 0.0, 0.2],
    "hammer":  [0.0, 1.0, 0.1],
    "wrench":  [0.1, 0.9, 0.0],
    "pliers":  [0.0, 0.8, 0.2],
    "quasar":  [0.0, 0.0, 1.0],
}
LABELS = {
    "animal": [1.0, 0.0, 0.1],
    "tool":   [0.0, 1.0, 0.1],
}


def test_nearest_neighbors_goldens():
    a = get_analyzer("nearest_neighbors", model=VOCAB, top_k=2)
    terms, pos = a.analyze("cat hammer")
    # cat's neighbors: kitten (cos .988) then dog; hammer's: pliers
    # (cos .988) then wrench — self always excluded
    assert terms == ["kitten", "dog", "pliers", "wrench"]
    assert pos == [0, 0, 1, 1]


def test_nearest_neighbors_oov_and_positions():
    a = get_analyzer("nearest_neighbors", model=VOCAB, top_k=1)
    # OOV token emits nothing and advances no position (reference:
    # increments attach only to emitted tokens)
    terms, pos = a.analyze("cat UNKNOWNWORD dog")
    assert terms == ["kitten", "cat"]
    assert pos == [0, 1]
    assert a.analyze("") == ([], [])
    assert a.analyze_batch([None])[0] == ([], [])


def test_nearest_neighbors_deterministic_ties():
    # two words exactly tied in cosine vs the query -> word-asc order
    model = {
        "q": [1.0, 0.0],
        "bbb": [0.5, 0.5],
        "aaa": [0.5, 0.5],
        "zzz": [-1.0, 0.0],
    }
    a = get_analyzer("nearest_neighbors", model=model, top_k=2)
    terms, _ = a.analyze("q")
    assert terms == ["aaa", "bbb"]


def test_nearest_neighbors_batch_split_invariance():
    a = get_analyzer("nearest_neighbors", model=VOCAB, top_k=2)
    texts = ["cat dog", "hammer quasar", "wrench cat pliers"]
    whole = a.analyze_batch(texts)
    parts = [a.analyze(t) for t in texts]
    assert whole == parts


def test_classification_goldens():
    a = get_analyzer(
        "classification", model={"vocab": VOCAB, "labels": LABELS}, top_k=2
    )
    terms, pos = a.analyze("cat kitten dog")
    assert terms == ["animal", "tool"] and pos == [0, 0]
    terms1, _ = a.analyze("hammer wrench")
    assert terms1 == ["tool", "animal"]
    # top_k=1 keeps only the argmax label
    a1 = get_analyzer(
        "classification", model={"vocab": VOCAB, "labels": LABELS}, top_k=1
    )
    assert a1.analyze("cat kitten dog")[0] == ["animal"]


def test_classification_threshold_filters_probability():
    a = get_analyzer(
        "classification",
        model={"vocab": VOCAB, "labels": LABELS},
        top_k=2,
        threshold=0.5,
    )
    # two labels -> softmax probs sum to 1, so threshold .5 keeps at
    # most the winner
    terms, _ = a.analyze("cat kitten dog")
    assert terms == ["animal"]
    # all-OOV input classifies to nothing
    assert a.analyze("UNSEEN TOKENS") == ([], [])


def test_classification_requires_model_shape():
    with pytest.raises(ValueError):
        get_analyzer("classification", model=VOCAB)
    with pytest.raises(ValueError):
        get_analyzer("nearest_neighbors")


def test_model_analyzer_index_build(tmp_path):
    """End-to-end: a nearest_neighbors-analyzed index is searchable by
    neighbor terms (the reference's use: index semantic expansions)."""
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    docs = spark.createDataFrame(
        [(0, "cat hammer"), (1, "dog dog"), (2, "quasar")],
        "doc_id long, text string",
    )
    a = get_analyzer("nearest_neighbors", model=VOCAB, top_k=2)
    idx = build_index(docs, analyzer=a, bucket_bits=6)
    assert idx.analyzer_name == "nearest_neighbors"
    eng = SearchEngine(idx)
    # doc 0 indexed under cat's and hammer's neighbors
    hits = {r["doc_id"] for r in eng.matches(Term("wrench")).collect()}
    assert hits == {0}
    # dog's top-2 neighbors are cat and kitten -> doc 1 matches "cat"
    hits2 = {r["doc_id"] for r in eng.matches(Term("cat")).collect()}
    assert hits2 == {1}
    # classification analyzer builds too
    c = get_analyzer(
        "classification", model={"vocab": VOCAB, "labels": LABELS}
    )
    idx2 = build_index(docs, analyzer=c, bucket_bits=6)
    eng2 = SearchEngine(idx2)
    # doc 0 (cat+hammer mean) leans tool; doc 1 (dog) is animal;
    # doc 2 (quasar) ties both labels at cos .0995 -> label-asc pick
    assert {
        r["doc_id"] for r in eng2.matches(Term("animal")).collect()
    } == {1, 2}
    assert {
        r["doc_id"] for r in eng2.matches(Term("tool")).collect()
    } == {0}


def test_embedding_table_from_dataframe():
    spark = SparkSession.builder.master("local[2]").getOrCreate()
    df = spark.createDataFrame(
        [(w, v) for w, v in VOCAB.items()], "term string, vector array<float>"
    )
    a = get_analyzer("nearest_neighbors", model=df, top_k=2)
    assert a.analyze("cat")[0] == ["kitten", "dog"]
