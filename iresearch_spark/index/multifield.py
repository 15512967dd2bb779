"""Multi-field documents — the reference's per-field inverted data.

An IResearch document is a collection of indexed fields; every term-
level filter names its field (`by_term(field, term)`, filter.hpp), and
each field owns its term dictionary, postings, norms and scoring stats
(field_meta, core/index/field_meta.cpp; per-field FieldCollector stats,
bm25.cpp:45-80 — BM25's N/avg_dl are docs_with_FIELD /
total_term_freq-of-field).

Spark-first shape: one InvertedIndex PER FIELD over the same input
DataFrame. Doc ids are a pure function of (sort_key set, n_buckets)
(builder._bucket_layout — SURVEY §7.0 determinism), so every field's
index lands in the SAME doc-id space and per-field results compose
doc-id-wise through the ordinary boolean nodes:

    mfi = build_multi_field_index(df, ["title", "body"], sort_key="url")
    eng = MultiFieldEngine(mfi)
    eng.search(And([Field("title", Term("spark")),
                    Field("body", Term("shuffle"))]), k=10)

Per-field stats fall out for free — each field's index computes its own
df/N/avg_dl/norms exactly like the reference's per-field collectors.
Scale: fields build independently (k fields = k one-shuffle builds over
the same source scan); a field's postings never mix with another's, so
nothing changes in the per-field query plans.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from iresearch_spark.index.builder import build_index
from iresearch_spark.index.model import InvertedIndex


@dataclass
class MultiFieldIndex:
    """Per-field inverted indexes sharing one deterministic doc-id
    space, plus the default field unqualified queries resolve to."""

    indexes: dict[str, InvertedIndex]
    default_field: str

    def __post_init__(self):
        if self.default_field not in self.indexes:
            raise ValueError(
                f"default_field {self.default_field!r} not among indexed "
                f"fields {sorted(self.indexes)}"
            )

    def cache(self) -> "MultiFieldIndex":
        for ix in self.indexes.values():
            ix.cache()
        return self

    def unpersist(self) -> None:
        for ix in self.indexes.values():
            ix.unpersist()

    def delete_docs(self, doc_ids: DataFrame) -> "MultiFieldIndex":
        """Delete masks apply to the DOCUMENT, i.e. to every field's
        index (the reference keeps one deleted-docs bitset per segment,
        shared by all its fields)."""
        return MultiFieldIndex(
            {f: ix.delete_docs(doc_ids) for f, ix in self.indexes.items()},
            self.default_field,
        )

    def save(self, path: str, mode: str = "overwrite") -> None:
        """field=<name>/ subdir per field + a manifest committed last
        (same atomic-rename two-phase commit as InvertedIndex.save)."""
        os.makedirs(path, exist_ok=True)
        for f, ix in self.indexes.items():
            ix.save(os.path.join(path, f"field={f}"), mode=mode)
        manifest = {
            "version": 1,
            "fields": sorted(self.indexes),
            "default_field": self.default_field,
        }
        tmp = os.path.join(path, "_multifield.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(path, "multifield.json"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MultiFieldIndex":
        with open(os.path.join(path, "multifield.json")) as fh:
            manifest = json.load(fh)
        return cls(
            {
                f: InvertedIndex.load(spark, os.path.join(path, f"field={f}"))
                for f in manifest["fields"]
            },
            manifest["default_field"],
        )


def build_multi_field_index(
    df: DataFrame,
    fields: list[str],
    sort_key: str,
    analyzer="simple",
    analyzers: dict | None = None,
    default_field: str | None = None,
    **build_kwargs,
) -> MultiFieldIndex:
    """Build one index per text column, all in the same doc-id space.

    `analyzers` overrides the analyzer per field (the reference binds
    an analyzer per indexed field through its token_stream); `analyzer`
    is the default for the rest. Remaining kwargs forward to
    build_index (bucket_bits, with_positions, extra_doc_cols, and also
    sort_field/sort_ascending — a SORTED multi-field index works
    because the sorted layout is equally a pure function of the data,
    so every field gets identical ids). `id_col` is not forwardable:
    the shared doc-id space requires the deterministic sort_key layout,
    identical per field.
    """
    if not fields:
        raise ValueError("need at least one field")
    for bad in ("id_col", "text_col"):
        if bad in build_kwargs:
            raise ValueError(f"{bad} cannot be used with a multi-field build")
    indexes = {
        f: build_index(
            df,
            text_col=f,
            id_col=None,
            sort_key=sort_key,
            analyzer=(analyzers or {}).get(f, analyzer),
            **build_kwargs,
        )
        for f in fields
    }
    return MultiFieldIndex(indexes, default_field or fields[0])
