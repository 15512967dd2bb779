"""The inverted index as DataFrames.

The reference's on-disk segment (term dictionary + postings + norms +
columnstore, `core/formats/`) maps to four Spark tables:

  postings    one row per (term, 128-doc posting block):
              term, block_id, n_docs, first_doc, last_doc,
              docs BINARY        delta-gap varint, freq==1 flag in low bit
                                 (formats_10.cpp:692-706 equivalent)
              dls BINARY         per-posting doc length (norm), varint —
                                 co-located so scoring needs NO join
                                 (reference reads norms from the
                                 columnstore per segment, norm.hpp:75-125)
              positions BINARY   per-occurrence position deltas
                                 (formats_10.cpp:893-932 equivalent)
              block_max_freq     per-block max term freq   } block-max
              block_min_dl       per-block min doc length  } WAND data
                                 (wand_writer.hpp:137-300 equivalent)
  docs        doc_id, dl (+ passthrough identity columns)
  term_stats  term, df (docs_with_term), cf (total term freq)
  field_stats a tiny dict {n_docs, total_term_freq, avg_dl}
              (the reference's FieldCollector output, bm25.cpp:366-410)

`block_id` is globally ordered by doc-id range within each term, so
posting blocks concatenate into a sorted posting list without any
further sort (merge = re-blocking, see merge.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from iresearch_spark.index import codec

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("docs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), True),
        T.StructField("block_max_freq", T.IntegerType(), False),
        T.StructField("block_min_dl", T.IntegerType(), False),
        # per-block total term frequency — lets term_stats (df, cf) be
        # aggregated from block rows without touching token rows
        T.StructField("block_cf", T.LongType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("freq", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)

DECODED_POS_SCHEMA = T.StructType(
    DECODED_SCHEMA.fields
    + [T.StructField("positions", T.ArrayType(T.IntegerType()), True)]
)


@dataclass
class FieldStats:
    """Index-wide stats used by scorers (reference FieldCollector)."""

    n_docs: int
    total_term_freq: int

    @property
    def avg_dl(self) -> float:
        return self.total_term_freq / self.n_docs if self.n_docs else 0.0


@dataclass
class InvertedIndex:
    postings: DataFrame
    docs: DataFrame
    term_stats: DataFrame
    field_stats: FieldStats
    with_positions: bool = True
    analyzer_name: str = "simple"
    # delete mask (reference: per-segment deleted-docs bitset applied at
    # read time, index_writer.hpp:376-411; stats stay stale until a
    # consolidation purges the postings — same semantics here)
    deleted: DataFrame | None = None
    # the cached raw block DataFrame the tables above derive from (set
    # by build_index) — kept so unpersist() can actually free it
    blocks: DataFrame | None = None

    def unpersist(self) -> "InvertedIndex":
        for df in (self.postings, self.docs, self.term_stats,
                   self.blocks, self.deleted):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
        return self

    def delete_docs(self, doc_ids: DataFrame) -> "InvertedIndex":
        """Mark docs deleted (doc_ids: DataFrame with a doc_id column).
        Queries exclude them immediately; postings/stats are rewritten
        only by merge.purge_deleted (the reference's consolidate)."""
        import dataclasses

        mask = doc_ids.select("doc_id").distinct()
        if self.deleted is not None:
            mask = self.deleted.unionByName(mask).distinct()
        return dataclasses.replace(self, deleted=mask)

    # ---- decode paths ----------------------------------------------------

    def decoded_postings(
        self, terms: list[str] | None = None, with_positions: bool = False
    ) -> DataFrame:
        """Posting blocks -> (term, doc_id, freq, dl[, positions]) rows.

        The term filter is a pushed-down parquet predicate (check
        `PushedFilters` in .explain); decode is one `mapInArrow` pass —
        numpy cumsum per block, no per-row Python.
        """
        df = self.postings
        if terms is not None:
            df = df.filter(F.col("term").isin(list(terms)))
        want_pos = with_positions and self.with_positions
        schema = DECODED_POS_SCHEMA if want_pos else DECODED_SCHEMA
        return df.mapInArrow(
            _make_block_decoder(want_pos), schema
        )

    # ---- persistence -----------------------------------------------------

    def save(self, path: str, mode: str = "overwrite", optimize_layout: bool = True) -> None:
        """Write the index tables + manifest.

        Layout mirrors an Iceberg-table-per-component design (the target
        deployment per BASELINE.json); in this sandbox we write parquet
        dirs plus a JSON manifest committed last, giving the same
        atomic-visibility property as the reference's two-phase
        `Begin()`/`Commit()` (`core/index/index_writer.hpp:540-560`):
        readers only see an index whose manifest exists.

        With optimize_layout the postings are range-partitioned and
        sorted by term before writing: parquet min/max term statistics
        become tight per file/row-group, so a query's term predicate
        prunes whole files at scan time — the Spark-native equivalent of
        the reference's FST term-dictionary seek
        (`formats_burst_trie.cpp:953-966`).
        """
        postings = self.postings
        if optimize_layout:
            # file count sized from data, not from shuffle parallelism:
            # ~2M block rows per file keeps files O(100MB); a small
            # index writes ONE file so query scans schedule one task
            # instead of one per empty shuffle partition
            n_blocks = postings.count()
            n_part = max(1, min(
                postings.rdd.getNumPartitions(), (n_blocks // 2_000_000) + 1
            ))
            postings = postings.repartitionByRange(
                n_part, F.col("term")
            ).sortWithinPartitions("term", "block_id")
        else:
            n_part = max(self.postings.rdd.getNumPartitions(), 1)
        postings.write.mode(mode).parquet(os.path.join(path, "postings"))
        self.docs.coalesce(n_part).write.mode(mode).parquet(
            os.path.join(path, "docs")
        )
        self.term_stats.coalesce(n_part).write.mode(mode).parquet(
            os.path.join(path, "term_stats")
        )
        if self.deleted is not None:
            self.deleted.write.mode(mode).parquet(os.path.join(path, "deleted"))
        manifest = {
            "version": 1,
            "n_docs": self.field_stats.n_docs,
            "total_term_freq": self.field_stats.total_term_freq,
            "with_positions": self.with_positions,
            "analyzer": self.analyzer_name,
            "has_deleted": self.deleted is not None,
        }
        tmp = os.path.join(path, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "manifest.json"))  # atomic commit

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "InvertedIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        return cls(
            postings=spark.read.parquet(os.path.join(path, "postings")),
            docs=spark.read.parquet(os.path.join(path, "docs")),
            term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
            field_stats=FieldStats(
                n_docs=manifest["n_docs"],
                total_term_freq=manifest["total_term_freq"],
            ),
            with_positions=manifest["with_positions"],
            analyzer_name=manifest["analyzer"],
            deleted=(
                spark.read.parquet(os.path.join(path, "deleted"))
                if manifest.get("has_deleted")
                else None
            ),
        )

    def cache(self) -> "InvertedIndex":
        self.postings.cache()
        self.docs.cache()
        self.term_stats.cache()
        return self


def _make_block_decoder(want_pos: bool):
    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = batch.to_pydict()
            terms_out: list[str] = []
            docs_out: list[np.ndarray] = []
            freqs_out: list[np.ndarray] = []
            dls_out: list[np.ndarray] = []
            pos_out: list[list] = []
            counts: list[int] = []
            for i in range(batch.num_rows):
                n = tbl["n_docs"][i]
                doc_ids, freqs = codec.unpack_docs_freqs(tbl["docs"][i], n)
                dls = codec.varint_decode(tbl["dls"][i])
                docs_out.append(doc_ids.astype(np.int64))
                freqs_out.append(freqs.astype(np.int32))
                dls_out.append(dls.astype(np.int32))
                counts.append(n)
                if want_pos:
                    pos_concat = codec.decode_position_lists(
                        tbl["positions"][i], freqs
                    ).astype(np.int32)
                    splits = np.cumsum(freqs.astype(np.int64))[:-1]
                    pos_out.extend(
                        [p.tolist() for p in np.split(pos_concat, splits)]
                    )
            if not counts:
                continue
            term_arr = pa.array(
                np.repeat(np.asarray(tbl["term"], dtype=object), counts)
            )
            arrays = [
                term_arr,
                pa.array(np.concatenate(docs_out) if docs_out else []),
                pa.array(np.concatenate(freqs_out) if freqs_out else []),
                pa.array(np.concatenate(dls_out) if dls_out else []),
            ]
            names = ["term", "doc_id", "freq", "dl"]
            if want_pos:
                arrays.append(pa.array(pos_out, type=pa.list_(pa.int32())))
                names.append("positions")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return decode
