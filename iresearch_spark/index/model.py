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
        # per-occurrence character spans (reference IndexFeatures OFFS,
        # index_features.hpp:50-57): start deltas / lengths, varint —
        # null unless the index was built with_offsets
        T.StructField("off_starts", T.BinaryType(), True),
        T.StructField("off_lens", T.BinaryType(), True),
        # per-occurrence payload bytes (reference IndexFeatures PAY,
        # index_features.hpp:40-58; payload stream formats_10.cpp:
        # 714-765): varint lengths + concatenated bytes — null unless
        # the index was built with a payload source
        T.StructField("pay_lens", T.BinaryType(), True),
        T.StructField("pay_bytes", T.BinaryType(), True),
        # per-block (tf, dl) impact pairs — Lucene-style block-max
        # impacts (one pair per power-of-two dl class): a per-doc
        # partial score is bounded by max over pairs of g(tf, dl),
        # which is far tighter than g(block_max_freq, block_min_dl)
        # when a block mixes short docs with high-tf docs. Nullable:
        # pre-round-5 indexes lack it and WAND falls back to the
        # (max_freq, min_dl) bound.
        T.StructField(
            "block_impacts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tf", T.IntegerType(), False),
                        T.StructField("dl", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        ),
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

_OFFSET_FIELDS = [
    T.StructField("off_starts", T.ArrayType(T.IntegerType()), True),
    T.StructField("off_lens", T.ArrayType(T.IntegerType()), True),
]

_PAYLOAD_FIELD = [
    T.StructField("payloads", T.ArrayType(T.BinaryType()), True),
]


@dataclass
class FieldStats:
    """Index-wide stats used by scorers (reference FieldCollector)."""

    n_docs: int
    total_term_freq: int
    # max doc length across the index — the reference's Norm2 encoding
    # choice (norm.hpp Norm2Header: max <= 255 packs norms into one
    # byte, selecting the kNorm2Tiny scorer path, bm25.cpp:464-476).
    # None = unknown (old manifests); computed lazily when float32
    # parity mode needs it
    max_dl: int | None = None

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
    # per-occurrence character offsets stored (IndexFeatures OFFS)
    with_offsets: bool = False
    # per-occurrence payload bytes stored (IndexFeatures PAY)
    with_payloads: bool = False
    # norm variant the index was built with: "norm2" (dl as int — the
    # reference's Norm2, norm.hpp:71+) or "legacy" (the old-style Norm,
    # norm.hpp:46-70: 1/sqrt(dl) stored as float32 in docs.norm;
    # scorers then use tf = sqrt(freq), |doc| = sqrt(dl))
    norm: str = "norm2"
    # delete mask (reference: per-segment deleted-docs bitset applied at
    # read time, index_writer.hpp:376-411; stats stay stale until a
    # consolidation purges the postings — same semantics here)
    deleted: DataFrame | None = None
    # the cached raw block DataFrame the tables above derive from (set
    # by build_index) — kept so unpersist() can actually free it
    blocks: DataFrame | None = None
    # term hash-bucket partition count(s) of a SAVED index (None for
    # an in-memory one): postings live under _tb=crc32(term)%B dirs, so
    # a query that knows its exact terms prunes whole directories at
    # plan time — the Spark-native analogue of the reference's FST
    # term-dictionary seek (formats_burst_trie.cpp:953-966). A merged
    # multi-segment view may carry a LIST of bucket counts (one per
    # distinct segment layout): the pruning filter then includes each
    # term's bucket under EVERY count, which over-includes but never
    # drops a matching file.
    term_buckets: int | list[int] | None = None
    # term-dictionary block index of a SAVED index: [(file_path,
    # min_term, max_term)] for the range-partitioned, term-sorted
    # term_stats files — the analogue of the reference burst-trie's
    # per-block term ranges (formats_burst_trie.cpp:953-966). Lets
    # Prefix/Range (and literal-prefix Wildcard / prefixed Fuzzy)
    # expansion read only the files whose [min, max] intersects the
    # query's term interval instead of scanning the whole vocabulary.
    # On an Iceberg deployment this map IS the table's file manifest —
    # the same pruning falls out of min/max column stats.
    term_stats_ranges: list | None = None
    # the reversed-term dictionary's file ranges ([(path, min_rterm,
    # max_rterm)], rows sorted by reverse(term)) — leading-wildcard
    # patterns with a literal suffix prune on the reversed interval
    term_stats_rev_ranges: list | None = None
    # the k-gram index's file ranges ([(path, min_gram, max_gram)]):
    # a (gram, term, df) table of every padded character 3-gram of
    # every dictionary term, range-partitioned and sorted by gram —
    # the classic IR-textbook k-gram index (Manning et al., IIR
    # §3.2.2) that serves the two expansion shapes neither the
    # forward nor the reversed dictionary can seek: infix-only
    # wildcards ('%abc%def%') and unprefixed fuzzy terms. The
    # reference walks a wildcard/Levenshtein automaton intersected
    # with its FST (wildcard_utils.cpp, levenshtein_utils.cpp); on
    # Spark the same "touch only plausible terms" effect comes from
    # a gram-posting equi-lookup + count filter.
    term_grams_ranges: list | None = None
    # granular numeric term dictionary (reference numeric_token_stream
    # + by_granular_range — see index/numeric.py): (field, shift,
    # prefix, doc_id) rows, written sorted by (field, shift, prefix) so
    # a range query's per-level BETWEENs prune row groups. None when
    # the index was built without numeric_fields (GranularRange then
    # falls back to the stored docs column when present).
    num_terms: DataFrame | None = None
    # {field: "long" | "double"} — the query-bound sortable mapping
    numeric_meta: dict | None = None
    # trie granularity step (64 = single level, the Spark default;
    # reference PRECISION_STEP_DEF = 16)
    precision_step: int = 64
    # SORTED index (the reference's Comparer, core/index/comparer.hpp:
    # index_writer laid out in comparator order, merge_writer remaps via
    # a comparator-aware doc map): doc_id order == (sort_field asc|desc,
    # sort_key) order. None = unsorted (hash-bucket key order).
    sort_field: str | None = None
    sort_ascending: bool = True
    # SAVED sorted index: per-file [path, min_doc, max_doc, rows] of
    # the doc-id-range-partitioned docs table, sorted by min_doc —
    # top_docs reads only the head files covering k rows
    docs_ranges: list | None = None
    # True on a merged multi-segment view (streaming/incremental.read):
    # dictionary rows (term_stats/rev/gram files) then appear once PER
    # SEGMENT with segment-local df/cf, so every pruned accessor must
    # re-aggregate (sum df — doc ids are disjoint across segments)
    # before handing rows to callers. A single saved index has unique
    # rows carrying the global stats and skips that shuffle.
    gram_df_duplicated: bool = False

    def _agg_stats(self, df: DataFrame) -> DataFrame:
        """Collapse per-segment dictionary rows to global stats (sum
        df/cf per term) on merged views; identity on a single index."""
        if not self.gram_df_duplicated:
            return df
        aggs = [F.sum("df").alias("df")]
        if "cf" in df.columns:
            aggs.append(F.sum("cf").alias("cf"))
        return df.groupBy("term").agg(*aggs)

    def pruned_term_stats(
        self,
        lo: str | None = None,
        hi: str | None = None,
        hi_inclusive: bool = True,
    ) -> tuple[DataFrame, int | None, int | None]:
        """term_stats narrowed to the saved files whose [min_term,
        max_term] intersects [lo, hi] — the FST term-dictionary seek for
        multi-term expansion (returns (df, files_selected, files_total);
        counts are None for an in-memory index, where the full
        DataFrame is the only choice). Never drops a matching term:
        selection is by file min/max overlap, the caller still applies
        its exact predicate."""
        ranges = self.term_stats_ranges
        if not ranges:
            return self.term_stats, None, None
        sel = [
            p
            for (p, mn, mx) in ranges
            if (lo is None or mx >= lo)
            and (
                hi is None
                or (mn <= hi if hi_inclusive else mn < hi)
            )
        ]
        total = len(ranges)
        if len(sel) == total:
            return self.term_stats, total, total
        spark = self.term_stats.sparkSession
        if not sel:
            return (
                spark.createDataFrame([], self.term_stats.schema),
                0,
                total,
            )
        return self._agg_stats(spark.read.parquet(*sel)), len(sel), total

    def pruned_rev_term_stats(
        self, rlo: str, rhi: str | None
    ) -> tuple[DataFrame, int | None, int | None]:
        """term_stats narrowed via the REVERSED-term dictionary: files
        whose [min_rterm, max_rterm] intersects [rlo, rhi) — the
        leading-wildcard seek (a literal suffix reversed is a prefix of
        reverse(term)). Falls back to the full table when the index
        has no reversed layout (in-memory, or pre-round-4 manifests)."""
        ranges = self.term_stats_rev_ranges
        if not ranges:
            return self.term_stats, None, None
        sel = [
            p
            for (p, mn, mx) in ranges
            if mx >= rlo and (rhi is None or mn < rhi)
        ]
        total = len(ranges)
        if len(sel) == total:
            return self.term_stats, total, total
        spark = self.term_stats.sparkSession
        if not sel:
            return (
                spark.createDataFrame([], self.term_stats.schema),
                0,
                total,
            )
        df = spark.read.parquet(*sorted(sel))
        if "rterm" in df.columns:
            df = df.drop("rterm")
        return self._agg_stats(df), len(sel), total

    def term_stats_for_terms(self, terms: list[str]) -> DataFrame:
        """term_stats narrowed to the dictionary files that can hold the
        given exact terms (binary search over the sorted per-file term
        ranges — the per-term FST seek). Falls back to the full table
        for an in-memory index. On a merged multi-segment view the
        concatenated ranges OVERLAP (one interval set per segment), so
        selection is a linear intersection scan and the per-segment
        rows are re-aggregated to global stats."""
        ranges = self.term_stats_ranges
        if not ranges or not terms:
            return self.term_stats
        sel: set[str] = set()
        if self.gram_df_duplicated:
            # overlapping per-segment intervals: point-in-interval scan
            # (driver-side, O(terms x files) over tiny lists)
            for t in terms:
                for p, mn, mx in ranges:
                    if mn <= t <= mx:
                        sel.add(p)
        else:
            import bisect

            mins = [mn for (_, mn, _) in ranges]  # ranges sorted by min
            for t in terms:
                i = bisect.bisect_right(mins, t) - 1
                if i >= 0 and ranges[i][1] <= t <= ranges[i][2]:
                    sel.add(ranges[i][0])
        spark = self.term_stats.sparkSession
        if not sel:
            return spark.createDataFrame([], self.term_stats.schema)
        if len(sel) == len(ranges):
            return self.term_stats
        return self._agg_stats(spark.read.parquet(*sorted(sel)))

    def gram_files_for(self, grams: list[str]) -> tuple[list[str], int]:
        """(gram-index files that can hold any of the given grams,
        total files). Point lookups over the sorted per-file [min, max]
        gram ranges; a merged multi-segment view carries the
        concatenation of its segments' ranges, so the linear
        intersection scan stays correct there too (the list is
        O(files), tiny)."""
        ranges = self.term_grams_ranges or []
        sel = sorted(
            {
                p
                for (p, mn, mx) in ranges
                for g in grams
                if mn <= g <= mx
            }
        )
        return sel, len(ranges)

    def gram_candidate_terms(
        self, grams: list[str], min_match: int
    ) -> DataFrame | None:
        """(term, df) of dictionary terms containing >= min_match of
        the given padded 3-grams, via the k-gram index. None when the
        index has no gram layout (in-memory, or a pre-round-4 save) —
        callers fall back to the full vocabulary scan.

        Two-level aggregation so multi-segment views are exact: a term
        present in several segments contributes one gram row PER
        segment with its segment-local df; summing df per (gram, term)
        first reconstitutes the global df (doc ids are disjoint across
        segments), then the distinct-gram count per term applies the
        match threshold."""
        if self.term_grams_ranges is None or not grams:
            return None
        sel, _total = self.gram_files_for(grams)
        spark = self.term_stats.sparkSession
        if not sel:
            return spark.createDataFrame([], "term string, df long")
        df = spark.read.parquet(*sel).filter(
            F.col("gram").isin(list(grams))
        )
        if self.gram_df_duplicated:
            # merged view: re-sum per-segment dfs first (doc ids are
            # disjoint across segments, and every segment containing a
            # term emits the same gram set, so the per-gram sums agree)
            df = df.groupBy("gram", "term").agg(F.sum("df").alias("df"))
        elif len(grams) == 1:
            # unique (gram, term) rows with global df: the single-gram
            # lookup needs no aggregation at all
            return df.select("term", "df")
        return (
            df.groupBy("term")
            .agg(
                F.count("gram").alias("_gc"),
                F.max("df").alias("df"),
            )
            .filter(F.col("_gc") >= int(min_match))
            .select("term", "df")
        )

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Postings scan narrowed to the given exact terms: directory
        (partition) pruning via the _tb bucket column when available,
        plus the term predicate (parquet row-group pruning)."""
        df = self.postings
        if self.term_buckets and terms:
            import zlib

            counts = (
                [self.term_buckets]
                if isinstance(self.term_buckets, int)
                else list(self.term_buckets)
            )
            buckets = sorted(
                {
                    zlib.crc32(t.encode("utf-8")) % b
                    for t in terms
                    for b in counts
                }
            )
            df = df.filter(F.col("_tb").isin(buckets))
        return df.filter(F.col("term").isin(list(terms)))

    def unpersist(self) -> "InvertedIndex":
        for df in (self.postings, self.docs, self.term_stats,
                   self.blocks, self.deleted, self.num_terms):
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
        self,
        terms: list[str] | None = None,
        with_positions: bool = False,
        with_offsets: bool = False,
        with_payloads: bool = False,
    ) -> DataFrame:
        """Posting blocks -> (term, doc_id, freq, dl[, positions]
        [, off_starts, off_lens]) rows.

        The term filter is a pushed-down parquet predicate (check
        `PushedFilters` in .explain); decode is one `mapInArrow` pass —
        numpy cumsum per block, no per-row Python.
        """
        if terms is not None:
            # spread the (small) filtered block set across the cluster
            # before decoding: a hot term's blocks live in ONE bucket
            # file, so without this the decode of millions of postings
            # runs in a single task. The shuffle moves only the term's
            # packed blobs (KBs..MBs), the decode then parallelizes.
            df = self.postings_for_terms(list(terms)).repartition(
                self.postings.sparkSession.sparkContext.defaultParallelism
            )
        else:
            df = self.postings
        want_pos = with_positions and self.with_positions
        want_offs = with_offsets and self.with_offsets
        want_pay = with_payloads and self.with_payloads
        # ship ONLY what the decoder reads — the JVM->Python transfer is
        # the dominant query-path cost (measured 2x on full rows)
        cols = ["term", "n_docs", "docs", "dls"]
        if want_pos:
            cols.append("positions")
        if want_offs:
            cols.extend(["off_starts", "off_lens"])
        if want_pay:
            cols.extend(["pay_lens", "pay_bytes"])
        df = df.select(*cols)
        schema = DECODED_POS_SCHEMA if want_pos else DECODED_SCHEMA
        if want_offs:
            schema = T.StructType(schema.fields + _OFFSET_FIELDS)
        if want_pay:
            schema = T.StructType(schema.fields + _PAYLOAD_FIELD)
        return df.mapInArrow(
            _make_block_decoder(want_pos, want_offs, want_pay), schema
        )

    # ---- persistence -----------------------------------------------------

    def save(
        self,
        path: str,
        mode: str = "overwrite",
        optimize_layout: bool = True,
        encryption=None,
    ) -> None:
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

        With `encryption=` (an index.encryption.IndexEncryption) every
        table is written with Parquet Modular Encryption — pages AND
        footers AES-GCM-sealed — the Spark-native analogue of the
        reference's directory-level cipher (`irs::encryption`,
        core/store/directory_attributes.hpp:32-65). Plaintext term
        ranges are then kept OUT of the manifest (they would leak the
        vocabulary); keyed scans still prune at row-group level from
        the decrypted footer statistics.
        """
        wopts = {}
        if encryption is not None:
            encryption.apply(self.postings.sparkSession)
            wopts = encryption.write_options()
        postings = self.postings
        for c in ("_tb", "_tbd"):  # re-saving a loaded index
            if c in postings.columns:
                postings = postings.drop(c)
        term_buckets = None
        docs_ranges = None
        if optimize_layout:
            # ~2M block rows per bucket keeps files O(100MB); min 16
            # buckets so exact-term queries prune to <=1/16 of the
            # index even when it is small
            n_blocks = postings.count()
            n_part = max(1, min(
                postings.rdd.getNumPartitions(), (n_blocks // 2_000_000) + 1
            ))
            term_buckets = max(16, n_part)
            postings = (
                postings.withColumn(
                    "_tb",
                    F.pmod(
                        F.crc32(F.col("term").cast("binary")),
                        F.lit(term_buckets),
                    ).cast("int"),
                )
                # _tbd duplicates the bucket INSIDE the data files:
                # partitionBy strips _tb from the data, and a flat
                # multi-segment read (recursiveFileLookup, no partition
                # discovery) would otherwise lose bucket pruning —
                # streaming/incremental.read renames _tbd back to _tb.
                # Cost: one constant int per file, RLE'd to ~nothing.
                .withColumn("_tbd", F.col("_tb"))
                .repartition(term_buckets, "_tb")
                .sortWithinPartitions("term", "block_id")
            )
        else:
            n_part = max(self.postings.rdd.getNumPartitions(), 1)
        ts_path = os.path.join(path, "term_stats")
        term_stats_ranges = None
        # the dictionary is written three times (forward + reversed +
        # k-gram layouts) and counted once — persist so the groupBy
        # over posting blocks that derives it runs ONCE, not per
        # consumer
        ts_cached = self.term_stats.persist()
        if optimize_layout:
            # term dictionary: range-partitioned and sorted by term, so
            # each file covers one contiguous term interval; the
            # per-file [min, max] manifest map is the burst-trie block
            # index (formats_burst_trie.cpp:953-966) that lets Prefix/
            # Range expansion seek instead of scanning the vocabulary.
            # ~2M terms per file keeps dictionaries O(10MB); min 16
            # files so even small indexes demonstrate pruning.
            n_terms = ts_cached.count()
            ts_files = max(16, min(n_part * 4, (n_terms // 2_000_000) + 16))
            rev_path = os.path.join(path, "term_stats_rev")
            grams_path = os.path.join(path, "term_grams")
            gram_files = max(16, min(n_part * 4, (n_terms // 250_000) + 16))

            def _w_postings():
                postings.write.options(**wopts).mode(mode).partitionBy("_tb").parquet(
                    os.path.join(path, "postings")
                )

            def _w_docs():
                if self.sort_field is not None:
                    # SORTED index: docs written in doc-id order across
                    # disjoint file ranges, so "first k in sort order"
                    # (top_docs) reads only the head files — the
                    # distributed analogue of the reference's in-order
                    # segment iteration stopping at k. Range boundaries
                    # come from sampling (file SIZES may vary run to
                    # run) but values/order are already fixed, so
                    # determinism of results is unaffected.
                    (
                        self.docs.repartitionByRange(
                            max(16, n_part), "doc_id"
                        )
                        .sortWithinPartitions("doc_id")
                        .write.options(**wopts).mode(mode)
                        .parquet(os.path.join(path, "docs"))
                    )
                else:
                    self.docs.coalesce(n_part).write.options(**wopts).mode(mode).parquet(
                        os.path.join(path, "docs")
                    )

            def _w_fwd():
                (
                    ts_cached.repartitionByRange(ts_files, "term")
                    .sortWithinPartitions("term")
                    .write.options(**wopts).mode(mode)
                    .parquet(ts_path)
                )

            def _w_rev():
                # reversed-term dictionary (the Lucene reversed-field
                # trick): the same rows sorted by reverse(term), so a
                # pattern with only a literal SUFFIX ('%tion') prunes
                # files by the reversed-suffix interval
                (
                    ts_cached.withColumn("rterm", F.reverse(F.col("term")))
                    .repartitionByRange(ts_files, "rterm")
                    .sortWithinPartitions("rterm")
                    .write.options(**wopts).mode(mode)
                    .parquet(rev_path)
                )

            def _w_grams():
                # k-gram index (IIR §3.2.2): every padded character
                # 3-gram of every dictionary term, sorted by gram —
                # serves infix-only wildcards and unprefixed fuzzy, the
                # two shapes the forward/reversed dictionaries can't
                # seek (the Spark analogue of the reference's automaton
                # ∩ FST walk, wildcard_utils.cpp/levenshtein_utils.cpp)
                (
                    ts_cached.withColumn(
                        "_p",
                        F.concat(F.lit("\x02"), F.col("term"), F.lit("\x03")),
                    )
                    .select(
                        F.explode(
                            F.array_distinct(
                                F.expr(
                                    "transform(sequence(1, length(_p) - 2),"
                                    " i -> substring(_p, i, 3))"
                                )
                            )
                        ).alias("gram"),
                        "term",
                        "df",
                    )
                    .repartitionByRange(gram_files, "gram")
                    .sortWithinPartitions("gram", "term")
                    .write.options(**wopts).mode(mode)
                    .parquet(grams_path)
                )

            writers = [_w_postings, _w_docs, _w_fwd, _w_rev, _w_grams]
            if self.num_terms is not None:

                def _w_num():
                    # numeric term dictionary: sorted by (field, shift,
                    # prefix) so each per-level BETWEEN of a granular
                    # range decomposition reads only the row groups
                    # whose min/max prefix intersects it
                    (
                        self.num_terms.repartitionByRange(
                            max(16, n_part), "field", "shift", "prefix"
                        )
                        .sortWithinPartitions("field", "shift", "prefix")
                        .write.options(**wopts).mode(mode)
                        .parquet(os.path.join(path, "num_terms"))
                    )

                writers.append(_w_num)
            # the table writes are independent jobs over distinct
            # output dirs — submit them concurrently (Spark's scheduler
            # interleaves jobs from multiple driver threads), so the
            # wall-clock is the longest write, not the sum
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(writers)) as ex:
                futs = [ex.submit(f) for f in writers]
                for fut in futs:
                    fut.result()
            if encryption is None:
                (
                    term_stats_ranges,
                    term_stats_rev_ranges,
                    term_grams_ranges,
                ) = self._dictionary_file_ranges(path)
            else:
                # encrypted index: per-file TERM ranges are plaintext
                # vocabulary — keeping them out of manifest.json is the
                # point of sealing the dictionary files. Keyed scans
                # still prune at row-group level from the decrypted
                # footer statistics.
                term_stats_rev_ranges = None
                term_grams_ranges = None
            if self.sort_field is not None:
                docs_ranges = self._docs_file_ranges(path)
        else:
            postings.write.options(**wopts).mode(mode).parquet(os.path.join(path, "postings"))
            self.docs.coalesce(n_part).write.options(**wopts).mode(mode).parquet(
                os.path.join(path, "docs")
            )
            term_stats_rev_ranges = None
            term_grams_ranges = None
            ts_cached.coalesce(n_part).write.options(**wopts).mode(mode).parquet(ts_path)
            if self.num_terms is not None:
                self.num_terms.write.options(**wopts).mode(mode).parquet(
                    os.path.join(path, "num_terms")
                )
        ts_cached.unpersist()
        if self.deleted is not None:
            self.deleted.write.options(**wopts).mode(mode).parquet(os.path.join(path, "deleted"))
        manifest = {
            "version": 1,
            "n_docs": self.field_stats.n_docs,
            "total_term_freq": self.field_stats.total_term_freq,
            "with_positions": self.with_positions,
            "with_offsets": self.with_offsets,
            "with_payloads": self.with_payloads,
            "analyzer": self.analyzer_name,
            "norm": self.norm,
            "max_dl": self.field_stats.max_dl,
            "has_deleted": self.deleted is not None,
            "term_buckets": term_buckets,
            "term_stats_ranges": term_stats_ranges,
            "term_stats_rev_ranges": term_stats_rev_ranges,
            "term_grams_ranges": term_grams_ranges,
            # bucket id also present as the _tbd data column (flat
            # multi-segment reads rely on it; absent in old segments)
            "tb_data_col": term_buckets is not None,
            "numeric_meta": self.numeric_meta,
            "precision_step": self.precision_step,
            "sort_field": self.sort_field,
            "sort_ascending": self.sort_ascending,
            # per-file [min_doc, max_doc, rows] of the doc-id-range-
            # partitioned docs table (sorted indexes only): top_docs
            # reads just the head files covering its k
            "docs_ranges": docs_ranges,
            # names only (KMS class + master-key NAME), never key bytes
            "encryption": (
                encryption.manifest_record() if encryption else None
            ),
        }
        tmp = os.path.join(path, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "manifest.json"))  # atomic commit

    def _dictionary_file_ranges(self, path: str):
        """Per-file [min, max] key ranges for the three dictionary
        layouts (forward/reversed/k-gram — the burst-trie block-index
        analogue, formats_burst_trie.cpp:953-966).

        Fast path: read the parquet FOOTER statistics driver-side — no
        data scan, exactly what an Iceberg manifest provides for free.
        Parquet writers may truncate long string stats but must keep
        them valid bounds, so range selection stays sound (overlap
        test only; the exact predicate is always re-applied). Falls
        back to one Spark aggregation job when footers are unreadable
        driver-side (remote filesystem) or any file lacks stats."""
        dirs = [
            (os.path.join(path, "term_stats"), "term"),
            (os.path.join(path, "term_stats_rev"), "rterm"),
            (os.path.join(path, "term_grams"), "gram"),
        ]
        try:
            import duckdb

            out = []
            for d, colname in dirs:
                n_files = sum(
                    1 for f in os.listdir(d) if f.endswith(".parquet")
                )
                rows = duckdb.execute(
                    "SELECT file_name, min(stats_min_value),"
                    " max(stats_max_value)"
                    " FROM parquet_metadata(?)"
                    " WHERE path_in_schema = ? GROUP BY file_name",
                    [os.path.join(d, "*.parquet"), colname],
                ).fetchall()
                if len(rows) != n_files or any(
                    mn is None or mx is None for _, mn, mx in rows
                ):
                    raise ValueError("parquet stats missing")
                out.append(
                    sorted(
                        (os.path.relpath(f, path), mn, mx)
                        for f, mn, mx in rows
                    )
                )
            return tuple(out)
        except Exception:
            pass
        franges = (
            self.term_stats.sparkSession.read.option("mergeSchema", "true")
            .parquet(*[d for d, _ in dirs])
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("term").alias("mn"),
                F.max("term").alias("mx"),
                F.min("rterm").alias("rmn"),
                F.max("rterm").alias("rmx"),
                F.min("gram").alias("gmn"),
                F.max("gram").alias("gmx"),
            )
            .collect()
        )
        prefix = "file:"

        def _rel(f: str) -> str:
            return os.path.relpath(
                f[len(prefix):] if f.startswith(prefix) else f, path
            )

        return (
            sorted(
                (_rel(r["f"]), r["mn"], r["mx"])
                for r in franges
                if r["rmn"] is None and r["gmn"] is None
            ),
            sorted(
                (_rel(r["f"]), r["rmn"], r["rmx"])
                for r in franges
                if r["rmn"] is not None
            ),
            sorted(
                (_rel(r["f"]), r["gmn"], r["gmx"])
                for r in franges
                if r["gmn"] is not None
            ),
        )

    def _docs_file_ranges(self, path: str):
        """Per-file [min_doc, max_doc, rows] for the doc-id-range-
        partitioned docs table of a SORTED index. Footer statistics
        driver-side (duckdb), Spark-aggregation fallback."""
        d = os.path.join(path, "docs")
        try:
            import duckdb

            n_files = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
            rows = duckdb.execute(
                "SELECT file_name,"
                " min(CAST(stats_min_value AS BIGINT)),"
                " max(CAST(stats_max_value AS BIGINT)),"
                " sum(num_values)"
                " FROM parquet_metadata(?)"
                " WHERE path_in_schema = 'doc_id' GROUP BY file_name",
                [os.path.join(d, "*.parquet")],
            ).fetchall()
            if len(rows) != n_files or any(
                mn is None or mx is None for _, mn, mx, _ in rows
            ):
                raise ValueError("parquet stats missing")
            return sorted(
                ((os.path.relpath(f, path), int(mn), int(mx), int(n))
                 for f, mn, mx, n in rows),
                key=lambda r: r[1],
            )
        except Exception:
            pass
        franges = (
            self.docs.sparkSession.read.parquet(d)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("doc_id").alias("mn"),
                F.max("doc_id").alias("mx"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        prefix = "file:"

        def _rel(f: str) -> str:
            return os.path.relpath(
                f[len(prefix):] if f.startswith(prefix) else f, path
            )

        return sorted(
            ((_rel(r["f"]), int(r["mn"]), int(r["mx"]), int(r["n"]))
             for r in franges),
            key=lambda r: r[1],
        )

    # ------------------------------------------------ snapshot commits

    def save_snapshot(self, path: str, **save_kw) -> int:
        """Iceberg-style snapshot commit (the BASELINE.json design
        point, exercised without the iceberg-spark-runtime jar): each
        commit writes a NEW immutable data version under `path/v{N}`
        (the full save() layout, itself manifest-atomic), appends a
        record to `snapshots.json`, and finally swaps the top-level
        `manifest.json` pointer — readers always see a complete
        snapshot, never a partial write, and every previous version
        stays readable via load(..., snapshot_id=) until
        expire_snapshots drops it. Returns the new snapshot id."""
        import time as _time

        os.makedirs(path, exist_ok=True)
        snaps = self._read_snapshot_log(path)
        sid = (max((s["id"] for s in snaps), default=0)) + 1
        data_dir = os.path.join(path, f"v{sid}")
        self.save(data_dir, mode="overwrite", **save_kw)
        snaps.append(
            {
                "id": sid,
                "committed_at": _time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", _time.gmtime()
                ),
                "n_docs": self.field_stats.n_docs,
                "data_dir": f"v{sid}",
            }
        )
        tmp = os.path.join(path, "_snapshots.json.tmp")
        with open(tmp, "w") as f:
            json.dump(snaps, f)
        os.replace(tmp, os.path.join(path, "snapshots.json"))
        # publish: the pointer swap is the commit
        tmp = os.path.join(path, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"snapshot_pointer": sid}, f)
        os.replace(tmp, os.path.join(path, "manifest.json"))
        return sid

    @staticmethod
    def _read_snapshot_log(path: str) -> list:
        p = os.path.join(path, "snapshots.json")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    @staticmethod
    def snapshots(path: str) -> list:
        """The snapshot log (id, committed_at, n_docs, data_dir)."""
        return InvertedIndex._read_snapshot_log(path)

    @staticmethod
    def expire_snapshots(path: str, keep_last: int = 1) -> list[int]:
        """Drop all but the newest `keep_last` snapshots (their data
        dirs deleted, the log rewritten). The current pointer's
        snapshot is always kept. Returns the expired ids."""
        import shutil

        snaps = InvertedIndex._read_snapshot_log(path)
        if not snaps:
            return []
        with open(os.path.join(path, "manifest.json")) as f:
            current = json.load(f).get("snapshot_pointer")
        snaps.sort(key=lambda s: s["id"])
        keep = {s["id"] for s in snaps[-max(keep_last, 1):]}
        if current is not None:
            keep.add(current)
        expired = []
        kept = []
        for s in snaps:
            if s["id"] in keep:
                kept.append(s)
                continue
            shutil.rmtree(os.path.join(path, s["data_dir"]),
                          ignore_errors=True)
            expired.append(s["id"])
        tmp = os.path.join(path, "_snapshots.json.tmp")
        with open(tmp, "w") as f:
            json.dump(kept, f)
        os.replace(tmp, os.path.join(path, "snapshots.json"))
        return expired

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        path: str,
        snapshot_id: int | None = None,
        encryption=None,
    ) -> "InvertedIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        if "snapshot_pointer" in manifest:
            # snapshot-committed index: follow the pointer (or time-
            # travel to an explicit snapshot id)
            sid = snapshot_id if snapshot_id is not None else manifest[
                "snapshot_pointer"
            ]
            snaps = {s["id"]: s for s in cls._read_snapshot_log(path)}
            if sid not in snaps:
                raise ValueError(
                    f"snapshot {sid} not in log (have {sorted(snaps)})"
                )
            return cls.load(
                spark,
                os.path.join(path, snaps[sid]["data_dir"]),
                encryption=encryption,
            )
        if snapshot_id is not None:
            raise ValueError("index was not saved with save_snapshot")
        enc_rec = manifest.get("encryption")
        if enc_rec and encryption is None:
            raise ValueError(
                "index is encrypted (footer key "
                f"{enc_rec.get('footer_key')!r} via "
                f"{enc_rec.get('kms_client_class')}): pass encryption= "
                "with the master keys to load it"
            )
        if encryption is not None:
            encryption.apply(spark)
        postings = spark.read.parquet(os.path.join(path, "postings"))
        if "block_impacts" not in postings.columns:
            # pre-round-5 index: no impacts column — null-fill so every
            # consumer sees one schema (WAND then uses the loose bound)
            postings = postings.withColumn(
                "block_impacts",
                F.lit(None).cast("array<struct<tf:int,dl:int>>"),
            )
        return cls(
            postings=postings,
            docs=spark.read.parquet(os.path.join(path, "docs")),
            term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
            field_stats=FieldStats(
                n_docs=manifest["n_docs"],
                total_term_freq=manifest["total_term_freq"],
                max_dl=manifest.get("max_dl"),
            ),
            with_positions=manifest["with_positions"],
            with_offsets=manifest.get("with_offsets", False),
            with_payloads=manifest.get("with_payloads", False),
            norm=manifest.get("norm", "norm2"),
            analyzer_name=manifest["analyzer"],
            deleted=(
                spark.read.parquet(os.path.join(path, "deleted"))
                if manifest.get("has_deleted")
                else None
            ),
            term_buckets=manifest.get("term_buckets"),
            term_stats_ranges=(
                [
                    (os.path.join(path, f), mn, mx)
                    for f, mn, mx in manifest["term_stats_ranges"]
                ]
                if manifest.get("term_stats_ranges")
                else None
            ),
            term_stats_rev_ranges=(
                [
                    (os.path.join(path, f), mn, mx)
                    for f, mn, mx in manifest["term_stats_rev_ranges"]
                ]
                if manifest.get("term_stats_rev_ranges")
                else None
            ),
            term_grams_ranges=(
                [
                    (os.path.join(path, f), mn, mx)
                    for f, mn, mx in manifest["term_grams_ranges"]
                ]
                if manifest.get("term_grams_ranges")
                else None
            ),
            num_terms=(
                spark.read.parquet(os.path.join(path, "num_terms"))
                if manifest.get("numeric_meta")
                else None
            ),
            numeric_meta=manifest.get("numeric_meta"),
            precision_step=manifest.get("precision_step", 64),
            sort_field=manifest.get("sort_field"),
            sort_ascending=manifest.get("sort_ascending", True),
            docs_ranges=(
                [
                    (os.path.join(path, f), mn, mx, n)
                    for f, mn, mx, n in manifest["docs_ranges"]
                ]
                if manifest.get("docs_ranges")
                else None
            ),
        )

    def cache(self) -> "InvertedIndex":
        self.postings.cache()
        self.docs.cache()
        self.term_stats.cache()
        return self


def _binary_slab(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data bytes as uint8 view, per-row absolute offsets[n+1]) of a
    BinaryArray — Arrow already stores all blobs CONCATENATED, so the
    whole batch decodes as one slab with zero copies."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_buf = arr.buffers()[1]
    offsets = np.frombuffer(off_buf, dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, offsets


def decode_batch_arrays(
    batch: pa.RecordBatch,
    want_pos: bool,
    want_offs: bool = False,
    want_pay: bool = False,
):
    """Vectorized batch decode -> numpy arrays, no per-row Python.

    Each binary column's blobs form one contiguous Arrow buffer,
    decoded by a single varint pass + segmented cumsums (per-block
    delta restarts handled by subtracting per-segment bases).

    Returns None for an empty batch, else a dict:
      term_dict  pa.Array   distinct terms of the batch
      row_codes  int64[N]   per-posting index into term_dict
      doc_ids    int64[N]
      freqs      int64[N]
      dls        int64[N]
      pos_offsets int64[N+1], pos_values int32[...]  (when want_pos)
    """
    B = batch.num_rows
    if B == 0:
        return None
    names = batch.schema.names
    col = {n: batch.column(names.index(n)) for n in (
        "term", "n_docs", "docs", "dls", "positions", "off_starts",
        "off_lens", "pay_lens", "pay_bytes"
    ) if n in names}
    n_docs = col["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n_docs.sum())
    row_start = np.concatenate(([0], np.cumsum(n_docs)[:-1]))
    owner = np.repeat(np.arange(B), n_docs)

    # ---- docs stream: [packed gaps x n_docs, freqs of multis]
    data, off = _binary_slab(col["docs"])
    lo, hi = off[0], off[-1]
    slab = data[lo:hi]
    vals = codec.varint_decode(slab)
    vcount_prefix = np.concatenate(([0], np.cumsum(slab < 0x80)))
    val_start = vcount_prefix[off - lo][:-1]  # values before blob i
    gap_idx = val_start[owner] + (np.arange(total) - row_start[owner])
    packed = vals[gap_idx]
    single = (packed & np.uint64(1)) == 1
    deltas = (packed >> np.uint64(1)).astype(np.int64)
    csum = np.cumsum(deltas)
    base = csum[row_start] - deltas[row_start]
    doc_ids = csum - base[owner]
    freqs = np.ones(total, dtype=np.int64)
    multi_rows = np.flatnonzero(~single)
    if multi_rows.size:
        # blob i's multi-freq values sit right after its gaps, in doc
        # order — matching multi_rows' global order
        multi_prefix = np.concatenate(([0], np.cumsum(~single)))
        m_owner = owner[multi_rows]
        src = val_start[m_owner] + n_docs[m_owner] + (
            multi_prefix[multi_rows] - multi_prefix[row_start][m_owner]
        )
        freqs[multi_rows] = vals[src].astype(np.int64)

    # ---- dls stream: exactly n_docs values per blob
    ddata, doff = _binary_slab(col["dls"])
    dls = codec.varint_decode(ddata[doff[0]:doff[-1]]).astype(np.int64)

    term_col = col["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    enc = term_col.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    out = {
        "term_dict": enc.dictionary,
        "row_codes": codes[owner],
        "doc_ids": doc_ids,
        "freqs": freqs,
        "dls": dls,
    }
    if want_pos or want_offs or want_pay:
        doc_pos_start = np.concatenate(([0], np.cumsum(freqs)))
        starts_p = doc_pos_start[:-1]
        powner = np.repeat(np.arange(total), freqs)
        out["pos_offsets"] = doc_pos_start

        def _delta_stream(column):
            data, off = _binary_slab(column)
            vals = codec.varint_decode(data[off[0]:off[-1]]).astype(np.int64)
            csum2 = np.cumsum(vals)
            base2 = csum2[starts_p] - vals[starts_p]
            return (csum2 - base2[powner]).astype(np.int32)

        if want_pos:
            out["pos_values"] = _delta_stream(col["positions"])
        if want_offs:
            out["off_start_values"] = _delta_stream(col["off_starts"])
            ldata, loff = _binary_slab(col["off_lens"])
            out["off_len_values"] = codec.varint_decode(
                ldata[loff[0]:loff[-1]]
            ).astype(np.int32)
        if want_pay:
            pldata, ploff = _binary_slab(col["pay_lens"])
            out["pay_len_values"] = codec.varint_decode(
                pldata[ploff[0]:ploff[-1]]
            ).astype(np.int64)
            pbdata, pboff = _binary_slab(col["pay_bytes"])
            # one contiguous uint8 slab; per-occurrence byte offsets
            # follow from the decoded lengths
            out["pay_byte_slab"] = pbdata[pboff[0]:pboff[-1]]
    return out


def _make_block_decoder(
    want_pos: bool, want_offs: bool = False, want_pay: bool = False
):
    """Posting blocks -> (term, doc_id, freq, dl[, positions]
    [, off_starts, off_lens][, payloads]) rows — decode_batch_arrays
    wrapped into RecordBatches (term column via Arrow dictionary take;
    occurrence streams zero-copy ListArrays)."""

    def decode(batches):
        for batch in batches:
            d = decode_batch_arrays(batch, want_pos, want_offs, want_pay)
            if d is None:
                continue
            arrays = [
                d["term_dict"].take(pa.array(d["row_codes"])),
                pa.array(d["doc_ids"]),
                pa.array(d["freqs"].astype(np.int32)),
                pa.array(d["dls"].astype(np.int32)),
            ]
            out_names = ["term", "doc_id", "freq", "dl"]
            if want_pos:
                arrays.append(
                    pa.ListArray.from_arrays(
                        pa.array(d["pos_offsets"].astype(np.int32)),
                        pa.array(d["pos_values"]),
                    )
                )
                out_names.append("positions")
            if want_offs:
                occ_off = pa.array(d["pos_offsets"].astype(np.int32))
                arrays.append(
                    pa.ListArray.from_arrays(occ_off, pa.array(d["off_start_values"]))
                )
                arrays.append(
                    pa.ListArray.from_arrays(occ_off, pa.array(d["off_len_values"]))
                )
                out_names.extend(["off_starts", "off_lens"])
            if want_pay:
                occ_off = pa.array(d["pos_offsets"].astype(np.int32))
                lens = d["pay_len_values"]
                byte_off = np.concatenate(
                    ([0], np.cumsum(lens))
                ).astype(np.int32)
                slab = np.ascontiguousarray(d["pay_byte_slab"])
                pay_bin = pa.Array.from_buffers(
                    pa.binary(),
                    lens.size,
                    [
                        None,
                        pa.py_buffer(byte_off.tobytes()),
                        pa.py_buffer(slab.tobytes()),
                    ],
                )
                arrays.append(pa.ListArray.from_arrays(occ_off, pay_bin))
                out_names.append("payloads")
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    return decode
