"""spark-submit entry point for the ANN similarity-search serving
shape: build a persisted IVF index (cell-partitioned parquet layout,
`ops/ann_index.ivf_save`) and query it — either through Spark
(partition-pruned probed-cell scan) or `--embedded` with plain Python
(pyarrow reads only the probed `cid=` dirs; no SparkSession, no JVM —
the serving-tier twin of `search_job --embedded`).

Usage:
  # one-time cell layout over an embeddings parquet
  spark-submit --py-files iresearch_spark.zip jobs/ann_job.py build \
      --input embeddings.parquet --output /path/ivf \
      [--centroids 16] [--kmeans] [--vec-col embedding] [--id-col vec_id]

  # query via the cluster (partition pruning skips unprobed cells)
  spark-submit --py-files iresearch_spark.zip jobs/ann_job.py query \
      --index /path/ivf --queries queries.parquet --k 5 --n-probe 4 \
      [--output /path/results]

  # query Spark-free (python jobs/ann_job.py — no spark-submit at all)
  python jobs/ann_job.py query --embedded --index /path/ivf \
      --queries queries.parquet --k 5 --n-probe 4
"""

from __future__ import annotations

import argparse
import os
import sys

try:
    import iresearch_spark  # noqa: F401  (spark-submit ships the zip)
except ModuleNotFoundError:
    # plain `python jobs/ann_job.py query --embedded ...`: resolve the
    # package from the repo checkout next to this script
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def _build(args):
    from pyspark.sql import SparkSession

    from iresearch_spark.ops.ann_index import ivf_save

    spark = SparkSession.builder.appName("iresearch-ann-build").getOrCreate()
    emb = spark.read.parquet(args.input)
    ivf_save(
        emb,
        args.output,
        n_centroids=args.centroids,
        vec_col=args.vec_col,
        id_col=args.id_col,
        centroids="kmeans" if args.kmeans else "hash",
    )
    n = emb.count()
    print(f"ivf index written: {args.output} ({n} vectors, "
          f"{args.centroids} cells)")


def _query_embedded(args):
    # plain-python path: pyarrow reads the queries parquet AND the
    # probed cells — usable on a host with no Spark install at all
    import pyarrow.dataset as ds

    from iresearch_spark.ops.ann_index import EmbeddedIvfIndex

    idx = EmbeddedIvfIndex(args.index)
    id_col = idx.manifest["id_col"]
    vec_col = idx.manifest["vec_col"]
    qt = ds.dataset(args.queries, format="parquet").to_table(
        columns=[id_col, vec_col]
    )
    queries = list(zip(qt.column(id_col).to_pylist(),
                       qt.column(vec_col).to_pylist()))
    rows = idx.search(queries, k=args.k, n_probe=args.n_probe)
    print(f"probed cells: {idx.last_read_cells}")
    if args.output:
        import os as _os

        import pyarrow as pa
        import pyarrow.parquet as pq

        _os.makedirs(args.output, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "query_id": [r[0] for r in rows],
                    "neighbor_id": [r[1] for r in rows],
                    "cosine": [r[2] for r in rows],
                    "rank": [r[3] for r in rows],
                }
            ),
            _os.path.join(args.output, "results.parquet"),
        )
        print(f"results written: {args.output}/results.parquet")
    else:
        for qid, nid, cos, rank in rows:
            print(f"{qid}\t{rank}\t{nid}\t{cos:.6f}")
    print(f"{len(rows)} result rows over {len(queries)} queries")


def _query_spark(args):
    from pyspark.sql import SparkSession

    from iresearch_spark.ops.ann_index import IvfIndex

    spark = SparkSession.builder.appName("iresearch-ann-query").getOrCreate()
    idx = IvfIndex.load(spark, args.index)
    q = spark.read.parquet(args.queries)
    res = idx.search(q, k=args.k, n_probe=args.n_probe)
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
        print(f"results written: {args.output}")
    else:
        for r in res.orderBy("query_id", "rank").collect():
            print(f"{r['query_id']}\t{r['rank']}\t{r['neighbor_id']}"
                  f"\t{r['cosine']:.6f}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--centroids", type=int, default=16)
    b.add_argument("--kmeans", action="store_true")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--id-col", default="vec_id")
    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True,
                   help="parquet of (id_col, vec_col) query vectors")
    q.add_argument("--k", type=int, default=5)
    q.add_argument("--n-probe", type=int, default=4)
    q.add_argument("--embedded", action="store_true",
                   help="serve with plain python + pyarrow (no Spark)")
    q.add_argument("--output", default=None)
    args = ap.parse_args(argv)
    if args.cmd == "build":
        _build(args)
    elif args.embedded:
        _query_embedded(args)
    else:
        _query_spark(args)


if __name__ == "__main__":
    sys.exit(main())
