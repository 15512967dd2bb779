"""Similarity search over embedding columns (`array<float>`).

Baseline: exact brute-force cosine top-k (JVM-side dot products via
zip_with/aggregate — no Python in the loop). Scale path: LSH bucketing
(random-hyperplane signs precomputed driver-side from the seeded md5
family and embedded as plan literals — no shared random state, no
per-row hashing) that turns the quadratic join into a bucket join, and
an IVF variant (coarse centroids + probe) for 100 TB corpora. Both
approximate variants are fully deterministic, so the driver's DuckDB
oracle replays them exactly.

The reference exposes a `nearest_neighbors` fastText analyzer
(`nearest_neighbors_stream.cpp`, SURVEY §2.1) — model-bound and out of
scope; the capability (top-k neighbors of a vector column) is what
these operators provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from iresearch_spark.ops.hashing import seeded_hash60

# Same cache-lifecycle contract as ops.dedup: each op call releases the
# previous call's caches; release_caches() is the explicit hook.
_active_caches: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist every DataFrame cached by prior similarity-op calls."""
    while _active_caches:
        try:
            _active_caches.pop().unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def _register_cache(df: DataFrame) -> DataFrame:
    _active_caches.append(df)
    return df


def with_norm(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, vec double[], norm) — cast once, precompute L2 norm."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.select(
        F.col(id_col).alias("id"),
        v.alias("vec"),
        F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("norm"),
    )


def cosine_expr(a: str, b: str):
    """Cosine between `a.vec` and `b.vec` (aliased frames)."""
    dot = F.aggregate(
        F.zip_with(F.col(f"{a}.vec"), F.col(f"{b}.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(f"{a}.norm") * F.col(f"{b}.norm"))


def brute_force_topk(
    emb: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k neighbors for every query vector (default: all vs
    all): (query_id, neighbor_id, cosine, rank), rank 1..k by cosine
    desc, neighbor_id asc tie-break. Quadratic candidate join — the
    correctness oracle for the LSH/IVF variants and fine up to ~10^5
    vectors per partition-pair block."""
    base = with_norm(emb, vec_col, id_col)
    q = with_norm(queries, vec_col, id_col) if queries is not None else base
    a = q.alias("a")
    b = base.alias("b")
    scored = a.join(b, F.col("a.id") != F.col("b.id")).select(
        F.col("a.id").alias("query_id"),
        F.col("b.id").alias("neighbor_id"),
        cosine_expr("a", "b").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int = 1_000_000,
    exclude_same_id: bool = True,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k of a (small) external query set against a
    (huge) corpus — the standard retrieval shape the self-join ops
    don't cover: (query_id, neighbor_id, cosine, rank).

    100 TB design: the corpus NEVER shuffles. The query matrix is
    collected driver-side (bounded by `max_queries`) and shipped in the
    mapInPandas closure — the per-executor analogue of a broadcast
    join. Each Arrow batch computes an integer matmul against all
    queries and keeps only its local top-k per query, so the only
    exchange is the final window over n_batches * n_queries * k partial
    rows. Cosines use `quantize`-scaled integer dot products
    (round-half-away like Spark/DuckDB ROUND), making every float
    deterministic and SQL-replayable — same recipe as the LSH/IVF
    oracle entries. Rank ties break by neighbor_id ascending.
    """
    import numpy as np

    q_rows = queries.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    ).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"{len(q_rows)} query vectors > max_queries={max_queries}; "
            "collect/broadcast is the wrong shape — raise the cap or "
            "pre-reduce the query set"
        )

    def _quant(m: "np.ndarray") -> "np.ndarray":
        v = m * float(quantize)
        return np.trunc(v + np.copysign(0.5, v)).astype(np.int64)

    q_ids = np.array([r["id"] for r in q_rows], dtype=np.int64)
    Q = _quant(np.array([r["vec"] for r in q_rows], dtype=np.float64))
    q_norm = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
    nq = len(q_ids)

    def partial_topk(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0 or nq == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            C = _quant(
                np.array([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            )
            c_norm = np.sqrt((C * C).sum(axis=1).astype(np.float64))
            # (n x nq) exact integer dots; denominator multiplied in the
            # same order as the SQL replay (commutative => bit-stable)
            cos = (C @ Q.T).astype(np.float64) / (
                c_norm[:, None] * q_norm[None, :]
            )
            out_q, out_n, out_c = [], [], []
            for j in range(nq):
                col = cos[:, j]
                mask = np.isfinite(col)
                if exclude_same_id:
                    mask &= ids != q_ids[j]
                idx = np.nonzero(mask)[0]
                if idx.size == 0:
                    continue
                take = min(k, idx.size)
                # top-k by (cosine desc, id asc): lexsort is stable,
                # last key is primary
                order = idx[np.lexsort((ids[idx], -col[idx]))[:take]]
                out_q.append(np.full(take, q_ids[j], np.int64))
                out_n.append(ids[order])
                out_c.append(col[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                    }
                )

    partial = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    ).mapInPandas(
        partial_topk, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_sign_matrix(n_bits: int, dims: int) -> list[list[int]]:
    """The (n_bits x dims) hyperplane sign matrix, a pure function of
    (bit, dim): sign = +1 iff the 60-bit md5 hash of f"{bit}:{dim}" is
    even — the same seeded family as ops.hashing, computed ONCE
    driver-side and embedded as literals (the previous per-row md5
    evaluation recomputed these constants for every row x dim x bit and
    dominated lsh_topk wall time)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:15], 16) % 2 == 0
            else -1
            for d in range(dims)
        ]
        for i in range(n_bits)
    ]


def hyperplane_signature(
    emb: DataFrame,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(<v, r_i>) with
    r_i[d] in {-1,+1} from `hyperplane_sign_matrix` — a literal in the
    plan, so the whole signature is JVM whole-stage codegen with zero
    hashing per row. The dot product runs over 1e-6-quantized integer
    components: exact integer arithmetic makes the sign bit identical
    in any engine and any summation order (the DuckDB oracle replays
    it verbatim), where a float dot could flip near-zero signs.

    (id, vec, norm, sig) — cosine-similar vectors collide with
    probability 1 - angle/pi per bit."""
    base = with_norm(emb, vec_col, id_col)
    if dims is None:
        row = emb.select(F.size(F.col(vec_col)).alias("n")).first()
        dims = int(row["n"]) if row is not None else 0
    signs = hyperplane_sign_matrix(n_bits, dims)
    # quantize ONCE into a materialized column so the n_bits dot
    # products don't each re-run the transform
    quant = base.withColumn(
        "_rq",
        F.transform(F.col("vec"), lambda x: F.round(x * F.lit(1e6)).cast("long")),
    )
    bit_exprs = []
    for i in range(n_bits):
        sign_arr = F.array(*[F.lit(s) for s in signs[i]])
        dot = F.aggregate(
            F.zip_with(F.col("_rq"), sign_arr, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bit_exprs.append(
            F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0))
            * (2 ** i)
        )
    sig = bit_exprs[0]
    for e in bit_exprs[1:]:
        sig = sig + e
    return quant.select("id", "vec", "norm", sig.alias("sig"))


def _resolve_dims(emb: DataFrame, vec_col: str) -> int:
    row = emb.select(F.size(F.col(vec_col)).alias("n")).first()
    return int(row["n"]) if row is not None else 0


def multi_signatures(
    emb: DataFrame,
    n_bits: int,
    n_tables: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> DataFrame:
    """`n_tables` independent random-hyperplane signatures per vector
    (the banded / multi-table LSH construction): table t's bits come
    from rows [t*n_bits, (t+1)*n_bits) of ONE
    `hyperplane_sign_matrix(n_tables*n_bits, dims)` — table 0 is
    bit-identical to `hyperplane_signature(n_bits=...)`. Same integer
    quantization, so every signature is engine-exact and
    oracle-replayable.

    Returns (id, vec, norm, sig_0..sig_{n_tables-1}) — whole-stage
    codegen, zero per-row hashing."""
    base = with_norm(emb, vec_col, id_col)
    if dims is None:
        dims = _resolve_dims(emb, vec_col)
    signs = hyperplane_sign_matrix(n_tables * n_bits, dims)
    quant = base.withColumn(
        "_rq",
        F.transform(F.col("vec"), lambda x: F.round(x * F.lit(1e6)).cast("long")),
    )
    sig_cols = []
    for t in range(n_tables):
        bit_exprs = []
        for i in range(n_bits):
            sign_arr = F.array(*[F.lit(s) for s in signs[t * n_bits + i]])
            dot = F.aggregate(
                F.zip_with(F.col("_rq"), sign_arr, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            bit_exprs.append(
                F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0))
                * (2 ** i)
            )
        sig = bit_exprs[0]
        for e in bit_exprs[1:]:
            sig = sig + e
        sig_cols.append(sig.alias(f"sig_{t}"))
    return quant.select("id", "vec", "norm", *sig_cols)


def lsh_bucket_candidates(
    emb: DataFrame,
    n_bits: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, distinct) from
    banded multi-table hyperplane LSH: two vectors are candidates iff
    they share a bucket in ANY of the `n_tables` signature tables.

    This is the 100 TB path that replaces the cartesian self-join in
    `dedup.embedding_dup_pairs`: the only pair-touching shuffle is the
    equi-join on (table, signature) — expected bucket size
    n / 2^n_bits per table, so candidate volume is
    n_tables * sum(bucket^2), not n^2. Recall for cosine >= s pairs is
    1 - (1 - p^n_bits)^n_tables with p = 1 - arccos(s)/pi — raise
    n_tables for recall, n_bits for precision (the standard banded-LSH
    trade; e.g. s=0.95 -> p~=0.90: n_bits=8,n_tables=4 gives ~89%
    recall, n_tables=8 ~99%).

    Fully deterministic (literal sign matrix + integer-quantized dots),
    so a SQL oracle replays it exactly."""
    sigs = multi_signatures(emb, n_bits, n_tables, vec_col, id_col, dims)
    # cache: the signature aggregation feeds both sides of the
    # self-join; released by the next op call or release_caches()
    release_caches()
    stacked = _register_cache(sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"), F.col(f"sig_{t}").alias("sig")
                )
                for t in range(n_tables)
            ])
        ).alias("b"),
    ).select(
        "id", F.col("b.tbl").alias("tbl"), F.col("b.sig").alias("sig")
    ).cache())
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multi_probe: bool = False,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, exact cosine
    within bucket. The join touches only bucket-colliding pairs — the
    100 TB path (expected bucket size n / 2^n_bits; raise n_bits with
    corpus size).

    `multi_probe=True` additionally probes every Hamming-distance-1
    neighbor bucket (n_bits+1 probe signatures per query, exploded on
    the query side so the join stays a bucket equi-join): recall no
    longer falls off a cliff as n_bits grows — a near neighbor is
    missed only if >=2 sign bits disagree. Candidate volume rises
    ~(n_bits+1)x, still nowhere near quadratic. Deterministic either
    way (XOR of the literal-signed signature).

    `queries` (same schema as `emb`) searches an external query set
    against the corpus instead of the all-vs-all self-join — the sign
    matrix is a pure function of (bit, dim), so both sides hash into
    the same bucket space."""
    release_caches()
    if queries is None:
        # cache: the signature subplan (n_bits aggregate expressions
        # per row) feeds BOTH sides of the self-join — without it Spark
        # computes it twice (measured 33% of op wall time); released by
        # the next similarity-op call or release_caches()
        signed = _register_cache(
            hyperplane_signature(emb, n_bits, vec_col, id_col).cache()
        )
        signed_q = signed
    else:
        signed = hyperplane_signature(emb, n_bits, vec_col, id_col)
        signed_q = hyperplane_signature(queries, n_bits, vec_col, id_col)
    if multi_probe:
        probes = F.array(
            F.col("sig"),
            *[
                F.col("sig").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_bits)
            ],
        )
        a = signed_q.select(
            "id", "vec", "norm", F.explode(probes).alias("sig")
        ).alias("a")
    else:
        a = signed_q.alias("a")
    b = signed.alias("b")
    scored = a.join(
        b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") != F.col("b.id"))
    ).select(
        F.col("a.id").alias("query_id"),
        F.col("b.id").alias("neighbor_id"),
        cosine_expr("a", "b").alias("cosine"),
    )
    # no dedup needed even with multi_probe: the probe signatures
    # [sig, sig^(1<<i)...] are pairwise-distinct values and each
    # neighbor row carries ONE sig, so a (query, neighbor) pair can
    # match through at most one probe row
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _kmeans_centroids(
    base: DataFrame, n_centroids: int, sample_size: int, n_iter: int
) -> DataFrame:
    """Spherical k-means on a deterministic hash-ordered sample,
    driver-side numpy (the sample is bounded by `sample_size` rows no
    matter the corpus size — the scale-safe analogue of k-means||).
    Deterministic: seeded sample order, seeded kmeans++ init, fixed
    iteration count. Returns (cid, cvec, cnorm) with unit centroids."""
    import numpy as np

    rows = (
        base.withColumn("_h", seeded_hash60(F.col("id").cast("string"), 131))
        .orderBy("_h", "id")
        .limit(sample_size)
        .select("vec")
        .collect()
    )
    X = np.asarray([r["vec"] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(0)
    # kmeans++ init on cosine distance
    cents = [X[int(rng.integers(len(X)))]]
    for _ in range(1, min(n_centroids, len(X))):
        sims = np.max(np.stack([X @ c for c in cents]), axis=0)
        d2 = np.maximum(1.0 - sims, 0.0) ** 2
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(X[int(rng.choice(len(X), p=p))])
    C = np.stack(cents)
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(C.shape[0]):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    C[j] = m / n
    spark = base.sparkSession
    return spark.createDataFrame(
        [(j, [float(x) for x in C[j]], 1.0) for j in range(C.shape[0])],
        "cid long, cvec array<double>, cnorm double",
    )


def cell_assignments(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: str = "hash",
    sample_size: int = 4096,
    kmeans_iters: int = 8,
) -> DataFrame:
    """(id, vec, norm, cid): every vector assigned to its nearest
    coarse centroid by cosine (ties by cid) — the clustering step IVF
    and SemDeDup share. Centroid selection as in `ivf_topk`: "hash" =
    the n_centroids vectors with the lowest seeded hash of their id
    (deterministic, oracle-replayable), "kmeans" = spherical k-means on
    a bounded driver-side sample. One broadcast join against the
    centroid table + one per-id window — linear, no self-join."""
    base = with_norm(emb, vec_col, id_col)
    if centroids == "kmeans":
        cents = _kmeans_centroids(base, n_centroids, sample_size, kmeans_iters)
    elif centroids == "hash":
        cents = (
            base.withColumn("_h", seeded_hash60(F.col("id").cast("string"), 97))
            .orderBy("_h", "id")
            .limit(n_centroids)
            .select(
                F.col("id").alias("cid"),
                F.col("vec").alias("cvec"),
                F.col("norm").alias("cnorm"),
            )
        )
    else:
        raise ValueError("centroids must be 'hash' or 'kmeans'")
    a = base.alias("a")
    c = F.broadcast(cents).alias("c")
    dots = a.join(c).select(
        "a.id",
        "a.vec",
        "a.norm",
        F.col("c.cid").alias("cid"),
        (
            F.aggregate(
                F.zip_with(F.col("a.vec"), F.col("c.cvec"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("a.norm") * F.col("c.cnorm"))
        ).alias("csim"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cid"))
    return (
        dots.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") == 1)
        .select("id", "vec", "norm", "cid")
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: str = "hash",
    sample_size: int = 4096,
    kmeans_iters: int = 8,
    queries: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k. Coarse centroids come from
    `centroids`: "hash" = the `n_centroids` vectors with the lowest
    seeded hash of their id (deterministic sample, oracle-replayable);
    "kmeans" = spherical k-means on a bounded driver-side sample
    (better-balanced cells on clustered embeddings). Each vector is
    assigned to its nearest centroid; queries probe the `n_probe`
    nearest cells.

    `queries` (same schema as `emb`) searches an external query set
    against the corpus instead of the all-vs-all self-join — the
    retrieval shape. Centroids always come from the corpus; query ids
    equal to a corpus id are excluded as self-matches either way.

    The candidate join is (vector x probed-cell) co-partitioned by
    centroid id — shuffle volume n * n_probe * cell_size instead of
    n^2."""
    base = with_norm(emb, vec_col, id_col)
    if centroids == "kmeans":
        cents = _kmeans_centroids(base, n_centroids, sample_size, kmeans_iters)
    elif centroids == "hash":
        cents = (
            base.withColumn("_h", seeded_hash60(F.col("id").cast("string"), 97))
            .orderBy("_h", "id")
            .limit(n_centroids)
            .select(
                F.col("id").alias("cid"),
                F.col("vec").alias("cvec"),
                F.col("norm").alias("cnorm"),
            )
        )
    else:
        raise ValueError("centroids must be 'hash' or 'kmeans'")
    cents = F.broadcast(cents)

    # nearest-centroid ranking per vector (corpus keeps rank 1 as its
    # cell; queries keep the top n_probe cells)
    w = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cid"))

    def _cell_rank(df: DataFrame) -> DataFrame:
        a = df.alias("a")
        cc = cents.alias("c")
        dots = a.join(cc).select(
            "a.id",
            "a.vec",
            "a.norm",
            F.col("c.cid").alias("cid"),
            (
                F.aggregate(
                    F.zip_with(
                        F.col("a.vec"), F.col("c.cvec"), lambda x, y: x * y
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("a.norm") * F.col("c.cnorm"))
            ).alias("csim"),
        )
        return dots.withColumn("crank", F.row_number().over(w))

    release_caches()
    if queries is None:
        # cache: ranked feeds both the members and the probes sides;
        # released by the next similarity-op call or release_caches()
        ranked = _register_cache(_cell_rank(base).cache())
        ranked_q = ranked
    else:
        # each side is consumed once — no shared subplan to cache
        ranked = _cell_rank(base)
        ranked_q = _cell_rank(with_norm(queries, vec_col, id_col))
    members = ranked.filter(F.col("crank") == 1).select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("nvec"),
        F.col("norm").alias("nnorm"),
        "cid",
    )
    probes = ranked_q.filter(F.col("crank") <= n_probe).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        "cid",
    )
    cand = probes.join(members, "cid").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    # no dedup shuffle needed: members carry exactly ONE cell per
    # neighbor (crank == 1), so a (query, neighbor) pair joins at most
    # once regardless of how many cells the query probes
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            F.aggregate(
                F.zip_with(F.col("qvec"), F.col("nvec"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("qnorm") * F.col("nnorm"))
        ).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
