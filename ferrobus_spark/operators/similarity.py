"""Similarity search over embedding columns (array<float>).

* :func:`brute_force_topk` — exact cosine top-k: corpus broadcast as a
  row-normalized NumPy matrix, queries stream through ``mapInPandas``
  doing one BLAS matmul per Arrow batch. The baseline and the verifier
  for the approximate paths.
* :func:`lsh_topk` — random-hyperplane LSH: sign-bit signatures →
  multi-probe bucket join → exact re-rank inside buckets. The scale
  path when the corpus no longer broadcasts (both sides stay
  distributed; the join is an equi-join on (table, bucket)).
* :func:`cosine_neardup_pairs` — embedding near-duplicate detection
  (cosine ≥ threshold) via the same LSH candidates.

Deterministic: hyperplanes come from a fixed-seed generator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType()),
    T.StructField("neighbor_id", T.LongType()),
    T.StructField("cosine", T.DoubleType()),
    T.StructField("rank", T.IntegerType()),
])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


# T.DoubleType() object, not the "double" DDL string: string return types
# are parsed via the active SparkContext, which doesn't exist at import
@F.pandas_udf(T.DoubleType())
def _pair_dot(q: pd.Series, c: pd.Series) -> pd.Series:
    """Row-wise dot of two array<double> columns, Arrow-batched numpy.

    Replaces the former F.aggregate(F.zip_with(...)) higher-order
    functions in the lsh/ivf re-rank: Catalyst HOF lambdas are
    interpreted per ELEMENT, and the ivf re-rank evaluates them over
    ~2·10⁸ candidate × 64-dim rows at sf1.0 (194 s of its 194 s Spark
    wall on local[8]). einsum's summation order differs from the HOF's
    sequential fold by O(1e-16); output ranks are unaffected except at
    exact ties, which only identical vectors produce (identical under
    any order) — same envelope the DuckDB twins already occupy."""
    qm = np.stack(q.to_numpy())
    cm = np.stack(c.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", qm, cm))


def brute_force_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_corpus_rows: int | None = 2_000_000,
    on_overflow: str = "ivf",
) -> DataFrame:
    """Exact cosine top-k; corpus must fit in a broadcast (~GBs).

    Scale gate: the exact path driver-collects the corpus, which dies
    at 100× data. If the corpus exceeds ``max_corpus_rows``, fall back
    to the distributed :func:`ivf_topk` (``on_overflow='ivf'``) or
    raise with a clear message (``on_overflow='error'``). Pass
    ``max_corpus_rows=None`` to force the exact path (oracle use)."""
    if max_corpus_rows is not None:
        # bounded probe: limit(max+1).count() short-circuits instead of
        # scanning the whole corpus just to check the gate
        n_corpus = corpus.limit(max_corpus_rows + 1).count()
        if n_corpus > max_corpus_rows:
            if on_overflow == "ivf":
                return ivf_topk(
                    spark, queries, corpus, k,
                    id_col=id_col, vec_col=vec_col, exclude_self=exclude_self,
                )
            raise ValueError(
                f"brute_force_topk: corpus has {n_corpus} rows > "
                f"max_corpus_rows={max_corpus_rows}; the exact path "
                "broadcasts the whole corpus. Use ivf_topk/lsh_topk, or "
                "pass max_corpus_rows=None to force the exact path."
            )
    cp = corpus.select(id_col, vec_col).toPandas()
    ids = cp[id_col].to_numpy(np.int64)
    mat = _normalize(np.stack(cp[vec_col].to_numpy()).astype(np.float64))
    bc = spark.sparkContext.broadcast((ids, mat))

    def kernel(batches):
        cids, cmat = bc.value
        for pdf in batches:
            q = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            qids = pdf[id_col].to_numpy(np.int64)
            scores = q @ cmat.T  # (nq, nc)
            rows = []
            for i, qid in enumerate(qids):
                s = scores[i]
                order = np.lexsort((cids, -s))
                rank = 0
                for j in order:
                    if exclude_self and cids[j] == qid:
                        continue
                    rank += 1
                    rows.append((int(qid), int(cids[j]), float(s[j]), rank))
                    if rank >= k:
                        break
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine", "rank"])

    from ferrobus_spark.plans.partitioning import spread_for_kernel

    return spread_for_kernel(queries.select(id_col, vec_col)).mapInPandas(kernel, TOPK_SCHEMA)


def _hyperplanes(dim: int, n_bits: int) -> np.ndarray:
    rng = np.random.default_rng(20240502)
    return rng.standard_normal((n_bits, dim))


def _sign_buckets(df: DataFrame, planes: np.ndarray, id_col: str, vec_col: str,
                  n_tables: int, bits_per_table: int, spark: SparkSession,
                  include_vec: bool = False) -> DataFrame:
    """(id, table, bucket[, vec]) rows.

    With ``include_vec=False`` the rows are ids ONLY — the shape the
    streaming/stats callers use. ``include_vec=True`` additionally
    carries the NORMALIZED vector so the bucket cogroup in
    :func:`lsh_topk` can score each bucket block with one matmul; that
    costs one vector copy per table membership (×n_tables), which is
    LINEAR in corpus size — versus one copy per CANDIDATE PAIR in the
    former join-back re-rank, which grows with bucket occupancy² (the
    round-6 IVF lesson; see ivf_topk's docstring).
    """
    bc = spark.sparkContext.broadcast(planes)
    fields = [
        T.StructField("id", T.LongType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ]
    if include_vec:
        fields.append(T.StructField("vec", T.ArrayType(T.DoubleType())))
    out_t = T.StructType(fields)

    def kernel(batches):
        pl = bc.value
        for pdf in batches:
            mat = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            ids = pdf[id_col].to_numpy(np.int64)
            signs = (mat @ pl.T) >= 0  # (n, n_bits)
            rows = {"id": [], "table": [], "bucket": []}
            if include_vec:
                rows["vec"] = []
                vlist = mat.tolist()
            pw = (1 << np.arange(bits_per_table, dtype=np.int64))
            for t in range(n_tables):
                chunk = signs[:, t * bits_per_table : (t + 1) * bits_per_table]
                buckets = (chunk.astype(np.int64) * pw).sum(axis=1)
                rows["id"] += ids.tolist()
                rows["table"] += [t] * len(ids)
                rows["bucket"] += buckets.tolist()
                if include_vec:
                    rows["vec"] += vlist
            yield pd.DataFrame(rows)

    from ferrobus_spark.plans.partitioning import spread_for_kernel

    return spread_for_kernel(df.select(id_col, vec_col)).mapInPandas(kernel, out_t)


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """(id, vec, norm) — norm precomputed once per vector, JVM-side."""
    vec_d = F.transform(vec_col, lambda v: v.cast("double"))
    norm = F.sqrt(
        F.aggregate(vec_d, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        vec_d.alias(f"{prefix}vec"),
        F.when(norm == 0, F.lit(1.0)).otherwise(norm).alias(f"{prefix}norm"),
    )


def lsh_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    bits_per_table: int = 8,
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane bucket join.

    Pass ``dim`` (the embedding width) to avoid a driver ``first()``
    probe job in this hot path; ``None`` falls back to probing for
    ad-hoc use (same contract as ``n_hashes`` in
    :func:`~ferrobus_spark.operators.dedup.minhash_lsh_pairs`)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_tables * bits_per_table)
    qb = _sign_buckets(queries, planes, id_col, vec_col, n_tables,
                       bits_per_table, spark, include_vec=True)
    cb = _sign_buckets(corpus, planes, id_col, vec_col, n_tables,
                       bits_per_table, spark, include_vec=True)
    # Per-bucket cogroup top-k (the round-6 IVF shape): each (table,
    # bucket) block is scored with one matmul and only its top-k id
    # pairs survive, so the distinct + vector join-back below see
    # ≤ n_tables·k rows per query instead of every bucket collision
    # (~625/query at sf1.0). Exact: any global top-k neighbor shares
    # ≥ 1 bucket with the query and ranks ≤ k inside it, so the union
    # of per-bucket top-ks contains the global top-k; ties break
    # (cosine DESC, id ASC) at both levels, and only identical vectors
    # tie exactly. In-bucket scores are used for SELECTION only — the
    # returned cosine is computed once below on the deduped pairs, the
    # same expression the gate has always hashed.
    pre_t = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
    ])

    def bucket_topk(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"query_id": [], "neighbor_id": []}).astype(
                {"query_id": "int64", "neighbor_id": "int64"}
            )
        qids = qpdf["id"].to_numpy(np.int64)
        cids = cpdf["id"].to_numpy(np.int64)
        qm = np.stack(qpdf["vec"].to_numpy())
        cm = np.stack(cpdf["vec"].to_numpy())
        out = {"query_id": [], "neighbor_id": []}
        # chunk the matmul so a pathological mega-bucket bounds memory
        # at (chunk × bucket) instead of (bucket × bucket)
        for lo in range(0, len(qids), 4096):
            sims = qm[lo:lo + 4096] @ cm.T  # normalized → cosine
            for i in range(sims.shape[0]):
                qid = qids[lo + i]
                order = np.lexsort((cids, -sims[i]))
                taken = 0
                for j in order:
                    if exclude_self and cids[j] == qid:
                        continue
                    out["query_id"].append(int(qid))
                    out["neighbor_id"].append(int(cids[j]))
                    taken += 1
                    if taken >= k:
                        break
        return pd.DataFrame(out)

    cand = (
        qb.groupBy("table", "bucket")
        .cogroup(cb.groupBy("table", "bucket"))
        .applyInPandas(lambda qp, cp: bucket_topk(qp, cp), pre_t)
        .distinct()
    )

    qv = _with_norm(queries, id_col, vec_col, "q")
    cv = _with_norm(corpus, id_col, vec_col, "c")
    cand = (
        cand.join(qv, cand.query_id == qv.q_id)
        .join(cv, cand.neighbor_id == cv.c_id)
        .withColumn(
            "cosine",
            _pair_dot("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_ivf_centroids(
    vectors: np.ndarray, n_lists: int, seed: int = 20240503, n_iter: int = 20
) -> np.ndarray:
    """Deterministic spherical k-means (seeded k-means++ init + Lloyd on
    normalized vectors): the coarse quantizer is a pure function of
    (sample, n_lists, seed), so correctness twins can recompute it
    bit-for-bit — the reason this replaced MLlib KMeans, whose trained
    centers were reproducible only by running MLlib again. Returns
    row-normalized centroids."""
    X = _normalize(np.asarray(vectors, np.float64))
    rng = np.random.default_rng(seed)
    n = len(X)
    cents = [X[int(rng.integers(n))]]
    d2 = np.full(n, np.inf)
    for _ in range(1, n_lists):
        d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
        s = d2.sum()
        probs = d2 / s if s > 0 else np.full(n, 1.0 / n)
        cents.append(X[int(rng.choice(n, p=probs))])
    C = np.stack(cents)
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on normalized = dot
        for j in range(n_lists):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    C[j] = v / norm
    return C


def ivf_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    exclude_self: bool = True,
    seed: int = 20240503,
    max_train: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer →
    corpus partitioned by nearest centroid (the inverted lists) → each
    query probes its ``n_probe`` nearest centroids and exact-reranks
    only those lists.

    The scale shape: centroids are a tiny broadcast model trained on a
    bounded deterministic sample (first ``max_train`` ids — a TakeOrdered
    top-k, not a full sort; the FAISS-style practice of training the
    quantizer on a sample); the re-rank is a COGROUP on ``list_id`` —
    each inverted list meets its probing queries once, a numpy matmul
    scores the whole list block in one BLAS call, and only the per-list
    top-k survives, so the global top-k window sees n_probe·k rows per
    query instead of every candidate. The former shape (equi-join
    carrying both vectors per candidate row, then a row-wise dot) moved
    each vector once per CANDIDATE PAIR — ~200M wide rows / ~200 GB of
    traffic at sf1.0, measured 194-214 s on local[8] whether the dot ran
    as a Catalyst HOF or an Arrow UDF; the cogroup moves each vector
    once per list MEMBERSHIP (corpus: once; queries: n_probe times) and
    measured 17 s — 12.7×. Per-list top-k is exact: a corpus vector lives in
    exactly one list, so the global top-k is a subset of the union of
    per-list top-ks, with ties broken (sim DESC, neighbor_id) at both
    levels.
    """
    train = corpus.select(id_col, vec_col).orderBy(id_col).limit(max_train).toPandas()
    cn = train_ivf_centroids(
        np.stack(train[vec_col].to_numpy()), n_lists, seed
    )
    bc = spark.sparkContext.broadcast(cn)

    def assign(n_nearest: int):
        out_t = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("vec", T.ArrayType(T.DoubleType())),
            T.StructField("list_id", T.IntegerType()),
        ])

        def kernel(batches):
            cents = bc.value
            for pdf in batches:
                mat = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
                ids = pdf[id_col].to_numpy(np.int64)
                sims = mat @ cents.T  # (n, n_lists)
                # stable sort: similarity ties break by centroid index,
                # matching the SQL twin's (sim DESC, cid) window order
                order = np.argsort(-sims, axis=1, kind="stable")[:, :n_nearest]
                rows = {"id": [], "vec": [], "list_id": []}
                for i in range(len(ids)):
                    v = mat[i].tolist()
                    for c in order[i]:
                        rows["id"].append(int(ids[i]))
                        rows["vec"].append(v)
                        rows["list_id"].append(int(c))
                yield pd.DataFrame(rows)

        return kernel, out_t

    ck, ct = assign(1)       # corpus rows live in exactly one list
    qk, qt = assign(n_probe)  # queries probe several lists
    from ferrobus_spark.plans.partitioning import spread_for_kernel

    cb = spread_for_kernel(corpus.select(id_col, vec_col)).mapInPandas(ck, ct)
    qb = spread_for_kernel(queries.select(id_col, vec_col)).mapInPandas(qk, qt)

    rerank_t = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def rerank(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []}).astype(
                {"query_id": "int64", "neighbor_id": "int64", "cosine": "float64"}
            )
        qids = qpdf["id"].to_numpy(np.int64)
        cids = cpdf["id"].to_numpy(np.int64)
        qm = np.stack(qpdf["vec"].to_numpy())
        cm = np.stack(cpdf["vec"].to_numpy())
        sims = qm @ cm.T  # vectors pre-normalized by assign(); dot == cosine
        out = {"query_id": [], "neighbor_id": [], "cosine": []}
        for i, qid in enumerate(qids):
            s = sims[i]
            # full lexsort, not argpartition: exact (sim DESC, id ASC)
            # ordering under ties — identical vectors DO tie exactly
            order = np.lexsort((cids, -s))
            taken = 0
            for j in order:
                if exclude_self and cids[j] == qid:
                    continue
                out["query_id"].append(int(qid))
                out["neighbor_id"].append(int(cids[j]))
                out["cosine"].append(float(s[j]))
                taken += 1
                if taken >= k:
                    break
        return pd.DataFrame(out)

    cand = (
        qb.groupBy("list_id")
        .cogroup(cb.groupBy("list_id"))
        .applyInPandas(lambda qp, cp: rerank(qp, cp), rerank_t)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def incremental_cosine_neardup_pairs(
    spark: SparkSession,
    new: DataFrame,
    old: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    bits_per_table: int = 8,
    k: int = 50,
    dim: int | None = None,
) -> DataFrame:
    """Crawl-N embedding near-dup: NEW vectors vs (old ∪ new) corpus.

    The embedding-side twin of
    :func:`~ferrobus_spark.operators.dedup.incremental_minhash_pairs`:
    only the new batch drives the LSH probe (``lsh_topk`` is already
    query/corpus-asymmetric), so old×old pairs never form and each
    crawl's cost is O(new × collisions) regardless of archive size.
    Returns (id_a < id_b, cosine ≥ threshold) pairs touching ≥1 new
    vector; requires globally unique ids across batches. Intra-new
    pairs surface from both endpoints' probes — normalized and
    deduped here.

    Caveat (the ``k`` rank window, default 50, shared with
    :func:`cosine_neardup_pairs`): a (new, old) pair is found iff the
    OLD vector ranks in the new vector's top-``k`` bucket-mates — the
    full-union run would also accept the old→new direction.
    Above-threshold near-dups ranked past ``k`` distinct closer
    neighbors are a crowding corner both variants share; at 0.95+
    thresholds real corpora don't crowd that hard, and unlike the
    MinHash twin this asymmetry has no stats companion — widen ``k``
    when a corpus is suspected of crowding (the signal: a query whose
    ``k``-th neighbor still scores ≥ threshold, meaning the window may
    have clipped real near-dups).
    """
    corpus = old.unionByName(new)
    res = lsh_topk(
        spark, new, corpus, k=k, id_col=id_col, vec_col=vec_col,
        n_tables=n_tables, bits_per_table=bits_per_table, dim=dim,
    )
    return (
        res.filter(
            (F.col("cosine") >= threshold)
            & (F.col("query_id") != F.col("neighbor_id"))
        )
        .select(
            F.least("query_id", "neighbor_id").alias("id_a"),
            F.greatest("query_id", "neighbor_id").alias("id_b"),
            "cosine",
        )
        .distinct()
    )


def cosine_neardup_pairs(
    spark: SparkSession,
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    bits_per_table: int = 8,
    k: int = 50,
    dim: int | None = None,
) -> DataFrame:
    """(id_a < id_b, cosine ≥ threshold) near-duplicate embedding pairs.

    ``k`` is the per-query rank window passed to :func:`lsh_topk` —
    widen it on corpora where >50 same-bucket neighbors can exceed the
    threshold (see :func:`incremental_cosine_neardup_pairs` caveat)."""
    res = lsh_topk(
        spark, df, df, k=k, id_col=id_col, vec_col=vec_col,
        n_tables=n_tables, bits_per_table=bits_per_table, dim=dim,
    )
    return (
        res.filter((F.col("cosine") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "cosine",
        )
        .distinct()
    )
