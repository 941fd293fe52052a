"""Similarity search over embedding columns: exact brute-force
cosine top-k (the baseline every ANN variant is measured against) and
a random-hyperplane LSH bucketed variant (the scale path).

Exact path = crossJoin-score + two-phase top-k (search.topk_batch
machinery): at 100 TB the broadcast side is the query batch and the
corpus never shuffles. LSH path prunes the scored pairs to matching
buckets first — the crossJoin disappears entirely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..search import dot_expr, l2_norm_expr
from ..session import local_frame


def _cosine(a_vec, b_vec):
    return dot_expr(a_vec, b_vec) / (l2_norm_expr(a_vec) * l2_norm_expr(b_vec))


def round_half_away(x: float, digits: int = 6) -> float:
    """Driver-side decimal rounding matching Spark/DuckDB ``round()``
    (HALF AWAY FROM ZERO) — NOT Python round()/np.round, which are
    banker's (half-to-even) and disagree at half-boundaries. Used
    wherever a driver-side score (probe selection) must share a
    tie-break domain with engine-rounded scores."""
    import math

    p = 10.0**digits
    return math.copysign(math.floor(abs(x) * p + 0.5), x) / p


def _merge_topk(
    scored: DataFrame,
    k: int,
    query_key: str,
    key_col: str,
    score_col: str = "cosine",
    local_buckets: int = 32,
) -> DataFrame:
    """Two-phase top-k merge (search.topk_batch's expression shape,
    VERDICT r2 'What's wrong' #1): phase 1 ranks within (query,
    key-hash-bucket) so no single task ever holds ALL of one query's
    candidates — the shuffle key carries ``local_buckets``× the
    cardinality of a bare query_id partition; phase 2 merges the
    ≤ k·buckets survivors per query (tiny). Ties deterministic
    (score desc, key asc) in both phases, so the final top-k set is
    identical to a single global window — the DuckDB oracle twins
    stay valid over the scale-safe plan."""
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(local_buckets))
    w_local = Window.partitionBy(F.col(query_key), bucket).orderBy(
        F.desc(score_col), F.col(key_col)
    )
    w_global = Window.partitionBy(query_key).orderBy(F.desc(score_col), F.col(key_col))
    return (
        scored.withColumn("__r", F.row_number().over(w_local))
        .filter(F.col("__r") <= k)
        .withColumn("rnk", F.row_number().over(w_global))
        .filter(F.col("rnk") <= k)
        .select(query_key, key_col, "rnk", F.round(score_col, 6).alias(score_col))
    )


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
    use_arrow: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries, score,
    two-phase merge. Output: (query_id, vec_id, rnk, cosine).

    ``use_arrow=True`` routes scoring through search.topk_batch's
    Arrow scan (per-partition numpy matmul over L2-normalized
    vectors, only k·P·Q survivor rows shuffle — volume independent of
    corpus size, the 100 TB path). The default expression path keeps
    DuckDB-fold-order scoring for the oracle twins; its merge is
    still two-phase, so neither path has a per-query hot key."""
    if use_arrow:
        from ..search import topk_batch

        nrm = F.sqrt(
            F.aggregate(
                F.col("__bv"), F.lit(0.0).cast("double"), lambda a, x: a + x * x
            )
        )
        c = (
            corpus.withColumn("__bv", F.col(vec_col).cast("array<double>"))
            .withColumn("__n", nrm)
            .withColumn(
                "__nv",
                F.when(
                    F.col("__n") != 0.0,
                    F.transform(F.col("__bv"), lambda x: x / F.col("__n")),
                ).otherwise(F.col("__bv")),
            )
            .select(key_col, "__nv")
        )
        qn = queries.withColumn("__qd", F.col(query_vec).cast("array<double>")).withColumn(
            "__qn",
            F.sqrt(F.aggregate(F.col("__qd"), F.lit(0.0).cast("double"), lambda a, x: a + x * x)),
        )
        qn = qn.select(
            query_key,
            F.when(
                F.col("__qn") != 0.0, F.transform(F.col("__qd"), lambda x: x / F.col("__qn"))
            )
            .otherwise(F.col("__qd"))
            .alias(query_vec),
        )
        hits = topk_batch(
            c,
            qn,
            k=k,
            vector_col="__nv",
            query_vec_col=query_vec,
            query_id_col=query_key,
            score_col="cosine",
            key_col=key_col,
        )
        w = Window.partitionBy(query_key).orderBy(F.desc("cosine"), F.col(key_col))
        return (
            hits.withColumn("rnk", F.row_number().over(w))
            .select(query_key, key_col, "rnk", F.round("cosine", 6).alias("cosine"))
        )
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_key),
        F.col(key_col),
        _cosine(F.col(vec_col), F.col(query_vec)).alias("cosine"),
    )
    return _merge_topk(scored, k, query_key, key_col)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    h = rng.normal(size=(n_planes, dim))
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def lsh_bucket_expr(vec_col, planes: np.ndarray):
    """Sign-of-projection bucket id: bit j = 1 iff v·h_j ≥ 0."""
    bits = []
    for j in range(planes.shape[0]):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col) if isinstance(vec_col, str) else vec_col,
                F.array(*[F.lit(float(x)) for x in planes[j]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0])


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 6,
    n_tables: int = 2,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Multi-table hyperplane bucketing: one output row per (input
    row, hash table), with ``table_idx`` + ``bucket`` columns added.

    Each table uses independent seeded hyperplanes; a pair at angle θ
    collides in at least one table with probability
    1 − (1 − (1 − θ/π)^n_planes)^n_tables — n_tables is the recall
    knob, n_planes the bucket-size knob. The explode is a narrow map
    (no shuffle); downstream grouping shuffles on (table_idx, bucket),
    which is uniform by construction. All n_tables · n_planes
    projections are computed in ONE projection over the vector —
    the corpus is scanned once."""
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_idx"),
                lsh_bucket_expr(vec_col, hyperplanes(dim, n_planes, seed + t)).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    return (
        df.withColumn("__tb", F.explode(tables))
        .select("*", "__tb.table_idx", "__tb.bucket")
        .drop("__tb")
    )


def ivf_build(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    seed: int = 42,
    max_iter: int = 20,
):
    """IVF coarse quantizer: k-means centroids trained on a (sampled)
    pass, then one projection assigns every row to its nearest
    centroid. Returns (assigned_df, centroids ndarray).

    At 100 TB: train on a bounded sample (k-means cost is O(sample)),
    assignment is a narrow map; the assigned table is written
    partitioned by `centroid_id` so a query reads only its probed
    partitions (partition pruning does the index lookup).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.sample(fraction=sample_fraction, seed=seed) if sample_fraction < 1.0 else corpus
    train = train.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="features").fit(train)
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])

    with_feat = corpus.withColumn(
        "features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    assigned = model.transform(with_feat).withColumnRenamed("prediction", "centroid_id").drop(
        "features"
    )
    return assigned, centroids


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
    metric: str = "l2",
    score_round: int | None = None,
) -> DataFrame:
    """Expression-only nearest-centroid assignment: serve NEW rows
    into an existing IVF index without pyspark.ml on the serve path.

    The (small) centroid matrix is compiled into the plan as
    literals; per row, argmin over centroids of the squared L2
    distance ``||c||^2 - 2<x,c>`` (the ``||x||^2`` term is constant
    across centroids and dropped), ties to the lowest centroid id via
    struct-min. Narrow map — no join, no shuffle, SQL-expressible on
    both engines (the q_ivf_knn DuckDB twin replicates this exact
    formula).

    ``metric="ip"`` assigns by MAXIMUM inner product instead — the
    right cell geometry when corpus vectors are fused relevance
    vectors scored by IP (q_fused_ivf). ``score_round`` rounds the
    assignment score first (both engines of a differential twin must
    share the tie-break domain when their sum fold orders differ —
    the q_pq_knn ADC rationale)."""
    if metric not in ("l2", "ip"):
        raise ValueError(f"metric must be 'l2' or 'ip', got {metric!r}")
    cents = np.asarray(centroids, dtype="float64")
    # materialize the cast once: Catalyst does not CSE the cast across
    # the n_centroids HOF aggregates below (CLAUDE.md trap)
    tmp = "__ivf_vd"
    out = corpus.withColumn(tmp, F.col(vec_col).cast("array<double>"))
    structs = []
    for cid, c in enumerate(cents):
        carr = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(F.col(tmp), carr, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        if metric == "l2":
            csq = float(np.dot(c, c))
            score = F.lit(csq) - 2.0 * dot
        else:  # ip: argmax dot == argmin -dot
            score = -dot
        if score_round is not None:
            score = F.round(score, score_round)
        structs.append(F.struct(score.alias("d"), F.lit(cid).alias("c")))
    return out.withColumn(out_col, F.array_min(F.array(*structs))["c"]).drop(tmp)


def ivf_assign_arrow(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
    metric: str = "l2",
    score_round: int | None = None,
) -> DataFrame:
    """Arrow-batched numpy twin of :func:`ivf_assign` — the
    pq_encode/pq_encode_arrow pattern: the expression path is the
    oracle-parity form (interpreted HOF aggregates, ~n_centroids·dim
    ops per row outside codegen), this one is a single matmul per
    batch for the scale paths (semantic dedup over many cells,
    streaming index maintenance).

    Same score (``||c||^2 − 2<x,c>`` or ``−<x,c>``), same
    lowest-centroid tie break (argmin takes the first minimum).
    ``score_round`` uses the vectorized :func:`round_half_away`
    formula — the repo's driver-side convention (probe selection
    uses the same one against SQL ``round()``). It equals the
    expression path's ``F.round`` except when a score's SHORTEST
    DECIMAL REPRESENTATION lands exactly on a half-boundary
    (Spark rounds the decimal string, the formula rounds the binary
    double) — measure-zero for continuous scores, the same accepted
    caveat as every driver-side rounding in the repo. Rounding also
    collapses the last-ulp fold-order differences (sequential HOF
    fold vs blocked matmul), so rounded assignments agree in
    practice; unrounded ones can ulp-diverge near exact centroid
    ties. The parity test pins both metrics, rounded and raw, on the
    test corpora. NULL or wrong-length vectors raise (the expression
    path would propagate nulls; a batch matmul cannot — fail loudly
    instead)."""
    import pandas as pd

    if metric not in ("l2", "ip"):
        raise ValueError(f"metric must be 'l2' or 'ip', got {metric!r}")
    cents = np.asarray(centroids, dtype="float64")
    dim = cents.shape[1]
    csq = np.einsum("kd,kd->k", cents, cents)
    schema_out = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in corpus.schema.fields]
        + [f"`{out_col}` int"]
    )
    names = [f.name for f in corpus.schema.fields]

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({n: pdf[n] for n in names} | {out_col: []})
                continue
            if pdf[vec_col].isna().any():
                raise ValueError("ivf_assign_arrow: NULL vector in batch")
            vecs = np.array(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            if vecs.ndim != 2 or vecs.shape[1] != dim:
                raise ValueError(
                    f"ivf_assign_arrow: vector length != {dim} "
                    f"(batch shape {vecs.shape})"
                )
            dots = vecs @ cents.T
            scores = csq[None, :] - 2.0 * dots if metric == "l2" else -dots
            if score_round is not None:
                # vectorized round_half_away — identical IEEE ops
                s = 10.0 ** score_round
                scores = np.copysign(np.floor(np.abs(scores) * s + 0.5), scores) / s
            out = pd.DataFrame({n: pdf[n] for n in names})
            out[out_col] = scores.argmin(axis=1).astype("int32")
            yield out

    return corpus.mapInPandas(assign, schema_out)


def ivf_persist(assigned: DataFrame, path: str) -> None:
    """The IVF 'index build': write the assigned table partitioned by
    ``centroid_id``. A probe then reads ONLY its nprobe partition
    directories — static partition pruning IS the index lookup
    (asserted by tests/test_plans.py::test_ivf_probe_prunes_partitions).
    At 100 TB this is the one full pass; every search afterwards
    touches nprobe/n_centroids of the data."""
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivf_load(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ivf_knn(
    assigned: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
    max_query_batch: int = 4096,
) -> DataFrame:
    """IVF search: per query, probe the ``nprobe`` nearest centroids
    (driver-side math over the small centroid matrix), scan only
    those cells, exact cosine rerank.

    The probed cell ids are applied as a STATIC ``isin`` filter
    before the probe join — when ``assigned`` comes from
    :func:`ivf_load` (partitioned by centroid_id, see
    :func:`ivf_persist`), that filter becomes a partition filter and
    unprobed cells are never read.

    The query-compile step is DRIVER-SIDE by design (probe selection
    over the small centroid matrix), so driver memory holds at most
    ``max_query_batch`` (default 4096) query rows at a time: a larger
    ``queries`` frame is AUTO-CHUNKED — rows stream to the driver via
    ``toLocalIterator`` (never one unbounded collect), each chunk runs
    the full probe+scan+merge, and the per-chunk results union.
    Per-query top-k is independent across queries, so the union is
    exactly the one-shot result (pinned by
    tests/test_curation.py::test_ivf_knn_auto_chunks). For workloads
    where even chunked driver compile is wrong, use lsh_knn whose
    bucketing is computed distributed."""
    if max_query_batch < 1:
        raise ValueError(f"max_query_batch must be >= 1, got {max_query_batch}")
    args = (k, nprobe, vec_col, key_col, query_key, query_vec)
    chunks: list[DataFrame] = []
    buf: list = []
    for r in queries.toLocalIterator():
        buf.append(r)
        if len(buf) >= max_query_batch:
            chunks.append(_ivf_knn_batch(assigned, centroids, buf, *args))
            buf = []
    if buf or not chunks:
        # empty frame → one empty-batch call keeps the output schema
        chunks.append(_ivf_knn_batch(assigned, centroids, buf, *args))
    out = chunks[0]
    for c in chunks[1:]:
        out = out.unionByName(c)
    return out


def _ivf_knn_batch(
    assigned: DataFrame,
    centroids: np.ndarray,
    qrows: list,
    k: int,
    nprobe: int,
    vec_col: str,
    key_col: str,
    query_key: str,
    query_vec: str,
) -> DataFrame:
    """One bounded chunk of :func:`ivf_knn`: compile probes for these
    query rows driver-side, scan only the probed cells, exact rerank."""
    probe_rows = []
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    for r in qrows:
        qv = np.asarray(r[query_vec], dtype="float64")
        qn = qv / (np.linalg.norm(qv) or 1.0)
        # rounded half-away + lowest-cid tie-break: the SQL twin
        # orders by round(cosine, 6) DESC, cid ASC — same domain
        sims = [round_half_away(float(s)) for s in cn @ qn]
        order = sorted(range(len(sims)), key=lambda c: (-sims[c], c))[:nprobe]
        for cid in order:
            probe_rows.append((r[query_key], int(cid), [float(x) for x in qv]))
    spark = assigned.sparkSession
    # Arrow LocalRelation, not createDataFrame(list) (CLAUDE.md r11):
    # the probes frame is broadcast below — as a pickled Python RDD
    # every serve call paid a default-parallelism Python-worker stage
    # just to re-read a handful of probe rows
    probes = local_frame(
        spark, probe_rows, f"{query_key} int, centroid_id int, {query_vec} array<double>"
    )
    probed_cells = sorted({cid for _, cid, _ in probe_rows})
    assigned = assigned.filter(F.col("centroid_id").isin(probed_cells))
    joined = assigned.join(F.broadcast(probes), "centroid_id").select(
        F.col(query_key),
        F.col(key_col),
        _cosine(F.col(vec_col), F.col(query_vec)).alias("cosine"),
    )
    return _merge_topk(joined, k, query_key, key_col)


def ml_cosine_similarity_join(
    a: DataFrame,
    b: DataFrame,
    dim: int,
    threshold_distance: float = 1.2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Spark ML BucketedRandomProjectionLSH approxSimilarityJoin over
    L2-normalized vectors (Euclidean distance on the unit sphere is a
    monotone proxy for cosine: d² = 2 − 2·cos). The built-in scale
    path the survey's J-row calls for; our portable-hash MinHash
    remains the oracle-checkable twin."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df):
        v = df.withColumn("features_raw", array_to_vector(F.col(vec_col).cast("array<double>")))
        return Normalizer(inputCol="features_raw", outputCol="features", p=2.0).transform(v)

    pa, pb = prep(a), prep(b)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    ).fit(pa)
    joined = lsh.approxSimilarityJoin(pa, pb, threshold_distance, distCol="dist")
    return joined.select(
        F.col(f"datasetA.{key_col}").alias("id_a"),
        F.col(f"datasetB.{key_col}").alias("id_b"),
        F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 6).alias("cosine"),
    ).filter(F.col("id_a") < F.col("id_b"))


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
    multiprobe: int = 1,
) -> DataFrame:
    """ANN: random-hyperplane buckets + exact rerank within bucket.
    ``multiprobe`` additionally probes buckets at Hamming distance 1
    (recall knob). The corpus is scored only where buckets match —
    the join is an equi-join on bucket id, shuffle keyed uniformly."""
    planes = hyperplanes(dim, n_planes)
    c = corpus.withColumn("bucket", lsh_bucket_expr(vec_col, planes))
    q = queries.withColumn("bucket", lsh_bucket_expr(query_vec, planes))
    if multiprobe:
        probe = F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
            )
        )
        q = q.withColumn("bucket", probe)
    joined = c.join(F.broadcast(q), "bucket").select(
        F.col(query_key),
        F.col(key_col),
        _cosine(F.col(vec_col), F.col(query_vec)).alias("cosine"),
    )
    # per-(query, vec) dedup across probes, then two-phase merge —
    # the dedup groupBy is keyed on (query, vec) (uniform); the merge
    # never concentrates one query's candidate set on a single task
    deduped = joined.groupBy(query_key, key_col).agg(F.max("cosine").alias("cosine"))
    return _merge_topk(deduped, k, query_key, key_col)


def mmr_rerank(
    candidates: DataFrame,
    *,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "query_id",
    key_col: str = "vec_id",
    score_col: str = "cosine",
    vec_col: str = "embedding",
    out_col: str = "mmr",
    max_candidates: int = 10_000,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein, SIGIR 1998): greedily pick, per query, the candidate
    maximizing ``lam*relevance - (1-lam)*max_cosine_to_already_picked``
    — the standard result-diversification pass over a first-stage
    retriever's top-N. ``lam=1`` degenerates to plain relevance order;
    lower ``lam`` trades relevance for diversity.

    Input: one row per (query, candidate) carrying the first-stage
    score and the candidate vector — i.e. a knn/serve output joined
    back to its vectors (refine_with-style broadcast id join). The
    greedy loop is inherently sequential IN k but independent ACROSS
    queries, so it runs as one Arrow-batched ``applyInPandas`` per
    query group (the data-plane doctrine: never a driver loop) —
    incremental max-similarity updates keep it O(k·n·dim) per query
    with no n×n matrix.

    Scale posture: per-group state is one query's candidate list,
    BOUNDED because first-stage retrieval already cut to top-N;
    ``max_candidates`` enforces the contract (raise, don't spill — the
    deduplicate/auto-bound doctrine). Shuffle is one Exchange keyed by
    query_id over an already-k·|Q|-sized frame.

    Determinism: relevance, pairwise cosines and the greedy objective
    are all rounded half-away to 6 decimals BEFORE every argmax
    (CLAUDE.md rounding invariant), ties break on lowest key — a
    sequential-fold re-implementation lands on the identical selection
    (tests/test_mmr.py python-reference differential).

    Contract: ``query_col``/``key_col`` must be integral (the output
    schema types them bigint — the vec_id convention everywhere in
    this module); map string keys to ids upstream.
    """
    import pandas as pd

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    out_schema = (
        f"{query_col} bigint, {key_col} bigint, rnk int, {out_col} double"
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_candidates:
            raise ValueError(
                f"mmr_rerank: {n} candidates for one query exceeds "
                f"max_candidates={max_candidates}; cut the first stage "
                f"to a bounded top-N before diversifying"
            )
        keys = pdf[key_col].to_numpy()
        rel = np.array(
            [round_half_away(float(s)) for s in pdf[score_col]], dtype="float64"
        )
        vecs = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
        norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-12)
        vn = vecs / norms[:, None]
        max_sim = np.full(n, -np.inf)
        picked: list[int] = []
        values: list[float] = []
        avail = np.ones(n, dtype=bool)
        for step in range(min(k, n)):
            if step == 0:
                obj = lam * rel
            else:
                obj = lam * rel - (1.0 - lam) * max_sim
            obj = np.array([round_half_away(float(x)) for x in obj])
            # argmax with lowest-key tie-break among available rows
            best = None
            for i in np.flatnonzero(avail):
                cand = (-obj[i], keys[i])
                if best is None or cand < best[0]:
                    best = (cand, i)
            _, bi = best
            picked.append(int(bi))
            values.append(float(obj[bi]))
            avail[bi] = False
            sims = vn @ vn[bi]
            sims = np.array([round_half_away(float(s)) for s in sims])
            max_sim = np.maximum(max_sim, sims)
        qid = int(pdf[query_col].iloc[0])
        return pd.DataFrame(
            {
                query_col: [qid] * len(picked),
                key_col: [int(keys[i]) for i in picked],
                "rnk": list(range(1, len(picked) + 1)),
                out_col: values,
            }
        )

    return (
        candidates.select(query_col, key_col, score_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(_one, schema=out_schema)
    )


def truncated_prefilter_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    prefix_dim: int,
    k: int = 10,
    refine_factor: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
) -> DataFrame:
    """Dimension-truncation ANN (the Matryoshka-representation serve
    pattern, Kusupati et al. 2022): coarse-score every row on only the
    FIRST ``prefix_dim`` dimensions — an O(prefix/dim) scan-cost cut
    orthogonal to value quantization (PQ/SQ/BQ compress bits per dim;
    this drops dims) — keep the top ``k*refine_factor`` survivors per
    query, then re-score ONLY those on the full vector via a broadcast
    id join and cut to k.

    Works best on embeddings trained front-loaded (MRL); on arbitrary
    embeddings it is still a valid prefilter, just with a worse
    coarse-recall curve — measure with
    :func:`~fuserank_spark.pipeline_ext.quantization.quantization_recall_report`'s
    oracle pattern before choosing ``prefix_dim``.

    Composition: both stages are :func:`brute_force_knn`-shaped
    (broadcast queries, two-phase merge); the refine touches the full
    vector column for O(k·refine_factor) rows per query, never a full
    scan — the pq/sq/bq refine contract. ``prefix_dim`` == full dim
    with refine on degenerates to exact (tested). Vectors shorter
    than ``prefix_dim`` are coarse-scored on what exists (slice
    truncates silently) — enforce uniform dims upstream if that
    matters."""
    if prefix_dim < 1:
        raise ValueError(f"prefix_dim must be >= 1, got {prefix_dim}")
    if refine_factor < 1:
        raise ValueError(f"refine_factor must be >= 1, got {refine_factor}")
    coarse_corpus = corpus.select(
        key_col, F.slice(F.col(vec_col), 1, prefix_dim).alias(vec_col)
    )
    coarse_queries = queries.select(
        query_key, F.slice(F.col(query_vec), 1, prefix_dim).alias(query_vec)
    )
    cand = brute_force_knn(
        coarse_corpus, coarse_queries, k=k * refine_factor,
        vec_col=vec_col, key_col=key_col,
        query_key=query_key, query_vec=query_vec,
    ).select(query_key, key_col)
    rescored = (
        corpus.join(F.broadcast(cand), key_col)
        .join(F.broadcast(queries), query_key)
        .select(
            query_key,
            F.col(key_col),
            _cosine(F.col(vec_col), F.col(query_vec)).alias("cosine"),
        )
    )
    return _merge_topk(rescored, k, query_key, key_col)
