"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All shuffles are keyed on content hashes (uniform by construction —
no skew); candidate generation is always bucket-join (LSH bands /
shared keys), never an O(n²) cross join, so each stage scales
linearly with corpus size at fixed duplicate density.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import MINHASH_PERMS, minhash_perm, portable_hash32

SHINGLE_K = 5


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Exact dedup via hash-groupBy: one shuffle on the content hash,
    keep the minimum key per group. ``normalize`` lowercases and
    collapses whitespace first (near-exact)."""
    t = F.col(text_col)
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return (
        # NULL texts are not duplicates of each other — md5(NULL)=NULL
        # would otherwise collapse them into one bogus cluster
        df.filter(F.col(text_col).isNotNull())
        .withColumn("content_hash", F.md5(t))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(key_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def shingles_expr(text_col: Column, k: int = SHINGLE_K) -> Column:
    """Distinct character k-shingles as an array column — pure
    higher-order functions, no UDF.

    Texts shorter than k yield an EMPTY array (guard required:
    Spark's sequence(1, n) with n<1 counts DOWN, producing garbage
    positions; DuckDB's generate_series yields empty — the guard
    keeps the two engines identical)."""
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(text_col) - (k - 1)),
            lambda i: F.substr(text_col, i, F.lit(k)),
        )
    )
    empty = F.array().cast("array<string>")
    return F.when(F.length(text_col) >= k, sh).otherwise(empty)


def minhash_signature(
    df: DataFrame, text_col: str = "text", out_prefix: str = "mh"
) -> DataFrame:
    """MinHash signature over character shingles: shingle → portable
    32-bit hash → per-permutation min. Two narrow projections, no
    shuffle; signature columns are plain BIGINTs.

    The md5 shingle hashing is materialized as its own column first —
    Catalyst does not CSE a subexpression repeated across the 8
    permutation projections, and md5+hex-conv dominates the cost."""
    sh = shingles_expr(F.col(text_col))
    hashed = df.withColumn("__sh_hashes", F.transform(sh, lambda s: portable_hash32(s)))
    cols = {}
    for j, (a, b) in enumerate(MINHASH_PERMS):
        cols[f"{out_prefix}{j}"] = F.array_min(
            F.transform(F.col("__sh_hashes"), lambda h: minhash_perm(h, a, b))
        )
    return hashed.withColumns(cols).drop("__sh_hashes")


def _band_rows(
    sigs: DataFrame,
    key_col: str,
    bands: int,
    rows_per_band: int,
    out_prefix: str,
) -> DataFrame:
    """One row per (doc, band): ``(id, sig, band_idx, band_hash)`` —
    the banding shared by lsh_candidate_pairs and the incremental
    index (one definition, so the stored buckets and the batch path
    can never hash differently)."""
    n = bands * rows_per_band
    sig_cols = [f"{out_prefix}{j}" for j in range(n)]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(sig_cols[b * rows_per_band + r]).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    member = F.struct(
        F.col(key_col).alias("id"), F.array(*[F.col(c) for c in sig_cols]).alias("sig")
    )
    return sigs.select(member.alias("__m"), F.explode(band_structs).alias("band")).select(
        F.col("__m.id").alias("id"),
        F.col("__m.sig").alias("sig"),
        F.col("band.band_idx"),
        F.col("band.band_hash"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    key_col: str = "doc_id",
    bands: int = 2,
    rows_per_band: int = 4,
    out_prefix: str = "mh",
    max_bucket_size: int = 1024,
) -> DataFrame:
    """MinHash-LSH banding: band the signature, bucket-join docs
    sharing a band, emit candidate pairs with the estimated Jaccard
    (= matching-signature fraction).

    The join is an equi-join on (band_idx, band_hash) — co-located by
    the shuffle, linear in candidates; never a cross join.

    Skew guard: a bucket larger than ``max_bucket_size`` means a
    mass near-duplicate cluster — all-pairs there is quadratic blowup
    with no information gain. Such buckets emit STAR edges (every
    member ↔ the bucket's min id) instead: linear in members and
    sufficient to keep the cluster connected for
    resolve_duplicate_clusters / deduplicate.
    """
    n = bands * rows_per_band
    banded = _band_rows(sigs, key_col, bands, rows_per_band, out_prefix)
    # signatures are computed ONCE: bucket members are grouped, pairs
    # are generated inside each bucket — no self-join re-evaluating
    # the upstream plan, one shuffle keyed on the (uniform) band hash
    # (the shared memory-bounded two-regime core, r6)
    pairs = _pairs_in_buckets(
        banded,
        ["band_idx", "band_hash"],
        F.struct(F.col("id"), F.col("sig")),
        max_bucket_size,
    )
    eq = F.zip_with(
        F.col("a.sig"), F.col("b.sig"), lambda x, y: (x == y).cast("int")
    )
    est = F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / float(n)
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
    )


def simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash", bits: int = 32) -> DataFrame:
    """32-bit SimHash over whitespace tokens: per-bit majority vote of
    token hashes. Pure expression pipeline (runtime loops over
    ``sequence``, constant-size plan).

    Bit extraction uses shiftright/shiftleft, not pow(2,i)-cast
    division — bit shifts have identical integer semantics across
    Spark versions / ANSI modes and DuckDB, whereas pow() routes
    through DOUBLE (round-2 driver-gate fix; values are unchanged
    for the non-negative 32-bit hashes used here)."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(tokens, lambda t: portable_hash32(t))
    df = df.withColumn("__th", hashes)
    # bit i of h = shiftright(h, i) % 2 — pure integer bit math
    sim = F.expr(
        f"""
        aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), (acc, i) ->
          acc + IF(
            aggregate(__th, CAST(0 AS BIGINT),
                      (a, h) -> a + (2 * (shiftright(h, i) % 2) - 1)) >= 0,
            shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))
        """
    )
    return df.withColumn(out_col, sim).drop("__th")


def _validate_bands(bits: int, bands: int, max_hamming: int) -> None:
    if bits % bands != 0:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    if bits // bands > 62:
        # band extraction computes F.lit(1 << width): width > 62
        # overflows LongType and dies at plan build with an opaque
        # error (e.g. bits=64, bands=1 — legal above when
        # max_hamming=0). Raise clearly instead (ADVICE r6).
        raise ValueError(
            f"band width bits//bands={bits // bands} > 62 overflows the "
            "64-bit band-value extraction; use bands >= 2 (or smaller codes)"
        )
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} > bands-1={bands - 1}: the band "
            "prefilter would miss qualifying pairs; raise bands"
        )


def code_hamming_pairs(
    df: DataFrame,
    code_col: str,
    key_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Near-duplicate pairs over ANY integer bit-code column with a
    GUARANTEED-recall band prefilter (Manku/Jarvelin/Sarma, "Detecting
    Near-Duplicates for Web Crawling", WWW 2007 — the Google
    crawl-dedup design): split each ``bits``-bit code into ``bands``
    contiguous bands; by pigeonhole, two codes within Hamming distance
    ``<= bands - 1`` agree EXACTLY on at least one band, so bucketing
    on (band_idx, band_value) finds every qualifying pair while the
    pair space stays linear in the corpus (``max_hamming > bands-1``
    raises rather than silently losing recall).

    Works for the full 64-bit BIGINT range including negative codes
    (two's-complement top bit set): arithmetic ``shiftright`` plus
    ``pmod`` extracts band bits exactly, and ``bit_count(xor)`` is
    sign-agnostic — the identical semantics DuckDB's ``>>``/``%``/
    ``bit_count`` give a SQL twin (tests/test_phash.py pins this at
    bits=64; q_simhash pins bits=32).

    Candidates flow through the shared memory-bounded pair core
    (:func:`_pairs_in_buckets` — mass-duplicate buckets star-degrade
    row-wise instead of materializing); verification is one
    ``bit_count(xor)`` per candidate in codegen; a pair surfaced by
    several bands collapses via distinct (hamming is deterministic
    per pair, so the distinct is exact).

    Output: (id_a < id_b, hamming). Feed into
    :func:`resolve_duplicate_clusters` / :func:`deduplicate` exactly
    like the MinHash-LSH pair stream."""
    _validate_bands(bits, bands, max_hamming)
    w = bits // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.pmod(
                    F.shiftright(F.col(code_col), b * w), F.lit(1 << w)
                ).alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    banded = df.select(
        F.col(key_col).alias("id"), F.col(code_col).alias("sig"),
        F.explode(band_structs).alias("bd"),
    ).select("bd.*", "id", "sig")
    pairs = _pairs_in_buckets(
        banded,
        ["band_idx", "band_val"],
        F.struct(F.col("id"), F.col("sig")),
        max_bucket_size,
    )
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """SimHash near-duplicate pairs: :func:`simhash` signatures fed
    through the shared banded-Hamming core (:func:`code_hamming_pairs`
    — see there for the pigeonhole recall guarantee and memory
    posture). Oracle-pinned by q_simhash plus the banded-pair SQL twin
    in ext_queries; the r6 extraction into the shared core kept the
    plan shape identical (same band explode → pair core → xor
    verify)."""
    _validate_bands(bits, bands, max_hamming)
    sigs = simhash(df, text_col=text_col, bits=bits)
    return code_hamming_pairs(
        sigs,
        "simhash",
        key_col=key_col,
        bits=bits,
        bands=bands,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    prefix_tokens: int = 2,
    k: int = SHINGLE_K,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs sharing a cheap
    blocking key (first tokens). Blocking keeps the pair space
    linear; the Jaccard itself is array_intersect/array_union sizes.

    Pairs flow through the shared memory-bounded core (r6): a block
    bigger than ``max_bucket_size`` — boilerplate prefixes at corpus
    scale — degrades to star comparisons against the block minimum
    instead of collecting the whole block (members carry their full
    shingle sets, the heaviest payload of any pair path)."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    block = F.concat_ws(" ", F.slice(tokens, 1, prefix_tokens))
    # shingles computed once per doc; pairs generated within the block
    blocked = df.select(
        block.alias("block_key"),
        F.col(key_col).alias("id"),
        shingles_expr(F.col(text_col), k).alias("sh"),
    )
    pairs = _pairs_in_buckets(
        blocked,
        ["block_key"],
        F.struct(F.col("id"), F.col("sh")),
        max_bucket_size,
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double")
    union = (F.size(F.col("a.sh")) + F.size(F.col("b.sh"))).cast("double") - inter
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (inter / union).alias("jaccard"),
    )


def resolve_duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 10,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Connected components over the duplicate-pair graph:
    min-label propagation (one hop per round) combined with pointer
    jumping (adopt your label's label), which doubles the label
    reach each round — convergence in O(log diameter) iterations, so
    the default 10 covers components of diameter ~2^10.
    Returns (doc_id, cluster_id).

    Each iteration is two keyed joins + a groupBy-min — all shuffles
    on ids; no driver-side graph. Raises if the iteration budget is
    exhausted before fixpoint rather than returning wrong clusters.

    ``checkpoint_dir``/``checkpoint_every`` (VERDICT r8 ask #2) select
    the node-loss-safe materialization policy of
    :class:`fuserank_spark.pipeline_ext.web._LoopCheckpointer` —
    identical exposure to pagerank/hits: the default per-iteration
    ``localCheckpoint`` truncates lineage, so a lost executor at
    iteration 9 of 10 kills a web-scale dedup job; with a directory,
    reliable ``checkpoint()`` files land every ``checkpoint_every``
    iterations (plus once at convergence) and intermediate iterations
    persist WITHOUT truncating lineage, bounding re-work to
    ``checkpoint_every − 1`` iterations. The convergence check rides
    inside the stepped frame (``prev_cid`` threaded through) instead
    of a join against the previous labels, so no trailing frame is
    needed after a step materializes."""
    from .web import _LoopCheckpointer

    ck = _LoopCheckpointer(pairs.sparkSession, checkpoint_dir, checkpoint_every)
    edges = ck.setup(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # materialize ONCE: every iteration joins against `edges`, and
        # an unmaterialized edge frame re-runs the caller's whole
        # candidate-pair pipeline (signatures, banding, bucket
        # pair-gen) per round — measured 65 s → 27.5 s on a 5k batch
        # of incremental_lsh_dedup. Bounded: 2×|pairs| id pairs.
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    converged = False
    for _i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        stepped = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                # old label rides along so convergence is a filter on
                # the materialized frame, not a join vs the previous
                # iteration (whose cache the checkpointer reclaims)
                F.col("cluster_id").alias("prev_cid"),
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        # pointer jumping: follow cluster_id -> that node's cluster_id
        ptr = stepped.select(
            F.col("id").alias("lid"), F.col("cluster_id").alias("lcid")
        )
        new_labels = (
            stepped.join(ptr, stepped["cluster_id"] == ptr["lid"], "left")
            .select(
                "id",
                "prev_cid",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("lcid"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        # materialize FIRST (cuts/caches the two-join plan), then count
        # changes from the materialized frame — otherwise it runs twice
        new_labels = ck.step(new_labels, _i)
        changed = (
            new_labels.filter(F.col("cluster_id") != F.col("prev_cid"))
            .limit(1)
            .count()
        )
        labels = new_labels.select("id", "cluster_id")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"cluster resolution did not converge in {max_iterations} iterations; "
            "raise max_iterations (components deeper than ~2^iterations)"
        )
    labels = ck.finish(labels)
    return labels.select(F.col("id").alias("doc_id"), "cluster_id")


def deduplicate(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Keep-one-per-cluster: resolve clusters from candidate pairs,
    drop every member except the minimum-id survivor. Rows in no
    pair pass through untouched (left join, no full shuffle of the
    corpus beyond the one keyed join). ``checkpoint_dir``/
    ``checkpoint_every`` pass through to
    :func:`resolve_duplicate_clusters`'s node-loss-safe policy."""
    clusters = resolve_duplicate_clusters(
        pairs, id_a, id_b,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
    )
    victims = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(key_col)
    )
    return df.join(victims, key_col, "left_anti")


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.35,
    max_id: int | None = None,
    method: str = "auto",
    dim: int | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥
    threshold).

    ``method``:
    - ``"exact"`` — all-pairs θ-join. O(n²); only for bounded slices
      (the DuckDB oracle path). Requires ``max_id``.
    - ``"lsh"`` — hyperplane-LSH bucketing then exact cosine within
      buckets (:func:`embedding_neardup_pairs_lsh`). Linear in corpus
      size at fixed duplicate density; the 100 TB path. Requires
      ``dim``.
    - ``"auto"`` (default) — exact when ``max_id`` bounds the slice,
      else LSH. An unbounded corpus NEVER gets the quadratic join.
    """
    from ..search import dot_expr, l2_norm_expr

    if method == "auto":
        method = "exact" if max_id is not None else "lsh"
    if method == "lsh":
        if dim is None:
            raise ValueError("embedding_neardup_pairs(method='lsh') requires dim=")
        if max_id is not None:
            df = df.filter(F.col(key_col) < max_id)
        return embedding_neardup_pairs_lsh(
            df, dim, vec_col=vec_col, key_col=key_col, threshold=threshold, **lsh_kwargs
        )
    if method != "exact":
        raise ValueError(f"unknown method {method!r}")
    if max_id is None:
        raise ValueError(
            "method='exact' is the all-pairs O(n²) join — pass max_id to bound "
            "the slice, or use method='lsh' (the scale path)"
        )
    df = df.filter(F.col(key_col) < max_id)
    base = df.select(F.col(key_col), F.col(vec_col), l2_norm_expr(vec_col).alias("nrm"))
    a, b = base.alias("a"), base.alias("b")
    dot = dot_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
        .select(
            F.col(f"a.{key_col}").alias("id_a"),
            F.col(f"b.{key_col}").alias("id_b"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.35,
    n_planes: int = 6,
    n_tables: int = 2,
    seed: int = 42,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Scale path for embedding near-dup: hyperplane-LSH buckets
    (simsearch.lsh_buckets), all-pairs ONLY within a bucket via the
    groupBy pair-generation pattern (no self-join — vectors are
    bucketed once), exact cosine check on each candidate, distinct
    across tables.

    Plan shape: one narrow projection (buckets), one shuffle keyed on
    the uniform (table_idx, bucket), one explode — zero joins, no
    CartesianProduct (asserted by tests/test_plans.py). Oversized
    buckets (mass near-dup clusters) degrade to star edges against
    the bucket minimum, same policy as lsh_candidate_pairs — linear
    in members, still connects the cluster for deduplicate()."""
    from ..search import l2_norm_expr
    from .simsearch import lsh_buckets

    base = df.select(
        F.col(key_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm_expr(vec_col).alias("nrm"),
    )
    b = lsh_buckets(base, dim, n_planes=n_planes, n_tables=n_tables, vec_col="vec", seed=seed)
    return (
        _cosine_pairs_in_buckets(b, ["table_idx", "bucket"], max_bucket_size)
        .filter(F.col("cosine") >= threshold)
        # the same pair can surface from several LSH tables — dedup
        .groupBy("id_a", "id_b")
        .agg(F.first("cosine").alias("cosine"))
    )


def _pairs_in_buckets(
    b: DataFrame, bucket_cols: list[str], member: Column, max_bucket_size: int
) -> DataFrame:
    """Shared candidate-pair core for every bucketed dedup path
    (MinHash bands, hyperplane-LSH, semantic cells): ``member`` is a
    struct whose FIRST field is named ``id`` (so struct ordering —
    hence the a/b pair order — is id-major, and ids are unique);
    emit every within-bucket pair as columns ``a``, ``b``
    with a.id < b.id — vectors/signatures are bucketed once, zero
    joins, no CartesianProduct. Buckets larger than
    ``max_bucket_size`` degrade to star edges against the bucket
    minimum (linear in members, still connects the cluster for
    deduplicate()).

    Memory posture (r6): bucket size and minimum come from a
    partition-frame WINDOW over the single bucket shuffle, and only
    buckets under the cap go through ``collect_list`` pair
    generation — an oversized bucket (a mass-duplication cluster at
    corpus scale) computes its star edges ROW-WISE against the
    window minimum and is never materialized as one array.
    WindowExec spills its partition buffer to disk; a giant
    collect_list value cannot — so the degrade path bounds task
    memory, not just pair count. Both branches reuse the same
    exchange at runtime (AQE ReusedExchange, pinned by
    tests/test_plans.py)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*bucket_cols)
    # the shared window carries ONLY the size long — the min member
    # (a full vec/sig copy per row) is computed on the oversized
    # subset alone, so normal corpora (no bucket over the cap) pay
    # one count per row and nothing else
    sized = (
        b.select(*bucket_cols, member.alias("__m"))
        .withColumn("__sz", F.count(F.lit(1)).over(w))
        .filter(F.col("__sz") > 1)
    )

    small = (
        sized.filter(F.col("__sz") <= max_bucket_size)
        .groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_list("__m")).alias("ms"))
    )
    all_pairs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    small_pairs = small.select(F.explode(all_pairs).alias("p")).select(
        "p.a", "p.b"
    )

    large_pairs = (
        sized.filter(F.col("__sz") > max_bucket_size)
        .withColumn("__min", F.min(F.col("__m")).over(w))
        .filter(F.col("__m.id") != F.col("__min.id"))
        .select(F.col("__min").alias("a"), F.col("__m").alias("b"))
    )
    return small_pairs.unionByName(large_pairs)


def _cosine_pairs_in_buckets(
    b: DataFrame, bucket_cols: list[str], max_bucket_size: int
) -> DataFrame:
    """Cosine instantiation of :func:`_pairs_in_buckets`: ``b``
    carries (id, vec, nrm) plus bucket key columns; emits
    (id_a < id_b, cosine)."""
    member = F.struct(F.col("id"), F.col("vec"), F.col("nrm"))
    pairs = _pairs_in_buckets(b, bucket_cols, member, max_bucket_size)
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        _pair_cosine("a", "b"),
    )


def _pair_cosine(a: str, b: str) -> Column:
    dot = F.aggregate(
        F.zip_with(
            F.col(f"{a}.vec"),
            F.col(f"{b}.vec"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    return (dot / (F.col(f"{a}.nrm") * F.col(f"{b}.nrm"))).alias("cosine")


def semantic_dedup(
    df: DataFrame,
    centroids,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.95,
    max_bucket_size: int = 1024,
    assign_round: int | None = 6,
    cos_round: int = 6,
    assign: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): bucket the corpus by nearest frozen k-means
    centroid (semantically coherent cells), then inside each cell
    drop every row that has a LOWER-ID neighbor with cosine ≥
    ``threshold``. Returns the surviving rows of ``df``.

    Keep rule, precisely: a row is dropped iff ANY lower-id row in
    its cell is within ``threshold`` — whether or not that neighbor
    itself survives. One pass, no iterative joins. This is MORE
    aggressive than sequential compare-against-the-kept-set greedy:
    a chain a~b~c with a≁c keeps only {a} here (b falls to a, c
    falls to b), where kept-set greedy would keep {a, c} and
    :func:`deduplicate`'s connected components also keep only the
    component minimum. Guaranteed: the minimum id of every cell
    survives, and no two survivors in the same cell are within
    ``threshold`` of each other (both pinned by tests). Oversized
    cells degrade to star comparisons against the cell minimum —
    linear, keeps the min, may keep extra members (documented trade,
    same policy as the LSH pair paths).

    Centroids are FROZEN (train them on a bounded sample via
    simsearch.ivf_build, or reuse an IVF index's quantizer), so the
    whole op is expression-only: one narrow assignment projection,
    one shuffle on the uniform cell key, one anti-join. Cross-engine
    discipline: the assignment score is rounded to ``assign_round``
    and the cosine to ``cos_round`` BEFORE comparisons, so a DuckDB
    re-derivation shares both tie-break domains (CLAUDE.md rounding
    invariant; pinned by the differential test).

    ``assign="arrow"`` swaps the expression-only cell assignment for
    the Arrow-batched matmul twin (simsearch.ivf_assign_arrow) — same
    cells (parity-pinned), much cheaper when n_centroids·dim is large;
    keep ``"expr"`` where a SQL twin must re-derive the plan.

    Rows with a NULL ``vec_col`` cannot be compared and always
    survive (they are excluded from assignment and pair generation,
    and the final anti-join keeps them)."""
    from ..search import l2_norm_expr
    from .simsearch import ivf_assign, ivf_assign_arrow

    if assign not in ("expr", "arrow"):
        raise ValueError(f"assign must be 'expr' or 'arrow', got {assign!r}")
    assign_fn = ivf_assign if assign == "expr" else ivf_assign_arrow
    # rows with no vector cannot be compared — they pass through as
    # survivors (and never reach the arrow path's NULL guard)
    with_vec = df.filter(F.col(vec_col).isNotNull())
    assigned = assign_fn(
        with_vec, centroids, vec_col=vec_col, out_col="__cell", score_round=assign_round
    )
    base = assigned.select(
        F.col("__cell"),
        F.col(key_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm_expr(vec_col).alias("nrm"),
    )
    victims = (
        _cosine_pairs_in_buckets(base, ["__cell"], max_bucket_size)
        .filter(F.round(F.col("cosine"), cos_round) >= threshold)
        .select(F.col("id_b").alias(key_col))
    )
    return df.join(victims, key_col, "left_anti")


def dedup_lines(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    normalize: bool = True,
    min_line_chars: int = 1,
) -> DataFrame:
    """Cross-document line-level exact dedup (the C4 / RefinedWeb
    corpus step: repeated lines — navigation chrome, cookie banners,
    license blurbs — are removed everywhere except their FIRST
    occurrence; reference has no analog, extension per build brief).

    A line occurrence survives iff it is the globally first
    occurrence of its normalized form, ordered by ``(key, position)``
    (``key_col`` must be orderable — ties are impossible because
    (key, pos) is unique per occurrence). Lines whose normalized form
    is shorter than ``min_line_chars`` are structure, not content
    (blank separators), and always survive. Documents are rebuilt by
    joining the surviving lines in original order; the emitted frame
    carries ``n_lines`` / ``n_kept`` counters, NULL text passes
    through as NULL with zero counters.

    Scale shape: one posexplode projection (narrow), one
    combine-friendly groupBy on the 32-bit line hash (uniform by
    construction; partial aggregation absorbs hot lines map-side),
    one equi-join of the exploded lines against the 1-row-per-hash
    winner table (a mass-duplicated line skews this join's left side
    — AQE skew-join splits it), and one per-document groupBy whose
    collect_list is bounded by document size. No O(n²) stage.

    Matching is on ``portable_hash32`` of the normalized line on BOTH
    engines of a differential check, so a hash collision is a
    defined, parity-preserving event (the decontam / boilerplate
    precedent; tests/test_line_dedup.py holds the DuckDB
    re-derivation — the driver registry is frozen)."""
    key, txt = F.col(key_col), F.col(text_col)
    # \Q..\E quotes the delimiter for Java regex (split takes a regex)
    lines = F.split(txt, "\\Q" + delim + "\\E")
    base = df.withColumn("__n_lines", F.when(txt.isNull(), F.lit(0)).otherwise(F.size(lines)))
    ex = base.select(key.alias("__k"), F.posexplode(lines).alias("__pos", "__line"))
    norm = F.col("__line")
    if normalize:
        norm = F.regexp_replace(F.lower(F.trim(norm)), r"\s+", " ")
    ex = ex.withColumn("__norm_len", F.length(norm)).withColumn(
        "__lh", portable_hash32(norm)
    )
    eligible = ex.filter(F.col("__norm_len") >= min_line_chars)
    winners = eligible.groupBy("__lh").agg(
        F.min(F.struct("__k", "__pos")).alias("__win")
    )
    kept_eligible = (
        eligible.join(winners, "__lh")
        .filter((F.col("__k") == F.col("__win.__k")) & (F.col("__pos") == F.col("__win.__pos")))
        .select("__k", "__pos", "__line")
    )
    kept = kept_eligible.unionByName(
        ex.filter(F.col("__norm_len") < min_line_chars).select("__k", "__pos", "__line")
    )
    rebuilt = kept.groupBy("__k").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            delim,
        ).alias("__kept_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    out = (
        base.join(rebuilt, base[key_col] == rebuilt["__k"], "left")
        .drop("__k")
        .withColumn(
            text_col,
            F.when(txt.isNull(), F.lit(None).cast("string")).otherwise(
                F.coalesce(F.col("__kept_text"), F.lit(""))
            ),
        )
        .withColumn("n_lines", F.col("__n_lines").cast("bigint"))
        .withColumn("n_kept", F.coalesce(F.col("__n_kept"), F.lit(0)).cast("bigint"))
        .drop("__kept_text", "__n_kept", "__n_lines")
    )
    return out


def _positional_grams(
    df: DataFrame, key_col: str, text_col: str, L: int
) -> tuple[DataFrame, DataFrame]:
    """Shared span-op front half: ``base`` carries the materialized
    token array + count; ``ex`` is one row per token position with
    ``__k / __pos / __tok / __gh`` where ``__gh`` is the portable
    hash of the L-gram STARTING at the position (NULL for the last
    L−1 positions). One narrow projection — no shuffle."""
    from .textstats import tokens_expr

    base = df.withColumn("__toks", tokens_expr(F.col(text_col))).withColumn(
        "__n_tok", F.size("__toks")
    )
    # per-position gram hash, aligned with the token array: position p
    # (0-based) starts an L-gram iff p <= n - L, else NULL
    ghs = F.transform(
        F.col("__toks"),
        lambda _t, i: F.when(
            i <= F.col("__n_tok") - L,
            portable_hash32(F.array_join(F.slice(F.col("__toks"), i + 1, L), " ")),
        ).otherwise(F.lit(None).cast("long")),
    )
    ex = base.select(
        F.col(key_col).alias("__k"),
        F.posexplode(F.arrays_zip(F.col("__toks").alias("tok"), ghs.alias("gh"))).alias(
            "__pos", "__z"
        ),
    ).select("__k", "__pos", F.col("__z.tok").alias("__tok"), F.col("__z.gh").alias("__gh"))
    return base, ex


def _drop_covered_and_rebuild(
    base: DataFrame,
    flagged: DataFrame,
    key_col: str,
    text_col: str,
    L: int,
) -> DataFrame:
    """Shared span-op back half: ``flagged`` is ``ex`` plus a boolean
    ``__cut`` marking positions whose L-gram span must be deleted. A
    position q is covered iff the running max of cut-starts up to q
    exceeds q − L (O(n) unbounded-preceding window per doc); the
    survivors rebuild in order, counters re-attach, NULL text stays
    NULL. The window and the rebuild groupBy share one Exchange on
    the doc key."""
    from pyspark.sql import Window

    txt = F.col(text_col)
    w = Window.partitionBy("__k").orderBy("__pos").rowsBetween(Window.unboundedPreceding, 0)
    kept = (
        flagged.withColumn("__lastl", F.max(F.when(F.col("__cut"), F.col("__pos"))).over(w))
        .filter(F.col("__lastl").isNull() | (F.col("__lastl") <= F.col("__pos") - L))
        .select("__k", "__pos", "__tok")
    )
    rebuilt = kept.groupBy("__k").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("__kept_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return (
        base.join(rebuilt, base[key_col] == rebuilt["__k"], "left")
        .drop("__k")
        .withColumn(
            text_col,
            F.when(txt.isNull(), F.lit(None).cast("string")).otherwise(
                F.coalesce(F.col("__kept_text"), F.lit(""))
            ),
        )
        .withColumn("n_tokens", F.col("__n_tok").cast("bigint"))
        .withColumn("n_kept", F.coalesce(F.col("__n_kept"), F.lit(0)).cast("bigint"))
        .drop("__kept_text", "__n_kept", "__n_tok", "__toks")
    )


def _dedup_spans_anchored(
    df: DataFrame, *, key_col: str, text_col: str, L: int, w: int
) -> DataFrame:
    """Anchor-gram span dedup (the ``strategy="anchor"`` body of
    :func:`dedup_spans`, where semantics, guarantees and the miss
    profile are documented).

    Plan shape, stage by stage (the whole point is the exchange
    budget):
      1. narrow: token array → per-gram ``cmb = gh·2²¹ + (2²⁰ − pos)``
         (the winnow_fingerprints encoding, so a window MIN is the
         min-hash-rightmost-pos anchor) → sliding window-of-``w``
         minima via ``w`` shifted slices folded with ``zip_with``
         (loop-free per window — a per-window ``slice`` lambda would
         re-evaluate the gram hashes O(G·w) times; the materialized
         ``__cmb`` column is referenced ``w+1`` times, which also
         keeps CollapseProject from inlining the hash transform) →
         ``array_distinct`` = the anchor set, ~2/(w+1) of grams.
      2. anchor-sized exchange: explode anchors, groupBy gram hash →
         duplicated-anchor winners (min (key,pos) struct — the exact
         strategy's tie rule). The anchor frame feeds both the
         groupBy and the loser join, so the narrow stage re-evaluates
         once (the exact join strategy's accepted bounded-2× shape).
      3. loser-sized exchange: losers groupBy doc → sorted cut-start
         arrays (bounded by the 2²⁰ position cap).
      4. doc-granular join + narrow rebuild: ``array_except`` of all
         positions minus ``flatten(sequence(p, p+L−1))`` cut covers —
         no per-token window, no token-granular exchange anywhere."""
    from .textstats import tokens_expr

    if w < 1 or w > L:
        raise ValueError(
            f"anchor_window must be in [1, min_span_tokens]; got {w} (L={L}) — "
            "w <= L keeps adjacent anchor cut spans hole-free"
        )
    BIG, POS0 = 1 << 21, 1 << 20
    txt = F.col(text_col)
    base = df.withColumn("__toks", tokens_expr(txt)).withColumn(
        "__n_tok", F.size("__toks")
    )
    n_grams = F.col("__n_tok") - F.lit(L - 1)

    # per-position encoded gram key; NULL past the last gram start.
    # position guard INSIDE the load-bearing expression (winnow rule)
    def _cmb_at(i):
        pos_ok = F.when(i < POS0, i).otherwise(
            F.raise_error(
                F.lit(f"dedup_spans(anchor): document exceeds {POS0} tokens")
            ).cast("int")
        )
        gh = portable_hash32(F.array_join(F.slice(F.col("__toks"), i + 1, L), " "))
        return F.when(
            i <= F.col("__n_tok") - L, gh * F.lit(BIG) + (F.lit(POS0) - pos_ok)
        ).otherwise(F.lit(None).cast("long"))

    cmb_arr = F.transform(F.col("__toks"), lambda _t, i: _cmb_at(i))

    def _anchors_from(cmb):
        # `cmb` is a BOUND LAMBDA VARIABLE, so the expensive gram-hash
        # transform above is evaluated exactly once per row no matter
        # how many slices reference it. A plain withColumn("__cmb")
        # does NOT give that guarantee: CollapseProject inlines the
        # transform into every one of the w+1 slice references (14 md5
        # trees in the plan at w=2; measured 617 s vs 44 s exact at
        # 500k before this barrier — the CSE-across-HOF trap, lambda
        # edition).
        winlen = n_grams - F.lit(w - 1)
        m = F.slice(cmb, 1, winlen)
        for j in range(1, w):
            m = F.zip_with(m, F.slice(cmb, 1 + j, winlen), lambda a, b: F.least(a, b))
        return (
            F.when(n_grams <= 0, F.array().cast("array<long>"))
            .when(n_grams < w, F.array(F.array_min(F.slice(cmb, 1, n_grams))))
            .otherwise(F.array_distinct(m))
        )

    anchors = F.element_at(F.transform(F.array(cmb_arr), _anchors_from), 1)
    anch = (
        base.withColumn("__anch", anchors)
        .select(F.col(key_col).alias("__k"), F.explode("__anch").alias("__c"))
        .select(
            "__k",
            F.expr(f"CAST(__c div {BIG} AS BIGINT)").alias("__gh"),
            (F.lit(POS0) - F.pmod(F.col("__c"), F.lit(BIG))).cast("int").alias("__pos"),
        )
    )
    winners = (
        anch.groupBy("__gh")
        .agg(F.min(F.struct("__k", "__pos")).alias("__win"), F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= 2)
        .select("__gh", "__win")
    )
    losers = (
        anch.join(winners, "__gh")
        .filter(
            ~((F.col("__k") == F.col("__win.__k")) & (F.col("__pos") == F.col("__win.__pos")))
        )
        .select("__k", "__pos")
    )
    cut_lists = losers.groupBy("__k").agg(F.collect_list("__pos").alias("__cuts"))

    joined = base.join(cut_lists, base[key_col] == cut_lists["__k"], "left").drop("__k")
    cuts0 = F.coalesce(F.col("__cuts"), F.array().cast("array<int>"))
    # union of [p, p+L) covers; a gram start p satisfies p ≤ n−L so
    # sequence never descends (the sequence(1, n<1) trap)
    cut_pos = F.array_distinct(
        F.flatten(F.transform(cuts0, lambda p: F.sequence(p, p + F.lit(L - 1))))
    )
    all_pos = F.when(
        F.col("__n_tok") > 0, F.sequence(F.lit(0), F.col("__n_tok") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept_idx = F.array_except(all_pos, cut_pos)
    kept_text = F.array_join(
        F.transform(kept_idx, lambda i: F.element_at(F.col("__toks"), i + 1)), " "
    )
    return (
        joined.withColumn(
            text_col,
            F.when(txt.isNull(), F.lit(None).cast("string")).otherwise(kept_text),
        )
        .withColumn("n_tokens", F.col("__n_tok").cast("bigint"))
        .withColumn("n_kept", F.size(kept_idx).cast("bigint"))
        .drop("__cuts", "__toks", "__n_tok")
    )


def dedup_spans(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_span_tokens: int = 8,
    strategy: str = "join",
    anchor_window: int = 4,
) -> DataFrame:
    """Exact-substring span dedup (ExactSubstr, Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) at token-``L``-gram granularity: every token
    span of ``min_span_tokens`` whitespace tokens that occurs more
    than once in the corpus is DELETED everywhere except its globally
    first occurrence, ordered by ``(key, start position)``. Unlike
    document- or line-level dedup this removes duplicated passages
    *inside* otherwise-unique documents (license blurbs, quoted
    boilerplate, mirrored paragraphs); reference has no analog,
    extension per build brief.

    Gram-granular approximation of the paper's suffix-array pass: a
    token position ``q`` is deleted iff some non-first duplicated
    L-gram occurrence starts at ``p`` with ``p ≤ q < p+L`` —
    equivalently iff the running max of loser start positions up to
    ``q`` exceeds ``q − L`` (one O(n) unbounded-preceding window per
    document, NOT an O(n·L) sliding frame). Consequences, both
    shared with the paper's tool and documented here: the surviving
    first occurrence can still lose tokens to a DIFFERENT
    overlapping duplicated span, and deleting a span splices its
    neighbors together (which can form new adjacencies). Documents
    are rebuilt by joining surviving tokens with single spaces —
    original inter-token whitespace is not preserved (the tool
    operates on token sequences too). Docs with fewer than L tokens
    have no grams and pass through unchanged; NULL text → NULL with
    zero counters. Output carries ``n_tokens`` / ``n_kept``.

    Scale shape: one narrow per-position gram-hash projection (the
    token array materialized once — CSE-across-HOF trap), one
    combine-friendly groupBy on the 32-bit gram hash (uniform by
    construction; partial min/count map-side), a LEFT join of
    exploded positions against ONLY the grams with ≥2 occurrences
    (bounded by duplicated content, not corpus size — a mass-
    duplicated passage skews the join's left side and AQE skew-join
    splits it), then one per-document window + groupBy pair that
    share a single Exchange on the key. No O(n²) stage; the gram
    groupBy shuffle is token-granular — the honest cost of
    ExactSubstr (the suffix-array analog is a global sort).

    ``strategy`` picks the loser-derivation plan — a MEASURED trade
    (500k-row A/B, both uniform-100× and one-gram-in-every-doc
    corpora): ``"window"`` derives loser flags from one count /
    row_number window partitioned by gram hash — single evaluation
    of the gram pipeline, no join, ~1.5× faster (17.6 s vs 26.8 s
    uniform; 18.1 s vs 27.7 s with a 500k-occurrence hot gram) —
    but every occurrence of a mass-duplicated gram lands in ONE
    window partition that AQE cannot split, so a gram duplicated
    ~100M× at 100 TB becomes a single straggler sort. ``"join"``
    (default) re-evaluates the gram-hash projection for the winner
    branch (the dedup_lines precedent; bounded 2× on the narrow
    stage) but its skewed probe side is ordinary sort-merge-join
    input that AQE skew-split handles — the safe default at scale;
    flip to ``"window"`` when no single span can plausibly repeat
    nine figures.

    ``strategy="anchor"`` (VERDICT r7 #4) is the OPT-IN scale path
    that cuts the token-granular exchange ~``(anchor_window+1)/2``×
    by winnowing: per document, the L-gram hashes and their
    window-of-``anchor_window`` minima (rightmost-tie, the
    winnow_fingerprints encoding) are computed INSIDE the token
    array — shifted-slice ``zip_with`` folds, zero shuffle — and
    only the ~2/(w+1)-density ANCHOR occurrences shuffle by hash.
    Duplicated anchors mark loser cut-starts; losers group back to
    their doc (loser-sized exchange) and the rebuild is a narrow
    ``array_except`` over positions after a doc-granular join. Error
    profile (one-sided, documented + property-tested,
    tests/test_span_dedup.py): anchored deletions ⊆ exact deletions
    (every duplicated anchor IS a duplicated L-gram and the cut rule
    is identical on the subset); by the winnowing guarantee every
    duplicated passage of ``L + w − 1`` tokens shares an anchor in
    BOTH copies (per-window min with rightmost tie is context-free,
    so identical content selects identical relative positions), and
    with ``w ≤ L`` (enforced — keeps adjacent anchor cuts hole-free)
    the non-first copy loses all but at most ``w − 1`` boundary
    tokens per side; duplicated spans shorter than ``L + w − 1``
    tokens may be missed entirely. ``anchor_window=1`` selects every
    gram (exact candidate set through the anchored plan). Docs
    beyond 2²⁰ tokens raise (the winnow position-encoding bound);
    the per-doc loser collect is bounded by the same cap.

    Matching is on ``portable_hash32`` of the space-joined gram on
    both engines of a differential check, so a hash collision is a
    defined, parity-preserving event (decontam / line-dedup
    precedent; tests/test_span_dedup.py holds the DuckDB
    re-derivation — the driver registry is frozen)."""
    L = int(min_span_tokens)
    if L < 2:
        raise ValueError(f"min_span_tokens must be >= 2, got {min_span_tokens}")
    if strategy not in ("join", "window", "anchor"):
        raise ValueError(
            f"strategy must be 'join', 'window' or 'anchor', got {strategy!r}"
        )
    if strategy == "anchor":
        return _dedup_spans_anchored(
            df, key_col=key_col, text_col=text_col, L=L, w=int(anchor_window)
        )
    base, ex = _positional_grams(df, key_col, text_col, L)
    if strategy == "join":
        # grams occurring >= 2x, with their globally-first occurrence;
        # unique (key, pos) makes the min-struct winner tie-free
        dup_winners = (
            ex.filter(F.col("__gh").isNotNull())
            .groupBy("__gh")
            .agg(
                F.min(F.struct("__k", "__pos")).alias("__win"),
                F.count(F.lit(1)).alias("__cnt"),
            )
            .filter(F.col("__cnt") >= 2)
            .select("__gh", "__win")
        )
        flagged = ex.join(dup_winners, "__gh", "left").withColumn(
            "__cut",
            F.col("__win").isNotNull()
            & ~(
                (F.col("__k") == F.col("__win.__k"))
                & (F.col("__pos") == F.col("__win.__pos"))
            ),
        )
    else:
        from pyspark.sql import Window

        # the window runs ONLY over gram-bearing rows: the last L−1
        # positions of EVERY doc carry a NULL __gh, and a
        # partitionBy("__gh") over the full frame would funnel all of
        # them — (L−1)·n_docs rows, independent of duplication — into
        # one unsplittable NULL partition (review catch, this round).
        # The NULL rows rejoin as never-cut rows derived DIRECTLY from
        # the token-array tail — a filter on ex would re-run the full
        # O(n·L) gram hashing just to discard it (the two-branch trap
        # this strategy exists to avoid)
        per_gram = Window.partitionBy("__gh")
        with_gram = (
            ex.filter(F.col("__gh").isNotNull())
            .withColumn("__cnt", F.count(F.lit(1)).over(per_gram))
            .withColumn("__rn", F.row_number().over(per_gram.orderBy("__k", "__pos")))
            .withColumn("__cut", (F.col("__cnt") >= 2) & (F.col("__rn") > 1))
            .drop("__cnt", "__rn")
        )
        start = F.greatest(F.col("__n_tok") - F.lit(L - 1), F.lit(0))
        tail_rows = (
            base.select(
                F.col(key_col).alias("__k"),
                start.alias("__start"),
                F.posexplode(
                    F.slice(F.col("__toks"), start + 1, F.col("__n_tok") - start)
                ).alias("__p", "__tok"),
            )
            .select(
                "__k",
                (F.col("__start") + F.col("__p")).alias("__pos"),
                "__tok",
                F.lit(None).cast("long").alias("__gh"),
                F.lit(False).alias("__cut"),
            )
        )
        flagged = with_gram.unionByName(tail_rows)
    return _drop_covered_and_rebuild(base, flagged, key_col, text_col, L)


def span_length_profile(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_span_tokens: int = 8,
    sample_fraction: float | None = None,
    seed: int = 7,
) -> DataFrame:
    """Duplicated-span length histogram — the corpus measurement the
    ``dedup_spans(strategy="anchor")`` ``anchor_window`` choice needs
    (VERDICT r8 finding #1). Anchor mode guarantees deletion only for
    duplicated passages of at least ``L + w − 1`` tokens (winnowing
    guarantee, see :func:`dedup_spans`); duplicate mass below that
    length is the miss exposure — measured 0.184 of missed token mass
    at the 500k trend tier vs 0.432 at 5M purely because the 5M
    regime's duplicate mass sits at/below ``L + w − 1 = 11`` tokens
    (SCALING.md r8). This helper turns "pick ``w`` so that
    ``L + w − 1`` ≤ your shortest span worth catching" from doctrine
    into a checkable per-corpus step.

    Semantics: a *maximal duplicated passage* is a maximal run of
    consecutive token positions in one document that each start a
    corpus-duplicated ``L``-gram (the exact strategy's duplicated-gram
    set; all occurrences counted, winners included — the length
    distribution is what matters, not the keep rule). A run of ``r``
    consecutive duplicated gram starts covers ``r + L − 1`` tokens.
    Output, one row per distinct length, ascending:

    * ``span_tokens`` — passage length in tokens
    * ``n_spans`` — number of maximal duplicated passages of that length
    * ``dup_token_mass`` — ``n_spans · span_tokens``
    * ``cum_mass_frac`` — cumulative fraction of duplicated token mass
      at or below this length (round(9), portable): the value at
      ``span_tokens = L + w − 1 − 1`` is the guaranteed-coverage GAP —
      an upper bound on anchor mode's missed duplicated-token fraction
      at that ``w`` (upper bound, not exact: spans above the guarantee
      lose only their ≤ ``w − 1`` boundary tokens, and sub-guarantee
      spans can still be caught opportunistically when an anchor
      happens to land inside both copies)
    * ``max_guaranteed_w`` — ``min(span_tokens − L + 1, L)``: the
      largest usable ``anchor_window`` (the operator enforces
      ``w ≤ L``) whose guarantee still covers spans of this length
      (Lee et al. 2021, arXiv:2107.06499's companion analysis)
    * ``min_span_tokens`` — the constant ``L`` the profile was built
      with, carried with the histogram so
      :func:`recommended_anchor_window` can verify it inverts the
      same ``L`` (every guarantee threshold is ``L``-relative; a
      mismatched ``L`` would silently shift them all — ADVICE r9)

    ``sample_fraction`` bounds the token-granular work for a
    diagnostic pass over a large corpus: a seeded, engine-portable
    document sample (``portable_hash32(key ‖ seed) mod 10⁶`` — the
    decontam-style construction, replicable in a DuckDB twin).
    Duplication is then measured WITHIN the sample, so cross-document
    duplicate mass whose partner fell outside the sample is missed:
    the profile is a lower bound on duplicate mass. The length
    DISTRIBUTION — the thing the ``w`` choice reads — is much less
    biased (mass at every length shrinks by roughly the same
    partner-survival factor for cross-doc duplicates). Full-corpus
    (``None``) is exact and costs one gram groupBy plus a window over
    duplicated positions only.

    Scale shape: the exact strategy's narrow gram projection and
    combine-friendly gram-hash groupBy (map-side partial counts), one
    join of positions against the ≥2-occurrence gram set (bounded by
    duplicated content), one per-doc window over DUPLICATED positions
    only (not all tokens), then a histogram groupBy whose cardinality
    is bounded by the longest document. No O(n²) stage.
    """
    L = int(min_span_tokens)
    if L < 2:
        raise ValueError(f"min_span_tokens must be >= 2, got {min_span_tokens}")
    from pyspark.sql import Window

    src = df
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        gate = F.pmod(
            portable_hash32(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}"))),
            F.lit(1_000_000),
        )
        src = df.filter(gate < F.lit(int(round(sample_fraction * 1_000_000))))

    _base, ex = _positional_grams(src, key_col, text_col, L)
    occ = ex.filter(F.col("__gh").isNotNull()).select("__k", "__pos", "__gh")
    dup_ghs = (
        occ.groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= 2)
        .select("__gh")
    )
    dup_pos = occ.join(dup_ghs, "__gh").select("__k", "__pos")
    # gaps-and-islands: consecutive duplicated gram starts share
    # (pos − row_number) within a doc
    w_doc = Window.partitionBy("__k").orderBy("__pos")
    spans = (
        dup_pos.withColumn("__grp", F.col("__pos") - F.row_number().over(w_doc))
        .groupBy("__k", "__grp")
        .agg(F.count(F.lit(1)).alias("__run"))
        .select((F.col("__run") + F.lit(L - 1)).alias("span_tokens"))
    )
    hist = spans.groupBy("span_tokens").agg(F.count(F.lit(1)).alias("n_spans"))
    hist = hist.withColumn(
        "dup_token_mass", (F.col("span_tokens") * F.col("n_spans")).cast("bigint")
    )
    # the histogram is tiny (≤ longest-doc rows): both windows land on
    # ONE Exchange SinglePartition (no partitionBy) followed by two
    # in-partition sorts — the whole-frame total does NOT move the
    # data a second time (VERDICT r9 nit #4, adjudicated
    # driver-trivial; a crossJoin-broadcast total would instead
    # re-evaluate the gram pipeline or need a BroadcastNestedLoopJoin
    # the plan test forbids)
    w_cum = Window.orderBy("span_tokens").rowsBetween(Window.unboundedPreceding, 0)
    total = F.sum("dup_token_mass").over(
        Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        hist.withColumn("__cum", F.sum("dup_token_mass").over(w_cum))
        .withColumn("cum_mass_frac", F.round(F.col("__cum") / total, 9))
        .withColumn(
            "max_guaranteed_w",
            F.least(F.col("span_tokens") - F.lit(L - 1), F.lit(L)).cast("int"),
        )
        .select(
            "span_tokens", "n_spans", "dup_token_mass", "cum_mass_frac",
            "max_guaranteed_w", F.lit(L).cast("int").alias("min_span_tokens"),
        )
        .orderBy("span_tokens")
    )


def recommended_anchor_window(
    profile: DataFrame,
    *,
    min_span_tokens: int | None = None,
    max_miss_frac: float = 0.05,
    max_window: int | None = None,
) -> dict:
    """Invert a :func:`span_length_profile` histogram into a concrete
    ``anchor_window`` under a duplicated-token miss budget: the
    LARGEST ``w ∈ [1, L]`` (largest = biggest exchange cut, bytes cut
    ≈ (w+1)/2×) whose guarantee gap — the cumulative duplicated-token
    mass at ``span_tokens < L + w − 1`` — stays within
    ``max_miss_frac``. The gap is an UPPER bound on anchor mode's
    guaranteed-miss fraction (see :func:`span_length_profile`), so the
    recommendation is conservative.

    Driver-side math over the collected histogram (bounded by the
    longest document — at most a few thousand rows). Returns::

        {"anchor_window": w,            # 1..L; 1 == exact candidate set
         "guarantee_tokens": L + w − 1, # shortest span guaranteed caught
         "gap_mass_frac": f,            # measured mass below the guarantee
         "bytes_cut_estimate": (w+1)/2} # the measured w-law's shape term

    A corpus whose duplicate mass sits entirely at the minimal span
    length (the 5M trend regime, missed_frac 0.432 at w=4 — SCALING.md
    r8/r9) yields ``anchor_window = 1`` for any tight budget: the
    honest answer that anchor mode cannot cut bytes there without
    eating the miss.

    ``min_span_tokens`` defaults to the ``L`` the profile itself
    carries (its ``min_span_tokens`` column); passing it explicitly is
    a cross-check — a value different from the profile's raises
    instead of silently shifting every guarantee threshold (ADVICE
    r9).

    ``max_window`` caps the searched ``w`` range below ``L`` — the
    hook for constraints OUTSIDE the miss budget, e.g. the
    kept-floor residue cap (:func:`curation.resolve_span_strategy`):
    a gutted duplicate retains ≤ ``2(w−1)`` boundary tokens, so on
    short-document corpora a large ``w`` keeps whole-doc-duplicate
    shells above a kept-fraction floor even when the miss budget
    would allow it (measured r10: w=8 on the crawl fixture kept 84k
    survivors vs exact's 4.8k THROUGH the 0.3 floor)."""
    # validate BEFORE the collect (ADVICE r11): the rows helper
    # re-validates, but an invalid budget must not pay a Spark job
    # first — these two checks mirror recommended_anchor_window_rows
    if min_span_tokens is not None and int(min_span_tokens) < 2:
        raise ValueError(f"min_span_tokens must be >= 2, got {min_span_tokens}")
    if not (0.0 <= max_miss_frac <= 1.0):
        raise ValueError(f"max_miss_frac must be in [0, 1], got {max_miss_frac}")
    cols = ["span_tokens", "cum_mass_frac"]
    has_L_col = "min_span_tokens" in profile.columns
    if has_L_col:
        cols.append("min_span_tokens")
    elif min_span_tokens is None:
        raise ValueError(
            "profile carries no min_span_tokens column (built before r10?) "
            "— pass min_span_tokens= explicitly"
        )
    return recommended_anchor_window_rows(
        profile.select(*cols).collect(),
        min_span_tokens=min_span_tokens,
        max_miss_frac=max_miss_frac,
        max_window=max_window,
    )


def recommended_anchor_window_rows(
    collected: list,
    *,
    min_span_tokens: int | None = None,
    max_miss_frac: float = 0.05,
    max_window: int | None = None,
) -> dict:
    """Driver-side core of :func:`recommended_anchor_window` over
    ALREADY-COLLECTED profile rows — the hook for a caller that folds
    other aggregates into the profile's single collect and must not
    pay a second job (``curation.resolve_span_strategy`` rides its
    kept-floor percentile on the same action, VERDICT r10 #4). Same
    semantics, same L cross-check (read from the rows'
    ``min_span_tokens`` field when present)."""
    if min_span_tokens is not None and int(min_span_tokens) < 2:
        raise ValueError(f"min_span_tokens must be >= 2, got {min_span_tokens}")
    if not (0.0 <= max_miss_frac <= 1.0):
        raise ValueError(f"max_miss_frac must be in [0, 1], got {max_miss_frac}")
    has_L_col = bool(collected) and "min_span_tokens" in collected[0].asDict()
    if has_L_col:
        profile_Ls = {int(r["min_span_tokens"]) for r in collected}
        if len(profile_Ls) > 1:
            raise ValueError(
                f"profile mixes rows from different min_span_tokens builds: "
                f"{sorted(profile_Ls)}"
            )
        if profile_Ls:
            (profile_L,) = profile_Ls
            if min_span_tokens is not None and int(min_span_tokens) != profile_L:
                raise ValueError(
                    f"min_span_tokens={int(min_span_tokens)} does not match the "
                    f"profile's own L={profile_L} — the guarantee thresholds are "
                    "L-relative, so inverting a profile at a different L would "
                    "silently shift them all"
                )
            min_span_tokens = profile_L
    if min_span_tokens is None:
        # empty profile with no rows to read L from — no duplicated
        # mass at all, any w is safe; report the degenerate answer at
        # an L the caller must supply
        raise ValueError(
            "empty profile and no min_span_tokens given — pass the L the "
            "profile was built with"
        )
    L = int(min_span_tokens)
    if L < 2:
        raise ValueError(f"min_span_tokens must be >= 2, got {min_span_tokens}")
    rows = sorted(
        (int(r["span_tokens"]), float(r["cum_mass_frac"])) for r in collected
    )

    def gap_at(w: int) -> float:
        # cumulative mass strictly below the guarantee threshold L+w−1
        thr = L + w - 1
        g = 0.0
        for s, cum in rows:
            if s < thr:
                g = cum
            else:
                break
        return g

    w_hi = L if max_window is None else max(1, min(L, int(max_window)))
    best = 1  # w=1 selects every gram — exact candidate set, gap 0 below L
    for w in range(2, w_hi + 1):
        if gap_at(w) <= max_miss_frac:
            best = w
        else:
            break  # gap_at is non-decreasing in w
    return {
        "anchor_window": best,
        "guarantee_tokens": L + best - 1,
        "gap_mass_frac": gap_at(best),
        "bytes_cut_estimate": (best + 1) / 2,
    }


def corpus_minhash_sketch(
    df: DataFrame, text_col: str = "text", num_perms: int = 64
) -> list[int]:
    """Corpus-level MinHash sketch: for each of ``num_perms`` fixed
    affine permutations, the global minimum over EVERY character
    shingle hash in the corpus. One combine-friendly aggregate — the
    per-doc mins fold narrow, executors reduce map-side, and only
    ``num_perms`` BIGINTs cross the wire to the driver; zero joins,
    zero data shuffle. Raises on a corpus with no shingles (the
    sketch would be undefined).

    This is the one-permutation-per-slot k-sketch: for two corpora
    A, B, P(slot_A == slot_B) = J(shingles(A), shingles(B)), so the
    slot-agreement fraction is an unbiased Jaccard estimator with
    std-err ≈ sqrt(J(1−J)/k) (Broder 1997, "On the resemblance and
    containment of documents")."""
    from .hashing import minhash_perms

    sh = shingles_expr(F.col(text_col))
    hashed = df.withColumn("__sh", F.transform(sh, lambda s: portable_hash32(s)))
    aggs = [
        F.min(
            F.array_min(F.transform(F.col("__sh"), lambda h: minhash_perm(h, a, b)))
        ).alias(f"m{j}")
        for j, (a, b) in enumerate(minhash_perms(num_perms))
    ]
    row = hashed.agg(*aggs).collect()[0]
    mins = [row[f"m{j}"] for j in range(num_perms)]
    if any(m is None for m in mins):
        raise ValueError("corpus has no shingles — overlap sketch undefined")
    return mins


def corpus_overlap(
    a: DataFrame, b: DataFrame, text_col: str = "text", num_perms: int = 64
) -> dict:
    """Estimate the shingle-level Jaccard overlap of two corpora
    WITHOUT any cross-corpus join: two independent one-pass sketches
    (each a single aggregate over its corpus), compared slot-wise on
    the driver. The go/no-go check before mixing two crawls — at
    100 TB a side, the exact answer is a full dedup run; this is two
    scans and 2·k integers.

    Returns ``{"jaccard_est", "std_err", "slots_equal", "num_perms"}``
    where ``std_err`` is the binomial standard error of the
    agreement fraction."""
    sa = corpus_minhash_sketch(a, text_col, num_perms)
    sb = corpus_minhash_sketch(b, text_col, num_perms)
    eq = sum(1 for x, y in zip(sa, sb) if x == y)
    j = eq / float(num_perms)
    return {
        "jaccard_est": j,
        "std_err": (j * (1.0 - j) / num_perms) ** 0.5,
        "slots_equal": eq,
        "num_perms": num_perms,
    }


def cluster_size_histogram(clusters: DataFrame) -> DataFrame:
    """(size, n_clusters) over resolve_duplicate_clusters output —
    the shape of the duplication problem (a fat tail of mega-clusters
    means mirror sites / templated spam; many size-2 clusters means
    organic near-dups). Two combine-friendly groupBys, output bounded
    by the number of DISTINCT sizes."""
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


def dedup_report(clusters: DataFrame, n_rows: int | None = None) -> dict:
    """Duplication summary over resolved clusters: how many docs sit
    in a duplicate cluster, how many a keep-one pass would remove,
    and (with the corpus size ``n_rows``) the removable fraction —
    the go/no-go number a 100 TB dedup run is judged by before
    committing to the deletion. One aggregate over the bounded
    histogram; no corpus scan (pass ``n_rows`` from a stat you
    already have — the layout_corpus rows-hint doctrine)."""
    row = (
        cluster_size_histogram(clusters)
        .agg(
            F.sum("n_clusters").alias("n_clusters"),
            F.sum(F.col("size") * F.col("n_clusters")).alias("n_members"),
            F.sum((F.col("size") - 1) * F.col("n_clusters")).alias("n_removable"),
            F.max("size").alias("max_cluster_size"),
        )
        .collect()[0]
    )
    out = {
        "n_clusters": int(row["n_clusters"] or 0),
        "n_members": int(row["n_members"] or 0),
        "n_removable": int(row["n_removable"] or 0),
        "max_cluster_size": int(row["max_cluster_size"] or 0),
    }
    if n_rows is not None:
        out["removable_fraction"] = out["n_removable"] / n_rows if n_rows else 0.0
    return out


def _lsh_store_meta_path(store_path: str) -> str:
    import os as _os

    return _os.path.join(store_path, "_store_meta.json")


def _write_lsh_store_meta(store_path: str, bands: int, rows_per_band: int) -> None:
    import json as _json
    import os as _os

    _os.makedirs(store_path, exist_ok=True)
    tmp = _lsh_store_meta_path(store_path) + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"bands": bands, "rows_per_band": rows_per_band}, f)
    _os.replace(tmp, _lsh_store_meta_path(store_path))


def _check_lsh_store_meta(store_path: str, bands: int, rows_per_band: int) -> None:
    """A band-parameter mismatch would silently disable ALL dedup
    (different band hashes never join) AND corrupt the store with a
    second incompatible layout — refuse instead (review catch)."""
    import json as _json
    import os as _os

    p = _lsh_store_meta_path(store_path)
    if not _os.path.exists(p):
        return  # pre-metadata store: nothing to validate against
    with open(p) as f:
        meta = _json.load(f)
    if meta["bands"] != bands or meta["rows_per_band"] != rows_per_band:
        raise ValueError(
            f"LSH store at {store_path} was built with bands="
            f"{meta['bands']}, rows_per_band={meta['rows_per_band']} — "
            f"called with ({bands}, {rows_per_band}); a mismatch would "
            "silently admit every duplicate"
        )


def build_lsh_store(
    docs: DataFrame,
    store_path: str,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 2,
    rows_per_band: int = 4,
) -> None:
    """Bootstrap the band store from an ALREADY-DEDUPED corpus (the
    day-0 path before incremental ingest takes over): band rows for
    every scorable doc under the reserved ``bootstrap`` ingest
    partition, plus the band-parameter metadata every later call is
    validated against. Docs with no shingles carry no signature and
    are not stored (they are undetectable by MinHash either way)."""
    _check_lsh_store_meta(store_path, bands, rows_per_band)
    sigs = minhash_signature(docs.select(key_col, text_col), text_col=text_col)
    _band_rows(
        sigs.filter(F.col("mh0").isNotNull()), key_col, bands, rows_per_band, "mh"
    ).withColumn("__ingest", F.lit("bootstrap")).write.partitionBy(
        "__ingest"
    ).option("partitionOverwriteMode", "dynamic").mode("overwrite").parquet(store_path)
    _write_lsh_store_meta(store_path, bands, rows_per_band)


def incremental_lsh_dedup(
    new_docs: DataFrame,
    store_path: str,
    *,
    ingest_id: str | int,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    bands: int = 2,
    rows_per_band: int = 4,
    max_bucket_size: int = 1024,
    broadcast_new: bool = True,
) -> DataFrame:
    """Incremental near-dup maintenance: dedup a NEW batch against a
    persisted LSH band-bucket store WITHOUT re-running the corpus-wide
    pass, then publish the survivors' band rows into the store under
    this ``ingest_id``'s partition — the operational posture for a
    growing corpus (nobody re-deduplicates 100 TB per ingest; the
    store is the dedup state, exactly as the streaming IVF index is
    the serving state). Bootstrap an existing corpus with
    :func:`build_lsh_store`.

    Semantics (documented greedy, conservative in the dedup
    direction): a batch doc is dropped iff (a) some PREVIOUSLY-stored
    doc's signature estimates Jaccard ≥ ``threshold`` against it, or
    (b) it loses within-batch LSH dedup (cluster keeper = min key).
    Docs with no shingles (text shorter than one shingle) carry no
    signature, are undetectable by MinHash, and pass through as
    survivors WITHOUT being stored — otherwise they would all share
    one degenerate band bucket whose store fan-out grows with corpus
    age (review catch). The existing corpus always wins.

    Retry safety (the foreachBatch contract): ``ingest_id`` names the
    store partition this call owns — pass the micro-batch id. Victim
    matching EXCLUDES the current ingest's own partition and the
    write is a dynamic partition OVERWRITE of exactly that partition,
    so replaying a failed epoch recomputes the SAME survivors (the
    first attempt's half-published rows can neither suppress the
    replay nor double-append) — at-least-once upstream becomes
    effectively-once store state. A FIRST draft appended blindly and
    a replayed epoch matched its own rows as store dups, silently
    losing the whole batch (review catch). Band parameters are
    validated against the store's metadata.

    Scale shape: the batch side computes signatures narrow and is
    broadcast (``broadcast_new``, default — batches are small by
    definition) so the store join is a shuffle-free scan of the
    store; the survivors frame is localCheckpoint'ed BEFORE the store
    write (the CLAUDE.md ≥2-action invariant: the caller's action
    would otherwise re-run the store scan and both anti-joins);
    within-batch pairs go through the shared bucketed core. Store
    files accrete one partition per ingest — compact with
    ``streaming.incremental.compact_ivf_index``'s doctrine (rewrite +
    atomic publish) when partition counts grow."""
    from pyspark.sql.utils import AnalysisException

    spark = new_docs.sparkSession
    _check_lsh_store_meta(store_path, bands, rows_per_band)
    ingest = str(ingest_id)
    n = bands * rows_per_band
    # Pin the batch ITSELF first (bounded by the batch size): the
    # survivors anti-joins re-read ``new_docs``, so a lazy input whose
    # evaluation is order-sensitive (a bare ``limit``, an unordered
    # sample) would otherwise be evaluated TWICE — once into the
    # victim/loser decision set, once into the survivors frame — and
    # the two row sets can diverge, silently admitting every duplicate
    # (the r13 quickstart failure: 5/5 suppression miss in the
    # driver's environment). The r6-3 invariant applied to the INPUT
    # frame, not just derived frames.
    new_docs = new_docs.localCheckpoint(eager=True)
    # materialize the batch signatures once — the store join, the
    # within-batch pairs and the survivor-band publish would otherwise
    # each re-run the md5 shingle pipeline; bounded by the batch size
    sigs = minhash_signature(
        new_docs.select(key_col, text_col), text_col=text_col
    ).localCheckpoint(eager=True)
    scorable = sigs.filter(F.col("mh0").isNotNull())
    banded_new = _band_rows(scorable, key_col, bands, rows_per_band, "mh")
    try:
        store = spark.read.parquet(store_path).filter(F.col("__ingest") != ingest)
        have_store = True
    except AnalysisException:
        have_store = False
    victims = None
    if have_store:
        left = banded_new.select(
            F.col("id").alias("__new_id"),
            F.col("sig").alias("__new_sig"),
            "band_idx",
            "band_hash",
        )
        if broadcast_new:
            left = F.broadcast(left)
        eq = F.zip_with(
            F.col("__new_sig"), F.col("sig"), lambda x, y: (x == y).cast("int")
        )
        est = F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / float(n)
        victims = (
            left.join(store, ["band_idx", "band_hash"])
            .filter(est >= threshold)
            .select(F.col("__new_id").alias(key_col))
            .distinct()
        )
    within = lsh_candidate_pairs(
        scorable,
        key_col=key_col,
        bands=bands,
        rows_per_band=rows_per_band,
        max_bucket_size=max_bucket_size,
    ).filter(F.col("est_jaccard") >= threshold)
    losers = resolve_duplicate_clusters(within).filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select(F.col("doc_id").alias(key_col))
    survivors = new_docs.join(losers, key_col, "left_anti")
    if victims is not None:
        survivors = survivors.join(victims, key_col, "left_anti")
    survivors = survivors.localCheckpoint(eager=True)
    surv_bands = banded_new.join(
        survivors.select(F.col(key_col).alias("id")), "id", "left_semi"
    ).withColumn("__ingest", F.lit(ingest))
    surv_bands.write.partitionBy("__ingest").option(
        "partitionOverwriteMode", "dynamic"
    ).mode("overwrite").parquet(store_path)
    _write_lsh_store_meta(store_path, bands, rows_per_band)
    return survivors


# ---------------------------------------------------------------- winnowing

# winnowing position bound: pos must fit the low bits of the combined
# (hash, rightmost-pos) encoding that makes window-argmin a plain min()
_WINNOW_MAX_POS = 1 << 20


def winnow_fingerprints(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """MOSS-style robust winnowing (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003): slide a ``window`` of consecutive token ``k``-gram
    hashes and select each window's MINIMUM hash (ties → RIGHTMOST
    position, the paper's robust rule). Output one row per selected
    (``key_col``, ``pos``, ``fp``) — POSITIONAL local fingerprints,
    the complement to MinHash's global signatures: any passage of at
    least ``window + k - 1`` common tokens between two documents is
    GUARANTEED to share a fingerprint (the winnowing theorem), and the
    expected density is 2/(window+1) fingerprints per gram.

    Plan shape: the shared positional-gram projection
    (:func:`_positional_grams` — narrow, no shuffle), then ONE window
    Exchange keyed on the doc: the argmin-by-(hash, rightmost-pos) is
    encoded as a single BIGINT ``gh·2²¹ + (2²⁰ − pos)`` so the frame
    aggregate is a plain ``min()`` — the identical closed form a SQL
    twin evaluates (tests/test_winnow.py re-derives it end-to-end in
    DuckDB). Documents with fewer than ``window`` grams winnow their
    single short window (the last full-prefix frame). Docs longer
    than 2²⁰ tokens raise (encoding bound), as does k/window < 1."""
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k} window={window}")
    _, ex = _positional_grams(df, key_col, text_col, k)
    grams = ex.filter(F.col("__gh").isNotNull())
    from pyspark.sql import Window as W

    # guard the encoding bound INSIDE a load-bearing expression
    # (SURVEY gotcha 20: a guard nothing reads gets pruned)
    pos_ok = F.when(
        F.col("__pos") < _WINNOW_MAX_POS, F.col("__pos")
    ).otherwise(
        F.raise_error(
            F.lit(f"winnow_fingerprints: document exceeds {_WINNOW_MAX_POS} tokens")
        ).cast("int")
    )
    cmb = F.col("__gh") * F.lit(1 << 21) + (F.lit(1 << 20) - pos_ok)
    wkey = W.partitionBy("__k").orderBy("__pos")
    frame = wkey.rowsBetween(-(window - 1), 0)
    sel = (
        grams.withColumn("__cmb", cmb)
        .withColumn("__sel", F.min("__cmb").over(frame))
        .withColumn("__rn", F.row_number().over(wkey))
        .withColumn("__ng", F.count(F.lit(1)).over(W.partitionBy("__k")))
        # full windows only — except a short doc's single final frame
        .filter((F.col("__rn") >= window) | (F.col("__rn") == F.col("__ng")))
    )
    return sel.select(
        F.col("__k").alias(key_col),
        (F.lit(1 << 20) - F.pmod(F.col("__sel"), F.lit(1 << 21))).alias("pos"),
        # integer div, not `/`: float division of 53-bit combined values
        # sits exactly at double precision's edge
        F.expr(f"CAST(__sel div {1 << 21} AS BIGINT)").alias("fp"),
    ).distinct()


def winnow_overlap_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Document pairs sharing at least ``min_shared`` winnowing
    fingerprints — local-overlap candidates (plagiarism-style shared
    passages) that global MinHash similarity dilutes away on long
    documents. Fingerprints bucket by ``fp`` through the shared
    memory-bounded pair core; output (id_a < id_b, n_shared).

    By the winnowing theorem every common passage of
    ``window + k - 1`` tokens contributes ≥1 shared fingerprint, so
    ``min_shared`` is a direct knob on how much copied material is
    required (≈ min_shared·(window+1)/2 grams in expectation)."""
    fps = winnow_fingerprints(
        df, key_col=key_col, text_col=text_col, k=k, window=window
    ).select(F.col(key_col).alias("id"), "fp").distinct()
    pairs = _pairs_in_buckets(fps, ["fp"], F.struct(F.col("id")), max_bucket_size)
    return (
        pairs.groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
