"""End-to-end dedup: candidate pairs → cluster resolution →
keep-one-per-cluster survivors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import (
    deduplicate,
    lsh_candidate_pairs,
    minhash_signature,
    resolve_duplicate_clusters,
)

from tests.conftest import SF_SMOKE


def test_cluster_resolution_chain(spark):
    # chain 1-2-3-4 plus isolated pair (10,11): one component each
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cluster_resolution_deep_chain_converges(spark):
    """Pointer jumping gives O(log diameter) convergence: a 40-node
    chain (diameter 39) resolves well inside 10 iterations."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_duplicate_clusters(pairs, max_iterations=10).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_dedup_end_to_end_removes_injected_dups(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.union(dups)
    sigs = minhash_signature(corpus).drop("text")
    pairs = lsh_candidate_pairs(sigs).filter(F.col("est_jaccard") >= 0.999)
    survivors = deduplicate(corpus, pairs)
    # every injected copy (id ≥ 1e6) has an identical original with a
    # smaller id → all copies removed
    assert survivors.filter(F.col("doc_id") >= 1000000).count() == 0
    # a few NATURAL near-identical docs exist in this vocab-dense
    # corpus and are legitimately removed too — the invariant is that
    # no high-jaccard pair survives intact
    surv_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    both_alive = [
        (r["id_a"], r["id_b"])
        for r in pairs.collect()
        if r["id_a"] in surv_ids and r["id_b"] in surv_ids
    ]
    assert both_alive == []
    assert docs.count() - 50 <= survivors.count() < docs.count() + 1


# ------------------------------------------- bucketed embedding near-dup
def test_neardup_lsh_matches_numpy_replication(spark):
    """Full in-Python replication: recompute the seeded hyperplane
    buckets with numpy, derive the candidate set, exact cosines —
    the Spark bucketed path must emit exactly that pair set."""
    import numpy as np

    from fuserank_spark.pipeline_ext.dedup import embedding_neardup_pairs
    from fuserank_spark.pipeline_ext.simsearch import hyperplanes

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(F.col("vec_id") < 200)
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype="float64")
    nrm = np.linalg.norm(V, axis=1)

    n_planes, n_tables, threshold = 6, 2, 0.2
    expected = set()
    for t in range(n_tables):
        planes = hyperplanes(64, n_planes, seed=42 + t)
        buckets = ((V @ planes.T) >= 0).astype(int) @ (1 << np.arange(n_planes))
        for b in np.unique(buckets):
            members = np.where(buckets == b)[0]
            for ii in range(len(members)):
                for jj in range(ii + 1, len(members)):
                    x, y = members[ii], members[jj]
                    cos = (V[x] @ V[y]) / (nrm[x] * nrm[y])
                    if cos >= threshold:
                        a, bb = sorted((int(ids[x]), int(ids[y])))
                        expected.add((a, bb))

    got = embedding_neardup_pairs(
        e, threshold=threshold, method="lsh", dim=64, n_planes=n_planes, n_tables=n_tables
    ).collect()
    got_pairs = {(r.id_a, r.id_b) for r in got}
    assert got_pairs == expected
    assert len(got_pairs) > 0


def test_neardup_lsh_subset_of_exact(spark):
    """Every bucketed pair passes the exact check (precision 1.0) —
    the LSH path can only prune candidates, never invent them."""
    from fuserank_spark.pipeline_ext.dedup import embedding_neardup_pairs

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(e, threshold=0.2, max_id=200).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            e, threshold=0.2, max_id=200, method="lsh", dim=64
        ).collect()
    }
    assert lsh <= exact


def test_neardup_auto_refuses_unbounded_exact(spark):
    from fuserank_spark.pipeline_ext.dedup import embedding_neardup_pairs

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with pytest.raises(ValueError, match="max_id"):
        embedding_neardup_pairs(e, method="exact")
    with pytest.raises(ValueError, match="dim"):
        embedding_neardup_pairs(e, method="lsh")


def test_pairs_in_buckets_star_degrade_exact_edges(spark):
    """The shared two-regime pair core: under the cap a bucket emits
    all n(n-1)/2 pairs; over the cap it emits exactly the n-1 star
    edges anchored at the bucket-min id — identical to the min-
    anchored subset of the full pairing (so the cluster stays
    connected for deduplicate())."""
    from pyspark.sql import functions as F

    from fuserank_spark.pipeline_ext.dedup import _pairs_in_buckets

    n = 6
    df = spark.createDataFrame(
        [(0, i, [float(i), 1.0], 1.0) for i in range(n)] + [(1, 99, [0.0, 1.0], 1.0)],
        "bkt int, id long, vec array<double>, nrm double",
    )
    member = F.struct(F.col("id"), F.col("vec"), F.col("nrm"))

    full = {
        (r["a"]["id"], r["b"]["id"])
        for r in _pairs_in_buckets(df, ["bkt"], member, max_bucket_size=n).collect()
    }
    assert full == {(i, j) for i in range(n) for j in range(i + 1, n)}

    star = {
        (r["a"]["id"], r["b"]["id"])
        for r in _pairs_in_buckets(df, ["bkt"], member, max_bucket_size=n - 1).collect()
    }
    assert star == {(0, j) for j in range(1, n)}
    assert star == {p for p in full if p[0] == 0}


def test_pairs_in_buckets_randomized_vs_reference(spark):
    """Seeded randomized differential: many bucket shapes (singletons,
    under-cap, exactly-cap, over-cap) in one job, checked pair-for-pair
    against a pure-Python reference of the two-regime contract."""
    import random

    from pyspark.sql import functions as F

    from fuserank_spark.pipeline_ext.dedup import _pairs_in_buckets

    rng = random.Random(42)
    cap = 8
    rows, expected = [], set()
    by_bucket: dict[int, list[int]] = {}
    next_id = 0
    for bkt in range(25):
        n = rng.choice([1, 2, 3, cap - 1, cap, cap + 1, 3 * cap])
        ids = sorted(rng.sample(range(next_id, next_id + 10 * n), n))
        next_id += 10 * n
        by_bucket[bkt] = ids
        for i in ids:
            rows.append((bkt, i, [float(i % 7), 1.0], 1.0))
    for ids in by_bucket.values():
        if len(ids) < 2:
            continue
        if len(ids) <= cap:
            expected |= {(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]}
        else:
            expected |= {(ids[0], b) for b in ids[1:]}

    df = spark.createDataFrame(
        rows, "bkt int, id long, vec array<double>, nrm double"
    ).repartition(5)
    member = F.struct(F.col("id"), F.col("vec"), F.col("nrm"))
    got = {
        (r["a"]["id"], r["b"]["id"])
        for r in _pairs_in_buckets(df, ["bkt"], member, max_bucket_size=cap).collect()
    }
    assert got == expected


def test_cluster_histogram_and_report_match_duckdb(spark, duck):
    """Histogram + summary re-derived in DuckDB over the SAME
    resolved-clusters frame (the CC itself is iterative and stays
    unit-tested; the reporting on top is plain aggregation and gets
    the differential treatment). Frozen registry — oracle lives
    here."""
    import pandas as pd

    from fuserank_spark.pipeline_ext.dedup import (
        cluster_size_histogram,
        dedup_report,
        resolve_duplicate_clusters,
    )

    # chain 1-2-3, pair 10-11, star 20-{21,22,23}, singleton pairs none
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (20, 22), (20, 23)],
        "id_a long, id_b long",
    )
    clusters = resolve_duplicate_clusters(pairs).cache()
    pdf = clusters.toPandas()
    duck.register("clu", pdf)
    try:
        got = {
            (r["size"], r["n_clusters"])
            for r in cluster_size_histogram(clusters).collect()
        }
        want = {
            tuple(r)
            for r in duck.execute(
                "SELECT size, count(*) AS n_clusters FROM ("
                "SELECT cluster_id, count(*) AS size FROM clu GROUP BY cluster_id"
                ") GROUP BY size"
            ).fetchall()
        }
        assert got == want == {(3, 1), (2, 1), (4, 1)}
        rep = dedup_report(clusters, n_rows=100)
        assert rep == {
            "n_clusters": 3,
            "n_members": 9,
            "n_removable": 6,
            "max_cluster_size": 4,
            "removable_fraction": 0.06,
        }
        # empty pairs → zero report
        empty = resolve_duplicate_clusters(
            spark.createDataFrame([], "id_a long, id_b long")
        )
        rep0 = dedup_report(empty)
        assert rep0["n_clusters"] == 0 and rep0["n_removable"] == 0
    finally:
        duck.unregister("clu")


def test_cluster_resolution_reliable_checkpoint(spark, tmp_path):
    """VERDICT r8 ask #2: resolve_duplicate_clusters gains the
    node-loss-safe _LoopCheckpointer policy pagerank/hits got in r7 —
    identical clusters with checkpointing on, reliable checkpoint
    files actually land, and NO trailing persisted frames survive the
    call (ADVICE r8 #3's finish() hook, convergence-loop variant)."""
    import os

    # 40-node chain (exercises several iterations) + isolated pair
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(100, 101)],
        "id_a long, id_b long",
    )
    ckdir = str(tmp_path / "cc_ck")

    def _persisted_ids():
        # ID set, not size: the ContextCleaner asynchronously unpersists
        # GC'd frames from earlier tests, so a raw count can shrink
        m = spark.sparkContext._jsc.getPersistentRDDs()
        it = m.keySet().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    persisted_before = _persisted_ids()
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_duplicate_clusters(
            pairs, checkpoint_dir=ckdir, checkpoint_every=2
        ).collect()
    }
    exp = {i: 0 for i in range(41)}
    exp.update({100: 100, 101: 100})
    assert got == exp
    found = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert found, "no reliable checkpoint files written"
    assert (
        _persisted_ids() - persisted_before == set()
    ), "trailing persisted frames leaked past the loop"
    # default mode (localCheckpoint) agrees
    got_default = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_duplicate_clusters(pairs).collect()
    }
    assert got_default == exp


def test_deduplicate_checkpoint_passthrough(spark, tmp_path):
    """deduplicate() forwards checkpoint_dir/checkpoint_every: same
    survivors as the default path."""
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(12)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    base = {r["doc_id"] for r in deduplicate(df, pairs).collect()}
    ck = {
        r["doc_id"]
        for r in deduplicate(
            df, pairs, checkpoint_dir=str(tmp_path / "dd_ck"), checkpoint_every=2
        ).collect()
    }
    assert base == ck == {0, 3, 4, 5, 7, 8, 9, 10, 11}
