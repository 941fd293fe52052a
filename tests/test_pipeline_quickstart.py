"""The README "training-data pipeline quickstart" block, executable:
every stage is individually differential-checked in its own test
file; THIS test pins that the advertised composition actually runs
end-to-end on real testdata and that each hand-off preserves the
invariants the next stage needs (the q_assembly precedent, registry-
external)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_readme_pipeline_composes_end_to_end(spark, tmp_path):
    from fuserank_spark.partitioning import (
        verify_corpus_snapshot,
        write_corpus_snapshot,
    )
    from fuserank_spark.pipeline_ext.bpe import bpe_token_count, bpe_train_from_corpus
    from fuserank_spark.pipeline_ext.classifier import train_quality_classifier
    from fuserank_spark.pipeline_ext.curation import (
        contamination_fraction,
        curate_corpus,
        frequent_ngrams,
        mixture_sample,
        remove_boilerplate_spans,
        temperature_rates,
    )
    from fuserank_spark.pipeline_ext.dedup import corpus_overlap, dedup_spans
    from fuserank_spark.pipeline_ext.packing import pack_split

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    n0 = docs.count()

    # overlap go/no-go between two halves
    ov = corpus_overlap(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        num_perms=16,
    )
    assert 0.0 <= ov["jaccard_est"] <= 1.0

    # chrome excision + passage dedup
    chrome = frequent_ngrams(docs, n=4, min_doc_count=40)
    stripped = remove_boilerplate_spans(docs, chrome, n=4).select("doc_id", "text")
    deduped = dedup_spans(stripped, min_span_tokens=8).select("doc_id", "text")

    # learned quality gate inside curation
    gib = spark.createDataFrame(
        [
            (
                10_000 + i,
                " ".join(
                    hashlib.md5(f"g{i}:{j}".encode()).hexdigest()[:6] for j in range(30)
                ),
            )
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    clf = train_quality_classifier(docs.limit(60), gib, n_features=1 << 14)
    clean = curate_corpus(
        deduped.unionByName(gib),
        min_quality=0.0,
        quality_model=clf,
        pareto_alpha=9.0,
    ).cache()
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert sum(1 for d in kept if d >= 10_000) <= 10  # gibberish mostly gone
    assert sum(1 for d in kept if d < 10_000) >= 30

    # contamination degree against a held-out slice, then hard drop
    bench_set = docs.filter(F.col("doc_id") % 13 == 0)
    contam = contamination_fraction(clean, bench_set, n=5)
    hot = contam.filter(F.col("overlap_frac") > 0.5).select("doc_id")
    # pin the post-contamination frame: every stage below (mixture,
    # BPE, packing, the day-2 LSH store) consumes it via its own
    # action, and a lazy re-evaluation under cache eviction could
    # hand different row sets to the store build vs the re-ingest
    # (the r12 driver-env flake)
    clean = clean.join(hot, "doc_id", "left_anti").localCheckpoint(eager=True)

    # temperature mixture over sources → packing by BPE token budget
    train = clean.filter(F.col("split") == "train").withColumn(
        "source", F.concat(F.lit("s"), F.col("doc_id") % 2)
    )
    sizes = {
        r["source"]: r["n"]
        for r in train.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if len(sizes) == 2 and min(sizes.values()) > 0:
        mixed = mixture_sample(train, temperature_rates(sizes, alpha=0.5))
    else:
        mixed = train.withColumn("copy_idx", F.lit(0))
    merges = bpe_train_from_corpus(clean, num_merges=40)
    budgeted = bpe_token_count(
        mixed.select((F.col("doc_id") * 8 + F.col("copy_idx")).alias("doc_id"), "text"),
        merges,
    ).withColumnRenamed("n_bpe_tokens", "n_tokens")
    packed = pack_split(budgeted, budget=256, key_col="doc_id")
    assert packed.count() > 0

    # verified snapshot round-trip
    path = str(tmp_path / "corpus_v1")
    manifest = write_corpus_snapshot(packed, path)
    assert verify_corpus_snapshot(spark, path)["checksum"] == manifest["checksum"]
    assert manifest["n_rows"] == packed.count() > 0

    # day-2 ingest: bootstrap the band store from the curated corpus,
    # then a re-ingest of curated content is fully suppressed
    from fuserank_spark.pipeline_ext.dedup import (
        build_lsh_store,
        incremental_lsh_dedup,
    )

    lsh_store = str(tmp_path / "lsh_store")
    build_lsh_store(clean.select("doc_id", "text"), lsh_store)
    # docs emptied/shortened below shingle length are unscorable and
    # pass through by design — re-ingest substantial texts only
    reingest = clean.filter(F.length("text") > 50).orderBy("doc_id").limit(5).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    assert incremental_lsh_dedup(reingest, lsh_store, ingest_id="day2").count() == 0
    assert n0 == docs.count()  # inputs untouched
