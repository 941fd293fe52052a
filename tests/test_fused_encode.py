"""Single-pass fused encode produces element-identical vectors to the
composed embed_corpus → encode_products path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuserank_spark import schema as S
from fuserank_spark.embed import embed_corpus
from fuserank_spark.encode import compute_stats, encode_products, record_text_dim
from fuserank_spark.fused_encode import embed_encode_fused

from tests.conftest import SF_SMOKE

AUX = {"lang": S.SPARSE, "n_chars": S.DENSE, "location": S.GEO, "is_long": S.BINARY}


@pytest.fixture(scope="module")
def docs(spark):
    from fuserank_spark.eval_harness import enriched_documents

    return enriched_documents(spark, SF_SMOKE).limit(150)


def test_fused_matches_composed(spark, docs):
    K, dim = 8, 32
    stats = compute_stats(docs, AUX)

    composed = embed_corpus(docs, {"text": 1.0}, dim=dim)
    composed, layout_c = encode_products(composed, AUX, stats, num_harmonics=K)
    record_text_dim(layout_c, dim)

    fused, layout_f = embed_encode_fused(
        docs, {"text": 1.0}, AUX, stats, emb_dim=dim, num_harmonics=K
    )
    assert layout_f.segments == layout_c.segments

    a = {r["row_id"]: r["vector"] for r in composed.select("row_id", "vector").collect()}
    b = {r["row_id"]: r["vector"] for r in fused.select("row_id", "vector").collect()}
    assert a.keys() == b.keys()
    for rid in a:
        assert np.allclose(np.array(a[rid]), np.array(b[rid]), atol=1e-12), rid
