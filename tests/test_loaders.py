"""End-to-end on the reference's OWN bundled dataset: load
restaurants.csv through the Spark loader, verify row-for-row parity
with the reference's pandas cleaning, then run a fused multimodal
query over it (all five modality kinds live)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fuserank_spark import schema as S
from fuserank_spark.embed import DeterministicStubEmbedder
from fuserank_spark.encode import compute_stats, encode_products, record_text_dim
from fuserank_spark.embed import embed_corpus
from fuserank_spark.loaders import load_restaurants
from fuserank_spark.query import compile_query
from fuserank_spark.search import topk

CSV = "/root/reference/data/restaurants/restaurants.csv"

pytestmark = pytest.mark.skipif(not os.path.exists(CSV), reason="reference data absent")


@pytest.fixture(scope="module")
def restaurants(spark):
    return load_restaurants(spark, CSV, fit_transforms=False)


def test_row_parity_with_pandas_cleaning(restaurants):
    # reference post-filter count: 8157 − 2 dropped rows = 8155
    assert restaurants.df.count() == 8155


def test_inferred_modalities(restaurants):
    aux = restaurants.schema.aux_encoding_schema
    assert aux["City"] == S.SPARSE
    assert aux["Has Table booking"] == S.BINARY
    assert aux["Has Online delivery"] == S.BINARY
    assert aux["Average Cost for two"] == S.DENSE
    assert aux["Votes"] == S.DENSE
    assert aux["Location"] == S.GEO
    assert "Restaurant Name" not in aux and "Cuisines" not in aux


def test_fused_query_over_restaurants(restaurants):
    """The reference's interactive search (src/app.py:73-89) on its
    own corpus: text + city filter + cost interval + geo proximity +
    delivery flag, one IP top-k."""
    aux_schema = restaurants.schema.aux_encoding_schema
    df = restaurants.df
    embedded = embed_corpus(
        df, restaurants.schema.text_encoding_schema, dim=32
    )
    stats = compute_stats(embedded, aux_schema)
    encoded, layout = encode_products(embedded, aux_schema, stats, num_harmonics=8)
    record_text_dim(layout, 32)
    encoded = encoded.persist()

    aux_data = {c: (None, 1.0) for c in aux_schema}
    aux_data["City"] = ((["New Delhi"], False), 4.0)
    aux_data["Average Cost for two"] = ((200.0, 800.0, False), 2.0)
    aux_data["Has Online delivery"] = ("Yes", 2.0)
    aux_data["Location"] = ((77.2, 28.6, False), 2.0)  # New Delhi

    cq = compile_query(
        "north indian mughlai",
        aux_data,
        aux_schema,
        stats,
        layout,
        text_embedder=DeterministicStubEmbedder(32),
        num_harmonics=8,
    )
    hits = topk(encoded, cq.vector, k=10).select(
        "row_id", "City", "Has Online delivery", "Average Cost for two", "Cuisines"
    ).collect()
    assert len(hits) == 10
    # soft filters dominate at weight 4/2: most hits satisfy them
    delhi = sum(1 for r in hits if r["City"] == "New Delhi")
    deliv = sum(1 for r in hits if r["Has Online delivery"] == "Yes")
    assert delhi >= 7, [r["City"] for r in hits]
    assert deliv >= 7
    encoded.unpersist()
