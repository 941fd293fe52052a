"""t1 smoke + t2 correctness (sf0.001) for the declared oracle
queries (SURVEY §2.12): every query runs, returns rows, and
hash-matches its DuckDB oracle."""

from __future__ import annotations

import pytest

from tools.check_correctness import value_hash

import __spark_entry__ as entry_mod

from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    if name not in ORACLES:
        assert len(srows) > 0, f"{name}: empty result"
        return  # weak (rows-only) check
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    # emptiness is legitimate only when the oracle agrees (e.g. q_anti
    # at tiny SF where every part has lineitems)
    assert len(srows) > 0 or len(drows) == 0, f"{name}: empty result"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert sorted(scols) == sorted(dcols), f"{name}: cols {scols} vs {dcols}"
    assert value_hash(srows, scols) == value_hash(drows, dcols), f"{name}: value hash"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
