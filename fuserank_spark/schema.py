"""Logical-type system + schema inference (SURVEY §1.2, §2.2 P12-P14).

The engine recognizes five logical modality kinds, mirroring the
reference's runtime inference (`src/app.py:40-55`,
`src/eval/experiment.py:43-58`) but driven by Spark schema metadata +
one aggregate pass instead of pandas dtype sniffing:

  text         listed in text_encoding_schema (excluded from aux)
  binary       exactly 2 distinct non-null values (any type)
  sparse       string/categorical column
  dense        numeric column
  geolocation  struct<lon double, lat double> (the reference's
               (lon,lat) tuple becomes an explicit struct — §1.4)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPARSE = "sparse"
BINARY = "binary"
DENSE = "dense"
GEO = "geolocation"

KINDS = (SPARSE, BINARY, DENSE, GEO)

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


@dataclass
class DatasetSchema:
    """Config bundle replacing the reference's three loader dicts
    (`src/load.py:9-19`)."""

    # text column -> blend weight (src/load_flipkart.py:41-45)
    text_encoding_schema: dict[str, float] = field(default_factory=dict)
    # aux column -> modality kind (src/app.py:40-55)
    aux_encoding_schema: dict[str, str] = field(default_factory=dict)
    # numeric column -> transform name (src/load_flipkart.py:46-49); see transforms.py
    transformation_schema: dict[str, str] = field(default_factory=dict)
    key_column: str = "row_id"


def _is_geo_struct(dt: T.DataType) -> bool:
    return (
        isinstance(dt, T.StructType)
        and len(dt.fields) == 2
        and {f.name for f in dt.fields} == {"lon", "lat"}
    )


def candidate_columns(df: DataFrame, text_columns: set[str], key_column: str) -> list[str]:
    """P12 (src/app.py:143-148): modality candidates = non-text,
    non-key columns."""
    return [c for c in df.columns if c not in text_columns and c != key_column]


def infer_aux_schema(
    df: DataFrame,
    text_columns: set[str] | list[str] = (),
    key_column: str = "row_id",
    strict: bool = True,
) -> dict[str, str]:
    """P13 aux-kind inference (src/app.py:40-55) in a single exact
    countDistinct pass + schema inspection.

    Exact (not approx) distinct counts gate *semantics* (binary vs
    sparse — SURVEY A3), so we pay the one aggregate; at 100 TB this
    runs once per corpus build and the pass is map-side-combined.
    """
    text_columns = set(text_columns)
    cands = candidate_columns(df, text_columns, key_column)
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    # countDistinct requires orderable types: structs/maps/arrays are
    # handled (geo struct) or rejected via the strict gate below
    countable = [
        c
        for c in cands
        if not isinstance(dtypes[c], (T.StructType, T.MapType, T.ArrayType))
    ]
    counts_row = (
        df.agg(*[F.countDistinct(F.col(c)).alias(c) for c in countable]).collect()[0]
        if countable
        else {}
    )
    counts = dict(counts_row.asDict()) if countable else {}

    out: dict[str, str] = {}
    for c in cands:
        dt = dtypes[c]
        if _is_geo_struct(dt):
            out[c] = GEO
        elif isinstance(dt, (T.StructType, T.MapType, T.ArrayType)):
            if strict:
                raise ValueError(f"Unsupported modality dtype for column {c!r}: {dt}")
            continue
        elif counts.get(c) == 2:
            out[c] = BINARY  # nunique()==2 regardless of dtype (src/app.py:44)
        elif counts.get(c, 0) <= 1:
            continue  # constant / all-null: not a usable modality (src/app.py:148)
        elif isinstance(dt, T.StringType):
            out[c] = SPARSE
        elif isinstance(dt, _NUMERIC_TYPES):
            out[c] = DENSE
        elif strict:
            raise ValueError(f"Unsupported modality dtype for column {c!r}: {dt}")
    return out


def with_row_id(df: DataFrame, order_by: list[str] | None = None, name: str = "row_id") -> DataFrame:
    """Explicit key column replacing positional identity (§1.4).

    With ``order_by``: a deterministic dense row_number (requires a
    total ordering — only for test-scale fixtures; it is a single
    global sort). Without: zipWithIndex-style stable id derived from
    partition offsets — O(1) shuffle-free, safe at 100 TB, stable for
    a fixed input layout.
    """
    if order_by:
        from pyspark.sql.window import Window

        w = Window.orderBy(*order_by)
        return df.withColumn(name, F.row_number().over(w).cast("long") - 1)
    # monotonically_increasing_id is stable within a materialized layout;
    # persist immediately after (SURVEY §1.4) if ids must survive re-reads.
    return df.withColumn(name, F.monotonically_increasing_id())
