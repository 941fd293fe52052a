"""Dataset-preprocessing operators P1-P11 (SURVEY §2.2) as
DataFrame→DataFrame functions — the reference's loader cleanup
(`src/load_flipkart.py`, `src/load_restaurants.py`) re-expressed as
Catalyst-optimizable expressions (predicates and projections all push
down to the scan)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fill_na(df: DataFrame, values: dict[str, object]) -> DataFrame:
    """P1 (src/load_flipkart.py:19-20)."""
    return df.na.fill(values)


def split_category_tree(
    df: DataFrame, column: str, sep: str = ">>", n: int = 3, prefix: str = "category_"
) -> DataFrame:
    """P2+P4 (src/load_flipkart.py:21-25): split a 'a >> b >> c' tree
    into the first n trimmed levels as new columns. ``sep`` is a
    LITERAL (quoted for the regex engine), matching pandas
    str.split's literal default."""
    parts = F.split(F.col(column), "\\Q" + sep + "\\E")
    return df.withColumns(
        {f"{prefix}{i + 1}": F.trim(parts.getItem(i)) for i in range(n)}
    )


def strip_chars(df: DataFrame, column: str, pattern: str = r'[\["\]]') -> DataFrame:
    """P3 (src/load_flipkart.py:22)."""
    return df.withColumn(column, F.regexp_replace(F.col(column), pattern, ""))


def trim_strings(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """P5 (src/load_flipkart.py:24) — trim the given string columns;
    None (not an empty list) means all string columns."""
    if columns is None:
        columns = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    return df.withColumns({c: F.trim(F.col(c)) for c in columns})


def reformat_specs(df: DataFrame, column: str, out: str | None = None) -> DataFrame:
    """P6 (src/load_flipkart.py:12-17,26): '{"k"=>"v", ...}' key/value
    blobs → 'k: v; k2: v2;' — pure SQL higher-order functions, no UDF.

    The reference regex-extracts the quoted tokens (alternating keys
    and values) then joins them as 'k:' / 'v;' pairs.
    """
    toks = F.expr(f"regexp_extract_all({column}, '=>\"(.*?)\"', 1)")
    # pandas source alternates tokens: even index → key, odd → value
    kv = F.transform(
        toks,
        lambda t, i: F.when(i % 2 == 0, F.concat(t, F.lit(":"))).otherwise(
            F.concat(t, F.lit(";"))
        ),
    )
    return df.withColumn(out or column, F.array_join(kv, " "))


def drop_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """P7 (src/load_flipkart.py:28-38)."""
    return df.drop(*columns)


def drop_na_rows(df: DataFrame, subset: list[str]) -> DataFrame:
    """P8 (src/load_restaurants.py:11)."""
    return df.na.drop(subset=subset)


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """P9 (src/load_restaurants.py:12-13)."""
    return df.filter(predicate)


def drop_rows_by_id(df: DataFrame, ids: list[int], key: str = "row_id") -> DataFrame:
    """P10 (src/load_restaurants.py:14) — needs the explicit key
    column (§1.4); positional drop does not exist at scale."""
    return df.filter(~F.col(key).isin(ids))


def zip_geo(df: DataFrame, lon: str, lat: str, out: str = "location") -> DataFrame:
    """P11 (src/load_restaurants.py:15): two float columns → the
    canonical geo struct<lon,lat>."""
    return df.withColumn(
        out,
        F.when(
            F.col(lon).isNotNull() & F.col(lat).isNotNull(),
            F.struct(F.col(lon).cast("double").alias("lon"), F.col(lat).cast("double").alias("lat")),
        ),
    )
