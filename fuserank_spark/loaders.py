"""Dataset loaders mirroring the reference's two bundled corpora
(`src/load_restaurants.py`, `src/load_flipkart.py`) — same cleaning,
same schemas, expressed through prep.py/transforms.py. A user of the
reference points these at the same CSVs and gets the same engine
surface on Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prep
from .schema import DatasetSchema, infer_aux_schema
from .sources import read_csv
from .transforms import FittedTransform, best_transform, transformed_view


@dataclass
class LoadedDataset:
    """The DataLoader bundle (src/load.py:9-19): frame + schemas +
    transformed view."""

    df: DataFrame
    schema: DatasetSchema
    transforms: dict[str, FittedTransform] = field(default_factory=dict)

    @property
    def transformed_df(self) -> DataFrame:
        return transformed_view(self.df, self.transforms)


def _strip_bom(df: DataFrame) -> DataFrame:
    first = df.columns[0]
    if first.startswith("﻿"):
        df = df.withColumnRenamed(first, first.lstrip("﻿"))
    return df


def load_restaurants(
    spark: SparkSession, csv_path: str, fit_transforms: bool = True
) -> LoadedDataset:
    """Restaurants corpus (src/load_restaurants.py:10-42): Cuisines
    non-null, Latitude≠0, India only, geo struct from lon/lat, 11
    columns dropped; text schema {name:0.4, cuisines:0.6}; Price
    range → log, others KS-selected.

    The reference drops two mislabeled rows by pandas positional
    index (P10); position is not a stable key in a distributed read,
    so the rebuild keys them by Restaurant ID before the id column is
    dropped (documented deviation; same two rows).
    """
    df = _strip_bom(read_csv(spark, csv_path))
    df = prep.drop_na_rows(df, ["Cuisines"])
    df = prep.filter_rows(df, (F.col("Latitude") != 0) & (F.col("Country Code") == 1))
    # pandas index 8620, 3513 → Restaurant IDs 18489509 ("InnerChef",
    # mislabeled city) and 18419884 ("Test Restaruants for Medio")
    df = df.filter(~F.col("Restaurant ID").cast("long").isin([18489509, 18419884]))
    # stable key derived from the SOURCE id (§1.4) before it is
    # dropped — never a partition-layout-dependent generated id; the
    # embedding cache joins on this across sessions
    df = df.withColumn("row_id", F.col("Restaurant ID").cast("long"))
    df = prep.zip_geo(df, "Longitude", "Latitude", out="Location")
    df = prep.drop_columns(
        df,
        [
            "Locality",
            "Locality Verbose",
            "Address",
            "Country Code",
            "Restaurant ID",
            "Is delivering now",
            "Switch to order menu",
            "Currency",
            "Rating color",
            "Latitude",
            "Longitude",
        ],
    )

    text_schema = {"Restaurant Name": 0.4, "Cuisines": 0.6}
    transforms: dict[str, FittedTransform] = {}
    if fit_transforms:
        transforms["Price range"] = FittedTransform("log")  # fixed (load_restaurants.py:38)
        for c in ("Average Cost for two", "Votes", "Aggregate rating"):
            ft = best_transform(df, c)
            if ft is not None:
                transforms[c] = ft
    aux = infer_aux_schema(df, text_columns=set(text_schema))
    return LoadedDataset(
        df,
        DatasetSchema(
            text_encoding_schema=text_schema,
            aux_encoding_schema=aux,
            transformation_schema={c: t.name for c, t in transforms.items()},
        ),
        transforms,
    )


def load_flipkart(
    spark: SparkSession, csv_path: str, fit_transforms: bool = True
) -> LoadedDataset:
    """Flipkart corpus (src/load_flipkart.py:11-49): fillna on
    brand/description, category-tree split (top 3), specs reformat,
    8 columns dropped; text schema {name:.4, description:.3,
    specs:.3}; log transforms on both prices."""
    df = _strip_bom(read_csv(spark, csv_path))
    df = prep.fill_na(df, {"brand": "n/a", "description": "n/a"})
    df = prep.strip_chars(df, "product_category_tree")
    df = prep.split_category_tree(df, "product_category_tree", prefix="product_category_")
    df = prep.reformat_specs(df, "product_specifications")
    # stable content-derived key from the source uniq_id (§1.4)
    df = df.withColumn("row_id", F.xxhash64(F.col("uniq_id")))
    df = prep.drop_columns(
        df,
        [
            "pid",
            "uniq_id",
            "image",
            "product_rating",
            "overall_rating",
            "product_category_tree",
            "product_url",
            "crawl_timestamp",
        ],
    )

    text_schema = {"product_name": 0.4, "description": 0.3, "product_specifications": 0.3}
    transforms = (
        {
            "retail_price": FittedTransform("log"),
            "discounted_price": FittedTransform("log"),
        }
        if fit_transforms
        else {}
    )
    aux = infer_aux_schema(df, text_columns=set(text_schema), strict=False)
    return LoadedDataset(
        df,
        DatasetSchema(
            text_encoding_schema=text_schema,
            aux_encoding_schema=aux,
            transformation_schema={c: t.name for c, t in transforms.items()},
        ),
        transforms,
    )
