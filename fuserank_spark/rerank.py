"""Windowed re-ranking W1-W8 (reference ``encode_result``,
`src/encode.py:191-267`): relevance += rank-normalized modality
score · weight, over the top-k result set.

Semantics preserved exactly (SURVEY §2.5):
  * pandas average-ties rank emulated as
    rank() + (tie_count − 1)/2 over a window (gotcha #1);
  * normalization 2·(r−1)/(n−1) − 1 divides by the FULL result size
    n (pandas len(result)), not the non-null count;
  * nulls rank between matches and mismatches for binary/sparse
    (src/encode.py:193-194) via explicit 3-level keys replacing the
    reference's char-sentinel hack — but mismatches keep their
    raw-value ordering (the reference ranks un-replaced values).
    DELIBERATE DEVIATION (SURVEY gotcha #2b): under the reference's
    sentinels a mismatch value starting with one of ``!"#$%&`` (below
    ``"'"``) would interleave between match and null; the 3-level key
    always ranks null above every mismatch. Identical on any data
    whose values start with letters/digits;
  * dense lowest/highest keeps pandas' NaN-rank→NaN behavior: null
    rows contribute a NULL delta, sinking them in the final sort.

At scale the window partition key is the query id of a *batch* of
queries — every window below partitions by it.
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import fourier
from . import schema as S
from .encode import CorpusStats
from .transforms import FittedTransform

_FLOAT_MAX = sys.float_info.max
_FLOAT_MIN = sys.float_info.min


def _rank_norm(
    keys: list[Column], ascending: bool, partition: list[Column], null_is_nan: bool = False
) -> Column:
    """W1: average-ties rank of the composite key, normalized to
    [−1,1]. With ``null_is_nan``, rows whose first key is NULL get a
    NULL result and are excluded from ranks (pandas na_option='keep'),
    but still count in n (len(result))."""
    first = keys[0]
    order = [
        (k.asc_nulls_last() if ascending else k.desc_nulls_last()) for k in keys
    ]
    w = Window.partitionBy(*partition).orderBy(*order)
    wt = Window.partitionBy(*partition, *keys)
    wn = Window.partitionBy(*partition)
    avg_rank = F.rank().over(w) + (F.count(F.lit(1)).over(wt) - 1) / 2.0
    n = F.count(F.lit(1)).over(wn)
    norm = F.when(n > 1, 2.0 * (avg_rank - 1.0) / (n - 1.0) - 1.0).otherwise(F.lit(0.0))
    if null_is_nan:
        return F.when(first.isNull(), F.lit(None).cast("double")).otherwise(norm)
    return norm


def _dense_delta(col: Column, value, cs, transform: FittedTransform | None, part) -> Column | None:
    """W2-W4 (src/encode.py:209-231)."""
    if len(value) < 3:
        v = value[0] if len(value) >= 1 else None
        negated = bool(value[1]) if len(value) == 2 else False
        if v is None:
            return None
        tr = transform or FittedTransform("identity")
        tv = float(np.asarray(tr.apply_np(float(v))))
        if tv == cs.max:  # highest requested → ascending rank (W2)
            return _rank_norm([col], True, part, null_is_nan=True)
        if tv == cs.min:  # lowest requested → descending rank
            return _rank_norm([col], False, part, null_is_nan=True)
        # centroid (W3): |v − col|, nulls → +max, rank desc (asc=negated)
        key = F.coalesce(F.abs(F.lit(tv) - col.cast("double")), F.lit(_FLOAT_MAX))
        return _rank_norm([key], negated, part)
    lo, hi, negated = value
    # interval (W4): inside → float_min sentinel, nulls → float_max.
    # Bounds arrive raw; the result column carries transformed values
    # (src/encode.py:207 comment), so transform the bounds the same
    # way the query compiler does — swapping when a decreasing
    # transform flips them
    tr = transform or FittedTransform("identity")
    tlo = float(np.asarray(tr.apply_np(float(lo))))
    thi = float(np.asarray(tr.apply_np(float(hi))))
    if tlo > thi:
        tlo, thi = thi, tlo
    key = F.when(
        col.cast("double").between(F.lit(tlo), F.lit(thi)), F.lit(_FLOAT_MIN)
    ).otherwise(F.coalesce(col.cast("double"), F.lit(_FLOAT_MAX)))
    return _rank_norm([key], bool(negated), part)


def _geo_delta(col: Column, value, part) -> Column:
    """W5 (src/encode.py:232-246): score products against the
    scale-and-shifted query point, farthest point computed WITHIN the
    result set (window max of (distance, point)), then rank."""
    lon, lat, negated = value
    qcart = fourier.geo_to_cartesian((lon, lat))
    plon = F.radians(col.getField("lon"))
    plat = F.radians(col.getField("lat"))
    cart = [
        F.cos(plat) * F.cos(plon),
        F.cos(plat) * F.sin(plon),
        F.sin(plat),
    ]
    qlon, qlat = np.radians([lon, lat])
    hav = (
        F.pow(F.sin((plat - F.lit(qlat)) / 2), 2)
        + F.cos(F.lit(qlat)) * F.cos(plat) * F.pow(F.sin((plon - F.lit(qlon)) / 2), 2)
    )
    dist = 2 * 6371.0 * F.asin(F.sqrt(hav))
    w = Window.partitionBy(*part)
    far = F.max(
        F.struct(
            dist.alias("d"), col.getField("lon").alias("lon"), col.getField("lat").alias("lat")
        )
    ).over(w)
    flon, flat = F.radians(far.getField("lon")), F.radians(far.getField("lat"))
    far_cart = [F.cos(flat) * F.cos(flon), F.cos(flat) * F.sin(flon), F.sin(flat)]
    # scale_and_shift (src/encode.py:347-354) with the per-window farthest
    dot_min = sum(F.lit(float(q)) * fc for q, fc in zip(qcart, far_cart))
    scale = 2.0 / (1.0 - dot_min)
    # product score = scale·(q·p) + (1 − scale·|q|²); |q|=1 on the unit sphere
    qdotp = sum(F.lit(float(q)) * pc for q, pc in zip(qcart, cart))
    score = scale * qdotp + (1.0 - scale)
    score = F.when(col.isNull(), 1.0 - scale).otherwise(score)
    # negation ONLY flips the rank direction (src/encode.py:234); the
    # score itself is never negated in the re-rank path
    return _rank_norm([score], not negated, part)


def _binary_delta(col: Column, value, part) -> Column:
    """W6 (src/encode.py:247-254): match > null > mismatch via a
    3-level key mirroring the reference's sentinel ordering (match =
    smallest " ", null = next "'", mismatch = raw value); rank
    descending maps smallest → +1."""
    level = (
        F.when(col == F.lit(value), 0).when(col.isNull(), 1).otherwise(2)
    )
    return _rank_norm([level, col], False, part)


def _sparse_delta(col: Column, value, part) -> Column:
    """W7 (src/encode.py:255-264): selected > null > others, guarded
    by "any selected value present in the result set"."""
    selection, negated = value
    sel = list(selection)
    level = F.when(col.isin(sel), 0).when(col.isNull(), 1).otherwise(2)
    # all selected values collapse to one sentinel (" ") in the
    # reference → they tie; only mismatches rank by raw value
    raw = F.when(level == 2, col)
    delta = _rank_norm([level, raw], bool(negated), part)
    guard = F.max(F.when(col.isin(sel), 1).otherwise(0)).over(
        Window.partitionBy(*part)
    )
    return F.when(guard == 1, delta).otherwise(F.lit(0.0))


def rerank(
    result: DataFrame,
    aux_data: dict[str, tuple],
    aux_encoding_schema: dict[str, str],
    stats: CorpusStats,
    transformation_schema: dict[str, FittedTransform] | None = None,
    relevance_col: str = "relevance",
    query_id_col: str | None = None,
) -> DataFrame:
    """W8 (src/encode.py:267): relevance += Σ modality rank · weight.

    ``result`` must carry ``relevance`` plus the (transformed) aux
    columns; pass ``query_id_col`` when re-ranking a batch of queries
    in one plan.
    """
    if relevance_col not in result.columns:
        raise ValueError(f"result must contain the {relevance_col!r} column")
    transformation_schema = transformation_schema or {}
    part = [F.col(query_id_col)] if query_id_col else [F.lit(1)]

    total = F.col(relevance_col)
    for column, (value, weight) in aux_data.items():
        if value in (None, []) or column not in aux_encoding_schema:
            continue
        kind = aux_encoding_schema[column]
        col = F.col(column)
        if kind == S.DENSE:
            delta = _dense_delta(col, value, stats.columns[column],
                                 transformation_schema.get(column), part)
        elif kind == S.GEO:
            delta = _geo_delta(col, value, part)
        elif kind == S.BINARY:
            delta = _binary_delta(col, value, part)
        elif kind == S.SPARSE:
            delta = _sparse_delta(col, value, part)
        else:
            continue
        if delta is not None:
            total = total + delta * F.lit(float(weight))
    return result.withColumn(relevance_col, total)
