"""Driver-side query compiler (SURVEY §1.3, §2.8-2.9 query halves:
C2, C4, G4, N5-N7).

Compiles the reference's query IR — ``query_text`` + ``aux_data:
{column: (value, weight)}`` (src/encode.py:107-189) — into:

  1. a fused query vector aligned with the corpus VectorLayout
     (soft-filter arm: one inner-product top-k does retrieval +
     filtering), and
  2. an equivalent *hard* predicate (Spark Column + ANSI SQL string)
     for the exact/oracle arm — the differential-eval pattern of
     `src/eval/milvus_experiment.py:72-89`.

All of this is scalar numpy at compile time: no data access except
precomputed CorpusStats (SURVEY stance #5).

Value shapes per kind (src/app.py:196-295):
  sparse  (selection: list, negated: bool)
  binary  bare value
  geo     (lon, lat, negated)
  dense   (extreme,) | (centroid, negated) | (lo, hi, negated)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from . import fourier
from . import schema as S
from .encode import CorpusStats, VectorLayout
from .transforms import FittedTransform


@dataclass
class CompiledQuery:
    vector: np.ndarray
    layout: VectorLayout
    predicate: Column | None  # hard-filter twin (None = no filterable modality)
    predicate_sql: str | None
    aux_data: dict
    query_text: str


def _sql_quote(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return str(v)


def _sparse_segment(cs, value) -> np.ndarray:
    """C2 (src/encode.py:135-143): ±1 over the sorted vocab."""
    if value is None:
        return np.zeros(len(cs.vocab))
    selection, negated = value
    seg = np.array([1.0 if v in selection else -1.0 for v in cs.vocab])
    return -seg if negated else seg


def _binary_segment(cs, value) -> np.ndarray:
    """C4 (src/encode.py:144-149), sorted-order canonicalization."""
    if value is None:
        return np.zeros(1)
    return np.array([1.0 if value == cs.values[1] else -1.0])


def _geo_segment(cs, value) -> np.ndarray:
    """G4 (src/encode.py:150-161): farthest point served from the
    precomputed deterministic corpus sample instead of a per-query
    full scan (stance #5)."""
    if value is None:
        return np.zeros(5)
    lon, lat, negated = value
    if not cs.geo_sample:
        raise ValueError("geo stats missing: compute_stats must sample geo column")
    pts = np.array(cs.geo_sample, dtype="float64")
    d = fourier.haversine_km(pts, (lon, lat))
    far = tuple(pts[int(np.nanargmax(d))])
    seg = fourier.geo_encoding((lon, lat), far)
    if negated:
        seg = -seg
    return np.append(seg, 1.0)  # null-indicator dim (src/encode.py:161)


def _dense_segment(cs, value, num_harmonics, interval_epsilon, range_epsilon, transform) -> np.ndarray:
    """N5/N6 (src/encode.py:162-184): [centroid(3) | interval(2K+1) |
    null-ind] = 2K+5 dims matching the product block layout."""
    seg = np.zeros(2 * num_harmonics + 4)
    tr = transform or FittedTransform("identity")

    def scale(v: float) -> float:
        return float(fourier.min_max_scale(float(tr.apply_np(v)), cs.min, cs.max))

    if value is not None:
        if len(value) < 3:  # extreme or centroid → half-circle encoding
            if len(value) == 2:
                v, negated = value
            else:
                v, negated = value[0], False
            if v is not None:
                seg[:3] = fourier.centroid_encoding(scale(v))
                if negated:
                    seg[:3] = -seg[:3]
        else:  # interval filter → integral encoding
            lo, hi, negated = value
            lo_s = (1.0 - range_epsilon) * (scale(lo) - interval_epsilon)
            hi_s = (1.0 - range_epsilon) * (scale(hi) + interval_epsilon)
            if lo_s > hi_s:
                # a decreasing transform (e.g. inverse) flips the
                # interval in transformed space — reorder so the
                # integral bounds stay valid
                lo_s, hi_s = hi_s, lo_s
            seg[3:] = fourier.interval_encoding(lo_s, hi_s, num_harmonics)
            if negated:
                seg[3:] = -seg[3:]
    return np.append(seg, 1.0)


def _hard_predicates(column, kind, value, cs, transform) -> tuple[Column, str] | None:
    """The exact-SQL twin per modality (oracle arm semantics,
    src/eval/milvus_experiment.py:72-89, extended to every query
    shape the UI can produce)."""
    c = F.col(column)
    if value is None:
        return None
    if kind == S.SPARSE:
        selection, negated = value
        if not selection:
            return None
        col_expr = c.isin(list(selection))
        sql = f"{column} IN ({', '.join(_sql_quote(v) for v in selection)})"
        if negated:
            return (~col_expr) | c.isNull(), f"({column} NOT IN ({', '.join(_sql_quote(v) for v in selection)}) OR {column} IS NULL)"
        return col_expr, sql
    if kind == S.BINARY:
        return c == F.lit(value), f"{column} = {_sql_quote(value)}"
    if kind == S.DENSE:
        if len(value) == 3:
            lo, hi, negated = value
            expr = c.between(F.lit(lo), F.lit(hi))
            sql = f"{column} BETWEEN {lo} AND {hi}"
            if negated:
                return ~expr, f"NOT ({sql})"
            return expr, sql
        return None  # extremes/centroid rank, they don't hard-filter
    if kind == S.GEO:
        return None  # oracle arm doesn't support geo (milvus_experiment.py:51-52)
    return None


def compile_query(
    query_text: str,
    aux_data: dict[str, tuple],
    aux_encoding_schema: dict[str, str],
    stats: CorpusStats,
    layout: VectorLayout,
    text_embedder=None,
    num_harmonics: int = 200,
    interval_epsilon: float = 0.01,
    range_epsilon: float = 0.01,
    transformation_schema: dict[str, FittedTransform] | None = None,
) -> CompiledQuery:
    """Compile query IR → (fused vector, hard predicate).

    Segment order follows the VectorLayout the corpus was encoded
    with; each aux segment is multiplied by its weight
    (src/encode.py:187) — weights live only on the query side.
    """
    from .embed import embed_query

    transformation_schema = transformation_schema or {}

    text_dim = dict(layout.segments).get("__text__")
    if text_dim is not None and text_dim <= 0:
        raise ValueError(
            "layout has a text segment of unknown dim — call "
            "encode.record_text_dim(layout, emb_dim) after encode_products"
        )
    if text_dim:
        tvec = embed_query(query_text, dim=text_dim, embedder=text_embedder)
    else:
        tvec = np.zeros(0)

    segs: list[np.ndarray] = [tvec]
    preds: list[tuple[Column, str]] = []
    for column, _dim in layout.segments:
        if column == "__text__":
            continue
        kind = aux_encoding_schema[column]
        cs = stats.columns[column]
        value, weight = aux_data.get(column, (None, 1.0))
        if kind == S.SPARSE:
            seg = _sparse_segment(cs, value)
        elif kind == S.BINARY:
            seg = _binary_segment(cs, value)
        elif kind == S.GEO:
            seg = _geo_segment(cs, value)
        elif kind == S.DENSE:
            seg = _dense_segment(
                cs, value, num_harmonics, interval_epsilon, range_epsilon,
                transformation_schema.get(column),
            )
        else:
            continue
        segs.append(seg * float(weight))
        p = _hard_predicates(column, kind, value, cs, transformation_schema.get(column))
        if p is not None:
            preds.append(p)

    vector = np.concatenate(segs)
    predicate = None
    predicate_sql = None
    if preds:
        predicate = preds[0][0]
        for p, _ in preds[1:]:
            predicate = predicate & p
        predicate_sql = " AND ".join(s for _, s in preds)
    return CompiledQuery(
        vector=vector,
        layout=layout,
        predicate=predicate,
        predicate_sql=predicate_sql,
        aux_data=aux_data,
        query_text=query_text,
    )
