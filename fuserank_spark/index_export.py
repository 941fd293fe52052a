"""Index export S4/S5 (reference: driver-RAM FAISS IndexFlatIP,
`src/app.py:171-172`; Milvus sink `src/eval/milvus_experiment.py:28-70`).

Spark owns batch embedding + encoding; online ANN serving is an
external system. This stage exports the encoded corpus as
*per-partition index shards* via mapInPandas — each task builds one
shard from its partition and writes it plus the (shard_id, local_pos)
→ row_id map, removing the reference's single-node matrix limit:
shard count = partition count, each bounded by
``spark.sql.files.maxPartitionBytes``.

FAISS is not installed in this container; the shard payload falls
back to a dense numpy .npz with identical metadata, keeping the
sharding/manifest machinery fully exercised (the faiss branch is the
one-line difference).

The Milvus-style sink (S5) is ``foreachPartition`` with bounded
batches; here it exports parquet chunks an external indexer consumes.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:
    import faiss  # noqa: F401

    HAVE_FAISS = True
except ImportError:
    HAVE_FAISS = False

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("local_pos", T.LongType()),
        T.StructField("row_id", T.LongType()),
    ]
)


def export_shards(
    encoded: DataFrame,
    out_dir: str,
    vector_col: str = "vector",
    key_col: str = "row_id",
    num_shards: int | None = None,
) -> DataFrame:
    """Build one index shard per partition; return the manifest
    DataFrame mapping (shard_id, local_pos) → row_id (gotcha #3:
    positional FAISS ids must resolve to the explicit key).

    The manifest is the returned DataFrame — persist it next to the
    shards (`manifest.parquet`) so serving nodes resolve ids without
    touching Spark.
    """
    os.makedirs(out_dir, exist_ok=True)
    df = encoded.select(key_col, vector_col)
    if num_shards is not None:
        df = df.repartition(num_shards, F.col(key_col))

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        # executor-side: out_dir must be on a shared filesystem
        # (NFS/object-store mount) in cluster mode — each task writes
        # its own shard file there; local mode shares the driver path
        os.makedirs(out_dir, exist_ok=True)
        shard_id = TaskContext.get().partitionId()
        keys: list[int] = []
        mats: list[np.ndarray] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys.extend(int(k) for k in pdf[key_col])
            mats.append(np.array(list(pdf[vector_col]), dtype="float32"))
        if not keys:
            return
        matrix = np.vstack(mats)
        path = os.path.join(out_dir, f"shard_{shard_id:05d}")
        if HAVE_FAISS:  # pragma: no cover - faiss not in this container
            import faiss

            index = faiss.IndexFlatIP(matrix.shape[1])
            index.add(matrix)
            faiss.write_index(index, path + ".faiss")
        else:
            np.savez_compressed(path + ".npz", vectors=matrix)
        yield pd.DataFrame(
            {
                "shard_id": shard_id,
                "local_pos": np.arange(len(keys), dtype="int64"),
                "row_id": np.array(keys, dtype="int64"),
            }
        )

    return df.mapInPandas(_build, schema=MANIFEST_SCHEMA)


def search_shards(out_dir: str, query: np.ndarray, k: int = 10) -> list[tuple[int, int, float]]:
    """Driver-side shard search (serving-path smoke twin): scan every
    shard, merge top-k. Returns [(shard_id, local_pos, score)]."""
    results: list[tuple[int, int, float]] = []
    q = np.asarray(query, dtype="float32")
    for fname in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, fname)
        if fname.endswith(".faiss"):  # pragma: no cover
            import faiss

            index = faiss.read_index(path)
            dist, idx = index.search(q.reshape(1, -1), k)
            sid = int(fname.split("_")[1].split(".")[0])
            results.extend((sid, int(i), float(d)) for d, i in zip(dist[0], idx[0]) if i >= 0)
        elif fname.endswith(".npz"):
            mat = np.load(path)["vectors"]
            scores = mat @ q
            top = np.argsort(-scores)[:k]
            sid = int(fname.split("_")[1].split(".")[0])
            results.extend((sid, int(i), float(scores[i])) for i in top)
    results.sort(key=lambda t: -t[2])
    return results[:k]


def export_for_external_indexer(
    encoded: DataFrame,
    out_dir: str,
    vector_col: str = "vector",
    key_col: str = "row_id",
    max_rows_per_file: int = 100_000,
) -> None:
    """S5 posture: bounded-size parquet chunks for an external vector
    DB's bulk loader (the Milvus insert-chunk analog,
    milvus_experiment.py:64-68) — maxRecordsPerFile bounds each file
    like the reference's 256 MiB insert chunks."""
    (
        encoded.select(key_col, vector_col)
        .write.option("maxRecordsPerFile", max_rows_per_file)
        .mode("overwrite")
        .parquet(out_dir)
    )
