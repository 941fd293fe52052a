"""SparkSession factory tuned for the FuseRank-Spark engine.

Local testing runs ``local[N]``; the same config posture is what we
would ship to a 1000-executor cluster: AQE on (skew joins, dynamic
coalescing), Arrow on (every pandas-UDF stage), explicit shuffle
partitioning, zstd parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def get_spark(
    app_name: str = "fuserank_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    Defaults come from env so the driver's bench/test harness can
    steer parallelism: ``SPARK_GRAFT_CPUS`` → ``local[N]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("FUSERANK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow: every pandas-UDF boundary (embedding, fourier batch path)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime re-planning — skew joins, partition coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # parquet posture: zstd + sane split size for wide vector rows
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # timestamps deterministic regardless of host TZ
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("FUSERANK_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/fuserank_warehouse")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def local_frame(spark: SparkSession, rows: list, schema: str):
    """Driver-side small-batch DataFrame via pandas→Arrow, NOT
    ``createDataFrame(list)`` (CLAUDE.md r11): a plain-list
    createDataFrame pickles into a default-parallelism Python RDD, so
    EVERY downstream collect/broadcast of the frame schedules a
    32-task Python-worker stage (~0.6 s measured for 32 rows). The
    pandas path ships the batch through Arrow into a JVM
    LocalRelation (~0.02 s to collect); in a session without
    arrow.pyspark.enabled it degrades to the classic conversion with
    identical semantics. ``schema`` is the explicit DDL string —
    never inference (ADVICE r11).

    ``rows`` is a list of tuples aligned with the schema's field
    order (the same shape ``createDataFrame(list, schema)`` takes).

    Contracts (ADVICE r12): ``schema`` must be SPACE-separated DDL
    ('name type, ...') — the colon form ('a:int') is rejected rather
    than silently mis-parsed; each row must carry exactly one value
    per field (createDataFrame(list) would error, the pandas path
    would silently drop extras). The pandas→Arrow conversion coerces
    float NaN to null — a call site with a legitimate NaN payload
    must not use this helper."""
    import pandas as pd

    names = []
    depth = 0
    field = ""
    for ch in schema + ",":
        if ch == "," and depth == 0:
            name = field.strip().split()[0].strip("`")
            if ":" in name:
                raise ValueError(
                    f"local_frame schema must be space-separated DDL "
                    f"('name type, ...'); got colon-form field {field.strip()!r}"
                )
            names.append(name)
            field = ""
            continue
        depth += ch in "<("
        depth -= ch in ">)"
        field += ch
    if rows and len(rows[0]) != len(names):
        raise ValueError(
            f"local_frame row width {len(rows[0])} != schema field "
            f"count {len(names)} ({names})"
        )
    data = {n: [r[i] for r in rows] for i, n in enumerate(names)}
    return spark.createDataFrame(pd.DataFrame(data, columns=names), schema=schema)


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read the driver testdata parquet tables as a dict of DataFrames."""
    if "events" in (names or ("events",)):
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS);
        # Spark needs the legacy read (as long) + explicit ns→µs convert
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    all_names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for n in all_names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        if n == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        out[n] = df
    return out
