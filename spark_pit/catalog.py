"""Table resolution: Iceberg when available, parquet otherwise.

The north rule targets Iceberg snapshots of the image+caption table; this
sandbox ships no Iceberg runtime jar (verified: /opt/spark/jars has none,
and installs are not permitted), so the engine degrades to plain parquet
with the same call shape. On a cluster with
``org.apache.iceberg:iceberg-spark-runtime`` on the classpath and a catalog
configured, the same reader resolves `catalog.db.table` with full snapshot
semantics (`VERSION AS OF` / `snapshot-id`), and ``current_snapshot_id``
feeds the checkpoint manifest's lineage field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(
    spark: SparkSession,
    ref: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read `ref` as an Iceberg table name when the runtime is present and
    `ref` is not a path; otherwise as a parquet path (snapshot pinning is an
    Iceberg-only feature — requesting it without the runtime is an error,
    not a silent downgrade)."""
    is_path = "/" in ref or ref.endswith(".parquet")
    if not is_path and iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(ref)
    if snapshot_id is not None:
        raise ValueError(
            "snapshot_id requires the Iceberg runtime; reading plain parquet"
        )
    return spark.read.parquet(ref)


def current_snapshot_id(spark: SparkSession, ref: str) -> str:
    """Lineage tag for the checkpoint manifest: the Iceberg snapshot id when
    available, else the path itself (parquet has no snapshot concept)."""
    if "/" not in ref and iceberg_available(spark):
        row = spark.sql(f"SELECT snapshot_id FROM {ref}.snapshots ORDER BY committed_at DESC LIMIT 1").first()
        return str(row[0]) if row else ref
    return ref
