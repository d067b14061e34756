"""Table catalog — the quad-store seam (SURVEY.md D5, O5–O7).

Twine talks to an external SPARQL 1.1 store via libsparqlclient
(``libtwine/sparql.c`` `[U]`, writes serialized through ``writerd``);
the north_star replaces that with partitioned **Iceberg** tables.  The
sandbox has no Iceberg runtime jars (verified), so this module is the
seam: an identical logical layout on plain parquet —

* every table lives under ``<warehouse>/<name>/``;
* doc-keyed tables carry a ``bucket`` column
  ``pmod(xxhash64(doc_id), n_buckets)`` and are directory-partitioned by
  it — the exact emulation of an Iceberg ``bucket(N, doc_id)`` partition
  spec;
* per-bucket overwrite uses dynamic partition-overwrite mode, giving the
  same idempotent graph-replace semantics as Twine's ``sparql-put``
  (replace-named-graph) / Iceberg ``overwritePartitions``.

On a real cluster, swap ``ParquetCatalog`` for an Iceberg catalog and
the pipeline code is unchanged (same (name, bucket) API).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def with_bucket(df: DataFrame, n_buckets: int, key: str = "doc_id") -> DataFrame:
    """Bucket id = ``pmod(xxhash64(CAST(key AS STRING)), n_buckets)``.

    The key is hashed through its canonical STRING form on purpose: the
    raw ``documents`` table carries an int64 ``doc_id`` while every
    downstream stage carries the string-cast ``doc_id`` (span synthesis
    casts it), and ``xxhash64(42L) != xxhash64('42')``.  Per-bucket
    resume overwrites whatever output partitions the pending input
    buckets produce — input and output rows for the same document MUST
    land in the same bucket id or a resume's dynamic partition
    overwrite replaces partitions holding completed buckets' rows
    (data loss; see tests/test_checkpoint.py kill-tests per stage).
    """
    return df.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).cast("int"),
    )


@dataclass
class ParquetCatalog:
    root: str
    n_buckets: int = DEFAULT_BUCKETS

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def write_bucketed(
        self, df: DataFrame, name: str, partition_cols: list[str] | None = None
    ) -> None:
        """Overwrite only the partitions present in ``df`` (dynamic
        partition overwrite) — the sparql-put / MERGE analogue.
        ``partition_cols`` defaults to ["bucket"]; streaming appends add
        a batch key so batches never clobber each other."""
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.write.mode("overwrite")
                .partitionBy(*(partition_cols or ["bucket"]))
                .parquet(self.path(name))
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self.path(name))

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self.path(name))
