"""Table layer: parquet-backed catalog with an Iceberg-ready surface.

The reference persists to SurrealDB tables; our design target is
Iceberg (partition pruning, snapshot-checkpointed resume, atomic
commits).  This container ships no Iceberg runtime jar, so the same
interface is implemented over plain parquet directories:

* a table = a directory under the catalog root;
* commit marker = Spark's ``_SUCCESS`` file (atomicity: readers treat
  a directory without ``_SUCCESS`` as absent, so a killed write is
  invisible — the resume semantics Iceberg snapshots would give us);
* partition columns = physical ``col=value`` subdirectories (same
  pruning behavior as Iceberg identity/bucket partitioning).

On a real cluster, swap ``write``/``read`` for
``df.writeTo(f"cat.{name}").overwritePartitions()`` /
``spark.read.table`` with
``spark.sql.catalog.cat=org.apache.iceberg.spark.SparkCatalog`` —
every plan in this repo is expressed against DataFrames, so nothing
else changes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        """Committed = directory exists and carries the _SUCCESS marker."""
        p = self.path(name)
        return os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self.path(name))

    def write_local(self, table, name: str) -> None:
        """Commit a DRIVER-LOCAL pyarrow Table as a catalog table —
        for control-plane tables of at most a few hundred rows (corpus
        scalars, lineage manifest).  Routing these through a Spark
        write costs a full job round-trip each (measured ~2.3s for the
        one-task coalesce(1) manifest write — pure serial floor in the
        scaling protocol); a driver-side parquet write plus the same
        _SUCCESS marker is the local-fs analog of a metadata-only
        Iceberg commit and costs milliseconds.  Readers can't tell the
        difference.

        Swap discipline: the OLD table dir is renamed aside, the new
        one os.replace'd into place, then the old copy deleted — the
        non-atomic window is two renames, not a full rmtree.  tmp/old
        are siblings of the target so EXDEV cannot occur.  POSIX has no
        true atomic directory swap, so a concurrent reader landing
        between the renames can still see the table missing — accepted
        for this single-driver control-plane path."""
        import pyarrow.parquet as pq

        p = self.path(name)
        tmp = p + "._tmp"
        old = p + "._old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(table, os.path.join(tmp, "part-00000.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        if os.path.isdir(p):
            os.replace(p, old)
        os.replace(tmp, p)
        shutil.rmtree(old, ignore_errors=True)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)

    def bytes(self, name: str) -> int:
        total = 0
        for dirpath, _dirs, files in os.walk(self.path(name)):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
        return total
