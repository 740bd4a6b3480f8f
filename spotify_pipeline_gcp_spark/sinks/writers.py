"""Sink adapters (SURVEY.md §2.2).

The reference writes CSV/Parquet with an overwrite-then-rename dance
driven from the driver via the GCS client
(``/root/reference/spark_jobs/playback_pipeline.py:66-88,13-63``), and
appends to BigQuery with a direct-write connector
(``playback_pipeline_curated.py:211-215``). Here:

- partitioned Parquet is the internal format everywhere (columnar,
  splittable, pushdown-friendly);
- single-file output is ``coalesce(1)`` + a filesystem rename — no
  object-store copy loop;
- the warehouse is an interface; tests use the Parquet implementation
  and a DuckDB oracle (BigQuery/JDBC are deployment details, swapped
  in via the same interface).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Parquet write (ref K2). ``partition_by`` replaces the
    reference's path arithmetic (``main.py:46``) with a layout the
    engine partition-prunes automatically."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC write (columnar alternative; same layout options)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV write with header (ref K1, ``playback_pipeline.py:72``)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_single_file(df: DataFrame, dest_file: str, fmt: str = "csv") -> None:
    """One output file with a stable name (ref K4).

    The reference lists ``part-*`` blobs and copy-renames them through
    the GCS API (``playback_pipeline.py:73-86``). Equivalent here:
    coalesce to one partition, write to a temp dir, rename the part
    file. Only sane for small exports — a 100 TB result should never
    be a single file, so this is an edge utility, not a default.
    """
    tmp = tempfile.mkdtemp(prefix="spark_single_")
    try:
        out = df.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            out.option("header", True).csv(tmp)
        elif fmt == "parquet":
            out.parquet(tmp)
        else:
            raise ValueError(f"unsupported fmt: {fmt}")
        part = glob.glob(os.path.join(tmp, f"part-*.{fmt}"))[0]
        os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
        shutil.move(part, dest_file)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


class ParquetWarehouse:
    """Warehouse sink/scan interface (ref S8/K3) backed by Parquet.

    Mirrors the BigQuery usage: ``scan(predicate)`` is the pushdown
    read (``playback_pipeline_curated.py:105-107`` pushes a SQL string;
    here a ``where()`` Catalyst pushes into the parquet scan), and
    ``append`` is the direct-write append (``:211-215``). A production
    deployment implements the same two methods over
    ``format("bigquery")`` / JDBC.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _recover(self, table: str) -> None:
        """Self-heal the one crash window ``delete_keys`` leaves: if a
        crash hit between renaming the table aside and moving the
        rewrite in, the data survives under ``<table>.old`` while the
        table path is missing. Every access point calls this first, so
        the rename-back recovery the docstring used to delegate to an
        operator happens automatically on the next touch."""
        target = self._path(table)
        old = target + ".old"
        if not os.path.isdir(target) and os.path.isdir(old):
            os.rename(old, target)

    def exists(self, table: str) -> bool:
        self._recover(table)
        return os.path.isdir(self._path(table))

    def scan(self, table: str, predicate: str | None = None) -> DataFrame:
        self._recover(table)
        df = self.spark.read.parquet(self._path(table))
        return df.where(predicate) if predicate else df

    def append(self, df: DataFrame, table: str) -> None:
        self._recover(table)
        df.write.mode("append").parquet(self._path(table))

    def delete_keys(self, table: str, keys_df: DataFrame, key_cols: list[str]) -> int:
        """Idempotent-reload delete (ref K6: ``DELETE FROM t WHERE
        played_at IN (...)``, ``playback_pipeline_curated_adhoc.py:
        90-107``) as a distributed rewrite: keep = existing ⟕̸ keys.

        Parquet is immutable, so delete = anti-join + swap — the same
        copy-on-write shape Delta/Iceberg use per file; here at table
        granularity (fine for the daily-partition sizes this sink
        sees; a format with file-level manifests narrows the rewrite).

        Two Spark jobs total: the rewrite itself plus ONE semi-join
        count of the rows being removed (the count prunes to key
        columns, so it scans a fraction of the table). The swap is
        rename-aside: old table → ``<table>.old``, new dir → table,
        then drop ``.old``. A crash at ANY step leaves a complete
        copy on disk (worst case: the table is briefly under the
        ``.old`` name — ``_recover`` renames it back automatically on
        the next scan/append/exists); there is no window where no
        copy exists, unlike delete-then-move. Concurrent
        readers mid-swap can still race the rename pair — true
        isolation needs a manifest format (Delta/Iceberg), out of
        scope for this sink. Returns rows deleted.
        """
        keys = keys_df.select(*key_cols).dropDuplicates()
        existing = self.scan(table)
        deleted = existing.join(keys, on=key_cols, how="left_semi").count()
        keep = existing.join(keys, on=key_cols, how="left_anti")
        self._swap_in(keep, table)
        return deleted

    def merge_upsert(
        self, df: DataFrame, table: str, key_cols: list[str]
    ) -> None:
        """MERGE (upsert): incoming rows replace existing rows that
        share their key; everything else is kept — the standard
        warehouse `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
        INSERT` for whole-row updates, and the missing third verb next
        to ``append`` (insert-only) and ``delete_keys``.

        One distributed plan: keep = existing ⟕̸ incoming-keys, then
        keep ∪ incoming, written via the same rename-aside swap as
        ``delete_keys`` (crash-safe at every step, ``_recover`` heals
        the one rename window). Incoming rows are deduplicated on the
        key (last-writer ambiguity is refused rather than silently
        resolved: duplicate incoming keys raise). Copy-on-write at
        table granularity — a manifest format (Delta/Iceberg) narrows
        the rewrite to matched files; the plan shape is identical.
        """
        from spotify_pipeline_gcp_spark.operators.dedup import (
            _unpersist_checkpoint,
        )

        # Materialize incoming ONCE before the duplicate check: the
        # frame is referenced twice (dup-key count, then the rewrite),
        # and a non-deterministic input recomputed between the two
        # could pass the check yet write duplicate keys. localCheckpoint
        # pins the checked rows as THE rows written; blocks are
        # released after the swap.
        incoming = df.localCheckpoint(eager=True)
        try:
            dup = (
                incoming.groupBy(*key_cols).count().where("count > 1").limit(1)
            )
            if dup.count() > 0:
                raise ValueError(
                    f"merge_upsert: incoming rows contain duplicate keys on {key_cols}"
                )
            if not self.exists(table):
                incoming.write.mode("overwrite").parquet(self._path(table))
                return
            existing = self.scan(table)
            keys = incoming.select(*key_cols).dropDuplicates()
            keep = existing.join(keys, on=key_cols, how="left_anti")
            merged = keep.unionByName(incoming.select(*existing.columns))
            self._swap_in(merged, table)
        finally:
            _unpersist_checkpoint(incoming)

    def compact(self, table: str, target_file_bytes: int = 128 * 1024**2) -> int:
        """Compact a table's files to ~``target_file_bytes`` each —
        the countermeasure to incremental ``append``'s small-files
        problem (every micro-batch/daily delta adds files; scans pay
        per-file open/footer cost, so a year of appends can make a
        small table slow). Sizes from the files on disk, rewrites via
        the same crash-safe swap as delete/merge. Returns the new
        file count.

        At 100 TB you compact PARTITIONS on a schedule, not whole
        tables; with a manifest format this is OPTIMIZE/rewrite-
        data-files. The plan shape (size -> repartition -> swap) is
        the same."""
        self._recover(table)
        target = self._path(table)
        # A hive-partitioned layout (key=value subdirectories) would be
        # silently FLATTENED by this whole-table rewrite (scan folds the
        # partition column in; the rewrite writes one flat dir) — and a
        # top-level glob would size it as 0 bytes. Refuse loudly:
        # partitioned tables compact per-partition on a schedule.
        part_dirs = [
            d
            for d in os.listdir(target)
            if os.path.isdir(os.path.join(target, d)) and "=" in d
        ]
        if part_dirs:
            raise ValueError(
                f"compact: table '{table}' has a partitioned layout "
                f"({part_dirs[0]}, ...); whole-table compaction would "
                "flatten it. Compact individual partitions instead."
            )
        total_bytes = sum(
            os.path.getsize(f)
            for f in glob.glob(
                os.path.join(target, "**", "*.parquet"), recursive=True
            )
        )
        n_files = max(1, -(-total_bytes // max(1, target_file_bytes)))
        self._swap_in(self.scan(table).repartition(n_files), table)
        return len(glob.glob(os.path.join(target, "*.parquet")))

    def _swap_in(self, df: DataFrame, table: str) -> None:
        """Materialize ``df`` then swap it in as the new table state:
        write to temp, rename table aside, move rewrite in, drop the
        old copy. A crash at any step leaves a complete copy on disk
        (worst case under ``<table>.old``, healed by ``_recover``);
        there is no window with no copy. Concurrent readers mid-swap
        can still race the rename pair — true isolation needs a
        manifest format, out of scope for this sink."""
        tmp = tempfile.mkdtemp(prefix="wh_rewrite_")
        df.write.mode("overwrite").parquet(tmp)
        target = self._path(table)
        old = target + ".old"
        if os.path.exists(old):  # leftover from a prior crash
            shutil.rmtree(old)
        os.rename(target, old)
        shutil.move(tmp, target)
        shutil.rmtree(old)
