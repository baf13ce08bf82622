"""JDBC source/sink — the reference's datasource layer, Spark-first.

The reference maintains ~600 LoC of JDBC plumbing: per-dialect URL and
driver templates (``utils/DataSourceUtils.java:109-141``), SPI dialect
registry (``type/TypeSPIRegistry.java:43-49``), Hikari/Druid pools and
routing (``utils/DataSourceUtils.java:24-107``). Spark's JDBC data
source replaces all of it: dialects are built in (``JdbcDialects``),
connection lifecycle is per-task, and reads/writes are distributed.

Scale posture (100 TB side of a JDBC exchange is the RDBMS, so the
knobs are about parallelism and pushdown):

- **Parallel reads**: ``partition_column`` + ``num_partitions`` +
  bounds split the table into range predicates, one connection per
  partition; without them the read is a single task (fine for dims,
  wrong for facts).
- **Pushdown**: Catalyst pushes filters (and, in DSv2, aggregates)
  into the remote query — the WHERE clause ships to the database, so
  a filtered read moves only matching rows.
- **Write parallelism** equals the DataFrame's partition count;
  ``batchsize`` controls rows per INSERT batch.

Tests run against the Derby embedded driver that ships with Spark
(no network, same JVM) — the same code path serves MySQL/PostgreSQL/
Oracle/SQLServer by swapping ``url``/``driver``, which is exactly the
surface the reference's dialect SPI abstracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

#: dialect -> (url template, driver class): the reference's per-dialect
#: switch (utils/DataSourceUtils.java:109-141) as data, with host/port
#: parameterized instead of hard-coded localhost. Spark's JdbcDialects
#: handles per-dialect SQL generation; this registry only standardizes
#: connection strings. URL formats are the vendors' public JDBC specs.
DIALECTS: dict[str, tuple[str, str]] = {
    "mysql": ("jdbc:mysql://{host}:{port}/{database}",
              "com.mysql.cj.jdbc.Driver"),
    "mariadb": ("jdbc:mariadb://{host}:{port}/{database}",
                "org.mariadb.jdbc.Driver"),
    "postgresql": ("jdbc:postgresql://{host}:{port}/{database}",
                   "org.postgresql.Driver"),
    "opengauss": ("jdbc:opengauss://{host}:{port}/{database}",
                  "org.opengauss.Driver"),
    "oracle": ("jdbc:oracle:thin:@//{host}:{port}/{database}",
               "oracle.jdbc.driver.OracleDriver"),
    "sqlserver": ("jdbc:sqlserver://{host}:{port};databaseName={database}",
                  "com.microsoft.sqlserver.jdbc.SQLServerDriver"),
    "h2": ("jdbc:h2:mem:{database};DB_CLOSE_DELAY=-1", "org.h2.Driver"),
    "derby": ("jdbc:derby:{database}", DERBY_DRIVER),
}

_DEFAULT_PORTS = {"mysql": 3306, "mariadb": 3306, "postgresql": 5432,
                  "opengauss": 5431, "oracle": 1521, "sqlserver": 1433}


def jdbc_url(dialect: str, database: str, host: str = "localhost",
             port: int | None = None) -> str:
    """Connection URL for a registered dialect (embedded dialects ignore
    host/port)."""
    tpl, _ = DIALECTS[dialect]
    return tpl.format(host=host, port=port or _DEFAULT_PORTS.get(dialect),
                      database=database)


def jdbc_driver(dialect: str) -> str:
    return DIALECTS[dialect][1]


def derby_url(db_path: str, create: bool = True) -> str:
    """Embedded-Derby JDBC URL (the in-container stand-in for the
    reference's MySQL/PostgreSQL/... URL templates,
    DataSourceUtils.java:109-141)."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_path}{suffix}"


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite",
               driver: str | None = None, batchsize: int = 10_000) -> None:
    """Write a DataFrame to a JDBC table (one connection per partition)."""
    w = (df.write.format("jdbc")
         .option("url", url).option("dbtable", table)
         .option("batchsize", str(batchsize)))
    if driver:
        w = w.option("driver", driver)
    w.mode(mode).save()


def read_jdbc(spark: SparkSession, url: str, table: str,
              driver: str | None = None,
              partition_column: str | None = None,
              num_partitions: int | None = None,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              fetchsize: int = 10_000) -> DataFrame:
    """Read a JDBC table; with ``partition_column`` + bounds the scan is
    split into ``num_partitions`` parallel range reads."""
    r = (spark.read.format("jdbc")
         .option("url", url).option("dbtable", table)
         .option("fetchsize", str(fetchsize)))
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (r.option("partitionColumn", partition_column)
              .option("numPartitions", str(num_partitions or 4))
              .option("lowerBound", str(lower_bound))
              .option("upperBound", str(upper_bound)))
    return r.load()


def jdbc_table_columns(spark: SparkSession, url: str, table: str,
                       driver: str | None = None) -> list[str]:
    """Ordered column names of a remote table — the reference's
    ``MetaDataQueryImpl.getColumnByDBAndTable``
    (service/MetaDataQueryImpl.java:29-44) without the pool/dialect
    machinery: schema comes from the JDBC source's schema probe
    (a zero-row query), not ``DatabaseMetaData.getColumns``."""
    return read_jdbc(spark, url, table, driver=driver).columns
