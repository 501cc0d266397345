package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every key has a Spark
  * implementation in `queries` and (where ANSI-SQL-expressible) a DuckDB
  * oracle twin in `oracleSql` with IDENTICAL output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ DomainQueries.queries ++ DataQueries.queries ++
      ChunkQueries.queries ++ PathQueries.queries ++ IngestQueries.queries ++
      CorpusQueries.queries ++ MaintQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ DomainQueries.oracle ++ DataQueries.oracle ++
      ChunkQueries.oracle ++ PathQueries.oracle ++ IngestQueries.oracle ++
      CorpusQueries.oracle ++ MaintQueries.oracle
}
