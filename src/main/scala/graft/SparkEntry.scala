package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each named query is a pure
  * `(SparkSession, sfDir) => DataFrame` with a matching DuckDB
  * oracle in [[oracleSql]] (column names aligned; deterministic
  * ordering and decimal-exact aggregation per
  * [[graft.queries.QueryDefs]]).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_revenue_by_category")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.queries ++ AnalyticsQueries.queries ++ LlmQueries.queries ++
      PosQueries.queries ++ TimeSeriesQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EtlQueries.oracles ++ AnalyticsQueries.oracles ++ LlmQueries.oracles ++
      PosQueries.oracles ++ TimeSeriesQueries.oracles
}
