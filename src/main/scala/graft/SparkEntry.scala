package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.CoreQueries
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ graft.queries.RelationalQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.EmbeddingQueries.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.MiningQueries.queries ++
      graft.queries.SubqueryQueries.queries ++
      graft.queries.DecisionQueries.queries ++
      graft.queries.RankingQueries.queries ++
      graft.queries.ScaleQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ graft.queries.RelationalQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.EmbeddingQueries.oracle ++
      graft.queries.StreamingQueries.oracle ++
      graft.queries.CurationQueries.oracle ++
      graft.queries.MiningQueries.oracle ++
      graft.queries.SubqueryQueries.oracle ++
      graft.queries.DecisionQueries.oracle ++
      graft.queries.RankingQueries.oracle ++
      graft.queries.ScaleQueries.oracle
}
