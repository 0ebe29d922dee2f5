package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator family's named queries and DuckDB oracle SQL.
  * Keys are stable operator names; each query is `(SparkSession, sfDir) =>
  * DataFrame` reading `$sfDir/<table>.parquet`. Every oracle-checked query
  * ends in a deterministic total ORDER BY mirrored in its SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's interactive instance query (SURVEY.md §3.2): key
    * filter + ordered LIMIT + props decode.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("ev_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventOps.queries ++ RelationalOps.queries ++ RelationalOps2.queries ++
      JoinOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++
      TextOps.queries ++ MultimodalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventOps.oracles ++ RelationalOps.oracles ++ RelationalOps2.oracles ++
      JoinOps.oracles ++ DedupOps.oracles ++ SimilarityOps.oracles ++
      TextOps.oracles ++ MultimodalOps.oracles
}
