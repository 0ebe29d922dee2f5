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
      RelationalOps3.queries ++ AnalyticsOps.queries ++
      JoinOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++
      TextOps.queries ++ MultimodalOps.queries ++ MaintenanceOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventOps.oracles ++ RelationalOps.oracles ++ RelationalOps2.oracles ++
      RelationalOps3.oracles ++ AnalyticsOps.oracles ++
      JoinOps.oracles ++ DedupOps.oracles ++ SimilarityOps.oracles ++
      TextOps.oracles ++ MultimodalOps.oracles ++ MaintenanceOps.oracles

  /** The queries entries that DELIBERATELY have no oracleSql row: sketch
    * aggregates (HLL / KLL-style percentile) whose bit-exact output is
    * engine-specific by construction. Each maps to the machine-checked
    * evidence that replaces the hash compare: the exact-twin query it is
    * asserted against, the relative tolerance the ScalaTest spec
    * enforces on every run, and the spec's location. [[Verify]] dumps
    * this as `oracle_meta.json` next to `oracle_sql.json`, so a
    * `no_oracle` row in the correctness artifact is distinguishable
    * from a broken query without reading the test suite.
    */
  final case class RowsOnlyMeta(exactTwin: String, tolerance: String,
      spec: String)
  def rowsOnlyMeta: Map[String, RowsOnlyMeta] = Map(
    "rel_approx" -> RowsOnlyMeta(
      exactTwin = "countDistinct(o_custkey) per o_orderpriority (inline in spec)",
      tolerance = "HLL (hll_sketch_agg lgK=14) within 5% of exact, per group",
      spec = "src/test/scala/graft/JoinOpsSpec.scala: \"rel_approx: sketches within 5% of exact\""),
    "rel_profile_approx" -> RowsOnlyMeta(
      exactTwin = "rel_profile",
      tolerance = "HLL n_distinct within 2% of exact; n, n_null, min/max bit-identical",
      spec = "src/test/scala/graft/RelationalOpsSpec.scala: \"rel_profile_approx: HLL distincts within 2% of exact, rest identical\""),
    "rel_percentile_approx" -> RowsOnlyMeta(
      exactTwin = "rel_percentile",
      tolerance = "sketch p50/p90 within 2.5% of exact, per group",
      spec = "src/test/scala/graft/RelationalOpsSpec.scala: \"rel_percentile_approx: sketch medians within 2.5% of the exact query\""),
    "ev_sliding_distinct" -> RowsOnlyMeta(
      exactTwin = "exact trailing-6h countDistinct(user_id) per window (inline in spec)",
      tolerance = "HLL sliding union within 5% of exact, per window; merge arity <= 6",
      spec = "src/test/scala/graft/AnalyticsOpsSpec.scala: \"ev_sliding_distinct: sketch windows within 5% of exact, merge arity bounded\""),
    "rel_distinct_incremental" -> RowsOnlyMeta(
      exactTwin = "countDistinct(o_custkey) per o_orderpriority (inline in spec)",
      tolerance = "merged-batch HLL (lgK=14) union == single-pass HLL exactly (bit-identical estimates); both within 2% of exact countDistinct, per group",
      spec = "src/test/scala/graft/MaintenanceOpsSpec.scala: \"rel_distinct_incremental: merged sketch states equal the single-pass sketch\""))
}
