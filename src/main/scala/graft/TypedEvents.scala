package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed (`Dataset[T]`) slice of the event log — the fixed envelope of
  * SURVEY.md §1.3 ("Dataset[T] only for the fixed envelope where useful").
  * Compile-time field checks for pipeline code that touches the core
  * columns; the dynamic `props` payload stays in the DataFrame world.
  */
object TypedEvents {

  /** The fixed event envelope (props excluded — schema-on-read). */
  final case class Event(event_id: Long, ts_ms: Long, user_id: Long,
      event_type: String, value: Double)

  final case class TypeStats(event_type: String, n: Long, total: Double)

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    operators.EventOps.events(spark, sfDir)
      .select($"event_id", $"ts_ms", $"user_id", $"event_type", $"value")
      .as[Event]
  }

  /** Typed aggregation: compiles to the same Catalyst agg as the untyped
    * form — groupByKey on a case-class field, partial+final.
    */
  def statsByType(ev: Dataset[Event]): Dataset[TypeStats] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.event_type)
      .agg(count(lit(1)).as("n").as[Long],
        sum($"value").as("total").as[Double])
      .map { case (t, n, total) => TypeStats(t, n, total) }
  }

  /** Typed filter+map pipeline (operates on fields, not column strings). */
  def highValueUsers(ev: Dataset[Event], threshold: Double): Dataset[Long] = {
    import ev.sparkSession.implicits._
    ev.filter(_.value >= threshold).map(_.user_id).distinct()
  }
}
