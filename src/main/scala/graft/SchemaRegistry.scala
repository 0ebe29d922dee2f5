package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Per-event-type schema registry — the reference's schema model
  * (SURVEY.md §1.1/§2.3 A2): each event type's column set is inferred from
  * its FIRST observed instance and frozen
  * (/root/reference/src/main.cpp:302-317). Here "first" is deterministic:
  * the instance with the smallest (ts, event_id).
  *
  * Scale notes: the registry is catalog-sized (one row per event type) —
  * the only driver-side materialization in the engine, mirroring the
  * reference's in-memory metadata map (src/main.cpp:152). The sampling
  * aggregation is a single map-side-combined groupBy over the log.
  */
final class SchemaRegistry private (
    val schemas: Map[String, StructType],
    val stringTypes: Set[String]) extends Serializable {

  def apply(eventType: String): StructType = schemas(eventType)
  def get(eventType: String): Option[StructType] = schemas.get(eventType)

  /** Decode the props payload of one event type with its frozen schema.
    *
    * Types whose payload is a bare JSON string (the reference's
    * EventWriteString path, src/main.cpp:583-592: no TDH schema — the
    * payload IS the single rendered column) decode to a `message` column
    * instead of a struct.
    */
  def decode(events: DataFrame, eventType: String): DataFrame = {
    val typed = events.filter(col("event_type") === eventType)
    if (stringTypes(eventType))
      typed.withColumn("message", get_json_object(col("props"), "$"))
    else
      typed.withColumn("props_struct",
        from_json(col("props"), schemas(eventType)))
  }

  /** Decode all types into a union-of-schemas struct (ragged rows padded
    * with nulls — the UI padding semantics, src/main.cpp:1299-1303).
    */
  def decodeAll(events: DataFrame): DataFrame = {
    val merged = StructType(schemas.values.flatMap(_.fields).toSeq
      .groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name))
    events.withColumn("props_struct", from_json(col("props"), merged))
  }
}

object SchemaRegistry {

  /** Build from the event log in ONE Spark job: per type, take the props
    * of the earliest instance (min_by over (ts_ns, event_id) —
    * deterministic, unlike first()) in a single map-side-combined
    * aggregation. Schema inference then runs driver-side over the
    * collected catalog-sized samples via the same evaluator that backs
    * `schema_of_json` — no per-type driver jobs (10k event types would
    * otherwise mean 10k tiny jobs).
    */
  def build(events: DataFrame): SchemaRegistry = {
    import org.apache.spark.sql.catalyst.expressions.json.SchemaOfJsonEvaluator
    import org.apache.spark.unsafe.types.UTF8String
    val samples = events
      .groupBy(col("event_type"))
      .agg(min_by(col("props"), struct(col("ts_ns"), col("event_id")))
        .as("sample"))
      .collect()
    val infer = SchemaOfJsonEvaluator(Map.empty[String, String])
    val inferred = samples.map { r =>
      val ddl = infer.evaluate(UTF8String.fromString(r.getString(1))).toString
      r.getString(0) -> DataType.fromDDL(ddl)
    }
    val schemas = inferred.collect {
      case (tpe, st: StructType) => tpe -> st
    }.toMap
    // Non-struct payloads are bare-string events (EventWriteString, P7).
    val stringTypes = inferred.collect {
      case (tpe, dt) if !dt.isInstanceOf[StructType] => tpe
    }.toSet
    new SchemaRegistry(schemas, stringTypes)
  }
}
