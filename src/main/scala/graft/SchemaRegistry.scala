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
    val schemas: Map[String, StructType]) extends Serializable {

  def apply(eventType: String): StructType = schemas(eventType)
  def get(eventType: String): Option[StructType] = schemas.get(eventType)

  /** Decode the props payload of one event type with its frozen schema. */
  def decode(events: DataFrame, eventType: String): DataFrame = {
    val parsed: Column = from_json(col("props"), schemas(eventType))
    events.filter(col("event_type") === eventType)
      .withColumn("props_struct", parsed)
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

  /** Build from the event log: per type, take the props of the earliest
    * instance (min_by over (ts_ns, event_id) — deterministic, unlike
    * first()) and infer its JSON schema.
    */
  def build(events: DataFrame): SchemaRegistry = {
    val spark = events.sparkSession
    val samples = events
      .groupBy(col("event_type"))
      .agg(min_by(col("props"), struct(col("ts_ns"), col("event_id")))
        .as("sample"))
      .collect()
    val schemas = samples.map { r =>
      val tpe = r.getString(0)
      val sample = r.getString(1)
      val ddl = spark.range(1)
        .select(schema_of_json(lit(sample)).as("s"))
        .collect()(0).getString(0)
      tpe -> DataType.fromDDL(ddl).asInstanceOf[StructType]
    }.toMap
    new SchemaRegistry(schemas)
  }
}
