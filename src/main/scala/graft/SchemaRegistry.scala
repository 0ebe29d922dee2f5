package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, DoubleType, LongType, StringType, StructField, StructType}

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
    *
    * Collision rule (deterministic by construction): when two event types
    * declare the SAME property name with DIFFERENT types, the merged field
    * takes the widest common readable type via [[SchemaRegistry.widen]] —
    * equal types pass through, numerics climb long → decimal → double,
    * structs/arrays merge recursively by field name, and any other mix
    * falls back to string (Spark's JSON parser renders every JSON value,
    * including objects and arrays, as its raw text under StringType, so no
    * row nulls out). `widen` is commutative and associative, so the result
    * is independent of map iteration order — unlike the reference, whose
    * per-type frozen schemas (src/main.cpp:302-317) never merge and so
    * never face the collision.
    */
  def decodeAll(events: DataFrame): DataFrame = {
    val merged = StructType(schemas.values.flatMap(_.fields).toSeq
      .groupBy(_.name)
      .map { case (_, fields) => fields.reduce(SchemaRegistry.widenFields) }
      .toSeq.sortBy(_.name))
    events.withColumn("props_struct", from_json(col("props"), merged))
  }
}

object SchemaRegistry {

  /** Widest common readable type for two JSON-inferred types. Commutative
    * and associative, so folding over colliding fields in any order yields
    * the same merged schema (the determinism `decodeAll` documents).
    * Ladder: equal → itself; long/decimal/double → the wider numeric
    * (decimal precision covers both operands, overflowing to double);
    * struct+struct and array+array → recursive field/element merge;
    * anything else → string, which Spark's JSON parser can read from ANY
    * JSON value (objects and arrays decode to their raw text).
    */
  private[graft] def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (s1: StructType, s2: StructType) =>
      val byName1 = s1.fields.map(f => f.name -> f).toMap
      val byName2 = s2.fields.map(f => f.name -> f).toMap
      StructType((byName1.keySet ++ byName2.keySet).toSeq.sorted.map { n =>
        (byName1.get(n), byName2.get(n)) match {
          case (Some(f1), Some(f2)) => widenFields(f1, f2)
          case (one, other)         => one.orElse(other).get
        }
      })
    case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
      ArrayType(widen(e1, e2), n1 || n2)
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (d: DecimalType, LongType) => widenDecimal(d, DecimalType(20, 0))
    case (LongType, d: DecimalType) => widenDecimal(d, DecimalType(20, 0))
    case (_: DecimalType, DoubleType) | (DoubleType, _: DecimalType) =>
      DoubleType
    case (d1: DecimalType, d2: DecimalType) => widenDecimal(d1, d2)
    case _ => StringType
  }

  /** Decimal covering both operands' integral and fractional ranges; falls
    * back to double past the 38-digit cap (Spark's own promotion rule).
    */
  private def widenDecimal(d1: DecimalType, d2: DecimalType): DataType = {
    val scale = math.max(d1.scale, d2.scale)
    val intDigits = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
    if (intDigits + scale <= DecimalType.MAX_PRECISION)
      DecimalType(intDigits + scale, scale)
    else DoubleType
  }

  private[graft] def widenFields(f1: StructField, f2: StructField): StructField =
    StructField(f1.name, widen(f1.dataType, f2.dataType), nullable = true)

  /** Build from the event log in ONE Spark job: per type, take the props
    * of the earliest instance (min_by over (ts_ns, event_id) —
    * deterministic, unlike first()) in a single map-side-combined
    * aggregation. Schema inference then runs driver-side over the
    * collected catalog-sized samples via the same evaluator that backs
    * `schema_of_json` — no per-type driver jobs (10k event types would
    * otherwise mean 10k tiny jobs).
    *
    * BOUNDED collect: the per-type sample table is catalog-sized, which
    * is small for any real trace (the reference's catalog is likewise
    * in-memory and unbounded, src/main.cpp:152) but unbounded in
    * general — a corpus whose "type" column is secretly high-cardinality
    * (a miskeyed join, an id leaking into event_type) would otherwise
    * OOM the driver. The plan fetches at most `maxTypes + 1` rows
    * (CollectLimit — the executors stop producing past it, so the guard
    * costs nothing) and refuses loudly when the catalog exceeds the
    * bound; raise `maxTypes` deliberately for a genuinely wider
    * catalog, or pre-aggregate a two-level registry.
    */
  def build(events: DataFrame, maxTypes: Int = 65536): SchemaRegistry = {
    import org.apache.spark.sql.catalyst.expressions.json.SchemaOfJsonEvaluator
    import org.apache.spark.unsafe.types.UTF8String
    val samples = events
      .groupBy(col("event_type"))
      .agg(min_by(col("props"), struct(col("ts_ns"), col("event_id")))
        .as("sample"))
      .limit(maxTypes + 1)
      .collect()
    require(samples.length <= maxTypes,
      s"SchemaRegistry.build: more than $maxTypes distinct event types — " +
        "the per-type sample catalog would not fit a driver; check the " +
        "event_type column for a high-cardinality leak, or raise " +
        "maxTypes / build a two-level registry deliberately")
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
