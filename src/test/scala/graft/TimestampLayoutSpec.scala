package graft

import org.apache.spark.sql.functions._

/** The events corpus has shipped `ts` in different physical layouts across
  * driver rounds: INT64 nanoseconds (read as a raw long via the
  * nanosAsLong legacy conf), and TIMESTAMP(µs) — both plain and NTZ.
  * EventOps.events must normalize every layout to identical
  * ts_ns/ts_ms/ts columns so the whole event family (and its DuckDB
  * oracles, which use layout-independent epoch_ns/epoch_ms) never sees
  * the difference.
  */
class TimestampLayoutSpec extends SparkSpec {
  import spark.implicits._

  // Fixture-coverage note: the "ns-INT64" fixture below is a plain BIGINT
  // column (Spark cannot WRITE a TIMESTAMP(NANOS)-annotated parquet
  // column). Since driver round 8 the truly annotated read path is
  // covered too: the last test writes a genuine TIMESTAMP(NANOS) file
  // with parquet-mr's example writer (bundled with Spark) and proves
  // the nanosAsLong normalization over it — a regression there now
  // fails this spec, not the driver's gate.
  //
  // µs-aligned nanos (the µs layouts can only carry multiples of 1000),
  // including a pre-epoch value: floor semantics must hold below zero.
  private val fixture = Seq(
    (1L, 1704067200123456000L, 10L, "click", 1.0, """{"k":1}"""),
    (2L, -86400000001000L, 11L, "error", 2.0, """{"c":3,"d":"err"}"""),
    (3L, 1704067200123457000L, 10L, "view", 3.0, """{"a":7,"d":"s"}"""),
    // July date: in a DST session zone this sits at a DIFFERENT offset
    // than the 1970 epoch, so any zone-relative NTZ→epoch arithmetic
    // whose offsets merely cancel (instead of being pinned to UTC)
    // shifts this row by the offset delta — winter-only fixtures can
    // not catch that failure mode.
    (4L, 1719792123456789000L, 12L, "view", 4.0, """{"a":1,"d":"s"}"""))

  private def collectNormalized(dir: String) = {
    val df = operators.EventOps.events(spark, dir)
    (df.schema.map(f => f.name -> f.dataType).toList,
      df.orderBy($"event_id")
        .select($"event_id", $"ts_ns", $"ts_ms", $"ts", $"user_id",
          $"event_type", $"value", $"props")
        .collect().toSeq)
  }

  test("ns-INT64, TIMESTAMP, and TIMESTAMP_NTZ layouts normalize " +
      "to identical ts_ns/ts_ms/ts") {
    val nsDf = fixture.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val tzDf = nsDf.withColumn("ts",
      timestamp_micros(expr("CAST(floor(ts / 1000) AS BIGINT)")))
    val ntzDf = tzDf.withColumn("ts", $"ts".cast("timestamp_ntz"))

    val asNs = collectNormalized(tempSfDir("events" -> nsDf))
    val asTz = collectNormalized(tempSfDir("events" -> tzDf))
    val asNtz = collectNormalized(tempSfDir("events" -> ntzDf))

    assert(asTz._1 == asNs._1, "TIMESTAMP layout schema must match ns layout")
    assert(asNtz._1 == asNs._1, "NTZ layout schema must match ns layout")
    assert(asTz._2 == asNs._2, "TIMESTAMP layout rows must match ns layout")
    assert(asNtz._2 == asNs._2, "NTZ layout rows must match ns layout")
  }

  test("NTZ layout normalizes identically in a non-UTC session zone") {
    // Regression for the session-zone hazard: every NTZ→epoch route in
    // Spark goes through the session zone (even timestampdiff coerces
    // NTZ operands through it), so EventOps.events pins the session to
    // UTC the same way it pins nanosAsLong. Flipping the zone — to a
    // DST zone, with a summer row in the fixture whose offset differs
    // from the epoch's — must change nothing.
    val nsDf = fixture.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val ntzDf = nsDf.withColumn("ts",
      timestamp_micros(expr("CAST(floor(ts / 1000) AS BIGINT)"))
        .cast("timestamp_ntz"))
    val ntzDir = tempSfDir("events" -> ntzDf)
    val utc = collectNormalized(ntzDir)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val la = collectNormalized(ntzDir)
      assert(la._1 == utc._1, "schema must not depend on session zone")
      assert(la._2 == utc._2, "NTZ epochs must not shift with session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("a genuinely TIMESTAMP(NANOS)-annotated parquet file (parquet-mr " +
      "written) normalizes identically to the raw-BIGINT layout") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    // the legacy corpus's physical schema: INT64 annotated
    // TIMESTAMP(NANOS, adjustedToUTC) — the layout Spark can READ (via
    // spark.sql.legacy.parquet.nanosAsLong) but not write
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType())
      .named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withConf(conf).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try fixture.foreach { case (id, ns, uid, et, v, props) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", ns); g.add("user_id", uid)
      g.add("event_type", et); g.add("value", v); g.add("props", props)
      writer.write(g)
    } finally writer.close()
    // sanity: the file really carries the NANOS annotation
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/events.parquet"), conf))
    val tsType =
      try reader.getFooter.getFileMetaData.getSchema
        .getType(Seq("ts"): _*).asPrimitiveType.getLogicalTypeAnnotation
      finally reader.close()
    assert(tsType ==
      LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS),
      s"fixture must be genuinely NANOS-annotated, got $tsType")
    val annotated = collectNormalized(dir)
    val rawLong = collectNormalized(tempSfDir("events" ->
      fixture.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")))
    assert(annotated._1 == rawLong._1,
      "NANOS-annotated schema must normalize like the raw-BIGINT layout")
    assert(annotated._2 == rawLong._2,
      "NANOS-annotated rows must normalize like the raw-BIGINT layout")
  }

  test("normalized ts_ns keeps raw nanos and floor-divides pre-epoch ms") {
    val dir = tempSfDir("events" ->
      fixture.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = operators.EventOps.events(spark, dir)
      .orderBy($"event_id").select($"ts_ns", $"ts_ms").collect()
    assert(rows(0).getLong(0) == 1704067200123456000L)
    assert(rows(0).getLong(1) == 1704067200123L)
    // -86400000001000 ns: floor(-86400000.001 ms) = -86400001, not -86400000
    assert(rows(1).getLong(0) == -86400000001000L)
    assert(rows(1).getLong(1) == -86400001L)
  }
}
