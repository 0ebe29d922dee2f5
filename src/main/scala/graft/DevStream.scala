package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: drive the streaming layer end-to-end from a real file
  * source (not part of the driver contract).
  */
object DevStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // file stream sources take a directory; stage the table file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    // layout-tolerant (see EventOps.events): ns-INT64 or TIMESTAMP(µs)
    val stream = (
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        // floor division, matching EventOps: pre-epoch ns must bucket
        // like the batch path (div truncates toward zero and diverges)
        raw.withColumn("ts",
          timestamp_micros(graft.functions.Fns.floorDiv("ts", 1000L)))
      else raw.withColumn("ts", col("ts").cast("timestamp")))
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    val q = graft.streaming.EventStreaming.tumblingCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("probe").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("probe")
    println(s"stream windows emitted=${out.count()}")
    out.orderBy(col("hour_start"), col("event_type")).show(8, truncate = false)
    spark.stop()
  }
}
