package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional third arg (local dev only — the driver passes exactly 2):
    // comma-separated query names to dump, for fast oracle iteration
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // compile cache sized for the 270-shape surface (Bench note)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      // scratch under the workdir — the host tmp reaper kills /tmp
      // blockmgr dirs of long runs (see Bench)
      .config("spark.local.dir", "target/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Sidecar for the by-design no-oracle entries (sketch aggregates):
    // records the exact twin, the tolerance the ScalaTest spec asserts,
    // and where — so a "no_oracle" row in the driver's correctness
    // artifact is a designed pass, not an indistinguishable error.
    val meta = SparkEntry.rowsOnlyMeta.map { case (k, m) =>
      s"${q(k)}: {${q("rows_only")}: true, ${q("exact_twin")}: ${q(m.exactTwin)}, " +
        s"${q("tolerance")}: ${q(m.tolerance)}, ${q("spec")}: ${q(m.spec)}}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_meta.json"), meta)
    spark.stop()
  }
}
