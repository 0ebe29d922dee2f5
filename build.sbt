ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etllensspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Pin the GC regime independently of heap size. On this host a page
// fault costs ~240us (VM lazy paging), so any GC policy that keeps
// touching fresh pages melts allocation-heavy stages: G1 with a huge
// unpinned -Xmx (harnesses run up to ~90 GB) grows eden to tens of GB
// (llm_lang_id 0.7s -> 39s at -Xmx88g, same binary), and heap
// shrink/regrow cycles re-fault the same pages (observed 9.2s young
// pauses from promotion into never-touched old gen). Countermeasures,
// robust to whatever -Xmx the harness picks (all measured; full bench
// 78.6s unpinned -> ~41s pinned at -Xmx88g):
//  - -Xms = min(-Xmx, 12g) + AlwaysPreTouch: the working set is faulted
//    once at JVM start (untimed), never during queries.
//  - MaxNewSize=4g + 4m G1 regions: eden pages are reused, not strided;
//    region geometry matches the well-behaved 8g-heap default.
//  - MinHeapFreeRatio=0 / MaxHeapFreeRatio=100: never shrink (an
//    uncommit/recommit cycle re-faults the same pages), never grow
//    ergonomically — growth on genuine allocation demand only.
//  - MetaspaceSize=512m: 30+ codegen'd queries load classes past the
//    default threshold, each crossing a stop-the-world full GC.
//  - G1 over ParallelGC: with fixed generations ParallelGC survivor
//    overflow promoted GBs and paid 2-9s monolithic full GCs; G1's
//    incremental mixed collections keep max pause ~0.3s on this load.
val driverHeap = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val heapMb: Option[Long] = "^(\\d+)([gGmM])$".r.findFirstMatchIn(driverHeap)
  .map(m => m.group(1).toLong * (if (m.group(2).toLowerCase == "g") 1024L else 1L))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap",
  "-XX:MaxNewSize=4g",
  "-XX:G1HeapRegionSize=4m",
  "-XX:MinHeapFreeRatio=0",
  "-XX:MaxHeapFreeRatio=100",
  "-XX:MetaspaceSize=512m",
) ++ heapMb.toSeq.flatMap(mb =>
  Seq(s"-Xms${math.min(mb, 12288L)}m", "-XX:+AlwaysPreTouch"))
