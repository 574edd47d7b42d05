package graft

// Dev tool (round 16): the scan win from manifest-level segment
// skipping. Publishes orders ONCE per SF dir as a segmented table with
// one data segment per order-year and per-segment min/max bounds on
// o_year (Sink statsCols), then times a one-year aggregate through
//   (a) the plain manifest read (all segments listed + scanned, the
//       filter left to parquet row-group pruning), vs
//   (b) Sink.readSnapshotPruned (non-overlapping segments skipped
//       BEFORE any file listing).
// Reported per dir: 3 timed rounds of both paths (round 1 cold) plus
// the file-listing counts — the number that matters at 100 TB, where
// (a) lists every file of every segment and (b) lists 1/|years| of
// them. Args: SF dirs (default sf0.1; pass /tmp/sfx10_all and
// /tmp/sfx100 for the growth rows).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PruneProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val base = Tables.load(spark, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      val years = base.select(min("o_year"), max("o_year")).head()
      val (y0, y1) = (years.getLong(0), years.getLong(1))
      val n = base.count()
      val path = new java.io.File(
        graft.ops.SlateStore.sessionTempRoot(spark),
        s"prune_probe_${System.nanoTime()}").toString
      // one data segment per year, bounds recorded per segment
      graft.ops.Sink.overwriteSegmented(base.filter(col("o_year") === y0),
        path, retain = 1, minAgeMs = 600000L, statsCols = Seq("o_year"))
      ((y0 + 1) to y1).foreach { y =>
        graft.ops.Sink.appendSegment(base.filter(col("o_year") === y),
          path, retain = 1, minAgeMs = 600000L, statsCols = Seq("o_year"))
      }
      val probe = (y0 + y1) / 2 // a mid-range year every SF has
      def agg(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
        // decimal sum: exact and order-independent, so the equality
        // check below cannot trip on double-summation order differing
        // between the 1-segment and N-segment scan layouts
        val r = df.filter(col("o_year") === probe)
          .agg(count(lit(1)),
            sum(col("o_totalprice").cast("decimal(28,2)"))).head()
        (r.getLong(0), r.getDecimal(1))
      }
      val full = graft.ops.Sink.readSnapshot(spark, path)
      val pruned = graft.ops.Sink.readSnapshotPruned(spark, path, "o_year",
        probe, probe)
      val filesFull = full.inputFiles.length
      val filesPruned = pruned.inputFiles.length
      val rounds = (1 to 3).map { _ =>
        val (a, tFull) = time(agg(graft.ops.Sink.readSnapshot(spark, path)))
        val (b, tPruned) = time(agg(graft.ops.Sink.readSnapshotPruned(
          spark, path, "o_year", probe, probe)))
        require(a == b, s"pruned read changed the answer: $a vs $b")
        (tFull, tPruned)
      }
      val fmt = rounds.map { case (f, p) => f"$f%.2f/$p%.2f" }.mkString(" ")
      println(f"[prune_probe] $dir rows=$n years=$y0..$y1 probe=$probe " +
        f"files_listed full=$filesFull pruned=$filesPruned " +
        f"(${filesPruned.toDouble / filesFull * 100}%.0f%%) " +
        f"wall full/pruned per round: $fmt s " +
        "(skipping happens BEFORE listing — at 100 TB the file-listing " +
        "ratio IS the win)")
    }
    spark.stop()
  }
}
