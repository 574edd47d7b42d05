package graft

// Dev tool: cost of evolving the stored IVF index vs rebuilding it when
// the corpus moves on (round 14; round 15 adds the segment-append
// layout). Per SF dir: generation 1 = 99% of the embeddings (cold full
// build: fit + full assignment + clustered write), generation 2 = the
// full corpus — a PURE APPEND, so the evolve path now commits only a
// delta-sized segment (NO refit, delta-only scoring, delta-only WRITE)
// vs a from-scratch rebuild of the same generation under a fresh key.
// Reported: wall times AND bytes written by the evolve commit vs the
// total postings size — the write-cost-proportional-to-delta claim,
// measured (VERDICT r14 item 1; the r14 layout rewrote the whole
// postings table per generation). Args: SF dirs (default sf0.1; pass
// /tmp/sfx10_all and /tmp/sfx100 for the growth rows).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

object EvolveProbe {
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
      val emb = Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      val nCells = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
      val g1 = emb.filter(col("vec_id") % 100 =!= 0)
      val run = System.nanoTime() // key salt: fresh tables per invocation
      val key = s"evolve_probe|$dir|$run"
      val (_, tBuild) = time {
        VectorOps.ivfIndexEvolving(g1, "vec_id", "embedding", nCells,
          storeKey = key, contentTag = Some("gen1"))._1.count()
      }
      val (n2, tEvolve) = time {
        VectorOps.ivfIndexEvolving(emb, "vec_id", "embedding", nCells,
          storeKey = key, contentTag = Some("gen2"))._1.count()
      }
      val (n3, tRebuild) = time {
        VectorOps.ivfIndexEvolving(emb, "vec_id", "embedding", nCells,
          storeKey = s"$key|fresh", contentTag = Some("gen2"))._1.count()
      }
      require(n2 == n && n3 == n, s"row drift: corpus=$n evolved=$n2 rebuilt=$n3")
      // write-cost audit: the evolve commit's segment vs the whole table.
      // The evolved table is located by its EXACT store key (the same
      // builder ivfIndexEvolving uses — review fix: a name-fragment
      // search silently depended on the salt surviving the table-name
      // prefix truncation, and a segment-count heuristic broke the
      // moment compaction promoted the append)
      val tableDir = new java.io.File(
        graft.ops.SlateStore.sessionTempRoot(spark),
        graft.ops.SlateStore.tableName(
          VectorOps.ivfEvolvingPostingsKey(key, "vec_id", "embedding", nCells)))
        .ensuring(_.isDirectory, "evolved postings table dir")
      def du(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
      val segs = new java.io.File(tableDir, "segs").listFiles()
        .filter(_.getName.startsWith("__seg="))
      val deltaBytes = du(segs.maxBy(_.lastModified())) // the append's segment
      val totalBytes = segs.map(du).sum
      println(f"[evolve_probe] $dir rows=$n nCells=$nCells " +
        f"gen1_full_build=$tBuild%.2fs evolve_to_gen2=$tEvolve%.2fs " +
        f"gen2_fresh_rebuild=$tRebuild%.2fs " +
        f"saved=${(tRebuild - tEvolve) / tRebuild * 100}%.0f%% " +
        f"append_wrote=${deltaBytes}B of ${totalBytes}B total " +
        f"(${deltaBytes.toDouble / totalBytes * 100}%.1f%% — " +
        "write cost follows the delta, not the corpus)")
    }
    spark.stop()
  }
}
