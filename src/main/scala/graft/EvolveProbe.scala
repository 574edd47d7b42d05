package graft

// Dev tool: cost of evolving the stored IVF index vs rebuilding it when
// the corpus moves on (round 14). Per SF dir: generation 1 = 99% of the
// embeddings (cold full build: fit + full assignment + clustered write),
// generation 2 = the full corpus (evolve: NO refit, delta-only scoring,
// keep∪fresh recommit) vs a from-scratch rebuild of the same generation
// under a fresh key. The delta between "evolve" and "rebuild" is the
// fit + full-corpus re-scoring a naive nightly pipeline pays; the floor
// under both is the postings write (single-snapshot contract — the
// honest bound REGRESSIONS documents). Args: SF dirs (default sf0.1;
// pass /tmp/sfx10_all and /tmp/sfx100 for the growth rows).
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
      println(f"[evolve_probe] $dir rows=$n nCells=$nCells " +
        f"gen1_full_build=$tBuild%.2fs evolve_to_gen2=$tEvolve%.2fs " +
        f"gen2_fresh_rebuild=$tRebuild%.2fs " +
        f"saved=${(tRebuild - tEvolve) / tRebuild * 100}%.0f%%")
    }
    spark.stop()
  }
}
