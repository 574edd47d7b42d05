package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, LlmOps, Relational}

/** Connected components (pairs → dedup clusters) + the new sampling and
  * repetition operators.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("components: chain, clique, and isolated edge each get one min label") {
    // chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    // clique 10-11-12, lone edge 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val got = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components: edge direction is irrelevant (undirected semantics)") {
    val a = Graph.connectedComponents(Seq((5L, 3L), (3L, 9L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    val b = Graph.connectedComponents(Seq((3L, 5L), (9L, 3L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(a == b && a.values.toSet == Set(3L))
  }

  test("dedupClusters: one survivor per cluster, unpaired docs survive") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (7L, "y")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Graph.dedupClusters(docs, pairs, "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (7L, 7L, true)))
  }

  test("FromLabels variants over a stored-round-trip label table match the direct ops (r17)") {
    // the slate shares ONE componentLabels store entry between
    // dedup_clusters and dedup_quality_survivor; labels survive a parquet
    // round trip exactly (long/long), so the split must be invisible
    val docs = Seq((1L, 50L), (2L, 90L), (3L, 90L), (7L, 10L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val tmp = java.nio.file.Files.createTempDirectory("labels").toString
    Graph.componentLabels(pairs).write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    val direct = Graph.dedupClusters(docs, pairs, "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    val viaLabels = Graph.dedupClustersFromLabels(docs, stored, "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(direct == viaLabels)
    val directBy = Graph.dedupClustersBy(docs, pairs, "doc_id", "n_chars")
      .as[(Long, Long, Boolean)].collect().toSet
    val viaLabelsBy = Graph.dedupClustersByFromLabels(docs, stored, "doc_id", "n_chars")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(directBy == viaLabelsBy)
  }

  test("dedupClustersBy: highest-score doc survives per cluster, ties to min id") {
    val docs = Seq((1L, 50L), (2L, 90L), (3L, 90L), (7L, 10L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Graph.dedupClustersBy(docs, pairs, "doc_id", "n_chars")
      .as[(Long, Long, Boolean)].collect().toSet
    // cluster {1,2,3}: 2 and 3 tie on score 90, 2 wins on id; 7 unpaired
    assert(out == Set((1L, 1L, false), (2L, 1L, true), (3L, 1L, false), (7L, 7L, true)))
    // exactly one survivor per cluster, always
    val perCluster = out.groupBy(_._2).view.mapValues(_.count(_._3)).toMap
    assert(perCluster.values.forall(_ == 1))
  }

  test("pointer doubling: a 200-node chain converges within O(log n) rounds") {
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    // diameter 199; plain propagation would need ~200 rounds — doubling
    // needs ~log2(199)+2. maxIter 12 proves the doubling hop is active.
    val got = Graph.connectedComponents(chain, "src", "dst", maxIter = 12)
      .as[(Long, Long)].collect()
    assert(got.length == 200 && got.forall(_._2 == 1L))
  }

  test("exceeding maxIter fails loudly instead of returning wrong labels") {
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.connectedComponents(chain, "src", "dst", maxIter = 2)
    }
  }

  test("property: components match a driver-side union-find on random graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(50)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // component min among nodes that appear in edges
          val root = find(v.toInt)
          edges.flatMap(e => Seq(e._1, e._2)).distinct
            .filter(u => find(u.toInt) == root).min
        }).toMap
      val got = Graph.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial diverged")
    }
  }

  test("star contraction: labels match pointer doubling on chain+clique+random") {
    val fixed = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val a = Graph.connectedComponents(fixed, "src", "dst").as[(Long, Long)].collect().toMap
    val b = Graph.connectedComponents(fixed, "src", "dst", starContraction = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // self-loops left IN: both modes must label a (x, x)-only node x
      val edges = Seq.fill(60)((rng.nextInt(50).toLong, rng.nextInt(50).toLong))
        .toDF("src", "dst")
      val dbl = Graph.connectedComponents(edges, "src", "dst").as[(Long, Long)].collect().toMap
      val star = Graph.connectedComponents(edges, "src", "dst", starContraction = true)
        .as[(Long, Long)].collect().toMap
      assert(dbl == star, s"trial $trial diverged")
    }
  }

  test("star contraction: a node appearing only in self-loops is labeled itself") {
    val edges = Seq((5L, 5L), (1L, 2L)).toDF("src", "dst")
    val dbl = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val star = Graph.connectedComponents(edges, "src", "dst", starContraction = true)
      .as[(Long, Long)].collect().toMap
    assert(star == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
    assert(dbl == star)
  }

  test("star contraction: a million-node chain converges (adversarial diameter)") {
    // Diameter 10^6 - 1: plain propagation needs ~10^6 rounds; pointer
    // doubling needs ~20 (fine, but each round carries the full label set
    // and the maxIter guard is the only defence). Star contraction SHRINKS
    // the edge set per round and converges with no diameter dependence —
    // this is the documented escape hatch, now exercised.
    val n = 1000000L
    val chain = spark.range(1, n).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val labels = Graph.connectedComponents(chain, "src", "dst", starContraction = true)
    val agg = labels.agg(count(lit(1)), countDistinct(col("label")), min(col("label")))
      .as[(Long, Long, Long)].head()
    assert(agg == ((n, 1L, 1L)), s"expected $n nodes, one component rooted at 1, got $agg")
  }

  test("promotion trigger: average degree 2|E|/|N| against the factor") {
    // dedup near-clique shape: modest degree stays on label propagation
    assert(!Graph.chooseStarContraction(nNodes = 1000, nEdges = 1500))
    // dense co-occurrence shape: degree 2*40000/1000 = 80 promotes
    assert(Graph.chooseStarContraction(nNodes = 1000, nEdges = 40000))
    // exactly at the factor promotes (>=), size-independent either way
    assert(Graph.chooseStarContraction(nNodes = 4, nEdges = 16))
    assert(!Graph.chooseStarContraction(nNodes = 4, nEdges = 15))
    assert(!Graph.chooseStarContraction(nNodes = 0, nEdges = 0))
  }

  test("auto closure: adversarial 2000-node chain and a dense block both label correctly") {
    // chain: avg degree ~2 keeps label propagation (pointer doubling
    // handles the diameter in O(log n) rounds) — auto must complete and
    // match the explicit star run
    val chain = spark.range(1, 2000)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val auto = Graph.connectedComponentsAuto(chain, "src", "dst")
      .agg(count(lit(1)), countDistinct(col("label")), min(col("label")))
      .as[(Long, Long, Long)].head()
    assert(auto == ((2000L, 1L, 1L)))
    // dense block: 40 nodes fully meshed (avg degree 39 >= 8) routes to
    // star contraction; labels still the component minimum everywhere
    val mesh = (0L until 40L).flatMap(a => (a + 1 until 40L).map(b => (a, b)))
      .toDF("src", "dst")
    val got = Graph.connectedComponentsAuto(mesh, "src", "dst")
      .as[(Long, Long)].collect()
    assert(got.length == 40 && got.forall(_._2 == 0L))
  }

  test("dedupClusters default (auto) routes and matches both explicit modes") {
    val docs = (1L to 12L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L)).toDF("id_a", "id_b")
    def rows(sc: Option[Boolean]) =
      Graph.dedupClusters(docs, pairs, "doc_id", starContraction = sc)
        .as[(Long, Long, Boolean)].collect().toSet
    val auto = rows(None)
    assert(auto == rows(Some(false)) && auto == rows(Some(true)))
    assert(auto.count(_._3) == 12 - 4) // non-survivors 2,3,6,11 dropped
  }

  test("empty edge set: every doc is its own surviving cluster") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = Graph.dedupClusters(docs, noPairs, "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((1L, 1L, true), (2L, 2L, true)))
  }

  test("repetition score: looped text scores high, novel text zero") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight completely distinct words appear exactly once here")).toDF("doc_id", "text")
    val got = LlmOps.repetitionScore(docs, "doc_id", "text")
      .select("doc_id", "repetition").as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.8, s"looped text scored ${got(1L)}")
    assert(got(2L) == 0.0)
    // a doc shorter than the shingle width collapses to one catch-all
    // shingle (n_shingles >= 1 always), so short docs score 0.0 — and the
    // op's zero-denominator guard means even an empty shingle column
    // could never ANSI-crash the scan
    val short = LlmOps.repetitionScore(
      Seq((3L, "ab")).toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "repetition").as[(Long, Option[Double])].collect()
    assert(short.toSeq == Seq((3L, Some(0.0))))
  }

  test("sequence packing: contiguous budgets per shard, monotone pack ids") {
    val df = Seq(
      (1L, "a", 400L), (2L, "a", 400L), (3L, "a", 400L), // 400+400 | 400
      (4L, "a", 900L),                                   // starts at 1200 → pack 1
      (5L, "b", 100L), (6L, "b", 100L))                  // shard b packs alone
      .toDF("doc_id", "shard", "n_tokens")
    val got = LlmOps.packSequences(df, "doc_id", "n_tokens", "shard", budget = 1000)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> 0L))
    // doc 3 starts at offset 800 (pack 0); doc 4 at 1200 (pack 1); shard b
    // restarts at 0 — budgets never leak across shards
  }

  test("hash sample: deterministic, ~1/m overall, stratification-preserving") {
    val df = spark.range(10000).select($"id",
      (pmod($"id", lit(4))).cast("string").as("grp"))
    val s1 = Relational.hashSample(df, "id", 10)
    val s2 = Relational.hashSample(df, "id", 10)
    assert(s1.exceptAll(s2).isEmpty) // identical rows every run
    val n = s1.count()
    assert(n > 800 && n < 1200, s"overall rate off: $n/10000")
    val perGroup = s1.groupBy("grp").count().as[(String, Long)].collect().toMap
    perGroup.values.foreach(c => assert(c > 150 && c < 350, s"stratum skew: $perGroup"))
  }

  test("pageRank: one round of the integer recurrence, hand-computed") {
    // star 1→{2,3}: node 1 splits its mass, sinks keep only teleport
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 1)
      .as[(Long, Long)].collect().toMap
    // pr(1) = 15% of scale (no in-edges); pr(2)=pr(3) = teleport +
    // (85 * (1e9 div 2)) div 100 = 150e6 + 425e6
    assert(pr == Map(1L -> 150000000L, 2L -> 575000000L, 3L -> 575000000L))
  }

  test("pageRank: regular graph is a fixed point at full scale") {
    // 3-cycle: every node has outdeg 1 and indegree 1, so each round maps
    // scale → teleport + 85% scale = scale; uniform rank survives any
    // number of iterations — the mass-conservation invariant
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(pr == Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L))
  }

  test("property: pageRank matches a driver-side integer reference on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 3 + rnd.nextInt(15)
      val edges = Seq.fill(5 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val iters = 1 + rnd.nextInt(4)
        val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
          .as[(Long, Long)].collect().toMap
        // reference: the same recurrence in plain Scala Long arithmetic
        val dedup = edges.distinct
        val nodes = dedup.flatMap(e => Seq(e._1, e._2)).distinct
        val outdeg = dedup.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val scale = 1000000000L
        var pr = nodes.map(_ -> scale).toMap
        (1 to iters).foreach { _ =>
          val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
          dedup.foreach { case (u, v) => in(v) += pr(u) / outdeg(u) }
          pr = nodes.map(x => x -> ((15L * scale) / 100L + (85L * in(x)) / 100L)).toMap
        }
        assert(got == pr, s"trial $trial (n=$n, iters=$iters): $got != $pr")
      }
    }
  }

  test("pageRank: duplicate edges collapse; hub outranks leaves") {
    // leaves 2,3,4 all point at hub 1 (edge 2→1 duplicated — must count
    // once in outdeg); hub points back at 2 only
    val edges = Seq((2L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(pr(1L) > pr(2L) && pr(2L) > pr(3L), s"unexpected ranking: $pr")
    assert(pr(3L) == pr(4L)) // symmetric leaves tie exactly in integer math
  }
}
