package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components — the step that turns near-duplicate
  * PAIRS into duplicate CLUSTERS (pick one survivor per component, drop
  * the rest). A dedup pipeline that stops at pairs hasn't deduplicated
  * anything yet; transitive closure is where the drop-list comes from.
  *
  * Algorithm: iterative min-label propagation WITH pointer doubling.
  * Every node starts labeled with itself; each round a node takes the
  * minimum of (its own label, its neighbors' labels, its label's label —
  * the doubling hop that halves remaining path lengths); fixed point =
  * component-minimum everywhere. Each round is two shuffles over the edge
  * and label sets (join + map-side-partial min aggregation), and
  * `localCheckpoint` truncates the growing plan lineage so round N doesn't
  * pay round N-1's analysis again.
  *
  * Scale posture: the doubling hop bounds rounds at O(log diameter) — a
  * million-node chain converges in ~20 rounds — while dedup graphs
  * (near-cliques around shared content) still finish in 2-3. No all-pairs
  * state anywhere; per-round state is exactly one (node, label) row per
  * node. The alternating star-contraction of Kiveris et al. ("Connected
  * Components in MapReduce", SOCC'14) additionally shrinks the EDGE set
  * per round — the upgrade path if edge-volume (not round count) ever
  * dominates; `maxIter` guards regressions loudly either way.
  */
object Graph {

  /** In-slate shared co-fulfillment edge artifact (VERDICT r11 item 3):
    * the "suppliers sharing ≥ minShared orders" edge census — one shuffle
    * to per-order supplier sets (collect_set dedupes map-side, set size
    * bounded by the order's line count), in-row pair expansion, one pair
    * aggregate — is consumed by FOUR declared queries (triangle census,
    * DOULION sample, assortativity, modularity). Built inline it was paid
    * four times per slate run (10.9–12.6 s EACH at the 10× probe). This
    * builds it ONCE per (session, storeKey, minShared) and shares the
    * materialized relation.
    *
    * The artifact is a PARQUET round-trip, not persist/localCheckpoint:
    * the slate runners clearCache() after every query (a cached artifact
    * would be recomputed per consumer), and a checkpointed RDD enters the
    * downstream census as a stats-less LogicalRDD — measured 1.5–2× WORSE
    * wedge-join planning at the 10× probe than the plain inline build.
    * Re-reading the written table gives every consumer an ordinary
    * statistics-bearing scan (pruning, AQE broadcasts). This is exactly
    * the write-once derived edge TABLE a 100 TB graph-metrics suite
    * materializes first (the [[graft.ops.LlmOps.fingerprintStore]]
    * discipline) — bounded, |supplier-pairs| rows, orders of magnitude
    * under lineitem. The build is attributed to the first consumer.
    *
    * r13: backed by [[SlateStore.parquet]] (the unified managed-table
    * layer) — snapshot-committed, schema-captured reads (an EMPTY
    * lineitem yields zero edges instead of failing schema inference),
    * session-scoped GC, optional cross-session reuse under
    * `spark.graft.store.dir`.
    */
  def coFulfillmentEdges(lineitem: DataFrame, storeKey: String,
                         minShared: Int = 4,
                         contentTag: Option[String] = None): DataFrame =
    SlateStore.parquet(lineitem.sparkSession,
      s"cofulfill|$storeKey|min=$minShared", contentTag) {
      lineitem
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("sks"))
        .select(explode(Assoc.pairStructsBest(lineitem, col("sks"))).as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= minShared)
    }

  /** Label every node of the undirected edge set with its component's
    * minimum node id. Returns (node, label); nodes absent from `edges`
    * are absent from the result (callers left-join and coalesce to self).
    *
    * `starContraction = true` switches to the alternating star-contraction
    * of Kiveris et al. (SOCC'14) — see [[connectedComponentsStar]] — which
    * SHRINKS the edge set every round instead of carrying it whole, the
    * right trade when edge volume (not round count) dominates, and the
    * escape hatch for adversarial long-diameter graphs where the label
    * propagation's `maxIter` guard would fire.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          starContraction: Boolean = false): DataFrame = {
    if (starContraction)
      return connectedComponentsStar(edges, srcCol, dstCol, math.max(maxIter, 50))
    val sym = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .union(edges.select(col(dstCol).as("__s"), col(srcCol).as("__d")))
      .distinct()
      .persist()

    var labels = sym.select(col("__s").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // Convergence via the label-sum invariant: labels only ever DECREASE,
    // so the (exact decimal — no overflow at any scale) sum strictly drops
    // every round that changed anything and the fixed point is "sum
    // unchanged". One cheap aggregate over the fresh checkpoint instead of
    // a compare-join against the previous round.
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels) // null iff the edge set is empty
    var converged = prevSum == null
    var iter = 0
    while (!converged && iter < maxIter) {
      // ONE join + ONE aggregation per round: self-loops, real edges and
      // pointer edges (x → label(x)) are unioned into a single relation,
      // so min-of{own label, neighbor labels, label(label(x))} is
      // min(label(d)) over that relation — the three separate joins the
      // naive formulation pays (neighbor-min, doubling hop, left-join
      // merge) collapse into one shuffle.
      val rel = sym
        .union(labels.select(col("node"), col("node")))   // self: label(x)
        .union(labels.select(col("node"), col("label")))  // hop: label(label(x))
        .toDF("__s", "__d")
      val next = rel
        .join(labels.select(col("node").as("__d2"), col("label").as("__dl")),
          col("__d") === col("__d2"))
        .groupBy(col("__s"))
        .agg(min(col("__dl")).as("label"))
        .select(col("__s").as("node"), col("label"))
        .localCheckpoint() // eager: materializes and cuts lineage
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      // round N−1's label blocks are dead once round N materializes (r18)
      Ckpt.release(labels)
      labels = next
      iter += 1
    }
    sym.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "pathological chain graph; use star-contraction rounds instead")
    labels
  }

  /** The edge-volume promotion trigger behind [[connectedComponentsAuto]],
    * exposed for direct spec coverage. Label propagation re-carries the
    * FULL symmetric edge set every round (its per-round relation is
    * ~2|E| + 2|N| rows) and wins on the shallow near-clique graphs dedup
    * actually produces (2-3 rounds); star contraction pays more rounds
    * but monotonically SHRINKS the edge set, winning once per-round edge
    * volume dominates — i.e. when average degree 2|E|/|N| clears
    * `starEdgeFactor`. Degree, not raw |E|: a billion-node graph of tiny
    * components is label-propagation territory at any absolute edge
    * count, while a dense co-occurrence graph promotes at any size.
    */
  def chooseStarContraction(nNodes: Long, nEdges: Long,
                            starEdgeFactor: Double = 8.0): Boolean =
    nNodes > 0 && 2.0 * nEdges / nNodes >= starEdgeFactor

  /** [[connectedComponents]] with the mode picked by the documented
    * edge-volume heuristic: one cheap pre-pass counts distinct undirected
    * edges and nodes (amortized against the O(rounds·|E|) closure), then
    * [[chooseStarContraction]] routes. Callers that know their graph
    * shape pass the explicit flag; pipelines over arbitrary pair sets use
    * this.
    */
  def connectedComponentsAuto(edges: DataFrame, srcCol: String, dstCol: String,
                              maxIter: Int = 25,
                              starEdgeFactor: Double = 8.0): DataFrame = {
    // ONE materialization + ONE stats job (r18, guide §1.2): the previous
    // shape ran und.count() and then RE-DERIVED the whole distinct for the
    // node count (two full passes over the pair set), and the chosen
    // closure then re-derived its symmetric form from the RAW edges a
    // third time. Checkpoint the canonical set once, read both counts
    // from one exploded aggregate (count(*)/2 = |edges|, each edge emits
    // both endpoints), and hand the closure the canonical set — identical
    // components: sym(und) == sym(raw) for both closure modes.
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .distinct()
      .localCheckpoint(eager = true)
    val st = und.select(explode(array(col("__a"), col("__b"))).as("__n"))
      .agg(count(lit(1)).as("__c"), countDistinct(col("__n")).as("__d"))
      .head()
    val nEdges = st.getLong(0) / 2
    val nNodes = st.getLong(1)
    val out = connectedComponents(und, "__a", "__b", maxIter,
      starContraction = chooseStarContraction(nNodes, nEdges, starEdgeFactor))
    // both closure modes return plans over their own eager checkpoints —
    // the canonical edge set's blocks are dead now
    Ckpt.release(und)
    out
  }

  /** Mode routing for the dedup entry points: an explicit caller choice
    * wins; `None` takes the [[connectedComponentsAuto]] edge-volume
    * heuristic.
    */
  private def closure(edges: DataFrame,
                      starContraction: Option[Boolean]): DataFrame =
    starContraction match {
      case Some(mode) =>
        connectedComponents(edges, "id_a", "id_b", starContraction = mode)
      case None => connectedComponentsAuto(edges, "id_a", "id_b")
    }

  /** Alternating star-contraction connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SOCC'14).
    *
    * Two edge-rewriting operations alternate until the edge set is a fixed
    * point of their composition:
    *
    *  - '''large-star''': per node u, link every STRICTLY LARGER neighbor
    *    to m(u) = min(Γ(u) ∪ u) — long chains collapse toward local
    *    minima;
    *  - '''small-star''': orient each edge to its larger endpoint; per
    *    node u, link u and all its (smaller) neighbors to their minimum —
    *    multi-level trees flatten into stars.
    *
    * Both are an aggregation (min per node) plus a join back — no
    * neighbor-list materialization, so a hot node costs no more memory
    * than a cold one — and both only ever REPLACE edges with edges toward
    * smaller ids, so the edge set monotonically contracts toward
    * min-rooted stars: (leaf → component minimum) rows, which ARE the
    * label rows. Unlike label propagation the working set SHRINKS every
    * round (duplicate edges merge via distinct), and convergence needs
    * O(log² n) rounds on adversarial graphs with no diameter dependence —
    * the paper proves the fixed point is exactly the min-rooted star
    * forest.
    *
    * Convergence detection: (count, Σ xxhash64(s,d)) of the deduped edge
    * set — equal stats across one full large+small round ⇒ the set mapped
    * to itself (hash-sum collision odds are negligible), i.e. fixed point.
    */
  def connectedComponentsStar(edges: DataFrame, srcCol: String, dstCol: String,
                              maxIter: Int = 50): DataFrame = {
    // Node universe BEFORE dropping self-loops: a node appearing only in
    // (x, x) edges must still come back labeled with itself — the same
    // contract the label-propagation mode honors (both modes of
    // connectedComponents must return identical row sets).
    val allNodes = edges.select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node")))
      .distinct()
      .localCheckpoint()
    var e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s") =!= col("__d"))
      .distinct()
      .localCheckpoint()

    def stats(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("__s"), col("__d")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }

    def largeStar(df: DataFrame): DataFrame = {
      val sym = df.union(df.select(col("__d").as("__s"), col("__s").as("__d")))
      val m = sym.groupBy("__s").agg(min(col("__d")).as("__mn"))
        .select(col("__s").as("__u"), least(col("__s"), col("__mn")).as("__m"))
      sym.join(m, col("__s") === col("__u"))
        .filter(col("__d") > col("__s"))
        .select(col("__d").as("__s"), col("__m").as("__d"))
        .distinct()
    }

    def smallStar(df: DataFrame): DataFrame = {
      val oriented = df.select(greatest(col("__s"), col("__d")).as("__u"),
        least(col("__s"), col("__d")).as("__v"))
      val m = oriented.groupBy("__u").agg(min(col("__v")).as("__m"))
      val uEdges = m.select(col("__u").as("__s"), col("__m").as("__d"))
      val vEdges = oriented.join(m, "__u")
        .filter(col("__v") =!= col("__m"))
        .select(col("__v").as("__s"), col("__m").as("__d"))
      uEdges.union(vEdges).distinct()
    }

    var prev: (Long, java.math.BigDecimal) = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // round N−1's contracted edge blocks are dead once N materializes
      Ckpt.release(e)
      e = next
      val s = stats(e)
      converged = prev != null && s._1 == prev._1 &&
        ((s._2 == null && prev._2 == null) ||
          (s._2 != null && prev._2 != null && s._2.compareTo(prev._2) == 0))
      prev = s
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // Fixed point = min-rooted stars: every non-root node appears exactly
    // once as __s pointing at its component minimum; roots (and nodes that
    // only ever appeared in self-loops) label themselves via the coalesce.
    allNodes
      .join(e.select(col("__s").as("node"), col("__d").as("label")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
  }

  /** Full dedup clustering over a document table: near-dup pairs →
    * components → (doc_id, cluster_id, keep) where `keep` marks the one
    * survivor (minimum id) per cluster. Docs in no pair survive trivially.
    */
  def dedupClusters(docs: DataFrame, pairs: DataFrame, idCol: String,
                    starContraction: Option[Boolean] = None): DataFrame =
    dedupClustersFromLabels(docs, componentLabels(pairs, starContraction),
      idCol)

  /** The component LABEL table (node, label) of a near-dup pair set — the
    * transitive-closure half of [[dedupClusters]]/[[dedupClustersBy]],
    * exposed separately (r17) so several survivor-rule consumers in one
    * run can share ONE closure (e.g. through a SlateStore table keyed on
    * the same corpus tag as the pairs), instead of re-running the
    * iterative components per consumer. Materializes the (tiny) pair set
    * once: `sym` unions two projections of it and every closure round
    * re-reads it — without this the whole MinHash pair pipeline upstream
    * would be re-derived per branch.
    */
  def componentLabels(pairs: DataFrame,
                      starContraction: Option[Boolean] = None): DataFrame = {
    val edges = pairs.select("id_a", "id_b").localCheckpoint()
    val out = closure(edges, starContraction)
    // every closure mode returns a plan over its own eager checkpoints
    // (final labels, or allNodes ⋈ star fixed point) — the materialized
    // pair set's blocks are dead now (r18, guide §5)
    Ckpt.release(edges)
    out
  }

  /** [[dedupClusters]] over a PRECOMPUTED label table — same output by
    * construction (the delegating overload above is the spec'd identity).
    */
  def dedupClustersFromLabels(docs: DataFrame, labels: DataFrame,
                              idCol: String): DataFrame =
    docs.select(col(idCol))
      .join(labels, col(idCol) === col("node"), "left")
      .select(col(idCol),
        coalesce(col("label"), col(idCol)).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))

  /** Fixed-iteration PageRank in INTEGER arithmetic — node importance over
    * a directed edge set (here: the customer↔supplier interaction graph a
    * curation pipeline uses to weight sources by connectivity).
    *
    * Why integers: float PageRank sums contributions in partition order,
    * so two runs (or two engines) disagree in the low bits and no external
    * oracle can hash-match it. Scaling ranks by `scale` and using integer
    * division (`div`, floor for the all-positive values here) makes every
    * iteration a pure function of the edge set — longs sum associatively —
    * so an external SQL engine replays the run digit-for-digit:
    *
    *   pr_0(v)     = scale
    *   pr_{k+1}(v) = (15*scale) div 100
    *               + (85 * Σ_{u→v} (pr_k(u) div outdeg(u))) div 100
    *
    * Dangling nodes (outdeg 0) contribute nothing — the standard
    * leaked-mass simplification; node universe = all edge endpoints.
    *
    * Scale shape: per iteration ONE join (ranks ⋈ edges on src — the
    * deduped edge set is checkpointed once and its blocks never move
    * again; the rank side is one row per NODE, orders of magnitude
    * smaller than the edges, so AQE broadcasts it when it fits) + ONE
    * map-side-partial sum on dst. Rank state never exceeds one (node,
    * outdeg, pr) row per node; `localCheckpoint` cuts the growing lineage
    * exactly like [[connectedComponents]]. Overflow headroom: 85 · Σ pr
    * ≤ 85 · N · scale, so scale=1e9 is safe to ~1e8 nodes per component.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && scale >= 100L, "need >=1 iteration, scale >= 100")
    // Materialize AFTER the dedup shuffle: every iteration re-reads the
    // edge set as checkpointed (src, dst) longs. No extra repartition —
    // the rank side is one row per node (orders of magnitude smaller), so
    // AQE broadcasts it and the edge blocks never move again. r17: eager
    // localCheckpoint instead of the lazy persist() — the out-degree
    // aggregate and iteration 1's join consume `e` as concurrent AQE
    // query stages, and a lazy cache let both recompute the distinct
    // (same double-materialization the kCorePeel stage table showed);
    // checkpointing pins the edge blocks once (warm 5.2 s → 4.4 s, and
    // 3.1 s with the caller-side redundant distinct also gone).
    val e = edges.select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .distinct()
      .localCheckpoint(eager = true)
    // node universe + out-degrees in ONE aggregation: each edge emits
    // (src, 1) and (dst, 0), so sum(c) per node is the out-degree and
    // dst-only (dangling) nodes appear with outdeg 0 — replacing the
    // naive distinct-nodes + degree-agg + left-join (three shuffles)
    // with a single explode + groupBy.
    var pr = e.select(explode(array(
        struct(col("__src").as("n"), lit(1L).as("c")),
        struct(col("__dst").as("n"), lit(0L).as("c")))).as("x"))
      .groupBy(col("x.n").as("node"))
      .agg(sum(col("x.c")).as("outdeg"))
      .select(col("node"), col("outdeg"), lit(scale).as("pr"))
      .localCheckpoint()
    val teleport = (15L * scale) / 100L
    for (_ <- 1 to iterations) {
      val contrib = pr.filter(col("outdeg") > 0)
        .select(col("node").as("__psrc"), expr("pr div outdeg").as("__c"))
        .join(e, col("__psrc") === col("__src"))
        .groupBy(col("__dst"))
        .agg(sum(col("__c")).as("__in_mass"))
        .select(col("__dst").as("node"), col("__in_mass"))
      val next = pr.select(col("node"), col("outdeg"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("outdeg"),
          (lit(teleport) +
            expr("(85 * coalesce(__in_mass, 0L)) div 100")).as("pr"))
        .localCheckpoint()
      // iteration N−1's rank blocks are dead once N is materialized (r18)
      Ckpt.release(pr)
      pr = next
    }
    // the returned plan reads only the final rank checkpoint — the edge
    // blocks are done too
    Ckpt.release(e)
    pr.select(col("node"), col("pr"))
  }

  /** [[dedupClusters]] with a QUALITY survivor rule: the kept doc per
    * duplicate cluster is the one maximizing `scoreCol` (ties broken by
    * minimum id) instead of the minimum id — what production curation
    * actually ships, where near-dup groups keep the longest / highest-
    * quality variant rather than whichever crawled first. Deterministic:
    * the (score desc, id asc) order is total.
    *
    * Scale shape: identical to [[dedupClusters]] (the closure dominates)
    * plus one row_number window partitioned by cluster_id — cluster ids
    * are high-cardinality (most clusters are singletons), so the window
    * never funnels into few partitions.
    */
  def dedupClustersBy(docs: DataFrame, pairs: DataFrame, idCol: String,
                      scoreCol: String,
                      starContraction: Option[Boolean] = None): DataFrame =
    dedupClustersByFromLabels(docs,
      componentLabels(pairs, starContraction), idCol, scoreCol)

  /** [[dedupClustersBy]] over a PRECOMPUTED label table. */
  def dedupClustersByFromLabels(docs: DataFrame, labels: DataFrame,
                                idCol: String, scoreCol: String): DataFrame = {
    val labeled = docs.select(col(idCol), col(scoreCol))
      .join(labels, col(idCol) === col("node"), "left")
      .select(col(idCol), col(scoreCol),
        coalesce(col("label"), col(idCol)).as("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    labeled
      .withColumn("keep", row_number().over(w) === 1)
      .select(col(idCol), col("cluster_id"), col("keep"))
  }

  /** Exact triangle count + global transitivity of an undirected graph,
    * by DEGREE-ORDERED edge orientation (Cohen CiSE'09 / Suri-Vassilvitskii
    * WWW'11 — the MapReduce-classic that makes triangle counting feasible
    * on power-law graphs): orient every edge from its (degree, id)-smaller
    * endpoint to the larger, build wedges only at each edge's LOW-degree
    * end, and close them against the oriented edge set. Per-node wedge
    * work drops from deg² (a hub explodes) to out-deg² ≤ O(√|E|) — the
    * property that keeps the shuffle bounded on skewed co-occurrence
    * graphs at 100 TB.
    *
    * Input: an edge list, any orientation/duplication; self-loops are
    * dropped and (a,b)/(b,a) collapse to one canonical edge first. Each
    * triangle is counted EXACTLY once (its three oriented edges form one
    * wedge at the rank-lowest vertex plus one closing edge). Output is a
    * single roll-up row: nodes, edges, triangles, and transitivity
    * 3·T / Σ deg·(deg−1)/2 — exact integers until the one final division.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = true)
    val deg = canon.select(col("a").as("v"))
      .union(canon.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient by (degree, id): src is the tuple-smaller endpoint
    val withDeg = canon
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val oriented = withDeg.select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("t"), col("db").as("dt")))
          .otherwise(struct(col("b").as("s"), col("a").as("t"), col("da").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .localCheckpoint(eager = true)
    // wedges at the common low end, canonicalized once by the same order
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.s") === col("y.s")
        && (col("x.dt") < col("y.dt")
            || (col("x.dt") === col("y.dt") && col("x.t") < col("y.t"))))
      .select(col("x.t").as("s"), col("y.t").as("t"))
    val triangles = wedges
      .join(oriented.select("s", "t"), Seq("s", "t"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val degSums = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("d")) / 2).cast("long").as("n_edges"),
      // 2·Σ deg·(deg−1)/2, kept integral — transitivity divides by the
      // doubled path count (6T/2P₂ ≡ 3T/P₂) so no fractional sum appears
      sum(col("d") * (col("d") - 1)).as("__paths2x2"))
    degSums.crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        (lit(6.0) * col("n_triangles").cast("double")
          / nullif(col("__paths2x2").cast("double"), lit(0.0))).as("transitivity"))
  }

  /** DOULION edge-sampled triangle estimate (Tsourakakis et al., KDD'09):
    * keep each canonical undirected edge iff
    * `md5_48("a|b") mod den < num` — a DETERMINISTIC p = num/den edge
    * sample (the md5-48 portable-hash family, so an external SQL twin
    * replays the exact sampled subgraph) — run the same degree-ordered
    * census on the kept edges, and scale: E[T̂] = T_sampled / p³. The
    * wedge join (the exact operator's dominant, super-linear cost) now
    * runs on a p-fraction graph — wedge work shrinks ~p², the 100×
    * growth cap for the fixed-iteration census (VERDICT r8 item 7).
    * Output: the sampled census columns plus the den³/num³-scaled
    * `n_triangles_est` (Doulion is unbiased; variance ~1/p³, so pick
    * num/den by the accuracy the monitoring use case needs).
    */
  def triangleStatsSampled(edges: DataFrame, srcCol: String, dstCol: String,
                           num: Int, den: Int): DataFrame = {
    require(num > 0 && den >= num, s"triangleStatsSampled: bad rate $num/$den")
    val sampled = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .filter(pmod(graft.ops.LlmOps.md5Hash48(
        concat_ws("|", col("a"), col("b")), 1), lit(den)) < num)
    val scale = (den.toDouble / num.toDouble)
    val cube = scale * scale * scale
    triangleStats(sampled, "a", "b")
      .select(col("n_nodes").as("n_nodes_sampled"),
        col("n_edges").as("n_edges_sampled"),
        col("n_triangles").as("n_triangles_sampled"),
        (col("n_triangles").cast("double") * lit(cube)).as("n_triangles_est"))
  }

  /** Bounded k-hop reachability: breadth-first frontier expansion from a
    * seed set, exactly `hops` waves — "which nodes can a recall/abuse/
    * contagion signal reach in k steps". Per wave: one equi-join of the
    * CURRENT frontier (shrinking, often broadcastable — AQE decides)
    * against the edge list + one anti-join against the visited set; no
    * per-node state beyond (node, first_hop). Fixed waves keep it a
    * deterministic oracle-replayable query; the transitive closure is
    * this loop run to fixpoint.
    *
    * Output: (hop, n_reached) — hop 0 is the seed census.
    */
  def kHopReachability(edges: DataFrame, srcCol: String, dstCol: String,
                       seeds: DataFrame, seedCol: String,
                       hops: Int): DataFrame = {
    require(hops >= 1, s"kHopReachability: hops must be >= 1, got $hops")
    // ONE distinct pass + map-side emission of both orientations (r18):
    // the union-of-two-projections shape computed the distinct subtree
    // TWICE (Catalyst does no cross-branch CSE under a union), and the
    // per-hop lazy persist chain had the kCorePeel concurrent-query-stage
    // double-materialization hazard (VERDICT r17 item 4) plus a plan tree
    // that grew by the full frontier-join subtree per hop (133 KB of
    // formatted plan at 3 hops). Eager per-hop checkpoints make each
    // wave's work run exactly once; superseded blocks are released as
    // soon as their successor materializes (guide §5).
    val undirected = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b")).distinct()
    val sym = undirected
      .select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("__e"))
      .select(col("__e.a").as("a"), col("__e.b").as("b"))
      .localCheckpoint(eager = true)
    var visited = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hop", lit(0L)).localCheckpoint(eager = true)
    var frontier = visited.select(col("node"))
    var prevFrontier: DataFrame = null
    for (h <- 1 to hops) {
      val next = sym
        .join(frontier.withColumnRenamed("node", "a"), Seq("a"))
        .select(col("b").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(eager = true)
      val grown = visited.union(next.withColumn("hop", lit(h.toLong)))
        .localCheckpoint(eager = true)
      // the old visited set is folded into `grown`; hop N−1's frontier
      // served its join — both sets of blocks are dead now
      Ckpt.release(visited)
      if (prevFrontier != null) Ckpt.release(prevFrontier)
      visited = grown
      prevFrontier = next
      frontier = next
    }
    // the report below reads only the final visited checkpoint
    if (prevFrontier != null) Ckpt.release(prevFrontier)
    Ckpt.release(sym)
    // left-join a 0..hops spine so an exhausted frontier reports 0, not
    // a missing row (a reachability report with silent holes misreads)
    val spine = edges.sparkSession.range(hops + 1)
      .select(col("id").as("hop"))
    spine.join(
        visited.groupBy(col("hop"))
          .agg(count(lit(1)).cast("long").as("__n")),
        Seq("hop"), "left")
      .select(col("hop"), coalesce(col("__n"), lit(0L)).as("n_reached"))
  }

  /** Fixed-round k-core peeling probe: run exactly `rounds` rounds of
    * "drop every node with degree < k (and its edges)" over the undirected
    * edge set, then report each surviving node with its post-peel degree.
    * After enough rounds this converges to the classical k-core
    * (Seidman 1983 — the standard cohesion screen for engagement graphs
    * and the densest-region pre-filter before expensive clique/community
    * work); a FIXED round count keeps the operator a deterministic,
    * oracle-replayable query while still exposing the cascade — each round
    * is one observable peeling wave, which is itself the diagnostic (how
    * fast the graph sheds its periphery).
    *
    * Scale posture: per round, one map-side-combined degree aggregate over
    * the live edge set and two semi-joins back on the endpoint keys — no
    * per-node adjacency state, no global ordering anywhere; the edge set
    * only SHRINKS. `localCheckpoint` per round cuts the growing lineage
    * like the CC/PageRank loops above. The true-fixpoint variant is this
    * loop with a convergence count check; `rounds` is the bounded probe
    * the slate can hash-verify.
    */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, rounds: Int): DataFrame = {
    require(k > 0, s"kCorePeel: k must be positive, got $k")
    require(rounds >= 1, s"kCorePeel: rounds must be >= 1, got $rounds")
    // Each round's live HALF-edge set (|E| rows, not the 2|E| symmetrized
    // form — degrees come from exploding both endpoints map-side) is
    // materialized ONCE via an eager localCheckpoint and served to its two
    // consumers (the round's degree aggregate and the filter join). r17
    // measurement note: this replaced the r8–r16 lazy persist() chain —
    // under AQE the two consumers launch as concurrent query stages
    // before the lazy cache is populated, and the UI stage table showed
    // the distinct's map stage (and the lineitem scan feeding it)
    // executing TWICE per round; the cached-plan fragments also blocked
    // AQE's shuffle reuse. Eager checkpoints cut warm wall 5.6 s → 2.7 s
    // at sf0.1/32 cores (BenchOne ×3) and each round's work runs exactly
    // once at any scale. The alive set is an aggregate output orders of
    // magnitude under the edge count, so AQE turns both endpoint
    // semi-joins into broadcasts at any scale where the node set fits an
    // executor — and into shuffle joins when it doesn't, which is exactly
    // the fallback you want at 100 TB.
    // Canonicalize to least/greatest BEFORE distinct so input carrying
    // both orientations of one undirected edge collapses to a single
    // half-edge (otherwise each endpoint's degree double-counts), and
    // drop self-loops (which would add 2 to a node's degree and let it
    // survive peels it shouldn't). kHopReachability symmetrizes for
    // traversal; the peel needs the opposite normal form — exactly one
    // row per undirected edge.
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      val alive = e
        .select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("v"))
      val next = e
        .join(alive.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("v").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(eager = true)
      // round N−1's blocks are dead the moment round N materializes —
      // release them now instead of holding `rounds` live copies of the
      // (largest) relation until the context cleaner runs (r18, guide §5)
      Ckpt.release(e)
      e = next
    }
    e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).cast("long").as("degree"))
      .select(col("v").as("node"), col("degree"))
  }

  /** Degree assortativity of an undirected graph (Newman, PRL 2002) —
    * do hubs attach to hubs (r > 0, social-network shape) or to leaves
    * (r < 0, hub-and-spoke/core-periphery)? The single number that says
    * which skew-mitigation a graph pipeline needs: disassortative
    * graphs concentrate wedge work at hubs (salt/orient), assortative
    * ones concentrate it in dense cores (sample). Computed as the exact
    * Pearson correlation of endpoint degrees over the SYMMETRIZED edge
    * list — each edge contributes (d_u, d_v) and (d_v, d_u), making the
    * two marginals identical, so r = (nΣxy − (Σx)²)/(nΣx² − (Σx)²)
    * with every sum an exact DECIMAL(38,0) and ONE final divide.
    *
    * Scale shape: one degree aggregate, two node-keyed joins planting
    * degrees on edges (AQE broadcasts the degree table when small), one
    * 4-number aggregate. Nothing quadratic anywhere.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val e = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val deg = e.select(col("__a").as("__v"))
      .union(e.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__d"))
    val pairs = e
      .join(deg.select(col("__v").as("__a"), col("__d").as("__da")), Seq("__a"))
      .join(deg.select(col("__v").as("__b"), col("__d").as("__db")), Seq("__b"))
      .select(col("__da"), col("__db"))
    val sym = pairs.select(col("__da").as("__x"), col("__db").as("__y"))
      .union(pairs.select(col("__db").as("__x"), col("__da").as("__y")))
    sym.agg(count(lit(1)).as("__n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum((col("__x") * col("__y")).cast(dec)).as("__sxy"),
        sum((col("__x") * col("__x")).cast(dec)).as("__sxx"))
      .select((col("__n") / 2).cast("long").as("n_edges"),
        ((col("__n").cast(dec) * col("__sxy") - col("__sx") * col("__sx"))
          .cast(dec).cast("double")
          / nullif((col("__n").cast(dec) * col("__sxx")
            - col("__sx") * col("__sx")).cast(dec).cast("double"),
            lit(0.0))).as("assortativity"))
  }

  /** Modularity of a GIVEN partition (Newman & Girvan, PRE 2004): how
    * much more intra-community edge mass does the labeling capture than
    * a degree-preserving random graph would — Q = Σ_c [m_c/m −
    * (d_c/2m)²], the number that says whether a blocking/sharding key
    * actually respects the graph's community structure before a
    * partition-by-community plan is trusted. Exact form: per community
    * the term 4·m·m_c − d_c² is an exact DECIMAL(38,0); Q is their sum
    * with ONE final divide by 4m². Communities whose nodes never enter
    * the edge set contribute nothing (and are not counted).
    *
    * Scale shape: two node-keyed joins planting community labels on
    * edges, one aggregate per community, a 1-row fold.
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 communities: DataFrame, nodeCol: String,
                 commCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val e = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val com = communities.select(col(nodeCol).as("__v"),
      col(commCol).cast("string").as("__c"))
    val m = e.agg(count(lit(1)).as("__m"))
    val ec = e
      .join(com.select(col("__v").as("__a"), col("__c").as("__ca")), Seq("__a"))
      .join(com.select(col("__v").as("__b"), col("__c").as("__cb")), Seq("__b"))
    val mc = ec.filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__cc")).agg(count(lit(1)).as("__mc"))
    val deg = e.select(col("__a").as("__v"))
      .union(e.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__d"))
    val dcs = deg.join(com, Seq("__v"))
      .groupBy(col("__c")).agg(sum(col("__d")).as("__dc"))
    dcs.join(mc, dcs("__c") === mc("__cc"), "left")
      .crossJoin(broadcast(m))
      .select((lit(4L).cast(dec) * col("__m").cast(dec)
        * coalesce(col("__mc"), lit(0L)).cast(dec)
        - col("__dc").cast(dec) * col("__dc").cast(dec)).cast(dec).as("__t"))
      .crossJoin(broadcast(m))
      .groupBy(col("__m"))
      .agg(count(lit(1)).as("__k"), sum(col("__t")).cast(dec).as("__num"))
      .select(col("__m").cast("long").as("n_edges"),
        col("__k").cast("long").as("n_communities"),
        (col("__num").cast("double")
          / nullif(lit(4.0) * col("__m").cast("double")
            * col("__m").cast("double"), lit(0.0))).as("modularity"))
  }
}
