package graft

import graft.ops.{Graph, Temporal}

/** Round-11 tenth wave: degree assortativity, partition modularity, and
  * the burstiness (Fano) screen — hand-computed fixtures.
  */
class Round11GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("degreeAssortativity: a star is perfectly disassortative (r = -1)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = Graph.degreeAssortativity(star, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("degreeAssortativity: a regular graph has zero degree variance → NULL") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("a", "b")
    val r = Graph.degreeAssortativity(cycle, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("modularity: two bridged triangles under their natural partition") {
    // m = 7; each triangle: m_c = 3, d_c = 7 → Q = 2·(4·7·3 − 49)/(4·49)
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L)).toDF("a", "b")
    val com = Seq((0L, "x"), (1L, "x"), (2L, "x"),
      (3L, "y"), (4L, "y"), (5L, "y")).toDF("v", "c")
    val r = Graph.modularity(edges, "a", "b", com, "v", "c").collect()(0)
    assert(r.getAs[Long]("n_edges") == 7L)
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(math.abs(r.getAs[Double]("modularity") - 70.0 / 196.0) < 1e-15)
  }

  test("modularity: the everything-in-one-community partition scores 0") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("a", "b")
    val com = Seq((0L, "x"), (1L, "x"), (2L, "x")).toDF("v", "c")
    val r = Graph.modularity(edges, "a", "b", com, "v", "c").collect()(0)
    assert(r.getAs[Double]("modularity") == 0.0)
  }

  test("burstiness: constant days score Fano ≤ 1, a spike day dominates") {
    import java.sql.Timestamp
    def t(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d 0$i:00:00")
    // steady: 1 event/day × 5 days → counts [1,1,1,1,1] → Fano 0
    // bursty: [1,1,1,1,6] → n=5, Σc=10, Σc²=40 → (200−100)/(4·10)=2.5
    val rows =
      (1 to 5).map(d => (1L, t(d, 1))) ++
      ((1 to 4).map(d => (2L, t(d, 1))) ++ (1 to 6).map(i => (2L, t(5, i))))
    val df = rows.toDF("user_id", "ts")
    val out = Temporal.burstiness(df, "user_id", "ts", minDays = 5, topK = 10)
      .collect()
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(2L, 1L)) // bursty first
    assert(math.abs(out(0).getAs[Double]("fano") - 2.5) < 1e-15)
    assert(out(1).getAs[Double]("fano") == 0.0)
    // a 4-day user misses the minDays floor
    assert(out.length == 2)
  }
}
