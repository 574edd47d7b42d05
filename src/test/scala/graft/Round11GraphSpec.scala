package graft

import graft.ops.Graph

/** Round-11 tenth wave: degree assortativity and partition modularity —
  * hand-computed graph fixtures.
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
}
