package graft

import graft.ops.Ingest

/** SURVEY.md §2.1/§2.8 F6: JSON flatten with null defaults
  * (main.py:324-334 semantics).
  */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  test("flattenJson: present field extracted+cast, absent field null, bad json null") {
    val df = Seq(
      (1L, """{"k": 87, "name": "x"}"""),
      (2L, """{"name": "y"}"""),
      (3L, "not json")).toDF("id", "props")
    val out = Ingest.flattenJson(df, "props",
        Seq(("$.k", "k_val", "long"), ("$.name", "name", "string")))
      .select("id", "k_val", "name")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(out == Set(
      (1L, Some(87L), Some("x")),
      (2L, None, Some("y")),
      (3L, None, None)))
  }

  test("flattenJson: present-but-malformed value yields null under ANSI mode, not an error") {
    val df = Seq((1L, """{"k": "not-a-number"}""")).toDF("id", "props")
    val out = Ingest.flattenJson(df, "props", Seq(("$.k", "k_val", "long")))
      .select("k_val").as[Option[Long]].head()
    assert(out.isEmpty) // try_cast semantics; plain cast would throw
  }
}
