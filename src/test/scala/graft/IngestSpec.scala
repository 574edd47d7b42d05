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

  test("JSON-lines with declared schema: bad rows quarantined, never dropped or fatal") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    java.nio.file.Files.write(dir.resolve("part0.jsonl"), java.util.Arrays.asList(
      """{"id": 1, "name": "ada"}""",
      """{"id": "BROKEN-TYPE", "name": "bob"}""",
      """this is not json at all""",
      """{"id": 3}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Ingest.readJsonLines(spark, dir.toString, schema).cache()
    val good = df.filter($"_corrupt_record".isNull)
      .select("id", "name").as[(Option[Long], Option[String])].collect().toSet
    val dead = df.filter($"_corrupt_record".isNotNull).count()
    assert(good == Set((Some(1L), Some("ada")), (Some(3L), None)))
    assert(dead == 2, "both bad lines must land in the dead-letter split")
    df.unpersist()
  }

  test("CSV with declared schema: header honored, corrupt rows quarantined") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("csvsrc")
    java.nio.file.Files.write(dir.resolve("part0.csv"), java.util.Arrays.asList(
      "id,score", "1,2.5", "oops,not-a-double", "3,9.75"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val df = Ingest.readCsv(spark, dir.toString, schema).cache()
    val good = df.filter($"_corrupt_record".isNull)
      .select("id", "score").as[(Long, Double)].collect().toSet
    assert(good == Set((1L, 2.5), (3L, 9.75)))
    assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
    df.unpersist()
  }
}
