package graft

import org.apache.spark.sql.functions._

import graft.ops.LlmOps

/** The injected optimizer rule (SparkSessionExtensions →
  * injectOptimizerRule): implied-length prune ahead of levenshtein
  * filters. Asserts the rewrite appears in BOTH predicate homes (Filter
  * and residual join condition), never changes results, and converges
  * (no duplicate conjuncts from the fixed-point batch).
  */
class LevenshteinLengthPruneSpec extends SparkTestBase {
  import spark.implicits._

  private def optimizedOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // a parquet scan keeps the optimizer from folding the whole filter into
  // a LocalRelation (which is what happens over Seq(...).toDF fixtures)
  private def parts = Tables.load(spark, "/root/testdata/sf0.001", "part")

  test("filter home: prune conjunct added once, results unchanged") {
    val q = parts.filter(levenshtein($"p_name", lit("red bolt")) <= 2)
    val plan = optimizedOf(q)
    assert(plan.contains("abs"), s"prune missing:\n$plan")
    // fixed-point idempotence: exactly one abs(length-length) conjunct
    assert(plan.split("abs\\(").length - 1 == 1, s"duplicated prune:\n$plan")
    // semantics: identical row set to a driver-side reference computation
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i.max(j))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = parts.select("p_name").as[String].collect()
      .count(n => lev(n, "red bolt") <= 2)
    assert(q.count() == expect && q.count() > 0)
  }

  test("join home: residual fuzzy-join condition gets the prune") {
    val a = Seq("red bolt", "ted bolt", "extraordinarily long bolt").toDF("na")
    val b = Seq("red bolt", "rad bolt").toDF("nb")
    val q = a.join(b, levenshtein($"na", $"nb") <= 2 && $"na" =!= $"nb")
    val plan = optimizedOf(q)
    assert(plan.contains("abs"), s"prune missing from join condition:\n$plan")
    // red~rad(1), ted~red(1), ted~rad(2); red~red excluded by !=, the
    // long name excluded by distance (and cheaply, by the prune)
    assert(q.count() == 3)
  }

  test("strict < and reversed >= phrasings are caught; > is not rewritten") {
    val df = parts.select($"p_name".as("a"), $"p_brand".as("b"))
    assert(optimizedOf(df.filter(levenshtein($"a", $"b") < 3)).contains("abs"))
    assert(optimizedOf(df.filter(lit(3) >= levenshtein($"a", $"b"))).contains("abs"))
    // a lower bound implies nothing about length difference
    assert(!optimizedOf(df.filter(levenshtein($"a", $"b") > 3)).contains("abs"))
  }
}
