package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Relational, Temporal}

/** Composed flows mirroring the reference's three entry points (SURVEY.md
  * §3) over the harness star schema: the incremental meetings→participants
  * pipeline (/root/reference/main.py:206-302) becomes one declarative DAG —
  * watermark, anti-join change detection, and enrichment fused into a single
  * plan Catalyst optimizes end-to-end, instead of three round-trips through
  * an external database.
  */
object ZoomJobs {

  /** Flagship pipeline analog of `--meetings` (/root/reference/main.py:328-346):
    * orders ≈ meetings (watermarked fact), customer ≈ the key universe,
    * nation/region ≈ dimension lookups that the reference did per-key over
    * HTTP (/root/reference/main.py:98-118) and we do as one broadcast join.
    *
    * Steps, all in one DAG:
    *  1. high-watermark over processed orders (max + fallback, main.py:251-267)
    *  2. anti-join: customers with no order yet before the cutoff
    *     (main.py:79-85 idiom)
    *  3. broadcast-enrich those "new" customers with nation + region
    *  4. per-nation summary counts (the reference's row-count logging,
    *     main.py:119-121, as data)
    */
  def flagship(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.load(spark, sfDir, "customer")
    val orders = Tables.load(spark, sfDir, "orders")
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region")

    val processed = Relational.filterTsRange(orders, "o_orderdate",
      "1995-01-01 00:00:00", "1996-01-01 00:00:00")

    val newCustomers = Relational.antiJoinNewKeys(
      customer, processed.select("o_custkey"), "c_custkey", "o_custkey")

    val enriched = Relational.enrichWithDim(
      Relational.enrichWithDim(newCustomers, nation, col("c_nationkey") === col("n_nationkey")),
      region, col("n_regionkey") === col("r_regionkey"))

    enriched
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("new_customers"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Next-load-date computation with school-year fallback — the complete
    * get_last_meeting_date semantics (/root/reference/main.py:242-267) as a
    * 1-row DataFrame. `asOf` is an explicit parameter ("yyyy-MM-dd"), never
    * the wall clock, per the determinism rule (SURVEY.md §7.5.6).
    */
  def nextLoadDate(spark: SparkSession, sfDir: String, asOf: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    Temporal.nextLoadDateWithFallback(orders, "o_orderdate", to_date(lit(asOf)))
  }
}
