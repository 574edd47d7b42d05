package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorOps
import graft.ops.{Ingest, LlmOps, Relational, Temporal}
import graft.pipeline.ZoomJobs

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query (a) reads only `$sfDir/<table>.parquet`, (b) ends in
  * a deterministic orderBy on a unique key (or is a deterministically-ordered
  * top-k), and (c) emits only hash-stable types: strings, longs, booleans,
  * and doubles produced by deterministic arithmetic (exact-decimal sums cast
  * to double; sequential-fold vector math). Timestamps/dates are formatted to
  * strings so Spark-vs-DuckDB physical timestamp representation can't skew
  * the compare.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ZoomJobs.flagship(spark, "/root/testdata/sf0.001")

  /** Deterministic image-blob fixtures for the header-decode queries: one
    * valid PNG / JPEG(JFIF) / GIF header per document (format by
    * doc_id mod 3), dimensions derived from doc columns —
    * width = n_chars mod 300 + 16, height = doc_id mod 200 + 16. Built in
    * hex-string space (unhex at the end) so the DuckDB twin can rebuild
    * the identical blob with string concatenation and struct-unpack the
    * fixed offsets. The JPEG places SOF0 AFTER a real 16-byte APP0/JFIF
    * segment, so the Spark-side parser must actually scan markers.
    */
  private def synthImages(docs: DataFrame): DataFrame = {
    val w = (pmod(col("n_chars"), lit(300)) + 16).cast("int")
    val h = (pmod(col("doc_id"), lit(200)) + 16).cast("int")
    val w4 = lpad(hex(w), 8, "0")
    val h4 = lpad(hex(h), 8, "0")
    val w2 = lpad(hex(w), 4, "0")
    val h2 = lpad(hex(h), 4, "0")
    val hx = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("89504E470D0A1A0A0000000D49484452"), w4, h4, lit("0806000000")))
      .when(pmod(col("doc_id"), lit(3)) === 1,
        concat(lit("FFD8FFE000104A46494600010100000100010000FFC0001108"), h2, w2, lit("03")))
      .otherwise(
        concat(lit("474946383961"),
          substring(w2, 3, 2), substring(w2, 1, 2),
          substring(h2, 3, 2), substring(h2, 1, 2)))
    docs.select(col("doc_id").as("media_id"), unhex(hx).as("content"))
  }

  /** Little-endian hex of an int column (n bytes): byte-swapped lpad hex —
    * the RIFF/WAV encoding both engines replay with string ops.
    */
  private def leHex(c: Column, nBytes: Int): Column = {
    val padded = lpad(hex(c), nBytes * 2, "0")
    concat((nBytes - 1 to 0 by -1).map(i => substring(padded, i * 2 + 1, 2)): _*)
  }

  /** Deterministic WAV fixtures (audio leg of the header-decode family):
    * a real RIFF/WAVE chunk list — fmt, a junk LIST/INFO chunk the scanner
    * must skip, then data — with channels / sample rate / data size
    * derived from doc columns. All numerics little-endian per the spec.
    */
  private def synthAudio(docs: DataFrame): DataFrame = {
    val channels = (pmod(col("doc_id"), lit(2)) + 1).cast("int")       // 1..2
    val rate = ((pmod(col("doc_id"), lit(3)) + 1) * 8000).cast("int")  // 8/16/24 kHz
    val blockAlign = channels * 2
    val byteRate = rate * blockAlign
    val dataSize = ((pmod(col("n_chars"), lit(100)) + 1) * blockAlign).cast("int")
    val hx = concat(
      lit("52494646"), leHex(dataSize + 48, 4), lit("57415645"), // RIFF size WAVE
      lit("666D7420"), leHex(lit(16), 4),                        // 'fmt ' 16
      leHex(lit(1), 2), leHex(channels, 2), leHex(rate, 4),
      leHex(byteRate, 4), leHex(blockAlign, 2), leHex(lit(16), 2),
      lit("4C495354"), leHex(lit(4), 4), lit("494E464F"),        // junk LIST/INFO
      lit("64617461"), leHex(dataSize, 4))                       // 'data' size
    docs.select(col("doc_id").as("media_id"), unhex(hx).as("content"))
  }

  /** Deterministic MP4 (ISO-BMFF) fixtures (video leg): ftyp, a junk
    * `free` box the walker must skip, then moov>mvhd (version 0) with
    * timescale/duration from doc columns. All numerics big-endian.
    */
  private def synthVideo(docs: DataFrame): DataFrame = {
    val ts = ((pmod(col("doc_id"), lit(2)) + 1) * 600).cast("int")     // 600/1200
    val dur = ((pmod(col("n_chars"), lit(1000)) + 1) *
      (pmod(col("doc_id"), lit(5)) + 1)).cast("int")
    def be4(c: Column) = lpad(hex(c), 8, "0")
    val mvhdTail = "00010000" + "0100" + "0" * 20 + "0" * 72 + "0" * 48 + "00000002"
    val hx = concat(
      lit("0000001066747970" + "69736F6D" + "00000000"),   // ftyp isom
      lit("0000000866726565"),                             // junk 'free' box
      lit("000000746D6F6F76"),                             // moov (116)
      lit("0000006C6D766864" + "00000000" + "00000000" + "00000000"), // mvhd v0
      be4(ts), be4(dur), lit(mvhdTail))
    docs.select(col("doc_id").as("media_id"), unhex(hx).as("content"))
  }

  /** The LLM-data flagship curation DAG a training run ships — length
    * floor → repetition ceiling → exact dedup → near-dup cluster
    * survivors → decontamination vs the benchmark slice — each stage one
    * of the verified operators, composed. Shared by `curation_pipeline`
    * (the survivor table) and `export_manifest` (the packed-shard plan
    * over it).
    *
    * ONE shingle/signature pass (persisted) feeds repetition, near-dup
    * candidate generation AND decontamination — the corpus text is
    * md5-shingled exactly once. The repetition ratio derives from the
    * window count (greatest(nTokens-n,0)+1) and the distinct-hash set
    * size the MinHash plan already carries, so no second shingle pass.
    */
  private def curationSurvivors(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    val prepared = corpus.filter(length(col("text")) >= 100)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
        size(LlmOps.tokens(col("text"))).as("__ntok"),
        LlmOps.minhashPlanBest(corpus, col("text"), 3, 16).as("__mh"))
      .withColumn("__nsh", greatest(col("__ntok") - 3, lit(0)) + 1)
      .withColumn("__rep",
        lit(1.0) - size(col("__mh.sh")).cast("double") / col("__nsh").cast("double"))
      .persist()
    val lowRep = prepared.filter(col("__rep") < 0.2)
    // Survivor persist carries only what downstream stages read (id,
    // output columns, the minhash struct) — the text and token counts
    // served their purpose in the repetition/exact-dedup stages, and at
    // corpus scale dropping them halves this cache's footprint.
    val afterExact = lowRep
      .join(LlmOps.dedupExactIds(lowRep, "doc_id", "text"), "doc_id")
      .select("doc_id", "lang", "n_chars", "__mh")
      .persist()
    val pairs = LlmOps.nearDupPairsFromSets(
      afterExact.select(col("doc_id"),
        col("__mh.sh").as("__sh"), col("__mh.sig").as("__sig")),
      "doc_id", bands = 4, rowsPerBand = 4, threshold = 0.7, maxBucketSize = 10000)
    val afterNear = afterExact.join(
      graft.ops.Graph.dedupClusters(afterExact, pairs, "doc_id")
        .filter(col("keep")).select("doc_id"),
      "doc_id")
    val benchSet = bench.select(
        explode(LlmOps.minhashPlanBest(bench, col("text"), 3, 16).getField("sh")).as("__bsh"))
      .distinct()
    afterNear.join(
      LlmOps.contaminationFromSets(
          afterNear.select(col("doc_id"), col("__mh.sh").as("__sh")), "doc_id", benchSet)
        .filter(col("containment") < 0.5).select("doc_id"),
      "doc_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.1/§2.2 scans, projections, filters -------------------------
    "scan_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    "reindex_columns" -> ((s, dir) =>
      Ingest.reindexTo(t(s, dir, "customer"), StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_name", StringType),
          StructField("c_mktsegment", StringType),
          StructField("c_phone", StringType)))) // absent in source → typed null
        .orderBy("c_custkey")),

    "filter_eq" -> ((s, dir) =>
      Relational.filterEq(t(s, dir, "events"), "event_type", "click")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")),

    "filter_date_range" -> ((s, dir) =>
      Relational.filterTsRange(t(s, dir, "orders"), "o_orderdate",
          "1995-01-01 00:00:00", "1996-01-01 00:00:00")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy("o_orderkey")),

    "distinct_keys" -> ((s, dir) =>
      Relational.distinctKeys(t(s, dir, "lineitem"), "l_orderkey")
        .orderBy("l_orderkey")),

    // ---- §2.3 joins ----------------------------------------------------
    "anti_join_new_keys" -> ((s, dir) => {
      val processed = Relational.filterTsRange(t(s, dir, "orders"), "o_orderdate",
        "1995-01-01 00:00:00", "1996-01-01 00:00:00").select("o_custkey")
      Relational.antiJoinNewKeys(t(s, dir, "customer"), processed, "c_custkey", "o_custkey")
        .select("c_custkey").distinct().orderBy("c_custkey")
    }),

    "semi_join_active" -> ((s, dir) => {
      val urgent = Relational.filterEq(t(s, dir, "orders"), "o_orderpriority", "1-URGENT")
      Relational.semiJoin(t(s, dir, "customer"), urgent, "c_custkey", "o_custkey")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "join_enrich" -> ((s, dir) => {
      val cn = Relational.enrichWithDim(t(s, dir, "customer"), t(s, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      Relational.enrichWithDim(cn, t(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    }),

    "left_join_counts" -> ((s, dir) => {
      // LEFT JOIN keeps customers with zero orders in range (cnt = 0):
      // COUNT(o_orderkey) counts only matched rows, never the null row.
      val window = Relational.filterTsRange(t(s, dir, "orders"), "o_orderdate",
        "1995-01-01 00:00:00", "1996-01-01 00:00:00")
      t(s, dir, "customer")
        .join(window, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    "full_outer_keys" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("uk")).distinct()
      val window = o.filter(col("o_orderdate") < to_timestamp(lit("1996-01-01 00:00:00")))
        .select(col("o_custkey").as("wk")).distinct()
      urgent.join(window, col("uk") === col("wk"), "full_outer")
        .select(
          coalesce(col("uk"), col("wk")).as("cust"),
          col("uk").isNotNull.as("is_urgent"),
          col("wk").isNotNull.as("in_window"))
        .orderBy("cust")
    }),

    "multimodal_join" -> ((s, dir) =>
      t(s, dir, "documents")
        .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("label").cast("long").as("label"))
        .orderBy("doc_id")),

    // ---- §2.7/§2.8 set ops, literals -----------------------------------
    "union_pages" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val pages = Seq(
        o.filter(col("o_orderkey") % 3 === 0).select("o_orderkey", "o_custkey", "o_totalprice"),
        o.filter(col("o_orderkey") % 3 === 1).select("o_custkey", "o_totalprice", "o_orderkey"),
        o.filter(col("o_orderkey") % 3 === 2).select("o_totalprice", "o_orderkey", "o_custkey"))
      Relational.unionPages(pages)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "add_literal" -> ((s, dir) =>
      Relational.addLiteral(t(s, dir, "events"), "source_system", "zoom")
        .select("event_id", "user_id", "source_system")
        .orderBy("event_id")),

    // ---- §2.4 aggregations ---------------------------------------------
    "count_per_group" -> ((s, dir) =>
      Relational.countPerGroup(t(s, dir, "customer"), "c_nationkey")
        .orderBy("c_nationkey")),

    "agg_revenue_by_flag" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Relational.decimalSum(col("l_quantity")).as("sum_qty"),
          Relational.decimalSum(col("l_extendedprice")).as("sum_base_price"),
          Relational.decimalSumProduct(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ---- §2.8/§2.10 temporal + incremental -----------------------------
    "max_watermark" -> ((s, dir) =>
      Temporal.maxWatermark(t(s, dir, "orders"), "o_orderdate")
        .select(date_format(col("watermark"), "yyyy-MM-dd HH:mm:ss").as("max_ts"))),

    "watermark_next_date" -> ((s, dir) =>
      Temporal.maxWatermark(t(s, dir, "orders"), "o_orderdate")
        .select(date_format(Temporal.nextLoadDate(col("watermark")), "yyyy-MM-dd").as("next_date"))),

    "school_year_start" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(Temporal.schoolYearStart(col("o_orderdate")), "yyyy-MM-dd").as("sy_start"))
        .orderBy("o_orderkey")),

    "parse_timestamp_tz" -> ((s, dir) =>
      // Round-trip: format ts to ISO-8601-with-offset, parse with %z
      // semantics (reference main.py:263-265), re-format for the compare.
      t(s, dir, "events")
        .select(col("event_id"),
          date_format(
            Temporal.parseIsoOffset(
              concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("+00:00"))),
            "yyyy-MM-dd HH:mm:ss").as("parsed_ts"))
        .orderBy("event_id")),

    "date_format_iso" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy("o_orderkey")),

    "json_extract_settings" -> ((s, dir) =>
      Ingest.flattenJson(t(s, dir, "events"), "props",
          Seq(("$.k", "k_val", "long"), ("$.missing", "missing_val", "string")))
        .select("event_id", "k_val", "missing_val")
        .orderBy("event_id")),

    // ---- §2.6 sort/limit, §2.5 windows ---------------------------------
    "topk_orders" -> ((s, dir) =>
      Relational.topK(t(s, dir, "orders"), 10,
          col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "window_rank" -> ((s, dir) =>
      Relational.rankPerGroup(t(s, dir, "lineitem"),
          Seq("l_returnflag"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
          k = 5)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("rn").cast("long").as("rn"))
        .orderBy("l_returnflag", "rn")),

    "window_running_sum" -> ((s, dir) =>
      Relational.runningSum(t(s, dir, "orders"), "o_totalprice", "o_custkey",
          Seq(col("o_orderdate").asc, col("o_orderkey").asc), "running_total")
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")),

    "window_lag_ntile" -> ((s, dir) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(byDate))
            .cast("long").as("days_since_prev"),
          ntile(4).over(byPrice).cast("long").as("price_quartile"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "window_first_last" -> ((s, dir) => {
      // frame-sensitive value windows: first/last/nth over an explicit
      // unbounded frame (default RANGE..CURRENT ROW would make last_value
      // see only its own prefix — the classic window-frame trap)
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(full).as("first_key"),
          last(col("o_orderkey")).over(full).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "user_profile" -> ((s, dir) =>
      // feature-store profile row per user: activity counts, the sorted
      // distinct event-type vocabulary as a csv string (deterministic,
      // hash-stable), and the activity span
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          concat_ws(",", sort_array(collect_set(col("event_type")))).as("event_types"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen"),
          // floor-to-cents BEFORE the sum: floor is exact IEEE (unlike a
          // decimal cast, whose tie-rounding on raw doubles is engine-
          // specific), and long addition is associative
          sum(floor(col("value") * 100).cast("long")).as("total_cents"))
        .orderBy("user_id")),

    "window_dist_funcs" -> ((s, dir) => {
      // distribution window functions: percent_rank/cume_dist over a unique
      // (price, key) total order — rank arithmetic is exact-int division,
      // bitwise-replayable
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    }),

    "gap_fill_daily" -> ((s, dir) =>
      // densification: per-user daily spine between first and last
      // activity, silent days filled with 0
      Temporal.gapFillDaily(t(s, dir, "events"), "user_id", "ts")
        .orderBy("user_id", "day")),

    "tumbling_daily_counts" -> ((s, dir) =>
      Temporal.tumblingCounts(t(s, dir, "events"), "ts", "1 day", "event_type")
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("cnt"))
        .orderBy("day", "event_type")),

    "sliding_window_counts" -> ((s, dir) =>
      // hopping-window actives: 2-day windows advancing 1 day — each event
      // counted in both covering windows; map-side partial agg absorbs the
      // 2x row expansion before the single shuffle
      Temporal.slidingCounts(t(s, dir, "events"), "ts", "2 days", "1 day", "event_type")
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("win_start"),
          col("event_type"), col("cnt"))
        .orderBy("win_start", "event_type")),

    "pivot_daily_events" -> ((s, dir) =>
      // explicit value list → fixed output columns, no value-discovery scan
      t(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("day")),

    "multimodal_features" -> ((s, dir) => {
      // documents' text bytes stand in for a media blob: real multimodal
      // plumbing (binary column + per-partition decoder lifecycle) on the
      // declared surface. The StubDecoder's md5-based features are
      // recomputed bit-for-bit by the DuckDB oracle, so the decode path is
      // hard-verified: f0 is the first feature, f_sum the sequential-fold
      // double sum of the vector.
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("content"),
          struct(lit("txt").as("format"), lit(0).as("width"),
            lit(0).as("height"), lit(0L).as("duration_ms")).as("meta"))
      graft.ops.Multimodal.extractFeatures(media, dim = 8)
        .select(col("media_id"),
          size(col("features")).cast("long").as("n_features"),
          element_at(col("features"), 1).cast("double").as("f0"),
          aggregate(col("features").cast("array<double>"), lit(0.0),
            (acc, x) => acc + x).as("f_sum"))
        .orderBy("media_id")
    }),

    "image_meta_decode" -> ((s, dir) => {
      // REAL public-format header decode (VERDICT r5 task 6): synthesize a
      // valid PNG / JPEG(JFIF) / GIF header per doc (dimensions derived
      // from doc columns), then parse format/width/height back out of the
      // BYTES with the scanning ImageHeaders parser. The DuckDB twin
      // rebuilds the same hex blob and struct-unpacks the fixed offsets —
      // a hard oracle of signature detection, the JPEG marker scan
      // (SOF0 sits after a 16-byte APP0 segment), PNG big-endian int32
      // and GIF little-endian uint16 dimension decoding.
      graft.ops.Multimodal.decodeImageMeta(synthImages(t(s, dir, "documents")))
        .select(col("media_id"), col("fmt"), col("width"), col("height"))
        .orderBy("media_id")
    }),

    "audio_meta_decode" -> ((s, dir) =>
      // real RIFF/WAVE chunk-scan decode over synthesized-but-valid WAV
      // headers (a junk LIST chunk sits between fmt and data); the DuckDB
      // twin re-derives channels/rate/duration from the construction at
      // value level — independent of the byte path entirely
      graft.ops.Multimodal.decodeAudioMeta(synthAudio(t(s, dir, "documents")))
        .select(col("media_id"), col("fmt"), col("channels"),
          col("sample_rate"), col("duration_ms"))
        .orderBy("media_id")),

    "video_meta_decode" -> ((s, dir) =>
      // real ISO-BMFF box walk (ftyp → skip free → moov → mvhd v0) over
      // synthesized-but-valid MP4 headers; value-level DuckDB twin
      graft.ops.Multimodal.decodeVideoMeta(synthVideo(t(s, dir, "documents")))
        .select(col("media_id"), col("fmt"), col("timescale"), col("duration_ms"))
        .orderBy("media_id")),

    "image_meta_filter" -> ((s, dir) => {
      // metadata-only filter over the decoded headers: filterByMeta never
      // touches the blob again — the 100 TB shape where pruning happens on
      // small meta columns
      val dec = graft.ops.Multimodal.decodeImageMeta(synthImages(t(s, dir, "documents")))
        .select(col("media_id"),
          struct(col("fmt").as("format"), col("width").cast("int").as("width"),
            col("height").cast("int").as("height"), lit(0L).as("duration_ms")).as("meta"))
      graft.ops.Multimodal.filterByMeta(dec, "png", minWidth = 166)
        .select(col("media_id"), col("meta.format").as("fmt"),
          col("meta.width").cast("long").as("width"))
        .orderBy("media_id")
    }),

    "sessionize_gap" -> ((s, dir) =>
      Temporal.sessionize(t(s, dir, "events"), "user_id", "ts", "event_id", gapSeconds = 1800)
        .select(col("user_id"), col("session_id").cast("long").as("session_id"),
          col("n_events"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .orderBy("user_id", "session_id")),

    // ---- §2.12 [north-star] LLM-data ops -------------------------------
    "dedup_exact" -> ((s, dir) =>
      LlmOps.dedupExactIds(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "text_stats" -> ((s, dir) =>
      LlmOps.textStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "quality_score" -> ((s, dir) =>
      LlmOps.qualityScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "lang_id" -> ((s, dir) =>
      LlmOps.langIdHeuristic(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "lang_profile" -> ((s, dir) =>
      LlmOps.langProfile(t(s, dir, "documents"), "lang", "n_chars")
        .orderBy("lang")),

    "similarity_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("__qv"))
      VectorOps.bruteForceTopK(emb, "embedding", "vec_id", qv, k = 10)
    }),

    "knn_classify" -> ((s, dir) => {
      // embedding-space eval pass: queries (vec_id < 10) take the modal
      // label of their 5 cosine-nearest corpus neighbors; per-query top-k
      // plans as WindowGroupLimit (audited), votes are <= Q*k rows
      val emb = t(s, dir, "embeddings")
      VectorOps.knnClassify(emb.filter(col("vec_id") >= 10),
          emb.filter(col("vec_id") < 10), "vec_id", "embedding", "label", k = 5)
        .orderBy("query_id")
    }),

    "hard_negatives" -> ((s, dir) => {
      // contrastive-training data prep: for each anchor (vec_id < 8), the
      // 3 cosine-nearest OTHER-label corpus vectors — label filter applied
      // before scoring, per-query top-k plans as WindowGroupLimit (audited)
      val emb = t(s, dir, "embeddings")
      VectorOps.hardNegatives(emb.filter(col("vec_id") >= 8),
          emb.filter(col("vec_id") < 8), "vec_id", "embedding", "label", k = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),

    "knn_classify_ann" -> ((s, dir) => {
      // two-sided-large labeling pass: 32 queries classified through the
      // IVF cell join. Agreement contract vs the brute knnClassify twin:
      // with nProbe=6 of 8 cells the modal-label vote must agree on >=70%
      // of queries. nProbe is wide because these synthetic embeddings are
      // near-uniform Gaussians over 10 labels: modal votes are won by 1-2
      // ballots, so vote stability needs most true neighbors present —
      // real clustered embeddings agree at much smaller nProbe
      val emb = t(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") >= 32)
      val anchors = emb.filter(col("vec_id") < 32)
      val ann = VectorOps.knnClassifyAnn(corpus, anchors, "vec_id",
        "embedding", "label", k = 5, nCells = 8, nProbe = 6)
      val brute = VectorOps.knnClassify(corpus, anchors, "vec_id",
        "embedding", "label", k = 5)
      val agree = ann.select(col("query_id"), col("pred_label").as("__pa"))
        .join(brute.select(col("query_id"), col("pred_label").as("__pb")),
          Seq("query_id"))
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("__pa") === col("__pb"), 1L).otherwise(0L)).as("__same"))
      // measured __same at sf0.001/0.01/0.1: 28/27/27 of 32 — the 70%
      // bound holds with ~5-query margin at every SF
      agree.select(col("n_queries"), (col("__same") * 10 >= col("n_queries") * 7)
        .as("agreement_ok"))
    }),

    "hard_negatives_ann" -> ((s, dir) => {
      // two-sided-large mining path: 32 anchors x corpus through the IVF
      // cell join (nothing query-side broadcasts except the 8-row centroid
      // table). Contract-oracled like similarity_ivf: k-means centroids
      // aren't SQL-replayable, so the checked contract is recall vs the
      // in-Spark brute-force twin — nProbe=4 of 8 cells must recover a
      // majority of every anchor's true top-10 other-label negatives.
      val emb = t(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") >= 32)
      val anchors = emb.filter(col("vec_id") < 32)
      val ann = VectorOps.hardNegativesAnn(corpus, anchors, "vec_id",
        "embedding", "label", k = 10, nCells = 8, nProbe = 4)
      val brute = VectorOps.hardNegatives(corpus, anchors, "vec_id",
        "embedding", "label", k = 10)
      val hits = ann.select("query_id", "neg_id")
        .intersect(brute.select("query_id", "neg_id"))
        .groupBy("query_id").agg(count(lit(1)).as("__h"))
      anchors.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("__h"), lit(0L)).as("__h"))
        .agg(count(lit(1)).as("n_queries"), sum("__h").as("__total"),
          min("__h").as("__min"))
        // measured at sf0.001/0.01/0.1: total 236/236/223 of 320, min
        // 5/4/2 — the contract bounds (>=60% aggregate recall, every
        // anchor recovers at least one true negative) hold with margin
        .select(col("n_queries"), (col("__total") >= 192).as("recall_ok"),
          (col("__min") >= 1).as("min_recall_ok"))
    }),

    "bm25_topk" -> ((s, dir) => {
      // lexical retrieval for RAG / hard-negative mining: BM25 top-5 docs
      // per query over a 3-query workload; query terms broadcast and prune
      // the postings before any join, per-query top-k plans as
      // WindowGroupLimit
      import s.implicits._
      val q = Seq(
        ("q1", "spark"), ("q1", "join"), ("q1", "fast"),
        ("q2", "table"), ("q2", "scan"), ("q2", "window"),
        ("q3", "dup"), ("q3", "vector"), ("q3", "merge"))
        .toDF("query_id", "term")
      val out = LlmOps.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          q, k = 5)
        .orderBy("query_id", "rank")
      out
    }),

    "pmi_pairs" -> ((s, dir) =>
      // collocation mining for vocab/tokenizer work: top-20 co-occurring
      // term pairs (df>=3 vocab, alphabetically-first-32 terms per doc)
      // with PMI lift; pair emission is in-array, never a per-doc
      // self-join
      LlmOps.pmiPairs(t(s, dir, "documents"), "doc_id", "text",
        minDf = 3, perDocCap = 32, k = 20)),

    "range_join_pairs" -> ((s, dir) =>
      graft.ops.AsOfJoin.rangeJoinPairs(t(s, dir, "events"), "event_id", "ts",
          bandSeconds = 30)
        .orderBy("id_a", "id_b")),

    "asof_last_purchase" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      graft.ops.AsOfJoin.asOf(clicks, purchases, "user_id", "user_id", "ts", "ts")
        .select(col("event_id"), col("user_id"),
          date_format(col("asof.ts"), "yyyy-MM-dd HH:mm:ss").as("last_purchase_ts"))
        .orderBy("event_id")
    }),

    "asof_next_purchase" -> ((s, dir) => {
      // forward as-of with a horizon: for each click, the FIRST purchase by
      // the same user at-or-after it within 2 days (attribution window) —
      // same one-shuffle union+window shape as asof_last_purchase, sort
      // reversed, tolerance nulls matches beyond the horizon
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      graft.ops.AsOfJoin.asOfForward(clicks, purchases, "user_id", "user_id",
          "ts", "ts", toleranceSeconds = 2L * 24 * 3600)
        .select(col("event_id"), col("user_id"),
          date_format(col("asof.ts"), "yyyy-MM-dd HH:mm:ss").as("next_purchase_ts"))
        .orderBy("event_id")
    }),

    "stats_by_group" -> ((s, dir) => {
      val p = col("o_totalprice").cast("decimal(18,2)")
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          // decimal -> string -> double: DuckDB's direct decimal->double
          // conversion double-rounds (int128 then /10^scale), while Java's
          // is correctly rounded — the string route is correctly rounded
          // in BOTH engines, so s/ss match bitwise.
          sum(p).cast("string").cast("double").as("s"),
          sum(p * p).cast("string").cast("double").as("ss"))
        .select(col("o_orderpriority"), col("n"),
          (col("s") / col("n")).as("avg_price"),
          ((col("ss") - (col("s") * col("s")) / col("n")) / (col("n") - 1)).as("var_price"),
          sqrt((col("ss") - (col("s") * col("s")) / col("n")) / (col("n") - 1)).as("stddev_price"))
        .orderBy("o_orderpriority")
    }),

    "cube_counts" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("cnt"))
        .orderBy("flag", "status")),

    "percentile_by_group" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90_price"))
        .orderBy("o_orderpriority")),

    // ---- §2.7 set ops beyond union, §2.4 grouping sets, §2.11 generator --
    "set_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("cust"))
        .intersect(
          o.filter(col("o_orderdate") < to_timestamp(lit("1996-01-01 00:00:00")))
            .select(col("o_custkey").as("cust")))
        .orderBy("cust")
    }),

    "set_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("cust"))
        .except(
          o.filter(col("o_orderdate") < to_timestamp(lit("1996-01-01 00:00:00")))
            .select(col("o_custkey").as("cust")))
        .orderBy("cust")
    }),

    "rollup_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(Relational.decimalSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag", "status")),

    "explode_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(LlmOps.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(20)),

    "dedup_embedding" -> ((s, dir) =>
      VectorOps.embeddingNearDupPairs(t(s, dir, "embeddings"),
          "vec_id", "embedding", blockCol = "label", threshold = 0.25)
        .orderBy("id_a", "id_b")),

    "dedup_semantic" -> ((s, dir) =>
      // SemDeDup-shape semantic dedup: content-derived clusters (portable
      // sign-LSH, 16 buckets), within-cluster cosine prune, min-id
      // survivor — the keep/drop table a curation run joins against.
      // Fully hard-oracled: planes, buckets, cosines and flags all replay.
      VectorOps.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          nPlanes = 4, dim = 64, threshold = 0.25)
        .orderBy("vec_id")),

    "dedup_jaccard" -> ((s, dir) =>
      // lang blocks (~N/5 docs each) rather than source blocks (~5 docs):
      // the PPJoin prefix/length filters only earn their keep — and only
      // get oracle coverage — when blocks are big enough to need pruning
      LlmOps.jaccardPairs(t(s, dir, "documents"),
          "doc_id", "text", blockCol = "lang", shingleN = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // ---- portable-hash-family ops (md5-derived, DuckDB replays exactly) --
    "dedup_near" -> ((s, dir) =>
      LlmOps.nearDupPairs(t(s, dir, "documents"), "doc_id", "text",
          maxBucketSize = 10000)
        .orderBy("id_a", "id_b")),

    "minhash_estimate" -> ((s, dir) =>
      // signature-space Jaccard estimation next to the exact value for
      // every LSH candidate — the calibration query that justifies
      // skipping the exact-verify join at corpus scale (est is k
      // components per doc regardless of document length)
      LlmOps.minhashEstimatePairs(t(s, dir, "documents"), "doc_id", "text",
          maxBucketSize = 10000)
        .orderBy("id_a", "id_b")),

    "incremental_near_dup" -> ((s, dir) => {
      // nightly-ingest NEAR-dup: batch (src1) vs corpus signature store +
      // itself — band join with broadcastable batch side, base text never
      // moves, verification only on band collisions
      val docs = t(s, dir, "documents")
      LlmOps.incrementalNearDup(
          docs.filter(col("source") =!= "src1"),
          docs.filter(col("source") === "src1"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "incremental_dedup" -> ((s, dir) => {
      // nightly-ingest shape: dedup ONE new batch (source src1) against
      // the already-ingested corpus + itself in O(batch + base
      // fingerprints) — base text never moves, no full-corpus re-dedup
      val docs = t(s, dir, "documents")
      LlmOps.incrementalDedup(
          docs.filter(col("source") =!= "src1"),
          docs.filter(col("source") === "src1"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "dedup_simhash" -> ((s, dir) =>
      LlmOps.simhash(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "approx_distinct_parts" -> ((s, dir) => {
      // Contract-oracled: DuckDB can't replay the HLL registers, but it CAN
      // verify the contract — the estimate must land within ±5% of the
      // exact distinct count (lgK=12 → rsd ≈ 1.6%, so 5% is ~3σ). A broken
      // sketch flips hll_ok to false and fails the hash compare.
      val li = t(s, dir, "lineitem")
      val approx = Relational.approxDistinctPerGroup(li, "l_returnflag", "l_partkey")
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      approx.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("approx_distinct") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("hll_ok"))
        .orderBy("l_returnflag")
    }),

    "doc_winnow" -> ((s, dir) =>
      LlmOps.winnowCounts(t(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, w = 4)
        .orderBy("doc_id")),

    "similarity_ivf" -> ((s, dir) => {
      // Contract-oracled: k-means centroids aren't SQL-replayable, so the
      // checked contract is recall — the IVF top-k (nProbe=4 of 8 cells)
      // must recover >= 6 of the true brute-force top-10. A broken index,
      // quantizer, or probe ranking flips recall_ok and fails the compare.
      // (These synthetic embeddings are near-uniform Gaussians, so true
      // neighbors spread across cells and IVF needs a wide probe; real
      // clustered embeddings concentrate at much smaller nProbe/nCells.)
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("__qv"))
      val (assigned, cents) = VectorOps.ivfIndex(emb, "embedding", nCells = 8)
      val ivf = VectorOps.ivfTopK(assigned, cents, "embedding", "vec_id", qv, k = 10, nProbe = 4)
      val brute = VectorOps.bruteForceTopK(emb, "embedding", "vec_id", qv, k = 10)
      ivf.select("vec_id").intersect(brute.select("vec_id"))
        .agg(count(lit(1)).as("__hits"))
        .select(lit(10L).as("k"), (col("__hits") >= 6).as("recall_ok"))
    }),

    "similarity_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("__qv"))
      // 4 planes → 16 buckets, multi-probe scans the query bucket + its 4
      // Hamming-1 neighbors (~5/16 of the table) for high recall. The
      // md5-derived hyperplanes make bucketing + scoring fully
      // DuckDB-replayable — this is a HARD oracle, not rows-only.
      VectorOps.annTopK(emb, "embedding", "vec_id", qv, k = 10, nPlanes = 4, dim = 64)
    }),

    "dedup_clusters" -> ((s, dir) => {
      // pairs → transitive closure → one survivor per duplicate cluster:
      // the drop-list step a dedup pipeline actually ships.
      val docs = t(s, dir, "documents")
      val pairs = LlmOps.nearDupPairs(docs, "doc_id", "text", maxBucketSize = 10000)
      graft.ops.Graph.dedupClusters(docs, pairs, "doc_id")
        .orderBy("doc_id")
    }),

    "snapshot_diff" -> ((s, dir) => {
      // CDC table compare between two deterministic snapshots of orders:
      // keys only in new are added, only in old removed, value-fingerprint
      // mismatches changed. The oracle twin derives the statuses from the
      // modular construction at VALUE level — so it independently checks
      // the fingerprint equality logic, not just replays it.
      val o = t(s, dir, "orders")
      val prev = o.filter(col("o_orderkey") % 7 =!= 0)
      val next = o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      Temporal.snapshotDiff(prev, next, "o_orderkey",
          Seq("o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "star_join_revenue" -> ((s, dir) => {
      // classic warehouse star join (TPC-H Q5 shape): fact lineitem⋈orders
      // with four dimension hops (customer, supplier, nation, region) and
      // an exact-decimal revenue rollup per nation. The dimensions
      // broadcast (plan-audited); only the two fact tables shuffle.
      val li = t(s, dir, "lineitem")
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .groupBy("n_name")
        .agg(Relational.decimalSumProduct(
          col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    "pagerank_topk" -> ((s, dir) => {
      // node importance over the customer↔supplier trade graph (distinct
      // edges from orders⋈lineitem, suppliers offset into their own id
      // space, symmetrized so no dangling mass): 3 integer-exact PageRank
      // rounds, top-20 hubs via TakeOrderedAndProject
      val trade = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000L)).as("dst"))
        .distinct()
      val edges = trade.union(
        trade.select(col("dst").as("src"), col("src").as("dst")))
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 3)
        .orderBy(col("pr").desc, col("node").asc)
        .limit(20)
    }),

    "event_paths" -> ((s, dir) =>
      // most common 3-step user journeys: one window pass (two leads over
      // a (ts, event_id)-total order), trigram count, deterministic top-10
      Temporal.topEventPaths(t(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type", k = 10)),

    "grouping_sets_revenue" -> ((s, dir) =>
      // irregular grouping-set collection {(flag,status),(flag),(status)} —
      // expressible as neither rollup nor cube; one Expand + one aggregate
      Relational.groupingSetsAgg(t(s, dir, "lineitem"),
          Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"),
            Seq("l_linestatus")),
          Seq("l_returnflag", "l_linestatus"),
          Relational.decimalSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag", "status")),

    "iqr_outliers" -> ((s, dir) =>
      // per-language Tukey-fence length outliers: exact quartiles (tiny
      // per-group aggregate) broadcast back onto the corpus scan
      LlmOps.iqrOutliers(t(s, dir, "documents"), "lang", "doc_id", "n_chars")
        .orderBy("doc_id")),

    "split_balance" -> ((s, dir) => {
      // stratification audit: each split's language share vs the corpus
      // share — the hash split claims attribute independence; this query
      // MEASURES it (|share - corpus_share| per cell)
      val withSplit = LlmOps.datasetSplit(t(s, dir, "documents"), "doc_id")
        .join(t(s, dir, "documents").select("doc_id", "lang"), "doc_id")
      val bySplit = withSplit.groupBy("split", "lang").agg(count(lit(1)).as("n"))
      val splitTot = withSplit.groupBy("split").agg(count(lit(1)).as("__st"))
      val corpus = t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("__cn"))
      val corpusTot = t(s, dir, "documents").agg(count(lit(1)).as("__ct"))
      bySplit.join(broadcast(splitTot), "split")
        .join(broadcast(corpus), "lang")
        .crossJoin(broadcast(corpusTot))
        .select(col("split"), col("lang"), col("n"),
          (col("n").cast("double") / col("__st")).as("share"),
          abs(col("n").cast("double") / col("__st") -
            col("__cn").cast("double") / col("__ct")).as("share_drift"))
        .orderBy("split", "lang")
    }),

    "split_leakage" -> ((s, dir) =>
      // train/test leakage: near-dup pairs straddling splits — each row
      // is a test doc whose near-copy the model would train on. The raw
      // corpus is split WITHOUT dedup first, so leakage rows exist here
      // by construction; a production pipeline asserts this empty
      LlmOps.splitLeakage(t(s, dir, "documents"), "doc_id", "text",
          maxBucketSize = 10000)
        .orderBy("id_a", "id_b")),

    "dataset_split" -> ((s, dir) =>
      // reproducible train/val/test + CV fold from one portable hash —
      // no RNG, no shuffle, stable under any cluster layout
      LlmOps.datasetSplit(t(s, dir, "documents"), "doc_id")
        .orderBy("doc_id")),

    "mad_by_group" -> ((s, dir) =>
      // robust scale per language: median + median-absolute-deviation of
      // doc length (two exact percentile passes, broadcast between)
      Relational.madByGroup(t(s, dir, "documents"), "lang", "n_chars")
        .orderBy("lang")),

    "ref_integrity" -> ((s, dir) => {
      // the post-load data contract: orphaned FKs (corruption) and
      // childless dimension rows (coverage) for three relationships
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      Relational.refIntegrity(t(s, dir, "lineitem"), "l_orderkey",
          o, "o_orderkey", "lineitem->orders")
        .union(Relational.refIntegrity(o, "o_custkey",
          c, "c_custkey", "orders->customer"))
        .union(Relational.refIntegrity(t(s, dir, "events"), "user_id",
          c, "c_custkey", "events->customer"))
        .orderBy("relationship")
    }),

    "props_json_stats" -> ((s, dir) =>
      // per-type stats over the JSON props payload: exact integer sum of
      // the extracted field, one final division for the mean
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("__k"))
        .groupBy("event_type")
        .agg(count(col("__k")).as("n"), sum(col("__k")).as("k_sum"),
          (sum(col("__k")).cast("double") / count(col("__k"))).as("k_mean"))
        .orderBy("event_type")),

    "heatmap_counts" -> ((s, dir) => {
      // 2D profile: order month × global price decile — the BI heatmap;
      // same broadcast-global bucketing arithmetic as value_histogram
      val o = t(s, dir, "orders")
      val mm = o.agg(min(col("o_totalprice")).cast("double").as("__vmin"),
        max(col("o_totalprice")).cast("double").as("__vmax"))
      o.crossJoin(broadcast(mm))
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          least(floor((col("o_totalprice") - col("__vmin")) * 10 /
            (col("__vmax") - col("__vmin"))).cast("long"), lit(9L)).as("price_decile"))
        .groupBy("month", "price_decile")
        .agg(count(lit(1)).as("n"))
        .orderBy("month", "price_decile")
    }),

    "wow_change" -> ((s, dir) => {
      // period-over-period report: weekly event volume with lag and an
      // exact-int delta; pct_change is one final division
      val week = floor(datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
        .cast("double") / 7).cast("long")
      val weekly = t(s, dir, "events")
        .select(week.as("week"))
        .groupBy("week").agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("week"))
      weekly
        .select(col("week"), col("cnt"),
          lag(col("cnt"), 1).over(w).as("prev_cnt"))
        .select(col("week"), col("cnt"), col("prev_cnt"),
          ((col("cnt") - col("prev_cnt")).cast("double") / col("prev_cnt"))
            .as("pct_change"))
        .orderBy("week")
    }),

    "quantile_bins" -> ((s, dir) =>
      // equi-depth profile: 10 near-equal-count bins over a (price, key)
      // total order — bin boundaries are exact order statistics
      Relational.quantileBins(t(s, dir, "orders"), "o_totalprice",
          "o_orderkey", bins = 10)
        .orderBy("bin")),

    "zscore_normalize" -> ((s, dir) =>
      // per-language feature scaling from exact decimal moments; the
      // degenerate-variance guard yields null, never NaN
      Relational.zscoreNormalize(t(s, dir, "documents"), "lang", "doc_id",
          "n_chars")
        .orderBy("doc_id")),

    "value_histogram" -> ((s, dir) =>
      // equi-width profile of order totals with data-derived bounds: one
      // broadcast 2-value global, one bucket-id groupBy, audit edges from
      // the same arithmetic the bucketing used
      Relational.equiWidthHistogram(
          t(s, dir, "orders").select(col("o_totalprice")), "o_totalprice",
          buckets = 20)
        .orderBy("bucket")),

    "unicode_nfc" -> ((s, dir) => {
      // composed (U+00E9) vs decomposed (U+0065 U+0301) spellings of the
      // same text hash apart until NFC canonicalization — the native
      // nfc_normalize expression (codegen'd; input returned uncopied when
      // already normalized) makes them bytewise equal, which is the
      // precondition for every hash-keyed dedup stage upstream
      val composed = concat(col("p_name"), lit(" caf\u00e9"))
      val decomposed = concat(col("p_name"), lit(" cafe\u0301"))
      t(s, dir, "part").select(col("p_partkey"),
          (composed === decomposed).as("eq_raw"),
          length(composed).cast("long").as("len_composed"),
          length(decomposed).cast("long").as("len_decomposed"),
          call_function("nfc_normalize", decomposed).as("nfc_text"),
          (call_function("nfc_normalize", decomposed) === composed).as("eq_nfc"))
        .orderBy("p_partkey")
    }),

    "fuzzy_pairs" -> ((s, dir) =>
      // record linkage over the part-name vocabulary: same-noun blocks,
      // edit distance <= 3 — quadratic work bounded by the DISTINCT
      // vocabulary, never the row count
      LlmOps.fuzzyPairs(t(s, dir, "part"), "p_name",
          split(col("p_name"), " ").getItem(1), maxDist = 3)
        .orderBy("name_a", "name_b")),

    "text_normalize" -> ((s, dir) =>
      // canonicalization pass upstream of every hash-keyed dedup stage:
      // control chars -> space, whitespace collapsed, trimmed, lowered
      LlmOps.normalizeText(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "dist_drift" -> ((s, dir) => {
      // snapshot drift monitor: event-type mass before vs after the cut;
      // sum(drift_term)/2 = total variation distance. Divisions once per
      // side then subtract — no log, no float accumulation order
      val e = t(s, dir, "events")
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      LlmOps.distributionDrift(
          e.filter(col("ts") < cut), e.filter(col("ts") >= cut), "event_type")
        .orderBy("event_type")
    }),

    "near_dup_eval" -> ((s, dir) =>
      // banding-parameter calibration: recall of the production LSH
      // candidate path against exact same-block Jaccard ground truth.
      // The eval universe is a deterministic 1-in-2 hash sample — ground
      // truth is O(block²) BY DESIGN, so the op's own contract is to run
      // it on a sample, and the declared query practices that (the
      // sampled block² cost stays bounded as the corpus grows only if
      // the sample is capped; 1-in-2 keeps sf0.01 truth pairs non-empty)
      LlmOps.nearDupEval(
        Relational.hashSample(t(s, dir, "documents"), "doc_id", m = 2),
        "doc_id", "text", "lang", maxBucketSize = 10000)),

    "heavy_hitters" -> ((s, dir) =>
      // frequent-terms sketch contract: exact heavy hitters (>N/33 of all
      // tokens) each checked against the native Misra-Gries summary's
      // no-false-negative and bounded-under-count theorems
      LlmOps.heavyHitters(t(s, dir, "documents"), "text", k = 32)),

    "mixture_apply" -> ((s, dir) => {
      // the sampling step that EXECUTES mixture_plan: per-source rates
      // derived from the data in the same job, broadcast, then a pure
      // hash-threshold filter — the corpus itself never shuffles
      val withTokens = t(s, dir, "documents").select(col("doc_id"),
        col("source"), regexp_count(col("text"), lit("\\S+")).cast("long").as("__n"))
      LlmOps.mixtureApply(withTokens, "source", "doc_id", "__n")
        .orderBy("doc_id")
    }),

    "bpe_pair_counts" -> ((s, dir) =>
      // tokenizer-training statistic: the first BPE merge step's top
      // adjacent char-pair counts inside whitespace tokens
      LlmOps.bpePairCounts(t(s, dir, "documents"), "text", k = 20)),

    "unpivot_metrics" -> ((s, dir) => {
      // wide→long reshape (the melt half of the pivot pair): three metric
      // columns become (key, metric, value) rows — the §2 relational
      // surface's unpivot, a pure per-row Expand with no shuffle beyond
      // the output sort. Values pass through untouched: hash-exact
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
      li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    }),

    "chunk_contamination" -> ((s, dir) => {
      // passage-granular decontamination: non-src0 docs sharing an
      // aligned 16-token chunk fingerprint with the src0 "benchmark"
      // slice (2 docs / 12 chunk hits at sf0.01 — planted by the corpus's
      // cross-source dup structure)
      val docs = t(s, dir, "documents")
      LlmOps.chunkContamination(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", window = 16, stride = 8)
        .orderBy("doc_id")
    }),

    "chunk_windows" -> ((s, dir) =>
      // RAG chunking with overlap: 40-token windows, stride 20; boundary
      // arithmetic is integer-exact, fingerprints are md5 — every row
      // hash-replays in the oracle
      LlmOps.chunkWindows(t(s, dir, "documents"), "doc_id", "text",
          window = 40, stride = 20)
        .orderBy("doc_id", "chunk_id")),

    "bpe_apply" -> ((s, dir) =>
      // tokenize with the learned merges: the post-merge symbol
      // vocabulary's top-20, weighted by corpus occurrence — the working
      // vocabulary a trainer inspects for merge quality. Hash-exact twin
      // extends the bpe_learn CTE chain with one split+count
      LlmOps.bpeApply(t(s, dir, "documents"), "text", steps = 4, k = 20)),

    "bpe_learn" -> ((s, dir) =>
      // the actual tokenizer-training loop: 4 iterative merge steps over
      // the distinct-token vocabulary (one pair-count job + 1-row argmax
      // per step, localCheckpoint lineage truncation). HARD oracle: the
      // DuckDB twin unrolls the 4 steps as CTEs and must reproduce every
      // (step, pair, cnt) exactly
      LlmOps.bpeLearn(t(s, dir, "documents"), "text", steps = 4)),

    "union_by_name" -> ((s, dir) => {
      // schema-evolution union: two ingest batches with drifted schemas
      // align by NAME with null fill — positional union would silently
      // put source values in the lang column
      val docs = t(s, dir, "documents")
      val batchA = docs.filter(col("lang") === "en")
        .select("doc_id", "lang", "n_chars")
      val batchB = docs.filter(col("lang") =!= "en")
        .select("doc_id", "source", "n_chars")
      Relational.unionByNameLoose(Seq(batchA, batchB)).orderBy("doc_id")
    }),

    "bloom_join" -> ((s, dir) => {
      // shuffle-reduction audit: orders joined to one nation's customers
      // through the relational bloom prefilter. Census is fully
      // md5-replayable: n_pass (bloom survivors), n_match (true semi
      // join), false_pass = their gap (bounded by the bloom rate), and
      // the joined-row count + exact floored revenue prove the final join
      // equals the plain one (no false negatives by construction)
      val orders = t(s, dir, "orders")
      val dim = t(s, dir, "customer").filter(col("c_nationkey") === 5)
      val bits = Relational.bloomBits(dim, "c_custkey")
      val nFact = orders.agg(count(lit(1)).as("n_fact"))
      val nPass = Relational.bloomPass(orders, "o_custkey", bits)
        .agg(count(lit(1)).as("n_pass"))
      val nMatch = orders.join(dim, col("o_custkey") === col("c_custkey"),
        "left_semi").agg(count(lit(1)).as("n_match"))
      val joined = Relational.bloomPrefilterJoin(orders, dim,
          "o_custkey", "c_custkey")
        .agg(count(lit(1)).as("n_joined"),
          sum(floor(col("o_totalprice")).cast("long")).as("rev_floor"))
      nFact.crossJoin(nPass).crossJoin(nMatch).crossJoin(joined)
        .select(col("n_fact"), col("n_pass"), col("n_match"),
          (col("n_pass") - col("n_match")).as("false_pass"),
          col("n_joined"), col("rev_floor"))
    }),

    "salted_join_counts" -> ((s, dir) => {
      // skew-proof shuffle join: events' hot user keys spread over 16
      // salted reducers against a 16×-replicated dim; rows identical to
      // the plain join (the oracle IS the plain join), plan audited
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"))
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      Relational.saltedJoin(ev, cust, "user_id", "c_custkey", "event_id",
          salts = 16)
        .groupBy("c_nationkey").agg(count(lit(1)).as("cnt"))
        .orderBy("c_nationkey")
    }),

    "dedup_quality_survivor" -> ((s, dir) => {
      // same clusters as dedup_clusters, but the survivor is the LONGEST
      // doc per cluster (tie: min id) — the keep-the-best-variant rule a
      // production curation run ships instead of keep-the-first
      val docs = t(s, dir, "documents")
      val pairs = LlmOps.nearDupPairs(docs, "doc_id", "text", maxBucketSize = 10000)
      graft.ops.Graph.dedupClustersBy(docs, pairs, "doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    "repetition_score" -> ((s, dir) =>
      LlmOps.repetitionScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "sample_hash" -> ((s, dir) =>
      Relational.hashSample(t(s, dir, "documents"), "doc_id", m = 10)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    "tfidf_top_terms" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs
        .select(col("doc_id"), explode(LlmOps.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      val stats = toks.groupBy("token")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("__n"))
      // log-free surrogate weight tf·N/df: same ranking shape as tf-idf,
      // pure exact-int → IEEE-division arithmetic both engines reproduce
      // bitwise (ln() last-ulp behavior is libm-specific — not hashable)
      stats.crossJoin(broadcast(nDocs))
        .select(col("token"), col("tf"), col("df"),
          (col("tf").cast("double") * col("__n") / col("df")).as("score"))
        .orderBy(col("score").desc, col("token").asc)
        .limit(20)
    }),

    "cms_term_counts" -> ((s, dir) =>
      // deliberately small width (64) at test scale so counter collisions
      // occur and the min-fold + no-underestimate invariant are exercised;
      // the DuckDB twin replays the whole grid (hard sketch oracle)
      LlmOps.cmsTermCounts(t(s, dir, "documents"), "text",
          depth = 4, width = 64, topK = 20)
        .orderBy(col("n_true").desc, col("term_hash").asc)),

    "contamination_check" -> ((s, dir) => {
      // decontamination: containment of each non-benchmark doc's shingle
      // set against the src0 "benchmark" slice (broadcast semi-join on
      // 8-byte hashes — corpus text never shuffles)
      val docs = t(s, dir, "documents")
      LlmOps.contamination(
          docs.filter(col("source") =!= "src0"), "doc_id", "text",
          docs.filter(col("source") === "src0"), "text", shingleN = 3)
        .orderBy("doc_id")
    }),

    "contamination_bloom" -> ((s, dir) => {
      // sketch-side decontamination: benchmark → broadcast bit-position
      // set (k=3, 2^18 bits), membership = semi-join + count-equals-k.
      // Exact hits ride alongside, so the false-positive rate is measured
      // and the no-false-negative invariant (bloom_ok) is checked per doc.
      val docs = t(s, dir, "documents")
      LlmOps.contaminationBloom(
          docs.filter(col("source") =!= "src0"), "doc_id", "text",
          docs.filter(col("source") === "src0"), "text",
          shingleN = 3, bits = 1 << 18, k = 3)
        .orderBy("doc_id")
    }),

    "approx_quantiles" -> ((s, dir) => {
      // Contract-oracled like the HLL sketch: DuckDB can't replay Spark's
      // percentile_approx digest, but it CAN verify the sketch's contract —
      // the approximate median must land within the exact p40..p60 band.
      val o = t(s, dir, "orders")
      val approx = o.groupBy("o_orderpriority")
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("__ap"))
      val exact = o.groupBy("o_orderpriority")
        .agg(percentile(col("o_totalprice"), lit(0.4)).as("__p40"),
          percentile(col("o_totalprice"), lit(0.6)).as("__p60"))
      approx.join(exact, "o_orderpriority")
        .select(col("o_orderpriority"),
          (col("__ap") >= col("__p40") && col("__ap") <= col("__p60")).as("median_ok"))
        .orderBy("o_orderpriority")
    }),

    "pack_sequences" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val withTokens = docs.select(col("doc_id"), col("lang"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("n_tokens"))
      LlmOps.packSequences(withTokens, "doc_id", "n_tokens", "lang", budget = 1000)
        .select("doc_id", "lang", "n_tokens", "pack_id")
        .orderBy("doc_id")
    }),

    "curation_pipeline" -> ((s, dir) =>
      curationSurvivors(s, dir).select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "export_manifest" -> ((s, dir) => {
      // The artifact the curation flow actually ships: survivors packed
      // into per-language token-budget shards (packSequences), manifested
      // as per-shard doc/token counts — what a training job reads to plan
      // its input files. Token counts are recomputed only for the
      // survivor subset (a keyed join + projection, not a second corpus
      // pass).
      val survivors = curationSurvivors(s, dir).select("doc_id", "lang")
      val withTok = survivors.join(
        t(s, dir, "documents").select(col("doc_id"),
          size(LlmOps.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id")
      LlmOps.packSequences(withTok, "doc_id", "n_tokens", "lang", budget = 1000)
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("lang", "pack_id")
    }),

    "pii_scrub" -> ((s, dir) => {
      // PII redaction audit: the text is deterministically augmented with
      // an email (doc_id) and a digit run (n_chars) so the scrub is
      // exercised on every row — the corpus itself is digit-free word
      // soup. Emails scrub FIRST (they contain digits), then digit runs.
      val docs = t(s, dir, "documents")
      val aug = docs.select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com ref "), col("n_chars").cast("string")).as("text"))
      LlmOps.piiScrub(aug, "doc_id", "text").orderBy("doc_id")
    }),

    "chunk_dedup" -> ((s, dir) =>
      // passage-level exact dedup on 10-token windows: per doc, how many
      // chunks it has and how many distinct chunks it "owns" corpus-wide
      LlmOps.chunkDedup(t(s, dir, "documents"), "doc_id", "text", chunkTokens = 10)
        .orderBy("doc_id")),

    "source_overlap" -> ((s, dir) =>
      // corpus-level source-vs-source shingle Jaccard matrix (20 sources
      // → 190 pairs): the "which crawls repeat each other" diagnostic
      LlmOps.sourceOverlap(t(s, dir, "documents"), "source", "text", shingleN = 3)
        .orderBy("source_a", "source_b")),

    "stratified_sample" -> ((s, dir) =>
      // data-mixture reweighting: per-source deterministic keep rates via
      // the portable hash — rerun-stable, no RNG, pure pushed-down filter
      Relational.stratifiedSample(t(s, dir, "documents"), "doc_id", "source",
          Map("src1" -> 80, "src2" -> 50, "src3" -> 20, "src4" -> 10))
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")),

    "event_funnel" -> ((s, dir) =>
      // ordered-event conversion: earliest view -> first click strictly
      // after it -> first purchase strictly after that, per user; failed
      // stages are null and propagate
      Temporal.eventFunnel(t(s, dir, "events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .select(col("user_id"), col("stage_reached"),
          date_format(col("t1"), "yyyy-MM-dd HH:mm:ss").as("t1"),
          date_format(col("t2"), "yyyy-MM-dd HH:mm:ss").as("t2"),
          date_format(col("t3"), "yyyy-MM-dd HH:mm:ss").as("t3"))
        .orderBy("user_id")),

    "retention_cohorts" -> ((s, dir) =>
      // weekly retention matrix: users bucketed by first-activity week,
      // counted in each later week they appear
      Temporal.retentionCohorts(t(s, dir, "events"), "user_id", "ts",
          epochDate = "2024-01-01")
        .orderBy("cohort_week", "week_offset")),

    "zorder_layout" -> ((s, dir) => {
      // storage-layout audit (Delta/Iceberg OPTIMIZE ZORDER analog):
      // events quantized on (user_id, day), Morton-interleaved, bucketed
      // by the z-prefix — per-bucket dimension bounds exhibit the
      // bounded-rectangle property that makes scans on EITHER column
      // prune most buckets
      val e = t(s, dir, "events").select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long").as("day"))
      Relational.zorderLayout(e, "user_id", "day", dimBits = 8, prefixBits = 3)
        .orderBy("zbucket")
    }),

    "scd2_history" -> ((s, dir) =>
      // CDC compaction: event stream → SCD2 attribute-run history with
      // validity bounds; one shuffle, windows share the (key, ts) sort
      Temporal.scd2History(t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
        .select(col("user_id"), col("event_type"), col("version"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current"))
        .orderBy("user_id", "version")),

    "scd2_lookup" -> ((s, dir) => {
      // point-in-time enrichment: every event looks up the SCD2 version
      // (built from the same stream) containing its own timestamp — the
      // self-consistency closure of scd2_history: each row lands in the
      // version it created or lives inside
      val ev = t(s, dir, "events")
      val dim = Temporal.scd2History(ev, "user_id", "event_type", "ts", "event_id")
        .select(col("user_id").as("d_user"), col("event_type").as("dim_type"),
          col("version"), col("valid_from"), col("valid_to"))
      Temporal.scd2Lookup(
          ev.select(col("event_id"), col("user_id"), col("ts")), dim,
          "user_id", "d_user", "ts")
        .select(col("event_id"), col("user_id"), col("dim_type"), col("version"))
        .orderBy("event_id", "version")
    }),

    "embedding_quantize" -> ((s, dir) => {
      // int8 scalar-quantization calibration (per-dim corpus min/max) +
      // the probe row's quantized codes — exact double arithmetic
      val emb = t(s, dir, "embeddings")
      VectorOps.scalarQuantize(emb, "embedding",
          emb.filter(col("vec_id") === 0))
        .orderBy("pos")
    }),

    "kmeans_assign" -> ((s, dir) =>
      // distributed full-data Lloyd k-means (the complement of the
      // IVF sample-fit path): quantize → k lowest-id seeds → 2 exact
      // integer assign/update rounds → final assignment + exact squared
      // distance; the oracle unrolls both rounds as CTEs and replays
      // every floor-division centroid digit-for-digit
      VectorOps.kmeansAssign(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 4, iters = 2)
        .orderBy("vec_id")),

    "embedding_outliers" -> ((s, dir) =>
      // semantic outliers: squared distance to the label centroid in
      // quantized int space — exact int64 score (order-independent sums),
      // one final int→double divide, so the DuckDB twin replays the hash
      VectorOps.quantizedOutliers(t(s, dir, "embeddings"),
          "embedding", "label", "vec_id")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("score_num"), col("n_group"), col("outlier_score"))
        .orderBy(col("outlier_score").desc, col("vec_id").asc)
        .limit(20)),

    "lm_score" -> ((s, dir) =>
      // statistical LM fluency proxy: mean corpus frequency of each doc's
      // bigrams — exact integer numerator, one final division (hashable)
      LlmOps.lmScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "perplexity_buckets" -> ((s, dir) =>
      // CCNet head/middle/tail: ntile(3) over lm_score per language, then
      // the (lang, bucket) doc/bigram-mass table a mixture plan consumes
      LlmOps.perplexityBuckets(t(s, dir, "documents"), "doc_id", "lang", "text")
        .orderBy("lang", "bucket")),

    "ivm_daily_counts" -> ((s, dir) => {
      // incremental view maintenance: history partition + delta partition
      // aggregated independently, merged — hash-checked against the
      // direct full recomputation (the oracle computes it directly)
      val e = t(s, dir, "events")
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"), col("ts"))
      val cut = "2024-01-16 00:00:00"
      val history = e.filter(col("ts") < to_timestamp(lit(cut)))
        .groupBy("user_id", "day").agg(count(lit(1)).cast("long").as("cnt"))
      val delta = e.filter(col("ts") >= to_timestamp(lit(cut)))
        .groupBy("user_id", "day").agg(count(lit(1)).cast("long").as("cnt"))
      Relational.mergeCounts(Seq(history, delta), Seq("user_id", "day"), "cnt")
        .orderBy("user_id", "day")
    }),

    "profile_columns" -> ((s, dir) =>
      // data-quality gate on a fresh drop: per-column rows/nulls/exact
      // distinct/native-typed min-max in ONE aggregate (the multi-distinct
      // Expand keeps it a single pass with map-side partials)
      Relational.profileColumns(t(s, dir, "orders"),
          Seq("o_orderkey", "o_totalprice", "o_orderpriority"))
        .orderBy("col_name")),

    "sliding_distinct_users" -> ((s, dir) =>
      // trailing-2-day active users per daily hop: hopping windows + exact
      // count-distinct (two-level agg, both with partials)
      Temporal.slidingDistinct(t(s, dir, "events"), "ts", "2 days", "1 day",
          "user_id")
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("win_start"),
          col("n_distinct").cast("long").as("n_users"))
        .orderBy("win_start")),

    "merge_upsert" -> ((s, dir) => {
      // lakehouse MERGE: a delta derived from post-cut orders upserts the
      // customer snapshot — updates (new balance), deletes (every 17th
      // key), inserts (key-shifted synthetic rows) — one anti join +
      // union, base never shuffles
      val cut = to_timestamp(lit("1999-01-01 00:00:00"))
      val delta = t(s, dir, "orders").filter(col("o_orderdate") >= cut)
        .groupBy(col("o_custkey"))
        .agg(Relational.decimalSum(col("o_totalprice")).cast("string")
          .cast("double").as("__bal"))
      def asRow(keyCol: Column, del: Column) = Seq(
        keyCol.as("c_custkey"),
        concat(lit("upd-"), keyCol).as("c_name"),
        pmod(keyCol, lit(25)).cast("int").as("c_nationkey"),
        col("__bal").as("c_acctbal"),
        lit("UPDATED").as("c_mktsegment"),
        del.as("__delete"))
      val upd = delta.select(asRow(col("o_custkey"),
        pmod(col("o_custkey"), lit(17)) === 0): _*)
      val ins = delta.filter(pmod(col("o_custkey"), lit(7)) === 0)
        .select(asRow(col("o_custkey") + 10000000L, lit(false)): _*)
      Relational.mergeUpsert(t(s, dir, "customer"),
          upd.unionByName(ins), "c_custkey", "__delete")
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    "skyline_orders" -> ((s, dir) =>
      // multi-objective Pareto frontier: orders no other order beats on
      // BOTH price and recency (one strict) — sort+window rewrite of the
      // quadratic NOT-EXISTS definition, local skylines per bucket then a
      // global pass over survivors only
      Relational.skyline2D(t(s, dir, "orders"), "o_totalprice", "o_orderdate")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy("o_orderkey")),

    "ivm_join_counts" -> ((s, dir) => {
      // incremental maintenance of a JOIN view (extends ivm_daily_counts'
      // single-table IVM to the two-table algebra): V = |O ⋈ L| per
      // custkey. With each side split at the cut into (old, Δ),
      //   ΔV = Δo ⋈ (l_old + Δl)  ∪  o_old ⋈ Δl
      // — two joins each with one DELTA side (the O(|Δ|) maintenance
      // shape; at scale V_old is a stored artifact and only these two
      // delta joins run). The oracle recomputes the full join and checks
      // old + delta = total per key.
      val cut = to_timestamp(lit("1998-01-01 00:00:00"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      val oOld = o.filter(col("o_orderdate") < cut)
      val oDelta = o.filter(col("o_orderdate") >= cut)
      val lDelta = l.filter(col("l_shipdate") >= cut)
      def cnts(df: DataFrame) = df.groupBy("o_custkey")
        .agg(count(lit(1)).cast("long").as("cnt"))
      val vOld = cnts(oOld.join(l.filter(col("l_shipdate") < cut),
        col("o_orderkey") === col("l_orderkey")))
      val vDelta = Relational.mergeCounts(Seq(
          cnts(oDelta.join(l, col("o_orderkey") === col("l_orderkey"))),
          cnts(oOld.join(lDelta, col("o_orderkey") === col("l_orderkey")))),
        Seq("o_custkey"), "cnt")
      vOld.select(col("o_custkey"), col("cnt").as("cnt_old"))
        .join(vDelta.select(col("o_custkey"), col("cnt").as("cnt_delta")),
          Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
          coalesce(col("cnt_delta"), lit(0L)).as("cnt_delta"))
        .withColumn("cnt", col("cnt_old") + col("cnt_delta"))
        .orderBy("o_custkey")
    }),

    "simhash_pairs" -> ((s, dir) =>
      // sketch-side near-dup completion: pigeonhole-banded candidate join
      // over the 48-bit simhash, popcount verify (hamming <= 3), hot
      // buckets capped (homogeneous corpora collide heavily in 12 bits)
      LlmOps.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
          maxBucketSize = 100)
        .orderBy("id_a", "id_b")),

    "simhash_dropped_buckets" -> ((s, dir) =>
      // the cap-loss census as a CHECKED invariant: what simhash_pairs'
      // maxBucketSize=100 cap drops at this SF, oracle-verified — a
      // nonzero count here means the benched pair set was silently lossy.
      // Aggregated to one guaranteed row so the compare is hash-stable
      // even when (as expected) nothing is dropped.
      LlmOps.simhashDroppedBuckets(t(s, dir, "documents"), "doc_id", "text",
          bits = 48, bands = 4, maxBucketSize = 100)
        .agg(count(lit(1)).cast("long").as("n_dropped_buckets"),
          coalesce(sum(col("n_docs")), lit(0L)).cast("long").as("n_dropped_docs"))),

    "vocab_coverage" -> ((s, dir) =>
      // OOV-rate quality signal: share of each doc's tokens inside the
      // corpus top-1000 vocabulary (broadcast semi-join on token hashes)
      LlmOps.vocabCoverage(t(s, dir, "documents"), "doc_id", "text", topK = 1000)
        .orderBy("doc_id")),

    "ngram_dup_rate" -> ((s, dir) =>
      // substring-level dedup signal: fraction of each doc's distinct
      // 3-gram shingles shared with any other doc — one hash-keyed window
      // pass, no posting-list join, corpus text never shuffles
      LlmOps.ngramDupRate(t(s, dir, "documents"), "doc_id", "text", shingleN = 3)
        .orderBy("doc_id")),

    "dup_span_stats" -> ((s, dir) =>
      // positional complement of ngram_dup_rate: per-doc count of
      // corpus-duplicated n-gram OCCURRENCES and the longest consecutive
      // duplicated run — the span a substring-level dedup would cut
      LlmOps.dupSpanStats(t(s, dir, "documents"), "doc_id", "text", shingleN = 3)
        .orderBy("doc_id")),

    "filter_funnel" -> ((s, dir) =>
      // curation-funnel audit: per-source survivors of length floor →
      // repetition ceiling → alpha-ratio floor, cumulative, in ONE pass
      // (conditional aggregation; only (source, 4 counters) shuffle)
      LlmOps.filterFunnel(t(s, dir, "documents"), "source", "text",
          minChars = 150, maxRepetition = 0.01, minAlphaRatio = 0.82)
        .orderBy("source")),

    "mixture_plan" -> ((s, dir) => {
      // training-mixture planning: per-source token shares + the
      // deterministic downsample-to-smallest rates that equalize sources
      val docs = t(s, dir, "documents")
      val withTokens = docs.select(col("source"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("__n"))
      LlmOps.mixturePlan(withTokens, "source", "__n")
        .orderBy("source")
    }),

    "fertility_by_lang" -> ((s, dir) =>
      // per-language tokenizer-fertility (subword proxy per whitespace
      // token): the cost multiplier token-weighted mixture plans need
      LlmOps.fertilityByGroup(t(s, dir, "documents"), "lang", "text")
        .orderBy("lang")),

    "token_len_histogram" -> ((s, dir) => {
      // sequence-length distribution for packing-budget sizing: per-lang
      // doc counts in fixed power-of-two token buckets
      val docs = t(s, dir, "documents")
      val withTokens = docs.select(col("lang"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("__n"))
      LlmOps.tokenLengthHistogram(withTokens, "lang", "__n")
        .orderBy("lang", "len_bucket")
    }),

    "mixture_plan_temp" -> ((s, dir) => {
      // temperature-scaled (alpha=0.5) mixture: sampled share ~ sqrt of
      // the natural share — the multilingual-mixture standard between
      // natural proportions and equal shares
      val docs = t(s, dir, "documents")
      val withTokens = docs.select(col("source"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("__n"))
      LlmOps.mixturePlanTemperature(withTokens, "source", "__n")
        .orderBy("source")
    }),

    "rolling_user_counts" -> ((s, dir) =>
      // trailing 7-day per-user activity via a RANGE event-time frame
      Relational.rollingCountPerKey(
          t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
          "user_id", "ts", windowSeconds = 7L * 86400)
        .select(col("event_id"), col("user_id"), col("rolling_cnt"))
        .orderBy("event_id")),

    "per_group_sample" -> ((s, dir) =>
      // deterministic 5-per-language eval-set pick in md5-hash order
      Relational.perGroupSample(t(s, dir, "documents"), "lang", "doc_id", k = 5)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    "window_percentiles" -> ((s, dir) =>
      // rank-statistic windows: percent_rank + cume_dist per priority
      // group — exact integer-ratio doubles, hash-stable on both engines
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_orderpriority"))
              .orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
            .as("pct_rank"),
          cume_dist().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_orderpriority"))
              .orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
            .as("cume"))
        .orderBy("o_orderkey")),

    // ---- §3 composed pipeline ------------------------------------------
    "flagship_pipeline" -> ((s, dir) => ZoomJobs.flagship(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every declared query has an entry: the
    * dedup/sketch/ANN family runs on the PORTABLE md5-48 hash family
    * (`('0x' || substr(md5(x), off, 12))::BIGINT`) that DuckDB replays
    * digit for digit, and the two ops whose internals aren't
    * SQL-expressible (HLL registers, k-means centroids) are
    * CONTRACT-oracled: the query emits a boolean that the estimate/recall
    * meets its bound, and the oracle asserts that boolean is true.
    */
  def oracleSql: Map[String, String] = Map(

    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "reindex_columns" ->
      """SELECT c_custkey, c_name, c_mktsegment, CAST(NULL AS VARCHAR) AS c_phone
         FROM customer ORDER BY c_custkey""",

    "filter_eq" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE event_type = 'click' ORDER BY event_id""",

    "filter_date_range" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
         ORDER BY o_orderkey""",

    "distinct_keys" ->
      "SELECT DISTINCT l_orderkey FROM lineitem ORDER BY l_orderkey",

    "anti_join_new_keys" ->
      """SELECT DISTINCT c.c_custkey
         FROM customer c
         LEFT JOIN (SELECT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00') o
           ON c.c_custkey = o.o_custkey
         WHERE o.o_custkey IS NULL
         ORDER BY c_custkey""",

    "semi_join_active" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    "join_enrich" ->
      """SELECT c_custkey, c_name, n_name, r_name
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",

    "left_join_counts" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer
         LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00') o
           ON c_custkey = o.o_custkey
         GROUP BY c_custkey
         ORDER BY c_custkey""",

    "full_outer_keys" ->
      """WITH u AS (SELECT DISTINCT o_custkey AS uk FROM orders
                    WHERE o_orderpriority = '1-URGENT'),
            w AS (SELECT DISTINCT o_custkey AS wk FROM orders
                    WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
         SELECT COALESCE(uk, wk) AS cust,
                uk IS NOT NULL AS is_urgent,
                wk IS NOT NULL AS in_window
         FROM u FULL OUTER JOIN w ON uk = wk
         ORDER BY cust""",

    "multimodal_join" ->
      """SELECT doc_id, lang, n_chars, CAST(label AS BIGINT) AS label
         FROM documents JOIN embeddings ON doc_id = vec_id
         ORDER BY doc_id""",

    "union_pages" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey""",

    "add_literal" ->
      """SELECT event_id, user_id, 'zoom' AS source_system FROM events
         ORDER BY event_id""",

    "count_per_group" ->
      """SELECT c_nationkey, COUNT(*) AS cnt FROM customer
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    "agg_revenue_by_flag" ->
      """SELECT l_returnflag, l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
            COUNT(*) AS count_order,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "max_watermark" ->
      "SELECT strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_ts FROM orders",

    "watermark_next_date" ->
      """SELECT strftime(CAST(max(o_orderdate) AS DATE) + 1, '%Y-%m-%d') AS next_date
         FROM orders""",

    "school_year_start" ->
      """SELECT o_orderkey,
            strftime(make_date(
              CASE WHEN month(o_orderdate) > 6 THEN year(o_orderdate)
                   ELSE year(o_orderdate) - 1 END, 8, 1), '%Y-%m-%d') AS sy_start
         FROM orders ORDER BY o_orderkey""",

    "parse_timestamp_tz" ->
      """SELECT event_id,
            strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS parsed_ts
         FROM events ORDER BY event_id""",

    "date_format_iso" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
         FROM orders ORDER BY o_orderkey""",

    "json_extract_settings" ->
      """SELECT event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
            json_extract_string(props, '$.missing') AS missing_val
         FROM events ORDER BY event_id""",

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, rn FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber,
                  CAST(row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
           FROM lineitem) sub
         WHERE rn <= 5 ORDER BY l_returnflag, rn""",

    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "window_lag_ntile" ->
      """SELECT o_custkey, o_orderkey,
            CAST(date_diff('day',
              lag(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS BIGINT) AS days_since_prev,
            CAST(ntile(4) OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_quartile
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
            first_value(o_orderkey) OVER w AS first_key,
            last_value(o_orderkey) OVER w AS last_key,
            nth_value(o_orderkey, 2) OVER w AS second_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",

    "user_profile" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
            array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
            strftime(date_trunc('second', MIN(ts)), '%Y-%m-%d %H:%M:%S') AS first_seen,
            strftime(date_trunc('second', MAX(ts)), '%Y-%m-%d %H:%M:%S') AS last_seen,
            CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM events GROUP BY user_id ORDER BY user_id""",

    "window_dist_funcs" ->
      """SELECT o_orderkey, o_orderpriority,
            percent_rank() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice, o_orderkey) AS pct_rank,
            cume_dist() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice, o_orderkey) AS cume
         FROM orders ORDER BY o_orderkey""",

    "gap_fill_daily" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         spine AS (
           SELECT user_id,
             CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
               CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
           FROM (SELECT user_id, MIN(d) AS lo, MAX(d) AS hi
                 FROM daily GROUP BY 1))
         SELECT s.user_id, strftime(s.d, '%Y-%m-%d') AS day,
           COALESCE(dl.cnt, 0) AS cnt
         FROM spine s LEFT JOIN daily dl ON s.user_id = dl.user_id AND s.d = dl.d
         ORDER BY s.user_id, day""",

    "tumbling_daily_counts" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
            COUNT(*) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "sliding_window_counts" ->
      """WITH w AS (
           SELECT date_trunc('day', ts) AS ws, event_type FROM events
           UNION ALL
           SELECT date_trunc('day', ts) - INTERVAL 1 DAY, event_type FROM events)
         SELECT strftime(ws, '%Y-%m-%d') AS win_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""",

    "pivot_daily_events" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
            COUNT(*) FILTER (event_type = 'click') AS click,
            COUNT(*) FILTER (event_type = 'error') AS error,
            COUNT(*) FILTER (event_type = 'purchase') AS purchase,
            COUNT(*) FILTER (event_type = 'signup') AS signup,
            COUNT(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY day ORDER BY day""",

    "sessionize_gap" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CAST(floor(epoch(ts)) AS BIGINT) AS secs
           FROM events),
         l AS (
           SELECT *, lag(secs) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM e),
         f AS (
           SELECT *, CASE WHEN prev IS NULL OR secs - prev > 1800 THEN 1 ELSE 0 END AS is_new
           FROM l),
         s AS (
           SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM f)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                COUNT(*) AS n_events,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id FROM documents
         GROUP BY md5(lower(trim(text)))
         ORDER BY doc_id""",

    "text_stats" ->
      """SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars_calc,
            CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
            CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
            CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
            md5(lower(trim(text))) AS fp
         FROM documents ORDER BY doc_id""",

    "quality_score" ->
      """SELECT doc_id,
            CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS DOUBLE)
              / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS stopword_ratio,
            length(text) < 100 AS is_short
         FROM documents ORDER BY doc_id""",

    "lang_id" ->
      """SELECT doc_id,
            CASE WHEN en >= es AND en >= fr THEN 'en'
                 WHEN es >= fr THEN 'es'
                 ELSE 'fr' END AS lang_guess
         FROM (
           SELECT doc_id,
                  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS en,
                  len(regexp_extract_all(lower(text), '\b(el|la|de|que|y)\b')) AS es,
                  len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS fr
           FROM documents) sub
         ORDER BY doc_id""",

    "lang_profile" ->
      """SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars
         FROM documents GROUP BY lang ORDER BY lang""",

    "similarity_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         s AS (
           SELECT vec_id,
             list_reduce(list_transform(range(1, len(embedding)+1),
               i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
             list_reduce(list_transform(range(1, len(embedding)+1),
               i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x, y) -> x + y) AS na,
             list_reduce(list_transform(range(1, len(qv)+1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (x, y) -> x + y) AS nb
           FROM embeddings, q)
         SELECT vec_id,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0
                ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
         FROM s ORDER BY score DESC, vec_id LIMIT 10""",

    // same double-fold cosine as similarity_topk; rank + vote windows
    // with the identical (score desc, id) / (votes desc, label) tie-breaks
    "knn_classify" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                    FROM embeddings WHERE vec_id < 10),
         c AS (SELECT * FROM embeddings WHERE vec_id >= 10),
         s AS (
           SELECT q.query_id, c.label, c.vec_id,
             list_reduce(list_transform(range(1, len(c.embedding)+1),
               i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
             list_reduce(list_transform(range(1, len(c.embedding)+1),
               i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS na,
             list_reduce(list_transform(range(1, len(q.qv)+1),
               i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y) AS nb
           FROM c, q),
         sc AS (
           SELECT query_id, label, vec_id,
             CASE WHEN na = 0 OR nb = 0 THEN 0.0
                  ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
           FROM s),
         r AS (
           SELECT query_id, label,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, vec_id) AS rn
           FROM sc),
         v AS (
           SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS votes
           FROM r WHERE rn <= 5 GROUP BY query_id, label)
         SELECT query_id, label AS pred_label, votes FROM (
           SELECT query_id, label, votes,
             row_number() OVER (PARTITION BY query_id
               ORDER BY votes DESC, label) AS r2
           FROM v)
         WHERE r2 = 1 ORDER BY query_id""",

    "hard_negatives_ann" ->
      "SELECT CAST(32 AS BIGINT) AS n_queries, TRUE AS recall_ok, TRUE AS min_recall_ok",

    "knn_classify_ann" ->
      "SELECT CAST(32 AS BIGINT) AS n_queries, TRUE AS agreement_ok",

    "hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS qlab, embedding AS qv
                    FROM embeddings WHERE vec_id < 8),
         c AS (SELECT * FROM embeddings WHERE vec_id >= 8),
         s AS (
           SELECT q.query_id, c.vec_id AS neg_id, c.label AS neg_label,
             list_reduce(list_transform(range(1, len(c.embedding)+1),
               i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
             list_reduce(list_transform(range(1, len(c.embedding)+1),
               i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS na,
             list_reduce(list_transform(range(1, len(q.qv)+1),
               i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y) AS nb
           FROM c, q WHERE c.label <> q.qlab),
         sc AS (
           SELECT query_id, neg_id, neg_label,
             CASE WHEN na = 0 OR nb = 0 THEN 0.0
                  ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
           FROM s),
         r AS (
           SELECT query_id, neg_id, neg_label, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, neg_id) AS rn
           FROM sc)
         SELECT query_id, CAST(rn AS BIGINT) AS rank, neg_id, neg_label, score
         FROM r WHERE rn <= 3 ORDER BY query_id, rank""",

    // BM25 replay: postings -> doc length / corpus globals -> query-term
    // prune -> df -> per-term contribution -> ascending-term sequential
    // fold (list_reduce over list(.. ORDER BY term) = Spark's sort_array
    // + aggregate fold; 0.0 + x == x bitwise for the positive contribs).
    // Constants 1.25/0.75/0.25/2.25/0.5 are exact binary fractions and the
    // surrogate idf is log-free, so scores hash bitwise.
    "bm25_topk" ->
      """WITH q(query_id, term) AS (VALUES
           ('q1', 'spark'), ('q1', 'join'), ('q1', 'fast'),
           ('q2', 'table'), ('q2', 'scan'), ('q2', 'window'),
           ('q3', 'dup'), ('q3', 'vector'), ('q3', 'merge')),
         tf AS (
           SELECT doc_id, token AS term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
                 FROM documents)
           WHERE token <> '' GROUP BY doc_id, token),
         dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
                FROM tf GROUP BY doc_id),
         g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
         tfq AS (SELECT tf.* FROM tf
                 JOIN (SELECT DISTINCT term FROM q) qt USING (term)),
         dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                 FROM tfq GROUP BY term),
         contrib AS (
           SELECT tfq.term, tfq.doc_id,
             ((CAST(g.n AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
               / (CAST(dfq.df AS DOUBLE) + 0.5))
             * ((CAST(tfq.tf AS DOUBLE) * 2.25)
               / (CAST(tfq.tf AS DOUBLE)
                  + 1.25 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                      / (CAST(g.tot AS DOUBLE) / CAST(g.n AS DOUBLE)))))) AS c
           FROM tfq JOIN dl USING (doc_id) JOIN dfq USING (term)
           CROSS JOIN g),
         scored AS (
           SELECT q.query_id, contrib.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             list_reduce(list(c ORDER BY contrib.term), (x, y) -> x + y) AS score
           FROM contrib JOIN q USING (term)
           GROUP BY q.query_id, contrib.doc_id)
         SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, n_terms, score
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rn FROM scored)
         WHERE rn <= 5 ORDER BY query_id, rank""",

    // PMI collocations replay: distinct (doc, term) presence -> uncapped
    // df -> df>=3 vocab prune -> per-doc sorted list capped to first 32
    // ([1:32] = Spark's slice(sort_array(..), 1, 32)) -> in-doc ordered
    // pairs -> count -> lift over exact BIGINT->DOUBLE casts (one multiply
    // per side of a single division, IEEE-deterministic both engines).
    "pmi_pairs" ->
      """WITH dt AS (
           SELECT DISTINCT doc_id, token AS term
           FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
                 FROM documents)
           WHERE token <> ''),
         vocab AS (
           SELECT term, CAST(COUNT(*) AS BIGINT) AS df
           FROM dt GROUP BY term HAVING COUNT(*) >= 3),
         nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
         tv AS (
           SELECT doc_id, unnest(terms) AS term
           FROM (SELECT doc_id, (list_sort(list(term)))[1:32] AS terms
                 FROM dt JOIN vocab USING (term) GROUP BY doc_id)),
         pc AS (
           SELECT x.term AS term_a, y.term AS term_b,
                  CAST(COUNT(*) AS BIGINT) AS n_pair
           FROM tv x JOIN tv y
             ON x.doc_id = y.doc_id AND x.term < y.term
           GROUP BY 1, 2)
         SELECT term_a, term_b, n_pair, va.df AS df_a, vb.df AS df_b,
           (CAST(n_pair AS DOUBLE) * CAST(nd.n AS DOUBLE))
             / (CAST(va.df AS DOUBLE) * CAST(vb.df AS DOUBLE)) AS lift
         FROM pc
         JOIN vocab va ON pc.term_a = va.term
         JOIN vocab vb ON pc.term_b = vb.term
         CROSS JOIN nd
         ORDER BY n_pair DESC, term_a, term_b LIMIT 20""",

    "range_join_pairs" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b
         FROM events a JOIN events b
           ON a.event_id < b.event_id
          AND abs(CAST(floor(epoch(a.ts)) AS BIGINT)
                - CAST(floor(epoch(b.ts)) AS BIGINT)) < 30
         ORDER BY id_a, id_b""",

    "asof_last_purchase" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
            p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id,
            strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS last_purchase_ts
         FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
         ORDER BY c.event_id""",

    "asof_next_purchase" ->
      """SELECT c.event_id, c.user_id,
           strftime((SELECT min(p.ts) FROM events p
                     WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
                       AND p.ts >= c.ts
                       AND p.ts <= c.ts + INTERVAL 2 DAY),
                    '%Y-%m-%d %H:%M:%S') AS next_purchase_ts
         FROM events c WHERE c.event_type = 'click'
         ORDER BY c.event_id""",

    "stats_by_group" ->
      """WITH a AS (
           SELECT o_orderpriority, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS ss
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, n,
           s / n AS avg_price,
           (ss - (s * s) / n) / (n - 1) AS var_price,
           sqrt((ss - (s * s) / n) / (n - 1)) AS stddev_price
         FROM a ORDER BY o_orderpriority""",

    "cube_counts" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
            COALESCE(l_linestatus, 'ALL') AS status,
            COUNT(*) AS cnt
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY flag, status""",

    "percentile_by_group" ->
      """SELECT o_orderpriority,
            quantile_cont(o_totalprice, 0.5) AS median_price,
            quantile_cont(o_totalprice, 0.9) AS p90_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "set_intersect" ->
      """SELECT o_custkey AS cust FROM orders WHERE o_orderpriority = '1-URGENT'
         INTERSECT
         SELECT o_custkey AS cust FROM orders
         WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         ORDER BY cust""",

    "set_except" ->
      """SELECT o_custkey AS cust FROM orders WHERE o_orderpriority = '1-URGENT'
         EXCEPT
         SELECT o_custkey AS cust FROM orders
         WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         ORDER BY cust""",

    "rollup_revenue" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
            COALESCE(l_linestatus, 'ALL') AS status,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            COUNT(*) AS cnt
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY flag, status""",

    "explode_tokens" ->
      """SELECT token, COUNT(*) AS cnt FROM (
           SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
           FROM documents) u
         WHERE token <> ''
         GROUP BY token
         ORDER BY cnt DESC, token LIMIT 20""",

    "dedup_embedding" ->
      """WITH s AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(list_transform(range(1, len(a.embedding)+1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
             list_reduce(list_transform(range(1, len(a.embedding)+1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS na,
             list_reduce(list_transform(range(1, len(b.embedding)+1),
               i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS nb
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id)
         SELECT id_a, id_b,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0
                ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
         FROM s WHERE na <> 0 AND nb <> 0
           AND dot / (sqrt(na) * sqrt(nb)) >= 0.25
         ORDER BY id_a, id_b""",

    "dedup_semantic" ->
      """WITH planes AS (
           SELECT t.j, list_transform(range(0, 64), i ->
             CAST(('0x' || substr(md5('plane:' || t.j || ':' || i), 1, 12))::BIGINT AS DOUBLE)
               / 140737488355328.0 - 1.0) AS p
           FROM range(0, 4) t(j)),
         b AS (
           SELECT e.vec_id, e.embedding,
             (SELECT CAST(SUM(CASE WHEN list_reduce(
                 list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) * p.p[i]),
                 (x, y) -> x + y) >= 0
               THEN (1::BIGINT << p.j) ELSE 0 END) AS BIGINT) FROM planes p) AS cluster
           FROM embeddings e),
         pr AS (
           SELECT y.vec_id AS id_b,
             list_reduce(list_transform(range(1, len(x.embedding) + 1),
               i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)), (u, v) -> u + v) AS dot,
             list_reduce(list_transform(range(1, len(x.embedding) + 1),
               i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE)), (u, v) -> u + v) AS na,
             list_reduce(list_transform(range(1, len(y.embedding) + 1),
               i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)), (u, v) -> u + v) AS nb
           FROM b x JOIN b y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
         pairs AS (
           SELECT id_b,
             CASE WHEN na = 0 OR nb = 0 THEN 0.0
                  ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
           FROM pr),
         dropped AS (SELECT DISTINCT id_b FROM pairs WHERE score >= 0.25)
         SELECT b.vec_id, b.cluster, (d.id_b IS NULL) AS keep
         FROM b LEFT JOIN dropped d ON b.vec_id = d.id_b
         ORDER BY b.vec_id""",

    "dedup_jaccard" ->
      """WITH d AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         ORDER BY id_a, id_b""",

    // ---- portable md5-48 hash family twins -----------------------------

    "dedup_near" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         jac AS (
           SELECT id_a, id_b,
             CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
               / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
           FROM cand
           JOIN sg x ON cand.id_a = x.doc_id
           JOIN sg y ON cand.id_b = y.doc_id)
         SELECT id_a, id_b, jaccard FROM jac
         WHERE jaccard >= 0.7
         ORDER BY id_a, id_b""",

    "minhash_estimate" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id)
         SELECT id_a, id_b,
           CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
             / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard,
           CAST(len(list_filter(range(0, 16), j -> x.sig[j + 1] = y.sig[j + 1])) AS DOUBLE) / 16 AS est
         FROM cand
         JOIN sg x ON cand.id_a = x.doc_id
         JOIN sg y ON cand.id_b = y.doc_id
         ORDER BY id_a, id_b""",

    "incremental_near_dup" ->
      """WITH d AS (
           SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id, source,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id, source,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, source, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         okbase AS (
           SELECT band, bh FROM bands WHERE source <> 'src1'
           GROUP BY band, bh HAVING COUNT(*) <= 10000),
         cb AS (
           SELECT DISTINCT a.doc_id AS bid, b.doc_id AS base_id
           FROM bands a
           JOIN bands b ON a.band = b.band AND a.bh = b.bh
           JOIN okbase ON b.band = okbase.band AND b.bh = okbase.bh
           WHERE a.source = 'src1' AND b.source <> 'src1'),
         vb AS (
           SELECT DISTINCT bid FROM (
             SELECT cb.bid,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS j
             FROM cb JOIN sg x ON cb.bid = x.doc_id JOIN sg y ON cb.base_id = y.doc_id) q
           WHERE j >= 0.7),
         okb AS (
           SELECT band, bh FROM bands WHERE source = 'src1'
           GROUP BY band, bh HAVING COUNT(*) BETWEEN 2 AND 10000),
         ci AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM bands a JOIN okb USING (band, bh)
           JOIN bands c ON a.band = c.band AND a.bh = c.bh
           WHERE a.source = 'src1' AND c.source = 'src1' AND a.doc_id < c.doc_id),
         vi AS (
           SELECT DISTINCT id_b FROM (
             SELECT ci.id_b,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS j
             FROM ci JOIN sg x ON ci.id_a = x.doc_id JOIN sg y ON ci.id_b = y.doc_id) q
           WHERE j >= 0.7)
         SELECT doc.doc_id,
           doc.doc_id IN (SELECT bid FROM vb) AS near_dup_of_base,
           doc.doc_id IN (SELECT id_b FROM vi) AS near_dup_in_batch,
           NOT (doc.doc_id IN (SELECT bid FROM vb))
             AND NOT (doc.doc_id IN (SELECT id_b FROM vi)) AS keep
         FROM documents doc WHERE doc.source = 'src1' ORDER BY doc.doc_id""",

    "incremental_dedup" ->
      """WITH base AS (
           SELECT DISTINCT md5(lower(trim(text))) AS fp, TRUE AS in_base
           FROM documents WHERE source <> 'src1'),
         batch AS (
           SELECT doc_id, md5(lower(trim(text))) AS fp
           FROM documents WHERE source = 'src1'),
         m AS (
           SELECT batch.doc_id,
             COALESCE(in_base, FALSE) AS dup_of_base,
             batch.doc_id <> MIN(batch.doc_id) OVER (PARTITION BY batch.fp) AS dup_in_batch
           FROM batch LEFT JOIN base USING (fp))
         SELECT doc_id, dup_of_base, dup_in_batch,
           (NOT dup_of_base AND NOT dup_in_batch) AS keep
         FROM m ORDER BY doc_id""",

    "dedup_simhash" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
           FROM documents),
         h AS (
           SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok),
         bits AS (
           SELECT doc_id, r.b,
             SUM(CASE WHEN ((h >> r.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
           FROM h CROSS JOIN range(0, 48) r(b)
           GROUP BY doc_id, r.b)
         SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
         FROM bits GROUP BY doc_id ORDER BY doc_id""",

    "doc_winnow" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM t),
         m AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(sh) - 4, 0) + 2),
             i -> list_min(list_slice(sh, i, i + 3))) AS mins
           FROM s)
         SELECT doc_id, CAST(len(list_distinct(mins)) AS BIGINT) AS n_fingerprints
         FROM m ORDER BY doc_id""",

    "approx_distinct_parts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact, TRUE AS hll_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "contamination_bloom" ->
      """WITH t AS (
           SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         p AS (
           SELECT doc_id, source, unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT))) AS h1
           FROM t),
         be AS (SELECT DISTINCT h1 FROM p WHERE source = 'src0'),
         bb AS (
           SELECT DISTINCT ((2 * j.j + 3) * h1 + j.j) % 262144 AS bit
           FROM be, range(0, 3) j(j)),
         c AS (SELECT doc_id, h1 FROM p WHERE source <> 'src0'),
         sizes AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
           FROM c GROUP BY doc_id),
         ex AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ne FROM c
           WHERE h1 IN (SELECT h1 FROM be) GROUP BY doc_id),
         bl AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nb FROM (
             SELECT c.doc_id, c.h1
             FROM c, range(0, 3) j(j)
             WHERE ((2 * j.j + 3) * c.h1 + j.j) % 262144 IN (SELECT bit FROM bb)
             GROUP BY c.doc_id, c.h1 HAVING COUNT(*) = 3) q
           GROUP BY doc_id)
         SELECT s.doc_id, s.n_shingles,
           COALESCE(ex.ne, 0) AS n_exact,
           COALESCE(bl.nb, 0) AS n_bloom,
           COALESCE(bl.nb, 0) >= COALESCE(ex.ne, 0) AS bloom_ok
         FROM sizes s LEFT JOIN ex USING (doc_id) LEFT JOIN bl USING (doc_id)
         ORDER BY doc_id""",

    "similarity_ivf" ->
      "SELECT CAST(10 AS BIGINT) AS k, TRUE AS recall_ok",

    "similarity_ann" ->
      """WITH planes AS (
           SELECT t.j, list_transform(range(0, 64), i ->
             CAST(('0x' || substr(md5('plane:' || t.j || ':' || i), 1, 12))::BIGINT AS DOUBLE)
               / 140737488355328.0 - 1.0) AS p
           FROM range(0, 4) t(j)),
         b AS (
           SELECT e.vec_id, e.embedding,
             (SELECT CAST(SUM(CASE WHEN list_reduce(
                 list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) * p.p[i]),
                 (x, y) -> x + y) >= 0
               THEN (1::BIGINT << p.j) ELSE 0 END) AS BIGINT) FROM planes p) AS bucket
           FROM embeddings e),
         q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0),
         probes AS (
           SELECT qb AS pb FROM q
           UNION
           SELECT xor(qb, 1::BIGINT << r.m) FROM q, range(0, 4) r(m)),
         s AS (
           SELECT b.vec_id,
             list_reduce(list_transform(range(1, len(b.embedding) + 1),
               i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
             list_reduce(list_transform(range(1, len(b.embedding) + 1),
               i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS na,
             list_reduce(list_transform(range(1, len(q.qv) + 1),
               i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y) AS nb
           FROM b JOIN q ON b.bucket IN (SELECT pb FROM probes))
         SELECT vec_id,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0
                ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
         FROM s ORDER BY score DESC, vec_id LIMIT 10""",

    "multimodal_features" ->
      """WITH f AS (
           SELECT doc_id AS media_id,
             list_transform(range(0, 8), j ->
               CAST(('0x' || substr(md5(text || ':' || j), 1, 12))::BIGINT AS DOUBLE)
                 / 140737488355328.0 - 1.0) AS fd
           FROM documents)
         SELECT media_id,
           CAST(len(fd) AS BIGINT) AS n_features,
           CAST(CAST(fd[1] AS FLOAT) AS DOUBLE) AS f0,
           list_reduce(list_transform(fd, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)),
             (a, b) -> a + b) AS f_sum
         FROM f ORDER BY media_id""",

    // rebuild the synthesized image blob in hex-string space and
    // struct-unpack the fixed offsets (byte k = hex chars 2k+1..2k+2):
    // PNG width/height = BE int32 at bytes 16/20 (chars 33/41); JPEG
    // (SOI + 16-byte APP0 + SOF0) height/width = BE uint16 at bytes
    // 25/27 (chars 51/55); GIF width/height = LE uint16 at bytes 6/8
    // (chars 13/17, byte-swapped)
    "image_meta_decode" ->
      """WITH synth AS (
           SELECT doc_id,
             lpad(to_hex(n_chars % 300 + 16), 8, '0') AS w4,
             lpad(to_hex(doc_id % 200 + 16), 8, '0') AS h4,
             lpad(to_hex(n_chars % 300 + 16), 4, '0') AS w2,
             lpad(to_hex(doc_id % 200 + 16), 4, '0') AS h2
           FROM documents),
         blob AS (
           SELECT doc_id,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN '89504e470d0a1a0a0000000d49484452' || w4 || h4 || '0806000000'
               WHEN 1 THEN 'ffd8ffe000104a46494600010100000100010000ffc0001108' || h2 || w2 || '03'
               ELSE '474946383961' || substr(w2, 3, 2) || substr(w2, 1, 2)
                                   || substr(h2, 3, 2) || substr(h2, 1, 2)
             END AS hx
           FROM synth)
         SELECT doc_id AS media_id,
           CASE WHEN substr(hx, 1, 16) = '89504e470d0a1a0a' THEN 'png'
                WHEN substr(hx, 1, 4) = 'ffd8' THEN 'jpeg'
                WHEN substr(hx, 1, 12) = '474946383961' THEN 'gif'
                ELSE 'unknown' END AS fmt,
           CAST(CASE WHEN substr(hx, 1, 16) = '89504e470d0a1a0a'
                       THEN ('0x' || substr(hx, 33, 8))::BIGINT
                     WHEN substr(hx, 1, 4) = 'ffd8'
                       THEN ('0x' || substr(hx, 55, 4))::BIGINT
                     ELSE ('0x' || substr(hx, 15, 2) || substr(hx, 13, 2))::BIGINT
                END AS BIGINT) AS width,
           CAST(CASE WHEN substr(hx, 1, 16) = '89504e470d0a1a0a'
                       THEN ('0x' || substr(hx, 41, 8))::BIGINT
                     WHEN substr(hx, 1, 4) = 'ffd8'
                       THEN ('0x' || substr(hx, 51, 4))::BIGINT
                     ELSE ('0x' || substr(hx, 19, 2) || substr(hx, 17, 2))::BIGINT
                END AS BIGINT) AS height
         FROM blob ORDER BY media_id""",

    "image_meta_filter" ->
      """SELECT doc_id AS media_id, 'png' AS fmt,
           CAST(n_chars % 300 + 16 AS BIGINT) AS width
         FROM documents
         WHERE doc_id % 3 = 0 AND n_chars % 300 + 16 >= 166
         ORDER BY media_id""",

    // value-level re-derivation of the WAV construction: the Spark side
    // parses the bytes, the oracle never touches them
    "audio_meta_decode" ->
      """SELECT doc_id AS media_id, 'wav' AS fmt,
           CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
           CAST((doc_id % 3 + 1) * 8000 AS BIGINT) AS sample_rate,
           CAST(((n_chars % 100 + 1) * (doc_id % 2 + 1) * 2 * 1000)
                // ((doc_id % 3 + 1) * 8000 * (doc_id % 2 + 1) * 2) AS BIGINT)
             AS duration_ms
         FROM documents ORDER BY media_id""",

    "video_meta_decode" ->
      """SELECT doc_id AS media_id, 'mp4' AS fmt,
           CAST((doc_id % 2 + 1) * 600 AS BIGINT) AS timescale,
           CAST(((n_chars % 1000 + 1) * (doc_id % 5 + 1) * 1000)
                // ((doc_id % 2 + 1) * 600) AS BIGINT) AS duration_ms
         FROM documents ORDER BY media_id""",

    "dedup_clusters" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         pairs AS (
           SELECT id_a, id_b FROM (
             SELECT id_a, id_b,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
             FROM cand
             JOIN sg x ON cand.id_a = x.doc_id
             JOIN sg y ON cand.id_b = y.doc_id) j
           WHERE jaccard >= 0.7),
         sym AS (
           SELECT id_a AS a, id_b AS b FROM pairs
           UNION
           SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lbl AS (
           SELECT a AS node, LEAST(a, MIN(b)) AS cluster
           FROM reach GROUP BY a)
         SELECT doc.doc_id,
           COALESCE(l.cluster, doc.doc_id) AS cluster_id,
           doc.doc_id = COALESCE(l.cluster, doc.doc_id) AS keep
         FROM documents doc LEFT JOIN lbl l ON doc.doc_id = l.node
         ORDER BY doc.doc_id""",

    // value-level re-derivation of the diff statuses (NOT an md5 replay):
    // catches fingerprint bugs, not just reproduces them
    "snapshot_diff" ->
      """WITH oldt AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           FROM orders WHERE o_orderkey % 7 <> 0),
         newt AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
           FROM orders WHERE o_orderkey % 5 <> 0)
         SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_custkey = n.o_custkey
                 AND o.o_orderstatus = n.o_orderstatus
                 AND o.o_totalprice = n.o_totalprice THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM oldt o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
         ORDER BY o_orderkey""",

    "star_join_revenue" ->
      """SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    // integer-exact PageRank unrolled: p0 → p1 → p2 → p3 chained CTEs
    // replay Graph.pageRank's div/floor arithmetic digit-for-digit
    "pagerank_topk" ->
      """WITH e0 AS (
           SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
                 FROM e GROUP BY 1),
         n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         p0 AS (SELECT n.node, COALESCE(d.outdeg, 0) AS outdeg,
                  CAST(1000000000 AS BIGINT) AS pr
                FROM n LEFT JOIN deg d USING (node)),
         p1 AS (SELECT p.node, p.outdeg,
                  CAST(150000000 + (85 * COALESCE(m.mass, 0)) // 100 AS BIGINT) AS pr
                FROM p0 p LEFT JOIN (
                  SELECT e.dst AS node, CAST(SUM(q.pr // q.outdeg) AS BIGINT) AS mass
                  FROM p0 q JOIN e ON q.node = e.src
                  WHERE q.outdeg > 0 GROUP BY e.dst) m USING (node)),
         p2 AS (SELECT p.node, p.outdeg,
                  CAST(150000000 + (85 * COALESCE(m.mass, 0)) // 100 AS BIGINT) AS pr
                FROM p1 p LEFT JOIN (
                  SELECT e.dst AS node, CAST(SUM(q.pr // q.outdeg) AS BIGINT) AS mass
                  FROM p1 q JOIN e ON q.node = e.src
                  WHERE q.outdeg > 0 GROUP BY e.dst) m USING (node)),
         p3 AS (SELECT p.node, p.outdeg,
                  CAST(150000000 + (85 * COALESCE(m.mass, 0)) // 100 AS BIGINT) AS pr
                FROM p2 p LEFT JOIN (
                  SELECT e.dst AS node, CAST(SUM(q.pr // q.outdeg) AS BIGINT) AS mass
                  FROM p2 q JOIN e ON q.node = e.src
                  WHERE q.outdeg > 0 GROUP BY e.dst) m USING (node))
         SELECT node, pr FROM p3 ORDER BY pr DESC, node LIMIT 20""",

    "event_paths" ->
      """WITH p AS (
           SELECT event_type AS step1,
             LEAD(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS step2,
             LEAD(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS step3
           FROM events)
         SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n_paths
         FROM p WHERE step2 IS NOT NULL AND step3 IS NOT NULL
         GROUP BY step1, step2, step3
         ORDER BY n_paths DESC, step1, step2, step3 LIMIT 10""",

    "grouping_sets_revenue" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
            COALESCE(l_linestatus, 'ALL') AS status,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            COUNT(*) AS cnt
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), (l_linestatus))
         ORDER BY flag, status""",

    "iqr_outliers" ->
      """WITH f AS (
           SELECT lang, quantile_cont(n_chars, 0.25) AS q1,
                  quantile_cont(n_chars, 0.75) AS q3
           FROM documents GROUP BY lang)
         SELECT doc_id, d.lang, n_chars,
           (n_chars < q1 - 1.5 * (q3 - q1)
              OR n_chars > q3 + 1.5 * (q3 - q1)) AS is_outlier
         FROM documents d JOIN f USING (lang) ORDER BY doc_id""",

    "split_balance" ->
      """WITH sp AS (
           SELECT doc_id, lang,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       / 281474976710656.0 < 0.8 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       / 281474976710656.0 < 0.9 THEN 'val'
                  ELSE 'test' END AS split
           FROM documents),
         bys AS (SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n
                 FROM sp GROUP BY split, lang),
         st AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS stt FROM sp GROUP BY split),
         co AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cn FROM documents GROUP BY lang),
         ct AS (SELECT CAST(COUNT(*) AS BIGINT) AS ctt FROM documents)
         SELECT split, bys.lang, n,
           CAST(n AS DOUBLE) / stt AS share,
           abs(CAST(n AS DOUBLE) / stt - CAST(cn AS DOUBLE) / ctt) AS share_drift
         FROM bys JOIN st USING (split) JOIN co ON bys.lang = co.lang, ct
         ORDER BY split, bys.lang""",

    // same banded pair chain as dedup_near + the dataset_split CASE;
    // leakage = threshold pairs whose endpoints land in different splits
    "split_leakage" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         jac AS (
           SELECT id_a, id_b,
             CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
               / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
           FROM cand
           JOIN sg x ON cand.id_a = x.doc_id
           JOIN sg y ON cand.id_b = y.doc_id),
         sp AS (
           SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       / 281474976710656.0 < 0.8 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       / 281474976710656.0 < 0.9 THEN 'val'
                  ELSE 'test' END AS split
           FROM documents)
         SELECT jac.id_a, jac.id_b, a.split AS split_a, b.split AS split_b
         FROM jac
         JOIN sp a ON jac.id_a = a.doc_id
         JOIN sp b ON jac.id_b = b.doc_id
         WHERE jac.jaccard >= 0.7 AND a.split <> b.split
         ORDER BY id_a, id_b""",

    "dataset_split" ->
      """SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                     / 281474976710656.0 < 0.8 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                     / 281474976710656.0 < 0.9 THEN 'val'
                ELSE 'test' END AS split,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 12))::BIGINT % 5 AS cv_fold
         FROM documents ORDER BY doc_id""",

    "mad_by_group" ->
      """WITH med AS (
           SELECT lang, quantile_cont(n_chars, 0.5) AS median
           FROM documents GROUP BY lang)
         SELECT d.lang, median,
           quantile_cont(abs(CAST(n_chars AS DOUBLE) - median), 0.5) AS mad
         FROM documents d JOIN med USING (lang)
         GROUP BY d.lang, median ORDER BY d.lang""",

    "ref_integrity" ->
      """WITH rel AS (
           SELECT 'lineitem->orders' AS relationship,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan_child,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_parent,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS n_childless_parent
           UNION ALL
           SELECT 'orders->customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
           UNION ALL
           SELECT 'events->customer',
             (SELECT COUNT(*) FROM events),
             (SELECT COUNT(*) FROM events e
               WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)),
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)))
         SELECT * FROM rel ORDER BY relationship""",

    "props_json_stats" ->
      """WITH x AS (
           SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT event_type, CAST(COUNT(k) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(SUM(k) AS DOUBLE) / COUNT(k) AS k_mean
         FROM x GROUP BY event_type ORDER BY event_type""",

    "heatmap_counts" ->
      """WITH mm AS (SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS vmin,
                            CAST(MAX(o_totalprice) AS DOUBLE) AS vmax
                     FROM orders)
         SELECT strftime(o_orderdate, '%Y-%m') AS month,
           LEAST(CAST(FLOOR((o_totalprice - vmin) * 10 / (vmax - vmin)) AS BIGINT),
                 9) AS price_decile,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM orders, mm
         GROUP BY month, price_decile ORDER BY month, price_decile""",

    "wow_change" ->
      """WITH wk AS (
           SELECT CAST(FLOOR(CAST(date_diff('day', DATE '2024-01-01',
                    CAST(ts AS DATE)) AS DOUBLE) / 7) AS BIGINT) AS week
           FROM events),
         weekly AS (
           SELECT week, CAST(COUNT(*) AS BIGINT) AS cnt FROM wk GROUP BY week),
         lagged AS (
           SELECT week, cnt, lag(cnt) OVER (ORDER BY week) AS prev_cnt
           FROM weekly)
         SELECT week, cnt, prev_cnt,
           CAST(cnt - prev_cnt AS DOUBLE) / prev_cnt AS pct_change
         FROM lagged ORDER BY week""",

    "quantile_bins" ->
      """WITH b AS (
           SELECT o_totalprice,
             CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bin
           FROM orders)
         SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
         FROM b GROUP BY bin ORDER BY bin""",

    // mirrors the Spark expression sequence exactly: exact decimal sums
    // cast to double, mean = sx/n, var = sx2/n - mean*mean, z via sqrt
    "zscore_normalize" ->
      """WITH m AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,0)) * CAST(n_chars AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sx2
           FROM documents GROUP BY lang)
         SELECT doc_id, d.lang, n_chars,
           CASE WHEN (sx2 / n - (sx / n) * (sx / n)) <= 0 THEN NULL
                ELSE (CAST(n_chars AS DOUBLE) - sx / n)
                     / sqrt(sx2 / n - (sx / n) * (sx / n)) END AS zscore
         FROM documents d JOIN m USING (lang) ORDER BY doc_id""",

    "value_histogram" ->
      """WITH mm AS (SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS vmin,
                            CAST(MAX(o_totalprice) AS DOUBLE) AS vmax
                     FROM orders),
         b AS (
           SELECT CASE WHEN vmax = vmin THEN 0
                  ELSE LEAST(CAST(FLOOR((o_totalprice - vmin) * 20
                                        / (vmax - vmin)) AS BIGINT), 19)
                  END AS bucket, vmin, vmax
           FROM orders, mm)
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(vmin + bucket * (vmax - vmin) / 20) AS lo_edge,
           MIN(vmin + (bucket + 1) * (vmax - vmin) / 20) AS hi_edge
         FROM b GROUP BY bucket ORDER BY bucket""",

    "fuzzy_pairs" ->
      """WITH names AS (
           SELECT DISTINCT p_name AS nm, split_part(p_name, ' ', 2) AS blk
           FROM part)
         SELECT a.nm AS name_a, b.nm AS name_b,
           CAST(levenshtein(a.nm, b.nm) AS INTEGER) AS dist
         FROM names a JOIN names b ON a.blk = b.blk AND a.nm < b.nm
         WHERE levenshtein(a.nm, b.nm) <= 3
         ORDER BY name_a, name_b""",

    "unicode_nfc" ->
      """WITH v AS (
           SELECT p_partkey,
             p_name || ' caf' || chr(233) AS composed,
             p_name || ' cafe' || chr(769) AS decomposed
           FROM part)
         SELECT p_partkey,
           (composed = decomposed) AS eq_raw,
           CAST(length(composed) AS BIGINT) AS len_composed,
           CAST(length(decomposed) AS BIGINT) AS len_decomposed,
           nfc_normalize(decomposed) AS nfc_text,
           (nfc_normalize(decomposed) = composed) AS eq_nfc
         FROM v ORDER BY p_partkey""",

    "text_normalize" ->
      """WITH n AS (
           SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(lower(text),
               '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
           FROM documents)
         SELECT doc_id, norm_text,
           (norm_text IS DISTINCT FROM text) AS changed
         FROM n ORDER BY doc_id""",

    "dist_drift" ->
      """WITH a AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt_a FROM events
           WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
         b AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM events
           WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
         ta AS (SELECT CAST(COUNT(*) AS BIGINT) AS ta FROM events
                WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
         tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS tb FROM events
                WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
         j AS (
           SELECT COALESCE(a.event_type, b.event_type) AS event_type,
             COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
           FROM a FULL OUTER JOIN b ON a.event_type = b.event_type)
         SELECT event_type, cnt_a, cnt_b,
           CAST(cnt_a AS DOUBLE) / ta AS p_a,
           CAST(cnt_b AS DOUBLE) / tb AS p_b,
           abs(CAST(cnt_a AS DOUBLE) / ta - CAST(cnt_b AS DOUBLE) / tb) AS drift_term
         FROM j, ta, tb ORDER BY event_type""",

    // same shingle/signature/banding CTEs as dedup_near; truth = exact
    // same-lang Jaccard >= 0.7 on the identical md5-48 sets
    "near_dup_eval" ->
      """WITH docs2 AS (
           SELECT * FROM documents
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 2 = 0),
         d AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM docs2),
         hp AS (
           SELECT doc_id, lang,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id, lang,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         truth AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b
           FROM sg x JOIN sg y ON x.lang = y.lang AND x.doc_id < y.doc_id
            AND len(x.shset) * 0.7 <= len(y.shset)
            AND len(y.shset) * 0.7 <= len(x.shset)
           WHERE CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) >= 0.7),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         candb AS (
           SELECT cand.id_a, cand.id_b FROM cand
           JOIN sg x ON cand.id_a = x.doc_id
           JOIN sg y ON cand.id_b = y.doc_id
           WHERE x.lang = y.lang),
         hit AS (SELECT id_a, id_b FROM truth INTERSECT SELECT id_a, id_b FROM candb)
         SELECT
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM candb) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit,
           CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
             / (SELECT COUNT(*) FROM truth) AS recall""",

    // contract twin: DuckDB computes the exact heavy hitters and asserts
    // the sketch booleans as literal true — any MG violation hash-fails
    "heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
         ex AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM toks GROUP BY term)
         SELECT term, cnt, true AS in_sketch, true AS bound_ok
         FROM ex, n WHERE cnt * 33 > n ORDER BY cnt DESC, term""",

    // replays mixturePlan's rate table then the hash-threshold keep rule;
    // DuckDB x/0 → NULL matches the zero-weight guard (rows drop)
    "mixture_apply" ->
      """WITH t AS (
           SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
           FROM documents),
         b AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens
               FROM t GROUP BY source),
         g AS (SELECT MIN(n_tokens) AS mn FROM b),
         r AS (SELECT source, CAST(mn AS DOUBLE) / n_tokens AS rate FROM b, g)
         SELECT doc_id, t.source FROM t JOIN r USING (source)
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
               / 281474976710656.0 < rate
         ORDER BY doc_id""",

    "bpe_pair_counts" ->
      """WITH tok AS (
           SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk
           FROM documents),
         p AS (
           SELECT unnest(list_transform(range(1, len(tk)),
             i -> substr(tk, i, 2))) AS pair
           FROM tok WHERE len(tk) >= 2)
         SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""",

    // the 4-step merge loop unrolled: v_k = vocab after k merges, p_k =
    // pair counts over v_{k-1}, b_k = the argmax merge. chr(31) is the
    // doubled U+001F symbol delimiter; replace() scans left-to-right
    // non-overlapping in both engines, so greedy merge application
    // replays exactly.
    "unpivot_metrics" ->
      """WITH base AS (
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                  l_quantity, l_discount, l_tax
           FROM lineitem WHERE l_orderkey < 1000)
         SELECT l_orderkey, l_linenumber, metric, value FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM base
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM base
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM base)
         ORDER BY l_orderkey, l_linenumber, metric""",

    "chunk_contamination" ->
      """WITH t2 AS (
           SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents WHERE trim(text) <> ''),
         t3 AS (SELECT doc_id, source, toks, len(toks) AS n FROM t2),
         st AS (
           SELECT doc_id, source, toks, n,
             unnest(range(0, 1 + (greatest(n - 16, 0) + 7) // 8)) AS c
           FROM t3),
         ch AS (
           SELECT doc_id, source,
             md5(array_to_string(toks[c * 8 + 1 : least(c * 8 + 16, n)], ' ')) AS fp
           FROM st),
         bf AS (SELECT DISTINCT fp FROM ch WHERE source = 'src0'),
         corpus AS (SELECT doc_id, fp FROM ch WHERE source <> 'src0'),
         hits AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit FROM corpus
           WHERE fp IN (SELECT fp FROM bf) GROUP BY doc_id)
         SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           COALESCE(ANY_VALUE(h.n_hit), 0) AS n_hit,
           COALESCE(ANY_VALUE(h.n_hit), 0) > 0 AS contaminated
         FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
         GROUP BY c.doc_id ORDER BY c.doc_id""",

    "chunk_windows" ->
      """WITH t2 AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents WHERE trim(text) <> ''),
         t3 AS (SELECT doc_id, toks, len(toks) AS n FROM t2),
         st AS (
           SELECT doc_id, toks, n,
             unnest(range(0, 1 + (greatest(n - 40, 0) + 19) // 20)) AS c
           FROM t3)
         SELECT doc_id, c AS chunk_id, c * 20 AS start_tok,
           CAST(len(toks[c * 20 + 1 : least(c * 20 + 40, n)]) AS BIGINT) AS n_toks,
           md5(array_to_string(toks[c * 20 + 1 : least(c * 20 + 40, n)], ' ')) AS chunk_fp
         FROM st ORDER BY doc_id, chunk_id""",

    "bpe_apply" ->
      """WITH tok AS (
           SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk
           FROM documents),
         v0 AS (
           SELECT regexp_replace(tk, '(.)', chr(31) || '\1' || chr(31), 'g') AS sym,
                  COUNT(*) AS freq
           FROM tok WHERE len(tk) > 0 GROUP BY 1),
         s1 AS (SELECT freq, string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms FROM v0),
         i1 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM s1 WHERE len(syms) >= 2),
         p1 AS (SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt FROM i1 GROUP BY 1, 2),
         b1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
         v1 AS (SELECT replace(sym, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                               chr(31) || b.l || b.r || chr(31)) AS sym, freq
                FROM v0, b1 b),
         s2 AS (SELECT freq, string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms FROM v1),
         i2 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM s2 WHERE len(syms) >= 2),
         p2 AS (SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt FROM i2 GROUP BY 1, 2),
         b2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
         v2 AS (SELECT replace(sym, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                               chr(31) || b.l || b.r || chr(31)) AS sym, freq
                FROM v1, b2 b),
         s3 AS (SELECT freq, string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms FROM v2),
         i3 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM s3 WHERE len(syms) >= 2),
         p3 AS (SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt FROM i3 GROUP BY 1, 2),
         b3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1),
         v3 AS (SELECT replace(sym, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                               chr(31) || b.l || b.r || chr(31)) AS sym, freq
                FROM v2, b3 b),
         s4 AS (SELECT freq, string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms FROM v3),
         i4 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM s4 WHERE len(syms) >= 2),
         p4 AS (SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt FROM i4 GROUP BY 1, 2),
         b4 AS (SELECT l, r, cnt FROM p4 ORDER BY cnt DESC, l, r LIMIT 1),
         v4 AS (SELECT replace(sym, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                               chr(31) || b.l || b.r || chr(31)) AS sym, freq
                FROM v3, b4 b),
         sy AS (SELECT freq, unnest(string_split(trim(sym, chr(31)), chr(31) || chr(31))) AS symbol
                FROM v4)
         SELECT symbol, CAST(SUM(freq) AS BIGINT) AS cnt
         FROM sy GROUP BY symbol ORDER BY cnt DESC, symbol LIMIT 20""",

    "bpe_learn" ->
      """WITH tok AS (
           SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk
           FROM documents),
         v0 AS (
           SELECT regexp_replace(tk, '(.)', chr(31) || '\1' || chr(31), 'g') AS sym,
                  COUNT(*) AS freq
           FROM tok WHERE len(tk) > 0 GROUP BY 1),
         s1 AS (SELECT freq, string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms FROM v0),
         i1 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM s1 WHERE len(syms) >= 2),
         p1 AS (SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt FROM i1 GROUP BY 1, 2),
         b1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
         v1 AS (SELECT replace(sym, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                               chr(31) || b.l || b.r || chr(31)) AS sym, freq
                FROM v0, b1 b),
         s2 AS (SELECT freq, string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms FROM v1),
         i2 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM s2 WHERE len(syms) >= 2),
         p2 AS (SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt FROM i2 GROUP BY 1, 2),
         b2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
         v2 AS (SELECT replace(sym, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                               chr(31) || b.l || b.r || chr(31)) AS sym, freq
                FROM v1, b2 b),
         s3 AS (SELECT freq, string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms FROM v2),
         i3 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM s3 WHERE len(syms) >= 2),
         p3 AS (SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt FROM i3 GROUP BY 1, 2),
         b3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1),
         v3 AS (SELECT replace(sym, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                               chr(31) || b.l || b.r || chr(31)) AS sym, freq
                FROM v2, b3 b),
         s4 AS (SELECT freq, string_split(trim(sym, chr(31)), chr(31) || chr(31)) AS syms FROM v3),
         i4 AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM s4 WHERE len(syms) >= 2),
         p4 AS (SELECT syms[i] AS l, syms[i + 1] AS r, SUM(freq) AS cnt FROM i4 GROUP BY 1, 2),
         b4 AS (SELECT l, r, cnt FROM p4 ORDER BY cnt DESC, l, r LIMIT 1)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS step, l AS left_sym, r AS right_sym,
                  CAST(cnt AS BIGINT) AS cnt FROM b1
           UNION ALL SELECT 2, l, r, CAST(cnt AS BIGINT) FROM b2
           UNION ALL SELECT 3, l, r, CAST(cnt AS BIGINT) FROM b3
           UNION ALL SELECT 4, l, r, CAST(cnt AS BIGINT) FROM b4)
         ORDER BY step""",

    "union_by_name" ->
      """SELECT doc_id, lang, n_chars, CAST(NULL AS VARCHAR) AS source
         FROM documents WHERE lang = 'en'
         UNION ALL
         SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, n_chars, source
         FROM documents WHERE lang <> 'en'
         ORDER BY doc_id""",

    // the oracle IS the plain join: salting must be output-invisible
    "bloom_join" ->
      """WITH dim AS (SELECT c_custkey FROM customer WHERE c_nationkey = 5),
         bits AS (
           SELECT DISTINCT ('0x' || substr(md5('bloom:' || t.j || ':' ||
             CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT % 4096 AS pos
           FROM dim, range(0, 2) t(j)),
         pass AS (
           SELECT * FROM orders
           WHERE (('0x' || substr(md5('bloom:0:' || CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT % 4096)
                   IN (SELECT pos FROM bits)
             AND (('0x' || substr(md5('bloom:1:' || CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT % 4096)
                   IN (SELECT pos FROM bits)),
         mtch AS (SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM dim)),
         joined AS (SELECT o_totalprice FROM pass JOIN dim ON o_custkey = c_custkey)
         SELECT
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_fact,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pass) AS n_pass,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mtch) AS n_match,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pass) -
             (SELECT CAST(COUNT(*) AS BIGINT) FROM mtch) AS false_pass,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM joined) AS n_joined,
           (SELECT CAST(SUM(FLOOR(o_totalprice)) AS BIGINT) FROM joined) AS rev_floor""",

    "salted_join_counts" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    // same transitive closure as dedup_clusters; survivor = argmax(n_chars)
    // per cluster, ties to the smaller id
    "dedup_quality_survivor" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         pairs AS (
           SELECT id_a, id_b FROM (
             SELECT id_a, id_b,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
             FROM cand
             JOIN sg x ON cand.id_a = x.doc_id
             JOIN sg y ON cand.id_b = y.doc_id) j
           WHERE jaccard >= 0.7),
         sym AS (
           SELECT id_a AS a, id_b AS b FROM pairs
           UNION
           SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lbl AS (
           SELECT a AS node, LEAST(a, MIN(b)) AS cluster
           FROM reach GROUP BY a),
         base AS (
           SELECT doc.doc_id, doc.n_chars,
             COALESCE(l.cluster, doc.doc_id) AS cluster_id
           FROM documents doc LEFT JOIN lbl l ON doc.doc_id = l.node)
         SELECT doc_id, cluster_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep
         FROM base ORDER BY doc_id""",

    "repetition_score" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM t)
         SELECT doc_id,
           CAST(len(sh) AS BIGINT) AS n_shingles,
           CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
           1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE) AS repetition
         FROM s ORDER BY doc_id""",

    "sample_hash" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 10 = 0
         ORDER BY doc_id""",

    "tfidf_top_terms" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
           FROM documents),
         t AS (
           SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks WHERE token <> '' GROUP BY token),
         n AS (SELECT COUNT(*) AS n FROM documents)
         SELECT token, tf, df, CAST(tf AS DOUBLE) * n.n / df AS score
         FROM t, n
         ORDER BY score DESC, token LIMIT 20""",

    // full count-min-sketch replay: grid build, per-term probes, min-fold
    "cms_term_counts" ->
      """WITH tok AS (
           SELECT ('0x' || substr(md5(t), 1, 12))::BIGINT AS h
           FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
                 FROM documents)
           WHERE t <> ''),
         rows_ AS (SELECT unnest([0, 1, 2, 3]) AS j),
         sketch AS (
           SELECT j, ((2 * j + 3) * h + j) % 64 AS p, COUNT(*) AS c
           FROM tok CROSS JOIN rows_ GROUP BY 1, 2),
         truth AS (
           SELECT h, COUNT(*) AS n_true FROM tok GROUP BY h
           ORDER BY n_true DESC, h ASC LIMIT 20),
         est AS (
           SELECT t.h, t.n_true, MIN(s.c) AS n_est
           FROM truth t CROSS JOIN rows_ g
           JOIN sketch s ON s.j = g.j AND s.p = ((2 * g.j + 3) * t.h + g.j) % 64
           GROUP BY t.h, t.n_true)
         SELECT h AS term_hash, CAST(n_true AS BIGINT) AS n_true,
           CAST(n_est AS BIGINT) AS n_est, n_est >= n_true AS no_underestimate
         FROM est ORDER BY n_true DESC, term_hash ASC""",

    "contamination_check" ->
      """WITH hs AS (
           SELECT doc_id, source, list_transform(
             range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(
               list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM documents),
         b AS (
           SELECT DISTINCT unnest(sh) AS bsh FROM hs WHERE source = 'src0'),
         d AS (
           SELECT doc_id, list_distinct(sh) AS sh FROM hs WHERE source <> 'src0'),
         e AS (SELECT doc_id, unnest(sh) AS s FROM d),
         hits AS (
           SELECT doc_id, COUNT(*) AS n_hit
           FROM e JOIN b ON e.s = b.bsh GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(len(d.sh) AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_contaminated,
           CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / len(d.sh) AS containment
         FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
         ORDER BY d.doc_id""",

    "approx_quantiles" ->
      """SELECT o_orderpriority, TRUE AS median_ok
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "pack_sequences" ->
      """WITH t AS (
           SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT *, SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t)
         SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // 1000 AS BIGINT) AS pack_id
         FROM c ORDER BY doc_id""",

    "curation_pipeline" ->
      """WITH RECURSIVE
         toks AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents),
         shs AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(tk) - 3, 0) + 2),
             i -> array_to_string(list_slice(tk, i, i + 2), ' ')) AS shseq
           FROM toks),
         rep AS (
           SELECT doc_id,
             1.0 - CAST(len(list_distinct(list_transform(shseq,
               s -> ('0x' || substr(md5(s), 1, 12))::BIGINT))) AS DOUBLE)
               / len(shseq) AS repetition
           FROM shs),
         s1 AS (
           SELECT d.doc_id, d.lang, d.n_chars, d.text
           FROM documents d JOIN rep USING (doc_id)
           WHERE d.source <> 'src0' AND length(d.text) >= 100
             AND rep.repetition < 0.2),
         ex AS (
           SELECT MIN(doc_id) AS doc_id FROM s1
           GROUP BY md5(lower(trim(text)))),
         s2 AS (SELECT s1.* FROM s1 JOIN ex USING (doc_id)),
         d2 AS (
           SELECT s2.doc_id, list_distinct(shs.shseq) AS sh
           FROM s2 JOIN shs USING (doc_id)),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d2 WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         pairs AS (
           SELECT id_a, id_b FROM (
             SELECT id_a, id_b,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
             FROM cand
             JOIN sg x ON cand.id_a = x.doc_id
             JOIN sg y ON cand.id_b = y.doc_id) j
           WHERE jaccard >= 0.7),
         sym AS (
           SELECT id_a AS a, id_b AS b FROM pairs
           UNION
           SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lbl AS (
           SELECT a AS node, LEAST(a, MIN(b)) AS cluster
           FROM reach GROUP BY a),
         s3 AS (
           SELECT s2.* FROM s2 LEFT JOIN lbl ON s2.doc_id = lbl.node
           WHERE s2.doc_id = COALESCE(lbl.cluster, s2.doc_id)),
         bset AS (
           SELECT DISTINCT unnest(list_transform(shs.shseq,
             s -> ('0x' || substr(md5(s), 1, 12))::BIGINT)) AS bsh
           FROM shs JOIN documents d ON shs.doc_id = d.doc_id
           WHERE d.source = 'src0'),
         dset AS (
           SELECT s3.doc_id, list_distinct(list_transform(shs.shseq,
             s -> ('0x' || substr(md5(s), 1, 12))::BIGINT)) AS sh
           FROM s3 JOIN shs ON s3.doc_id = shs.doc_id),
         hits AS (
           SELECT doc_id, COUNT(*) AS nh
           FROM (SELECT doc_id, unnest(sh) AS x FROM dset) e
           JOIN bset ON e.x = bset.bsh GROUP BY doc_id)
         SELECT s3.doc_id, s3.lang, CAST(s3.n_chars AS BIGINT) AS n_chars
         FROM s3 JOIN dset USING (doc_id) LEFT JOIN hits USING (doc_id)
         WHERE CAST(COALESCE(hits.nh, 0) AS DOUBLE) / len(dset.sh) < 0.5
         ORDER BY s3.doc_id""",

    // same curation twin, manifested: survivors packed into per-language
    // token-budget shards, per-shard doc/token counts
    "export_manifest" ->
      """WITH RECURSIVE
         toks AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents),
         shs AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(tk) - 3, 0) + 2),
             i -> array_to_string(list_slice(tk, i, i + 2), ' ')) AS shseq
           FROM toks),
         rep AS (
           SELECT doc_id,
             1.0 - CAST(len(list_distinct(list_transform(shseq,
               s -> ('0x' || substr(md5(s), 1, 12))::BIGINT))) AS DOUBLE)
               / len(shseq) AS repetition
           FROM shs),
         s1 AS (
           SELECT d.doc_id, d.lang, d.n_chars, d.text
           FROM documents d JOIN rep USING (doc_id)
           WHERE d.source <> 'src0' AND length(d.text) >= 100
             AND rep.repetition < 0.2),
         ex AS (
           SELECT MIN(doc_id) AS doc_id FROM s1
           GROUP BY md5(lower(trim(text)))),
         s2 AS (SELECT s1.* FROM s1 JOIN ex USING (doc_id)),
         d2 AS (
           SELECT s2.doc_id, list_distinct(shs.shseq) AS sh
           FROM s2 JOIN shs USING (doc_id)),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d2 WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         pairs AS (
           SELECT id_a, id_b FROM (
             SELECT id_a, id_b,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
             FROM cand
             JOIN sg x ON cand.id_a = x.doc_id
             JOIN sg y ON cand.id_b = y.doc_id) j
           WHERE jaccard >= 0.7),
         sym AS (
           SELECT id_a AS a, id_b AS b FROM pairs
           UNION
           SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lbl AS (
           SELECT a AS node, LEAST(a, MIN(b)) AS cluster
           FROM reach GROUP BY a),
         s3 AS (
           SELECT s2.* FROM s2 LEFT JOIN lbl ON s2.doc_id = lbl.node
           WHERE s2.doc_id = COALESCE(lbl.cluster, s2.doc_id)),
         bset AS (
           SELECT DISTINCT unnest(list_transform(shs.shseq,
             s -> ('0x' || substr(md5(s), 1, 12))::BIGINT)) AS bsh
           FROM shs JOIN documents d ON shs.doc_id = d.doc_id
           WHERE d.source = 'src0'),
         dset AS (
           SELECT s3.doc_id, list_distinct(list_transform(shs.shseq,
             s -> ('0x' || substr(md5(s), 1, 12))::BIGINT)) AS sh
           FROM s3 JOIN shs ON s3.doc_id = shs.doc_id),
         hits AS (
           SELECT doc_id, COUNT(*) AS nh
           FROM (SELECT doc_id, unnest(sh) AS x FROM dset) e
           JOIN bset ON e.x = bset.bsh GROUP BY doc_id),
         surv AS (
           SELECT s3.doc_id, s3.lang
           FROM s3 JOIN dset USING (doc_id) LEFT JOIN hits USING (doc_id)
           WHERE CAST(COALESCE(hits.nh, 0) AS DOUBLE) / len(dset.sh) < 0.5),
         st AS (
           SELECT surv.doc_id, surv.lang, CAST(len(toks.tk) AS BIGINT) AS ntok
           FROM surv JOIN toks USING (doc_id)),
         cum AS (
           SELECT *, SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
           FROM st)
         SELECT lang,
           CAST(floor(CAST(c - ntok AS DOUBLE) / 1000) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens
         FROM cum GROUP BY lang, pack_id ORDER BY lang, pack_id""",

    "flagship_pipeline" ->
      """SELECT r_name, n_name, COUNT(*) AS new_customers
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c_custkey
                             AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                             AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",

    "pii_scrub" ->
      """WITH a AS (
           SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@mail.example.com ref ' || CAST(n_chars AS VARCHAR) AS text
           FROM documents),
         r AS (
           SELECT doc_id, text,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS de
           FROM a)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(de, '[0-9]+')) AS BIGINT) AS n_nums,
           CAST(length(regexp_replace(de, '[0-9]+', '<NUM>', 'g')) AS BIGINT) AS redacted_len,
           md5(regexp_replace(de, '[0-9]+', '<NUM>', 'g')) AS redacted_fp
         FROM r ORDER BY doc_id""",

    "chunk_dedup" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents),
         c AS (
           SELECT doc_id, unnest(list_transform(range(0, (len(tk) - 1) // 10 + 1),
             i -> array_to_string(list_slice(tk, i * 10 + 1, i * 10 + 10), ' '))) AS ch
           FROM t),
         f AS (SELECT doc_id, md5(ch) AS fp FROM c WHERE ch <> ''),
         n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM f GROUP BY doc_id),
         w AS (SELECT fp, MIN(doc_id) AS doc_id FROM f GROUP BY fp),
         o AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_owned FROM w GROUP BY doc_id)
         SELECT n.doc_id, n.n_chunks,
           CAST(COALESCE(o.n_owned, 0) AS BIGINT) AS n_owned
         FROM n LEFT JOIN o USING (doc_id) ORDER BY doc_id""",

    "source_overlap" ->
      """WITH hs AS (
           SELECT source, list_transform(
             range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(
               list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM documents),
         p AS (SELECT DISTINCT source AS g, unnest(sh) AS h FROM hs),
         sz AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY g),
         inter AS (
           SELECT a.g AS ga, b.g AS gb, CAST(COUNT(*) AS BIGINT) AS ni
           FROM p a JOIN p b ON a.h = b.h AND a.g < b.g
           GROUP BY a.g, b.g),
         m AS (
           SELECT x.g AS source_a, y.g AS source_b, x.n AS n_a, y.n AS n_b
           FROM sz x JOIN sz y ON x.g < y.g)
         SELECT m.source_a, m.source_b, m.n_a, m.n_b,
           CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_inter,
           CAST(COALESCE(i.ni, 0) AS DOUBLE)
             / (m.n_a + m.n_b - COALESCE(i.ni, 0)) AS jaccard
         FROM m LEFT JOIN inter i ON m.source_a = i.ga AND m.source_b = i.gb
         ORDER BY source_a, source_b""",

    "stratified_sample" ->
      """SELECT doc_id, source, lang FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100 <
           CASE source WHEN 'src1' THEN 80 WHEN 'src2' THEN 50
                       WHEN 'src3' THEN 20 WHEN 'src4' THEN 10 ELSE 0 END
         ORDER BY doc_id""",

    // same version CTE chain as scd2_history, then the point-in-time
    // interval join [valid_from, valid_to) with open-ended current rows
    "scd2_lookup" ->
      """WITH c AS (
           SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         ch AS (
           SELECT user_id, event_type, ts, event_id FROM c
           WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
         v AS (
           SELECT user_id AS d_user, event_type AS dim_type,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
           FROM ch)
         SELECT e.event_id, e.user_id, v.dim_type, v.version
         FROM events e LEFT JOIN v
           ON e.user_id = v.d_user AND e.ts >= v.valid_from
          AND (v.valid_to IS NULL OR e.ts < v.valid_to)
         ORDER BY e.event_id, v.version""",

    "scd2_history" ->
      """WITH c AS (
           SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         ch AS (
           SELECT user_id, event_type, ts, event_id FROM c
           WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
         v AS (
           SELECT user_id, event_type,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
             ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
           FROM ch)
         SELECT user_id, event_type, version,
           strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(date_trunc('second', next_ts), '%Y-%m-%d %H:%M:%S') AS valid_to,
           next_ts IS NULL AS is_current
         FROM v ORDER BY user_id, version""",

    "lm_score" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents),
         bg AS (
           SELECT doc_id, unnest(list_transform(
             range(1, greatest(len(tk) - 2, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(
               list_slice(tk, i, i + 1), ' ')), 1, 12))::BIGINT)) AS b
           FROM t),
         c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b),
         n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
         d AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(c.c) AS BIGINT) AS csum
           FROM bg JOIN c USING (b) GROUP BY doc_id)
         SELECT doc_id, n_bigrams,
           CAST(csum AS DOUBLE) / (n_bigrams * n.n) AS lm_score
         FROM d, n ORDER BY doc_id""",

    // lm_score CTE + per-language ntile + bucket mass rollup
    "perplexity_buckets" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents),
         bg AS (
           SELECT doc_id, unnest(list_transform(
             range(1, greatest(len(tk) - 2, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(
               list_slice(tk, i, i + 1), ' ')), 1, 12))::BIGINT)) AS b
           FROM t),
         c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b),
         n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
         d AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(c.c) AS BIGINT) AS csum
           FROM bg JOIN c USING (b) GROUP BY doc_id),
         scored AS (
           SELECT doc.doc_id, doc.lang, d.n_bigrams,
             CAST(csum AS DOUBLE) / (d.n_bigrams * n.n) AS lm_score
           FROM documents doc JOIN d ON doc.doc_id = d.doc_id, n),
         tiled AS (
           SELECT lang, n_bigrams,
             CAST(ntile(3) OVER (PARTITION BY lang
               ORDER BY lm_score DESC, doc_id ASC) AS BIGINT) AS bucket
           FROM scored)
         SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams
         FROM tiled GROUP BY lang, bucket ORDER BY lang, bucket""",

    "ivm_daily_counts" ->
      """SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY user_id, day
         ORDER BY user_id, day""",

    "profile_columns" ->
      """SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
         FROM orders
         UNION ALL
         SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
         FROM orders
         UNION ALL
         SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
         FROM orders
         ORDER BY col_name""",

    "sliding_distinct_users" ->
      """WITH w AS (
           SELECT date_trunc('day', ts) AS ws, user_id FROM events
           UNION ALL
           SELECT date_trunc('day', ts) - INTERVAL 1 DAY, user_id FROM events)
         SELECT strftime(ws, '%Y-%m-%d') AS win_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM w GROUP BY 1 ORDER BY win_start""",

    "merge_upsert" ->
      """WITH delta AS (
           SELECT o_custkey AS k,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
               AS DOUBLE) AS bal
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
           GROUP BY o_custkey),
         upd AS (
           SELECT k AS c_custkey, 'upd-' || k AS c_name,
             CAST(k % 25 AS INT) AS c_nationkey, bal AS c_acctbal,
             'UPDATED' AS c_mktsegment, (k % 17 = 0) AS del
           FROM delta),
         ins AS (
           SELECT k + 10000000 AS c_custkey, 'upd-' || (k + 10000000) AS c_name,
             CAST((k + 10000000) % 25 AS INT) AS c_nationkey, bal AS c_acctbal,
             'UPDATED' AS c_mktsegment, false AS del
           FROM delta WHERE k % 7 = 0),
         allupd AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
         SELECT c.c_custkey, c.c_name, CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
           c.c_acctbal, c.c_mktsegment
         FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM allupd u WHERE u.c_custkey = c.c_custkey)
         UNION ALL
         SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_acctbal, c_mktsegment
         FROM allupd WHERE NOT del
         ORDER BY c_custkey""",

    "skyline_orders" ->
      """WITH pts AS (
           SELECT DISTINCT o_totalprice AS x, o_orderdate AS y FROM orders),
         sky AS (
           SELECT x, y FROM pts a
           WHERE NOT EXISTS (
             SELECT 1 FROM pts b
             WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y)))
         SELECT o.o_orderkey, o.o_totalprice,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
         FROM orders o JOIN sky s ON o.o_totalprice = s.x AND o.o_orderdate = s.y
         ORDER BY o.o_orderkey""",

    "ivm_join_counts" ->
      """SELECT o_custkey,
           CAST(COUNT(*) FILTER (o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') AS BIGINT) AS cnt_old,
           CAST(COUNT(*) FILTER (o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             OR l_shipdate >= TIMESTAMP '1998-01-01 00:00:00') AS BIGINT) AS cnt_delta,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_custkey ORDER BY o_custkey""",

    "window_percentiles" ->
      """SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS pct_rank,
           cume_dist() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS cume
         FROM orders ORDER BY o_orderkey""",

    "simhash_pairs" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
           FROM documents),
         h AS (
           SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok),
         bits AS (
           SELECT doc_id, r.b,
             SUM(CASE WHEN ((h >> r.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
           FROM h CROSS JOIN range(0, 48) r(b)
           GROUP BY doc_id, r.b),
         sk AS (
           SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS s
           FROM bits GROUP BY doc_id),
         banded AS (
           SELECT doc_id, s, r.b AS band, (s >> (r.b * 12)) & 4095 AS bv
           FROM sk CROSS JOIN range(0, 4) r(b)),
         ok AS (
           SELECT band, bv FROM banded GROUP BY band, bv
           HAVING COUNT(*) BETWEEN 2 AND 100),
         capped AS (SELECT banded.* FROM banded JOIN ok USING (band, bv)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             CAST(bit_count(xor(a.s, c.s)) AS BIGINT) AS hamming
           FROM capped a JOIN capped c
             ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id)
         SELECT id_a, id_b, hamming FROM cand
         WHERE hamming <= 3 ORDER BY id_a, id_b""",

    "simhash_dropped_buckets" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
           FROM documents),
         h AS (
           SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok),
         bits AS (
           SELECT doc_id, r.b,
             SUM(CASE WHEN ((h >> r.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
           FROM h CROSS JOIN range(0, 48) r(b)
           GROUP BY doc_id, r.b),
         sk AS (
           SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS s
           FROM bits GROUP BY doc_id),
         banded AS (
           SELECT doc_id, r.b AS band, (s >> (r.b * 12)) & 4095 AS bv
           FROM sk CROSS JOIN range(0, 4) r(b)),
         dropped AS (
           SELECT band, bv, COUNT(*) AS n FROM banded GROUP BY band, bv
           HAVING COUNT(*) > 100)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped_buckets,
           CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_dropped_docs
         FROM dropped""",

    "vocab_coverage" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
           FROM documents),
         th AS (
           SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h
           FROM tok WHERE t <> ''),
         vocab AS (
           SELECT h FROM (
             SELECT h, COUNT(*) AS c FROM th GROUP BY h
             ORDER BY c DESC, h LIMIT 1000)),
         n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM th GROUP BY doc_id),
         iv AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_in_vocab
           FROM th JOIN vocab USING (h) GROUP BY doc_id)
         SELECT n.doc_id, n.n_tokens,
           CAST(COALESCE(iv.n_in_vocab, 0) AS BIGINT) AS n_in_vocab,
           CAST(COALESCE(iv.n_in_vocab, 0) AS DOUBLE) / n.n_tokens AS coverage
         FROM n LEFT JOIN iv USING (doc_id) ORDER BY n.doc_id""",

    "ngram_dup_rate" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT)) AS sh
           FROM t),
         e AS (SELECT doc_id, unnest(sh) AS h FROM s),
         d AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS df FROM e)
         SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate
         FROM d GROUP BY doc_id ORDER BY doc_id""",

    "dup_span_stats" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM t),
         e AS (
           SELECT doc_id, unnest(range(len(sh))) AS pos, unnest(sh) AS h
           FROM s),
         d AS (
           SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS cnt FROM e),
         f AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM d WHERE cnt >= 2),
         r AS (SELECT doc_id, grp, COUNT(*) AS runlen FROM f GROUP BY doc_id, grp),
         a AS (
           SELECT doc_id, CAST(SUM(runlen) AS BIGINT) AS n_dup_shingles,
             CAST(MAX(runlen) AS BIGINT) AS longest_dup_run
           FROM r GROUP BY doc_id)
         SELECT doc.doc_id,
           COALESCE(a.n_dup_shingles, 0) AS n_dup_shingles,
           COALESCE(a.longest_dup_run, 0) AS longest_dup_run
         FROM documents doc LEFT JOIN a USING (doc_id) ORDER BY doc.doc_id""",

    "filter_funnel" ->
      """WITH t AS (
           SELECT source, text, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT source,
             length(text) AS len,
             CAST(len(regexp_extract_all(text, '[a-z]')) AS DOUBLE) / length(text) AS alpha,
             list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
               i -> md5(array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
           FROM t),
         f AS (
           SELECT source,
             len >= 150 AS len_ok,
             len >= 150 AND
               1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) <= 0.01 AS rep_ok,
             len >= 150 AND
               1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) <= 0.01 AND
               alpha >= 0.82 AS pass_ok
           FROM s)
         SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
           CAST(SUM(CASE WHEN rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_ok,
           CAST(SUM(CASE WHEN pass_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         FROM f GROUP BY source ORDER BY source""",

    "mixture_plan" ->
      """WITH t AS (
           SELECT source,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
           FROM documents),
         b AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS n_tokens
           FROM t GROUP BY source),
         g AS (SELECT MIN(n_tokens) AS mn, SUM(n_tokens) AS tot FROM b)
         SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / tot AS share,
           CAST(mn AS DOUBLE) / n_tokens AS sample_rate
         FROM b, g ORDER BY source""",

    "event_funnel" ->
      """WITH f1 AS (
           SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         f2 AS (
           SELECT f1.user_id, f1.t1,
             MIN(CASE WHEN e.ts > f1.t1 THEN e.ts END) AS t2
           FROM f1 LEFT JOIN events e
             ON e.user_id = f1.user_id AND e.event_type = 'click'
           GROUP BY f1.user_id, f1.t1),
         f3 AS (
           SELECT f2.user_id, f2.t1, f2.t2,
             MIN(CASE WHEN e.ts > f2.t2 THEN e.ts END) AS t3
           FROM f2 LEFT JOIN events e
             ON e.user_id = f2.user_id AND e.event_type = 'purchase'
           GROUP BY f2.user_id, f2.t1, f2.t2)
         SELECT user_id,
           CAST(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage_reached,
           strftime(date_trunc('second', t1), '%Y-%m-%d %H:%M:%S') AS t1,
           strftime(date_trunc('second', t2), '%Y-%m-%d %H:%M:%S') AS t2,
           strftime(date_trunc('second', t3), '%Y-%m-%d %H:%M:%S') AS t3
         FROM f3 ORDER BY user_id""",

    "retention_cohorts" ->
      """WITH a AS (
           SELECT DISTINCT user_id,
             CAST(floor(CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) / 7) AS BIGINT) AS week
           FROM events),
         c AS (
           SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS cohort_week
           FROM a)
         SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM c GROUP BY cohort_week, week - cohort_week
         ORDER BY cohort_week, week_offset""",

    "zorder_layout" ->
      """WITH e AS (
           SELECT user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
           FROM events),
         m AS (
           SELECT MIN(user_id) AS amin, MAX(user_id) AS amax,
                  MIN(day) AS bmin, MAX(day) AS bmax FROM e),
         q AS (
           SELECT
             CAST(floor(CAST(user_id - amin AS DOUBLE) * 256 / (amax - amin + 1)) AS BIGINT) AS aq,
             CAST(floor(CAST(day - bmin AS DOUBLE) * 256 / (bmax - bmin + 1)) AS BIGINT) AS bq
           FROM e, m),
         z AS (
           SELECT aq, bq,
             (list_reduce(list_transform(range(0, 8), i ->
               (((aq >> i) & 1) << (2 * i)) | (((bq >> i) & 1) << (2 * i + 1))),
               (x, y) -> x | y) >> 10) AS zbucket
           FROM q)
         SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(aq) AS aq_min, MAX(aq) AS aq_max,
           MIN(bq) AS bq_min, MAX(bq) AS bq_max
         FROM z GROUP BY zbucket ORDER BY zbucket""",

    "fertility_by_lang" ->
      """WITH t AS (
           SELECT lang,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe
           FROM documents)
         SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility
         FROM t GROUP BY lang ORDER BY lang""",

    "mixture_plan_temp" ->
      """WITH t AS (
           SELECT source,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
           FROM documents),
         b AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS n_tokens
           FROM t GROUP BY source),
         g AS (SELECT MIN(n_tokens) AS mn FROM b)
         SELECT source, n_docs, n_tokens,
           sqrt(CAST(mn AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS sample_rate,
           sqrt(CAST(mn AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * CAST(n_tokens AS DOUBLE) AS sampled_tokens
         FROM b, g ORDER BY source""",

    "token_len_histogram" ->
      """WITH t AS (
           SELECT lang,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
           FROM documents)
         SELECT lang,
           CASE WHEN n < 16 THEN '0000-0015' WHEN n < 32 THEN '0016-0031'
                WHEN n < 64 THEN '0032-0063' WHEN n < 128 THEN '0064-0127'
                WHEN n < 256 THEN '0128-0255' ELSE '0256+' END AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM t GROUP BY 1, 2 ORDER BY lang, len_bucket""",

    "rolling_user_counts" ->
      """SELECT event_id, user_id,
           CAST(COUNT(*) OVER (PARTITION BY user_id
             ORDER BY (epoch_ns(ts) // 1000000000)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_cnt
         FROM events ORDER BY event_id""",

    "per_group_sample" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT, doc_id) AS rn
           FROM documents) t
         WHERE rn <= 5 ORDER BY doc_id""",

    "embedding_quantize" ->
      """WITH e AS (
           SELECT vec_id, unnest(embedding) AS v,
             unnest(range(len(embedding))) AS pos
           FROM embeddings),
         d AS (
           SELECT pos, MIN(CAST(v AS DOUBLE)) AS dmin, MAX(CAST(v AS DOUBLE)) AS dmax
           FROM e GROUP BY pos),
         q AS (SELECT pos, CAST(v AS DOUBLE) AS pv FROM e WHERE vec_id = 0)
         SELECT CAST(d.pos AS BIGINT) AS pos, d.dmin, d.dmax,
           CAST(CASE WHEN d.dmax = d.dmin THEN 0
                ELSE least(255, greatest(0,
                  CAST(floor((q.pv - d.dmin) / (d.dmax - d.dmin) * 255) AS BIGINT)))
           END AS BIGINT) AS code
         FROM d JOIN q USING (pos) ORDER BY pos""",

    // full integer replay of the quantized-centroid outlier score
    "kmeans_assign" ->
      """WITH q AS (
           SELECT vec_id, list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
           FROM embeddings),
         dims AS (
           SELECT vec_id, r.i AS d, qv[r.i] AS v
           FROM q CROSS JOIN range(1, 65) r(i)),
         c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS c, qv
           FROM q ORDER BY vec_id LIMIT 4),
         cd0 AS (SELECT c, r.i AS d, qv[r.i] AS v
                 FROM c0 CROSS JOIN range(1, 65) r(i)),
         a0 AS (
           SELECT t.vec_id, g.c, SUM((t.v - g.v) * (t.v - g.v)) AS dist2
           FROM dims t JOIN cd0 g USING (d) GROUP BY t.vec_id, g.c),
         b0 AS (
           SELECT vec_id, c FROM (
             SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c) AS rn
             FROM a0) WHERE rn = 1),
         cd1 AS (
           SELECT g.c, g.d, COALESCE(u.m, g.v) AS v
           FROM cd0 g LEFT JOIN (
             SELECT b0.c, t.d,
               CAST(floor(CAST(SUM(t.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
             FROM dims t JOIN b0 USING (vec_id) GROUP BY b0.c, t.d) u
           ON g.c = u.c AND g.d = u.d),
         a1 AS (
           SELECT t.vec_id, g.c, SUM((t.v - g.v) * (t.v - g.v)) AS dist2
           FROM dims t JOIN cd1 g USING (d) GROUP BY t.vec_id, g.c),
         b1 AS (
           SELECT vec_id, c FROM (
             SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c) AS rn
             FROM a1) WHERE rn = 1),
         cd2 AS (
           SELECT g.c, g.d, COALESCE(u.m, g.v) AS v
           FROM cd1 g LEFT JOIN (
             SELECT b1.c, t.d,
               CAST(floor(CAST(SUM(t.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
             FROM dims t JOIN b1 USING (vec_id) GROUP BY b1.c, t.d) u
           ON g.c = u.c AND g.d = u.d),
         a2 AS (
           SELECT t.vec_id, g.c, SUM((t.v - g.v) * (t.v - g.v)) AS dist2
           FROM dims t JOIN cd2 g USING (d) GROUP BY t.vec_id, g.c)
         SELECT vec_id, CAST(c AS BIGINT) AS cluster, CAST(dist2 AS BIGINT) AS dist2
         FROM (
           SELECT vec_id, c, dist2,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c) AS rn
           FROM a2) WHERE rn = 1
         ORDER BY vec_id""",

    "embedding_outliers" ->
      """WITH e AS (
           SELECT vec_id, label, unnest(embedding) AS v,
             unnest(range(len(embedding))) AS pos
           FROM embeddings),
         d AS (
           SELECT pos, MIN(CAST(v AS DOUBLE)) AS dmin, MAX(CAST(v AS DOUBLE)) AS dmax
           FROM e GROUP BY pos),
         c AS (
           SELECT vec_id, label, e.pos,
             CASE WHEN d.dmax = d.dmin THEN 0
                  ELSE least(255, greatest(0,
                    CAST(floor((CAST(v AS DOUBLE) - d.dmin) / (d.dmax - d.dmin) * 255) AS BIGINT)))
             END AS q
           FROM e JOIN d USING (pos)),
         g AS (
           SELECT label, pos, CAST(SUM(q) AS BIGINT) AS s, COUNT(*) AS n
           FROM c GROUP BY 1, 2),
         sc AS (
           SELECT c.vec_id, c.label, g.n,
             CAST(SUM((g.n * c.q - g.s) * (g.n * c.q - g.s)) AS BIGINT) AS score_num
           FROM c JOIN g ON c.label = g.label AND c.pos = g.pos
           GROUP BY 1, 2, 3)
         SELECT vec_id, CAST(label AS BIGINT) AS label, score_num,
           CAST(n AS BIGINT) AS n_group,
           CAST(score_num AS DOUBLE) / CAST(n * n AS DOUBLE) AS outlier_score
         FROM sc ORDER BY outlier_score DESC, vec_id LIMIT 20"""
  )
}
