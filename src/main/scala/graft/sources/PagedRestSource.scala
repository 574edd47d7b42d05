package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.PagedApi.{ApiPage, PagedApiClient}

/** DataSource V2 table over a paged REST API (SURVEY.md §7.4 optional
  * source; §2.1 S1/S2): pagination happens at PLAN time on the driver (the
  * token chain is inherently sequential, /root/reference/main.py:103-118),
  * then each page becomes one InputPartition so parsing and all downstream
  * work fan out across executors.
  *
  * Row shape is `(page INT, record STRING)` — raw payload plus provenance;
  * typed projection is downstream `from_json`, where Catalyst prunes and
  * codegens it. Limit pushdown (`SupportsPushDownLimit`) stops the page
  * walk early — the analog of the reference never fetching past what it
  * needs. With options `from`/`to` the table becomes day-windowed
  * (`(page, day, record)` rows) and `day` predicates push down
  * (`SupportsPushDownFilters`) to narrow the server-side fetch window —
  * the reference's `from`/`to` request params
  * (/root/reference/main.py:219-224) as a first-class DSv2 pushdown.
  *
  * Usage:
  * {{{
  *   PagedRestSource.register("myapi", client)
  *   spark.read.format("graft.sources.PagedRestTableProvider")
  *     .option("client", "myapi").option("entity", "users").load()
  * }}}
  */
object PagedRestSource {
  /** Driver-side client registry (clients hold connections; only the
    * fetched page payloads cross to executors).
    */
  private val registry = TrieMap.empty[String, PagedApiClient]

  def register(name: String, client: PagedApiClient): Unit = registry(name) = client
  def client(name: String): PagedApiClient = registry(name)

  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("record", StringType, nullable = false)))

  /** Day-windowed variant (options `from`/`to` present): each row carries
    * the ISO day its page was requested for — the column date predicates
    * push down onto — plus `ts`, the record-level ISO-8601 timestamp
    * extracted from the payload's `tsField` JSON field (null when absent).
    * `ts` predicates push down INEXACTLY: they narrow the fetch window to
    * the enclosing days but stay residual for Spark to re-evaluate. */
  val daySchema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("day", StringType, nullable = false),
    StructField("ts", StringType, nullable = true),
    StructField("record", StringType, nullable = false)))
}

class PagedRestTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.containsKey("from") && options.containsKey("to"))
      PagedRestSource.daySchema
    else PagedRestSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val window = (Option(properties.get("from")), Option(properties.get("to"))) match {
      case (Some(f), Some(t)) => Some((f, t))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "paged_rest: options `from` and `to` must be given together")
    }
    new PagedRestTable(
      properties.get("client"),
      properties.get("entity"),
      Option(properties.get("key")),
      Option(properties.get("maxPagesPerBatch")).map(_.toInt).getOrElse(Int.MaxValue),
      window,
      Option(properties.get("tsField")).getOrElse("ts"),
      Option(properties.get("tsNarrowing")).forall(_.toBoolean))
  }
}

private[sources] class PagedRestTable(clientName: String, entity: String,
                                      key: Option[String], maxPagesPerBatch: Int,
                                      window: Option[(String, String)] = None,
                                      tsField: String = "ts",
                                      tsNarrowing: Boolean = true)
    extends Table with SupportsRead {
  override def name(): String = s"paged_rest($entity)"
  override def schema(): StructType =
    if (window.isDefined) PagedRestSource.daySchema else PagedRestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    window match {
      case Some((f, t)) =>
        new DayRangedRestScanBuilder(clientName, entity, key, f, t, tsField,
          tsNarrowing)
      case None => new PagedRestScanBuilder(clientName, entity, key, maxPagesPerBatch)
    }
}

/** Batch scan over a day-windowed API ([[PagedApi.DayRangedApiClient]]):
  * one token chain per ISO day in `[from, to]`. Implements
  * `SupportsPushDownFilters` — `day` predicates (=, <, <=, >, >=, and the
  * BETWEEN pair Catalyst splits into >= + <=) NARROW the fetch window
  * before any request is issued, the DSv2 form of the reference passing
  * `from`/`to` query params to the server
  * (/root/reference/main.py:219-224; SURVEY.md §4's one previously
  * unbuilt mapping). Days a predicate excludes are never fetched; a
  * contradictory window (from > to) fetches nothing.
  *
  * Accepted day filters are consumed EXACTLY (per-day fetch makes them
  * precise), so they are reported in `pushedFilters` and removed from the
  * residual Spark re-evaluates; every other predicate stays residual.
  * Guards: a `day` literal that does not parse as an ISO date is left as a
  * residual filter instead of failing query planning. Record-timestamp
  * (`ts`) predicates push down INEXACTLY — an ISO-8601 prefix narrows the
  * window to the enclosing days (the reference's `from`/`to` params at
  * record-ts grain), but the filter itself stays residual because the
  * per-day fetch is coarser than a timestamp. Limit pushdown composes: the
  * day-by-day page walk stops as soon as the pushed limit is covered.
  *
  * DAY-ALIGNMENT CONTRACT for ts-window narrowing (ADVICE r10): the
  * `tsField` option (default `ts`) MUST name the timestamp the SERVER
  * partitions its per-day pages by — i.e. a record fetched under day D
  * must satisfy `date(tsField) == D`. That holds for the reference API
  * (pages are keyed by the record's own `ts`). If a deployment points
  * `tsField` at a timestamp the server does NOT page by (e.g.
  * `tsField=updated_at` while pages key on `created_at`), ts-predicate
  * narrowing could silently prune records living under a neighboring
  * fetch day — configure `tsNarrowing=false` in that case, which keeps
  * ts predicates fully residual and the window at `[from, to]`.
  */
private[sources] class DayRangedRestScanBuilder(clientName: String, entity: String,
                                                key: Option[String],
                                                from0: String, to0: String,
                                                tsField: String = "ts",
                                                tsNarrowing: Boolean = true)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit {
  import org.apache.spark.sql.sources._

  private var from = from0
  private var to = to0
  private var accepted: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  private def maxDay(a: String, b: String) = if (a >= b) a else b
  private def minDay(a: String, b: String) = if (a <= b) a else b
  private def parseDay(v: String): Option[java.time.LocalDate] =
    try Some(java.time.LocalDate.parse(v)) catch {
      case _: java.time.format.DateTimeParseException => None
    }
  /** Enclosing ISO day of an ISO-8601 timestamp literal (date prefix),
    * None when the literal is not ISO-shaped. */
  private def tsDay(v: String): Option[String] =
    if (v.length >= 10) parseDay(v.substring(0, 10)).map(_.toString) else None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Exactly-consumable day predicates: only those whose literal parses
    // as an ISO date (a malformed literal must stay residual, not throw
    // DateTimeParseException at planning time and not mis-narrow the
    // window via raw string comparison).
    val (ours, residual) = filters.partition {
      case EqualTo("day", v: String) => parseDay(v).isDefined
      case GreaterThanOrEqual("day", v: String) => parseDay(v).isDefined
      case GreaterThan("day", v: String) => parseDay(v).isDefined
      case LessThanOrEqual("day", v: String) => parseDay(v).isDefined
      case LessThan("day", v: String) => parseDay(v).isDefined
      case _ => false
    }
    ours.foreach {
      case EqualTo(_, v: String) =>
        from = maxDay(from, v); to = minDay(to, v)
      case GreaterThanOrEqual(_, v: String) => from = maxDay(from, v)
      case GreaterThan(_, v: String) =>
        from = maxDay(from, parseDay(v).get.plusDays(1L).toString)
      case LessThanOrEqual(_, v: String) => to = minDay(to, v)
      case LessThan(_, v: String) =>
        to = minDay(to, parseDay(v).get.plusDays(-1L).toString)
      case _ => ()
    }
    // Record-ts predicates narrow the fetch window to the enclosing days
    // but are NOT accepted — Spark re-evaluates them on the ts column.
    // ts > v and ts >= v both admit records later the same day; ts < v and
    // ts <= v both admit records earlier the same day — so every bound
    // keeps the literal's own day.
    if (tsNarrowing) residual.foreach {
      case EqualTo("ts", v: String) =>
        tsDay(v).foreach { d => from = maxDay(from, d); to = minDay(to, d) }
      case GreaterThanOrEqual("ts", v: String) =>
        tsDay(v).foreach(d => from = maxDay(from, d))
      case GreaterThan("ts", v: String) =>
        tsDay(v).foreach(d => from = maxDay(from, d))
      case LessThanOrEqual("ts", v: String) =>
        tsDay(v).foreach(d => to = minDay(to, d))
      case LessThan("ts", v: String) =>
        tsDay(v).foreach(d => to = minDay(to, d))
      case _ => ()
    }
    accepted = ours
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = PagedRestSource.daySchema
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val client = PagedRestSource.client(clientName) match {
        case c: PagedApi.DayRangedApiClient => c
        case other => throw new IllegalArgumentException(
          s"paged_rest: client $clientName (${other.getClass.getSimpleName}) " +
            "does not support day-ranged fetches; drop from/to or register a " +
            "DayRangedApiClient")
      }
      val parts = Array.newBuilder[InputPartition]
      var pageNo = 0
      var fetched = 0
      var stop = false
      var day = java.time.LocalDate.parse(from)
      val end = java.time.LocalDate.parse(to)
      while (!stop && !day.isAfter(end)) {
        var token: Option[String] = None
        var dayDone = false
        while (!stop && !dayDone) {
          val page = PagedApi.fetchWithRetry(
            new PagedApi.PagedApiClient {
              def fetchPage(e: String, k: Option[String], t: Option[String]): PagedApi.ApiPage =
                client.fetchDayPage(e, k, day.toString, t)
            }, entity, key, token)
          parts += PagedRestDayPartition(pageNo, day.toString, page.records.toArray,
            tsField)
          fetched += page.records.size
          token = page.nextToken
          pageNo += 1
          dayDone = token.isEmpty
          stop = limit.exists(fetched >= _)
        }
        day = day.plusDays(1)
      }
      parts.result()
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new PagedRestDayReaderFactory
  }
}

/** Streaming offset = number of pages fully consumed. The reference tracks
  * its incremental position with a DB watermark query
  * (/root/reference/main.py:251-267); here the position is a first-class
  * Structured Streaming offset, checkpointed and replayed by the engine —
  * restart-safe without any hand-rolled bookkeeping.
  */
private[sources] case class PageOffset(page: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = page.toString
}

private[sources] class PagedRestScanBuilder(clientName: String, entity: String,
                                            key: Option[String],
                                            maxPagesPerBatch: Int = Int.MaxValue)
    extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Option[Int] = None

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = PagedRestSource.schema
    override def toBatch: Batch = this

    override def toMicroBatchStream(checkpointLocation: String):
        org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new PagedRestMicroBatchStream(clientName, entity, key, maxPagesPerBatch)

    override def planInputPartitions(): Array[InputPartition] = {
      // Sequential token walk on the driver; stops as soon as the pushed
      // limit is covered. Payloads ship inside the partitions.
      val client = PagedRestSource.client(clientName)
      val parts = Array.newBuilder[InputPartition]
      var token: Option[String] = None
      var pageNo = 0
      var fetched = 0
      var done = false
      while (!done) {
        val page: ApiPage = PagedApi.fetchWithRetry(client, entity, key, token)
        parts += PagedRestPartition(pageNo, page.records.toArray)
        fetched += page.records.size
        token = page.nextToken
        pageNo += 1
        done = token.isEmpty || limit.exists(fetched >= _)
      }
      parts.result()
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new PagedRestReaderFactory
  }
}

/** Micro-batch stream over the page chain: `latestOffset` advances the
  * driver-side page walk (buffering fetched pages), `planInputPartitions`
  * serves the buffered `[start, end)` page range — one InputPartition per
  * page, exactly like the batch path.
  *
  * `maxPagesPerBatch` bounds how many NEW pages one trigger may fetch and
  * buffer: an unbounded API (or a large backfill) drains over several
  * micro-batches with driver memory bounded by one batch's pages plus any
  * not-yet-planned tail, instead of `latestOffset` eagerly pulling the
  * whole chain into the driver before the first batch runs.
  *
  * STATIC-SOURCE ASSUMPTION: page numbering must be stable for the life of
  * one query run, including a checkpoint restart — after a restart the
  * token chain is re-walked from page 0 and committed offsets are mapped
  * onto the re-fetched numbering (same guarantee the reference's
  * page-counter loop relies on, /root/reference/main.py:149-167). A source
  * whose pagination shifts between runs needs a content-keyed offset
  * (e.g. cursor persisted per page) instead; re-walking also means a
  * restart re-READS earlier pages (it does not re-EMIT them — offsets
  * below the committed point are never re-planned).
  */
private[sources] class PagedRestMicroBatchStream(clientName: String, entity: String,
                                                 key: Option[String],
                                                 maxPagesPerBatch: Int = Int.MaxValue)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  require(maxPagesPerBatch > 0, "maxPagesPerBatch must be positive")

  private val buffered = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
  private var exhausted = false
  private var nextToken: Option[String] = None

  /** Fetch until `target` pages are buffered (or the chain ends). */
  private def fetchTo(target: Long): Unit = {
    val client = PagedRestSource.client(clientName)
    while (!exhausted && buffered.size < target) {
      val page = PagedApi.fetchWithRetry(client, entity, key, nextToken)
      buffered += page.records.toArray
      nextToken = page.nextToken
      exhausted = nextToken.isEmpty
    }
  }

  override def initialOffset(): Offset = PageOffset(0)

  override def latestOffset(): Offset = {
    // advance by at most maxPagesPerBatch new pages per trigger
    fetchTo(buffered.size.toLong + maxPagesPerBatch)
    PageOffset(buffered.size)
  }

  override def deserializeOffset(json: String): Offset = PageOffset(json.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    fetchTo(e) // checkpoint replay: re-walk up to the replayed end offset
    (s until e).map(p => PagedRestPartition(p, buffered(p)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PagedRestReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class PagedRestPartition(pageNo: Int, records: Array[String])
    extends InputPartition

private[sources] case class PagedRestDayPartition(pageNo: Int, day: String,
                                                  records: Array[String],
                                                  tsField: String = "ts")
    extends InputPartition

private[sources] class PagedRestDayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedRestDayPartition]
    new PartitionReader[InternalRow] {
      // Cheap executor-side surface of the record timestamp so ts
      // predicates have a typed column to land on; full typed projection
      // stays downstream from_json where Catalyst prunes it.
      private val tsPat = java.util.regex.Pattern.compile(
        "\"" + java.util.regex.Pattern.quote(p.tsField) + "\"\\s*:\\s*\"([^\"]*)\"")
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.records.length }
      override def get(): InternalRow = {
        val rec = p.records(i)
        val m = tsPat.matcher(rec)
        val ts = if (m.find()) UTF8String.fromString(m.group(1)) else null
        InternalRow(p.pageNo, UTF8String.fromString(p.day), ts,
          UTF8String.fromString(rec))
      }
      override def close(): Unit = ()
    }
  }
}

private[sources] class PagedRestReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedRestPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.records.length }
      override def get(): InternalRow =
        InternalRow(p.pageNo, UTF8String.fromString(p.records(i)))
      override def close(): Unit = ()
    }
  }
}
