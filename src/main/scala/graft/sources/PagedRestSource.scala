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
  * needs.
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
}

class PagedRestTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedRestSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedRestTable(
      properties.get("client"),
      properties.get("entity"),
      Option(properties.get("key")),
      Option(properties.get("maxPagesPerBatch")).map(_.toInt).getOrElse(Int.MaxValue))
}

private[sources] class PagedRestTable(clientName: String, entity: String,
                                      key: Option[String], maxPagesPerBatch: Int)
    extends Table with SupportsRead {
  override def name(): String = s"paged_rest($entity)"
  override def schema(): StructType = PagedRestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedRestScanBuilder(clientName, entity, key, maxPagesPerBatch)
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
