package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull, Not}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector shell (SURVEY §7.2 M6): the reference's
  * Gmail→BigQuery transport re-expressed as a Spark source/sink pair,
  * backed by a deterministic fake transport so behavior is fixture-
  * testable and oracle-checkable.
  *
  * Read path — mirrors the paginated Gmail scan (reference:
  * etl_service/main.py:163-210):
  *  - one `InputPartition` per page of `pageSize` (default 500, the
  *    reference's maxResults at main.py:168) — pages are independent,
  *    so a 1000-executor cluster reads them all concurrently instead
  *    of the reference's sequential cursor loop;
  *  - `SupportsPushDownFilters`: folder predicates are accepted,
  *    translated to Gmail `q` syntax ("in:inbox -in:spam", the
  *    main.py:160 algebra) — visible in `.explain` as PushedFilters
  *    and in the scan description — and evaluated at the source, so
  *    excluded messages are never materialized;
  *  - `SupportsPushDownRequiredColumns`: mirrors the
  *    format="metadata" + metadataHeaders projection (main.py:181-186)
  *    — unrequested columns are never generated.
  *
  * Write path — mirrors the batched BigQuery sink (main.py:231-254):
  *  - rows buffered and flushed in `batchSize` chunks (default 1000,
  *    main.py:49/:240);
  *  - per-batch error isolation: a failing batch is dropped and
  *    counted, later batches still land (main.py:244-250) — surfaced
  *    in the commit messages as (inserted, failedBatches);
  *  - the in-memory sink is a JVM-global map (fine under local[*];
  *    a cluster deployment swaps [[MailSink]] for a remote client
  *    initialized per `DataWriter`, the standard connector pattern).
  *
  * The fake transport generates message doc_id ∈ [0, nmsgs) with
  * folder/subject/sender derived by modular arithmetic, so a DuckDB
  * `range()` CTE replays the exact dataset for the correctness gate.
  */
object MailTransport {
  val Folders: Array[String] = Array("INBOX", "SENT", "TRASH", "SPAM", "ARCHIVE")

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("thread_id", StringType, nullable = true),
    StructField("folder", StringType, nullable = false),
    StructField("subject", StringType, nullable = true),
    StructField("sender", StringType, nullable = true),
    StructField("recipient", StringType, nullable = true),
    StructField("ts_raw", StringType, nullable = true)))

  def folderOf(docId: Long): String = Folders((docId % 5).toInt)

  /** Field value for one message — the fake Gmail server. */
  def fieldOf(name: String, docId: Long): Any = name match {
    case "doc_id"    => docId
    case "id"        => UTF8String.fromString(s"msg$docId")
    case "thread_id" => UTF8String.fromString(s"t${docId % 50}")
    case "folder"    => UTF8String.fromString(folderOf(docId))
    case "subject"   => UTF8String.fromString(s"subject ${docId % 997}")
    case "sender"    => UTF8String.fromString(s"user${docId % 20}@example.com")
    case "recipient" => UTF8String.fromString(s"dest${docId % 9}@example.org")
    case "ts_raw"    => UTF8String.fromString(
      s"Mon, ${docId % 28 + 1} Jan 2024 0${docId % 10}:00:00 +0000")
  }

  /** Folder-predicate subset of the pushed filters, compiled to a
    * source-side row test. Only filters this returns Some for are
    * accepted by pushFilters.
    */
  def compile(f: Filter): Option[Long => Boolean] = f match {
    case EqualTo("folder", v: String)      => Some(id => folderOf(id) == v)
    case In("folder", vs)                  =>
      val set = vs.map(String.valueOf).toSet; Some(id => set.contains(folderOf(id)))
    case Not(EqualTo("folder", v: String)) => Some(id => folderOf(id) != v)
    case IsNotNull("folder" | "id" | "doc_id") => Some(_ => true)
    case _                                 => None
  }

  /** The accepted filters rendered in Gmail `q` syntax (main.py:160). */
  def gmailQ(fs: Seq[Filter]): String = fs.flatMap {
    case EqualTo("folder", v: String)      => Some(s"in:${v.toLowerCase}")
    case In("folder", vs)                  =>
      Some(vs.map(v => s"in:${String.valueOf(v).toLowerCase}").mkString("(", " OR ", ")"))
    case Not(EqualTo("folder", v: String)) => Some(s"-in:${v.toLowerCase}")
    case _                                 => None
  }.mkString(" ")
}

/** In-memory sink store, keyed by the `sink` option. JVM-global so
  * local[*] tasks and the driver observe the same state.
  */
object MailSink {
  val stores = new ConcurrentHashMap[String, java.util.Queue[Seq[String]]]()
  def store(name: String): java.util.Queue[Seq[String]] =
    stores.computeIfAbsent(name, _ => new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]())
  def inserted(name: String): Seq[Seq[String]] = store(name).asScala.toSeq
  def clear(name: String): Unit = stores.remove(name)
}

class MailSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MailTransport.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MailTable(properties.asScala.toMap)
}

class MailTable(props: Map[String, String]) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft_mail"
  override def schema(): StructType = MailTransport.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MailScanBuilder(
      options.getLong("nmsgs", 1000L),
      options.getInt("pageSize", 500),
      options.getInt("maxPagesPerTrigger", Int.MaxValue))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val sink = info.options.getOrDefault("sink", "default")
    val batchSize = info.options.getInt("batchSize", 1000)
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new MailBatchWrite(sink, batchSize, schema)
      }
    }
  }
}

class MailScanBuilder(nmsgs: Long, pageSize: Int, maxPagesPerTrigger: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = MailTransport.schema

  /** Accept what the transport can evaluate; everything else stays a
    * residual Spark-side Filter (the connector never "loses" a
    * predicate it can't honor).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(MailTransport.compile(_).isDefined)
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    new MailScan(nmsgs, pageSize, maxPagesPerTrigger, accepted, required)
}

/** One page of the paginated scan: [start, end) of the id space. */
case class MailPage(start: Long, end: Long) extends InputPartition

/** Streaming offset = number of pages fully consumed — exactly the
  * reference's `nextPageToken` cursor (main.py:208-210) made explicit.
  */
case class MailOffset(page: Long) extends Offset {
  override def json(): String = page.toString
}

class MailScan(nmsgs: Long, pageSize: Int, maxPagesPerTrigger: Int,
               filters: Array[Filter], required: StructType)
    extends Scan with Batch {
  private val totalPages = (nmsgs + pageSize - 1) / pageSize

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-mail nmsgs=$nmsgs pageSize=$pageSize q='${MailTransport.gmailQ(filters.toSeq)}' " +
      s"fields=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (0L until nmsgs by pageSize.toLong)
      .map(s => MailPage(s, math.min(s + pageSize, nmsgs))).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new MailReaderFactory(required.fieldNames, filters)

  /** The reference's page loop as a Structured Streaming micro-batch
    * protocol (main.py:163-210): offset = page cursor;
    * `maxPagesPerTrigger` is the declarative form of its fixed 0.5 s
    * inter-page throttle (rate limiting by admission control instead
    * of sleeps). Within a trigger, that batch's pages still read
    * concurrently — one InputPartition per page.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MailMicroBatchStream(this)

  private[sources] def pagesBetween(fromPage: Long, toPage: Long): Array[InputPartition] =
    (fromPage until toPage).map { p =>
      val s = p * pageSize
      MailPage(s, math.min(s + pageSize, nmsgs)): InputPartition
    }.toArray

  private[sources] def cappedEnd(fromPage: Long): Long =
    math.min(fromPage + maxPagesPerTrigger, totalPages)

  private[sources] def lastPage: Long = totalPages
  private[sources] def readerFactory: PartitionReaderFactory =
    new MailReaderFactory(required.fieldNames, filters)
}

class MailMicroBatchStream(scan: MailScan)
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = MailOffset(0L)
  override def deserializeOffset(json: String): Offset = MailOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  // Admission control here is page-based (maxPagesPerTrigger); the
  // ReadLimit hint is not consulted — row-based limits would need
  // page-count arithmetic against pageSize.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    MailOffset(scan.cappedEnd(start.asInstanceOf[MailOffset].page))

  override def reportLatestOffset(): Offset = MailOffset(scan.lastPage)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    scan.pagesBetween(start.asInstanceOf[MailOffset].page, end.asInstanceOf[MailOffset].page)

  override def createReaderFactory(): PartitionReaderFactory = scan.readerFactory
}

/** Explicit factory class (not a SAM lambda): it ships to executors,
  * so it must be Serializable without capturing the driver-side Scan.
  */
class MailReaderFactory(fields: Array[String], filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[MailPage]
    val tests = filters.flatMap(MailTransport.compile)
    new PartitionReader[InternalRow] {
      private var cur = page.start - 1
      override def next(): Boolean = {
        cur += 1
        while (cur < page.end && !tests.forall(_(cur))) cur += 1
        cur < page.end
      }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map(MailTransport.fieldOf(_, cur)).toArray[Any])
      override def close(): Unit = ()
    }
  }
}

case class MailCommit(inserted: Long, failedBatches: Long) extends WriterCommitMessage

class MailBatchWrite(sink: String, batchSize: Int, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MailWriterFactory(sink, batchSize, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class MailWriterFactory(sink: String, batchSize: Int, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MailDataWriter(sink, batchSize, schema)
}

/** Batched, error-isolating writer (main.py:231-254): flush every
  * `batchSize` rows; a batch whose insert throws is dropped and
  * counted, the writer keeps going. The reference's 1 s inter-batch
  * sleep is a remote-quota concern, not reproduced against the
  * in-memory store — a real transport would rate-limit here.
  */
class MailDataWriter(sink: String, batchSize: Int, schema: StructType)
    extends DataWriter[InternalRow] {
  private val idOrdinal = schema.fieldNames.indexOf("id")
  private val buf = new ArrayBuffer[Seq[String]](batchSize)
  private var inserted = 0L
  private var failedBatches = 0L

  override def write(row: InternalRow): Unit = {
    buf += schema.fields.indices.map(i =>
      if (row.isNullAt(i)) null else String.valueOf(row.get(i, schema(i).dataType)))
    if (buf.size >= batchSize) flush()
  }

  private def flush(): Unit = {
    if (buf.nonEmpty) {
      try {
        // Fault injection for tests: a poison id fails its whole batch.
        if (idOrdinal >= 0 && buf.exists(r => r(idOrdinal) != null && r(idOrdinal).contains("poison")))
          throw new RuntimeException("insert rejected")
        val q = MailSink.store(sink)
        buf.foreach(q.add)
        inserted += buf.size
      } catch { case _: RuntimeException => failedBatches += 1 }
      buf.clear()
    }
  }

  override def commit(): WriterCommitMessage = { flush(); MailCommit(inserted, failedBatches) }
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}
