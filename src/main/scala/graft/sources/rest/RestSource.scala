package graft.sources.rest

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StructField, StructType, StringType, IntegerType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Paginated-REST batch source as a DataSource V2 `TableProvider`.
  *
  * The reference's extract is a SERIAL offset loop — `while True: offset += 1`
  * until an empty page, ≥1 s per page, 250 rows/page ≈ 250 rows/s ceiling
  * (/root/reference/dags/API_IPN.py:78-129, BASELINE.md). Here each
  * InputPartition owns a contiguous page range, so a cluster fetches pages
  * in parallel (bounded by `pagesPerPartition` × executor count) and the
  * 1 rps throttle becomes a per-partition `throttleMs` option instead of a
  * global serialization point.
  *
  * Rows surface as (page int, value string) — raw JSON records; pipelines
  * apply `from_json` with their explicit entity schema (the engine's
  * schema-drift stance, SURVEY.md §1.3). API-side predicates (date windows,
  * store lists — F8) travel as source options, exactly as they are request
  * parameters in the reference.
  *
  * Transport is pluggable via [[PageFetcher]]: [[HttpPageFetcher]] is the
  * production `java.net.http` implementation (Bearer auth, offset
  * pagination, typed 400/401/5xx mapping, bounded retry — proven against
  * an in-process HTTP server in HttpRestSourceSpec); tests also register
  * deterministic in-memory fetchers.
  */
trait PageFetcher extends Serializable {
  /** Return the JSON records of one page; empty when past the end. */
  def fetch(page: Int, pageSize: Int, params: Map[String, String]): Seq[String]
}

object FetcherRegistry {
  private val fetchers = new java.util.concurrent.ConcurrentHashMap[String, PageFetcher]()
  def register(name: String, f: PageFetcher): Unit = fetchers.put(name, f)
  /** Resolve by registered name (local/test) or, on a real cluster where
    * the registry is driver-local, by fully-qualified class name
    * instantiated on the executor.
    */
  def apply(name: String): PageFetcher = {
    val f = fetchers.get(name)
    if (f != null) f
    else if (name.contains("."))
      Class.forName(name).getDeclaredConstructor().newInstance().asInstanceOf[PageFetcher]
    else throw new IllegalArgumentException(s"no PageFetcher registered under '$name'")
  }
}

class RestTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RestTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RestTable(new CaseInsensitiveStringMap(properties))
}

object RestTable {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class RestTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"rest(${options.getOrDefault("fetcher", "?")})"
  override def schema(): StructType = RestTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(opts)
}

class RestScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch with SupportsPushDownFilters {
  private val fetcherName = options.get("fetcher")
  private val pageSize = options.getInt("pageSize", 250)
  private val totalPages = options.getInt("totalPages", 1)
  private val pagesPerPartition = options.getInt("pagesPerPartition", 4)
  private val throttleMs = options.getLong("throttleMs", 0L)
  private val params: Map[String, String] = options.asScala.toMap
    .collect { case (k, v) if k.startsWith("param.") => k.stripPrefix("param.") -> v }

  // predicate pushdown into the source (SURVEY §7.2 step 5): range
  // predicates on `page` shrink the fetched page window — the DSv2 analog
  // of the reference pushing date windows into request params. Anything
  // else stays a post-scan filter.
  private var minPage = 0
  private var maxPageExcl = totalPages
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("page", _: Int) | GreaterThan("page", _: Int) |
           GreaterThanOrEqual("page", _: Int) | LessThan("page", _: Int) |
           LessThanOrEqual("page", _: Int) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("page", v: Int) =>
        minPage = math.max(minPage, v); maxPageExcl = math.min(maxPageExcl, v + 1)
      case GreaterThan("page", v: Int)        => minPage = math.max(minPage, v + 1)
      case GreaterThanOrEqual("page", v: Int) => minPage = math.max(minPage, v)
      case LessThan("page", v: Int)           => maxPageExcl = math.min(maxPageExcl, v)
      case LessThanOrEqual("page", v: Int)    => maxPageExcl = math.min(maxPageExcl, v + 1)
      case _ => ()
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = this
  override def readSchema(): StructType = RestTable.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"RestScan(fetcher=$fetcherName, pages=[$minPage,$maxPageExcl), pageSize=$pageSize)"

  override def planInputPartitions(): Array[InputPartition] =
    (minPage until maxPageExcl by pagesPerPartition).map { start =>
      RestInputPartition(start, math.min(start + pagesPerPartition, maxPageExcl))
        .asInstanceOf[InputPartition]
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(fetcherName, pageSize, throttleMs, params)
}

case class RestInputPartition(startPage: Int, endPage: Int) extends InputPartition

class RestReaderFactory(fetcherName: String, pageSize: Int, throttleMs: Long,
                        params: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestInputPartition]
    new RestPartitionReader(p, FetcherRegistry(fetcherName), pageSize, throttleMs, params)
  }
}

class RestPartitionReader(p: RestInputPartition, fetcher: PageFetcher, pageSize: Int,
                          throttleMs: Long, params: Map[String, String])
    extends PartitionReader[InternalRow] {
  private var page = p.startPage
  private var rows: Iterator[String] = Iterator.empty
  private var current: InternalRow = _
  private var currentPage = -1
  private var exhausted = false

  override def next(): Boolean = {
    while (!rows.hasNext && !exhausted) {
      if (page >= p.endPage) { exhausted = true }
      else {
        if (throttleMs > 0) Thread.sleep(throttleMs) // per-partition rate limit
        val fetched = fetcher.fetch(page, pageSize, params)
        currentPage = page
        page += 1
        // empty page terminates the range early (NoRecordsException analog,
        // /root/reference/dags/API_IPN.py:117-121)
        if (fetched.isEmpty) exhausted = true else rows = fetched.iterator
      }
    }
    if (rows.hasNext) {
      current = InternalRow(currentPage, UTF8String.fromString(rows.next()))
      true
    } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
