package graft.sources.feed

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table for the reference's upstream keyset-paginated
  * feed (`src/services/fetchContact.js:5-11`: `GET ?lastId=&limit=`).
  * The reference pulls pages serially over HTTP; at scale the feed
  * becomes a DSv2 table whose scan (a) splits the id range into
  * parallel partitions and (b) pushes `id > lastId` down into the
  * source so resumption reads nothing before the watermark — the DSv2
  * analogue of keyset pagination.
  *
  * Rows are a deterministic function of `id` (this is a feed simulator;
  * a real one would issue range requests), which makes the source fully
  * oracle-checkable.
  */
class FeedTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedTable.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(100000L)
    val parts = Option(properties.get("parts")).map(_.toInt).getOrElse(8)
    new FeedTable(rows, parts)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object FeedTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("category", StringType, nullable = false)))

  /** The deterministic row function — mirrored by the DuckDB oracle. */
  def kOf(id: Long): Long = id * 31 % 1000
  def categoryOf(id: Long): String = "u" + (id % 100)
}

class FeedTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_feed($rows)"
  override def schema(): StructType = FeedTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FeedScanBuilder(rows, parts)
}

/** Keyset pushdown: accepts `id > v` / `id >= v` filters and turns them
  * into the scan's lower bound; everything else stays post-scan.
  */
class FeedScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters {

  private var lowerBound: Long = 0L
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", v: Long)        => true
      case GreaterThanOrEqual("id", v: Long) => true
      case IsNotNull("id")                   => true
      case _                                 => false
    }
    accepted.foreach {
      case GreaterThan("id", v: Long)        => lowerBound = math.max(lowerBound, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lowerBound = math.max(lowerBound, v)
      case _                                 => ()
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new FeedScan(lowerBound, rows, parts)
}

case class FeedRange(start: Long, end: Long) extends InputPartition

class FeedScan(lower: Long, rows: Long, parts: Int) extends Scan with Batch {
  override def readSchema(): StructType = FeedTable.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_feed scan [lower=$lower, rows=$rows, parts=$parts]"

  override def planInputPartitions(): Array[InputPartition] = {
    val start = math.min(lower, rows)
    val span = rows - start
    val per = math.max(1L, (span + parts - 1) / parts)
    val out = ArrayBuffer.empty[InputPartition]
    var s = start
    while (s < rows) {
      val e = math.min(s + per, rows)
      out += FeedRange(s, e)
      s = e
    }
    out.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FeedReaderFactory
}

class FeedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val FeedRange(start, end) = partition.asInstanceOf[FeedRange]
    new PartitionReader[InternalRow] {
      private var cur = start - 1
      override def next(): Boolean = { cur += 1; cur < end }
      override def get(): InternalRow =
        InternalRow(cur, FeedTable.kOf(cur),
          UTF8String.fromString(FeedTable.categoryOf(cur)))
      override def close(): Unit = ()
    }
  }
}
