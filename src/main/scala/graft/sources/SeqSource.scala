package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 TABLE PROVIDER — the engine-extension surface
  * a library exposes when data lives behind an API/generator instead
  * of files: `spark.read.format("graft.sources.SeqSource")`. The
  * table is a deterministic synthetic sequence (id, val, tag) with
  * val = (id mod 997)/997 and tag = 't' ++ (id mod 7), so a DuckDB
  * `generate_series` oracle can replay it exactly.
  *
  * What it implements, and why each matters at 100 TB:
  *  - `planInputPartitions`: the id range splits into `slices` equal
  *    ranges — the parallelism contract; every executor generates its
  *    slice independently, no driver materialization.
  *  - `SupportsPushDownRequiredColumns`: the reader emits ONLY the
  *    pruned columns (a projection over (id) never pays for tag's
  *    string allocation).
  *  - `SupportsPushDownFilters`: id-range predicates become PARTITION
  *    PRUNING — slices wholly outside the bounds are never planned
  *    (the scan's `description()` reports kept/total, PlanShapeSpec
  *    pins it). Conservative contract: `pushFilters` returns ALL
  *    filters as post-scan residuals, so Spark re-evaluates them —
  *    pruning is an optimization, never a correctness dependency.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = properties.asScala
    new SeqTable(opts.getOrElse("n", "1000").toLong,
      opts.getOrElse("slices", "8").toInt)
  }
}

object SeqSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class SeqTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($n)"
  override def schema(): StructType = SeqSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, slices)
}

class SeqScanBuilder(n: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = SeqSource.fullSchema
  private var lo: Long = 0L
  private var hi: Long = n // exclusive
  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val used = filters.filter {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull("id") => true
      case _ => false
    }
    accepted = used
    // Everything stays a residual: Spark re-applies every filter after
    // the scan, so the bounds above only ever REMOVE work.
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(s: StructType): Unit = required = s
  override def build(): Scan = SeqScan(n, slices, lo, hi, required)
}

case class SeqScan(n: Long, slices: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def ranges: Seq[(Long, Long)] = {
    val step = math.max(1L, (n + slices - 1) / slices)
    (0L until n by step).map(s => (s, math.min(n, s + step)))
  }
  private def kept: Seq[(Long, Long)] =
    ranges.map { case (s, e) => (math.max(s, lo), math.min(e, hi)) }
      .filter { case (s, e) => s < e }

  override def description(): String =
    s"SeqScan(n=$n, partitions=${kept.size}/${ranges.size}, " +
      s"bounds=[$lo,$hi), cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    kept.map { case (s, e) => SeqPartition(s, e): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    SeqReaderFactory(required.fieldNames)
}

case class SeqPartition(start: Long, end: Long) extends InputPartition

case class SeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = sp.start - 1
      override def next(): Boolean = { cur += 1; cur < sp.end }
      override def get(): InternalRow = {
        val vals: Array[Any] = cols.map {
          case "id"  => cur
          case "val" => (cur % 997) / 997.0
          case "tag" => UTF8String.fromString("t" + (cur % 7))
        }
        InternalRow.fromSeq(vals.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
