package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic events source ≙ the reference accepting
  * events from any upstream (its Extract protocol is source-agnostic):
  * `spark.read.format("graft-events").option("rows", n)` yields a
  * deterministic events relation with the exact schema of the parquet
  * events table (ns-epoch ts), generated partition-parallel - each
  * input partition derives its rows from its own index range, so the
  * source scales to any size with zero driver materialization and no
  * shuffle. A seeded 48-bit hash drives user/type/object choice, and
  * every ~97th event carries malformed props to exercise the
  * TRY_CAST quarantine path end-to-end.
  */
class EventsGenerator extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-events"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsGenerator.schema

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties arrive with the caller's original key case
    val opts = new CaseInsensitiveStringMap(properties)
    def opt(k: String, d: Long): Long =
      Option(opts.get(k)).map(_.toLong).getOrElse(d)
    new EventsGenTable(opt("rows", 10000L), opt("users", 100L),
      opt("numPartitions", 8L).toInt)
  }
}

object EventsGenerator {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", LongType, nullable = false), // epoch-ns
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  val types: Array[String] =
    Array("signup", "view", "purchase", "error", "click")
  val baseNs: Long = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z
  val stepNs: Long = 1000000000L // 1s
}

final class EventsGenTable(rows: Long, users: Long, parts: Int)
    extends Table with SupportsRead {

  override def name(): String = s"graft_events($rows)"
  override def schema(): StructType = EventsGenerator.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = EventsGenerator.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (rows + parts - 1) / parts)
        (0 until parts).map { p =>
          EventsGenPartition(p * per, math.min(rows, (p + 1) * per), users)
            .asInstanceOf[InputPartition]
        }.filter { p =>
          val gp = p.asInstanceOf[EventsGenPartition]; gp.start < gp.end
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        EventsGenReaderFactory()
    }
}

final case class EventsGenPartition(start: Long, end: Long, users: Long)
    extends InputPartition

final case class EventsGenReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventsGenPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = {
        val h = graft.functions.Md5Util.hash48(
          UTF8String.fromString(s"ev:$i"))
        val props =
          if (h % 97 == 0) "not-json" // quarantine path
          else s"""{"k": ${(h >>> 16) % 100}}"""
        new GenericInternalRow(Array[Any](
          i,
          EventsGenerator.baseNs + i * EventsGenerator.stepNs,
          h % p.users,
          UTF8String.fromString(
            EventsGenerator.types(((h >>> 8) % 5).toInt)),
          1.0,
          UTF8String.fromString(props)))
      }
      override def close(): Unit = ()
    }
  }
}
