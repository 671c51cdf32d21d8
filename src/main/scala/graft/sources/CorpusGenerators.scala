package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic DOCUMENTS source (`graft-docs`), the corpus
  * sibling of `graft-events` (EventsGenerator.scala): deterministic,
  * partition-parallel, zero driver materialization - each partition
  * derives its rows from its own index range, so any scale factor is a
  * single option. The emitted relation mirrors the driver-generated
  * `documents` table's shape exactly (vocab, word-count range,
  * language weights, source fan-out), and every ~23rd document is a
  * deterministic NEAR-DUPLICATE of an earlier one (same text with a
  * ~10% word mutation) so minhash/jaccard workloads see realistic
  * candidate density at any generated scale. Duplicates are derivable
  * locally: text is a pure function of the doc index, so a partition
  * regenerates its base text without reading other partitions.
  */
class DocumentsGenerator extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocumentsGenerator.schema

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    def opt(k: String, d: Long): Long =
      Option(opts.get(k)).map(_.toLong).getOrElse(d)
    new DocsGenTable(opt("rows", 1000L), opt("numPartitions", 8L).toInt)
  }
}

object DocumentsGenerator {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  /** The driver fixture's 31-word vocabulary (TESTDATA.md corpus). */
  val vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** Language weights ≈ the fixture's 44/15/15/14/13% split. */
  val langs: Array[String] = Array("en", "zh", "es", "de", "fr")
  val langCum: Array[Long] = Array(44, 59, 74, 88, 100)

  val sources = 20
  val nearDupEvery = 23 // doc i with i % 23 == 7 duplicates doc i - 7

  private def h(s: String): Long = graft.functions.Md5Util.hash48(
    UTF8String.fromString(s))

  /** Base (pre-duplication) text of doc `i`: 10..99 words drawn from
    * the vocab by per-position hash.
    */
  private def baseText(i: Long): String = {
    val n = 10 + (h(s"dlen:$i") % 90).toInt
    val sb = new java.lang.StringBuilder(n * 6)
    var w = 0
    while (w < n) {
      if (w > 0) sb.append(' ')
      sb.append(vocab((h(s"dw:$i:$w") % vocab.length).toInt))
      w += 1
    }
    sb.toString
  }

  /** Final text: near-dup docs copy their base doc with ~10% of word
    * positions re-drawn (a high-Jaccard pair by construction).
    */
  def textOf(i: Long): String = {
    val isDup = i % nearDupEvery == 7 && i >= nearDupEvery
    if (!isDup) baseText(i)
    else {
      val base = i - 7
      val words = baseText(base).split(' ')
      var w = 0
      while (w < words.length) {
        if (h(s"dmut:$i:$w") % 10 == 0)
          words(w) = vocab((h(s"dmw:$i:$w") % vocab.length).toInt)
        w += 1
      }
      words.mkString(" ")
    }
  }

  def langOf(i: Long): String = {
    val u = h(s"dlang:$i") % 100
    langs(langCum.indexWhere(u < _))
  }
}

final class DocsGenTable(rows: Long, parts: Int)
    extends Table with SupportsRead {

  override def name(): String = s"graft_docs($rows)"
  override def schema(): StructType = DocumentsGenerator.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = DocumentsGenerator.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (rows + parts - 1) / parts)
        (0 until parts).map { p =>
          DocsGenPartition(p * per, math.min(rows, (p + 1) * per))
            .asInstanceOf[InputPartition]
        }.filter { p =>
          val gp = p.asInstanceOf[DocsGenPartition]; gp.start < gp.end
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        DocsGenReaderFactory()
    }
}

final case class DocsGenPartition(start: Long, end: Long)
    extends InputPartition

final case class DocsGenReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocsGenPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = {
        import DocumentsGenerator._
        val text = textOf(i)
        val src = "src" + (graft.functions.Md5Util.hash48(
          UTF8String.fromString(s"dsrc:$i")) % sources)
        new GenericInternalRow(Array[Any](
          i,
          UTF8String.fromString(text),
          UTF8String.fromString(langOf(i)),
          UTF8String.fromString(src),
          text.length.toLong))
      }
      override def close(): Unit = ()
    }
  }
}

/** DataSource V2 synthetic EMBEDDINGS source (`graft-embeddings`):
  * deterministic unit-norm 64-dim float vectors (per-dim uniform draws
  * hash-seeded by (vec_id, dim), normalized - matching the fixture's
  * per-dim RMS of 1/8) with a small label-direction tilt mirroring the
  * fixture's weak within-label affinity, labels 0..9. Partition-
  * parallel and driver-free like the other generators.
  */
class EmbeddingsGenerator extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-embeddings"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EmbeddingsGenerator.schema

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    def opt(k: String, d: Long): Long =
      Option(opts.get(k)).map(_.toLong).getOrElse(d)
    new EmbGenTable(opt("rows", 1000L), opt("dims", 64L).toInt,
      opt("numPartitions", 8L).toInt)
  }
}

object EmbeddingsGenerator {
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false),
    StructField("label", IntegerType, nullable = false)))

  val labels = 10

  private def h(s: String): Long = graft.functions.Md5Util.hash48(
    UTF8String.fromString(s))

  /** Uniform in [-0.5, 0.5) from a 48-bit hash. */
  private def u(s: String): Double = (h(s).toDouble / 281474976710656.0) - 0.5

  def labelOf(i: Long): Int = (h(s"elab:$i") % labels).toInt

  def vecOf(i: Long, dims: Int): Array[Float] = {
    val lab = labelOf(i)
    val raw = new Array[Double](dims)
    var norm2 = 0.0
    var d = 0
    while (d < dims) {
      // base draw + a small shared per-label direction (the fixture's
      // within-label cosine is ~0.005 vs ~0.0005 across)
      val v = u(s"ev:$i:$d") + 0.07 * u(s"elc:$lab:$d")
      raw(d) = v; norm2 += v * v; d += 1
    }
    val inv = if (norm2 > 0) 1.0 / math.sqrt(norm2) else 0.0
    val out = new Array[Float](dims)
    d = 0
    while (d < dims) { out(d) = (raw(d) * inv).toFloat; d += 1 }
    out
  }
}

final class EmbGenTable(rows: Long, dims: Int, parts: Int)
    extends Table with SupportsRead {

  override def name(): String = s"graft_embeddings($rows)"
  override def schema(): StructType = EmbeddingsGenerator.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = EmbeddingsGenerator.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (rows + parts - 1) / parts)
        (0 until parts).map { p =>
          EmbGenPartition(p * per, math.min(rows, (p + 1) * per), dims)
            .asInstanceOf[InputPartition]
        }.filter { p =>
          val gp = p.asInstanceOf[EmbGenPartition]; gp.start < gp.end
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        EmbGenReaderFactory()
    }
}

final case class EmbGenPartition(start: Long, end: Long, dims: Int)
    extends InputPartition

final case class EmbGenReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EmbGenPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = {
        val vec = EmbeddingsGenerator.vecOf(i, p.dims)
        new GenericInternalRow(Array[Any](
          i,
          ArrayData.toArrayData(vec),
          EmbeddingsGenerator.labelOf(i)))
      }
      override def close(): Unit = ()
    }
  }
}
