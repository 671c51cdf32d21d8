package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The z-order layout's actual contract: after writing the table
  * partitioned by the z-shard, a range query on EITHER dimension has a
  * small, driver-enumerable candidate shard set - the property no
  * single-column sort layout can offer on both dimensions at once.
  */
class LayoutSpec extends SparkSpec {

  private def candShards(inBox: (Long, Long) => Boolean): Set[Long] =
    Layout.candidateShards(inBox)

  test("zorder: both dimensions prune to a fraction of the shards") {
    val nShards = 1L << (2 * Layout.zBits - Layout.shardShift)
    // time box: tb in [40, 59] - its high bits collapse to one value,
    // so only the value dimension's high bits vary in the shard id
    val tCand = candShards((tb, _) => tb >= 40 && tb <= 59)
    // value box: vb in [0, 31]
    val vCand = candShards((_, vb) => vb >= 0 && vb <= 31)
    assert(tCand.size * 4 <= nShards,
      s"time box should prune to <= 1/4 of shards: ${tCand.size}/$nShards")
    assert(vCand.size * 4 <= nShards,
      s"value box should prune to <= 1/4 of shards: ${vCand.size}/$nShards")
  }

  test("zorder: partition-pruned read returns exactly the box's rows") {
    val df = Layout.zorder(spark, sfDir)
    val dir = Files.createTempDirectory("graft_zorder").toString
    df.write.partitionBy("shard").mode("overwrite").parquet(dir)
    // a 20-bucket time box anchored inside the fixture's actual range
    val tbLo = df.agg(min(col("tb"))).collect()(0).getLong(0) + 10
    val tbHi = tbLo + 19
    val tCand = candShards((tb, _) => tb >= tbLo && tb <= tbHi)
    val direct = df.filter(col("tb").between(tbLo, tbHi))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(direct.nonEmpty, "fixture must have rows in the time box")
    // reading ONLY the candidate partitions (what a 100 TB scan would
    // do) must yield exactly the directly-filtered rows
    val pruned = spark.read.parquet(dir)
      .filter(col("shard").cast("long").isin(tCand.toSeq: _*))
      .filter(col("tb").between(tbLo, tbHi))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(pruned == direct,
      "candidate-shard read must be lossless for the query box")
    // and the candidate set genuinely excludes shards holding data
    val allShards = df.select("shard").distinct()
      .collect().map(_.getLong(0)).toSet
    assert((allShards -- tCand).nonEmpty,
      "the fixture must have data outside the candidate set")
  }

  test("writeZOrdered/prunedRead: public API is lossless, prunes at the " +
       "FileIndex, and quarantines null keys") {
    val s = spark; import s.implicits._
    val ev = graft.core.Graft.table(spark, sfDir, "events")
    // plant rows that cannot be placed on the curve
    val nulls = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        java.util.Arrays.asList(
          Row(-1L, null, 123.0),
          Row(-2L, 1704067200000000000L, null)),
        StructType(Seq(StructField("event_id", LongType),
          StructField("ts", LongType), // nanos-as-long, like the table
          StructField("value", DoubleType))))
    }
    // the fixture carries long nanos; re-encode to whatever ts type the
    // live table scans as (the union must be encoding-agnostic, like
    // the operators themselves)
    val fixtureTs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case dt => expr("timestamp_micros(ts DIV 1000)").cast(dt)
    }
    val withNulls = ev.select(col("event_id"), col("ts"), col("value"))
      .unionByName(nulls.select(col("event_id"), fixtureTs.as("ts"),
        col("value").cast("double")))
    val dir = java.nio.file.Files.createTempDirectory("graft_zapi").toString
    Layout.writeZOrdered(withNulls, dir)
    // nothing dropped; null-key rows live in the reserved shard
    val full = spark.read.parquet(dir)
    assert(full.count() == withNulls.count())
    assert(full.filter(col("shard").cast("long") === -1L)
      .select("event_id").collect().map(_.getLong(0)).toSet == Set(-1L, -2L))
    // box query through the public API == direct filter over everything
    val keyed = Layout.zorder(spark, sfDir)
    val tbLo = keyed.agg(min(col("tb"))).collect()(0).getLong(0) + 10
    val box = Layout.ZBox(tbLo = tbLo, tbHi = tbLo + 19)
    val pruned = Layout.prunedRead(spark, dir, box)
    val direct = keyed
      .filter(col("tb").between(box.tbLo, box.tbHi) &&
        col("vb").between(box.vbLo, box.vbHi))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(direct.nonEmpty, "fixture must have rows in the box")
    val got = pruned.select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == direct, "prunedRead must be lossless for the box")
    // the shard cut is a PARTITION filter (FileIndex-level skip, no
    // I/O on non-candidate directories), not a post-scan predicate
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
    assert(pf.exists(_.contains("shard")),
      s"shard prune must appear in PartitionFilters:\n$plan")
  }

  test("layout store: per-batch z-order, pruned read spans batches " +
       "at the FileIndex") {
    val watch = java.nio.file.Files
      .createTempDirectory("graft_laystore_watch").toString
    val store = java.nio.file.Files
      .createTempDirectory("graft_laystore_store").toString
    val ev = graft.core.Graft.table(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("value"))
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$watch/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(watch, name))
    }
    land(ev.filter(pmod(col("event_id"), lit(2)) === 0), "a1.parquet")
    graft.pipeline.SignatureStore.catchUpLayout(spark, watch, store)
    land(ev.filter(pmod(col("event_id"), lit(2)) === 1), "a2.parquet")
    graft.pipeline.SignatureStore.catchUpLayout(spark, watch, store)
    val keyed = Layout.zorder(spark, sfDir)
    val tbLo = keyed.agg(min(col("tb"))).collect()(0).getLong(0) + 10
    val box = Layout.ZBox(tbLo = tbLo, tbHi = tbLo + 19)
    val pruned = graft.pipeline.SignatureStore
      .prunedReadStore(spark, store, box)
    val direct = keyed
      .filter(col("tb").between(box.tbLo, box.tbHi) &&
        col("vb").between(box.vbLo, box.vbHi))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(direct.nonEmpty, "fixture must have rows in the box")
    // rows from BOTH parities (batches) must be present - the prune
    // spans every batch subtree, not just the latest
    val got = pruned.select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == direct, "store pruned read must be lossless")
    assert(got.exists(_ % 2 == 0) && got.exists(_ % 2 == 1),
      "box must span both ingest batches")
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
    assert(pf.exists(_.contains("shard")),
      s"shard prune must appear in PartitionFilters:\n$plan")
    // replay idempotency: nothing new -> identical store answer
    graft.pipeline.SignatureStore.catchUpLayout(spark, watch, store)
    assert(graft.pipeline.SignatureStore
      .prunedReadStore(spark, store, box)
      .select("event_id").collect().map(_.getLong(0)).toSet == got)
  }

  test("writeZOrdered: negative values clamp to the edge bucket and " +
       "stay addressable by a box read") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // a negative value used to produce vb < 0 whose low 8
    // two's-complement bits alias into a VALID shard (value -1 -> vb
    // -1 -> bits 255): the row landed in a normal shard but no box
    // read (residual vb >= 0) could ever return it
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 1704067200000000000L, -1.0),
        Row(2L, 1704067200000000000L, -1e9),
        Row(3L, 1704067200000000000L, 0.5),
        Row(4L, 1704067200000000000L, 1e9)),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", LongType),
        StructField("value", DoubleType))))
    val dir = Files.createTempDirectory("graft_zneg").toString
    Layout.writeZOrdered(rows, dir)
    val full = spark.read.parquet(dir)
    // negatives share bucket 0 with genuine lows; highs clamp to 255;
    // nothing lands in the reserved null shard and nothing is lost
    val vbs = full.select("event_id", "vb").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vbs == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 255L))
    assert(full.filter(col("shard").cast("long") === -1L).count() == 0)
    // the full-domain box reaches every row - the regression this pins
    val got = Layout.prunedRead(spark, dir, Layout.ZBox())
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }
}
