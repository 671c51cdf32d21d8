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
}
