package graft.plans

import graft.SparkSpec
import graft.core.{Caches, CountQueries, Transform}
import org.apache.spark.sql.functions._

/** The custom bounded-heap top-k operator: plans through the injected
  * strategy (exec node present) and agrees row-for-row with the
  * window-function formulation.
  */
class TopKPerKeySpec extends SparkSpec {

  test("custom exec node is planned and matches the window formulation") {
    val counts = Caches.countState(Transform.transformed(spark, sfDir))
      .drop("cache")
    val custom = TopK.perKey(counts, Seq("s"),
      Seq(("cnt", false), ("last_t", false), ("a", true), ("o", true)), 3)
      .select(col("s"), col("a"), col("o"), col("cnt"), col("last_t"),
        col("rk"))
    custom.collect()
    assert(custom.queryExecution.executedPlan.toString
      .contains("TopKPerKey "), "custom operator not planned")
    val viaWindow = CountQueries.topKPerSubjFrom(counts, 3)
    val a = custom.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("randomized: custom operator == window formulation on 1000 rows") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(1000)((rnd.nextInt(20).toLong,
      rnd.nextInt(100).toLong, rnd.nextLong())) // key, score, uid
    val df = rows.toDF("k", "score", "uid")
    val k = 4
    val custom = TopK.perKey(df, Seq("k"),
      Seq(("score", false), ("uid", true)), k)
      .select(col("k"), col("score"), col("uid"), col("rk"))
      .collect().map(_.toSeq).toSet
    val win = df.withColumn("rk",
        row_number().over(W.partitionBy(col("k"))
          .orderBy(col("score").desc, col("uid"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("k"), col("score"), col("uid"), col("rk"))
      .collect().map(_.toSeq).toSet
    assert(custom == win)
  }

  test("map-side partial: plans below the exchange, bounds hot-key shuffle") {
    val s = spark; import s.implicits._
    // one hot key with 100k rows spread over 8 map partitions: the
    // partial must ship at most partitions x k rows of it through the
    // exchange instead of all 100k
    // plain (non-AQE) plan so the exchange node and its metrics are
    // directly reachable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val df = spark.range(100000)
      .select(lit(1L).as("k"), col("id").as("uid"),
        (col("id") % 1000).as("score"))
      .repartition(8)
    val k = 3
    val r = TopK.perKey(df, Seq("k"), Seq(("score", false), ("uid", true)), k)
    val rows = r.collect()
    assert(rows.length == k)
    val plan = r.queryExecution.executedPlan.toString
    // shape: final TopKPerKey above the exchange, TopKPartial below it
    val iFinal = plan.indexOf("TopKPerKey ")
    val iEx = plan.indexOf("Exchange", iFinal)
    val iPart = plan.indexOf("TopKPartial", iEx)
    assert(iFinal >= 0 && iEx > iFinal && iPart > iEx,
      s"expected TopKPerKey > Exchange > TopKPartial:\n$plan")
    // shuffle volume: the exchange's written records are the partial's
    // survivors - bounded by partitions x k, never the hot key's 100k
    val metrics = r.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics.get("shuffleRecordsWritten").map(_.value)
    }.flatten
    assert(metrics.nonEmpty)
    assert(metrics.head <= 8L * k,
      s"partial must bound the shuffle at partitions x k: ${metrics.head}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("high key cardinality: output streams per key, result exact") {
    // 100k distinct keys × 3 rows in few partitions: the exec must not
    // buffer the whole partition's output (streamed per-key emission),
    // and every key gets exactly min(k, rows) ranked rows
    val df = spark.range(300000)
      .select((col("id") % 100000).as("k"), col("id").as("uid"),
        (col("id") / 100000).as("score"))
      .repartition(4)
    val r = TopK.perKey(df, Seq("k"), Seq(("score", false), ("uid", true)), 2)
    assert(r.count() == 200000L)
    val perKey = r.groupBy(col("k")).count()
      .agg(min(col("count")), max(col("count"))).collect().head
    assert(perKey.getLong(0) == 2L && perKey.getLong(1) == 2L)
  }

  test("heap memory is registered with the task memory manager") {
    val peaks = scala.collection.mutable.ArrayBuffer.empty[Long]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          peaks.synchronized {
            peaks += e.taskMetrics.peakOnHeapExecutionMemory
          }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = spark.range(300000)
        .select((col("id") % 50000).as("k"), col("id").as("uid"),
          (col("id") / 50000).as("score"))
        .repartition(4)
      val r = TopK.perKey(df, Seq("k"),
        Seq(("score", false), ("uid", true)), 3)
      assert(r.count() == 150000L)
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 30000
      while (peaks.synchronized(peaks.isEmpty || peaks.max == 0L) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(peaks.synchronized(peaks.nonEmpty && peaks.max > 0L),
        "expected the heap ledger's acquisitions in peakExecutionMemory")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bounded heap keeps exact top-k under ties broken by order cols") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "x", 10L), (1L, "y", 10L), (1L, "z", 5L), (1L, "w", 20L),
      (2L, "a", 1L))
      .toDF("k", "tag", "score")
    val r = TopK.perKey(df, Seq("k"),
      Seq(("score", false), ("tag", true)), 2)
      .select(col("k"), col("tag"), col("rk"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
      .toSet
    assert(r == Set((1L, "w", 1L), (1L, "x", 2L), (2L, "a", 1L)))
  }
}
