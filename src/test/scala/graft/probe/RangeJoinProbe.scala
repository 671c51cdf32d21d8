package graft.probe

import graft.analytics.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudication probe for the r15 q_range_join sf3 move (3.35 →
  * 5.22 s across rounds on ZERO source diffs): regenerates the 10×
  * events anchor exactly as Bench does, times the banded range join
  * over N passes (min is the contention-proof floor), prints the
  * workload term — the exact banded pair volume, quadratic in
  * temporal density, so identical generated data ⇒ identical work —
  * and prints the EXECUTED plan's join nodes: the banding rewrite
  * must run as an equi-join on the bucket id (SortMergeJoin /
  * ShuffledHashJoin), never the BroadcastNestedLoopJoin the raw
  * inequality join would produce. If volume and plan match across
  * rounds while wall moves, the move is box state, not the engine.
  *
  *   sbt "Test/runMain graft.probe.RangeJoinProbe [sfDir] [factor] [reps]"
  */
object RangeJoinProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.ensureConf(spark)

    val rows =
      spark.read.parquet(s"$sfDir/events.parquet").count() * factor
    val dir3 = java.nio.file.Files
      .createTempDirectory("graft_rjprobe").toString
    spark.read.format("graft-events").option("rows", rows.toString)
      .load().coalesce(1).write.mode("overwrite").parquet(s"$dir3/_gen")
    val part = new java.io.File(s"$dir3/_gen").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir3, "events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    // The workload term: total qualifying pairs. Deterministic
    // generator ⇒ this number must be bit-identical across rounds.
    val vol = RangeJoin.apply(spark, dir3)
      .agg(sum(col("n_next"))).head.getLong(0)
    println(s"[rjprobe] rows=$rows banded_pair_volume=$vol")

    val walls = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      RangeJoin.apply(spark, dir3)
        .write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[rjprobe] pass $i wall=$w%.2fs")
      w
    }
    println(f"[rjprobe] min=${walls.min}%.2fs " +
      f"median=${walls.sorted.apply(reps / 2)}%.2fs")

    val df = RangeJoin.apply(spark, dir3)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Join")).foreach(l =>
      println("[rjprobe] plan: " + l.trim.take(150)))
    require(!plan.contains("BroadcastNestedLoop"),
      "banding rewrite regressed to a nested-loop join")

    val p3 = new org.apache.hadoop.fs.Path(dir3)
    p3.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p3, true): Unit
    spark.stop()
  }
}
