package graft.probe

import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the two-level IVF coarse stage: group-size skew,
  * centroid↔leader similarity spread, and flat-vs-h2 assignment
  * agreement as a function of coarse probes and of the leader-selection
  * rule (prefix sample vs farthest-point greedy). Measurement behind
  * the `ann_range_h2` design choices; numbers land in PLANS.md.
  *
  *   sbt "Test/runMain graft.probe.H2Probe [sfDir]"
  */
object H2Probe {

  private def cosDD(a: Seq[Double], b: Seq[Double]): Double = {
    val m = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < m) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cents = Similarity.trainedCentroidsFor(spark, sfDir)
    val k = cents.size
    println(s"k=$k g=${Similarity.coarseFor(k)}")

    // centroid↔centroid cosine spread
    val sims = for (a <- 0 until k; b <- 0 until k if a < b)
      yield cosDD(cents(a), cents(b))
    println(f"centroid-pair csim: min=${sims.min}%.3f " +
      f"mean=${sims.sum / sims.size}%.3f max=${sims.max}%.3f")

    def membersOf(leaders: Seq[Int]): Map[Int, Seq[Int]] =
      (0 until k).groupBy { c =>
        leaders.maxBy(j => (cosDD(cents(c), cents(j)), -j))
      }

    val e = graft.core.Graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val rows = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val flat = rows.map { case (id, v) =>
      id -> (0 until k).maxBy(c => (cosDD(v, cents(c)), -c))
    }.toMap

    def agreement(leaders: Seq[Int], probes: Int): Double = {
      val mem = membersOf(leaders)
      val hit = rows.count { case (id, v) =>
        val top = leaders.sortBy(j => (-cosDD(v, cents(j)), j)).take(probes)
        val cand = top.flatMap(j => mem.getOrElse(j, Nil))
        val got = cand.maxBy(c => (cosDD(v, cents(c)), -c))
        got == flat(id)
      }
      hit.toDouble / rows.length
    }

    val g = Similarity.coarseFor(k)
    val prefix = 0 until g
    // farthest-point greedy: start at 0, add argmin of max-sim to chosen
    var fps = Vector(0)
    while (fps.size < g) {
      val next = (0 until k).filterNot(fps.contains)
        .minBy(c => (fps.map(j => cosDD(cents(c), cents(j))).max, c))
      fps = fps :+ next
    }
    for (sel <- Seq("prefix" -> prefix.toSeq, "fps" -> fps)) {
      val mem = membersOf(sel._2)
      val sizes = sel._2.map(j => mem.getOrElse(j, Nil).size)
      println(s"${sel._1}: group sizes=${sizes.mkString(",")}")
      for (p <- 1 to math.min(4, g))
        println(f"  ${sel._1} probes=$p agreement=${agreement(sel._2, p)}%.3f")
    }

    // end-to-end quality: range recall vs the brute truth, flat vs h2
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val queries = rows.filter(_._1 < Similarity.numQueries)
    val truth = (for ((qid, qv) <- queries; (id, v) <- rows if id != qid;
                      s = q6(cosDD(qv, v)) if s >= Similarity.rangeSimThreshold)
      yield (qid, id)).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.size.toDouble / truth.size
    }
    println(f"range recall flat=${recallOf(Similarity.annRange(spark, sfDir))}%.3f " +
      f"h2=${recallOf(Similarity.annRangeH2(spark, sfDir))}%.3f " +
      s"(truth=${truth.size})")
    spark.stop()
  }
}
