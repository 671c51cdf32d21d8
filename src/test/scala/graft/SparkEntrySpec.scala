package graft

import org.apache.spark.sql.functions.col

/** Contract smoke: every declared query executes at sf0.001, every
  * query has an oracle, and the flagship entry() is non-empty - the
  * wiring guard for future rounds.
  */
class SparkEntrySpec extends SparkSpec {

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
