package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The composed training-data cleaning pipeline - what a user actually
  * runs over a raw corpus: exact dedup (keep canonical copy) ∘ near-dup
  * removal (MinHash/LSH candidates, Jaccard-verified, higher doc_id
  * loses) ∘ quality gate (token count + composite score).
  *
  * Composition is semi/anti joins against the operator outputs, so the
  * whole clean is still one declarative plan: narrow scoring + the LSH
  * bucket shuffle + two small hash joins. At 100 TB the near-dup pair
  * set is tiny relative to the corpus; the anti join broadcasts it.
  */
object CorpusClean {

  val minQuality = 0.5
  val minTokens = 30

  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    val stats = TextAnalysis.stats(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"))
    val exactKeep = Dedup.exact(spark, sfDir)
      .filter(col("is_canonical")).select(col("doc_id"))
    val nearDupLosers = Dedup.verifiedPairs(spark, sfDir)
      .select(col("doc_b").as("doc_id")).distinct()
    stats
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(broadcast(nearDupLosers), Seq("doc_id"), "left_anti")
      .filter(col("quality") >= minQuality && col("n_tokens") >= minTokens)
      .orderBy(col("doc_id"))
  }

  val sql: String =
    s"""WITH ${Dedup.shingledCteDuck}, ${Dedup.bandsCteDuck}, cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.h = y.h AND x.doc_id < y.doc_id
       |), losers AS (
       |  SELECT DISTINCT c.doc_b AS doc_id
       |  FROM cand c
       |  JOIN hs a ON a.doc_id = c.doc_a
       |  JOIN hs b ON b.doc_id = c.doc_b
       |  WHERE (floor((CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
       |              / CAST(len(a.hs) + len(b.hs)
       |                     - len(list_intersect(a.hs, b.hs)) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
       |        >= ${Dedup.jaccardThreshold}
       |), exact_keep AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |           min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
       |    FROM documents
       |  ) WHERE doc_id = keeper
       |), st AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
       |      AS n_tokens,
       |    (floor((CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
       |            x -> x IN (${TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")})))
       |          AS DOUBLE)
       |          / CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0)
       |      AS stop_ratio,
       |    (floor((CAST(length(text)
       |               - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
       |               AS DOUBLE)
       |          / CAST(length(text) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS punct_ratio
       |  FROM documents
       |), scored AS (
       |  SELECT doc_id, lang, n_tokens,
       |    (floor((least(1.0, CAST(n_tokens AS DOUBLE) / 50.0)
       |          * (1.0 - stop_ratio * 0.5) * (1.0 - punct_ratio)) * 1000000.0 + 0.5) / 1000000.0)
       |      AS quality
       |  FROM st
       |)
       |SELECT s.doc_id, s.lang, s.n_tokens, s.quality
       |FROM scored s
       |JOIN exact_keep k ON k.doc_id = s.doc_id
       |WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)
       |  AND s.quality >= $minQuality AND s.n_tokens >= $minTokens
       |ORDER BY s.doc_id""".stripMargin
}
