package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Full config-file parity with the reference
  * (/root/reference/src-clj/streamsum/system.clj `read-config-file` +
  * caches.clj:103 `configure-cache-mappings`): one text config declares
  * BOTH the transform rules and the cache topology (name → kind, lastN
  * buffer size), and cache kinds are a pluggable registry that user
  * factories merge over - ≙ the reference's `cache-factory-fns` merged
  * over `default-cache-factories`.
  */
final case class PipelineConfig(
    rules: Seq[Rule],
    cacheKinds: Map[String, String], // cache name → kind key
    lastNSize: Int)

object PipelineConfig {

  /** Parse the full text config. Three line forms (plus # comments):
    *
    *   cache <name> <kind>          # ≙ :cache-config {name [kind ...]}
    *   lastn-buf-size <n>           # ≙ :last-n-buf-size
    *   pred -> cache(k,v)[@action]  # ≙ deftransform patterns
    *
    * Every rule output must target a declared cache - the analog of the
    * reference failing a lookup for an unconfigured cache-key.
    */
  def parse(text: String): PipelineConfig = {
    val cacheRe = """cache\s+([\w-]+)\s+([\w-]+)""".r
    val lastnRe = """lastn-buf-size\s+(\d+)""".r
    var kinds = Map.empty[String, String]
    var lastN = Config.lastNSize
    val ruleLines = Seq.newBuilder[String]
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .foreach {
        case cacheRe(name, kind) => kinds += (name -> kind)
        case lastnRe(n) => lastN = n.toInt
        case line => ruleLines += line
      }
    val rules = Transform.parseRules(ruleLines.result().mkString("\n"))
    val undeclared = for {
      rule <- rules; out <- rule.outs
      if !kinds.contains(out.cache)
    } yield s"${rule.pred}→${out.cache}"
    require(undeclared.isEmpty,
      s"rule outputs target undeclared caches: ${undeclared.mkString(", ")}")
    PipelineConfig(rules, kinds, lastN)
  }
}

/** Pluggable cache-kind registry ≙ caches.clj `default-cache-factories`
  * merged with the config's `cache-factory-fns`. A factory turns the
  * transformed tuple relation (filtered to its kind's caches) into that
  * kind's final state in the normalized pipeline schema
  * (cache, k, a, v, t, cnt, rn).
  */
object CacheRegistry {

  /** (xf, caches of this kind, config) → normalized state relation. */
  type Factory = (DataFrame, Seq[String], PipelineConfig) => DataFrame

  private def nullS = lit(null).cast(StringType)
  private def nullL = lit(null).cast(LongType)

  val defaults: Map[String, Factory] = Map(
    "assoc" -> ((xf, caches, _) =>
      Caches.assocState(xf, caches).select(col("cache"), col("k"),
        nullS.as("a"), col("v"), col("t"), nullL.as("cnt"),
        nullL.as("rn"))),
    "lastn" -> ((xf, caches, cfg) =>
      Caches.lastnState(xf, cfg.lastNSize, caches).select(col("cache"),
        col("k"), nullS.as("a"), col("v"), col("t"), nullL.as("cnt"),
        col("rn"))),
    "count" -> ((xf, caches, _) =>
      Caches.countState(xf, caches).select(col("cache"),
        col("s").as("k"), col("a"), col("o").as("v"),
        col("last_t").as("t"), col("cnt"), nullL.as("rn"))),
    "keycount" -> ((xf, caches, _) =>
      caches.map(c => Caches.keycountState(xf, c).select(col("cache"),
        col("k"), nullS.as("a"), nullL.as("v"), nullL.as("t"),
        col("cnt"), nullL.as("rn"))).reduce(_ unionAll _)))

  /** Union of every configured cache's final state, one factory call
    * per kind (kinds and caches iterated in sorted order so the plan is
    * deterministic). Unknown kind → error, ≙ the reference's
    * `(assert (not (nil? cache-factory)) ...)`.
    */
  def pipelineState(xf: DataFrame, cfg: PipelineConfig,
                    extraFactories: Map[String, Factory] = Map.empty): DataFrame = {
    val factories = defaults ++ extraFactories
    val byKind = cfg.cacheKinds.groupBy(_._2).toSeq.sortBy(_._1)
    val states = byKind.map { case (kind, entries) =>
      val factory = factories.getOrElse(kind,
        throw new IllegalArgumentException(
          s"No factory function found for cache type $kind"))
      factory(xf, entries.keys.toSeq.sorted, cfg)
    }
    states.reduce(_ unionAll _)
      .orderBy(col("cache"), col("k"), col("a"), col("rn"), col("v"))
  }
}

/** Build the whole summarization pipeline from one config string - the
  * graft analog of the reference wiring a system from a config file.
  */
object Pipeline {

  /** The default pipeline in full config-file form; building from it
    * reproduces `SparkEntry.pipelineE2e` exactly (asserted in
    * PipelineConfigSpec).
    */
  val defaultConfigText: String =
    """# graft pipeline config
      |# cache topology ≙ :cache-config
      |cache signup-obj-user assoc
      |cache signup-user-obj lastn
      |cache view-user-obj lastn
      |cache buy-obj-user assoc
      |cache buy-user-obj lastn
      |cache interactions-user-obj count
      |cache subject-counts keycount
      |# misc params ≙ :last-n-buf-size
      |lastn-buf-size 20
      |# transform rules ≙ deftransform patterns
      |signup -> signup-obj-user(o,s), signup-user-obj(s,o)
      |view -> view-user-obj(s,o)
      |purchase -> buy-obj-user(o,s), buy-user-obj(s,o), interactions-user-obj(s,o)@buy
      |error -> interactions-user-obj(s,o)@err
      |""".stripMargin

  def fromConfig(spark: SparkSession, dir: String, configText: String,
                 extraFactories: Map[String, CacheRegistry.Factory] = Map.empty): DataFrame = {
    val cfg = PipelineConfig.parse(configText)
    // one persisted scan feeds every cache aggregation
    // (Transform.transformed memoizes per (session, corpus, rules))
    val xf = Transform.transformed(spark, dir, cfg.rules)
    CacheRegistry.pipelineState(xf, cfg, extraFactories)
  }
}
