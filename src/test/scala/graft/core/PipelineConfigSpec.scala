package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Full config-file parity ≙ the reference building its whole system
  * from one config file (system.clj read-config-file +
  * caches.clj configure-cache-mappings): rules, cache topology, lastN
  * size, and extensible cache kinds all come from one text config.
  */
class PipelineConfigSpec extends SparkSpec {

  test("parse: default full config == the hardcoded Config") {
    val cfg = PipelineConfig.parse(Pipeline.defaultConfigText)
    assert(cfg.rules == Config.rules)
    assert(cfg.lastNSize == Config.lastNSize)
    val kindName: CacheKind => String = {
      case Assoc => "assoc"; case LastN => "lastn"; case CountK => "count"
    }
    Config.cacheTypes.foreach { case (c, kind) =>
      assert(cfg.cacheKinds(c) == kindName(kind), s"cache $c")
    }
    assert(cfg.cacheKinds("subject-counts") == "keycount")
  }

  test("config-built pipeline == hand-wired cache states") {
    val got = Pipeline.fromConfig(spark, sfDir, Pipeline.defaultConfigText)
      .collect().map(_.toSeq).toSeq
    val xf = Transform.transformed(spark, sfDir)
    val nullS = lit(null).cast(StringType)
    val nullL = lit(null).cast(LongType)
    val a = Caches.assocState(xf).select(col("cache"), col("k"),
      nullS.as("a"), col("v"), col("t"), nullL.as("cnt"), nullL.as("rn"))
    val l = Caches.lastnState(xf).select(col("cache"), col("k"),
      nullS.as("a"), col("v"), col("t"), nullL.as("cnt"), col("rn"))
    val c = Caches.countState(xf).select(col("cache"), col("s").as("k"),
      col("a"), col("o").as("v"), col("last_t").as("t"), col("cnt"),
      nullL.as("rn"))
    val kc = Caches.keycountState(xf).select(col("cache"), col("k"),
      nullS.as("a"), nullL.as("v"), nullL.as("t"), col("cnt"),
      nullL.as("rn"))
    val want = a.unionAll(l).unionAll(c).unionAll(kc)
      .orderBy(col("cache"), col("k"), col("a"), col("rn"), col("v"))
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("a rule targeting an undeclared cache is rejected") {
    val bad = "cache c1 assoc\nview -> c1(s,o), nowhere(s,o)"
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(bad))
    assert(e.getMessage.contains("nowhere"))
  }

  test("an unknown cache kind is rejected at build, like the reference assert") {
    val bad = "cache c1 bogus\nview -> c1(s,o)"
    val e = intercept[IllegalArgumentException](
      Pipeline.fromConfig(spark, sfDir, bad))
    assert(e.getMessage.contains("bogus"))
  }

  test("extensible registry: a custom cache kind plugs in") {
    // kind "valsum": sum of routed values per key - the analog of the
    // config registering ->KeyCountCache under :cache-factory-fns
    val valsum: CacheRegistry.Factory = (xf, caches, _) =>
      xf.filter(col("cache").isin(caches: _*))
        .groupBy(col("cache"), col("k"))
        .agg(sum(col("v")).as("cnt"))
        .select(col("cache"), col("k"),
          lit(null).cast(StringType).as("a"),
          lit(null).cast(LongType).as("v"),
          lit(null).cast(LongType).as("t"), col("cnt"),
          lit(null).cast(LongType).as("rn"))
    val cfgText =
      """cache view-sums valsum
        |view -> view-sums(s,o)
        |""".stripMargin
    val got = Pipeline.fromConfig(spark, sfDir, cfgText,
        Map("valsum" -> valsum)).collect()
    assert(got.nonEmpty)
    val expect = Transform.transformed(spark, sfDir,
        PipelineConfig.parse(cfgText).rules)
      .groupBy(col("k")).agg(sum(col("v")).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(r.getString(0) == "view-sums")
      assert(expect(r.getLong(1)) == r.getLong(5))
    }
  }
}
