package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Batch "record" stage: the final state of each reference cache type,
  * re-expressed as a declarative aggregation instead of per-event map
  * mutation. Each state is exactly one shuffle (keyed on the cache key)
  * with map-side partial aggregation - the shape that survives a 100 TB
  * scale-up.
  *
  * Reference: /root/reference/src-clj/streamsum/caches.clj.
  */
object Caches {

  /** AssociativeCache (caches.clj:28): last write per key wins. The
    * "last" order is (t, seq) - event time then arrival order, ≙ the
    * reference's single-threaded queue order.
    * One hash aggregate: max over a (t, seq, v) struct; no global sort.
    */
  def assocState(xf: DataFrame,
                 caches: Seq[String] = Config.cachesOf(Assoc)): DataFrame =
    xf.filter(col("cache").isin(caches: _*))
      .groupBy(col("cache"), col("k"))
      .agg(max(struct(col("t"), col("seq"), col("v"))).as("m"))
      .select(col("cache"), col("k"), col("m.v").as("v"), col("m.t").as("t"))

  /** LastNCache (caches.clj:55): ring buffer of the last N values per
    * key. Exposed exploded with a recency rank (rn=1 newest) so the
    * result is flat-relational and oracle-comparable. Single shuffle on
    * (cache, k); rank + filter is a bounded per-key sort.
    */
  def lastnState(xf: DataFrame, n: Int = Config.lastNSize,
                 caches: Seq[String] = Config.cachesOf(LastN)): DataFrame = {
    val w = Window.partitionBy(col("cache"), col("k"))
      .orderBy(col("t").desc, col("seq").desc)
    xf.filter(col("cache").isin(caches: _*))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= n)
      .select(col("cache"), col("k"), col("v"), col("t"), col("rn"))
  }

  /** CountCache (caches.clj:81) + tuple_counts/update.clj `inc-count!`:
    * per [subject action object]: occurrence count + most recent
    * timestamp. GroupBy with map-side combine - the canonical
    * shuffle-minimal count.
    */
  def countState(xf: DataFrame,
                 caches: Seq[String] = Config.cachesOf(CountK)): DataFrame =
    xf.filter(col("cache").isin(caches: _*))
      .groupBy(col("cache"), col("k").as("s"), col("a"), col("v").as("o"))
      .agg(count(lit(1)).as("cnt"), max(col("t")).as("last_t"))

  /** Extended cache type ≙ the example config's KeyCountCache
    * (example/streamsum/config.clj): number of updates per key across
    * the whole transformed tuple stream.
    */
  def keycountState(xf: DataFrame,
                    cacheName: String = "subject-counts"): DataFrame =
    xf.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit(cacheName).as("cache"), col("k"), col("cnt"))

  /** undoUpdate semantics for the count cache with the reference's
    * EXACT floor-at-each-step behavior (tuple_counts/update.clj
    * `dec-count!`: decrement only while positive, at the moment the
    * retraction arrives - NOT a clamped net sum). A sequential mutable
    * walk becomes one window pass via the clamped-walk identity:
    *
    *   final = S_n - min(0, min_k S_k)   (S_k = running delta sum)
    *
    * `purchase` increments (s,'buy',o); `click` decrements. Keys never
    * incremented don't exist (dec-count! on a missing subject is a
    * no-op returning nil); the timestamp tracks increments only
    * (dec-count! ignores its timestamp).
    */
  def undoCountState(tuples: DataFrame): DataFrame = {
    val deltas = tuples
      .filter(col("p").isin("purchase", "click"))
      .select(col("s"), lit("buy").as("a"), col("o"),
        when(col("p") === "purchase", 1L).otherwise(-1L).as("delta"),
        col("t"), col("seq"))
    val w = Window.partitionBy(col("s"), col("o"))
      .orderBy(col("t"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("running", sum(col("delta")).over(w))
      .groupBy(col("s"), col("a"), col("o"))
      .agg(sum(col("delta")).as("total"),
        min(col("running")).as("min_run"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_inc"),
        max(when(col("delta") === 1L, col("t"))).as("last_t"))
      .filter(col("n_inc") >= 1L)
      .select(col("s"), col("a"), col("o"),
        (col("total") - least(lit(0L), col("min_run"))).as("cnt"),
        col("last_t"))
  }

  /** undoUpdate semantics for the LastN cache (caches.clj:69-73): a
    * retraction rebuilds the ring buffer with every occurrence of the
    * value removed - `(into (ring-buffer n) (filter #(not= v %) buf))` -
    * while updates conj with capacity-n eviction. The interplay of
    * eviction and retraction makes the per-key fold inherently
    * sequential (a value evicted by capacity cannot be resurrected by
    * a later retraction of its neighbors), so it runs as ONE
    * `aggregate` HOF over the key's chronologically sorted ops: one
    * shuffle on the key, per-key state bounded by n, no driver
    * involvement. `view` events append (k=s, v=o); `click` events
    * retract (s, o), mirroring LastNCache.undoUpdate.
    * Output: (cache, k, rn, v), rn=1 newest, ≙ lastnState's exposure.
    */
  def undoLastnState(tuples: DataFrame,
                     n: Int = Config.lastNSize): DataFrame = {
    val ops = tuples.filter(col("p").isin("view", "click"))
      .select(col("s").as("k"),
        when(col("p") === "view", lit("add")).otherwise(lit("del")).as("op"),
        col("o").as("v"), col("t"), col("seq"))
    ops.groupBy(col("k"))
      .agg(array_sort(collect_list(
        struct(col("t"), col("seq"), col("op"), col("v")))).as("evs"))
      .withColumn("buf", expr(
        s"""aggregate(evs, CAST(array() AS ARRAY<BIGINT>),
           |  (acc, e) -> CASE WHEN e.op = 'add'
           |    THEN slice(concat(acc, array(e.v)),
           |               greatest(1, size(acc) + 2 - $n),
           |               least(size(acc) + 1, $n))
           |    ELSE filter(acc, x -> x != e.v) END)""".stripMargin))
      .select(lit("view-user-obj").as("cache"), col("k"), col("buf"),
        posexplode(col("buf")))
      .select(col("cache"), col("k"),
        (size(col("buf")) - col("pos")).cast(LongType).as("rn"),
        col("col").as("v"))
  }

  /** undoUpdate semantics for the associative cache (caches.clj:37):
    * a retraction puts nil for the key; last operation wins. Here
    * `error` events retract the `signup-obj-user` entry for their
    * object, mirroring AssociativeCache.undoUpdate. Keys only ever
    * touched by a retraction surface with a null value, exactly like
    * the reference's `.put(key, nil)`.
    */
  def undoAssocState(tuples: DataFrame): DataFrame = {
    val ops = tuples.filter(col("p") === "signup")
      .select(col("o").as("k"), col("s").as("v"), col("t"), col("seq"))
      .unionAll(
        tuples.filter(col("p") === "error")
          .select(col("o").as("k"), lit(null).cast(LongType).as("v"),
                  col("t"), col("seq")))
    ops.groupBy(col("k"))
      .agg(max(struct(col("t"), col("seq"), col("v"))).as("m"))
      .select(lit("signup-obj-user").as("cache"), col("k"),
              col("m.v").as("v"), col("m.t").as("t"))
  }
}
