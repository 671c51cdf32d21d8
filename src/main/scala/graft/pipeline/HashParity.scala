package graft.pipeline

/** Builders for hash expressions that are bit-identical between Spark
  * SQL and DuckDB SQL. Strategy: both engines produce the same lowercase
  * md5 hex; a 48-bit integer is assembled from the first 12 nibbles via
  * position lookup in '0123456789abcdef' (no engine-native hash() or
  * hex-parse, which differ). 48 bits keeps every downstream product
  * (`a*h+b` with a < 2^13) inside signed-64 range on both engines.
  */
object HashParity {

  /** Mersenne-ish modulus for minhash permutations (< 2^53). */
  val P = 9007199254740881L

  def permA(i: Int): Long = 2L * i + 1
  def permB(i: Int): Long = 104729L * i + 12345L

  private def nibble(strposFn: String, h: String, pos: Int): String =
    s"($strposFn('0123456789abcdef', ${sub(strposFn, h, pos)}) - 1)"

  private def sub(strposFn: String, h: String, pos: Int): String =
    if (strposFn == "instr") s"substring($h, $pos, 1)"
    else s"substr($h, $pos, 1)"

  /** 48-bit BIGINT from the first 12 hex chars of string expression `h`
    * (typically `md5(...)`). Horner form, BIGINT from the first step.
    */
  private def hex48(strposFn: String)(h: String): String =
    (2 to 12).foldLeft(s"CAST(${nibble(strposFn, h, 1)} AS BIGINT)") {
      (acc, p) => s"($acc * 16 + ${nibble(strposFn, h, p)})"
    }

  def hex48Spark(h: String): String = hex48("instr")(h)
  def hex48Duck(h: String): String = hex48("strpos")(h)

  /** Deterministic md5 (lowercase hex), for precomputing literal
    * constants (e.g. LSH hyperplane signs) in Scala that agree with
    * what md5() would produce in either engine.
    */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
}
