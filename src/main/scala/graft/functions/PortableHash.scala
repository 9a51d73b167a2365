package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A seeded polynomial string hash expressible IDENTICALLY in Spark Column
  * arithmetic, plain Scala, and DuckDB SQL — used by the hash-seeded
  * pipeline operators (SimHash, winnowing fingerprints) so their driver
  * queries are hash-verifiable against the DuckDB oracle (xxhash64 has no
  * DuckDB twin).
  *
  * h = fold chars: h ← (h·31 + codepoint) mod p,  p = 2^31−1, from `seed`.
  * Every intermediate stays < 2^36, so 64-bit arithmetic never overflows in
  * either engine (DuckDB BIGINT overflow is an error, not a wrap). Output
  * is a 31-bit value; callers needing more bits combine two seeds.
  */
object PortableHash {

  val P: Long = (1L << 31) - 1

  /** Column form (codegen'd: split/filter/aggregate/ascii — no UDF). */
  def hash(s: Column, seed: Long): Column =
    aggregate(
      filter(split(s, ""), c => c =!= lit("")),
      lit(seed),
      (acc, c) => pmod(acc * lit(31L) + ascii(c), lit(P)))

  /** Scala twin (property-tested equal to the Column form). Iterates CODE
    * POINTS, not UTF-16 units — Spark's `ascii` and DuckDB's `unicode` are
    * both code-point functions, so surrogate pairs must hash as one step. */
  def hash(s: String, seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** DuckDB SQL twin over an expression yielding VARCHAR. */
  def sql(expr: String, seed: Long): String =
    s"list_reduce(list_prepend($seed::BIGINT, " +
      s"list_transform(string_split($expr, ''), c -> unicode(c)::BIGINT)), " +
      s"(a, b) -> (a * 31 + b) % $P)"
}
