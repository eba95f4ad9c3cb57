package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text utilities beyond the oracle-checked query surface. */
object TextFunctions {

  /** Karp–Rabin-style rolling document fingerprint over words:
    * h = fold(h·B + code(w)) mod M, evaluated as a sequential left fold via
    * `aggregate` (deterministic order — higher-order fold, not a shuffle
    * aggregation). code(w) = murmur3(w) clamped to [0, M).
    *
    * Properties: equal word sequences ⇒ equal fingerprint; order-sensitive
    * (unlike the sorted-set md5 in q_fingerprint, which is the
    * order-insensitive twin).
    */
  // mod fits in 31 bits so h·base stays below 2^51 (ANSI mode overflow-checks
  // long arithmetic)
  def rollingHash(text: Column, base: Long = 1000003L, mod: Long = 2147483647L): Column = {
    val words = split(text, " ")
    aggregate(
      words,
      lit(0L),
      (h, w) => pmod(h * lit(base) + pmod(hash(w).cast("long"), lit(mod)), lit(mod)),
    )
  }
}
