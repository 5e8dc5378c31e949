package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's cross-engine stable-hash recipe, defined ONCE: 48-bit
  * md5-prefix hash of a value's string form. Used as the randomness source
  * for splits/sampling and the KMV sketch; 48 bits keep the value exactly
  * representable in a double (2^48 < 2^53), which the KMV estimate relies
  * on. The DuckDB twin is [[sql48]] — any change here must change both or
  * engine and oracle silently diverge (Dedup.stableHash is the separate
  * 60-bit variant used for SimHash parity).
  */
object StableHash {

  /** 48-bit stable hash of a column's string form. */
  def h48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** DuckDB SQL twin of [[h48]]. */
  def sql48(expr: String): String =
    s"CAST(('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 12)) AS BIGINT)"
}
