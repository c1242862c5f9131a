package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins.
  *
  * When one join key carries a disproportionate share of rows (the
  * classic hot-key problem at 100 TB), the shuffle partition holding it
  * becomes a straggler. AQE's skew-join handles most cases at runtime;
  * this helper is the explicit fallback for pathological skew or for
  * engines/paths where AQE can't split (e.g. bucketed reads).
  *
  * Mechanics: the skewed (big) side gets a deterministic per-row salt
  * in [0, n); the small side is replicated n ways with every salt
  * value. The join key becomes (key, salt) — the hot key's rows now
  * spread across n partitions. Cost: small side inflated ×n, so salt
  * only as much as the skew requires.
  */
object Skew {

  /** Salted inner equi-join: `big ⋈ small ON bigKey = smallKey`,
    * with the hot-key shuffle spread over `salt` partitions.
    * Result is row-identical to the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // per-row salt from the row's position, not its content: salting
    // by key hash would put each key back in one partition, and
    // salting by whole-row hash fails on byte-identical duplicate rows
    // (the most common hot-key pathology — replayed logs, default
    // records). monotonically_increasing_id is unique per row, so
    // duplicates spread evenly; the join result never depends on WHICH
    // salt a row gets (the small side carries every salt), so the
    // id's layout-dependence is harmless.
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS,
        bigS(bigKey) === smallS(smallKey) && bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }
}
