package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (the 100 TB knobs the brief calls out):
  * salted two-phase aggregation, and broadcast-salted join for a
  * skewed probe side. AQE's skew-join splitting handles most cases at
  * runtime; these are the explicit forms for when the skew is known
  * (a handful of viral keys carrying 1000× the median).
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 groups on (key, salt) so a
    * hot key spreads over `numSalts` reducers; phase 2 merges partials
    * per key by SUMMING — so the aggs must be sum-decomposable
    * (count/sum; avg as sum+count). The salt is a deterministic hash
    * of the whole row (not rand()), so re-runs and retries agree.
    * Result is exactly `df.groupBy(key).agg(...)` — q35's oracle is
    * the UNSALTED SQL. */
  def saltedAgg(df: DataFrame, key: String, numSalts: Int,
                aggs: (String, Column)*): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(numSalts)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val merged = partial.groupBy(col(key))
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
    merged
  }

  /** Salted count per key — the common case. */
  def saltedCount(df: DataFrame, key: String, numSalts: Int = 16): DataFrame =
    saltedAgg(df, key, numSalts, "n" -> count(lit(1)))
      .withColumn("n", col("n").cast("long"))

  /** Salted equi-join for a skewed probe side: when `big`'s join key
    * is heavy-tailed (one viral key = one straggler reducer) and
    * `small` is too large for the broadcast budget in the real
    * deployment, replicate `small` `numSalts`× (one copy per salt),
    * tag each `big` row with a deterministic whole-row-hash salt, and
    * join on (key, salt) — the hot key's rows spread over `numSalts`
    * reducers. Inner join only (every big row finds its replicated
    * partner iff the key matches, so the result is EXACTLY
    * `big.join(small, key)` — q121's oracle is the unsalted SQL).
    * Cost: `small` shuffles `numSalts`× — the knob trades replication
    * for straggler elimination, same arithmetic as saltedAgg's
    * partial duplication. The salt is a hash, not rand(): retries and
    * re-runs agree row-for-row. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 numSalts: Int = 16): DataFrame = {
    val b = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(numSalts)))
    val s = small.withColumn("__salt",
      explode(array((0 until numSalts).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
