package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog — mergeable distinct-count state for the
  * incremental corpus card (Flajolet, Fusy, Gandouet, Meunier 2007).
  *
  * Spark's own `approx_count_distinct` is an HLL++ whose binary state
  * never leaves the aggregation — it cannot be persisted per slice and
  * folded in later, which is exactly what the [[StatsLedger]]
  * incremental-card story needs for its one non-algebraic aggregate
  * (distinct counts). This implementation keeps the HLL REGISTER TABLE
  * as plain rows `(key, bucket, m)`:
  *   - per-slice registers are one map-side-combined `groupBy` max —
  *     a shuffle of at most |keys|·64 rows regardless of input size;
  *   - merging slices/ledgers is `max` over the union — associative,
  *     commutative, idempotent (re-folding a slice is harmless, the
  *     same crash-tolerance the funnel's verdict ledgers lean on);
  *   - the estimate is a 64-row-per-key read-time fold.
  *
  * Every step is deterministic and integer-exact until one final fixed
  * expression tree of IEEE double ops, so the DuckDB oracle replays it
  * bit-for-bit (the q51/BM25 nano-rounding discipline):
  *   hash   = first 15 hex chars of md5(text) parsed as a 60-bit
  *            non-negative BIGINT (both engines print identical md5
  *            hex; 15 nibbles keeps the parse positive);
  *   bucket = h & 63                      (m = 64 registers);
  *   w      = h div 64                    (the remaining 54 bits);
  *   rho    = 55 − bitlength(w), w=0 → 55 (leading-zero rank, clamped
  *            by construction to [1, 55]);
  *   S      = Σ_buckets 2^(55−M[j]), empty registers contribute 2^55
  *            (integer-scaled harmonic sum: max 63·2^55 + 2^54 < 2^63,
  *            so the sum is exact in BIGINT);
  *   est    = α₆₄·m²·2^55 / S in ONE double division of exactly-equal
  *            integer operands, then micro-rounded to BIGINT.
  * The α₆₄·m²·2^55 numerator is folded to a single double literal in
  * Scala and rendered into both engines via Double.toString (which
  * round-trips), so there is no cross-engine arithmetic-order risk.
  * The standard small/large-range corrections use ln() — transcendental,
  * 1 ulp apart between fdlibm and libm (the measured BM25 case) — so
  * this is the RAW estimator, documented: fine for ledger-scale
  * cardinalities (ratio error ~1.04/√64 ≈ 13%), and the bias regime
  * (n ≲ 2.5·m = 160) is far below any real per-source corpus count.
  */
object Sketch {

  val HllBuckets = 64
  /** α₆₄ · 64² · 2^55 as one double literal (see class doc). */
  val HllNumerator: Double = 0.709 * 4096.0 * 3.6028797018963968e16
  private val TwoPow55 = 36028797018963968L

  /** 60-bit non-negative hash with an exact DuckDB replay:
    * `CAST('0x' || substr(md5(text),1,15) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(coalesce(c, lit("")).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Per-key HLL register table `(key, bucket, m)` — the persistable,
    * mergeable sketch state. */
  def hllRegisters(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val h = hash60(col(valCol))
    df.select(col(keyCol).as("key"), h.as("h"))
      .select(col("key"),
        col("h").bitwiseAND(lit(63L)).as("bucket"),
        expr("h div 64").as("w"))
      .select(col("key"), col("bucket"),
        when(col("w") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("w"))).cast("long")).as("rho"))
      .groupBy(col("key"), col("bucket"))
      .agg(max(col("rho")).as("m"))
  }

  /** Merge register ledgers: max over the union — associative,
    * commutative, idempotent. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("key"), col("bucket"))
      .agg(max(col("m")).as("m"))

  /** Collapse many register partial rows into one ledger. */
  def hllFold(partials: DataFrame): DataFrame =
    partials.groupBy(col("key"), col("bucket")).agg(max(col("m")).as("m"))

  /** Read-time estimate from a register ledger: `(key, n_buckets,
    * est_q)` with `est_q` the raw HLL estimate in micro-units. */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_buckets"),
        (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m AS INT))"))
          + (lit(64L) - count(lit(1))) * lit(TwoPow55)).as("S"))
      .select(col("key"), col("n_buckets"),
        floor(lit(HllNumerator) / col("S").cast("double") * lit(1000000.0)
          + lit(0.5)).cast("long").as("est_q"))

  /** Sketch-and-estimate in one call (the non-incremental read). */
  def hllDistinct(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    hllEstimate(hllRegisters(df, keyCol, valCol))

  // ---- bottom-k uniform sample ledger -------------------------------
  // The last member of the incremental corpus-card family (moments
  // q103, distinct q104, quantile bands q105, heavy hitters q106):
  // maintain a UNIFORM random sample of each key's documents as the
  // corpus grows, without rescans — the bottom-k sketch of Cohen &
  // Kaplan 2007. Each row gets a deterministic hash priority; the
  // ledger keeps the k smallest priorities per key. Unlike the top-k
  // count ledger, the fold here is EXACT, not a lower bound: the
  // global bottom-k rows are each bottom-k within their own slice, so
  // (union of slice ledgers) re-truncated IS the full-data bottom-k,
  // bit for bit — which is why the q107 oracle replays the FULL-data
  // sample with no knowledge of the slicing. Because the priority is
  // a fixed hash of the id, the sample is also STABLE: re-ingesting a
  // slice, reordering batches, or recomputing from scratch all land
  // the same sample (the crash-idempotence the funnel ledgers want).

  /** Deterministic sample priority for an id — [[hash60]] of the
    * domain-tagged id string, replayable as
    * `CAST('0x' || substr(md5('sample:' || CAST(id AS VARCHAR)),1,15) AS BIGINT)`. */
  def samplePriority(idc: Column): Column =
    hash60(concat(lit("sample:"), idc.cast("string")))

  /** Sample ledger `(key, h, id)`: the k smallest priorities per key,
    * ties (md5 collisions) broken by id. */
  def sampleLedger(df: DataFrame, keyCol: String, idCol: String,
                   k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("h").asc, col("id").asc)
    df.select(col(keyCol).as("key"), col(idCol).as("id"))
      .withColumn("h", samplePriority(col("id")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Merge sample ledgers: union, re-truncate to bottom-k. Exact,
    * associative, commutative, idempotent (see section doc). */
  def sampleMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("h").asc, col("id").asc)
    a.unionByName(b).dropDuplicates("key", "id")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Ranked read of a sample ledger. */
  def sampleRead(ledger: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("h").asc, col("id").asc)
    ledger.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("key"), col("rank"), col("id"), col("h"))
  }

  // ---- KMV distinct SET OPERATIONS -----------------------------------
  // The k-minimum-values sketch (Beyer et al. 2007) keeps the k
  // smallest DISTINCT value hashes per key. Its fold is exact like the
  // sample ledger's (bottom-k of a union = re-truncated union of
  // bottom-k's), but it buys what the HLL registers above cannot:
  // SET-OPERATION cardinalities. For keys A and B,
  //   K(A∪B) = merge of the two ledgers (exact bottom-k of the union),
  //   Ĵ      = |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)|   (unbiased Jaccard),
  //   |A∪B|  ≈ (k−1)·2⁶⁰ / h₍ₖ₎, exact count when the ledger is short,
  //   |A∩B|  ≈ Ĵ · |A∪B|.
  // Everything is integer until one fixed tree of double ops per
  // output column, so the DuckDB oracle replays it bit-for-bit. The
  // (k−1)·2⁶⁰ numerator is a small-integer × power-of-two — exactly
  // representable as one double literal, the HllNumerator discipline.

  /** KMV ledger `(key, h)`: the k smallest distinct [[hash60]] values
    * per key — persistable, mergeable sketch state. */
  def kmvLedger(df: DataFrame, keyCol: String, valCol: String,
                k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("h").asc)
    df.select(col(keyCol).as("key"), hash60(col(valCol)).as("h"))
      .dropDuplicates("key", "h")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Merge KMV ledgers: distinct union, re-truncate to bottom-k.
    * Exact, associative, commutative, idempotent. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("h").asc)
    a.unionByName(b).dropDuplicates("key", "h")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Pairwise set-operation estimates across every pair of keys in a
    * KMV ledger: `(key_a, key_b, ku, n_both, union_est_micro,
    * jac_micro, inter_est_micro)`. The pair table and the per-pair
    * work are KEY-DOMAIN-sized (ledgers are ≤ k rows per key), so
    * this is a report over sketch state, never a corpus scan. */
  def kmvPairwise(ledger: DataFrame, k: Int): DataFrame = {
    val keys = ledger.select(col("key")).distinct()
    val pairs = keys.as("x").crossJoin(keys.as("y"))
      .filter(col("x.key") < col("y.key"))
      .select(col("x.key").as("key_a"), col("y.key").as("key_b"))
    // each pair gathers both members' ledger rows; one row per
    // distinct hash with membership flags
    val rows = broadcast(pairs).join(ledger.as("l"),
        col("l.key") === col("key_a") || col("l.key") === col("key_b"))
      .groupBy(col("key_a"), col("key_b"), col("h"))
      .agg(
        max(when(col("l.key") === col("key_a"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("l.key") === col("key_b"), 1L).otherwise(0L)).as("in_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key_a"), col("key_b")).orderBy(col("h").asc)
    val topk = rows.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    // (k−1)·2⁶⁰ exactly, as one double literal (class doc)
    val kmvNum = (k - 1).toDouble * 1.152921504606847e18
    val uDouble = when(col("ku") < k, col("ku").cast("double"))
      .otherwise(lit(kmvNum) / col("hk").cast("double"))
    topk.groupBy(col("key_a"), col("key_b"))
      .agg(
        count(lit(1)).as("ku"),
        max(col("h")).as("hk"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
          .otherwise(0L)).as("n_both"))
      .select(col("key_a"), col("key_b"), col("ku"), col("n_both"),
        floor(uDouble * 1e6 + 0.5).cast("long").as("union_est_micro"),
        floor(col("n_both").cast("double") / col("ku").cast("double")
          * 1e6 + 0.5).cast("long").as("jac_micro"),
        floor(col("n_both").cast("double") / col("ku").cast("double")
          * uDouble * 1e6 + 0.5).cast("long").as("inter_est_micro"))
  }
}
