package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data
  * pipelines. RNG-based `sample()` is irreproducible across engines,
  * partitionings and reruns; hashing a stable id into buckets gives
  * splits that are (a) exactly reproducible anywhere md5 exists,
  * (b) stable under repartitioning/scale-up, and (c) disjoint by
  * construction — the standard train/test-split discipline at corpus
  * scale. Selectivity is uniform because md5 is; the modulus bounds
  * the granularity (1/1000 here).
  */
object Sampling {

  private val Buckets = 1000

  /** Stable bucket in [0, 1000) from the row's id. */
  def bucketOf(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long") % Buckets

  /** Keep ~`permille`/1000 of rows, deterministically by id. */
  def samplePermille(df: DataFrame, idCol: String, permille: Int): DataFrame =
    df.filter(bucketOf(col(idCol)) < permille)

  /** Disjoint deterministic split: (train, heldOut) where heldOut is
    * ~`heldOutPermille`/1000 of rows. Union = input; intersection = ∅. */
  def split(df: DataFrame, idCol: String, heldOutPermille: Int): (DataFrame, DataFrame) =
    (df.filter(bucketOf(col(idCol)) >= heldOutPermille),
     df.filter(bucketOf(col(idCol)) < heldOutPermille))

  /** Per-stratum deterministic rates: keep rows whose bucket falls
    * under their stratum's permille (unlisted strata drop). */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 permilleByStratum: Map[String, Int]): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucketOf(col(idCol)) < rate)
  }

  /** Epoch-aware deterministic upsampling — the mixing step that
    * repeats under-represented strata (a curated source run for 2.6
    * epochs while web data runs once). Factors are permille: 2600 =
    * 2.6 epochs. Each row emits floor(factor) full copies plus one
    * more iff hash(id, epoch) falls under the fractional part — no
    * RNG, so the result is bit-reproducible across engines, reruns
    * and repartitionings, and each doc's "extra" copy is an
    * independent coin rather than a corpus-wide stripe. Unlisted
    * strata drop (factor 0).
    *
    * Emits `epoch` (0-based copy index) and `shuffle_key` =
    * md5(id:epoch), so downstream training order is "sort by
    * shuffle_key" — a rangepartitioned sort at scale that scatters a
    * doc's repeats across the whole order instead of leaving them
    * adjacent.
    *
    * Scale shape: the row multiplication is an explode of a ≤
    * ⌈factor⌉-element sequence in the scan projection — zero
    * shuffles, zero joins; output size is exactly the token budget
    * the mixture calls for. */
  def upsample(df: DataFrame, idCol: String, stratumCol: String,
               factorPermilleByStratum: Map[String, Int]): DataFrame = {
    require(factorPermilleByStratum.values.forall(_ >= 0),
      "upsample factors must be >= 0 permille")
    val factor = factorPermilleByStratum.foldLeft(lit(0)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val full = floor(factor.cast("double") / 1000.0).cast("int")
    val fracPermille = factor % 1000
    df.withColumn("epoch", explode(sequence(lit(0), full)))
      .withColumn("epoch", col("epoch").cast("long"))
      .withColumn("__key",
        concat(col(idCol).cast("string"), lit(":"), col("epoch").cast("string")))
      .filter(col("epoch") < full || bucketOf(col("__key")) < fracPermille)
      .withColumn("shuffle_key", md5(col("__key")))
      .drop("__key")
  }

  /** Per-group document cap — the domain-balancing step of web-corpus
    * pipelines (e.g. C4 / RefinedWeb keep at most N pages per host so
    * boilerplate-heavy domains can't dominate the mix). Keeps the top
    * `n` rows of each group under (orderCol desc, tiebreak asc) —
    * fully deterministic — and emits the 1-based `rank` kept.
    *
    * Scale shape: one shuffle on the group key, then a per-group sort
    * inside each partition (window rank + filter; sort spills, nothing
    * collects). A skewed mega-domain serializes into one task ONLY for
    * its own group — with AQE skew splitting unavailable for windows,
    * the escape hatch at 100 TB is a pre-pass partial top-n per
    * partition (groupBy + slice(array_sort(collect_list))) feeding the
    * same window, which bounds any task at partitions·n rows. That
    * pre-pass is cap-dependent, so it stays opt-in rather than default. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                  tiebreak: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(tiebreak))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Skew-safe [[capPerGroup]]: a partial top-n per (input-partition,
    * group) runs first, so the final per-group window receives at most
    * `partitions·n` rows for ANY group — a mega-domain that holds half
    * the corpus contributes n rows per scan partition instead of
    * serializing its entire membership into one window task. The
    * global top-n of a group is always contained in the union of its
    * per-partition top-ns, so results are identical (equivalence is
    * spec-tested). Costs one extra skew-FREE exchange on
    * (partition-id, group); worth it only when a group can exceed an
    * executor's sort budget — which is why it's a separate entry
    * point, not the default.
    *
    * REQUIRES `(orderCol, tiebreak)` to be a total order within each
    * group (in practice: `tiebreak` is a unique key, like `doc_id`).
    * With ties, both entry points keep SOME n rows with the same
    * `(orderCol, tiebreak)` prefix, but which tied row survives can
    * differ: the per-partition pre-pass ranks within a
    * nondeterministic `spark_partition_id` slice, so a tie broken one
    * way there may be broken the other way by the single global
    * window. The equivalence spec covers the unique-tiebreak case
    * only — with a non-unique tiebreak this function is still a
    * correct top-n-per-group, just not row-identical to
    * [[capPerGroup]]. */
  def capPerGroupSkewSafe(df: DataFrame, groupCol: String, orderCol: String,
                          tiebreak: String, n: Int): DataFrame = {
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col(groupCol))
      .orderBy(col(orderCol).desc, col(tiebreak))
    val survivors = df.withColumn("__pid", spark_partition_id())
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= n)
      .drop("__r", "__pid")
    capPerGroup(survivors, groupCol, orderCol, tiebreak, n)
  }
}
