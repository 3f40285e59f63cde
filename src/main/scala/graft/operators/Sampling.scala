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
}
