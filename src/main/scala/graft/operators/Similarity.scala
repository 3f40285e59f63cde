package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>): exact
  * brute-force cosine top-k as the baseline, and random-hyperplane LSH
  * bucketing (Charikar 2002) as the scale path — candidates come from
  * one bucket-equality shuffle instead of a full scan, then get
  * re-ranked with the exact metric.
  *
  * Bucketing/dot composition is native Catalyst (`zip_with` +
  * `aggregate`); the per-pair re-rank uses a fused JVM kernel
  * (higher-order functions evaluate interpreted, so the one-call
  * kernel wins on the hot path — see SCALING.md).
  */
object Similarity {

  /** Σ aᵢbᵢ over two double arrays — native. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused cosine kernel. Same arithmetic order as [[cosine]]
    * (pairwise double ops, left-to-right) so results are bit-identical;
    * one JVM call per pair instead of three interpreted HOF chains —
    * the ANN re-rank hot path at scale. */
  private[graft] def cosineOf(a: Seq[Double], b: Seq[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    // zero-norm guard: NaN sorts as the LARGEST double in Spark, so a
    // degenerate all-zero vector would otherwise capture top-k slots;
    // cosine 0 ranks it last instead.
    if (denom == 0.0) 0.0 else d / denom
  }

  private val cosineUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
    if (a == null || b == null) null.asInstanceOf[java.lang.Double]
    else java.lang.Double.valueOf(cosineOf(a, b))
  }

  /** Cosine via the fused kernel (use in per-pair re-rank loops). */
  def cosineFast(a: Column, b: Column): Column = cosineUdf(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k against a query vector (one scan, per-partition
    * top-k via TakeOrderedAndProject — no global sort). Ties broken by
    * id for determinism. */
  def topKBruteForce(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = typedlit(query)
    df.select(col(idCol), cosineFast(asDouble(col(vecCol)), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (seeded) for sign-bit bucketing. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id of a vector against the given planes — native:
    * bucket = Σ 2ᵖ·[v·planeₚ ≥ 0]. */
  def bucketOf(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) >= 0, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** Add the LSH bucket column (this is what you'd partition/bucket the
    * table by at 100 TB so same-bucket rows co-locate). */
  def withBucket(df: DataFrame, vecCol: String,
                 planes: Seq[Seq[Double]]): DataFrame =
    df.withColumn("bucket", bucketOf(asDouble(col(vecCol)), planes))

  /** One bucket column per LSH table (`bucket_0..bucket_{T-1}`), each
    * from its own seeded plane set. Multi-TABLE is the recall lever
    * that scales: probing Hamming<=r of ONE table's bucket caps recall
    * by that table's planes, while T independent tables multiply the
    * miss probability down (a vector is a candidate if ANY table
    * agrees with the query) at T× the bucket-read cost. At 100 TB each
    * table is a partition-pruned read of its own bucket-keyed layout;
    * locally the same predicate runs as one scan — identical
    * semantics, measured in SCALING.md. */
  def withBuckets(df: DataFrame, vecCol: String,
                  tables: Seq[Seq[Seq[Double]]]): DataFrame =
    tables.zipWithIndex.foldLeft(df) { case (d, (planes, t)) =>
      d.withColumn(s"bucket_$t", bucketOf(asDouble(col(vecCol)), planes))
    }

  /** Seeded plane sets for `numTables` independent LSH tables. */
  def hyperplaneTables(dim: Int, numPlanes: Int, numTables: Int,
                       seed: Long = 42L): Seq[Seq[Seq[Double]]] =
    (0 until numTables).map(t => hyperplanes(dim, numPlanes, seed + 1000L * t))

  /** LSH-accelerated top-k: scan only the query's bucket (plus, with
    * `multiProbe` > 0, every bucket within that Hamming distance of it
    * — the standard recall knob: flipping the least-confident sign
    * bits costs a few more bucket reads instead of more tables).
    * Exact re-rank inside the probed buckets. */
  def topKLsh(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, numPlanes: Int = 8,
              multiProbe: Int = 0): DataFrame = {
    val planes = hyperplanes(query.length, numPlanes)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d >= 0) 1 << i else 0
    }.sum
    val probed: Seq[Int] = (0 to (1 << numPlanes) - 1)
      .filter(b => java.lang.Integer.bitCount(b ^ qBucket) <= multiProbe)
    withBucket(df, vecCol, planes)
      .filter(col("bucket").isin(probed: _*))
      .select(col(idCol), cosineFast(asDouble(col(vecCol)), typedlit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs that
    * share a bucket AND pass the exact cosine threshold. One groupBy
    * shuffle on the bucket key; in-bucket pairs are enumerated
    * imperatively per group (`flatMapGroups` — the justified last-
    * resort tier here: the declarative pair-expansion materialized
    * every candidate pair WITH both vectors (~1 KB each) before the
    * threshold filter, ~8 MB per bucket of pure allocation; the loop
    * emits only survivors). Each vector sits in exactly one bucket, so
    * pairs are already unique. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double = 0.95, numPlanes: Int = 8,
                   dim: Int = 64, maxBucket: Int = 4096): DataFrame = {
    val planes = hyperplanes(dim, numPlanes)
    val spark = df.sparkSession
    import spark.implicits._
    withBucket(df, vecCol, planes)
      .select(col("bucket"), col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.take(maxBucket + 1).map { case (_, id, v) => (id, v.toArray) }.toArray
        if (members.length < 2 || members.length > maxBucket) Iterator.empty
        else {
          java.util.Arrays.sort(members, Ordering.by((m: (Long, Array[Double])) => m._1))
          for {
            i <- members.indices.iterator
            j <- (i + 1 until members.length).iterator
            cos = cosineOf(members(i)._2, members(j)._2)
            if cos >= threshold
          } yield (members(i)._1, members(j)._1, cos)
        }
      }
      .toDF("id_a", "id_b", "cos")
  }
}
