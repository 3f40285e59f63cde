package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Analyzer

/** Near-duplicate detection for corpus-scale dedup: MinHash+LSH,
  * SimHash, and n-gram Jaccard (the standard pretraining-dedup stack:
  * Broder 1997 resemblance/minwise hashing; Charikar 2002 simhash;
  * Leskovec–Rajaraman–Ullman ch.3 banding).
  *
  * Scale design: every variant is candidate-generation (explode a few
  * small keys per doc → hash-shuffle on the key → within-bucket pairs)
  * followed by exact verification on the candidates only. Nothing is
  * O(n²) in the corpus; the only quadratic term is within-bucket, which
  * banding keeps tiny. Signatures are UDF-computed (pure JVM, one pass
  * per doc); all joins/verification are native Catalyst.
  */
object DedupApprox {

  // ---- shingling (native) ---------------------------------------------

  /** Word n-gram shingles as a distinct array (native sliding window:
    * transform over an index sequence + slice). */
  def shingles(text: Column, n: Int): Column = {
    val toks = Analyzer.tokenize(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks))))
  }

  // ---- MinHash ---------------------------------------------------------

  private val MersennePrime = (1L << 61) - 1

  /** Deterministic (a,b) permutation params, seeded — same across runs
    * and executors. */
  private def perms(numHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numHashes)(
      (math.abs(rnd.nextLong()) % MersennePrime + 1,
       math.abs(rnd.nextLong()) % MersennePrime))
  }

  private def minhashUdf(numHashes: Int) = {
    val ps = perms(numHashes)
    udf { (sh: Seq[String]) =>
      if (sh == null || sh.isEmpty) Array.fill(numHashes)(Long.MaxValue)
      else {
        val out = Array.fill(numHashes)(Long.MaxValue)
        sh.foreach { s =>
          val h = scala.util.hashing.MurmurHash3.stringHash(s).toLong & 0xffffffffL
          var i = 0
          while (i < numHashes) {
            val v = (ps(i)._1 * h + ps(i)._2) % MersennePrime
            if (v < out(i)) out(i) = v
            i += 1
          }
        }
        out
      }
    }
  }

  /** doc → (id, shingles, minhash signature). */
  def withMinhash(df: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, numHashes: Int = 64): DataFrame =
    df.select(col(idCol), shingles(col(textCol), shingleN).as("shingles"))
      .withColumn("sig", minhashUdf(numHashes)(col("shingles")))

  /** MinHash+LSH candidate pairs verified by exact Jaccard.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    * bands*rowsPerBand must equal numHashes. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigs = withMinhash(df, idCol, textCol, shingleN, numHashes)
    // band key = (band index, hash of the band's signature slice)
    val banded = sigs.select(col(idCol), col("shingles"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.select(col(idCol).as("id_a"), col("shingles").as("sh_a"),
      col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("shingles").as("sh_b"),
      col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash ---------------------------------------------------------

  private val simhashUdf = udf { (toks: Seq[String]) =>
    if (toks == null || toks.isEmpty) 0L
    else {
      val acc = new Array[Int](64)
      toks.foreach { t =>
        val h1 = scala.util.hashing.MurmurHash3.stringHash(t)
        val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      var sig = 0L
      var i = 0
      while (i < 64) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
      sig
    }
  }

  /** doc → 64-bit simhash of its token multiset. */
  def withSimhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simhashUdf(Analyzer.tokenize(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Pigeonhole banding: split the 64-bit sig into `chunks` pieces; any
    * pair within distance maxHamming (< chunks) shares at least one
    * exact chunk → join per chunk, verify with native bit_count(xor). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    val bits = 64 / chunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val sigs = withSimhash(df, idCol, textCol)
    val banded = sigs.select(col(idCol), col("simhash"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("simhash"), c * bits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sig_a"),
      col("chunk"), col("chunk_val"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("sig_b"),
      col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- exact n-gram Jaccard (inverted-index join, no signatures) ------

  /** All-pairs n-gram Jaccard >= threshold via an inverted-index join:
    * explode ngrams → pair counts per shared ngram → |A∩B| from the
    * group size, |A∪B| = |A|+|B|−|A∩B|. Exact, but the join fan-out is
    * bounded by ngram document frequency — at corpus scale, drop
    * ultra-common ngrams first (df cap) exactly like a stopword cut. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.5,
                   maxNgramDf: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inv = sh.select(col("id"), explode(col("sh")).as("ng"))
    val capped = inv.join(
      inv.groupBy("ng").agg(count(lit(1)).as("df_ng"))
        .filter(col("df_ng") <= maxNgramDf),
      Seq("ng"))
    val pairs = capped.as("x").join(capped.as("y"), Seq("ng"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
