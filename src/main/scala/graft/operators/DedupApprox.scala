package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for corpus-scale dedup: MinHash+LSH,
  * SimHash, and n-gram Jaccard (the standard pretraining-dedup stack:
  * Broder 1997 resemblance/minwise hashing; Charikar 2002 simhash;
  * Leskovec–Rajaraman–Ullman ch.3 banding).
  *
  * Scale design: every variant is candidate generation (a few small
  * keys per doc → one hash-shuffle on the key → in-bucket pairs)
  * followed by exact verification on candidates only. Nothing is O(n²)
  * in the corpus; the quadratic term is within-bucket, which banding
  * keeps tiny (and `maxBucket` caps against degenerate keys).
  *
  * Signatures/shingles are computed in single-pass JVM UDFs — one call
  * per row. (Deliberate: the pure-Column formulation via nested
  * higher-order lambdas re-evaluates non-attribute subtrees per array
  * element, turning one tokenize into ~|tokens| of them per row; a
  * profiled 25-60× slowdown at sf0.1. The UDF does one tokenize, one
  * signature pass, and returns exactly the bytes that shuffle.)
  * Pair expansion/verification stays native Catalyst.
  */
object DedupApprox {

  // ---- shingling -------------------------------------------------------

  private[graft] def tokensOf(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)

  private[graft] def shinglesOf(text: String, n: Int): Array[String] = {
    val toks = tokensOf(text)
    if (toks.isEmpty) Array.empty
    else if (toks.length < n) Array(toks.mkString(" "))
    else {
      val set = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + n <= toks.length) {
        val sb = new StringBuilder(toks(i))
        var j = i + 1
        while (j < i + n) { sb.append(' ').append(toks(j)); j += 1 }
        set += sb.result()
        i += 1
      }
      set.toArray
    }
  }

  /** Distinct word n-gram shingles (one tokenize pass per row). */
  def shingles(text: Column, n: Int): Column = {
    val f = udf { (t: String) => shinglesOf(t, n) }
    f(text)
  }

  // ---- MinHash ---------------------------------------------------------

  /** Deterministic (a,b) permutation params, seeded — same across runs
    * and executors, and rendered as literals into the DuckDB oracle.
    * Independent mod-prime permutations, NOT the cheaper two-hash
    * (Kirsch–Mitzenmacher) scheme: KM's minimizers correlate across
    * positions, which inflated band buckets ~5× AND lost true pairs
    * when tried at sf0.1 — and the signature pass wasn't the
    * bottleneck anyway. a,b < 2³¹ keeps every product under 2⁶². */
  private[graft] def perms(numHashes: Int): Array[(Long, Long)] =
    permsCache.computeIfAbsent(numHashes, n => {
      val rnd = new scala.util.Random(42)
      Array.fill(n)(
        ((rnd.nextLong() & Long.MaxValue) % (HashMod - 1) + 1,
         (rnd.nextLong() & Long.MaxValue) % HashMod))
    })

  // Memoized per numHashes: the SQL-registry minhash_sig UDF calls
  // perms() inside its per-row lambda — without the cache that drew
  // 2n seeded longs per input ROW (deterministic but O(rows·n)).
  private val permsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]

  private[operators] def minhashSig(sh: Seq[String], ps: Array[(Long, Long)]): Array[Long] = {
    val out = Array.fill(ps.length)(EmptySentinel)
    sh.foreach { s =>
      val h = tokenHash31(s)
      var i = 0
      while (i < ps.length) {
        val v = (ps(i)._1 * h + ps(i)._2) % HashMod
        if (v < out(i)) out(i) = v
        i += 1
      }
    }
    out
  }


  /** doc → (id, shingles, minhash signature). */
  def withMinhash(df: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, numHashes: Int = 64): DataFrame = {
    val ps = perms(numHashes)
    val sigUdf = udf { (sh: Seq[String]) => minhashSig(sh, ps) }
    df.select(col(idCol), shingles(col(textCol), shingleN).as("shingles"))
      .withColumn("sig", sigUdf(col("shingles")))
  }

  /** All hashing below is OVERFLOW-FREE modular arithmetic (31-bit
    * values, 62-bit intermediates) rather than murmur: every step is a
    * plain BIGINT expression any engine can replay, which is what lets
    * the DuckDB oracle re-run the entire LSH pipeline and hash-match
    * its pairs. LSH only needs well-distributed, not cryptographic,
    * hashes; the deterministic collisions (~n²/2·10⁻⁹) are identical
    * on both engines by construction. */
  private[graft] val HashMod = 1000000007L // 31-bit prime

  /** Signature slot for a shingle-less doc: one past the hash range, so
    * later band folds stay overflow-free (Long.MaxValue would wrap). */
  private[graft] val EmptySentinel: Long = HashMod

  /** 31-bit polynomial hash of a token (base 131, mod [[HashMod]]). */
  private[graft] def tokenHash31(t: String): Long = {
    var h = 0L
    var i = 0
    while (i < t.length) { h = (h * 131 + t.charAt(i)) % HashMod; i += 1 }
    h
  }

  /** Distinct n-gram shingles as 31-bit hashes — no shingle strings are
    * ever built: token hashes fold positionally over a sliding window.
    * Hash-set Jaccard equals string-set Jaccard up to the (replayable)
    * collision rate — immaterial against a 0.x threshold. */
  private[graft] def shingleHashesOf(text: String, n: Int): Array[Long] = {
    val toks = tokensOf(text)
    if (toks.isEmpty) return Array.empty
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = tokenHash31(toks(i)); i += 1 }
    val set = new scala.collection.mutable.LinkedHashSet[Long]
    val upper = if (toks.length < n) 1 else toks.length - n + 1
    val w = if (toks.length < n) toks.length else n
    i = 0
    while (i < upper) {
      var h = 0L
      var j = i
      while (j < i + w) { h = (h * 1000003 + th(j)) % HashMod; j += 1 }
      set += h
      i += 1
    }
    set.toArray
  }

  /** Minwise signature over 31-bit shingle hashes: vᵢ = (aᵢ·h + bᵢ)
    * mod [[HashMod]] with aᵢ,bᵢ < 2³¹ — products stay under 2⁶², no
    * wrapping anywhere. */
  private[graft] def minhashSigInt(sh: Array[Long], ps: Array[(Long, Long)]): Array[Long] = {
    val out = Array.fill(ps.length)(EmptySentinel)
    var k = 0
    while (k < sh.length) {
      val h = sh(k)
      var i = 0
      while (i < ps.length) {
        val v = (ps(i)._1 * h + ps(i)._2) % HashMod
        if (v < out(i)) out(i) = v
        i += 1
      }
      k += 1
    }
    out
  }

  // ---- pair machinery --------------------------------------------------

  /** All ordered element pairs of an array column, as struct<a,b>.
    * Safe to call on attribute references only (lambdas re-evaluate
    * non-attribute children per element). */
  private[graft] def pairExpand(arr: Column): Column =
    flatten(transform(arr, (m, i) =>
      transform(slice(arr, i + 2, size(arr)), n => struct(m.as("a"), n.as("b")))))

  /** Bucketed pair expansion without a self-join: group candidates by
    * bucket key, expand ordered in-bucket pairs natively. One shuffle;
    * the upstream (signatures) is computed once, not once per join
    * branch. Buckets above `maxBucket` are dropped — a degenerate key
    * (empty docs, all-identical boilerplate) would otherwise expand
    * quadratically inside a single task; that cap is the standard
    * recall/cost trade and is logged by callers that care. */
  private[operators] def explodePairs(df: DataFrame, bucketCols: Seq[Column],
                                      member: Column,
                                      maxBucket: Int): DataFrame =
    df.groupBy(bucketCols: _*)
      .agg(collect_list(member).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
      .select(explode(pairExpand(col("ms"))).as("p"))

  /** MinHash+LSH candidate pairs verified by exact Jaccard.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    * bands*rowsPerBand must equal numHashes.
    *
    * Shuffle discipline (the sf0.1 profile that motivated it): carrying
    * the shingle sets (~KBs/doc) through the band explode multiplies
    * them ×bands through the groupBy shuffle — 80% of the operator's
    * wall time. So the LSH stage shuffles only (band, band_hash, id),
    * and verification joins the candidate pairs BACK to the shingle
    * sets with the candidates broadcast: the wide arrays never move.
    * (Near-dup candidates ≪ corpus is the regime this operator exists
    * for; for an adversarial corpus where candidates rival the corpus
    * size, pass broadcastCandidates=false to drop the hints and let
    * AQE shuffle both sides — same plan shape, no driver limit.) */
  /** LSH band-key index of a corpus: (idCol, band, band_hash) — bands
    * rows per doc, each a 64-bit-safe fold of a signature slice. This
    * is the AT-REST dedup artifact for a growing corpus: build it once
    * per corpus build (the only pass over the text), persist it
    * partitioned/bucketed by (band, band_hash), and dedup each
    * incremental delta against it via [[minhashPairsAgainst]] — the
    * delta never triggers a re-scan of the indexed 100 TB, and appends
    * to the index are just more (id, band, band_hash) rows. Band keys
    * are computed in ONE text→keys UDF (tokenize, hash-shingle, sign,
    * band in a single pass); only (bands × i64) per doc ever reach a
    * shuffle. */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 64,
                   bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    val ps = perms(numHashes)
    val bandsUdf = udf { (text: String) =>
      val sig = minhashSigInt(shingleHashesOf(text, shingleN), ps)
      Array.tabulate(bands) { b =>
        var h = 7L
        var i = b * rows
        while (i < (b + 1) * rows) { h = (h * 31 + sig(i)) % HashMod; i += 1 }
        h
      }
    }
    df.select(col(idCol), posexplode(bandsUdf(col(textCol))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
      .select(col(idCol), col("band"), col("band_hash"))
  }

  /** Incremental (delta-vs-index) near-dup pairs: every doc of `delta`
    * against an already-indexed corpus, WITHOUT re-scanning it. This is
    * the corpus-growth shape at 100 TB — a daily crawl drop dedups
    * against the standing index in O(delta), not O(corpus):
    *
    *   - `index` is [[minhashIndex]] output (persisted); only its
    *     band-key rows move, never the indexed text.
    *   - degenerate buckets (empty-shingle keys, boilerplate) are
    *     capped on the INDEX side: buckets over `maxBucket` members
    *     are dropped before the join — same recall/cost trade, and
    *     the cap decision needs no delta-side information.
    *   - candidates = delta band keys ⋈ surviving index buckets (the
    *     index side arrives pre-grouped, so a bucketed/pre-partitioned
    *     index makes this join shuffle-free on the big side).
    *   - verification reads text ONLY for candidate ids on both sides
    *     (broadcast semi-joins), exactly like [[minhashPairs]].
    *
    * `indexDocs` supplies the indexed corpus' text for the exact-
    * Jaccard verification reads (in a deployment: the corpus table the
    * index was built from). Output: (new_id, idx_id, jaccard) with
    * jaccard >= threshold. Delta-internal duplicates are NOT emitted —
    * compose with [[minhashPairs]](delta) for those. */
  def minhashPairsAgainst(delta: DataFrame, idCol: String, textCol: String,
                          index: DataFrame, indexDocs: DataFrame,
                          shingleN: Int = 3, numHashes: Int = 64,
                          bands: Int = 16, threshold: Double = 0.5,
                          maxBucket: Int = 500,
                          broadcastCandidates: Boolean = true): DataFrame = {
    val deltaBanded = minhashIndex(delta, idCol, textCol, shingleN, numHashes, bands)
    // index buckets arrive as (band, band_hash) -> member list, capped;
    // one groupBy over the (already at-rest) index, no text anywhere.
    val idxBuckets = index
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col(idCol)).as("ms"))
      .filter(size(col("ms")) <= maxBucket)
    val cand = deltaBanded
      .join(idxBuckets, Seq("band", "band_hash"))
      .select(col(idCol).as("new_id"), explode(col("ms")).as("idx_id"))
      .dropDuplicates("new_id", "idx_id")
      .localCheckpoint()
    val shHashUdf = udf { (text: String) => shingleHashesOf(text, shingleN) }
    val bc: DataFrame => DataFrame =
      if (broadcastCandidates) broadcast else identity
    val newSh = delta
      .join(bc(cand.select(col("new_id").as("cid")).distinct()),
        col(idCol) === col("cid"))
      .select(col(idCol).as("new_id"), shHashUdf(col(textCol)).as("sh_n"))
    val idxSh = indexDocs
      .join(bc(cand.select(col("idx_id").as("cid")).distinct()),
        col(idCol) === col("cid"))
      .select(col(idCol).as("idx_id"), shHashUdf(col(textCol)).as("sh_i"))
    cand
      .join(newSh, Seq("new_id")).join(idxSh, Seq("idx_id"))
      .withColumn("__u", size(array_union(col("sh_n"), col("sh_i"))))
      // empty-vs-empty: undefined (null), dropped — see minhashPairs
      .select(col("new_id"), col("idx_id"),
        when(col("__u") > 0,
          size(array_intersect(col("sh_n"), col("sh_i"))).cast("double") /
            col("__u")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** [[minhashPairsAgainst]] re-planned for a STREAMING delta: live
    * ingest dedups against the standing corpus index with only
    * stream-static inner joins (all append-mode legal — no stateful
    * aggregation, no stream self-join, no checkpointed candidate set).
    *
    * Two deliberate divergences from the batch plan, both micro-batch
    * trades:
    *   - the delta's shingle hashes RIDE THE STREAM through the band
    *     explode (×bands replication) instead of being joined back,
    *     because the join-back would be a stream-stream self-join;
    *     micro-batches are small, so KBs/doc × bands is immaterial.
    *   - a pair matching in several bands emits several identical
    *     verdict rows (the batch dropDuplicates is stateful): route
    *     the sink through the engine's idempotent insert (the S-5/S-8
    *     machinery) or `dropDuplicatesWithinWatermark`, exactly like
    *     every other at-least-once output in the streaming layer.
    *
    * Cache the two static inputs (`index`, `indexDocs`) — Spark
    * re-evaluates static sides per micro-batch otherwise. */
  def minhashPairsAgainstStream(delta: DataFrame, idCol: String, textCol: String,
                                index: DataFrame, indexDocs: DataFrame,
                                shingleN: Int = 3, numHashes: Int = 64,
                                bands: Int = 16, threshold: Double = 0.5,
                                maxBucket: Int = 500): DataFrame = {
    val rows = numHashes / bands
    val ps = perms(numHashes)
    // one text pass: shingle hashes once, signature + band keys from them
    val keysUdf = udf { (text: String) =>
      val sh = shingleHashesOf(text, shingleN)
      val sig = minhashSigInt(sh, ps)
      val bk = Array.tabulate(bands) { b =>
        var h = 7L
        var i = b * rows
        while (i < (b + 1) * rows) { h = (h * 31 + sig(i)) % HashMod; i += 1 }
        h
      }
      (sh, bk)
    }
    val banded = delta
      .withColumn("k", keysUdf(col(textCol)))
      .select(col(idCol).as("new_id"), col("k._1").as("sh_n"),
        posexplode(col("k._2")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val idxBuckets = index
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col(idCol)).as("ms"))
      .filter(size(col("ms")) <= maxBucket)
    val shHashUdf = udf { (text: String) => shingleHashesOf(text, shingleN) }
    val idxSh = indexDocs
      .select(col(idCol).as("idx_id"), shHashUdf(col(textCol)).as("sh_i"))
    banded
      .join(idxBuckets, Seq("band", "band_hash"))
      .select(col("new_id"), col("sh_n"), explode(col("ms")).as("idx_id"))
      .join(idxSh, Seq("idx_id"))
      .withColumn("__u", size(array_union(col("sh_n"), col("sh_i"))))
      // empty-vs-empty: undefined (null), dropped — see minhashPairs
      .select(col("new_id"), col("idx_id"),
        when(col("__u") > 0,
          size(array_intersect(col("sh_n"), col("sh_i"))).cast("double") /
            col("__u")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Effectively-once landing for [[minhashPairsAgainstStream]]
    * verdicts: per micro-batch, the per-band duplicate rows collapse
    * (`dropDuplicates` on the pair key) and the target is anti-joined
    * before the append — the engine's S-5/S-8 idempotent machinery
    * ([[Dedup.idempotentBatch]]) applied to the verdict stream, which
    * upgrades its documented at-least-once contract to
    * effectively-once: a redelivered micro-batch (or a delta doc
    * replayed in a later batch) lands nothing new. The anti-join
    * build side is one pruned synthetic-key column of the standing
    * verdict table — the same cost class as the landing sink. */
  def minhashVerdictSink(verdicts: DataFrame, targetDir: String,
                         checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    verdicts.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        minhashVerdictBatch(batch, targetDir)
      }

  /** One [[minhashVerdictSink]] micro-batch, callable directly (the
    * soak suite drives the exact sink body through fault
    * interleavings the MemoryStream harness cannot inject). */
  def minhashVerdictBatch(batch: DataFrame, targetDir: String): Unit = {
    val spark = batch.sparkSession
    def keyed(df: DataFrame): DataFrame = df.withColumn("__vk",
      concat_ws(":", col("new_id"), col("idx_id")))
    val kb = keyed(batch)
    // missing-path → first batch; any other read failure must fail
    // the micro-batch (retry) rather than land vs an empty target
    val existing = keyed(Dedup.readStateOr(spark, targetDir,
      batch.limit(0))).select(col("__vk"))
    Dedup.idempotentBatch(kb, existing, "__vk")
      .drop("__vk")
      .write.mode("append").parquet(targetDir)
    ()
  }

  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5, maxBucket: Int = 500,
                   broadcastCandidates: Boolean = true): DataFrame = {
    // band keys in ONE text→keys UDF: tokenize, hash-shingle, sign and
    // band in a single pass — no shingle strings are materialized in
    // the LSH stage, and only (bands × i64) per doc ever reach the
    // shuffle.
    val banded = minhashIndex(df, idCol, textCol, shingleN, numHashes, bands)
    // materialized once (localCheckpoint): the candidate set feeds two
    // broadcast joins, and a nested un-materialized broadcast re-runs
    // the whole LSH subtree per exchange.
    val cand = explodePairs(banded, Seq(col("band"), col("band_hash")),
        col(idCol), maxBucket)
      .select(least(col("p.a"), col("p.b")).as("id_a"),
        greatest(col("p.a"), col("p.b")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint()
    // verification shingles are computed only for docs that appear in a
    // candidate pair (a small fraction of the corpus), not corpus-wide;
    // the 32-bit hashed form makes the exact intersect/union integer ops.
    val shHashUdf = udf { (text: String) => shingleHashesOf(text, shingleN) }
    // candidates ≪ corpus → broadcast; adversarial corpora (candidates
    // rivaling corpus size would blow the broadcast/driver limit) set
    // broadcastCandidates=false for identical semantics via shuffles.
    val bc: DataFrame => DataFrame =
      if (broadcastCandidates) broadcast else identity
    val candIds = cand.select(col("id_a").as("cid"))
      .unionByName(cand.select(col("id_b").as("cid"))).distinct()
    val candSh = df.join(bc(candIds), col(idCol) === col("cid"))
      .select(col(idCol), shHashUdf(col(textCol)).as("sh"))
    val withA = candSh.join(bc(cand), col(idCol) === col("id_a"))
      .select(col("id_a"), col("id_b"), col("sh").as("sh_a"))
    // shingle-less pairs (both texts empty after upstream cleaning) have
    // union 0: jaccard is undefined (null), the pair is dropped by the
    // threshold filter — matching the oracle, where 0.0/0 is NULL in DuckDB and
    // fails the filter the same way. The guard must live INSIDE the
    // expression (CaseWhen evaluates lazily): a separate filter(__u>0)
    // is not safe because predicate pushdown combines it with the
    // threshold conjunct in unspecified order, and ANSI division
    // throws before the guard runs.
    candSh.join(bc(withA), col(idCol) === col("id_b"))
      .withColumn("__u", size(array_union(col("sh_a"), col("sh"))))
      .select(col("id_a"), col("id_b"),
        when(col("__u") > 0,
          size(array_intersect(col("sh_a"), col("sh"))).cast("double") /
            col("__u")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash ---------------------------------------------------------

  /** 64-bit token hash from LCG-fold + two multiply/rotate finalizer
    * rounds — xor-free avalanche over all 64 bits, chosen because every
    * step (wrapping multiply, rotate-by-32 = half-swap) is exactly
    * replayable as HUGEINT mod-2⁶⁴ arithmetic in the DuckDB oracle. */
  private[graft] def tokenHash64(t: String): Long = {
    var h = 0L
    var i = 0
    while (i < t.length) { h = h * 6364136223846793005L + t.charAt(i); i += 1 }
    h = java.lang.Long.rotateLeft(h, 32) * 6364136223846793005L
    h = java.lang.Long.rotateLeft(h, 32) * 6364136223846793005L
    h
  }

  private[graft] def simhashOf(text: String): Long = {
    val toks = tokensOf(text)
    if (toks.isEmpty) 0L
    else {
      val acc = new Array[Int](64)
      toks.foreach { t =>
        val h = tokenHash64(t)
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

  private val simhashUdf = udf { (text: String) => simhashOf(text) }

  /** doc → 64-bit simhash of its token multiset. */
  def withSimhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simhashUdf(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    *
    * Pigeonhole on chunk PAIRS: with `chunks` pieces and distance
    * <= maxHamming <= chunks-2, at least two chunks match exactly, so
    * keying candidates on every (chunk_i, chunk_j) value pair is sound
    * — and the 2-chunk key has ~2^(2·64/chunks) entropy, which keeps
    * buckets small even when one chunk value is corpus-common (the
    * single-chunk scheme degenerates: one low-entropy 8-bit chunk put
    * 30% of a 5k corpus in one bucket). C(chunks,2) keys per doc. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, chunks: Int = 8,
                   maxBucket: Int = 2000): DataFrame = {
    require(maxHamming <= chunks - 2,
      s"chunk-pair pigeonhole needs maxHamming <= chunks-2 (got $maxHamming, $chunks)")
    val bits = 64 / chunks
    val mask = (1L << bits) - 1
    val sigs = withSimhash(df, idCol, textCol)
    val keys = (for {
      i <- 0 until chunks; j <- (i + 1) until chunks
    } yield struct(
      lit(i * chunks + j).as("ck"),
      (shiftright(col("simhash"), i * bits).bitwiseAND(lit(mask)) * (mask + 1) +
        shiftright(col("simhash"), j * bits).bitwiseAND(lit(mask))).as("cv")))
    val banded = sigs
      .select(col(idCol), col("simhash"), explode(array(keys: _*)).as("k"))
      .select(col(idCol), col("simhash"), col("k.ck").as("ck"), col("k.cv").as("cv"))
    // The Hamming test runs INSIDE the bucket expansion (whole-stage
    // codegen, pre-shuffle): chunk-pair keys on natural-language
    // simhashes are low-entropy, so candidate pairs outnumber true
    // near-dups ~100:1 (profiled 2.28M raw vs 15.7k passing at sf0.1)
    // — filtering before dropDuplicates shrinks that shuffle ~100×.
    // (Canonical-bucket emission — dedup by construction, no shuffle —
    // was tried and REVERTED: the canonical-key expression inside the
    // HOF lambda re-evaluates per reference (interpreted), measured
    // 1.5-3.5× slower than just shuffling the pre-filtered survivors.)
    banded.groupBy(col("ck"), col("cv"))
      .agg(collect_list(struct(col(idCol).as("id"), col("simhash").as("sig"))).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
      .select(explode(filter(pairExpand(col("ms")),
        p => bit_count(p.getField("a").getField("sig")
          .bitwiseXOR(p.getField("b").getField("sig"))) <= lit(maxHamming))).as("p"))
      .select(
        least(col("p.a.id"), col("p.b.id")).as("id_a"),
        greatest(col("p.a.id"), col("p.b.id")).as("id_b"),
        bit_count(col("p.a.sig").bitwiseXOR(col("p.b.sig"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  /** One-call corpus dedup: MinHash near-dup pairs → connected
    * components → keep/drop verdict per document. Docs outside any
    * near-dup cluster keep themselves (cluster = own id, keep = true).
    * This is the operator a training-data pipeline actually runs; the
    * pieces stay public for custom thresholds/metrics. */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.8): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, threshold = threshold)
    val verdicts = Dedup.clusterVerdicts(pairs)
      .withColumnRenamed("id", idCol)
    df.join(verdicts, Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
      .withColumn("keep", coalesce(col("keep"), lit(true)))
  }

  // ---- exact n-gram Jaccard (inverted-index, no signatures) -----------

  /** All-pairs n-gram Jaccard >= threshold via an inverted index:
    * explode shingles → posting list per ngram (df-capped — ultra-common
    * ngrams carry no discrimination and expand quadratically; the same
    * cut a search engine makes) → in-posting pairs → |A∩B| = pair count,
    * |A∪B| = |A|+|B|−|A∩B|. Pairs whose every shared ngram is df-capped
    * are missed — raise maxNgramDf for exactness. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.5,
                   maxNgramDf: Int = 50): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inv = sh.select(col("id"), explode(col("sh")).as("ng"))
    val pairs = inv.groupBy("ng").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxNgramDf))
      .select(explode(pairExpand(col("ids"))).as("p"))
      .groupBy(
        least(col("p.a"), col("p.b")).as("id_a"),
        greatest(col("p.a"), col("p.b")).as("id_b"))
      .agg(count(lit(1)).as("common"))
    // the per-doc size table is narrow (id, int) — two hash joins on it
    // are cheap at any scale, and AQE broadcasts whichever side is
    // small at runtime. (Explicitly broadcasting `pairs` here re-runs
    // the whole posting-expansion subtree once per broadcast exchange —
    // measured 13× slower at sf0.1 — so: no hint.)
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
