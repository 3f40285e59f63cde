package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators._
import graft.functions.{Analyzer, Sentiment}

/** The engine-extra queries beyond the plain-SQL inventory. Several
  * ARE DuckDB-replayable after all (list lambdas + HUGEINT wrapping
  * arithmetic cover tokenizer-exact text stats, rolling hashes, and
  * the df-capped jaccard pipeline) and carry oracles in
  * [[SparkEntry.oracleSql]]: x05-x08, x11, x15. The rest (sentiment
  * scoring, stemming, MinHash/SimHash banding, ANN, HLL sketches) run
  * as rows-only checks; their correctness lives in the ScalaTest
  * suites (src/test/scala/graft). */
object NonSqlQueries {

  private def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame = f

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X-1/X-2: full sentiment scores per document — VADER's four
    // fields plus BOTH halves of TextBlob(text).sentiment (the
    // reference reads only .polarity; subjectivity completes the
    // library surface it calls).
    "x01_vader_scores" -> q((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        Sentiment.vaderScores(col("text")).as("vader"),
        Sentiment.lexiconSentiment(col("text")).as("tb"))
        .select(col("doc_id"), col("vader.neg").as("neg"), col("vader.neu").as("neu"),
          col("vader.pos").as("pos"), col("vader.compound").as("compound"),
          col("tb.polarity").as("textblob_polarity"),
          col("tb.subjectivity").as("textblob_subjectivity"))),

    // The flagship plan at the given scale factor (entry() = sf0.001).
    "x02_sentiment_histogram" -> q((s, d) =>
      plans.SentimentPipeline.histogram(Tables.documents(s, d))),

    // X-10: ES english-analyzer chain (tokenize → stop → Porter stem).
    // Output flattened to one string: the harness comparator sorts rows
    // by value, which requires scalar (hashable) cells — array cells
    // would abort the whole compare run.
    "x03_analyze_tokens" -> q((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        array_join(Analyzer.analyze(col("text")), " ").as("terms"))),

    // Q-2 fidelity: analyzed multi_match relevance ranking.
    "x04_analyzed_search" -> q((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Analyzer.analyzedMatchCount(col("text"), "sorted merging windows").as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(50)
        // after top-k (equivalent: sort is score-desc) — a pre-sort
        // filter pushes through the projection and runs the whole
        // stem chain TWICE per row (measured, Search.byKeyword doc)
        .filter(col("score") > 0)),

    // X-10 first two stages, hash-verified: tokenize → stop-filter
    // (pre-stem; Porter itself stays unit-vector-covered — x03 runs
    // the full chain rows-only).
    "x21_analyze_prestem" -> q((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        array_join(Analyzer.tokensNoStop(col("text")), " ").as("terms"))),

    // Language ID (stopword-profile heuristic).
    "x05_langid" -> q((s, d) =>
      TextAnalysis.withLangId(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("lang_pred"), col("lang_score"))),

    // Corpus quality scoring.
    "x06_quality_score" -> q((s, d) =>
      TextAnalysis.withQuality(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("q_n_tokens"), col("q_punct_ratio"),
          col("q_stopword_ratio"), col("q_mean_word_len"), col("q_score"))),

    // Token counting (whitespace + BPE-ish regex proxy).
    "x07_token_counts" -> q((s, d) =>
      TextAnalysis.withTokenCounts(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("tok_ws"), col("tok_bpe"))),

    // Rolling-hash document fingerprint.
    "x08_rolling_fingerprint" -> q((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp64"))),

    // MinHash + LSH near-dup pairs (catches the corpus's planted dups).
    "x09_minhash_dedup" -> q((s, d) =>
      DedupApprox.minhashPairs(Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // Incremental dedup: a delta (every 3rd doc) against the LSH
    // index of the REST of the corpus — the corpus-growth shape where
    // the standing 100 TB is never re-scanned, only its band-key
    // index is joined.
    "x28_incremental_dedup" -> q((s, d) => {
      val docs = Tables.documents(s, d)
      val delta = docs.filter(col("doc_id") % 3 === 0)
      val indexed = docs.filter(col("doc_id") % 3 =!= 0)
      DedupApprox.minhashPairsAgainst(delta, "doc_id", "text",
        DedupApprox.minhashIndex(indexed, "doc_id", "text"), indexed)
        .orderBy(col("new_id"), col("idx_id"))
    }),

    // SimHash near-dup pairs (Hamming <= 6 on 64-bit signatures).
    "x10_simhash_dedup" -> q((s, d) =>
      DedupApprox.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 6, chunks = 8)
        .orderBy(col("id_a"), col("id_b"))),

    // Exact n-gram Jaccard pairs via inverted-index join. 5-gram
    // shingles: ~10x fewer posting collisions than 3-grams on this
    // corpus (profiled sum df^2: 2.8M -> 278k) with identical pairs.
    "x11_jaccard_pairs" -> q((s, d) =>
      DedupApprox.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
        shingleN = 5, threshold = 0.5, maxNgramDf = 20)
        .orderBy(col("id_a"), col("id_b"))),

    // BATCH exact cosine top-k: 4 queries ride one corpus scan;
    // TopKAgg bounds the shuffle to k structs per query per map
    // partition (the serving shape for embedding retrieval).
    "x27_cosine_topk_batch" -> q((s, d) =>
      Similarity.topKBatch(Tables.embeddings(s, d), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L), k = 10)),

    // Exact cosine top-k against vec_id=0 (query joined in-plan).
    "x12_cosine_topk" -> q((s, d) => {
      val emb = Tables.embeddings(s, d)
      val query = broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv")))
      emb.filter(col("vec_id") =!= 0).crossJoin(query)
        .select(col("vec_id"),
          Similarity.cosineFast(col("embedding").cast("array<double>"), col("qv")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
    }),

    // LSH-bucketed cosine top-k (the 100 TB scale path; recall<1).
    // 8 planes = 256 buckets: the plane count must track log2(corpus /
    // target-bucket) — 4 planes scanned 31% of this corpus, 16 would
    // leave probed buckets emptier than k (bucket math in SCALING.md).
    "x13_cosine_topk_lsh" -> q((s, d) => {
      val emb = Tables.embeddings(s, d)
      val planes = Similarity.hyperplanes(64, 8)
      val query = broadcast(
        Similarity.withBucket(emb.filter(col("vec_id") === 0), "embedding", planes)
          .select(col("embedding").cast("array<double>").as("qv"),
            col("bucket").as("qbucket")))
      Similarity.withBucket(emb.filter(col("vec_id") =!= 0), "embedding", planes)
        .crossJoin(query)
        // multi-probe: include buckets within Hamming 2 of the query's
        // (37/256 bucket-equivalents ~ 14% expected scan fraction)
        .filter(bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= 2)
        .select(col("vec_id"),
          Similarity.cosineFast(col("embedding").cast("array<double>"), col("qv")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
    }),

    // Multi-TABLE LSH top-k: 4 independent 8-plane tables, candidate =
    // any table matches within Hamming 1. The 100 TB recall lever —
    // each table is a partition-pruned read at scale; one scan locally.
    "x20_cosine_topk_multitable" -> q((s, d) => {
      val emb = Tables.embeddings(s, d)
      val tables = Similarity.hyperplaneTables(64, 8, 4)
      val nT = tables.length
      val query = broadcast(
        Similarity.withBuckets(emb.filter(col("vec_id") === 0), "embedding", tables)
          .select(col("embedding").cast("array<double>").as("qv") +:
            (0 until nT).map(t => col(s"bucket_$t").as(s"qbucket_$t")): _*))
      Similarity.withBuckets(emb.filter(col("vec_id") =!= 0), "embedding", tables)
        .crossJoin(query)
        .filter((0 until nT).map(t =>
            bit_count(col(s"bucket_$t").bitwiseXOR(col(s"qbucket_$t"))) <= 1)
          .reduce(_ || _))
        .select(col("vec_id"),
          Similarity.cosineFast(col("embedding").cast("array<double>"), col("qv")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
    }),

    // Symmetric int8 quantization stats per embedding (scale, L2
    // reconstruction error, integer checksum of the q vector).
    "x22_int8_quant" -> q((s, d) =>
      Similarity.quantizeStats(Tables.embeddings(s, d), "vec_id", "embedding")),

    // IVF ANN: 8-cell coarse quantizer (smallest-id centroids), probe
    // the query's 3 nearest cells, exact re-rank — the FAISS-IVF
    // layout; at rest the corpus partitions by `assigned` so the probe
    // is partition pruning.
    "x23_ivf_topk" -> q((s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, numCentroids = 8, nprobe = 3, k = 20)),

    // Embedding-cosine near-duplicate pairs via shared LSH bucket.
    "x14_embedding_neardup" -> q((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.35, numPlanes = 4, dim = 64)
        .orderBy(col("id_a"), col("id_b"))),

    // SemDeDup: IVF cells → in-cell cosine near-dup groups → one
    // representative per group (deterministic smallest-id centroids,
    // so the whole chain — assignment, pairs, components — replays
    // in SQL).
    "x24_semdedup" -> q((s, d) =>
      Similarity.semDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        numCells = 8, threshold = 0.35)),

    // Multimodal plumbing: binary payload + metadata → batch featurize
    // (decode stubbed; schema/partitioning/batch shape real).
    "x15_multimodal_features" -> q((s, d) =>
      Multimodal.featurize(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"), dim = 16)
        .select(col("media_id"), col("modality"), col("n_bytes"),
          col("content_hash"), col("width"), col("height"))),

    // Sketch-based distinct (HLL++): the idiomatic-Spark upgrade of the
    // dedup-cardinality question (engine-side values differ from any
    // oracle's HLL, so rows-only).
    "x16_approx_distinct" -> q((s, d) =>
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))),

    // Custom TypedImperativeAggregate: per-source corpus MinHash
    // signature (mergeable sketch; corpus-pair Jaccard without
    // re-reading rows). Signature flattened to a string: the harness
    // comparator needs scalar cells (see x03 note).
    "x19_corpus_signature" -> q((s, d) =>
      Tables.documents(s, d).groupBy(col("source"))
        .agg(graft.functions.MinHashAgg.minhashAgg(col("text")).as("sig_arr"))
        .select(col("source"),
          array_join(transform(col("sig_arr"), v => v.cast("string")), ",")
            .as("sig"))),

    // One-call corpus dedup: pairs → components → keep/drop verdicts.
    "x18_dedup_verdicts" -> q((s, d) =>
      DedupApprox.dedupCorpus(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.5)
        .select(col("doc_id"), col("comp"), col("keep"))),

    // PQ ANN (Jégou et al. 2011): train per-subspace L2 codebooks,
    // encode the corpus to m-byte codes, ADC-shortlist on codes
    // alone, exact re-rank of the shortlist. The grid-exact mode
    // (integer Lloyd on the 1/1000 grid, the kmeansExactState
    // discipline per subspace) makes the WHOLE chain SQL-replayable,
    // so this entry is hash-gated end to end (oracle in SparkEntry —
    // graduated from rows-only in round 11, the x29 precedent); the
    // float pqTopK stays available and PqSpec pins both modes' grid/
    // float trainers against sequential references and their refine
    // recall on the real corpus.
    "x26_pq_topk" -> q((s, d) =>
      Similarity.pqTopKExact(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, m = 8, kCode = 16, k = 20, refine = 4)),

    // ExactSubstr dedup, 100 TB key mode: stage 1-2 shuffle an 8-byte
    // hash of each sliding gram instead of the k-token window TEXT
    // (~k× fewer stage-1 bytes). rollingKey mode: the wrapping-64
    // base-31 hash an external engine can recompute, so the
    // HASH-KEYED election replays bit-for-bit in DuckDB (oracle in
    // SparkEntry — this entry graduated from rows-only in round 9);
    // the xxhash64 default stays the production key and all three
    // modes are output-identical on the sf0.1 corpus
    // (SubstringDedupSpec).
    "x29_substring_dedup_hash" -> q((s, d) =>
      TextAnalysis.substringDedup(Tables.documents(s, d), "doc_id", "text",
        k = 8, rollingKey = true)),

    // Scale-path length curriculum: boundary extraction + scan-local
    // bin assignment (no global window). Hash-gated (graduated from
    // rows-only in round 11): boundaries are now deterministic
    // sampled-exact order statistics (Boundaries.sampled) instead of
    // a GK sketch, so the report replays in SQL; the sketch form
    // stays available as lengthCurriculumApprox (spec'd), and q62's
    // exact ntile remains the exact-contract sibling.
    "x25_length_curriculum_approx" -> q((s, d) =>
      TextAnalysis.lengthCurriculumSampled(Tables.documents(s, d),
        "doc_id", "text")),

    // Scale-path CCNet perplexity bucketing: per-language boundaries
    // + scan-local bucket assignment (no corpus-wide window).
    // Hash-gated (graduated from rows-only in round 11): boundaries
    // are now deterministic sampled-exact per-language order
    // statistics instead of a GK sketch, so the whole report replays
    // in SQL on top of q79's scoring CTEs; the sketch form stays
    // available as perplexityBucketsApprox (spec'd), and q79's exact
    // ntile remains the exact-contract sibling.
    "x30_perplexity_buckets_approx" -> q((s, d) => {
      val docs = Tables.documents(s, d)
      LmScore.perplexityBucketsSampled(docs, "doc_id", "text",
        col("source") === "src0")
    }),

    // Range-sharded export: TeraSort-shape shard assignment — no
    // global sort, no RangePartitioning. Hash-gated (graduated from
    // rows-only in round 11): boundaries are now DETERMINISTIC
    // sampled-exact order statistics of an md5 sample
    // (Boundaries.sampled — the TeraSort sampler made replayable)
    // instead of a GK sketch, so the whole layout decision replays in
    // SQL; the sketch form stays available as Export.rangeSharded
    // (RangeShardSpec proves both forms' range-disjointness and the
    // sorted plan's global order).
    "x31_range_sharded" -> q((s, d) =>
      Export.rangeShardedSampled(Tables.documents(s, d), "doc_id",
          "n_chars", numShards = 8)
        .select(col("doc_id"), col("n_chars"), col("shard"))),

    // Persistable PCA model: train → parquet round-trip → project
    // under the RELOADED artifact (the train-once/project-anywhere
    // shape). Rows-only — the state dir is engine-side scratch; the
    // q96/q97 oracles gate the underlying train/project math and
    // PcaSpec asserts the round-trip is bit-exact.
    "x32_pca_state_roundtrip" -> q((s, d) => {
      val emb = Tables.embeddings(s, d)
      val st = Pca.trainState(emb, "embedding", dim = 64, k = 2, iters = 30)
      val dir = Scratch.dir("graft-pca-state")
      Pca.saveState(s, st, dir)
      Pca.projectState(emb, "vec_id", "embedding", Pca.loadState(s, dir))
        .orderBy(col("vec_id"), col("component"))
    }),

    // Resumable Unigram-LM training: fit, persist, reload, resume 1
    // more EM round — the checkpoint/resume shape iterative trainers
    // need at corpus scale. Hash-gated (graduated from rows-only in
    // round 11): the state roundtrip is exact and emRound composes
    // over the fixed post-prune piece set, so the resumed schedule
    // replays as OracleUnigram's trainCtes + one extra unrolled round;
    // UnigramSpec additionally proves chained ≡ one-shot in-engine.
    "x33_unigram_resume" -> q((s, d) => {
      val docs = Tables.documents(s, d)
      val st = Unigram.trainState(docs, "text", vocabSize = 64)
      val dir = Scratch.dir("graft-unigram-state")
      Unigram.saveState(st, dir)
      Unigram.resumeEm(Unigram.loadState(s, dir), 1).vocab
        .orderBy(col("piece"))
    }),

    // Streaming decontamination probe in batch harness: benchmark
    // slice (src0) gram hashes become the standing 8-byte-key index,
    // then two deltas of the remaining docs run through
    // contamDeltaBatch — verdicts land effectively-once, the second
    // delta also overlaps the first via the growing seen-index.
    // Hash-gated (graduated from rows-only in round 11): the landed
    // verdict table IS the one-shot per-doc overlap report, so it
    // replays with q90's HUGEINT wrapping gram-hash fold — bench =
    // src0's distinct hashes, seen = the even-doc_id delta's hashes
    // (the first delta probes an EMPTY index and scores 0 seen hits);
    // CorpusStreamSpec asserts redelivery lands nothing.
    "x34_stream_decontam" -> q((s, d) => {
      val docs = Tables.documents(s, d)
      val base = Scratch.dir("graft-contam")
      docs.filter(col("source") === "src0")
        .select(explode(TextAnalysis.docGramHashes(col("text"))).as("h"))
        .write.mode("overwrite").parquet(s"$base/bench")
      val rest = docs.filter(col("source") =!= "src0")
      Seq(0, 1).foreach { slice =>
        graft.plans.CorpusPipeline.contamDeltaBatch(
          rest.filter(col("doc_id") % 2 === slice), "doc_id", "text",
          s"$base/bench", s"$base/seen", s"$base/seenDocs", s"$base/target")
      }
      s.read.parquet(s"$base/target")
        .orderBy(col("doc_id"))
    }),

    // Incremental IVF index growth: three fold-in batches (plus one
    // full redelivery, which must land nothing) build the at-rest
    // cell layout batch-by-batch under a frozen coarse quantizer;
    // the final index membership (id → cell) is read back and
    // oracle-checked against the one-shot assignment replay — the
    // incremental path and a full rebuild are indistinguishable.
    "x35_ivf_ingest" -> q((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.smallestIdCentroids(emb, "vec_id", "embedding", 8)
        .localCheckpoint()
      val dir = Scratch.dir("graft-ivf-ingest") + "/index"
      (Seq(0, 1, 2) :+ 0).foreach { sl =>
        Similarity.appendIvfBatch(emb.filter(col("vec_id") % 3 === sl),
          "vec_id", "embedding", cents, dir)
      }
      s.read.parquet(dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cell").cast("long").as("cell"))
        .orderBy(col("vec_id"))
    }),

    // REAL audio decode (the codec-free half of the multimodal story):
    // deterministic 16-bit PCM WAVs synthesized per doc (real
    // RIFF/fmt/data bytes), then the production featurizeAudio path —
    // sample decode, mono mixdown, micro-rounded RMS/peak/DC,
    // zero-crossing count, RMS envelope. Scan-local, payload bytes
    // never shuffle. Rows-only (binary synthesis has no SQL replay);
    // AudioSpec pins the numbers against closed forms. The envelope
    // ARRAY is serialized to JSON at this gate surface only — the
    // library API (featurizeAudio) keeps the typed array; the
    // external snapshot normalizer's pandas sort cannot hash array
    // cells, so without this the row counts went unrecorded (r9).
    "x36_audio_features" -> q((s, d) => {
      val wav = udf((id: Long) => Multimodal.synthWav(id))
      val media = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"),
          wav(col("doc_id")).as("payload"))
      Multimodal.featurizeAudio(media)
        .withColumn("envelope", to_json(col("envelope")))
    }),

    // REAL image decode (the JDK ships the codecs — javax.imageio,
    // headless-verified): deterministic PNGs synthesized per doc (real
    // IHDR/IDAT bytes via the JDK encoder), then the production
    // featurizeImage path — full pixel decode, integer-accumulated
    // channel means, Rec.709 luma mean/std, 8-bin histogram, gradient
    // energy. Rows-only; ImageSpec pins closed forms. luma_hist is
    // JSON-serialized at this gate surface only (same snapshot-
    // normalizer constraint as x36); featurizeImage keeps the array.
    "x37_image_features" -> q((s, d) => {
      val png = udf((id: Long) => Multimodal.synthPng(id))
      val media = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"),
          png(col("doc_id")).as("payload"))
      Multimodal.featurizeImage(media)
        .withColumn("luma_hist", to_json(col("luma_hist")))
    }),

    // Perceptual image dedup (the multimodal SemDeDup): every raster
    // appears TWICE — once PNG, once JPEG — so byte/md5 dedup finds
    // nothing while the decoded-feature cosine pass recovers exactly
    // the planted re-encode pairs. Rows-only; ImageSpec asserts the
    // planted-pair recovery with zero false positives.
    "x38_image_neardup" -> q((s, d) => {
      val payload = udf((seed: Long, enc: Int) => {
        val raster = Multimodal.synthRaster(seed)
        if (enc == 0) Multimodal.encodePng(raster)
        else Multimodal.encodeJpeg(raster)
      })
      val media = Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0) // bound the decode volume
        .select(col("doc_id"), explode(array(lit(0), lit(1))).as("enc"))
        .select((col("doc_id") * 2 + col("enc")).cast("long").as("media_id"),
          payload(col("doc_id"), col("enc")).as("payload"))
      Multimodal.imageNearDupPairs(media)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Video container metadata (the third modality at the level no
    // codec is needed for): deterministic ISO-BMFF payloads per doc,
    // box-walk parse of brand/duration/dims/tracks. Frame decode is
    // the genuinely codec-bound part and stays out of scope. Rows-only;
    // VideoSpec pins the field round-trip and malformed-box safety.
    "x39_video_headers" -> q((s, d) => {
      val mp4 = udf((id: Long) => Multimodal.synthMp4(id))
      val parse = udf((b: Array[Byte]) =>
        Multimodal.videoHeader(b).map(h =>
          (h.format, h.durationMs, h.width, h.height, h.nTracks)))
      Tables.documents(s, d)
        .select(col("doc_id"), mp4(col("doc_id")).as("payload"))
        .select(col("doc_id"), parse(col("payload")).as("hd"))
        .select(col("doc_id"), col("hd._1").as("format"),
          col("hd._2").as("duration_ms"), col("hd._3").as("width"),
          col("hd._4").as("height"), col("hd._5").as("n_tracks"))
    }),

    // Streaming perceptual dedup (x28 for the media firehose): batch
    // 0 seeds the signature index with PNGs; batch 1 mixes genuinely
    // new rasters with JPEG RE-ENCODES of batch-0 images — the
    // re-encodes must flag dup_standing (byte dedup would see fresh
    // ids and fresh bytes); batch 1 is then REDELIVERED in full and
    // must fold nothing. Rows-only; MediaStreamSpec drives the true
    // MemoryStream sink.
    "x40_media_stream_dedup" -> q((s, d) => {
      val base = Scratch.dir("graft-media")
      val ids = Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").cast("long").as("seed"))
      val png = udf((sd: Long) =>
        Multimodal.encodePng(Multimodal.synthRaster(sd)))
      val jpg = udf((sd: Long) =>
        Multimodal.encodeJpeg(Multimodal.synthRaster(sd)))
      val batch0 = ids.select(col("seed").as("media_id"),
        png(col("seed")).as("payload"))
      val batch1 =
        ids.filter(col("seed") % 2 === 0) // re-encodes of standing
          .select((col("seed") + 1000000L).as("media_id"),
            jpg(col("seed")).as("payload"))
        .unionByName(
          ids.filter(col("seed") % 2 === 1) // genuinely new rasters
            .select((col("seed") + 2000000L).as("media_id"),
              png(col("seed") + 7777L).as("payload")))
      plans.CorpusPipeline.mediaDeltaBatch(batch0, "media_id", "payload", base)
      plans.CorpusPipeline.mediaDeltaBatch(batch1, "media_id", "payload", base)
      // full redelivery: the seen-ids ledger must fold nothing
      plans.CorpusPipeline.mediaDeltaBatch(batch1, "media_id", "payload", base)
      s.read.parquet(s"$base/verdicts").orderBy(col("media_id"))
    }),

    // Compression-ratio quality signal (the catch-all redundancy
    // detector beside q47's targeted repetition stats): DEFLATE at a
    // fixed level per doc, scan-local, bit-deterministic. Rows-only
    // (no SQL engine replays RFC 1951); CompressionSpec pins the
    // separations and determinism.
    "x41_compress_ratio" -> q((s, d) =>
      TextAnalysis.compressionStats(Tables.documents(s, d),
        "doc_id", "text")),

    // The funnel WITH the compression gate (q94's deterministic-
    // decoration device): docs with doc_id%7==0 get a boilerplate
    // tail that slips past every other page gate but crushes under
    // DEFLATE — precisely the junk class the compression gate exists
    // to catch. Rows-only (DEFLATE has no SQL replay); the q74 oracle
    // family continues to certify the gate-off plan bit-for-bit.
    "x42_funnel_compress" -> q((s, d) => {
      val docs = Tables.documents(s, d)
      // quality-neutral boilerplate: normal word lengths + stopwords
      // (passes lang and quality gates) and a within-doc repeating
      // unit DEFLATE crushes. The unit is built so EVERY 3-gram
      // shingle contains a doc-specific token (doc-id-derived words
      // at distance <= 2): cross-doc shingle sharing from the tails
      // is zero, so the decoration cannot manufacture an LSH
      // near-dup clique for the dedup stage to grind through — a
      // SHARED tail turned the 714 sf0.1 decorated docs into ~250k
      // candidate pairs and an unbounded exact-verify (measured,
      // twice: shared numbers and shared template words both
      // cliqued).
      val junkTail = repeat(
        concat(lit(" the item"), col("doc_id") * 7 + 1,
          lit(" of the list"), col("doc_id") * 3 + 2, lit(" and")), 100)
      val decorated = docs.withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), junkTail))
          .otherwise(col("text")))
      plans.CorpusPipeline.funnel(plans.CorpusPipeline.withVerdicts(
        decorated, "doc_id", "text", col("doc_id") % 97 === 0,
        plans.CorpusPipeline.Config(
          lineRequireTerminalPunct = false, contamViaBloom = false,
          // repetition thresholds opened up: the tail's repeated
          // template words would otherwise trip the dup-unigram gate
          // first and mask the stage under test
          maxDupUnigramFrac = 1.0, maxTopBigramFrac = 1.0,
          compressMinRatioMicro = Some(300000L))))
    }),

    // Resumable suffix-array doubling: one round, parquet the state,
    // reload, run the remaining two — the checkpoint/restart shape a
    // log2(L)-round doubling job needs at 100 TB (hours of sorts
    // should not restart from zero). Hash-gated: rounds compose and
    // the state round-trip is exact BIGINTs, so the resumed chain's
    // per-doc verdict IS q87's one-shot report — the oracle is q87's
    // SQL verbatim (the x33 resume discipline applied to the suffix
    // family); SuffixResumeSpec pins chained ≡ one-shot rank tables.
    "x43_suffix_resume" -> q((s, d) => {
      val docs = Tables.documents(s, d)
      val st1 = operators.SuffixArray.resumeDoubling(
        operators.SuffixArray.initState(docs, "doc_id", "text"), 1)
      val dir = Scratch.dir("graft-suffix-state")
      operators.SuffixArray.saveState(st1, dir)
      val st3 = operators.SuffixArray.resumeDoubling(
        operators.SuffixArray.loadState(s, dir), 2)
      operators.SuffixArray.statsFromRanks(docs, "doc_id", "text", st3.ranks)
    }),

    // SQL-registration surface smoke: the library's functions usable
    // from spark.sql.
    "x17_sql_functions" -> q((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d).createOrReplaceTempView("graft_docs_tmp")
      s.sql("""SELECT doc_id, vader_compound(text) AS compound,
               porter_stem('running') AS stem,
               lang_id(text) AS lang_pred,
               rolling_fp64(text) AS fp64,
               simhash64(text) AS sh64,
               size(analyze_en(text)) AS n_terms,
               size(minhash_sig(text, 16)) AS sig_len
               FROM graft_docs_tmp""")
    })
  )
}
