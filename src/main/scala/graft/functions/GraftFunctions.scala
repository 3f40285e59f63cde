package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: exposes the engine's scalar functions to
  * `spark.sql(...)` users so the library is usable from pure SQL as
  * well as the Column API.
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT vader_compound(text) FROM docs")
  * }}}
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("vader_compound", (t: String) => Vader.compound(t))
    spark.udf.register("vader_scores", (t: String) => {
      val s = Vader.polarityScores(t); (s.neg, s.neu, s.pos, s.compound)
    })
    spark.udf.register("textblob_polarity", (t: String) => LexiconPolarity.polarity(t))
    spark.udf.register("textblob_subjectivity",
      (t: String) => LexiconPolarity.sentiment(t)._2)
    spark.udf.register("porter_stem", (t: String) => Porter.stem(t))
    spark.udf.register("simhash64", (t: String) => graft.operators.DedupApprox.simhashOf(t))
    spark.udf.register("word_shingles",
      (t: String, n: Int) => graft.operators.DedupApprox.shinglesOf(t, n))
    spark.udf.register("rolling_fp64",
      (t: String) => graft.operators.TextAnalysis.fingerprintOf(t))
    spark.udf.register("lang_id",
      (t: String) => graft.operators.TextAnalysis.langIdOf(t)._1)
    spark.udf.register("analyze_en", (t: String) =>
      if (t == null) Array.empty[String]
      else t.toLowerCase.split("[^a-z0-9']+")
        .filter(w => w.nonEmpty && !Analyzer.StopWords(w)).map(Porter.stem))
    spark.udf.register("minhash_sig", (t: String, n: Int) =>
      graft.operators.DedupApprox.minhashSigInt(
        graft.operators.DedupApprox.shingleHashesOf(t, 3),
        graft.operators.DedupApprox.perms(n)))
    spark.udf.register("nfc_normalize", (t: String) =>
      if (t == null) null
      else java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
    spark.udf.register("nfd_normalize", (t: String) =>
      if (t == null) null
      else java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD))
  }
}
