package graft.functions

/** TextBlob-style lexicon-average polarity (SURVEY.md §2 X-2).
  *
  * The reference calls `TextBlob(text).sentiment.polarity`
  * (dags/sentiment_analysis_dag.py:7,73; textblob==0.17.1), which is
  * the `pattern` en-sentiment lexicon average: each matched token
  * contributes its polarity in [-1,1]; a preceding negator flips the
  * contribution by ×(−0.5); a preceding intensifier multiplies it;
  * the document score is the mean over matched tokens (0.0 when none
  * match). Re-implemented from the published pattern-en semantics with
  * an embedded lexicon subset derived from the VADER valences (/4 to
  * the [-1,1] range) so the two scorers stay calibrated to each other.
  *
  * Known divergence: absolute scores differ from the Python library
  * (its en-sentiment.xml lexicon and per-assessment chunking aren't
  * reproducible from published semantics alone — e.g. its README
  * example scores 0.392 there vs 0.675 here). The MECHANICS (lexicon
  * average, ×−0.5 negation, intensifier products, subjectivity
  * contract) are what the specs pin; the averaged-and-±0.1-thresholded
  * classification the reference derives from it is insensitive to
  * calibration except at label boundaries.
  */
object LexiconPolarity {

  private[functions] val Negators =
    Set("not", "no", "never", "cannot", "n't", "neither", "nor")

  /** intensifier -> multiplier (pattern's ~1.3 "very"-class default). */
  private[functions] val Intensifiers: Map[String, Double] = Map(
    "very" -> 1.3, "really" -> 1.3, "extremely" -> 1.5, "incredibly" -> 1.5,
    "absolutely" -> 1.4, "completely" -> 1.4, "totally" -> 1.4,
    "highly" -> 1.3, "especially" -> 1.3, "particularly" -> 1.3,
    "quite" -> 1.2, "so" -> 1.2, "too" -> 1.2,
    "slightly" -> 0.8, "somewhat" -> 0.8, "barely" -> 0.6,
    "hardly" -> 0.6, "almost" -> 0.9, "fairly" -> 0.9)

  /** token -> polarity in [-1, 1]. */
  val Lexicon: Map[String, Double] =
    VaderData.Lexicon.map { case (w, v) => w -> clamp(v / 4.0) }

  private def clamp(x: Double): Double =
    if (x < -1.0) -1.0 else if (x > 1.0) 1.0 else x

  private def isNegator(w: String): Boolean =
    Negators(w) || w.endsWith("n't")

  /** TextBlob-style (polarity, subjectivity). Pattern assigns each
    * lexicon entry a subjectivity in [0,1]; with the derived lexicon we
    * calibrate it from polarity magnitude (strongly polar words are
    * subjective; mild ones less so), with intensifiers counting as
    * subjective assessments — preserving the library's contract that
    * factual text scores near 0 and opinionated text near 1. */
  def sentiment(text: String): (Double, Double) = {
    if (text == null || text.isEmpty) return (0.0, 0.0)
    val toks = text.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)
    var pSum = 0.0; var sSum = 0.0; var n = 0
    var i = 0
    while (i < toks.length) {
      Lexicon.get(toks(i)) match {
        case Some(p0) =>
          var p = p0
          if (i > 0) {
            val prev = toks(i - 1)
            if (isNegator(prev)) p *= -0.5
            else Intensifiers.get(prev).foreach { m =>
              p = clamp(p * m)
              sSum += 0.9; n += 1 // the intensifier is itself an assessment
              if (i > 1 && isNegator(toks(i - 2))) p *= -0.5
            }
          }
          pSum += p
          sSum += math.min(1.0, 0.35 + 0.65 * math.abs(p0))
          n += 1
        case None =>
      }
      i += 1
    }
    if (n == 0) (0.0, 0.0) else (pSum / (n - countIntens(toks)).max(1), sSum / n)
  }

  private def countIntens(toks: Array[String]): Int = {
    var c = 0; var i = 1
    while (i < toks.length) {
      if (Lexicon.contains(toks(i)) && Intensifiers.contains(toks(i - 1))) c += 1
      i += 1
    }
    c
  }

  def polarity(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val toks = text.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)
    var sum = 0.0
    var n = 0
    var i = 0
    while (i < toks.length) {
      Lexicon.get(toks(i)) match {
        case Some(p0) =>
          var p = p0
          if (i > 0) {
            val prev = toks(i - 1)
            if (isNegator(prev)) p *= -0.5
            else {
              Intensifiers.get(prev).foreach { m =>
                p = clamp(p * m)
                // negator before the intensifier: "not very good"
                if (i > 1 && isNegator(toks(i - 2))) p *= -0.5
              }
            }
          }
          sum += p
          n += 1
        case None =>
      }
      i += 1
    }
    if (n == 0) 0.0 else sum / n
  }
}
