package graft.functions

import VaderData._

/** Scala port of the VADER sentiment algorithm (SURVEY.md §2 X-1).
  *
  * Rule set re-implemented from the published model (Hutto & Gilbert,
  * "VADER: A Parsimonious Rule-based Model for Sentiment Analysis of
  * Social Media Text", ICWSM-14; MIT-licensed reference implementation)
  * — the same library the reference pipeline calls at
  * dags/sentiment_analysis_dag.py:6,59,72 (vaderSentiment==3.3.2):
  *
  *   - lexicon valence lookup, ALL-CAPS emphasis (±0.733 when the text
  *     mixes cases), booster/dampener words over a 3-token window with
  *     0.95/0.9 distance decay, negation flip ×(−0.74) over the same
  *     window, "never so/this" intensification ×1.25, "least" damping,
  *     "but" clause re-weighting (×0.5 before / ×1.5 after),
  *     exclamation (≤4 × 0.292) and question-mark emphasis,
  *     compound normalization x/√(x²+15).
  *
  * Pure Scala, allocation-light, thread-safe — usable from a UDF or a
  * codegen'd Catalyst expression.
  */
object Vader {

  final case class Scores(neg: Double, neu: Double, pos: Double, compound: Double)

  private val Alpha = 15.0

  // ---- tokenization ---------------------------------------------------

  private[functions] def stripPunc(tok: String): String = {
    var s = 0; var e = tok.length
    while (s < e && PuncChars(tok.charAt(s))) s += 1
    while (e > s && PuncChars(tok.charAt(e - 1))) e -= 1
    val stripped = tok.substring(s, e)
    if (stripped.length <= 2) tok else stripped  // keep emoticons intact
  }

  private[functions] def tokenize(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty).map(stripPunc)

  private def isAllCaps(w: String): Boolean = {
    var hasLetter = false; var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (Character.isLetter(c)) {
        if (Character.isLowerCase(c)) return false
        hasLetter = true
      }
      i += 1
    }
    hasLetter
  }

  /** Some-but-not-all words are ALL-CAPS → caps carry emphasis. */
  private def allCapDifferential(words: Array[String]): Boolean = {
    val caps = words.count(isAllCaps)
    caps > 0 && caps < words.length
  }

  private def negated(w: String): Boolean = {
    val lw = w.toLowerCase
    Negate(lw) || lw.endsWith("n't")
  }

  // ---- rule components ------------------------------------------------

  private def scalarIncDec(word: String, valence: Double, capDiff: Boolean): Double =
    Boosters.get(word.toLowerCase) match {
      case Some(b) =>
        var scalar = if (valence < 0) -b else b
        if (capDiff && isAllCaps(word))
          scalar += (if (valence > 0) CIncr else -CIncr)
        scalar
      case None => 0.0
    }

  /** Negation / special-case checks for the word `distance+1` slots back. */
  private def negationCheck(valence0: Double, words: Array[String],
                            distance: Int, i: Int): Double = {
    var valence = valence0
    def lw(j: Int) = words(j).toLowerCase
    distance match {
      case 0 =>
        if (negated(words(i - 1))) valence *= NScalar
      case 1 =>
        if (lw(i - 2) == "never" && (lw(i - 1) == "so" || lw(i - 1) == "this"))
          valence *= 1.25
        else if (lw(i - 2) == "without" && lw(i - 1) == "doubt") ()
        else if (negated(words(i - 2))) valence *= NScalar
      case 2 =>
        if (lw(i - 3) == "never" &&
            (lw(i - 2) == "so" || lw(i - 2) == "this" ||
             lw(i - 1) == "so" || lw(i - 1) == "this"))
          valence *= 1.25
        else if (lw(i - 3) == "without" &&
                 (lw(i - 2) == "doubt" || lw(i - 1) == "doubt")) ()
        else if (negated(words(i - 3))) valence *= NScalar
      case _ =>
    }
    valence
  }

  /** Special-case idioms over the published window shapes: the five
    * look-back sequences (first match wins), then the two look-ahead
    * sequences (which override), then the multiword-booster damp. */
  private def specialIdioms(valence0: Double, words: Array[String], i: Int): Double = {
    var valence = valence0
    def lw(j: Int) = words(j).toLowerCase
    val onezero = s"${lw(i - 1)} ${lw(i)}"
    val twoonezero = s"${lw(i - 2)} ${lw(i - 1)} ${lw(i)}"
    val twoone = s"${lw(i - 2)} ${lw(i - 1)}"
    val threetwoone = s"${lw(i - 3)} ${lw(i - 2)} ${lw(i - 1)}"
    val threetwo = s"${lw(i - 3)} ${lw(i - 2)}"
    Seq(onezero, twoonezero, twoone, threetwoone, threetwo)
      .collectFirst { case s if SpecialCases.contains(s) => SpecialCases(s) }
      .foreach(v => valence = v)
    if (i + 1 < words.length) {
      val zeroone = s"${lw(i)} ${lw(i + 1)}"
      if (SpecialCases.contains(zeroone)) valence = SpecialCases(zeroone)
    }
    if (i + 2 < words.length) {
      val zeroonetwo = s"${lw(i)} ${lw(i + 1)} ${lw(i + 2)}"
      if (SpecialCases.contains(zeroonetwo)) valence = SpecialCases(zeroonetwo)
    }
    if (Boosters.contains(threetwo) || Boosters.contains(twoone)) valence += BDecr
    valence
  }

  private def leastCheck(valence0: Double, words: Array[String], i: Int): Double = {
    var valence = valence0
    if (i > 1 && words(i - 1).toLowerCase == "least" &&
        !Lexicon.contains(words(i - 1).toLowerCase)) {
      val prev = words(i - 2).toLowerCase
      if (prev != "at" && prev != "very") valence *= NScalar
    } else if (i == 1 && words(i - 1).toLowerCase == "least") {
      valence *= NScalar
    }
    valence
  }

  private def butCheck(words: Array[String], sentiments: Array[Double]): Unit = {
    val bi = words.indexWhere(_.equalsIgnoreCase("but"))
    if (bi >= 0) {
      var i = 0
      while (i < sentiments.length) {
        if (i < bi) sentiments(i) *= 0.5
        else if (i > bi) sentiments(i) *= 1.5
        i += 1
      }
    }
  }

  private def punctEmphasis(text: String): Double = {
    var ep = 0; var qm = 0; var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '!') ep += 1 else if (c == '?') qm += 1
      i += 1
    }
    val epAmp = math.min(ep, 4) * 0.292
    val qmAmp = if (qm > 1) { if (qm <= 3) qm * 0.18 else 0.96 } else 0.0
    epAmp + qmAmp
  }

  private def normalize(score: Double): Double = {
    val n = score / math.sqrt(score * score + Alpha)
    if (n < -1.0) -1.0 else if (n > 1.0) 1.0 else n
  }

  // ---- main entry -----------------------------------------------------

  def polarityScores(text: String): Scores = {
    if (text == null || text.isEmpty) return Scores(0.0, 0.0, 0.0, 0.0)
    val words = tokenize(text)
    if (words.isEmpty) return Scores(0.0, 0.0, 0.0, 0.0)
    val capDiff = allCapDifferential(words)
    val sentiments = new Array[Double](words.length)

    var i = 0
    while (i < words.length) {
      val item = words(i)
      val lw = item.toLowerCase
      var valence = 0.0
      val isBooster = Boosters.contains(lw)
      val kindOf = lw == "kind" && i + 1 < words.length &&
        words(i + 1).equalsIgnoreCase("of")
      if (!isBooster && !kindOf && Lexicon.contains(lw)) {
        valence = Lexicon(lw)
        if (capDiff && isAllCaps(item))
          valence += (if (valence > 0) CIncr else -CIncr)
        var dist = 0
        while (dist < 3) {
          val j = i - (dist + 1)
          if (j >= 0 && !Lexicon.contains(words(j).toLowerCase)) {
            var s = scalarIncDec(words(j), valence, capDiff)
            if (dist == 1 && s != 0.0) s *= 0.95
            if (dist == 2 && s != 0.0) s *= 0.9
            valence += s
            valence = negationCheck(valence, words, dist, i)
            if (dist == 2) valence = specialIdioms(valence, words, i)
          }
          dist += 1
        }
        valence = leastCheck(valence, words, i)
      }
      sentiments(i) = valence
      i += 1
    }

    butCheck(words, sentiments)
    scoreValence(sentiments, text)
  }

  def compound(text: String): Double = polarityScores(text).compound

  /** InternalRow form for the codegen'd struct expression. */
  def scoresRow(text: String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = polarityScores(text)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s.neg, s.neu, s.pos, s.compound))
  }

  private def scoreValence(sentiments: Array[Double], text: String): Scores = {
    if (sentiments.isEmpty) return Scores(0.0, 0.0, 0.0, 0.0)
    var sum = 0.0
    var i = 0
    while (i < sentiments.length) { sum += sentiments(i); i += 1 }
    val punct = punctEmphasis(text)
    if (sum > 0) sum += punct else if (sum < 0) sum -= punct

    var posSum = 0.0; var negSum = 0.0; var neuCount = 0
    i = 0
    while (i < sentiments.length) {
      val s = sentiments(i)
      if (s > 0) posSum += s + 1.0
      else if (s < 0) negSum += s - 1.0
      else neuCount += 1
      i += 1
    }
    if (posSum > math.abs(negSum)) posSum += punct
    else if (posSum < math.abs(negSum)) negSum -= punct

    val total = posSum + math.abs(negSum) + neuCount
    val (pos, neg, neu) =
      if (total > 0) (math.abs(posSum / total), math.abs(negSum / total), math.abs(neuCount.toDouble / total))
      else (0.0, 0.0, 0.0)
    Scores(round3(neg), round3(neu), round3(pos), round4(normalize(sum)))
  }

  private def round3(x: Double): Double = math.round(x * 1000.0) / 1000.0
  private def round4(x: Double): Double = math.round(x * 10000.0) / 10000.0
}
