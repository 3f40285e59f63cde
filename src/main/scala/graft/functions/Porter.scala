package graft.functions

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980) — the `english_stemmer` half of the
  * reference's ES english analyzer (configs/elasticsearch_config.py:
  * 93-110; SURVEY.md §2 X-10). Standard five-step implementation.
  *
  * UPGRADE NOTE (rule-selection fix, round 13): steps 2-4 switched
  * from first-match-wins fall-through to the paper's strict
  * longest-match, changing the stem of any word whose longest
  * matching suffix has a failing m-condition (basement → basement,
  * was basem; document → document, was docum; 26 of the 40,977-term
  * probe battery). Any STANDING stem-keyed artifact built before the
  * fix — inverted-index posting lists, incremental index ledgers
  * (InvertedIndex.statsBatchKey ledgers), analyzed-search caches —
  * carries old stems and will silently mismatch queries analyzed
  * post-upgrade. Operationally: rebuild standing indexes and
  * stem-keyed ledgers when adopting this version (re-run the
  * index-build batch from the source corpus).
  */
object Porter {

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var w = word.toLowerCase
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w); w = step5(w)
    w
  }

  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** measure: number of VC sequences in the stem. */
  private def m(w: String): Int = {
    var n = 0; var i = 0
    val len = w.length
    while (i < len && isCons(w, i)) i += 1
    while (i < len) {
      while (i < len && !isCons(w, i)) i += 1
      if (i < len) { n += 1; while (i < len && isCons(w, i)) i += 1 }
    }
    n
  }

  private def containsVowel(w: String): Boolean =
    (0 until w.length).exists(i => !isCons(w, i))

  private def doubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o — stem ends cvc where final c is not w, x or y. */
  private def cvc(w: String): Boolean = {
    val len = w.length
    len >= 3 && isCons(w, len - 3) && !isCons(w, len - 2) && isCons(w, len - 1) &&
      !"wxy".contains(w.charAt(len - 1))
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (m(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (doubleCons(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (m(s) == 1 && cvc(s)) s + "e"
          else s
        case None => w
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val Step2Suffixes = List(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val Step3Suffixes = List(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val Step4Suffixes = List(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  /** Rule selection per the 1980 paper: within a step, ONLY the rule
    * with the longest matching S1 is considered — if its m-condition
    * fails, the step ends with the word unchanged, with NO
    * fall-through to a shorter suffix. (Porter's own FAQ example:
    * "agreement" keeps its EMENT because m(agre)=1, and the step does
    * not then try MENT/ENT — a first-match-wins scan over the ordered
    * list got that wrong here until round 13, stemming basement →
    * basem via the ENT rule; caught by tools/porter_probe.py's
    * independent from-the-paper implementation.) */
  private def replaceSuffix(w: String, pairs: List[(String, String)],
                            minM: Int): String = {
    var best: (String, String) = null
    for (p <- pairs)
      if (w.endsWith(p._1) && (best == null || p._1.length > best._1.length))
        best = p
    if (best == null) w
    else {
      val stem = w.dropRight(best._1.length)
      if (m(stem) > minM - 1) stem + best._2 else w
    }
  }

  private def step2(w: String): String = replaceSuffix(w, Step2Suffixes, 1)
  private def step3(w: String): String = replaceSuffix(w, Step3Suffixes, 1)

  private def step4(w: String): String = {
    var best: String = null
    for (suf <- Step4Suffixes)
      if (w.endsWith(suf) && (best == null || suf.length > best.length))
        best = suf
    if (best == null) w
    else {
      val stem = w.dropRight(best.length)
      if (m(stem) > 1 &&
          (best != "ion" || (stem.nonEmpty && "st".contains(stem.last))))
        stem
      else w
    }
  }

  private def step5(w: String): String = {
    var r = w
    if (r.endsWith("e")) {
      val stem = r.dropRight(1)
      if (m(stem) > 1 || (m(stem) == 1 && !cvc(stem))) r = stem
    }
    if (r.endsWith("ll") && m(r) > 1) r = r.dropRight(1)
    r
  }
}
