package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** X-1 unit vectors — published VADER behaviors (Hutto & Gilbert 2014):
  * lexicon anchor, booster/dampener, negation, caps, punctuation,
  * but-clause, never-so intensification. */
class VaderSpec extends AnyFunSuite {

  private def c(text: String): Double = Vader.compound(text)

  test("paper anchor: 'The food here is good.' => 0.4404") {
    assert(math.abs(c("The food here is good.") - 0.4404) < 1e-9)
  }

  test("booster raises, dampener lowers") {
    assert(math.abs(c("The food here is very good.") - 0.4927) < 1e-9)
    assert(c("very good") > c("good"))
    assert(c("slightly good") < c("good"))
    assert(c("slightly good") > 0)
  }

  test("booster distance decay: closer booster boosts more") {
    assert(c("very good") > c("very much good"))
  }

  test("negation flips and damps (x -0.74)") {
    val notGood = c("not good")
    assert(notGood < 0)
    assert(math.abs(notGood - (-0.3412)) < 1e-4)
    assert(c("not very good") < 0)
  }

  test("negation window reaches 3 tokens back") {
    assert(c("not really all good") < 0)
  }

  test("'never so/this' intensifies instead of negating") {
    assert(c("never so good") > c("good"))
    assert(c("never this good") > c("good"))
  }

  test("'at least' does not damp; bare 'least' damps") {
    assert(c("least good") < c("good"))
  }

  test("punctuation emphasis: '!' amplifies, capped at 4") {
    assert(c("good!") > c("good"))
    assert(c("good!!") > c("good!"))
    assert(math.abs(c("good!!!!") - c("good!!!!!")) < 1e-12)
    assert(c("bad!") < c("bad"))
  }

  test("ALL-CAPS emphasis only when the text mixes case") {
    assert(c("The food is GREAT here") > c("The food is great here"))
    // uniform caps: no differential, no boost
    assert(math.abs(c("GREAT") - c("great")) < 1e-12)
  }

  test("but-clause shifts weight to the second half") {
    val v = c("The food is great, but the service is horrible")
    assert(v < 0)
    assert(c("The service is horrible, but the food is great") > 0)
  }

  test("emoticons survive tokenization and score") {
    assert(c("I am happy :)") > c("I am happy"))
    assert(c("this day :(") < 0)
    assert(c("love this <3") > c("love this"))
    // punctuation-stripped words still strip; emoticons don't
    assert(c("good.") == c("good"))
  }

  test("special-case idioms override the word valence") {
    // "shit" is -2.5 but "the shit" is high praise (+3)
    assert(c("this mixtape is truly the shit") > 0)
    assert(c("what a load of shit") < 0)
    // "bad ass" flips "bad" positive via the look-ahead window
    assert(c("that stunt was so bad ass") > 0)
  }

  test("neutral / empty / unknown text scores 0") {
    assert(c("") == 0.0)
    assert(c(null) == 0.0)
    assert(c("the table and the chair") == 0.0)
  }

  test("scores struct: components sum to ~1 and compound in [-1,1]") {
    val s = Vader.polarityScores("VADER is smart, handsome, and funny!")
    assert(s.compound > 0.5 && s.compound <= 1.0)
    assert(math.abs(s.pos + s.neg + s.neu - 1.0) < 0.01)
    assert(s.pos > s.neg)
  }
}
