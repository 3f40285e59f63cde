package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r2 item 3: sentences whose every sentiment-bearing word sat
  * OUTSIDE the r2 subset (they scored compound 0.0 before this
  * extension; the reference's full lexicon scores them nonzero). */
class VaderLexiconExtSpec extends AnyFunSuite {

  private def c(s: String): Double = Vader.compound(s)

  test("lexicon breadth: extension merged, anchored entries preserved") {
    assert(VaderData.Lexicon.size > 2500,
      s"expected > 2500 entries, got ${VaderData.Lexicon.size}")
    // anchored calibration points unchanged by the merge
    assert(VaderData.Lexicon("good") == 1.9)
    assert(VaderData.Lexicon("great") == 3.1)
    assert(VaderData.Lexicon("horrible") == -2.5)
    // no entries for the neutral words of the README ground-truth
    // sentences (would shift the pinned compounds)
    for (w <- Seq("book", "plot", "characters", "dialog", "today", "make", "least"))
      assert(!VaderData.Lexicon.contains(w), s"'$w' must stay neutral")
  }

  test("verb morphology expansion covers regular forms") {
    for (w <- Seq("despise", "despises", "despised", "despising",
                  "satisfies", "terrified", "terrifying", "mesmerized",
                  "flourishing", "deceived"))
      assert(VaderData.Lexicon.contains(w), s"missing inflection '$w'")
    assert(VaderData.Lexicon("despised") == VaderData.Lexicon("despise"))
  }

  test("held-out positives score positive (0.0 in the r2 subset)") {
    for (s <- Seq(
      "The concert was mesmerizing and the crowd was jubilant.",
      "An exquisite, serene retreat with delicious meals.",
      "Her performance was breathtaking, truly phenomenal.",
      "What a spectacular and heartwarming finale!",
      "The team flourished and their craft was impeccable."))
      assert(c(s) > 0.25, s"'$s' -> ${c(s)}")
  }

  test("held-out negatives score negative (0.0 in the r2 subset)") {
    for (s <- Seq(
      "The service was dreadful and the food was atrocious.",
      "A vile, despicable act of treachery.",
      "Their negligence caused an appalling fiasco.",
      "The gruesome wreckage left everyone traumatized.",
      "An abysmal, lousy, overpriced experience."))
      assert(c(s) < -0.25, s"'$s' -> ${c(s)}")
  }

  test("rule engine composes with extension entries") {
    // booster + extension word
    assert(c("The view was absolutely breathtaking.") >
           c("The view was breathtaking."))
    // negation flips an extension word
    assert(c("The meal was not delicious.") < 0)
    // ALL-CAPS emphasis applies to extension words
    assert(c("The show was PHENOMENAL!") > c("The show was phenomenal!"))
  }
}
