package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The vaderSentiment README's own example sentences with their
  * published compound scores (public ground truth, Hutto & Gilbert
  * 2014 / github.com/cjhutto/vaderSentiment README) — the strongest
  * fidelity evidence available without running the Python lib. */
class VaderGroundTruthSpec extends AnyFunSuite {

  private def c(s: String): Double = Vader.compound(s)

  private val vectors: Seq[(String, Double)] = Seq(
    ("VADER is smart, handsome, and funny.", 0.8316),
    ("VADER is smart, handsome, and funny!", 0.8439),
    ("VADER is very smart, handsome, and funny.", 0.8545),
    ("VADER is VERY SMART, handsome, and FUNNY.", 0.9227),
    ("VADER is VERY SMART, handsome, and FUNNY!!!", 0.9342),
    ("VADER is VERY SMART, uber handsome, and FRIGGIN FUNNY!!!", 0.9469),
    ("VADER is not smart, handsome, nor funny.", -0.7424),
    ("The book was good.", 0.4404),
    ("At least it isn't a horrible book.", 0.431),
    ("The book was only kind of good.", 0.3832),
    ("The plot was good, but the characters are uncompelling and the dialog is not great.", -0.7042),
    ("Today SUX!", -0.5461),
    ("Make sure you :) or :D today!", 0.8633),
    ("Not bad at all", 0.431))

  for ((text, expected) <- vectors)
    test(f"'$text' => $expected%.4f") {
      assert(math.abs(c(text) - expected) < 5e-5,
        f"got ${c(text)}%.4f, want $expected%.4f")
    }
}
