package graft

/** Per-round soak seed mixing (round-14 VERDICT directive 5).
  *
  * The soak suites' fault schedules were driven by fixed literal
  * seeds, so every round replayed the SAME 150-batch interleaving —
  * a standing gate should explore new ones. GRAFT_SOAK_SEED (set by
  * tools/run_soaks.sh from the round number and recorded in
  * records/soak_rN.json) is mixed into every spec's base seed, so
  * each round drives a fresh schedule while staying bit-for-bit
  * reproducible from the recorded value. Unset (or 0) reproduces the
  * historical schedules exactly. The golden-ratio multiply spreads
  * small round numbers across the seed bits (seed 1 and seed 2 must
  * not differ in one bit position only).
  */
object SoakSeed {
  val mix: Long =
    sys.env.get("GRAFT_SOAK_SEED").map(_.toLong).getOrElse(0L)
  def apply(base: Long): Long = base ^ (mix * 0x9E3779B97F4A7C15L)
}
