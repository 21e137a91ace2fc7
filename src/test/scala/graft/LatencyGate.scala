package graft

/** The battery's latency-budget gate, pure so BenchAdjudicationSpec can
  * pin it (round-14 lesson: an untested adjudication path shipped dead).
  *
  * Two normalizations stack:
  *  - `machineFactor` — the battery-wide MEDIAN observed/budget ratio: a
  *    uniformly slow box shifts every query equally and nothing flags;
  *  - `loadFactor` — PER-QUERY: a query timed while the host carried
  *    external load L on C cores competed for its executor threads, so
  *    its allowance scales by (1 + L/C), capped at 4x so a fully-swamped
  *    host can still flag a genuine order-of-magnitude regression. This
  *    is what makes the recorded load actionable instead of decorative:
  *    a 3x slip at load 2 on 32 cores still FAILS (factor 1.06), while
  *    the same wall time measured at load 64 is excused (factor 3).
  */
object LatencyGate {

  def loadFactor(load: Double, cpus: Int): Double =
    if (load <= 0 || cpus <= 0) 1.0
    else math.min(4.0, 1.0 + load / cpus)

  /** true = this observation violates its budget. */
  def overBudget(secs: Double, budget: Double, machineFactor: Double,
      load: Double, cpus: Int): Boolean = {
    val allow = machineFactor * loadFactor(load, cpus)
    secs > 5 * allow * budget && secs > 1.5 * allow
  }

  /** A query's battery family — the letter prefix tools/catalog.py
    * groups QUERIES.md by (`sql_*` is its own family). */
  def familyOf(name: String): String =
    if (name.startsWith("sql_")) "sql"
    else name.takeWhile(_.isLetter)

  /** true = a FAMILY's wall-clock subtotal violates its derived ceiling:
    * 1.5x the family's summed per-query budgets plus 5 s fixed slack,
    * scaled by the machine factor and the family's mean load factor.
    * This is the battery-GROWTH gate (round 16): the per-round driver
    * runs the bench under a hard external timeout and round 15's record
    * died to it — per-query budgets bound individual regressions, but
    * nothing bounded the SUM. A new query lands with no budget row, so
    * its whole cost counts against the family's headroom until the
    * profile is regenerated — growth is claimed consciously at `sbt
    * test` time, not discovered at driver time. */
  def familyOverBudget(obsSum: Double, budgetSum: Double,
      machineFactor: Double, meanLoadFactor: Double): Boolean =
    obsSum > machineFactor * meanLoadFactor * (1.5 * budgetSum + 5.0)
}
