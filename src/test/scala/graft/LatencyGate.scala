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
}
