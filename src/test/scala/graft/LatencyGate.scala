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

  /** true = a FAMILY's wall-clock subtotal violates its ceiling: 2.5x
    * the family's summed per-query budgets plus 10 s fixed slack, scaled
    * by the machine factor and the family's mean load factor. The bound
    * is deliberately LOOSE: between an isolated QueryBatterySpec run and
    * the same battery late in a full `sbt test`, family subtotals swing
    * 0.4x–2x with the session's accumulated state (the h family read
    * 21 s isolated and 42.6 s in-suite on the same code, with the
    * battery-wide TOTAL flat at 1.02x) — a 1.5x family bound flagged
    * pure context noise. 2.5x still catches a family TRIPLING (ten new
    * heavy fixtures landing unbudgeted); anything subtler is the total
    * gate's job. */
  def familyOverBudget(obsSum: Double, budgetSum: Double,
      machineFactor: Double, meanLoadFactor: Double): Boolean =
    obsSum > machineFactor * meanLoadFactor * (2.5 * budgetSum + 10.0)

  /** true = the BATTERY's total wall-clock violates its ceiling: 1.35x
    * the summed budgets plus 20 s slack, machine/load-scaled. This is
    * the battery-GROWTH gate (round 16): the per-round driver runs the
    * bench under a hard external timeout and round 15's record died to
    * it — per-query budgets bound individual regressions, but nothing
    * bounded the SUM, which is the one number the driver budget sees.
    * The total is also the STABLE statistic (family subtotals swing 2x
    * with suite context; the total held 1.02x in the same comparison).
    * New queries land with no budget row, so their whole cost counts
    * against the slack until the profile is regenerated — growth is
    * claimed consciously at `sbt test` time, not discovered at driver
    * time. */
  def totalOverBudget(obsSum: Double, budgetSum: Double,
      machineFactor: Double, meanLoadFactor: Double): Boolean =
    obsSum > machineFactor * meanLoadFactor * (1.35 * budgetSum + 20.0)
}
