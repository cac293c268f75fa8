package graft.cli

import java.time.{LocalDate, ZoneOffset, ZonedDateTime}

/** S8 — upstream-freshness gate (`Gridmet_current.py:6-48`): before a
  * daily run, verify every variable's remote time span reaches
  * "yesterday" in UTC−7; exit nonzero otherwise so the scheduler skips
  * the cycle. The HTTP+XML fetch is injected (`fetchEnd`) — this
  * environment has no egress, and the decision logic is the part with
  * observable semantics.
  */
object AvailabilityGate {

  val GridmetVars: Seq[String] = Seq("tmmx", "tmmn", "pr", "rmax", "rmin", "vs")

  /** Reference clock: "yesterday" evaluated at UTC−7
    * (`Gridmet_current.py:32-35`). */
  def yesterday(now: ZonedDateTime): LocalDate =
    now.withZoneSameInstant(ZoneOffset.ofHours(-7)).toLocalDate.minusDays(1)

  /** True iff every variable's published end date reaches yesterday.
    * @param fetchEnd variable → TimeSpan.end date (the injected probe) */
  def isCurrent(
      now: ZonedDateTime,
      vars: Seq[String] = GridmetVars)(fetchEnd: String => LocalDate): Boolean = {
    val cutoff = yesterday(now)
    vars.forall(v => !fetchEnd(v).isBefore(cutoff))
  }
}
