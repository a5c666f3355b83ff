package graft.util

/** The reference's time-range helper trio (SURVEY §2.H H15-H17),
  * re-expressed as pure Scala:
  *  - H15: interval string "n second|minute|hour|day" → seconds
  *    (reference utils/utils.go:48-72)
  *  - H16: dynamic bucket sizing max(range/15, 1) seconds
  *    (utils/utils.go:81-85)
  *  - H17: relative-range suffix parse "5m"/"24h"/"7d"
  *    (utils/utils.go:103-135)
  */
object TimeRanges {
  private val unitSeconds = Map(
    "second" -> 1L, "minute" -> 60L, "hour" -> 3600L, "day" -> 86400L)

  /** H15: "n second|minute|hour|day" → seconds; None on malformed input
    * (the reference errors; callers fall back to defaults). */
  def parseInterval(s: String): Option[Long] = {
    s.trim.split("\\s+") match {
      case Array(n, unit) =>
        for {
          num <- n.toLongOption if num > 0
          mult <- unitSeconds.get(unit.stripSuffix("s"))
        } yield num * mult
      case _ => None
    }
  }

  /** H16: the reference's fixed 15-buckets-per-range resolution. */
  val NumBuckets = 15
  def bucketSeconds(rangeSeconds: Long): Long =
    math.max(rangeSeconds / NumBuckets, 1L)

  /** H17: compact relative range "5m" / "24h" / "7d" / "30s" → seconds. */
  def parseRelative(s: String): Option[Long] = {
    val t = s.trim
    if (t.length < 2) return None
    val (numPart, suffix) = (t.dropRight(1), t.last)
    val mult = suffix match {
      case 's' => Some(1L)
      case 'm' => Some(60L)
      case 'h' => Some(3600L)
      case 'd' => Some(86400L)
      case _   => None
    }
    for {
      num <- numPart.toLongOption if num > 0
      m <- mult
    } yield num * m
  }

  /** Floor-align a unix-seconds timestamp to a step grid — the
    * reference's `unix − unix % step` padding alignment
    * (utils/utils.go:74-79). */
  def align(unixSeconds: Long, step: Long): Long =
    unixSeconds - unixSeconds % step
}
