package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Determinism helpers for double aggregation and rounded ratios.
  *
  * Two failure modes are closed here:
  *  1. Spark's partial (map-side) aggregation sums doubles in partition
  *     order — nondeterministic, drifts from DuckDB's sequential sum by
  *     ulps. Fix: sum in EXACT integer micro-units (1e-6) via a decimal
  *     cast, order-independent in both engines.
  *  2. `round(x, 6)` disagrees between engines when x sits exactly on a
  *     .5e-6 boundary (common for ratios of small integers: half-up on
  *     the decimal expansion vs scaled-double rounding). Fix: define
  *     rounding IN INTEGER SPACE — (num*1e6 + den/2) div den — which both
  *     engines compute identically; the final /1e6 double division is
  *     then bit-identical. Positive values only (all engine ratios are).
  *
  * The matching oracle-SQL spellings live in [[OracleSql]].
  */
object Exact {
  /** Integer division of two non-negative long columns. */
  def intDiv(a: Column, b: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** ONE double → 1e-6-unit long conversion (half-up via DECIMAL) —
    * the per-row expression w20/w22/w24/st22 all read "the same
    * experiment" through; a scale or rounding tweak must hit every
    * consumer at once or their cross-entry comparability silently
    * breaks (round-10 review). */
  def micro(c: Column): Column =
    (c.cast(DecimalType(18, 6)) * 1000000).cast(LongType)

  /** Exact sum of a double column in 1e-6 units (long). */
  def microSum(c: Column): Column = sum(micro(c))

  /** Order-independent exact sum of a double column, as double. */
  def sumExact(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Half-up-rounded ratio of two non-negative long columns, 6 decimals,
    * computed in integer space: (num*1e6 + den div 2) div den / 1e6. */
  def ratio6(num: Column, den: Column): Column =
    intDiv(num.cast(LongType) * 1000000L + shiftright(den.cast(LongType), 1),
      den.cast(LongType)).cast(DoubleType) / 1000000.0

  /** Deterministic mean of a double column: micro-unit sum / count,
    * half-up in integer space, 6 decimals. */
  def avgExact(c: Column): Column = {
    val n = count(lit(1))
    intDiv(microSum(c) + shiftright(n, 1), n).cast(DoubleType) / 1000000.0
  }

  /** Unrounded deterministic mean (micro-unit sum / count in double —
    * identical operands, identical bits) for use inside further
    * arithmetic mirrored exactly in the oracle SQL. */
  def avgExactRaw(c: Column): Column =
    microSum(c).cast(DoubleType) / 1000000.0 / count(lit(1))

  /** [[avgExactRaw]] over a window partition — each aggregate gets its
    * own OVER clause (a composite expression can't be `.over`-wrapped
    * whole); identical operands and order, so identical bits to the
    * grouped form. */
  def avgExactRawOver(c: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column =
    microSum(c).over(w).cast(DoubleType) / 1000000.0 /
      count(lit(1)).over(w)

  /** Half-away-from-zero rounded num/den as a long, for ANY-sign num and
    * POSITIVE den — the signed counterpart of [[ratio6]]'s integer-space
    * rounding (needed by regression slopes, whose numerators go negative;
    * `ratio6`'s unsigned form would floor-vs-truncate differently across
    * engines there). DuckDB spelling: [[OracleSql.signedDivRound]]. */
  def signedDivRound(num: Column, den: Column): Column = {
    val n = num.cast(LongType)
    val d = den.cast(LongType)
    val half = shiftright(d, 1)
    when(n < 0, -intDiv(-n + half, d)).otherwise(intDiv(n + half, d))
  }

  /** [[signedDivRound]] without the Long casts, for DECIMAL operands
    * that exceed Long range (Cramer determinants, pooled covariance
    * sums); den > 0, and the QUOTIENT must fit a Long (IntegralDivide's
    * result type). Spelled ⌊(2·num + den)/(2·den)⌋ WITHOUT materializing
    * den/2: `intDiv` always RETURNS BigInt-truncated-to-Long, so a
    * `half = den div 2` intermediate silently wraps once den/2 passes
    * Long.MaxValue (review finding, round 7 — measured: a 3.8e23
    * denominator's half came back as 1.28e18) and the rounding offset
    * is destroyed exactly where this helper exists to be exact. The
    * doubled form keeps every intermediate in DECIMAL and is provably
    * equal to DuckDB's `(num + den//2)//den`
    * ([[OracleSql.signedDivRound]]) for all integers: between 2n+2⌊d/2⌋
    * and 2n+d no multiple of 2d can fall (parity). */
  def signedDivRoundDec(num: Column, den: Column): Column =
    when(num < 0, -intDiv(-num * 2 + den, den * 2))
      .otherwise(intDiv(num * 2 + den, den * 2))

  /** [[ratio6]] for operands whose ×1e6 scaling passes Long range
    * (pairwise-AUC numerators ~n²/2, n² chance terms, per-bin micro-sum
    * masses — anything quadratic in corpus size): both operands lift to
    * DECIMAL(38,0) and the half-up rounding uses the doubled form
    * ⌊(2·num·1e6 + den)/(2·den)⌋ so no den/2 intermediate ever
    * materializes (the [[signedDivRoundDec]] wrap lesson). Non-negative
    * operands; the QUOTIENT (≤1e6 for any ratio ≤ 1) must fit a Long —
    * IntegralDivide's result type. Provably equal to [[ratio6]]
    * wherever both are in range (parity argument in
    * [[signedDivRoundDec]]'s doc). DuckDB spelling:
    * [[OracleSql.ratio6Huge]]. */
  def ratio6Dec(num: Column, den: Column): Column = {
    val d38 = DecimalType(38, 0)
    val n = num.cast(d38)
    val d = den.cast(d38)
    intDiv(n * 2000000L + d, d * 2).cast(DoubleType) / 1000000.0
  }
}

/** THE canonical text normalization (lowercase, collapse whitespace,
  * trim) and its md5 content hash — the dedup key shared by v4f
  * normalize, the v13 curation pipeline, and the v20 incremental-dedup
  * pair. One definition: a normalization tweak applied anywhere else
  * would silently diverge the entries' shared-key/shared-oracle claims.
  * DuckDB spellings: [[OracleSql.normalizedText]]/[[OracleSql.normHashText]]. */
object TextCanon {
  def normalized: Column =
    trim(regexp_replace(lower(col("text")), "\\s+", " "))
  def normHash: Column = md5(normalized.cast("binary"))
}

/** The DuckDB-side spellings of the [[Exact]] helpers, for oracle SQL.
  * `//` is DuckDB's integer division (floor for non-negative operands,
  * matching Spark's `div`). */
object OracleSql {
  /** DuckDB spelling of [[TextCanon.normalized]]/[[TextCanon.normHash]]. */
  val normalizedText: String =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  val normHashText: String = s"md5($normalizedText)"

  def microSum(col: String): String =
    s"sum(CAST(CAST($col AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
  def sumExact(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,6))) AS DOUBLE)"
  def ratio6(num: String, den: String): String =
    s"CAST(($num * 1000000 + ($den) // 2) // ($den) AS DOUBLE) / 1000000.0"
  /** [[ratio6]]'s integer micro-unit value, before the /1e6 — for
    * arithmetic that stays in integer space (v35's |p−q|). */
  def ratio6Micro(num: String, den: String): String =
    s"(($num) * 1000000 + ($den) // 2) // ($den)"
  def avgExact(col: String): String =
    s"CAST((${microSum(col)} + count(*) // 2) // count(*) AS DOUBLE) / 1000000.0"
  def avgExactRaw(col: String): String =
    s"CAST(${microSum(col)} AS DOUBLE) / 1000000.0 / count(*)"
  /** DuckDB spelling of [[Exact.signedDivRound]] (den > 0). */
  def signedDivRound(num: String, den: String): String =
    s"CASE WHEN ($num) < 0 THEN -((-($num) + ($den) // 2) // ($den)) " +
      s"ELSE (($num) + ($den) // 2) // ($den) END"
  /** DuckDB spelling of [[Exact.ratio6Dec]] — the identical doubled
    * form in HUGEINT, operand for operand. */
  def ratio6Huge(num: String, den: String): String =
    s"CAST((CAST($num AS HUGEINT) * 2000000 + CAST($den AS HUGEINT)) // " +
      s"(CAST($den AS HUGEINT) * 2) AS DOUBLE) / 1000000.0"
}
