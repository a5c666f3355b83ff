package graft.operators

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality gates over the raw tables: a declarative expectations
  * suite (v37 — the Great-Expectations-style validation report a
  * pipeline runs before a training job consumes a feed) and a
  * cross-table referential-integrity audit (v38 — orphan / childless
  * key counts across the star schema). Neither exists in the reference
  * (it trusts its collector); both are the first thing a 100 TB
  * ingest needs, because a malformed feed is cheapest to reject BEFORE
  * it fans out into derived tables.
  *
  * Scale: every check is a linear scan reduced to one aggregate row —
  * per-table row checks are FUSED into a single pass (one conditional
  * sum per check), key-uniqueness rides one extra keyed aggregate (the
  * exact form; swap to approx_count_distinct drift-checking at 100 TB),
  * and the report explodes from 1-row frames, so nothing but O(checks)
  * rows ever leaves the aggregates. v38's orphan probes are anti-joins
  * on the key — broadcast at test SF, keyed shuffle beyond, never a
  * nested loop.
  */
object QualityOps extends QueryModule {
  private val Start = EventWindow.StartS
  private val End = EventWindow.EndS

  // ---- V37: expectations suite ----

  private def chk(table: String, name: String, n: Column, bad: Column) =
    struct(lit(table).as("table_name"), lit(name).as("chk"),
      n.cast("long").as("n_checked"), bad.cast("long").as("n_bad"))

  /** V37: declarative expectations report — one row per check with the
    * violation count, share, and a strict pass flag (a gate either
    * holds or it doesn't; value_in_range is deliberately tight at 400
    * so the report demonstrably fires). Row-level checks fuse into ONE
    * conditional-sum pass per table; uniqueness adds one keyed
    * aggregate per table. */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val eAgg = e.agg(
      count(lit(1)).as("n"),
      sum(when(col("value").isNull, 1).otherwise(0)).as("b_null"),
      sum(when(col("value") < 0 || col("value") > 400, 1).otherwise(0))
        .as("b_range"),
      sum(when(!col("event_type")
        .isin("click", "view", "purchase", "signup", "error"), 1)
        .otherwise(0)).as("b_type"),
      sum(when(col("ts_s") < Start || col("ts_s") >= End, 1).otherwise(0))
        .as("b_ts"),
      countDistinct(col("event_id")).as("n_keys"))
    val eRows = eAgg.select(explode(array(
      chk("events", "event_id_unique", col("n"), col("n") - col("n_keys")),
      chk("events", "ts_in_window", col("n"), col("b_ts")),
      chk("events", "type_in_set", col("n"), col("b_type")),
      chk("events", "value_in_range_0_400", col("n"), col("b_range")),
      chk("events", "value_not_null", col("n"), col("b_null")))).as("r"))
    val d = Tables.documents(spark, dir)
    val dAgg = d.agg(
      count(lit(1)).as("n"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1)
        .otherwise(0)).as("b_empty"),
      sum(when(col("text").isNotNull &&
        !(length(col("text")) === col("n_chars")), 1).otherwise(0))
        .as("b_len"),
      sum(when(col("lang").isNull, 1).otherwise(0)).as("b_lang"),
      countDistinct(col("doc_id")).as("n_keys"))
    val dRows = dAgg.select(explode(array(
      chk("documents", "doc_id_unique", col("n"), col("n") - col("n_keys")),
      chk("documents", "lang_not_null", col("n"), col("b_lang")),
      chk("documents", "n_chars_consistent", col("n"), col("b_len")),
      chk("documents", "text_not_empty", col("n"), col("b_empty")))).as("r"))
    eRows.unionByName(dRows)
      .select(col("r.table_name").as("table_name"), col("r.chk").as("chk"),
        col("r.n_checked").as("n_checked"), col("r.n_bad").as("n_bad"))
      .withColumn("bad_share", Exact.ratio6(col("n_bad"), col("n_checked")))
      .withColumn("pass", when(col("n_bad") === 0, 1).otherwise(0))
      .orderBy(col("table_name"), col("chk"))
  }

  private[graft] lazy val expectationsSql: String = {
    def row(table: String, name: String, n: String, bad: String,
        from: String) =
      s"""SELECT '$table' AS table_name, '$name' AS chk,
         | CAST($n AS BIGINT) AS n_checked, CAST($bad AS BIGINT) AS n_bad
         |FROM $from""".stripMargin
    val rows = Seq(
      row("events", "event_id_unique", "count(*)",
        "count(*) - count(DISTINCT event_id)", "events"),
      row("events", "ts_in_window", "count(*)",
        s"sum(CASE WHEN epoch_us(ts)//1000000 < $Start OR " +
          s"epoch_us(ts)//1000000 >= $End THEN 1 ELSE 0 END)", "events"),
      row("events", "type_in_set", "count(*)",
        "sum(CASE WHEN event_type NOT IN " +
          "('click','view','purchase','signup','error') " +
          "THEN 1 ELSE 0 END)", "events"),
      row("events", "value_in_range_0_400", "count(*)",
        "sum(CASE WHEN value < 0 OR value > 400 THEN 1 ELSE 0 END)",
        "events"),
      row("events", "value_not_null", "count(*)",
        "sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)", "events"),
      row("documents", "doc_id_unique", "count(*)",
        "count(*) - count(DISTINCT doc_id)", "documents"),
      row("documents", "lang_not_null", "count(*)",
        "sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)", "documents"),
      row("documents", "n_chars_consistent", "count(*)",
        "sum(CASE WHEN text IS NOT NULL AND len(text) != n_chars " +
          "THEN 1 ELSE 0 END)", "documents"),
      row("documents", "text_not_empty", "count(*)",
        "sum(CASE WHEN text IS NULL OR len(text) = 0 THEN 1 ELSE 0 END)",
        "documents"))
    s"""WITH c AS (${rows.mkString("\nUNION ALL\n")})
       |SELECT table_name, chk, n_checked, n_bad,
       | ${OracleSql.ratio6("n_bad", "n_checked")} AS bad_share,
       | CAST(CASE WHEN n_bad = 0 THEN 1 ELSE 0 END AS INT) AS pass
       |FROM c ORDER BY table_name, chk""".stripMargin
  }

  // ---- V46: PII scrubbing ----

  // Patterns kept to the RE2 ∩ java.util.regex common dialect (character
  // classes, bounded repeats — no lookaround, no \d shorthands) so the
  // same regex string drives both engines identically.
  private val EmailPat = "[a-z0-9.]+@[a-z0-9.]+"
  private val PhonePat = "\\+1-[0-9]{3}-[0-9]{4}"
  private val IpPat = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** V46: PII scrubbing — the redaction pass a training-data pipeline
    * runs before text leaves the ingest boundary: find email / phone /
    * IP literals, count them per segment (the audit trail), and replace
    * them with type tags (the scrubbed corpus). The contact blobs are
    * synthesized deterministically from `customer` (the fixture corpus
    * has no natural PII — same convention as the v7 media payloads), so
    * both engines construct and scrub identical bytes; the per-segment
    * md5 over the order-fixed redacted text witnesses the scrub output
    * itself, not just the counts.
    *
    * Match counts ride `size(split(s, pat)) - 1` — the one count
    * spelling this DuckDB build and Spark share (no regexp_count there).
    *
    * Scale: pure per-row regex map (codegen'd `RegExpReplace`; the
    * pattern is a fold of three sequential replaces, still one pass
    * over the row) + one segment-keyed aggregate with map-side combine.
    * No window, no join — embarrassingly parallel. The md5-of-ordered-
    * concat is the only per-group sort and runs on ≤n_customers/segment
    * strings; at 100 TB swap it for a per-row md5 XOR (order-free) —
    * here the ordered form is kept because it witnesses byte order too. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val blob = concat(
      col("c_name"), lit(" email user."), k.cast("string"),
      lit("@example.com"),
      when(k % 3 === 0,
        concat(lit(" alt user"), k.cast("string"), lit("@alt.org")))
        .otherwise(lit("")),
      lit(" phone +1-"), lpad((k % 1000).cast("string"), 3, "0"),
      lit("-"), lpad((k % 10000).cast("string"), 4, "0"),
      lit(" ip 10."), (k % 256).cast("string"),
      lit("."), (expr("c_custkey div 256") % 256).cast("string"),
      lit("."), (k % 250).cast("string"))
    def matches(s: Column, pat: String) = (size(split(s, pat)) - 1)
      .cast("long")
    val red = regexp_replace(regexp_replace(regexp_replace(
      blob, EmailPat, "<EMAIL>"), PhonePat, "<PHONE>"), IpPat, "<IP>")
    Tables.customer(spark, dir)
      .select(col("c_mktsegment").as("segment"), k.as("ck"),
        matches(blob, EmailPat).as("emails"),
        matches(blob, PhonePat).as("phones"),
        matches(blob, IpPat).as("ips"), red.as("red"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("emails")).as("emails_found"),
        sum(col("phones")).as("phones_found"),
        sum(col("ips")).as("ips_found"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("ck"), col("red")))),
          s => s.getField("red")), "|")).as("redacted_md5"))
      .orderBy(col("segment"))
  }

  private lazy val piiScrubSql: String = {
    val email = "[a-z0-9.]+@[a-z0-9.]+"
    val phone = "\\+1-[0-9]{3}-[0-9]{4}"
    val ip = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    s"""WITH b AS (
       | SELECT c_mktsegment AS segment, c_custkey AS ck,
       |  c_name || ' email user.' || CAST(c_custkey AS VARCHAR) ||
       |  '@example.com' ||
       |  CASE WHEN c_custkey % 3 = 0
       |       THEN ' alt user' || CAST(c_custkey AS VARCHAR) || '@alt.org'
       |       ELSE '' END ||
       |  ' phone +1-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') ||
       |  '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
       |  ' ip 10.' || CAST(c_custkey % 256 AS VARCHAR) ||
       |  '.' || CAST((c_custkey // 256) % 256 AS VARCHAR) ||
       |  '.' || CAST(c_custkey % 250 AS VARCHAR) AS blob
       | FROM customer),
       | s AS (
       | SELECT segment, ck,
       |  len(string_split_regex(blob, '$email')) - 1 AS emails,
       |  len(string_split_regex(blob, '$phone')) - 1 AS phones,
       |  len(string_split_regex(blob, '$ip')) - 1 AS ips,
       |  regexp_replace(regexp_replace(regexp_replace(blob,
       |    '$email', '<EMAIL>', 'g'),
       |    '$phone', '<PHONE>', 'g'),
       |    '$ip', '<IP>', 'g') AS red
       | FROM b)
       |SELECT segment, CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(sum(emails) AS BIGINT) AS emails_found,
       | CAST(sum(phones) AS BIGINT) AS phones_found,
       | CAST(sum(ips) AS BIGINT) AS ips_found,
       | md5(string_agg(red, '|' ORDER BY ck)) AS redacted_md5
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- V38: referential-integrity audit ----

  /** V38: cross-table key audit — for each FK relation, child rows with
    * no parent (orphans: broken ingest) and parents with no children
    * (childless: expected, but a sudden jump is a feed outage signal).
    * Anti-joins on the key, counts reduced per relation. */
  /** One FK relation's audit row (public so specs can prove orphan /
    * childless detection on handcrafted frames — the shipped tables
    * are clean, which a detection test must not rely on). */
  def audit(rel: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    // ONE scan per table: total and miss-count fused into one
    // left-join aggregate per direction (the separate agg + anti-join
    // form scanned each table twice more — the dominant cost at the
    // scale this module's own doc budgets in bytes scanned; round-10
    // review). Null keys never match the distinct key side, so they
    // count as misses exactly like the anti-join did.
    val pKeys = parent.select(parent(parentKey).as("__pk")).distinct()
    val childStats = child.select(child(childKey).as("__ck"))
      .join(pKeys, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        coalesce(sum(when(col("__pk").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_orphan"))
    val cKeys = child.select(child(childKey).as("__ck2")).distinct()
    val parentStats = parent.select(parent(parentKey).as("__pk2"))
      .join(cKeys, col("__pk2") === col("__ck2"), "left")
      .agg(count(lit(1)).as("n_parent"),
        coalesce(sum(when(col("__ck2").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_childless"))
    childStats.crossJoin(parentStats)
      .select(lit(rel).as("relation"), col("n_child"), col("n_orphan"),
        Exact.ratio6(col("n_orphan"), col("n_child")).as("orphan_share"),
        col("n_parent"), col("n_childless"))
  }

  def refIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val l = Tables.lineitem(spark, dir)
    audit("lineitem->orders", l, "l_orderkey", o, "o_orderkey")
      .unionByName(audit("orders->customer", o, "o_custkey", c, "c_custkey"))
      .orderBy(col("relation"))
  }

  private[graft] lazy val refIntegritySql: String = {
    def audit(rel: String, child: String, ck: String, parent: String,
        pk: String) =
      s"""SELECT '$rel' AS relation,
         | (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
         | (SELECT CAST(count(*) AS BIGINT) FROM $child ch
         |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
         |     WHERE p.$pk = ch.$ck)) AS n_orphan,
         | (SELECT CAST(count(*) AS BIGINT) FROM $parent) AS n_parent,
         | (SELECT CAST(count(*) AS BIGINT) FROM $parent p
         |   WHERE NOT EXISTS (SELECT 1 FROM $child ch
         |     WHERE ch.$ck = p.$pk)) AS n_childless""".stripMargin
    s"""WITH a AS (
       |${audit("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey")}
       |UNION ALL
       |${audit("orders->customer", "orders", "o_custkey",
          "customer", "c_custkey")})
       |SELECT relation, n_child, n_orphan,
       | ${OracleSql.ratio6("n_orphan", "n_child")} AS orphan_share,
       | n_parent, n_childless
       |FROM a ORDER BY relation""".stripMargin
  }

  /** W21 equivalence-class floor: below this group size a
    * quasi-identifier combination is flagged re-identifiable. 10 is
    * the conventional release bar (HIPAA expert-determination work
    * commonly uses 5–11); the FLAG is data-derived either way, so the
    * entry stays meaningful at every SF. */
  val AnonymityK = 10

  /** W21: k-anonymity audit — the privacy gate next to v46's PII
    * scrub: group the release candidate by its quasi-identifier tuple
    * (nation, market segment — the classic "harmless" columns that
    * link), report each equivalence class with its size, the
    * re-identification probability 1/n, and the below-k flag. The
    * release decision (suppress / generalize flagged classes) consumes
    * exactly this frame. Scale: ONE partial-agg keyed shuffle onto the
    * bounded QI-combination frame (nations × segments); no window, no
    * join — linear at any customer count. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        Exact.ratio6(lit(1L), col("n")).as("reident_p"),
        (col("n") < AnonymityK).as("at_risk"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  private lazy val kAnonymitySql: String =
    s"""SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
       | ${OracleSql.ratio6("1", "count(*)")} AS reident_p,
       | count(*) < $AnonymityK AS at_risk
       |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** W25 distinct-sensitive-value floor. 3 is the conventional
    * l-diversity bar for small sensitive domains (Machanavajjhala et
    * al. 2007 use l=2..4); the bracket domain here is ~6 values, so
    * l=3 is the highest bar that stays satisfiable. */
  val DiversityL = 3

  /** Sensitive attribute for the w25 audit: the account balance in
    * $2000 brackets, shifted +$1000 before the integer division so the
    * one negative TPC-H bracket (-999.99..) never exercises
    * engine-divergent negative `div` semantics. Micro conversion is
    * the [[Exact.microSum]] spelling (DECIMAL(18,6) half-up), so both
    * engines bracket identically at the cent boundaries. */
  private def balBracket: Column = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val micro = (col("c_acctbal").cast(DecimalType(18, 6)) * 1000000)
      .cast(LongType)
    Exact.intDiv(micro + 1000000000L, lit(2000000000L))
  }

  private val balBracketSql: String =
    "(CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT)" +
      " + 1000000000) // 2000000000"

  /** W25: l-diversity audit — k-anonymity's necessary second check
    * (Machanavajjhala et al. 2007): a class can be large (k-safe) yet
    * HOMOGENEOUS in the sensitive attribute, so linking someone to it
    * still discloses their value. Per w21 quasi-identifier class
    * (nation, market segment): size, count of DISTINCT sensitive
    * balance brackets, the top bracket's share (the homogeneity-attack
    * success probability), and the below-l flag. Scale: two stacked
    * partial-agg keyed shuffles — (QI, sensitive) cells then QI — onto
    * frames bounded by QI-combinations × bracket domain; no window, no
    * join, linear at any customer count. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame =
    lDiversityOf(Tables.customer(spark, dir))

  /** [[lDiversity]]'s core over any customer-shaped frame (public so
    * the spec can plant a homogeneous class — the shipped tables are
    * diverse, which a detection test must not rely on). */
  def lDiversityOf(customer: DataFrame): DataFrame = {
    val cells = customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        balBracket.as("bal_bracket"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bracket"))
      .agg(count(lit(1)).as("c"))
    cells.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("c")).cast("long").as("n"),
        count(lit(1)).cast("long").as("l_distinct"),
        max(col("c")).cast("long").as("top_c"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        col("l_distinct"),
        Exact.ratio6(col("top_c"), col("n")).as("top_share"),
        (col("l_distinct") < DiversityL).as("at_risk"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  private lazy val lDiversitySql: String =
    s"""WITH cells AS (
       | SELECT c_nationkey, c_mktsegment, $balBracketSql AS bal_bracket,
       |  CAST(count(*) AS BIGINT) AS c
       | FROM customer GROUP BY 1, 2, 3)
       |SELECT c_nationkey, c_mktsegment,
       | CAST(sum(c) AS BIGINT) AS n,
       | CAST(count(*) AS BIGINT) AS l_distinct,
       | ${OracleSql.ratio6("max(c)", "sum(c)")} AS top_share,
       | count(*) < $DiversityL AS at_risk
       |FROM cells GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Release-gate thresholds: max tolerated distribution shift (v35
    * TVD) and exact-duplicate share. */
  val GateMaxTvd = 0.2
  val GateMaxDupShare = 0.05

  /** V78: the RELEASE GATE — the one-row go/no-go a snapshot must pass
    * before a training run consumes it, composing the monitors this
    * engine already runs: v37 expectations (any failed check?), v38
    * referential integrity (any orphan?), w26 CUSUM (any feed alarm in
    * the eval window?), v35 drift (worst per-type TVD under
    * [[GateMaxTvd]]?), and the exact-duplicate share (under
    * [[GateMaxDupShare]]?). Each component is CONSUMED THROUGH ITS OWN
    * registered operator (and the oracle embeds each component's own
    * oracle SQL as a subquery), so the gate cannot drift from the
    * monitors it summarizes. Five 1-row aggregates crossJoined — the
    * headline numbers ride along so a red gate says why. */
  def releaseGate(spark: SparkSession, dir: String): DataFrame = {
    val exp = expectations(spark, dir)
      .agg(sum(lit(1) - col("pass")).cast("long").as("n_failed_checks"))
    val fk = refIntegrity(spark, dir)
      .agg(sum(col("n_orphan")).cast("long").as("n_orphans"))
    val al = StatsOps.cusumMonitor(spark, dir)
      .agg(sum(col("alarm_up").cast("int") + col("alarm_dn").cast("int"))
        .cast("long").as("n_alarms"))
    val dr = StatsOps.drift(spark, dir).agg(max(col("tvd")).as("max_tvd"))
    val dp = Tables.documents(spark, dir)
      .agg(Exact.ratio6(
        count(lit(1)) - countDistinct(md5(col("text").cast("binary"))),
        count(lit(1))).as("dup_share"))
    val ok = col("n_failed_checks") === 0L && col("n_orphans") === 0L &&
      col("n_alarms") === 0L && col("max_tvd") <= GateMaxTvd &&
      col("dup_share") <= GateMaxDupShare
    exp.crossJoin(broadcast(fk)).crossJoin(broadcast(al))
      .crossJoin(broadcast(dr)).crossJoin(broadcast(dp))
      .select(col("n_failed_checks"), col("n_orphans"), col("n_alarms"),
        col("max_tvd"), col("dup_share"),
        (col("n_failed_checks") === 0L).as("expectations_ok"),
        (col("n_orphans") === 0L).as("fk_ok"),
        (col("n_alarms") === 0L).as("feed_stable"),
        (col("max_tvd") <= GateMaxTvd).as("drift_ok"),
        (col("dup_share") <= GateMaxDupShare).as("dup_ok"),
        ok.as("ship"))
  }

  private lazy val releaseGateSql: String =
    s"""WITH expq AS (SELECT CAST(sum(1 - pass) AS BIGINT) AS n_failed_checks
       |   FROM ($expectationsSql)),
       | fkq AS (SELECT CAST(sum(n_orphan) AS BIGINT) AS n_orphans
       |   FROM (${refIntegritySql})),
       | alq AS (SELECT CAST(sum(
       |     CASE WHEN alarm_up THEN 1 ELSE 0 END +
       |     CASE WHEN alarm_dn THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
       |   FROM (${StatsOps.cusumSql})),
       | drq AS (SELECT max(tvd) AS max_tvd FROM (${StatsOps.driftSql})),
       | dpq AS (SELECT ${OracleSql.ratio6(
            "(count(*) - count(DISTINCT md5(text)))", "count(*)")}
       |     AS dup_share FROM documents)
       |SELECT n_failed_checks, n_orphans, n_alarms, max_tvd, dup_share,
       | n_failed_checks = 0 AS expectations_ok,
       | n_orphans = 0 AS fk_ok,
       | n_alarms = 0 AS feed_stable,
       | max_tvd <= $GateMaxTvd AS drift_ok,
       | dup_share <= $GateMaxDupShare AS dup_ok,
       | (n_failed_checks = 0 AND n_orphans = 0 AND n_alarms = 0
       |  AND max_tvd <= $GateMaxTvd AND dup_share <= $GateMaxDupShare)
       |   AS ship
       |FROM expq, fkq, alq, drq, dpq""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v78_release_gate",
      "V78 release gate: the one-row go/no-go composing the shipped " +
        "monitors — v37 expectations, v38 FK integrity, w26 CUSUM " +
        "alarms, v35 worst drift, exact-dup share — each consumed " +
        "through its own operator and oracle SQL, headline numbers " +
        "alongside the verdict",
      releaseGate, Some(releaseGateSql)),
    GraftQuery("w21_k_anonymity",
      "W21 k-anonymity audit: quasi-identifier equivalence classes " +
        "with size, 1/n re-identification probability and below-k " +
        "flag — one keyed partial-agg shuffle onto the bounded " +
        "QI-combination frame",
      kAnonymity, Some(kAnonymitySql)),
    GraftQuery("w25_l_diversity",
      "W25 l-diversity audit: per quasi-identifier class, distinct " +
        "sensitive balance brackets, top-bracket homogeneity-attack " +
        "share, and below-l flag — the disclosure check k-anonymity " +
        "alone misses; two stacked keyed partial-aggs onto bounded " +
        "frames",
      lDiversity, Some(lDiversitySql)),
    GraftQuery("v37_expectations",
      "V37 declarative data-quality expectations: per-check violation " +
        "counts/shares + strict pass flags, row checks fused into one " +
        "conditional-sum pass per table (+1 keyed agg for uniqueness)",
      expectations, Some(expectationsSql)),
    GraftQuery("v46_pii_scrub",
      "V46 PII scrubbing: email/phone/IP detection counts per segment " +
        "+ tag-redacted output witnessed by ordered md5; pure per-row " +
        "codegen regex map + one keyed aggregate, no window, no join",
      piiScrub, Some(piiScrubSql)),
    GraftQuery("v38_ref_integrity",
      "V38 referential-integrity audit: orphan and childless key " +
        "counts per FK relation via anti-joins (broadcast at test SF, " +
        "keyed shuffle beyond)",
      refIntegrity, Some(refIntegritySql)))
}
