package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's search DSL (SURVEY §2.S): a comma-separated list of
  * `key=value` / `key!=value` conjuncts with all-or-nothing parsing —
  * if ANY pair fails to parse the whole query falls back to a broad OR
  * search (reference api/service.go:651-696,778-789).
  *
  * The parse produces [[Cond]]s; a schema-specific [[AttrBinder]] turns
  * them into Catalyst `Column` predicates. No SQL-string round-trip: the
  * same `Column` object feeds both the search operator (S5) and the
  * search-metrics series (S6/D11), unlike the reference which re-renders
  * SQL text into a CTE (api/service.go:1431-1537).
  */
object SearchDsl {
  sealed trait Op
  case object Eq extends Op
  case object Neq extends Op
  final case class Cond(key: String, op: Op, value: String)

  /** All-or-nothing parse (api/service.go:657-696): returns None when any
    * comma-separated pair lacks a separator or has an empty key/value. */
  def parse(q: String): Option[Seq[Cond]] = {
    if (q.trim.isEmpty) return None
    val conds = q.split(",", -1).map(_.trim).map { pair =>
      val (op, idx, len) =
        if (pair.contains("!=")) (Neq: Op, pair.indexOf("!="), 2)
        else if (pair.contains("=")) (Eq: Op, pair.indexOf("="), 1)
        else return None
      val k = pair.substring(0, idx).trim
      val v = pair.substring(idx + len).trim
      if (k.isEmpty || v.isEmpty) return None
      Cond(k, op, v)
    }
    Some(conds.toSeq)
  }

  /** Schema adapter: how DSL keys bind to columns for a given table shape. */
  trait AttrBinder {
    /** Direct column for a special key (reference: name, scope —
      * api/service.go:722-736), or None for generic attribute lookup. */
    def special(key: String): Option[Column]
    /** Generic-key equality (S3, api/service.go:737-772). */
    def genericEq(key: String, value: String): Column
    /** Generic-key inequality — De Morgan complement; an absent key counts
      * as "not equal" (api/service.go:752-771). */
    def genericNeq(key: String, value: String): Column
    /** S4 broad OR fallback when the DSL parse fails
      * (api/service.go:778-789). */
    def broad(query: String): Column
  }

  /** Conjunction of parsed conditions under a binder. */
  def toPredicate(conds: Seq[Cond], binder: AttrBinder): Column =
    conds.map { c =>
      (binder.special(c.key), c.op) match {
        case (Some(col0), Eq)  => col0 === c.value
        case (Some(col0), Neq) => col0 =!= c.value
        case (None, Eq)        => binder.genericEq(c.key, c.value)
        case (None, Neq)       => binder.genericNeq(c.key, c.value)
      }
    }.reduce(_ && _)

  /** Full DSL semantics: parse, or broad-OR fallback. */
  def predicate(q: String, binder: AttrBinder): Column =
    parse(q).map(toPredicate(_, binder)).getOrElse(binder.broad(q))

  /** Binder for the span schema (FIXTURES.md §B): attributes are
    * MAP<STRING,STRING> — `element_at` key lookup. This is the CORRECT map
    * semantics; the reference's parallel-array `has(keys,k) AND
    * has(values,v)` matches key and value in different pairs
    * (api/service.go:742-751) — documented divergence, see SURVEY §7
    * hard-part 3. */
  object SpanBinder extends AttrBinder {
    def special(key: String): Option[Column] = key match {
      case "name"  => Some(col("name"))
      case "scope" => Some(col("scope_name"))
      case _       => None
    }
    def genericEq(key: String, value: String): Column =
      element_at(col("resource_attributes"), key) === value ||
        element_at(col("span_attributes"), key) === value
    def genericNeq(key: String, value: String): Column =
      coalesce(element_at(col("resource_attributes"), key) =!= value, lit(true)) &&
        coalesce(element_at(col("span_attributes"), key) =!= value, lit(true))
    def broad(q: String): Column =
      col("name") === q || col("scope_name") === q ||
        col("trace_id") === q || col("span_id") === q ||
        array_contains(map_values(col("resource_attributes")), q) ||
        array_contains(map_values(col("span_attributes")), q)
  }

  /** BUG-COMPAT binder reproducing the reference's pair-UNALIGNED
    * attribute matching: `has(keys,k) AND has(values,v)` matches the key
    * and the value in *different* pairs (api/service.go:742-751), so a
    * span with attrs {a->1, b->2} matches the query `a=2`. Provided for
    * byte-for-byte reference parity; [[SpanBinder]] (correct map
    * semantics) is the default. The `!=` form is the same expression
    * negated per family (api/service.go:752-771). */
  object SpanBinderCompat extends AttrBinder {
    def special(key: String): Option[Column] = SpanBinder.special(key)
    private def unaligned(attrs: String, key: String, value: String) =
      array_contains(map_keys(col(attrs)), key) &&
        array_contains(map_values(col(attrs)), value)
    def genericEq(key: String, value: String): Column =
      unaligned("resource_attributes", key, value) ||
        unaligned("span_attributes", key, value)
    def genericNeq(key: String, value: String): Column =
      !unaligned("resource_attributes", key, value) &&
        !unaligned("span_attributes", key, value)
    def broad(q: String): Column = SpanBinder.broad(q)
  }

  /** Binder for the events table (FIXTURES.md mapping): name ≈ event_type,
    * generic keys look inside the `props` JSON document. */
  object EventsBinder extends AttrBinder {
    def special(key: String): Option[Column] = key match {
      case "name" => Some(col("event_type"))
      case "user" => Some(col("user_id").cast("string"))
      case _      => None
    }
    /** The DSL key is a LITERAL property name (the reference's
      * attribute lookup), never a JSON-path expression: bracket-quote
      * it so path metacharacters in a key (`a.b`, `x[0]`, `*`) match
      * the literal key instead of navigating the document (round-10
      * review — `$.a.b` wrongly matched the NESTED {"a":{"b":..}} and
      * missed the literal "a.b" property). Quotes inside a key stay
      * unsupported (escaped brackets are not portable across JsonPath
      * dialects) — such a query matches nothing, which is the DSL's
      * all-or-nothing convention, not a crash. */
    private def literalPath(key: String): String =
      s"$$['${key.replace("'", "\\'")}']"
    def genericEq(key: String, value: String): Column =
      get_json_object(col("props"), literalPath(key)) === value
    def genericNeq(key: String, value: String): Column =
      coalesce(get_json_object(col("props"), literalPath(key)) =!= value,
        lit(true))
    def broad(q: String): Column =
      col("event_type") === q || col("props") === q
  }
}
