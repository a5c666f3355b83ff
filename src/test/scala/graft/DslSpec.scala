package graft

import graft.dsl.SearchDsl
import graft.dsl.SearchDsl.{Cond, Eq, Neq}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Parser unit + property tests mirroring the reference's all-or-nothing
  * semantics (api/service.go:651-696). */
class DslSpec extends SparkSpec {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("parses eq and neq conjuncts with trimming") {
    assert(SearchDsl.parse("a=1, b != 2 ,name=GET /users") ===
      Some(Seq(Cond("a", Eq, "1"), Cond("b", Neq, "2"),
        Cond("name", Eq, "GET /users"))))
  }

  test("all-or-nothing: one invalid pair poisons the whole query") {
    assert(SearchDsl.parse("a=1,borken,c=3").isEmpty)
    assert(SearchDsl.parse("a=1,=2").isEmpty)
    assert(SearchDsl.parse("a=1,b=").isEmpty)
    assert(SearchDsl.parse("").isEmpty)
    assert(SearchDsl.parse("  ").isEmpty)
    assert(SearchDsl.parse("plaintext").isEmpty)
  }

  test("!= wins over = when both present in a pair") {
    assert(SearchDsl.parse("a!=1") === Some(Seq(Cond("a", Neq, "1"))))
  }

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("property: any generated k=v/k!=v list round-trips") {
    val condGen = for {
      k <- ident; v <- ident; neq <- Gen.oneOf(true, false)
    } yield Cond(k, if (neq) Neq else Eq, v)
    checkProp(Prop.forAll(Gen.nonEmptyListOf(condGen)) { conds =>
      val rendered = conds.map { c =>
        s"${c.key}${if (c.op == Neq) "!=" else "="}${c.value}"
      }.mkString(",")
      SearchDsl.parse(rendered) == Some(conds)
    })
  }

  test("property: separator-free strings always fall back") {
    checkProp(Prop.forAll(
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '-')))
        .map(_.mkString)) { s =>
      SearchDsl.parse(s).isEmpty
    })
  }

  test("events binder: generic != treats absent key as not-equal") {
    import spark.implicits._
    val df = Seq(
      (1L, "click", """{"k": 42}"""),
      (2L, "click", """{"k": 7}"""),
      (3L, "click", """{"other": 1}""")).toDF("event_id", "event_type", "props")
    val kept = df.filter(
      SearchDsl.predicate("k!=42", SearchDsl.EventsBinder))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }
}
