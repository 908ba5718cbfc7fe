package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.exprs.ExprLang

class ModelSpec extends AnyFunSuite {

  test("level key/label/order defaulting follows the reference rules") {
    val l = Level("x", Seq(Attribute("a"), Attribute("b")))
    assert(l.key.name == "a")            // first attr
    assert(l.labelAttribute.name == "b") // last attr
    assert(l.orderAttribute.name == "a") // key
    val l2 = Level("y", Seq(Attribute("a"), Attribute("b")),
      keyName = Some("b"), labelAttributeName = Some("a"))
    assert(l2.key.name == "b" && l2.labelAttribute.name == "a")
  }

  test("flat dimension ref is the bare dimension name") {
    val d = Dimension.flat("flag")
    assert(d.levels.head.key.ref == "flag")
    assert(d.isFlat && !d.hasDetails)
  }

  test("hierarchy rollup and next level") {
    val h = Hierarchy("h", Seq("y", "m", "d"))
    assert(h.rollup(Seq("2010", "6", "1")) == Seq("2010", "6"))
    assert(h.rollup(Seq("2010", "6", "1"), Some("y")) == Seq("2010"))
    assert(h.nextLevel(None).contains("y"))
    assert(h.nextLevel(Some("m")).contains("d"))
    assert(h.nextLevel(Some("d")).isEmpty)
  }

  test("expression identifiers exclude functions, keywords, literals") {
    val ids = ExprLang.identifiers("sum(amount) * 2 + price_x - if(a > 'lit', b, c)")
    assert(ids == Set("amount", "price_x", "a", "b", "c"))
  }

  test("function whitelist is enforced") {
    ExprLang.validateFunctions("round(sqrt(x), 2)")
    assertThrows[IllegalArgumentException] {
      ExprLang.validateFunctions("system('rm -rf /')")
    }
  }

  test("CASE words are never attribute refs; date parts only inside extract") {
    val expr = "case when x > 1 then 'a' else 'b' end"
    assert(ExprLang.identifiers(expr) == Set("x"))
    assert(ExprLang.toSparkSql(expr, r => s"`$r`") ==
      "case when `x` > 1 then 'a' else 'b' end")
    // a date-part word is a keyword ONLY when followed by `from`
    assert(ExprLang.identifiers("extract(year from d)") == Set("d"))
    assert(ExprLang.identifiers("month * 100") == Set("month"))
    assert(ExprLang.toSparkSql("month * 100", r => s"`$r`") == "`month` * 100")
    assert(ExprLang.toSparkSql("extract(year from d)", r => s"`$r`") ==
      "extract ( year from `d` )")
    // the `from` lookahead is case-insensitive (SQL keywords are)
    assert(ExprLang.toSparkSql("extract(year FROM d)", r => s"`$r`") ==
      "extract ( year FROM `d` )")
  }

  test("numeric trunc rewrites to a native guarded cast (no UDF)") {
    val t = ExprLang.toSparkSql("trunc(amount)", r => s"`$r`")
    // NaN/overflow fall back to the input instead of NULLing it
    assert(t.contains("try_cast ( `amount` as bigint )"), t)
    assert(t.startsWith("coalesce ("), t)
    assert(!t.contains("graft_trunc"))
    // template nests inside other calls and keeps sibling args intact
    val nested = ExprLang.toSparkSql("pow(trunc(a), 2)", r => s"`$r`")
    assert(nested.startsWith("power ("), nested)
    assert(nested.endsWith(", 2 )"), nested)
    assert(nested.contains("try_cast ( `a` as bigint )"), nested)
    // and other args pass through a template call unharmed
    val inner = ExprLang.toSparkSql("trunc(pow(a, 2))", r => s"`$r`")
    assert(inner.contains("try_cast ( power ( `a` , 2 ) as bigint )"), inner)
    // a second argument is an arity error, not spliced garbage
    val e = intercept[IllegalArgumentException] {
      ExprLang.toSparkSql("trunc(a, b)", r => s"`$r`")
    }
    assert(e.getMessage.contains("exactly one argument"), e.getMessage)
    // ...but commas nested INSIDE the single argument are fine
    val ok = ExprLang.toSparkSql("trunc(mod(a, 7))", r => s"`$r`")
    assert(ok.contains("mod ( `a` , 7 )"), ok)
  }

  test("unknown join integrity value is rejected at model build") {
    assertThrows[IllegalArgumentException] {
      JoinSpec("f", Seq("k"), "d", Seq("k"), integrity = Some("rely"))
    }
    JoinSpec("f", Seq("k"), "d", Seq("k"), integrity = Some("verified"))
  }

  test("dependency topo-sort and cycle detection") {
    val deps = Map(
      "c" -> Set("a", "b"), "b" -> Set("a"), "a" -> Set.empty[String])
    val order = ExprLang.depSort(Seq("c"), deps.withDefaultValue(Set.empty))
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))
    assertThrows[IllegalArgumentException] {
      ExprLang.depSort(Seq("x"),
        Map("x" -> Set("y"), "y" -> Set("x")).withDefaultValue(Set.empty))
    }
  }

  test("default aggregate when none declared is fact count") {
    assert(Cube.FactCount.function.contains("count"))
  }

  test("cube accessors fail fast on unknown names") {
    val c = Cube("c", "f", Seq(Dimension.flat("x")))
    assertThrows[IllegalArgumentException](c.dimension("nope"))
    assertThrows[IllegalArgumentException](c.aggregate("nope"))
  }

  test("window-calculator aggregates depend on their source aggregate") {
    val a = MeasureAggregate("s_sma", function = Some("sma"), measure = Some("s_sum"))
    assert(a.dependencies == Set("s_sum"))
  }
}
