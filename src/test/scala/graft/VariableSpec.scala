package graft

import graft.model.{Point, Variable}
import graft.pattern.VariableMatcher
import org.apache.spark.sql.functions._

/**
 * Variable parse/canonical round-trip and match-table goldens
 * (go/.../variable/variable_test.go:18-54, lib/variable.cc:107-131).
 */
class VariableSpec extends SparkSpec {

  val subject = Variable("/openinstrument/test",
    Map("label1" -> "value1", "label2" -> "spaced value"))

  val matchTable: Seq[(String, Boolean)] = Seq(
    "/openinstrument/*" -> true,
    "/openinstrx/*" -> false,
    "/openinstrument/" -> false,
    "/openinstrument/test" -> true,
    "/openinstrument/test{label1=value1}" -> true,
    "/openinstrument/test{label1=value2}" -> false,
    "/openinstrument/test{label1=*}" -> true,
    "/openinstrument/test{label1=}" -> false,
    "/openinstrument/test{label3=*}" -> false,
    "/openinstrument/test{label3=}" -> true,
    "/openinstrument/test{label1=/val.*1/}" -> true,
    "/openinstrument/test{label1=/val.*2/}" -> false)

  test("match table (scala-side)") {
    matchTable.foreach { case (pat, want) =>
      assert(subject.matches(Variable.parse(pat)) === want, s"pattern $pat")
    }
  }

  test("match table (Column predicate over DataFrame)") {
    val df = series(Seq(1L -> 1.0), subject.name, subject.labels)
    matchTable.foreach { case (pat, want) =>
      val n = df.filter(VariableMatcher.compile(pat)).count()
      assert((n == 1) === want, s"pattern $pat")
    }
  }

  test("canonical string: sorted labels, quoting, empty labels dropped") {
    val v = Variable("/var/name",
      Map("zed" -> "z", "alpha" -> "has space", "q" -> "a,b", "empty" -> ""))
    assert(v.canonical === """/var/name{alpha=has space,q="a\,b",zed=z}""")
    assert(Variable("/plain").canonical === "/plain")
  }

  test("parse round-trip incl. quoted values with commas") {
    val s = """/var/name{alpha=has space,q="a\,b",zed=z}"""
    val v = Variable.parse(s)
    assert(v.name === "/var/name")
    assert(v.labels === Map("alpha" -> "has space", "q" -> "a,b", "zed" -> "z"))
    assert(v.canonical === s)
  }

  test("name validity (server/store.cc:414-418)") {
    assert(Variable.isValidName("/ok/name"))
    assert(!Variable.isValidName("noslash"))
    assert(!Variable.isValidName("/"))
    assert(!Variable.isValidName("/has space"))
  }

  test("seriesKey is injective across label orderings and deterministic") {
    val df = series(Seq(1L -> 1.0), "/x", Map("b" -> "2", "a" -> "1"))
    val k = Point.withSeriesKey(df).select("skey").head().getString(0)
    assert(k === "/x{a=1,b=2}")
  }

  test("seriesKey escapes separators — adversarial label maps don't collide") {
    val crafted = series(Seq(1L -> 1.0), "/x", Map("a" -> "1,b=2"))
    val plain = series(Seq(1L -> 1.0), "/x", Map("a" -> "1", "b" -> "2"))
    val kc = Point.withSeriesKey(crafted).select("skey").head().getString(0)
    val kp = Point.withSeriesKey(plain).select("skey").head().getString(0)
    assert(kc != kp)
    assert(kc === "/x{a=1\\,b\\=2}")
    assert(kp === "/x{a=1,b=2}")
  }
}
