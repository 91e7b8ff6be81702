package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Driver-contract regression tests for the SparkEntry surface. A query
 * without an oracle silently downgrades to a rows-only check at the
 * correctness gate, and the `++` merge of the four query maps silently
 * drops a colliding key — both failure modes land here instead.
 */
class EntryContractSpec extends AnyFunSuite {

  /** Queries whose oracle is DELIBERATELY omitted. Empty since round
    * 10: the former sketch-estimate entries (p_profile_approx,
    * ev_quantiles_approx) now hash (keys, exact stats, within_tol)
    * with the raw sketch value excluded, so every gate is hard-oracle
    * checked. A future rows-only entry must carry a written rationale
    * and an exact hash-gated sibling. */
  private val rowsOnlyQueries = Set.empty[String]

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- rowsOnlyQueries).isEmpty,
      s"queries without oracle SQL: ${(q -- o -- rowsOnlyQueries).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted}")
    assert((rowsOnlyQueries -- q).isEmpty && (rowsOnlyQueries & o.toSet).isEmpty,
      "rowsOnlyQueries must name real queries that have no oracle")
  }

  test("the module query maps never collide (++ would drop one side)") {
    val maps = Seq(
      "PipelineEntry" -> PipelineEntry.queries.keySet,
      "ApiEntry" -> ApiEntry.queries.keySet,
      "AnalyticsEntry" -> AnalyticsEntry.queries.keySet)
    for (Seq((na, a), (nb, b)) <- maps.combinations(2)) {
      val inter = a & b
      assert(inter.isEmpty, s"$na and $nb both define: ${inter.toSeq.sorted}")
    }
    val merged = maps.map(_._2.size).sum +
      (SparkEntry.queries.keySet -- maps.flatMap(_._2)).size
    assert(SparkEntry.queries.size == merged,
      "a core query name collides with a module query name")
  }

  test("query names are driver-safe slugs") {
    SparkEntry.queries.keySet.foreach { n =>
      assert(n.matches("^[a-z0-9_]+$"), s"bad query name: $n")
    }
  }

  /** CTE names REVIEWED to tolerate recursive-iteration UNION
    * semantics: duplicate edges cannot change a min-label connected
    * component (`e`/`ed`/`allp`), and `reach`/`r` are the intended
    * recursive CTEs. Everything else relying on plain UNION for
    * dedup under a RECURSIVE header is the round-8 d_dup_groups_multi
    * bug class (DuckDB gives EVERY plain-UNION CTE in a RECURSIVE
    * block iteration semantics — `SELECT 1 UNION SELECT 1` yields two
    * rows there): use `SELECT DISTINCT ... UNION ALL` instead. */
  private val reviewedRecursiveUnionCtes = Set("e", "ed", "allp", "reach", "r")

  test("oracle SQL: no unreviewed plain UNION inside a WITH RECURSIVE block") {
    val ctePat = """(?s)(\w+) AS \(""".r
    for ((name, sql) <- SparkEntry.oracleSql if sql.contains("RECURSIVE")) {
      ctePat.findAllMatchIn(sql).foreach { m =>
        val cte = m.group(1)
        // balance parens forward from the open to extract the body
        var depth = 1; var i = m.end
        while (depth > 0 && i < sql.length) {
          sql.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        val body = sql.substring(m.end, i - 1)
        val plainUnion = """UNION(?!\s+ALL)""".r.findFirstIn(body).isDefined
        assert(!plainUnion || reviewedRecursiveUnionCtes.contains(cte),
          s"oracle $name: CTE '$cte' uses plain UNION under WITH RECURSIVE — " +
            "no set-dedup there; use SELECT DISTINCT over UNION ALL or add " +
            "the CTE to reviewedRecursiveUnionCtes after review")
      }
    }
  }
}
