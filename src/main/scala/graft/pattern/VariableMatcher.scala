package graft.pattern

import graft.model.Variable
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Compiles a variable search pattern into a Spark `Column` predicate over
 * the canonical point schema (`name`, `labels`). Composing built-in
 * functions keeps the predicate inside whole-stage codegen and lets
 * Catalyst push the name prefix/equality down to the Parquet scan.
 *
 * Match semantics are the union of the Go and C++ servers
 * (go/.../variable/variable.go:124-162, lib/variable.cc:107-131):
 *  - name: exact, or prefix when the pattern ends with `*`
 *  - label `k=v`: exact (label must exist)
 *  - label `k=*`: exists and non-empty
 *  - label `k=`: must NOT exist
 *  - label `k=/re/`: full regex match (C++-only extension)
 */
object VariableMatcher {

  def compile(pattern: Variable): Column = {
    val nameCol = col("name")
    val namePred =
      if (pattern.name.endsWith("*"))
        nameCol.startsWith(pattern.name.dropRight(1))
      else nameCol === pattern.name

    pattern.labels.foldLeft(namePred) { case (acc, (k, want)) =>
      val v = element_at(col("labels"), k)
      val pred = want match {
        case ""  => !map_contains_key(col("labels"), lit(k))
        case "*" => v.isNotNull && v =!= ""
        case re if re.length > 2 && re.head == '/' && re.last == '/' =>
          // rlike is substring-match; anchor for regex_match parity
          v.isNotNull && v.rlike("^(?:" + re.substring(1, re.length - 1) + ")$")
        case exact => v === exact // null-safe: missing label yields null -> false
      }
      acc && pred
    }
  }

  def compile(pattern: String): Column = compile(Variable.parse(pattern))
}
