package graft.operators

import graft.pattern.VariableMatcher
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch alert-rule evaluation — "aggregate of a variable set crosses a
 * threshold for ≥ N consecutive grid periods". The reference stores
 * metrics and leaves alerting to its clients; here the rule is one
 * declarative plan (the m_alert gate query, generalized): grid
 * aggregate per name → condition filter → gap sessionization of the
 * violating periods (gap > interval splits an episode) → episode
 * stats with the min-periods gate. Two shuffles total (grid agg,
 * episode window), both on the name key — scale-invariant in episode
 * count.
 *
 * Rules come from the reference-style text config via
 * [[graft.config.StoreConfig.parse]]; the streaming twin over raw
 * points is [[graft.streaming.StreamIngest.alertStream]].
 */
object Alerts {

  /** Comparison applied to the gridded value. */
  sealed abstract class Condition(val apply: (org.apache.spark.sql.Column,
      Double) => org.apache.spark.sql.Column)
  case object Gt extends Condition((c, t) => c > t)
  case object Ge extends Condition((c, t) => c >= t)
  case object Lt extends Condition((c, t) => c < t)
  case object Le extends Condition((c, t) => c <= t)
  object Condition {
    def apply(s: String): Condition = s match {
      case "GT" => Gt
      case "GE" => Ge
      case "LT" => Lt
      case "LE" => Le
      case other => throw new IllegalArgumentException(s"condition $other")
    }
  }

  /**
   * @param patterns   variable patterns (any-of); empty = all variables
   * @param agg        grid aggregation (StreamAggregation enum subset)
   * @param intervalMs grid interval; also the episode gap (one missing
   *                   period ends an episode)
   * @param minPeriods minimum violating periods for an episode to fire
   */
  final case class AlertRule(
      patterns: Seq[String],
      agg: Aggregations.AggType,
      intervalMs: Long,
      condition: Condition,
      threshold: Double,
      minPeriods: Int,
      comment: String = "")

  /**
   * Fired episodes for one rule over canonical points. Output:
   * `name, session, t_start, t_end, n_periods, peak` (peak = max
   * gridded value in the episode, rounded to 4).
   */
  def evaluate(points: DataFrame, rule: AlertRule): DataFrame = {
    val scoped =
      if (rule.patterns.isEmpty) points
      else points.filter(rule.patterns.map(VariableMatcher.compile).reduce(_ || _))
    val grid = Aggregations.byName(scoped, rule.agg, rule.intervalMs)
    val viol = Sessions.sessionize(
      grid.filter(rule.condition.apply(col("dval"), rule.threshold)),
      col("name"), col("ts"), rule.intervalMs)
    viol.groupBy(col("name"), col("session"))
      .agg(min("ts").as("t_start"), max("ts").as("t_end"),
        count(lit(1)).as("n_periods"), round(max("dval"), 4).as("peak"))
      .filter(col("n_periods") >= rule.minPeriods)
  }

  /** All rules of a config, unioned, tagged by rule index + comment. */
  def evaluateAll(points: DataFrame, rules: Seq[AlertRule]): DataFrame = {
    require(rules.nonEmpty, "no alert rules configured")
    rules.zipWithIndex
      .map { case (r, i) =>
        evaluate(points, r)
          .withColumn("rule_id", lit(i))
          .withColumn("rule", lit(r.comment))
      }
      .reduce(_ unionByName _)
  }
}
