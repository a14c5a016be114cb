package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Declarative row-level data-quality checks, evaluated in ONE job — the
  * generalized form of the reference's per-script debug checks (and of
  * AirbnbEtl.validate's fixed invariant set): callers declare
  * (name, violation predicate) pairs and get back one (check_name,
  * n_violations) row each, from a single scan.
  *
  * Row-level predicates only (non-null, range, domain, format): each check
  * becomes one conditional count in a single aggregate, so adding a check
  * costs zero extra passes. Cross-row invariants (key uniqueness, FK
  * orphans) need joins/aggregates of their own — that is
  * `AirbnbEtl.validate`'s job; this runner deliberately refuses the
  * temptation to hide a shuffle behind a predicate.
  */
object QualityChecks {

  /** @param checks (name, violation predicate) — a row matching the
    *               predicate COUNTS AS A VIOLATION.
    */
  def run(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "declare at least one check")
    require(checks.map(_._1).distinct.size == checks.size, "check names must be unique")
    val aggs = checks.map { case (n, viol) =>
      count(when(viol, 1)).cast(LongType).as(n)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack the single wide row into (check_name, n_violations) rows
    val stackArgs = checks.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    one.select(expr(
      s"stack(${checks.size}, $stackArgs) AS (check_name, n_violations)"))
  }
}
