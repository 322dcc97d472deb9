package graft.relational

import graft.SparkSpec

class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("correlated subquery: strictly-above-average parts per brand") {
    // brand X: prices 1, 2, 3 (avg 2) -> only 3 is above
    // brand Y: prices 10, 10 (avg 10) -> none above (strict >)
    val parts = Seq(
      ("X", 1.0), ("X", 2.0), ("X", 3.0), ("Y", 10.0), ("Y", 10.0))
      .toDF("p_brand", "p_retailprice")
    val out = SqlSurface.aboveBrandAverage(parts)
      .as[(String, Long)].collect().toMap
    assert(out == Map("X" -> 1L))
  }

  test("correlated subquery decorrelates: no per-row subquery in the plan") {
    val parts = Seq(("X", 1.0), ("X", 3.0)).toDF("p_brand", "p_retailprice")
    val plan = SqlSurface.aboveBrandAverage(parts).queryExecution.optimizedPlan
    // RewriteCorrelatedScalarSubquery must have turned the subquery into
    // an aggregate+join; a surviving subquery expression would execute
    // once per outer row
    val subqueries = plan.expressions.flatMap(_.collect {
      case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s
    })
    assert(subqueries.isEmpty)
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
  }
}
