package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salting changes routing, never results. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // skewed: 90% of rows share key 1
  private lazy val facts = ((1 to 90).map(i => (1L, i.toDouble))
    ++ Seq((2L, 1.0), (3L, 2.0))).toDF("k", "v")
  private lazy val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")

  test("saltedJoin equals the plain join") {
    val plain = facts.join(dim, Seq("k")).orderBy("k", "v").collect().toSeq
    val salted = Skew.saltedJoin(facts, dim, "k").orderBy("k", "v")
      .select("k", "v", "name").collect().toSeq
    assert(salted == plain)
  }

  test("salt is deterministic: no nondeterministic expression in the salted plan") {
    // a monotonically_increasing_id/rand salt re-routes rows on stage
    // retry; the content-hash salt must keep the plan fully deterministic.
    val plan = Skew.saltedJoin(facts, dim, "k").queryExecution.optimizedPlan.toString
    assert(!plan.contains("monotonically_increasing_id") && !plan.contains("rand("),
      s"nondeterministic salt in plan:\n$plan")
  }

  test("saltedAggregate equals the plain aggregate") {
    val plain = facts.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(facts, "k", factor = 4,
      partialAggs = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      finalAggs = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }
}
