package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Replayable HLL: the estimate must land within the sketch's standard
  * error of the exact cardinality, registers must be duplicate-blind and
  * mergeable-shaped, and the whole thing layout-invariant.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within ~3 standard errors of exact cardinality (m=256 → 6.5% se)") {
    for (n <- Seq(2000L, 20000L)) {
      val df = spark.range(n).select(lit("g").as("grp"), (col("id") * 7919L + 13L).as("k"))
      val est = Sketches.hllReplayable(df, "grp", "k")
        .select("est_hll").as[Double].head()
      assert(math.abs(est - n) / n < 0.2, s"n=$n est=$est")
    }
  }

  test("duplicate-blind: repeating every key 5x changes nothing") {
    val base = spark.range(5000).select(lit("g").as("grp"), col("id").as("k"))
    val dup = base.union(base).union(base).union(base).union(base)
    val a = Sketches.hllReplayable(base, "grp", "k").collect().toSeq
    val b = Sketches.hllReplayable(dup, "grp", "k").collect().toSeq
    assert(a == b)
  }

  test("layout-invariant and grouped: per-group registers are independent") {
    val df = spark.range(12000)
      .select((col("id") % 3).cast("string").as("grp"), col("id").as("k"))
    val a = Sketches.hllReplayable(df, "grp", "k").orderBy("grp").collect().toSeq
    val b = Sketches.hllReplayable(df.repartition(17), "grp", "k")
      .orderBy("grp").collect().toSeq
    assert(a == b)
    // 3 groups of ~4000 distinct keys each
    a.foreach { r =>
      val est = r.getDouble(3)
      assert(math.abs(est - 4000.0) / 4000.0 < 0.25, s"group ${r.getString(0)}: $est")
    }
  }

  test("z_scaled stays far inside exact BIGINT range (no silent precision loss)") {
    val df = spark.range(100000).select(lit("g").as("grp"), col("id").as("k"))
    val z = Sketches.hllReplayable(df, "grp", "k").select("z_scaled").as[Long].head()
    assert(z > 0 && z <= 256L * (1L << 31), s"z=$z out of the provable bound")
  }
}
