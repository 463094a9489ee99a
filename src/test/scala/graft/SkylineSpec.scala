package graft

import org.apache.spark.sql.functions._
import graft.ops.Skyline

/** Skyline contract: exactly the non-dominated points (checked against a
  * brute-force dominance sweep on seeded random data), layout-invariant,
  * strictly-increasing x / strictly-decreasing y along the frontier, and
  * the two-level form equals the single-window spelling.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def randomPts(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(1000).toDouble, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
  }

  private def brute(pts: Seq[(Double, Long)]): Set[(Double, Long)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y)
      }
    }.toSet
  }

  test("skyline equals the brute-force non-dominated set (seeded)") {
    for (seed <- Seq(1, 42, 99)) {
      val df = randomPts(400, seed)
      val got = Skyline.skyline2D(df, "x", "y")
        .as[(Double, Long)].collect().toSet
      val want = brute(df.as[(Double, Long)].collect().toSeq)
      assert(got == want, s"seed $seed: got ${got.size}, want ${want.size}")
    }
  }

  test("frontier is strictly increasing in x and strictly decreasing in y") {
    val out = Skyline.skyline2D(randomPts(2000, 7), "x", "y")
      .orderBy("x").as[(Double, Long)].collect().toSeq
    out.sliding(2).foreach {
      case Seq((x1, y1), (x2, y2)) => assert(x1 < x2 && y1 > y2)
      case _ =>
    }
  }

  test("layout-invariant, duplicate-blind, and bucket-count independent") {
    val df = randomPts(1500, 13)
    val a = Skyline.skyline2D(df.repartition(1), "x", "y")
      .as[(Double, Long)].collect().toSet
    val b = Skyline.skyline2D(df.repartition(17), "x", "y")
      .as[(Double, Long)].collect().toSet
    val c = Skyline.skyline2D(df.unionAll(df), "x", "y")
      .as[(Double, Long)].collect().toSet
    val d = Skyline.skyline2D(df, "x", "y", buckets = 3)
      .as[(Double, Long)].collect().toSet
    assert(a == b && a == c && a == d && a.nonEmpty)
  }

  test("degenerate inputs: constant x, single point, empty") {
    val const = Seq((5.0, 9L), (5.0, 3L), (5.0, 7L)).toDF("x", "y")
    assert(Skyline.skyline2D(const, "x", "y").as[(Double, Long)].collect().toSeq
      == Seq((5.0, 3L)))
    val one = Seq((1.0, 1L)).toDF("x", "y")
    assert(Skyline.skyline2D(one, "x", "y").count() == 1)
    assert(Skyline.skyline2D(one.filter(col("x") < 0), "x", "y").count() == 0)
  }
}
