package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{float_dot, float_norm}

/** Custom codegen'd FloatDotProduct expression: value parity with the
  * composable HOF form, null handling, codegen + interpreted paths.
  */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -0.5f), Array(2.0f, 2.0f))
  ).toDF("id", "a", "b")

  test("float_dot matches the aggregate/zip_with HOF form bit-for-bit") {
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val rows = df.select(float_dot(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("null input → null output") {
    val withNull = Seq((1L, Array(1.0f), null.asInstanceOf[Array[Float]]))
      .toDF("id", "a", "b")
    assert(withNull.select(float_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("float_norm is the L2 norm") {
    val n = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("a")
      .select(float_norm(col("a"))).head().getDouble(0)
    assert(n == 5.0)
  }

  test("float_dot is callable from SQL after registration") {
    graft.functions.VectorFunctions.register(spark)
    val v = spark.sql(
      """SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(v == 11.0)
  }

  test("GraftExtensions injects the function builder") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(e) // must not throw
  }

  test("sorted_intersect_count is callable from SQL after registration") {
    graft.functions.ArrayFunctions.register(spark)
    val n = spark.sql(
      """SELECT sorted_intersect_count(array(1L, 3L, 5L, 7L),
        |                              array(2L, 3L, 5L, 9L)) AS n""".stripMargin)
      .head().getLong(0)
    assert(n == 2L)
  }

  test("interpreted eval path (wholestage codegen off) agrees") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val v = df.filter(col("id") === 1)
        .select(float_dot(col("a"), col("b"))).head().getDouble(0)
      assert(v == 32.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("sorted_intersect_count: two-pointer merge matches array_intersect; null-safe") {
    import graft.functions.ArrayFunctions.sorted_intersect_count
    val pairs = Seq(
      (Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L, 9L)),   // {3,5} -> 2
      (Array(1L, 2L), Array(3L, 4L)),                    // disjoint -> 0
      (Array[Long](), Array(1L)),                        // empty -> 0
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L))             // identical -> 3
    ).toDF("a", "b")
    val got = pairs.select(sorted_intersect_count(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got == Seq(2L, 0L, 0L, 3L))
    val viaBuiltin = pairs
      .select(size(array_intersect(col("a"), col("b"))).cast("long")).as[Long].collect().toSeq
    assert(got == viaBuiltin)
    val withNull = Seq((Array(1L), null.asInstanceOf[Array[Long]])).toDF("a", "b")
    assert(withNull.select(sorted_intersect_count(col("a"), col("b"))).head().isNullAt(0))
  }

  // ---- NearestCenterOrder (IVF probe order) -------------------------------

  private val centers3 = Array(
    Array(0.0f, 0.0f), Array(10.0f, 0.0f), Array(0.0f, 10.0f))

  /** Brute-force reference: argsort by (c2 − 2·v·c, cell). */
  private def bruteOrder(v: Array[Float], cs: Array[Array[Float]]): Seq[Int] = {
    val d = cs.map { c =>
      val c2 = c.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)
      val dot = v.zip(c).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
      c2 - 2.0 * dot
    }
    cs.indices.sortBy(i => (d(i), i))
  }

  test("nearest_cells: probe order matches the brute-force argsort") {
    import graft.functions.NearestCells.nearest_cells
    val vecs = Seq(
      Array(1.0f, 1.0f), Array(9.0f, 1.0f), Array(1.0f, 9.0f), Array(5.0f, 5.0f))
    val got = vecs.map(Tuple1(_)).toDF("v")
      .select(nearest_cells(col("v"), centers3)).as[Seq[Int]].collect().toSeq
    assert(got == vecs.map(v => bruteOrder(v, centers3)))
  }

  test("nearest_cells: equidistant ties break to the lower cell index") {
    import graft.functions.NearestCells.nearest_cells
    // duplicate centers → every distance ties → identity order
    val dup = Array(Array(1.0f, 1.0f), Array(1.0f, 1.0f), Array(1.0f, 1.0f))
    val got = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
      .select(nearest_cells(col("v"), dup)).as[Seq[Int]].head()
    assert(got == Seq(0, 1, 2))
  }

  test("nearest_cells: short (ragged) vector uses the overlapping prefix; null vector → null") {
    import graft.functions.NearestCells.nearest_cells
    val short = Seq(Tuple1(Array(9.0f))).toDF("v") // dim 1 vs centers dim 2
      .select(nearest_cells(col("v"), centers3)).as[Seq[Int]].head()
    // dots use the 1-elem prefix: d = c2 - 2*9*c(0) → cell1 (100-180=-80) wins
    assert(short.head == 1)
    val nul = Seq(Tuple1(null.asInstanceOf[Array[Float]])).toDF("v")
      .select(nearest_cells(col("v"), centers3))
    assert(nul.head().isNullAt(0))
  }

  test("nearest_cells: interpreted eval agrees with codegen") {
    import graft.functions.NearestCells.nearest_cells
    val v = Array(1.0f, 9.0f)
    def run(): Seq[Int] = Seq(Tuple1(v)).toDF("v")
      .select(nearest_cells(col("v"), centers3)).as[Seq[Int]].head()
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == gen && gen == bruteOrder(v, centers3))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
