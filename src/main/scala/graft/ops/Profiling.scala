package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the land-then-look primitive every ingestion pipeline
  * runs before trusting a new table: per-column null counts, exact
  * distinct cardinalities, and (for integral columns) min/max, all in ONE
  * aggregation pass over the data, unpivoted to one row per column.
  *
  * Min/max are reported for integral columns only: they round-trip to the
  * output schema without any engine-specific string formatting (double
  * and timestamp rendering differ between engines in exponent/fraction
  * corner cases, which would poison an exact-value oracle for zero
  * profiling value — cardinality and completeness are the signals that
  * matter). At 100 TB the pass is one scan: the distinct counts expand the
  * scan k-ways (Spark's multi-distinct Expand), each stream map-side
  * partially aggregated; swap `countDistinct` for
  * `approx_count_distinct` when exactness isn't required (`agg_sketch`
  * shows that path).
  */
object Profiling {

  /** One row per profiled column: `(col_name, n_rows, n_nulls,
    * n_distinct, min_long, max_long)` — min/max NULL for non-integral
    * columns. `intCols` must be a subset of `cols`.
    */
  def profile(df: DataFrame, cols: Seq[String], intCols: Set[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(intCols.subsetOf(cols.toSet), s"intCols must be ⊆ cols")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c")) ++
        (if (intCols(c))
          Seq(min(col(c)).cast("long").as(s"__mn_$c"),
            max(col(c)).cast("long").as(s"__mx_$c"))
        else Nil)
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        (if (intCols(c)) col(s"__mn_$c") else lit(null).cast("long")).as("min_long"),
        (if (intCols(c)) col(s"__mx_$c") else lit(null).cast("long")).as("max_long"))
    }
    row.select(explode(array(structs: _*)).as("__p")).select("__p.*")
  }

  /** DuckDB mirror of [[profile]] — generated from the SAME column lists
    * so the oracle cannot silently diverge (one UNION ALL arm per column).
    * The ORDER BY-less body is exposed separately so multi-profile
    * oracles (profile_drift joins two of them) can embed it as a CTE.
    */
  def profileOracleBody(table: String, cols: Seq[String], intCols: Set[String]): String =
    cols.map { c =>
      val (mn, mx) =
        if (intCols(c)) (s"CAST(MIN($c) AS BIGINT)", s"CAST(MAX($c) AS BIGINT)")
        else ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)")
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $mn AS min_long, $mx AS max_long FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  def profileOracleSql(table: String, cols: Seq[String], intCols: Set[String]): String =
    profileOracleBody(table, cols, intCols) + "\nORDER BY col_name"
}
