package graft

/** Full-inventory fixture smoke: every declared query must EXECUTE against
  * the real driver testdata shape (r9 shipped three queries that analyzed
  * fine in unit fixtures but threw `DATATYPE_MISMATCH` on the parquet
  * fixture's TIMESTAMP_NTZ `ts` — and `sbt test` stayed green because no
  * spec ran the inventory against the shipped files). The noop-format write
  * forces full analysis + physical planning + execution without collecting
  * results to the driver. Failures accumulate so one broken query doesn't
  * hide the rest.
  */
class InventorySmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("all declared queries execute against the sf0.001 fixture") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} of ${SparkEntry.queries.size} queries failed on the fixture:\n  " +
        failures.mkString("\n  "))
  }
}
