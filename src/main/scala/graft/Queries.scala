package graft

import scala.collection.immutable.ListMap

/** Aggregated declared-query inventory (SURVEY.md §2.2). Each module
  * contributes a ListMap so ordering is stable for Verify/Bench output.
  * A duplicate key across modules would silently SHADOW the earlier
  * definition through `++` — one oracle would grade another module's
  * query — so the merge fails loudly instead.
  */
object Queries {
  def all: ListMap[String, QueryDef] = {
    val parts = Seq(QueriesRelational.defs, QueriesGraph.defs,
      QueriesWindows.defs, QueriesLlm.defs, QueriesGraphX.defs)
    val merged = parts.reduce(_ ++ _)
    if (merged.size != parts.map(_.size).sum) {
      val dups = parts.flatMap(_.keys).groupBy(identity)
        .collect { case (k, vs) if vs.size > 1 => k }
      throw new IllegalStateException(
        s"duplicate query keys across modules: ${dups.mkString(", ")}")
    }
    merged
  }
}
