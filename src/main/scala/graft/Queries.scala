package graft

import scala.collection.immutable.ListMap

/** Aggregated declared-query inventory (SURVEY.md §2.2). Each module
  * contributes a ListMap so ordering is stable for Verify/Bench output.
  */
object Queries {
  def all: ListMap[String, QueryDef] =
    QueriesRelational.defs ++ QueriesGraph.defs ++ QueriesWindows.defs ++
      QueriesLlm.defs ++ QueriesGraphX.defs
}
