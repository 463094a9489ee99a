package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a BIGINT column against a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (the sketch
  * `DataFrameStatFunctions.bloomFilter` produces) — the big-frontier path
  * of the k-hop traversal ([[graft.ops.Traverse]]): once a BFS frontier
  * outgrows the broadcast-join limit, the hop would otherwise exchange the
  * whole 2|E|-row adjacency; probing the frontier's Bloom filter INSIDE
  * the scan stage drops non-incident edges before the exchange, so the
  * shuffle carries ~(incident edges + fp-rate·|adjacency|) rows instead.
  * Zero false negatives (the exact join downstream keeps correctness);
  * the fp rate only pads the candidate set.
  *
  * A native `Expression` rather than a Scala UDF (SURVEY.md §4.2
  * preference order): the probe runs once per adjacency row — 2.4B rows
  * at the sf100 tier — so it must stay inside whole-stage codegen with no
  * boxing. The filter object rides the plan's reference array (serialized
  * once per stage with the task binary, not per row or per task).
  *
  * Not the fixed-8KB replayable [[graft.ops.Bloom]]: that sketch is sized
  * for oracle-replayable semi-joins over ~10³ keys; a multi-million-id
  * frontier needs the mutable sketch's bit budget, and this probe is a
  * pure pruning hint with no oracle surface.
  */
// `filter` is NOT @transient: the interpreted (non-codegen) eval path
// reaches the field on executors, and the sketch impl is Serializable.
case class LongBloomMightContain(child: Expression,
    filter: BloomFilter) extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"long_bloom_might_contain expects BIGINT input, got ${t.sql}")
  }

  override def prettyName: String = "long_bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
