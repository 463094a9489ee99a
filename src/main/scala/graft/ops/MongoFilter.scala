package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Mongo-filter-document → Catalyst `Column` compiler.
  *
  * Preserves the reference's entire ad-hoc query surface — `search_vertex`
  * accepts an arbitrary MongoDB query document evaluated server-side
  * (mongraph.py:215-226); here the document compiles to a Column expression
  * tree that Catalyst then optimizes and pushes into the parquet scan, so a
  * filter that Mongo would run as an unindexed collection scan becomes a
  * row-group-pruned columnar scan at 100 TB.
  *
  * Supported operators: `\$eq \$ne \$gt \$gte \$lt \$lte \$in \$nin \$and
  * \$or \$nor \$not \$exists \$regex` — the set SURVEY.md §2.1 row 12 calls
  * for — plus the array/arithmetic operators `\$size \$all \$elemMatch
  * \$mod` (array ones compile to codegen'd collection functions; the
  * `\$elemMatch` lambda is a Catalyst HOF, still whole-plan optimizable).
  * `\$regex` uses find-anywhere semantics (`rlike`), matching Mongo.
  * Dotted paths resolve through struct fields or map keys depending on the
  * DataFrame schema (the reference's documents are schemaless; our `props`
  * map plays that role).
  *
  * Schemaless caveat (Mongo-faithful, deliberate): a bare field name absent
  * from the DataFrame schema falls back to a `props` map probe, so a TYPO'D
  * schema column (e.g. `labell`) does not fail analysis — it compiles to a
  * NULL map probe and matches nothing, exactly as Mongo returns an empty
  * cursor for a filter on a field no document has. Empty results from a
  * misspelled schema column are this fallback, not an engine bug; filters
  * on schema columns should spell them as the schema does.
  */
object MongoFilter {

  /** Compile a JSON filter document against `df`'s schema. */
  def compile(df: DataFrame, filterJson: String): Column =
    compileDoc(df, JsonMethods.parse(filterJson).asInstanceOf[JObject])

  def where(df: DataFrame, filterJson: String): DataFrame =
    df.filter(compile(df, filterJson))

  private def compileDoc(df: DataFrame, doc: JObject): Column =
    doc.obj.map { case (k, v) => compileField(df, k, v) }
      .reduceOption(_ && _).getOrElse(lit(true))

  private def compileField(df: DataFrame, key: String, v: JValue): Column = (key, v) match {
    case ("$and", JArray(docs)) =>
      docs.map(d => compileDoc(df, d.asInstanceOf[JObject])).reduce(_ && _)
    case ("$or", JArray(docs)) =>
      docs.map(d => compileDoc(df, d.asInstanceOf[JObject])).reduce(_ || _)
    case ("$nor", JArray(docs)) =>
      // NULL→false BEFORE negating: a missing props key makes the inner
      // match SQL-NULL, and ¬NULL = NULL would silently drop the document
      // where Mongo's match/no-match semantics says $nor MATCHES it. (Same
      // normalization at every negation head: $not, $nin; $ne uses <=>.)
      !coalesce(docs.map(d => compileDoc(df, d.asInstanceOf[JObject])).reduce(_ || _),
        lit(false))
    case (field, JObject(ops)) if ops.forall(_._1.startsWith("$")) =>
      ops.map { case (op, arg) => compileOp(resolve(df, field), op, arg) }.reduce(_ && _)
    case (field, value) => // bare equality
      resolve(df, field) === literal(value)
  }

  private def compileOp(c: Column, op: String, arg: JValue): Column = op match {
    case "$eq"  => c === literal(arg)
    case "$ne"  => !(c <=> literal(arg)) // Mongo $ne also matches missing fields
    case "$gt"  => c > literal(arg)
    case "$gte" => c >= literal(arg)
    case "$lt"  => c < literal(arg)
    case "$lte" => c <= literal(arg)
    case "$in"  => c.isin(arg.asInstanceOf[JArray].arr.map(raw): _*)
    case "$nin" => // NULL→false pre-negation (missing field → $nin matches, like Mongo)
      !coalesce(c.isin(arg.asInstanceOf[JArray].arr.map(raw): _*), lit(false))
    case "$exists" =>
      if (arg == JBool(true)) c.isNotNull else c.isNull
    case "$regex" => c.rlike(arg.asInstanceOf[JString].s)
    case "$not" => // NULL→false pre-negation (missing field → $not matches, like Mongo)
      !coalesce(compileOps(c, arg.asInstanceOf[JObject]), lit(false))
    case "$size" => size(c) === literal(arg).cast("int")
    case "$all" =>
      // Mongo: {field: {$all: []}} matches NO documents.
      arg.asInstanceOf[JArray].arr.map(v => array_contains(c, raw(v)))
        .reduceOption(_ && _).getOrElse(lit(false))
    case "$elemMatch" =>
      exists(c, e => compileElemMatch(e, arg.asInstanceOf[JObject]))
    case "$mod" =>
      // Mongo raises on a zero divisor; a null-producing comparison here
      // would silently match nothing instead — fail at compile time. The
      // check runs on the TRUNCATED long (Mongo truncates $mod args), so a
      // fractional 0.5 divisor is caught too; non-numeric divisors throw.
      val args = arg.asInstanceOf[JArray].arr
      if (args.length != 2)
        throw new IllegalArgumentException(
          s"$$mod requires exactly [divisor, remainder], got ${args.length} argument(s)")
      val divisor = raw(args.head) match {
        case l: Long => l
        case d: Double => d.toLong
        case other => throw new IllegalArgumentException(
          s"$$mod requires a numeric divisor, got $other")
      }
      if (divisor == 0L)
        throw new IllegalArgumentException("$mod divisor must be non-zero")
      val Seq(d, r) = args.map(v => lit(raw(v)).cast("long"))
      c.cast("long") % d === r
    case other  => throw new IllegalArgumentException(s"unsupported operator $other")
  }

  private def compileOps(c: Column, ops: JObject): Column =
    ops.obj.map { case (op, arg) => compileOp(c, op, arg) }.reduce(_ && _)

  /** `\$elemMatch` body: Mongo accepts BOTH the operator form
    * (`{\$gt: 5}` — predicates on the element itself) and the
    * field-document form (`{score: {\$gt: 5}, ok: true}` — predicates on
    * fields of struct elements). Keys starting with `\$` are operators on
    * the element; any other key resolves as a field of the element struct.
    */
  private def compileElemMatch(e: Column, doc: JObject): Column =
    doc.obj.map {
      case (op, arg) if op.startsWith("$") => compileOp(e, op, arg)
      case (field, JObject(ops)) => compileOps(e.getField(field), JObject(ops))
      case (field, value) => e.getField(field) === literal(value)
    }.reduce(_ && _)

  /** Resolve a possibly dotted field path: `props.x` is map access when
    * `props` is a MapType (schemaless attributes), struct access otherwise.
    * A bare field prefers a real schema column when one exists — a PROMOTED
    * typed hot attribute (PropertyGraph.promote, SURVEY §1.2) then compiles
    * to a pushdown-able column predicate instead of a map probe — and falls
    * back to the `props` map for everything else, preserving the
    * reference's schemaless attribute surface.
    */
  private def resolve(df: DataFrame, field: String): Column =
    field.split("\\.", 2) match {
      case Array(head, rest) if df.schema.fieldNames.contains(head)
          && df.schema(head).dataType.isInstanceOf[MapType] =>
        col(head).getItem(rest)
      case Array(head) if !df.schema.fieldNames.contains(head)
          && df.schema.fieldNames.contains("props")
          && df.schema("props").dataType.isInstanceOf[MapType] =>
        col("props").getItem(head)
      case _ => col(field)
    }

  private def literal(v: JValue): Column = lit(raw(v))

  private def raw(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case JNull       => null
    case other       => throw new IllegalArgumentException(s"unsupported literal $other")
  }
}
