package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Compiler for the Chroma-style `where` metadata-filter surface the
  * reference's server accepts (the client itself never sends one —
  * SURVEY.md §2.1 "projection/filter: none" — so this is the §7
  * extension making that implied capability local).
  *
  * Grammar (per Chroma's public query API):
  *   {field: value}                        — implicit $eq
  *   {field: {$eq|$ne|$gt|$gte|$lt|$lte: value}}
  *   {field: {$in|$nin: [values...]}}
  *   {$and|$or: [filters...]}
  *
  * Compiles to a single Catalyst `Column` predicate, so it
  * participates in predicate pushdown into the parquet scan like any
  * hand-written filter — the engine never materializes unfiltered
  * rows.
  *
  * Field references resolve through a pluggable `FieldResolver` so
  * the same grammar filters plain columns (documents table) or JSON
  * metadata extractions (collection items): the resolver receives the
  * field name and whether the comparison value is numeric (JSON
  * extractions need a cast in that case).
  */
object WhereFilter {

  /** (fieldName, comparisonIsNumeric) → column to compare. */
  type FieldResolver = (String, Boolean) => Column

  private val plainColumns: FieldResolver = (field, _) => col(field)

  def compile(whereJson: String): Column = compileWith(whereJson, plainColumns)

  def compileWith(whereJson: String, resolver: FieldResolver): Column =
    compileFilter(JsonMethods.parse(whereJson), resolver)

  /** Compiler for the `where_document` document-content filter Chroma
    * pairs with the metadata `where` grammar above:
    *   {$contains: "substr"} | {$not_contains: "substr"}
    *   {$and|$or: [document filters...]}
    * Compiles to a plain `Column` predicate over the supplied document
    * column (a `contains` — codegen'd, pushdown-eligible), so it
    * composes with the metadata predicate in the same scan filter. A
    * NULL document matches nothing, $not_contains included — matching
    * the tri-state SQL semantics the oracle computes.
    */
  def compileDocument(whereDocJson: String, doc: Column): Column =
    compileDocFilter(JsonMethods.parse(whereDocJson), doc)

  private def compileDocFilter(v: JValue, doc: Column): Column = v match {
    case JObject(Nil) => lit(true)
    case JObject(fields) =>
      fields.map {
        case ("$and", JArray(fs)) =>
          fs.map(compileDocFilter(_, doc)).reduceOption(_ && _).getOrElse(lit(true))
        case ("$or", JArray(fs)) =>
          fs.map(compileDocFilter(_, doc)).reduceOption(_ || _).getOrElse(lit(false))
        case ("$contains", JString(s))     => doc.contains(lit(s))
        case ("$not_contains", JString(s)) => !doc.contains(lit(s))
        case (op, value) => throw new IllegalArgumentException(
          s"unsupported where_document clause: $op: $value " +
            "($contains | $not_contains | $and | $or, string operands)")
      }.reduce(_ && _) // multiple top-level clauses = implicit $and
    case other =>
      throw new IllegalArgumentException(s"where_document filter must be an object, got $other")
  }

  private def compileFilter(v: JValue, r: FieldResolver): Column = v match {
    case JObject(Nil) => lit(true) // empty where = match everything
    case JObject(fields) =>
      fields.map {
        // identity elements, not reduce-on-empty crashes:
        // AND of nothing is true, OR of nothing is false
        case ("$and", JArray(fs)) =>
          fs.map(compileFilter(_, r)).reduceOption(_ && _).getOrElse(lit(true))
        case ("$or", JArray(fs)) =>
          fs.map(compileFilter(_, r)).reduceOption(_ || _).getOrElse(lit(false))
        case (field, cond) => compileField(field, cond, r)
      }.reduce(_ && _) // multiple top-level fields = implicit $and
    case other => throw new IllegalArgumentException(s"where filter must be an object, got $other")
  }

  private def compileField(field: String, cond: JValue, r: FieldResolver): Column = cond match {
    case JObject(ops) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
      ops.map { case (op, value) => applyOp(field, op, value, r) }.reduce(_ && _)
    case value => r(field, isNumeric(value)) === literal(value) // implicit $eq
  }

  private def applyOp(field: String, op: String, value: JValue, r: FieldResolver): Column = {
    def f: Column = r(field, isNumeric(value))
    op match {
      case "$eq"  => f === literal(value)
      case "$ne"  => f =!= literal(value)
      case "$gt"  => f > literal(value)
      case "$gte" => f >= literal(value)
      case "$lt"  => f < literal(value)
      case "$lte" => f <= literal(value)
      case "$in"  => value match {
        case JArray(vs) => r(field, vs.exists(isNumeric)).isin(vs.map(scalaValue): _*)
        case v          => throw new IllegalArgumentException(s"$$in needs an array, got $v")
      }
      case "$nin" => value match {
        case JArray(vs) => !r(field, vs.exists(isNumeric)).isin(vs.map(scalaValue): _*)
        case v          => throw new IllegalArgumentException(s"$$nin needs an array, got $v")
      }
      case other  => throw new IllegalArgumentException(s"unsupported where operator: $other")
    }
  }

  private def isNumeric(v: JValue): Boolean = v match {
    case _: JInt | _: JLong | _: JDouble | _: JDecimal => true
    case _ => false
  }

  private def literal(v: JValue): Column = lit(scalaValue(v))

  private def scalaValue(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case JNull       => null
    case other       => throw new IllegalArgumentException(s"unsupported literal: $other")
  }
}
