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
  */
object WhereFilter {

  def compile(whereJson: String): Column =
    compileFilter(JsonMethods.parse(whereJson))

  private def compileFilter(v: JValue): Column = v match {
    case JObject(fields) =>
      fields.map {
        case ("$and", JArray(fs)) => fs.map(compileFilter).reduce(_ && _)
        case ("$or", JArray(fs))  => fs.map(compileFilter).reduce(_ || _)
        case (field, cond)        => compileField(field, cond)
      }.reduce(_ && _) // multiple top-level fields = implicit $and
    case other => throw new IllegalArgumentException(s"where filter must be an object, got $other")
  }

  private def compileField(field: String, cond: JValue): Column = cond match {
    case JObject(ops) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
      ops.map { case (op, value) => applyOp(field, op, value) }.reduce(_ && _)
    case value => col(field) === literal(value) // implicit $eq
  }

  private def applyOp(field: String, op: String, value: JValue): Column = op match {
    case "$eq"  => col(field) === literal(value)
    case "$ne"  => col(field) =!= literal(value)
    case "$gt"  => col(field) > literal(value)
    case "$gte" => col(field) >= literal(value)
    case "$lt"  => col(field) < literal(value)
    case "$lte" => col(field) <= literal(value)
    case "$in"  => value match {
      case JArray(vs) => col(field).isin(vs.map(scalaValue): _*)
      case v          => throw new IllegalArgumentException(s"$$in needs an array, got $v")
    }
    case "$nin" => value match {
      case JArray(vs) => !col(field).isin(vs.map(scalaValue): _*)
      case v          => throw new IllegalArgumentException(s"$$nin needs an array, got $v")
    }
    case other  => throw new IllegalArgumentException(s"unsupported where operator: $other")
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
