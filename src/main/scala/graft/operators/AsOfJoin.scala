package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (the
  * reference lacks it too; this is §7 extension surface). For each
  * left row, attach the most recent right row with
  * `right.ts <= left.ts`, matching on equi-keys.
  *
  * Spark-first plan instead of a range join: tag both sides, union,
  * and run ONE window over (keys) ordered by (ts, side) that carries
  * the last-seen right payload forward. Cost = one shuffle on the
  * key + an in-partition sort — linear in input, no candidate-pair
  * blowup, skew handled by AQE like any other shuffle. A range-join
  * formulation would be O(matches) with a nested-loop fallback;
  * this is O(n log n) always.
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       build side (its `payload` columns are carried)
    * @param keys        equi-join column names present on both sides
    * @param leftTs      event-time column on `left`
    * @param rightTs     event-time column on `right`
    * @param payload     columns of `right` to attach (prefixed names
    *                    must not collide with `left`'s)
    * @return `left` columns + payload columns (null when no right row
    *         at or before the left timestamp exists)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(right.columns.contains), "payload must exist on right")
    require(payload.forall(p => !leftCols.contains(p)),
      s"payload names collide with left columns: ${payload.filter(leftCols.contains)}")

    // Right side sorts BEFORE left at equal ts (side 0 < 1) → ties are
    // inclusive: a right row at exactly left.ts matches.
    //
    // The payload travels as ONE struct so the whole matched row is
    // carried atomically — per-column last(ignoreNulls) would skip a
    // legitimately-NULL payload field and stitch together values from
    // DIFFERENT right rows. The struct itself is non-null for every
    // right row (even when all its fields are null), so
    // last(ignoreNulls=true) always lands on the latest matching row.
    val payloadStruct = struct(payload.map(col): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p))))
    val taggedLeft = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
      .select(keys.map(col) ++ Seq(col("_asof_ts"), col("_asof_side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        nullPayload.as("_asof_payload"): _*)
    val taggedRight = right
      .withColumn("_asof_ts", col(rightTs))
      .withColumn("_asof_side", lit(0))
      .select(keys.map(col) ++ Seq(col("_asof_ts"), col("_asof_side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("_asof_payload"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts").asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("_asof_payload", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_asof_payload").getField(p).as(p)): _*)
  }
}
