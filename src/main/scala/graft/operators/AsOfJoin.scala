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
    val taggedLeft = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
      .select(keys.map(col) ++ Seq(col("_asof_ts"), col("_asof_side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val taggedRight = right
      .withColumn("_asof_ts", col(rightTs))
      .withColumn("_asof_side", lit(0))
      .select(keys.map(col) ++ Seq(col("_asof_ts"), col("_asof_side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts").asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) {
      case (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("_asof_side") === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
