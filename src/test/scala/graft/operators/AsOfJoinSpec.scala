package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of matches most recent right row at-or-before left ts") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u2", ts("2024-01-01 11:00:00"))
    ).toDF("id", "user", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1.0),
      ("u1", ts("2024-01-01 11:30:00"), 2.0),
      ("u2", ts("2024-01-01 11:30:00"), 3.0) // after left → no match
    ).toDF("user", "rts", "rval")

    val out = AsOfJoin.backward(left, right, Seq("user"), "ts", "rts", Seq("rts", "rval"))
      .orderBy("id")
      .collect()

    assert(out.length === 3)
    assert(out(0).getAs[Double]("rval") === 1.0) // 10:00 → 09:00 row
    assert(out(1).getAs[Double]("rval") === 2.0) // 12:00 → 11:30 row
    assert(out(2).isNullAt(out(2).fieldIndex("rval"))) // u2: nothing before 11:00
  }

  test("tie at equal timestamps is inclusive (right row at exactly left.ts matches)") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"))).toDF("id", "user", "ts")
    val right = Seq(("u1", ts("2024-01-01 10:00:00"), 42.0)).toDF("user", "rts", "rval")
    val out = AsOfJoin.backward(left, right, Seq("user"), "ts", "rts", Seq("rval")).collect()
    assert(out.head.getAs[Double]("rval") === 42.0)
  }

  test("keys never cross-match") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"))).toDF("id", "user", "ts")
    val right = Seq(("u2", ts("2024-01-01 09:00:00"), 9.0)).toDF("user", "rts", "rval")
    val out = AsOfJoin.backward(left, right, Seq("user"), "ts", "rts", Seq("rval")).collect()
    assert(out.head.isNullAt(out.head.fieldIndex("rval")))
  }

  test("a matched row with NULL payload fields is carried atomically, not skipped") {
    val left = Seq((1L, "u1", ts("2024-01-01 11:00:00"))).toDF("id", "user", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), Some(5.0)),
      ("u1", ts("2024-01-01 10:30:00"), Option.empty[Double]) // latest match, null value
    ).toDF("user", "rts", "rval")
    val out = AsOfJoin.backward(left, right, Seq("user"), "ts", "rts", Seq("rts", "rval"))
      .collect().head
    // must take BOTH fields from the 10:30 row: ts=10:30, value=NULL —
    // not stitch value=5.0 from the older row
    assert(out.getAs[java.sql.Timestamp]("rts") === ts("2024-01-01 10:30:00"))
    assert(out.isNullAt(out.fieldIndex("rval")))
  }

  test("colliding payload names are rejected") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"))).toDF("id", "user", "ts")
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), 1.0)).toDF("user", "rts", "id")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("user"), "ts", "rts", Seq("id"))
    }
  }
}
