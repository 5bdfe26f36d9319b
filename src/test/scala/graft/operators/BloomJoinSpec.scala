package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom pre-filter never drops a matching row (no false negatives)") {
    val fact = (1L to 5000L).map(i => (i % 700, s"f$i")).toDF("k", "payload")
    val dim = (0L to 699L by 7).map(i => (i, s"d$i")).toDF("k", "name")
    val plain = fact.join(dim, "k").collect().map(_.toSeq).toSet
    val bloomed = BloomJoin.bloomPrunedJoin(fact, dim, "k", expectedItems = 100L)
      .collect().map(_.toSeq).toSet
    assert(bloomed === plain)
  }

  test("bloom pre-filter prunes most non-matching fact rows before the join") {
    val fact = (1L to 20000L).map(i => (i, s"f$i")).toDF("k", "payload")
    val dim = (1L to 20000L by 100).map(i => (i, s"d$i")).toDF("k", "name") // 1% match
    val sketch = dim.stat.bloomFilter("k", 1000L, 0.01)
    val probe = udf { k: Long => sketch.mightContainLong(k) }
    val survivors = fact.filter(probe(col("k"))).count()
    // 200 true matches + ~1% fp of 19800 ≈ 400; allow generous slack
    assert(survivors < 1000L, s"pre-filter passed $survivors of 20000 rows")
    assert(survivors >= 200L)
  }

  test("bloom probe is a codegen'd expression — no Scala UDF left in the plan") {
    val plan = BloomJoin.bloomJoinQuery(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"), "probe expression missing")
    assert(!plan.contains("UDF"), s"probe still pays the Scala-UDF tax:\n$plan")
    // interpreted path (eval) agrees with the generated code on hits,
    // misses, and null
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val bc = spark.sparkContext.broadcast(dim.stat.bloomFilter("k", 10L, 0.01))
    val e = graft.functions.BloomMightContain(
      org.apache.spark.sql.GraftSqlBridge.expression(col("k")), bc)
    import org.apache.spark.sql.catalyst.InternalRow
    val bound = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(e.withNewChildren(Seq(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.LongType, nullable = true))).asInstanceOf[graft.functions.BloomMightContain],
        Seq.empty[org.apache.spark.sql.catalyst.expressions.Attribute])
    assert(bound.eval(InternalRow(1L)) === true)
    assert(bound.eval(InternalRow(999999L)) === false)
    assert(bound.eval(InternalRow(null)) === null)
  }

  test("driver bloom-join query equals the plain join") {
    val dir = "/root/testdata/sf0.001"
    val plain = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(graft.Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")), "l_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    val bloomed = BloomJoin.bloomJoinQuery(spark, dir).collect().toSeq
    assert(bloomed === plain)
  }
}
