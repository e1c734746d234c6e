package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AggExprs.CollectCapped]]: collect_list parity under the cap, hard
  * buffer truncation above it, null skipping, and non-primitive elements.
  */
class AggExprsSpec extends SparkSpec {
  import spark.implicits._

  test("groups at or under the cap collect exactly like collect_list") {
    val df = Seq((1, 10L), (1, 11L), (1, 12L), (2, 20L))
      .toDF("k", "v")
    val out = df.groupBy("k")
      .agg(AggExprs.collectCapped(col("v"), 3).as("capped"),
        collect_list(col("v")).as("full"))
      .select(col("k"), sort_array(col("capped")).as("capped"),
        sort_array(col("full")).as("full"))
      .as[(Int, Seq[Long], Seq[Long])].collect().toMap2
    out.foreach { case (_, (capped, full)) => assert(capped === full) }
  }

  test("groups above the cap truncate to exactly cap elements, and a " +
      "paired count(*) still carries the true size") {
    val df = (1L to 100L).map(v => (1, v)).toDF("k", "v")
    val row = df.groupBy("k")
      .agg(AggExprs.collectCapped(col("v"), 7).as("capped"),
        count(lit(1)).as("n"))
      .collect().head
    assert(row.getAs[Seq[Long]]("capped").length === 7)
    assert(row.getAs[Long]("n") === 100L)
    // every retained element is a genuine group member
    assert(row.getAs[Seq[Long]]("capped").forall(v => v >= 1L && v <= 100L))
  }

  test("null inputs are skipped (collect_list semantics)") {
    val df = Seq((1, Some(1L)), (1, None), (1, Some(2L)))
      .toDF("k", "v")
    val arr = df.groupBy("k")
      .agg(sort_array(AggExprs.collectCapped(col("v"), 10)).as("c"))
      .as[(Int, Seq[Long])].collect().head._2
    assert(arr === Seq(1L, 2L))
  }

  test("struct elements survive the capped collection") {
    val df = Seq((1, 5L, "a"), (1, 6L, "b")).toDF("k", "id", "s")
    val arr = df.groupBy("k")
      .agg(sort_array(AggExprs.collectCapped(
        struct(col("id"), col("s")), 10)).as("c"))
      .select(col("c"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(r => (r.getLong(0), r.getString(1)))
      === Seq((5L, "a"), (6L, "b")))
  }

  private implicit class ToMap2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
