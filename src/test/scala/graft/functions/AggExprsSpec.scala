package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AggExprs.CollectCapped]]: collect_list parity under the cap, hard
  * buffer truncation above it, null skipping, and non-primitive elements.
  */
class AggExprsSpec extends SparkSpec {

  test("collectTopK equals the sort-based top-k across shuffled " +
      "partitions (merge path), descending with total tie order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    // many groups, deliberate value ties (v % 17) so the tiebreaker works
    val rows = (1 to 5000).map(i =>
      ("g" + rnd.nextInt(23), (rnd.nextInt(1000) % 17).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(16)
    val k = 4
    val got = df.groupBy($"g")
      .agg(AggExprs.collectTopK(struct($"v", $"id"), k).as("top"))
      .select($"g", posexplode($"top").as(Seq("rk", "t")))
      .select($"g", $"rk", $"t.v", $"t.id")
      .as[(String, Int, Double, Long)].collect().toSet
    val expect = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sorted(Ordering[(Double, Long)].reverse)
        .take(k).zipWithIndex
        .map { case ((v, id), i) => (g, i, v, id) }
    }.toSet
    assert(got === expect)
  }

  test("collectTopK state is bounded: the grouped-top-k plan has no Sort " +
      "below the aggregate and no Window anywhere") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 1000).map(i => (i % 5, i.toLong)).toDF("g", "v")
    val plan = df.groupBy($"g")
      .agg(AggExprs.collectTopK($"v", 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
  }
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
