package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout ([[Layout]]). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (j <- xs.indices; i <- 0 until bits)
      z |= ((xs(j) >> i) & 1L) << (i * xs.size + j)
    z
  }

  test("zValue matches a reference Morton interleave, including 3 columns") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (255L, 255L, 255L), (170L, 85L, 204L), (7L, 200L, 33L))
    val got = rows.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        Layout.zValue(Seq($"a", $"b"), 8).as("z2"),
        Layout.zValue(Seq($"a", $"b", $"c"), 8).as("z3"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) === mortonRef(Seq(r.getLong(0), r.getLong(1)), 8))
      assert(r.getLong(4) ===
        mortonRef(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 8))
    }
  }

  test("zOrderKey: min-max normalization is exact integer DIV; constant " +
      "column scales to 0; null key -> null zkey") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (10L, 5L), (20L, 5L), (30L, 5L), (null, 5L))
      .toDF("x", "y")
    val got = Layout.zOrderKey(df, Seq("x", "y"), bits = 4)
      .orderBy($"x".asc_nulls_last).collect()
    // x in {10,20,30} -> scaled (x-10)*15 DIV 20 = {0, 7, 15}; y constant
    // -> 0 -> interleave = spread-out x bits only
    val exp = Seq(0L, 7L, 15L).map(s => mortonRef(Seq(s, 0L), 4))
    assert(got.take(3).map(_.getLong(2)).toSeq === exp)
    assert(got(3).isNullAt(2), "null key must give null zkey")
  }

  test("zOrder plans one range partitioning on zkey and measurably " +
      "clusters BOTH dimensions vs the natural row order") {
    // a 64x64 grid visited in row-major order: natural layout is
    // perfectly clustered in x but maximally spread in y
    val n = 64
    val grid = spark.range(n.toLong * n)
      .select(($"id" % n).as("x"), ($"id" / n).cast("long").as("y"))
    val parts = 16
    val zed = Layout.zOrder(grid, Seq("x", "y"), bits = 6,
      partitions = parts)
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    val plan = try zed.queryExecution.executedPlan
      finally spark.conf.set(aqeKey, prior)
    val ranges = plan.collect {
      case e: ShuffleExchangeLike if e.outputPartitioning
        .isInstanceOf[RangePartitioning] => e
    }
    assert(ranges.nonEmpty, "expected a RangePartitioning exchange:\n" + plan)

    def meanSpan(df: org.apache.spark.sql.DataFrame, c: String): Double =
      df.groupBy(spark_partition_id().as("p"))
        .agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).head().getDouble(0)
    // z-ordered partitions must bound both x and y spans well below the
    // full extent (63); row-major order leaves y unbounded per partition
    val (zx, zy) = (meanSpan(zed, "x"), meanSpan(zed, "y"))
    assert(zx < 32 && zy < 32,
      f"z-order spans x=$zx%.1f y=$zy%.1f not clustered")
  }
}
