package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data-quality audit ([[Quality.audit]]): every check class against a
  * frame with planted violations — null, out-of-range (both ends),
  * unaccepted value, duplicate key, orphan foreign key — plus the
  * all-pass case and the null-counts-as-violation rule.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit counts planted violations per check class") {
    val df = Seq(
      (1L, Option("a"), Option(5.0), "X"),
      (2L, None, Option(-1.0), "Y"), // null name; below range
      (2L, Option("c"), Option(200.0), "X"), // duplicate key; above range
      (4L, Option("d"), None, "Z")) // orphan ref; null v; unaccepted cat
      .toDF("id", "name", "v", "cat")
    val ref = Seq(1L, 2L).toDF("rid")
    val out = Quality.audit(df, Seq(
        Quality.NotNull("name"),
        Quality.InRange("v", 0, 100),
        Quality.AcceptedValues("cat", Seq("X", "Y")),
        Quality.Unique(Seq("id")),
        Quality.RefIntegrity("id", ref, "rid"),
        Quality.Satisfies("pos_id", col("id") > 0)))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null_name") === ((1L, 4L, false)))
    // -1 below, 200 above, null v counts as a violation too
    assert(out("range_v") === ((3L, 4L, false)))
    assert(out("accepted_cat") === ((1L, 4L, false)))
    assert(out("unique_id") === ((1L, 4L, false))) // 4 rows, 3 distinct
    assert(out("ref_id") === ((1L, 4L, false))) // id 4 has no ref row
    assert(out("satisfies_pos_id") === ((0L, 4L, true)))
    assert(out.size === 6)
  }

  test("audit passes a clean frame and orders the report by check name") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val rows = Quality.audit(df, Seq(
        Quality.Unique(Seq("id")), Quality.NotNull("name")))
      .collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("not_null_name", "unique_id"))
    assert(rows.forall(_.getBoolean(3)))
  }

  test("audit over an EMPTY table reports 0 violations / 0 rows / pass " +
      "for every check class — never null counters") {
    val df = Seq((1L, Option("a"), "X")).toDF("id", "name", "cat")
      .filter(lit(false))
    val ref = Seq(1L).toDF("rid")
    val rows = Quality.audit(df, Seq(
        Quality.NotNull("name"),
        Quality.AcceptedValues("cat", Seq("X")),
        Quality.Unique(Seq("id")),
        Quality.RefIntegrity("id", ref, "rid")))
      .collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(!r.isNullAt(1) && r.getLong(1) === 0L, r.toString)
      assert(r.getLong(2) === 0L, r.toString)
      assert(r.getBoolean(3), r.toString)
    }
  }

  test("UniqueBoundedTail: bitmap rollup equals the hashed Unique on " +
      "in-domain data, RI reuse gives identical orphan row counts, " +
      "null tail violates, out-of-range tail fails loudly") {
    // (k, tail): k=1 has distinct tails 1,2; k=2 duplicates tail 3;
    // k=3 single; k=9 orphan vs ref with 2 rows
    val df = Seq((1L, 1), (1L, 2), (2L, 3), (2L, 3), (3L, 0),
      (9L, 5), (9L, 5)).toDF("k", "t")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val out = Quality.audit(df, Seq(
        Quality.UniqueBoundedTail(Seq("k"), "t", bits = 8),
        Quality.RefIntegrity("k", ref, "rk")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // distinct (k,t): (1,1)(1,2)(2,3)(3,0)(9,5) = 5 of 7 rows
    assert(out("unique_k_t") === ((2L, 7L)))
    // orphan rows: both k=9 rows
    assert(out("ref_k") === ((2L, 7L)))
    // cross-check vs the generic hashed Unique on the same data
    val hashed = Quality.audit(df, Seq(Quality.Unique(Seq("k", "t"))))
      .collect().map(r => r.getLong(1)).head
    assert(hashed === 2L)
    // a NULL tail never enters the bitmap -> reads as a violation
    val withNull = Seq((1L, Option(1)), (1L, None)).toDF("k", "t")
    val nv = Quality.audit(withNull,
        Seq(Quality.UniqueBoundedTail(Seq("k"), "t", bits = 8)))
      .collect().map(r => r.getLong(1)).head
    assert(nv === 1L)
    // tail outside [0, bits) must fail loudly, never wrap the shift
    val bad = Seq((1L, 9)).toDF("k", "t")
    val e = intercept[Exception] {
      Quality.audit(bad,
        Seq(Quality.UniqueBoundedTail(Seq("k"), "t", bits = 8)))
        .collect()
    }
    assert(e.getMessage.contains("out of [0,8)") ||
      Option(e.getCause).exists(_.getMessage.contains("out of [0,8)")),
      e.toString)
  }

  test("audit rejects duplicate check names up front — two InRange on " +
      "one column would collide in the fused aggregate") {
    val df = Seq((1L, 5.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Quality.audit(df, Seq(
        Quality.InRange("v", 0, 10), Quality.InRange("v", 5, 20)))
    }
    assert(e.getMessage.contains("range_v"))
  }
}
