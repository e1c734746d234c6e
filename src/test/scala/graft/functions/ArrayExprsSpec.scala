package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native one-pass expressions must be bit-identical to the
  * higher-order-builtin formulations they replace (the HOF plans are the
  * executable spec; the natives exist purely for per-row evaluation cost).
  */
class ArrayExprsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.5, -0.25, 0.0), Seq(-1.0, 2.0, 8.5)),
    (3L, Seq(1e-9, 1e9, -3.7), Seq(2.2, -1e-9, 0.1))
  ).toDF("id", "a", "b")

  test("dot and cosine match the aggregate(zip_with(...)) formulation bit-for-bit") {
    val hofDot = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val hofCos = hofDot / (sqrt(aggregate(zip_with($"a", $"a", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)) *
      sqrt(aggregate(zip_with($"b", $"b", (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)))
    val rows = vecs.select(
      ArrayExprs.dot($"a", $"b").as("nd"), hofDot.as("hd"),
      ArrayExprs.cosine($"a", $"b").as("nc"), hofCos.as("hc")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("dot: length mismatch and null elements poison to null, like zip_with") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0))
    ).toDF("a", "b")
    val out = df.select(ArrayExprs.dot($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("float arrays: multiply happens in float precision (HOF parity)") {
    val f = Seq((Seq(0.1f, 0.2f, 0.3f), Seq(0.7f, 0.11f, 0.13f)))
      .toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val Row(n: Double, h: Double) =
      f.select(ArrayExprs.dot($"a", $"b"), hof).head()
    assert(java.lang.Double.doubleToLongBits(n) ==
      java.lang.Double.doubleToLongBits(h))
  }

  test("minhash signature equals the array_min(transform(...)) formulation") {
    val p = 2147483647L
    val as = IndexedSeq(3L, 7L, 11L)
    val bs = IndexedSeq(5L, 1L, 9L)
    val df = Seq(Seq(17L, 99L, 4L, 1234567L), Seq(42L))
      .toDF("hashes")
    val hof = array((as zip bs).map { case (a, b) =>
      array_min(transform($"hashes", x => pmod(x * a + b, lit(p))))
    }: _*)
    val rows = df.select(
      ArrayExprs.minhashSig($"hashes", as, bs, p).as("n"), hof.as("h"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("simhash64 equals the 64-aggregate formulation") {
    val df = Seq(
      Seq("alpha", "beta", "gamma", "alpha"),
      Seq("one"),
      Seq.empty[String]
    ).toDF("toks")
      .select(transform($"toks", w => xxhash64(w)).as("hs"))
    val hof = (0 until 64).map { j =>
      val bitSum = aggregate($"hs", lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L))
      when(bitSum > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
    val rows = df.select(ArrayExprs.simhash64($"hs"), hof).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("bandBuckets equals the when(dot > 0) composition bit-for-bit, " +
      "including the null-element / wrong-length all-zero cases") {
    val bands = 4
    val bits = 3
    val dims = 5
    val planes = (0 until bands * bits).flatMap { p =>
      (0 until dims).map(d => ((p * 31 + d * 7) % 11 - 5).toDouble / 3.0)
    }
    val df = Seq(
      Seq[java.lang.Double](1.0, -2.0, 0.5, 3.0, -0.25),
      Seq[java.lang.Double](-1.0, -1.0, -1.0, -1.0, -1.0),
      Seq[java.lang.Double](1.0, null, 1.0, 1.0, 1.0), // null elem → zeros
      Seq[java.lang.Double](1.0, 2.0),                 // wrong len → zeros
      null                                             // null input → null
    ).toDF("v")
    val composed = (0 until bands).map { j =>
      (0 until bits).map { i =>
        val h = lit(planes.slice((j * bits + i) * dims,
          (j * bits + i + 1) * dims).toArray)
        when(ArrayExprs.dot($"v", h) > 0, lit(1L << i)).otherwise(0L)
      }.reduce(_ bitwiseOR _)
    }
    val rows = df.select(
      ArrayExprs.bandBuckets($"v", bands, bits, dims, planes).as("native"),
      array(composed: _*).as("composed"), $"v".isNull.as("vnull")).collect()
    rows.foreach { r =>
      if (r.getBoolean(2)) assert(r.isNullAt(0))
      else assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
    // float input widens per element exactly like DotProduct
    val fdf = Seq(Seq(1.1f, -2.2f, 0.3f, 4.4f, -5.5f)).toDF("v")
    val fRows = fdf.select(
      ArrayExprs.bandBuckets($"v", bands, bits, dims, planes),
      array((0 until bands).map { j =>
        (0 until bits).map { i =>
          val h = lit(planes.slice((j * bits + i) * dims,
            (j * bits + i + 1) * dims).toArray)
          when(ArrayExprs.dot($"v", h) > 0, lit(1L << i)).otherwise(0L)
        }.reduce(_ bitwiseOR _)
      }: _*)).collect()
    fRows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }
}
