package graft.textops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants for the text operators, mirroring
  * finance.PropertySpec's harness (fixed seed → deterministic suite):
  * the winnowing rolling recurrence equals a naive per-gram oracle on
  * arbitrary unicode-ish strings, and the posting-list Jaccard operator
  * equals a driver-side brute force on arbitrary small corpora.
  */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(5)
      .withInitialSeed(Seed(0xBEEFL))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // words from a tiny vocabulary → high shingle overlap (the interesting
  // regime for jaccard), plus unicode and repeated-char degenerates
  private val genDoc: Gen[String] = Gen.oneOf(
    Gen.listOfN(12, Gen.oneOf("the", "quick", "brown", "fox", "über",
      "straße", "data", "spark", "rolls", "fast")).map(_.mkString(" ")),
    Gen.listOfN(30, Gen.oneOf('a', 'b', ' ')).map(_.mkString),
    Gen.alphaNumStr.map(_.take(40)))

  test("winnowing: rolling == naive direct polynomial on arbitrary strings") {
    val (k, w, b, m) = (8, 8, 257L, 1000000007L)
    def naive(text: String): Seq[Long] = {
      val cps = text.toLowerCase.trim.codePoints().toArray
      val g = cps.length - k + 1
      if (g < 1) return Seq.empty
      val hs = (0 until g).map { i =>
        (0 until k).foldLeft(0L)((h, j) => (h * b + cps(i + j)) % m)
      }
      val mins =
        if (g <= w) Seq(hs.min)
        else (0 to g - w).map(i => hs.slice(i, i + w).min)
      mins.distinct.sorted
    }
    check("winnowing", Prop.forAll(Gen.listOfN(6, genDoc)) { docs =>
      val got = docs.toDF("text")
        .select(TextStats.winnowingFingerprint(col("text")).as("fp"))
        .as[Seq[Long]].collect()
      docs.zip(got).forall { case (s, fp) => fp == naive(s) }
    })
  }

  test("robust winnowing: (fp, pos) == naive rightmost-min oracle") {
    val (k, w, b, m) = (8, 8, 257L, 1000000007L)
    // naive mirror of SIGMOD'03 §3.2.1: direct (non-rolling) gram hashes;
    // per window the RIGHTMOST minimal index; record an occurrence once
    def naive(text: String): Seq[(Long, Int)] = {
      val cps = text.toLowerCase.trim.codePoints().toArray
      val g = cps.length - k + 1
      if (g < 1) return Seq.empty
      val hs = (0 until g).map { i =>
        (0 until k).foldLeft(0L)((h, j) => (h * b + cps(i + j)) % m)
      }
      def rightmostMin(from: Int, until: Int): Int = {
        var best = from
        for (i <- from until until) if (hs(i) <= hs(best)) best = i
        best
      }
      val picks =
        if (g <= w) Seq(rightmostMin(0, g))
        else (0 to g - w).map(i => rightmostMin(i, i + w))
      picks.distinct.map(i => (hs(i), i))
    }
    check("winnowing-pos", Prop.forAll(Gen.listOfN(6, genDoc)) { docs =>
      val got = docs.toDF("text")
        .select(TextStats.winnowingFingerprintPos(col("text")).as("s"))
        .as[Seq[(Long, Int)]].collect()
      docs.zip(got).forall { case (s, fps) => fps == naive(s) }
    })
  }

  test("ngram Jaccard pairs == driver-side brute force on small corpora") {
    def shingleSet(t: String): Set[String] = {
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (ws.length < 3) Set(ws.mkString(" "))
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    check("jaccard", Prop.forAll(Gen.listOfN(6, genDoc)) { docs0 =>
      // non-degenerate texts only (empty shingle sets divide by zero in
      // the brute force; the operator never emits them either way)
      val docs = docs0.filter(_.trim.nonEmpty).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val expected = (for {
        (ia, a) <- docs; (ib, b) <- docs if ia < ib
        sa = shingleSet(a); sb = shingleSet(b)
        u = sa.union(sb).size if u > 0
        j = sa.intersect(sb).size.toDouble / u if j >= 0.5
      } yield (ia, ib) -> j).toMap
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          n = 3, threshold = 0.5)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect()
        .map { case (x, y, j) => (x, y) -> j }.toMap
      got == expected
    })
  }

  test("prefix path (PPJoin length+positional filters) == brute force " +
      "across thresholds on varied-length corpora") {
    def shingleSet(t: String): Set[String] = {
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (ws.length < 3) Set(ws.mkString(" "))
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    // varied lengths from a tiny vocabulary: size ratios straddle the
    // length-filter boundary and shared shingles land at arbitrary sorted
    // positions, so both PPJoin filters actually fire — the 8-doc fixed
    // corpus barely engages them
    val genVaried: Gen[String] = Gen.choose(3, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("the", "quick", "brown", "fox", "data",
        "spark", "rolls", "fast", "über", "null")).map(_.mkString(" ")))
    for (t <- Seq(0.5, 0.8)) {
      check(s"prefix t=$t", Prop.forAll(Gen.listOfN(10, genVaried)) { docs0 =>
        val docs = docs0.filter(_.trim.nonEmpty).zipWithIndex
          .map { case (s, i) => (i.toLong, s) }
        val expected = (for {
          (ia, a) <- docs; (ib, b) <- docs if ia < ib
          sa = shingleSet(a); sb = shingleSet(b)
          u = sa.union(sb).size if u > 0
          j = sa.intersect(sb).size.toDouble / u if j >= t
        } yield (ia, ib) -> j).toMap
        val got = Dedup.ngramJaccardPairsPrefix(docs.toDF("doc_id", "text"),
            n = 3, threshold = t)
          .select("id_a", "id_b", "jaccard")
          .as[(Long, Long, Double)].collect()
          .map { case (x, y, j) => (x, y) -> j }.toMap
        got == expected
      })
    }
  }

  test("IVF trainer: distributed == naive mirror BIT-exactly (integer grid)") {
    // the q44 oracle's premise, property-tested: because every sum the
    // trainer takes is over exact integers, the distributed groupBy result
    // equals a sequential driver-side mirror EXACTLY — not approximately —
    // on arbitrary corpora
    def xx(l: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(l, 42L)
    def naiveTrain(vecs: Seq[(Long, Array[Double])], k: Int,
        iters: Int): Array[Array[Double]] = {
      val train = vecs.map { case (id, v) =>
        (id, v.map(x => math.floor(x * Similarity.IvfQuantScale))) }
      var cents = train.sortBy { case (id, _) => (xx(id), id) }
        .take(k).map(_._2.clone()).toArray
      def nearest(qv: Array[Double]): Int = {
        val scores = cents.map { c =>
          val n2 = c.map(x => x * x).sum
          if (n2 == 0.0) Double.NegativeInfinity
          else qv.indices.map(i => qv(i) * c(i)).sum / math.sqrt(n2)
        }
        scores.indexOf(scores.max)
      }
      for (_ <- 1 to iters) {
        val byCid = train.groupBy { case (_, qv) => nearest(qv) }
        cents = cents.zipWithIndex.map { case (old, cid) =>
          byCid.get(cid).fold(old) { members =>
            old.indices.map(p =>
              math.floor(members.map(_._2(p)).sum / members.size)).toArray
          }
        }
      }
      cents
    }
    val genVec = Gen.listOfN(6, Gen.chooseNum(-1.0, 1.0)).map(_.toArray)
    check("ivf-train", Prop.forAll(Gen.listOfN(12, genVec)) { vecs0 =>
      val vecs = vecs0.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val expected = naiveTrain(vecs, k = 4, iters = 2)
      val got = Similarity.trainIvfCentroids(
        vecs.toDF("vec_id", "embedding"), nCentroids = 4, iters = 2)
      got.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq
    })
  }

  test("tokenBudgetMixture: kept set is ALWAYS the exact maximal " +
      "unsigned-hash-order prefix, for arbitrary corpora and budgets") {
    import org.apache.spark.sql.functions.xxhash64
    val genRow = for {
      id <- Gen.chooseNum(0L, 999L)
      lang <- Gen.oneOf("aa", "bb", "cc")
      nTok <- Gen.chooseNum(0, 9)
    } yield (id, lang, Seq.fill(nTok)("w").mkString(" "))
    val genBudget = Gen.mapOf(Gen.zip(Gen.oneOf("aa", "bb", "cc", "dd"),
      Gen.chooseNum(0L, 40L)))
    check("token-budget-prefix",
      Prop.forAll(Gen.listOfN(40, genRow), genBudget) { (rows0, budgets) =>
        val rows = rows0.distinctBy(_._1) // unique doc ids
        val df = rows.toDF("doc_id", "lang", "text")
        val got = Sampling
          .tokenBudgetMixture(df, "lang", budgets, logBuckets = 2)
          .collect().map(r => r.getAs[Long]("doc_id")).toSet
        val hashed = df.select(col("doc_id"), col("lang"),
            TextStats.tokenCount(col("text")).cast("long").as("n"),
            xxhash64(col("doc_id")).as("h")).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3)))
        // contract: budget-0/absent strata are dropped ENTIRELY — even
        // their zero-token docs, which a bare `cum <= 0` window rule
        // would keep (this property originally used that rule and
        // caught the divergence)
        val want = hashed.groupBy(_._2).toSeq.flatMap { case (l, rs) =>
          val budget = budgets.getOrElse(l, 0L)
          if (budget <= 0L) Nil
          else {
            var cum = 0L
            rs.sortBy { case (id, _, _, h) => (h ^ Long.MinValue, id) }
              .flatMap { case (id, _, n, _) =>
                cum += n; if (cum <= budget) Some(id) else None
              }
          }
        }.toSet
        got == want
      })
  }

  test("semDedup: kept set is exactly the id-minimal elements of " +
      "within-cluster cosine neighborhoods on arbitrary small corpora") {
    val genVec = Gen.listOfN(4, Gen.chooseNum(-1.0, 1.0))
      .map(_.toArray).suchThat(v => v.exists(_ != 0.0))
    check("semdedup-survivors",
      Prop.forAll(Gen.listOfN(10, genVec), Gen.chooseNum(0.1, 0.9)) {
        (vecs0, tau) =>
          val vecs = vecs0.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          val df = vecs.toDF("vec_id", "embedding")
          val cents = Similarity.trainIvfCentroids(df, nCentroids = 3,
            iters = 1)
          val asg = Similarity.kmeansAssign(df, cents).collect()
            .map(r => r.getLong(0) -> r.getInt(1)).toMap
          def cos(a: Array[Double], b: Array[Double]): Double = {
            val sab = a.indices.map(i => a(i) * b(i)).sum
            val na = math.sqrt(a.map(x => x * x).sum)
            val nb = math.sqrt(b.map(x => x * x).sum)
            sab / (na * nb)
          }
          val byId = vecs.toMap
          val wantDup = vecs.map(_._1).filter(idB =>
            vecs.map(_._1).exists(idA => idA < idB &&
              asg(idA) == asg(idB) &&
              cos(byId(idA), byId(idB)) >= tau)).toSet
          val got = Similarity.semDedup(df, cents, threshold = tau)
            .collect()
            .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("kept"))
            .toMap
          vecs.map(_._1).forall(id =>
            got(id) == (if (wantDup(id)) 0 else 1))
      })
  }
}
