package graft.textops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVF serving-layout claim, proven on the physical plan: a saved
  * index ([[Similarity.saveIvfIndex]], `partitionBy("cid")`) probed
  * through [[Similarity.ivfTopKIndexed]] must (a) return exactly what the
  * in-session probe returns and (b) reach the index scan with a DYNAMIC
  * PARTITION PRUNING filter on `cid`, so only the probed inverted-list
  * directories are read — the last piece of the ivf scaladoc that was
  * asserted nowhere (round-5 VERDICT #7).
  */
class IvfIndexSpec extends SparkSpec {

  test("saved IVF index: probe equals in-session probe and prunes via DPP") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val cents = Similarity.trainIvfCentroids(emb, nCentroids = 8, iters = 2)
    val dir = Files.createTempDirectory("ivf-index").resolve("idx").toString
    Similarity.saveIvfIndex(emb, cents, dir)
    val queries = emb.filter(col("vec_id") < 4)

    val expected = Similarity
      .ivfTopKWith(emb, queries, k = 5, cents, nProbe = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(expected.nonEmpty)

    // AQE folds scans into adaptive subtrees — pin it off for the plan
    // assert (the StoreSpec bucketed-scan precedent)
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val df = Similarity.ivfTopKIndexed(dir, queries, k = 5, cents,
        nProbe = 2)
      val got = df.collect().map(_.toSeq).sortBy(_.toString)
      assert(got === expected,
        "indexed probe must equal the in-session probe row-for-row")

      import org.apache.spark.sql.execution.FileSourceScanExec
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      val idxScans = scans.filter(
        _.relation.location.rootPaths.exists(_.toString.contains("idx")))
      assert(idxScans.nonEmpty, "expected a scan over the saved index")
      assert(idxScans.exists(_.partitionFilters.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .DynamicPruning]))),
        s"index scan must carry a dynamic partition-pruning filter on cid;" +
          s" partitionFilters = ${idxScans.map(_.partitionFilters)}")
    } finally spark.conf.set(aqeKey, prior)
  }

  test("kmeansAssign: pure projection (no Exchange), assignment matches " +
      "the trainer's own per-vector argmax, clusters cover the corpus") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val cents = Similarity.trainIvfCentroids(emb, nCentroids = 8, iters = 2)
    val asg = Similarity.kmeansAssign(emb, cents)
    val plan = asg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val rows = asg.collect()
    assert(rows.length === emb.count())
    val cids = rows.map(_.getInt(1)).toSet
    assert(cids.subsetOf((0 until 8).toSet), s"cid out of range: $cids")
    assert(cids.size > 1, "degenerate clustering: a single cluster")
    // determinism: a second evaluation assigns identically
    assert(asg.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      rows.map(r => (r.getLong(0), r.getInt(1))).toSeq)
  }

  test("PQ codes: every assignment and distortion equals the brute-force " +
      "nearest codeword on the integer grid") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val m = 4
    val books = Similarity.trainPqCodebooks(emb, m = m, k = 16, iters = 2,
      trainMod = 2)
    assert(books.length === m)
    val sub = books(0)(0).length
    val out = Similarity.pqAssign(emb, books)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        (0 until m).map(s => r.getAs[Int](s"code_$s")).toList,
        r.getAs[Long]("recon_sq"))).toSeq
    val vecs = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Double]]("embedding").toArray).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, code, recon) =>
      assert(code.length === m)
      val qv = vecs(id).map(x => math.floor(x * 4096.0))
      val perSub = (0 until m).map { s =>
        val sv = qv.slice(s * sub, (s + 1) * sub)
        val d2 = books(s).map { c =>
          sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum }
        val best = d2.min
        (d2.indexWhere(_ == best), best)
      }
      assert(code === perSub.map(_._1).toList, s"vec $id codes")
      assert(recon === perSub.map(_._2).sum.toLong, s"vec $id distortion")
    }
  }

  test("IVF+PQ ADC probe at nProbe=all equals the brute-force ADC " +
      "ranking over every corpus vector") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val nC = 8
    val cents = Similarity.trainIvfCentroids(emb, nCentroids = nC,
      iters = 2, trainMod = 2)
    val books = Similarity.trainPqCodebooks(emb, m = 4, k = 16, iters = 2,
      trainMod = 2)
    val sub = books(0)(0).length
    val k = 5
    // nProbe = all lists: IVF routing drops nothing, so the operator's
    // result must equal brute-force ADC over the whole corpus
    val got = Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 4),
        k = k, cents, books, nProbe = nC)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_sq"))).toMap
    val vecs = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Double]]("embedding").toArray.map(x =>
          math.floor(x * 4096.0))).toMap
    def code(v: Array[Double]): Seq[Int] = (0 until books.length).map { s =>
      val sv = v.slice(s * sub, (s + 1) * sub)
      val d2 = books(s).map(c =>
        sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      d2.indexWhere(_ == d2.min)
    }
    for (qid <- 0L until 4L) {
      val qv = vecs(qid)
      val ranked = vecs.toSeq.filter(_._1 != qid).map { case (nid, nv) =>
        val adc = (0 until books.length).map { s =>
          val qs = qv.slice(s * sub, (s + 1) * sub)
          val c = books(s)(code(nv)(s))
          qs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        }.sum.toLong
        (nid, adc)
      }.sortBy { case (nid, adc) => (adc, nid) }.take(k)
      ranked.zipWithIndex.foreach { case ((nid, adc), i) =>
        assert(got((qid, i + 1)) === ((nid, adc)),
          s"query $qid rank ${i + 1}")
      }
    }
  }

  test("randomProjectQ: pure projection (no Exchange), integer-exact " +
      "components, projected top-k keeps useful recall vs unprojected") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val proj = Similarity.randomProjectQ(emb, outDim = 16, dims = 64)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val rows = proj.collect()
    assert(rows.length === emb.count())
    rows.foreach { r =>
      val v = r.getSeq[Double](r.fieldIndex("proj"))
      assert(v.length === 16)
      v.foreach(x => assert(x == math.rint(x) && math.abs(x) < (1L << 52),
        s"component not an exact integer: $x"))
    }
    // determinism: re-evaluation is bit-identical
    assert(proj.collect().map(r => r.getSeq[Double](r.fieldIndex("proj"))).toSeq ===
      rows.map(r => r.getSeq[Double](r.fieldIndex("proj"))).toSeq)

    // recall of projected top-5 vs exact top-5 on the raw vectors. The
    // synthetic corpus is deliberately NEAR-UNIFORM (max pairwise cosine
    // ≈ 0.48 — q34's own note), so true neighbor structure is weak and
    // JL at 16 of 64 dims preserves little of the noise-like ranking;
    // the bound asserts "far above chance" (chance = 5/(n−1) ≈ 1%), not
    // production recall — clustered real data is the favorable case.
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, queries, k = 5))
    val pq = pairs(Similarity.cosineTopK(proj,
      proj.filter(col("vec_id") < 8), k = 5, vecCol = "proj"))
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.15, s"projected recall $recall below 0.15 " +
      "(chance is ~0.01)")
    // grid overflow guard is loud
    intercept[IllegalArgumentException] {
      Similarity.randomProjectQ(emb, outDim = 1 << 20, dims = 64,
        scale = 1 << 16)
    }
  }

  test("semDedup: duplicates are exactly the non-id-minimal members of " +
      "within-cluster cosine neighborhoods; caps and thresholds degrade " +
      "to keep-all; the pair join never broadcasts the vector frame") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val cents = Similarity.trainIvfCentroids(emb, nCentroids = 8, iters = 2)
    val tau = 0.3
    val out = Similarity.semDedup(emb, cents, threshold = tau)
    val got = out.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cid"), r.getAs[Int]("kept"))).toMap

    // brute-force reference: assignment via kmeansAssign (oracle-proven),
    // duplicate iff a smaller-id same-cluster member has cosine >= tau
    val asg = Similarity.kmeansAssign(emb, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
    val vecs = emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Seq[Double]]("embedding").toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var sab = 0.0; var saa = 0.0; var sbb = 0.0; var i = 0
      while (i < a.length) {
        sab += a(i) * b(i); saa += a(i) * a(i); sbb += b(i) * b(i); i += 1
      }
      sab / (math.sqrt(saa) * math.sqrt(sbb))
    }
    val ids = vecs.keys.toSeq.sorted
    val wantDup = ids.filter(b => ids.exists(a => a < b &&
      asg(a) == asg(b) && cos(vecs(a), vecs(b)) >= tau)).toSet
    assert(got.keySet === ids.toSet, "every corpus vector must be output")
    ids.foreach { id =>
      assert(got(id)._1 === asg(id), s"vec $id cluster")
      assert(got(id)._2 === (if (wantDup(id)) 0 else 1), s"vec $id kept")
    }
    assert(wantDup.nonEmpty, "degenerate fixture: no duplicates at tau")
    assert(wantDup.size < ids.size, "degenerate fixture: all duplicates")

    // threshold above max pairwise cosine -> keep everything
    val all = Similarity.semDedup(emb, cents, threshold = 1.01).collect()
    assert(all.forall(_.getAs[Int]("kept") == 1))
    // every cluster over the cap -> no pairs generated -> keep everything
    val capped = Similarity.semDedup(emb, cents, threshold = tau,
      maxCluster = 1).collect()
    assert(capped.forall(_.getAs[Int]("kept") == 1))

    // the within-cluster self-join must be a shuffled hash join: a
    // per-vector array frame must never ride a broadcast (the 100x
    // smoke lane's AQE-misestimate failure)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the pinned shuffle_hash pair join in:\n$plan")
  }
}
