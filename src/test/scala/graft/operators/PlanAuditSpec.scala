package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}

import graft.SparkSpec

/** Physical-plan audits for the round's new query paths over the REAL
  * parquet tables (sf0.001): column pruning must reach the scan and
  * top-k must stay a TakeOrderedAndProject — the properties that keep
  * these operators 100 TB-shaped, asserted so a refactor can't silently
  * regress them.
  */
class PlanAuditSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): SparkPlan = {
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set(aqeKey, prior)
  }

  private def scanColumns(plan: SparkPlan): Seq[Seq[String]] =
    plan.collect {
      case f: FileSourceScanExec => Seq(f.requiredSchema.fieldNames.toSeq)
      // see through persist() boundaries (q60/q90-style persist-before-
      // sort): the parquet scan whose pruning we audit lives inside the
      // InMemoryRelation's cached plan — which is itself an
      // AdaptiveSparkPlanExec when the frame was persisted under AQE,
      // hiding its subtree from collect()
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        scanColumns(m.relation.cachedPlan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanColumns(a.executedPlan)
    }.flatten

  test("q70 rebalance operator: every shuffle sits under a broadcast " +
      "subtree — the corpus side is scanned and filtered in place") {
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeExec, ShuffleExchangeExec}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source")
    val plan = finalPlan(graft.textops.Sampling.rebalanceToUniform(
      docs, "source", "doc_id"))
    def mainPathShuffles(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: BroadcastExchangeExec => Nil // counts/min live here by design
      case s: ShuffleExchangeExec => s +: s.children.flatMap(mainPathShuffles)
      case o => o.children.flatMap(mainPathShuffles)
    }
    assert(mainPathShuffles(plan).isEmpty, plan.toString)
  }

  test("q59 vocabulary: top-k compiles to TakeOrderedAndProject — " +
      "per-partition heaps, never a global sort of the term table") {
    val plan = finalPlan(TextQueries.q59Vocabulary(spark, sf))
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      plan.toString)
  }

  test("q58 chunking scan prunes documents to (doc_id, text)") {
    val cols = scanColumns(finalPlan(TextQueries.q58Chunking(spark, sf)))
    assert(cols.nonEmpty && cols.forall(_.toSet == Set("doc_id", "text")),
      cols.toString)
  }

  test("q60 quantization scan prunes embeddings to (vec_id, embedding) — " +
      "label never leaves the parquet") {
    val cols = scanColumns(finalPlan(TextQueries.q60Quantize(spark, sf)))
    assert(cols.nonEmpty &&
      cols.forall(_.toSet == Set("vec_id", "embedding")), cols.toString)
  }

  test("q54 redaction scan prunes customer to the four derived columns") {
    val cols = scanColumns(finalPlan(TextQueries.q54PiiRedact(spark, sf)))
    assert(cols.nonEmpty && cols.forall(_.toSet ==
      Set("c_custkey", "c_name", "c_nationkey", "c_mktsegment")),
      cols.toString)
  }

  test("q64 percentiles scan prunes orders to (priority, totalprice)") {
    val cols = scanColumns(finalPlan(Relational.q64Percentiles(spark, sf)))
    assert(cols.nonEmpty && cols.forall(_.toSet ==
      Set("o_orderpriority", "o_totalprice")), cols.toString)
  }

  test("q82 substring-dedup scans prune documents to at most " +
      "(doc_id, text) — the dup-count side drops doc_id entirely") {
    val cols = scanColumns(finalPlan(
      TextQueries.q82ExactSubstrSpans(spark, sf)))
    assert(cols.nonEmpty &&
      cols.forall(_.toSet.subsetOf(Set("doc_id", "text"))), cols.toString)
    assert(cols.exists(_.toSet == Set("text")), cols.toString)
  }

  test("q89 funnel scan prunes events to (user_id, ts, event_type) with " +
      "each step's filter pushed to its scan, and no collect_list " +
      "aggregation buffer anywhere in the plan") {
    val plan = finalPlan(Relational.q89Funnel(spark, sf))
    val cols = scanColumns(plan)
    assert(cols.nonEmpty &&
      cols.forall(_.toSet == Set("user_id", "ts", "event_type")),
      cols.toString)
    val pushed = plan.collect { case f: FileSourceScanExec =>
      f.metadata.getOrElse("PushedFilters", "") }
    // each step branch pushes ITS equality filter — per-step parquet
    // dictionary/row-group skipping, tighter than one In over all steps
    assert(pushed.nonEmpty &&
      pushed.forall(_.contains("EqualTo(event_type")), pushed.toString)
    // the hot-key contract: per-key state is a running min, never a
    // collected array — a regression back to a collect_list fold would
    // reintroduce the single-row-OOM bot-key hazard
    assert(!plan.toString.contains("collect_list"), plan.toString)
  }

  test("q88 audit's row-local pass prunes lineitem to the checked " +
      "columns only") {
    val cols = scanColumns(finalPlan(Relational.q88QualityAudit(spark, sf)))
    // several scans (fused audit + two RI refs); since the r12 fusion the
    // widest scan feeds ONE aggregation pass carrying the union of the
    // row-local checked columns AND the unique-key columns (7 of
    // lineitem's 16) — still pruned to checked columns, never the full
    // table
    assert(cols.nonEmpty && cols.forall(_.size <= 7), cols.toString)
  }

  test("q88 audit scans lineitem once per branch plus ONE shared row " +
      "count — the n_rows broadcast is exchange-reused, not recomputed") {
    val plan = finalPlan(Relational.q88QualityAudit(spark, sf))
    val liScans = plan.collect { case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("lineitem")) => f }
    // fused row-local pass + unique-key distinct + two RI anti-join
    // probes + the single shared count(*) subtree = 5; the old shape
    // (a count per set-check) was 6+ and grows with every RI added
    assert(liScans.size <= 5, s"${liScans.size} lineitem scans:\n$plan")
  }

  // ---- generator-recompute audit (round-8 VERDICT #1/#4) ----------------
  // The hazard: putting an expensive expression (e.g.
  // size(array_distinct(shingles(text)))) in the SAME select as the
  // explode of that expression leaves it in the Project ABOVE the
  // Generate, where it is re-evaluated once per exploded row (~n_grams×
  // per doc — measured 5× on all of q81). The audit finds any non-trivial
  // subtree shared between a Generate's generator and a Project/Filter
  // sitting above it. count()-style actions hide the cost (Catalyst
  // prunes the column), so only a plan assertion catches regressions.

  private def nonTrivialSubtrees(e: org.apache.spark.sql.catalyst
      .expressions.Expression): Seq[org.apache.spark.sql.catalyst
      .expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, Literal}
    val self = e match {
      case _: Attribute | _: Literal => Nil
      case other => Seq(other)
    }
    self ++ e.children.flatMap(nonTrivialSubtrees)
  }

  /** Non-trivial generator subtrees re-evaluated by a Project/Filter above
    * their Generate, over the OPTIMIZED logical plan (what actually runs).
    */
  private def generatorRecomputeHazards(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.plans.logical.{
      Filter, Generate, LogicalPlan, Project}
    val buf = Seq.newBuilder[String]
    def walk(p: LogicalPlan, above: Seq[Expression]): Unit = p match {
      case g: Generate =>
        val genTrees =
          nonTrivialSubtrees(g.generator).map(_.canonicalized).toSet
        above.flatMap(nonTrivialSubtrees)
          .filter(s => genTrees.contains(s.canonicalized))
          .foreach(s => buf += s"re-evaluated above Generate: $s")
        g.children.foreach(walk(_, Nil))
      case pr: Project =>
        pr.children.foreach(walk(_, above ++ pr.projectList))
      case f: Filter =>
        f.children.foreach(walk(_, above :+ f.condition))
      case o => o.children.foreach(walk(_, Nil))
    }
    walk(df.queryExecution.optimizedPlan, Nil)
    buf.result()
  }

  test("q81: shingle pipeline computed ONCE below the Generate — the " +
      "train-side generator explodes a materialized attribute") {
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val df = TextQueries.q81ExactDecontamination(spark, sf)
    assert(generatorRecomputeHazards(df).isEmpty,
      generatorRecomputeHazards(df).mkString("; "))
    // the fixed shape: the train side's Generate explodes a bare attribute
    // (the withColumn-materialized array), not the shingle expression
    val gens = df.queryExecution.optimizedPlan
      .collect { case g: Generate => g }
    assert(gens.exists(_.generator.children.forall(_.isInstanceOf[Attribute])),
      gens.mkString("\n"))
  }

  test("q67 tf-idf: the per-term df join carries no forced broadcast — " +
      "with auto-broadcast disabled it degrades to a shuffle join, so a " +
      "web-scale vocabulary cannot OOM an executor") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val plan = finalPlan(graft.textops.TextStats.tfidfTopTerms(docs))
      // exactly one broadcast survives: the one-row corpus-count scalar
      // (explicitly hinted — harmless at any scale). A second one would
      // be the vocabulary-sized df table sneaking back in via a hint.
      val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.size == 1, s"expected only the scalar-count " +
        s"broadcast, got ${bcasts.size}:\n$plan")
    } finally spark.conf.set(thresholdKey, prior)
  }

  test("q114 unigram NLL: the vocabulary join carries no forced " +
      "broadcast — same web-scale-vocabulary rule as q67's df table") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val plan = finalPlan(graft.textops.TextStats.unigramNll(docs))
      // only the one-row (N, V) scalar is explicitly broadcast; the
      // O(vocabulary) unigram table must degrade to a shuffle join
      val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.size == 1, s"expected only the scalar-stats " +
        s"broadcast, got ${bcasts.size}:\n$plan")
    } finally spark.conf.set(thresholdKey, prior)
  }

  test("q93 retention scans prune events to (user_id, ts) on every branch") {
    val cols = scanColumns(finalPlan(Relational.q93Retention(spark, sf)))
    assert(cols.nonEmpty &&
      cols.forall(_.toSet == Set("user_id", "ts")), cols.toString)
  }

  test("q94 z-order key scan prunes lineitem to the four projected " +
      "columns (the eager min/max stats pass runs its own pruned plan " +
      "at construction time and never appears here)") {
    val cols = scanColumns(finalPlan(Relational.q94ZOrderKey(spark, sf)))
    assert(cols.nonEmpty && cols.forall(_.toSet ==
      Set("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),
      cols.toString)
  }

  test("q97 CDC apply: no Window over the changelog — winner selection " +
      "stays an aggregate; scans prune to the consumed columns") {
    val plan = finalPlan(Relational.q97CdcApply(spark, sf))
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "changelog winner must not be a window sort:\n" + plan)
    val cols = scanColumns(plan)
    assert(cols.forall(c => c.toSet.subsetOf(Set("l_orderkey",
      "l_linenumber", "l_quantity", "l_partkey", "l_extendedprice",
      "l_returnflag")) || c.toSet.subsetOf(Set("o_orderkey", "o_custkey",
      "o_totalprice", "o_orderpriority"))), cols.toString)
  }

  test("q96 grouped top-k: ObjectHashAggregate with no Window and no " +
      "Sort below the aggregate; orders scan prunes to the two columns") {
    val plan = finalPlan(Relational.q96GroupedTopK(spark, sf))
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, plan.toString)
    val cols = scanColumns(plan)
    assert(cols.nonEmpty && cols.forall(_.toSet ==
      Set("o_orderpriority", "o_totalprice", "o_orderkey")), cols.toString)
  }

  test("q100 robust outliers: fully driver-resolved result (the eager " +
      "five-job pipeline returns a local relation — round-10 verdict " +
      "item 2: no WindowExec, no per-group row_number sort) and the " +
      "lazy no-sort quantile plans no Window with pruned scans") {
    // the gate itself: its five construction-time jobs are histogram/
    // bucket aggregations (spec'd via quantileDiscNoSort below); what it
    // RETURNS must be a local relation — nothing left to execute
    val gatePlan = finalPlan(Relational.q100Outliers(spark, sf))
    assert(gatePlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, gatePlan.toString)
    assert(scanColumns(gatePlan).isEmpty,
      "q100 must resolve on the driver, not defer scans:\n" + gatePlan)
    // the lazy quantile operator carries the same no-sort plan shape
    val qPlan = finalPlan(Profile.quantileDiscNoSort(
      graft.sources.Tables.lineitem(spark, sf), "l_returnflag",
      "l_extendedprice", 0.5))
    assert(qPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "exact median must not plan a Window sort:\n" + qPlan)
    val cols = scanColumns(qPlan)
    assert(cols.nonEmpty && cols.forall(_.toSet ==
      Set("l_returnflag", "l_extendedprice")), cols.toString)
  }

  test("q103 curation pipeline: every documents scan prunes to " +
      "(doc_id, source, text) — five chained operators add no column " +
      "width") {
    val cols = scanColumns(finalPlan(
      TextQueries.q103CurationPipeline(spark, sf)))
    assert(cols.nonEmpty &&
      cols.forall(_.toSet == Set("doc_id", "source", "text")),
      cols.toString)
  }

  test("q104 streaming retention (batch mode): events scans prune to " +
      "(user_id, ts) — period integers derive in-plan, nothing else " +
      "ships into the state function") {
    val cols = scanColumns(finalPlan(
      Relational.q104StreamingRetention(spark, sf)))
    assert(cols.nonEmpty &&
      cols.forall(_.toSet == Set("user_id", "ts")), cols.toString)
  }

  test("q114/q108/q67: the corpus tokenizes ONCE — exactly one " +
      "array-histogram Generate in each physical plan (every consumer " +
      "reads the one persisted tf materialization; column-pruned " +
      "subtree copies would otherwise re-tokenize per consumer)") {
    // visited set: N scans of the SAME persisted relation must count its
    // cached plan once — that single materialization is the whole claim
    var seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def histogramGenerates(p: SparkPlan): Int = (p.collect {
      case g: org.apache.spark.sql.execution.GenerateExec
          if g.generator.toString.contains("graft_array_histogram") => 1
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        if (seen.add(m.relation.cacheBuilder))
          histogramGenerates(m.relation.cachedPlan)
        else 0
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        histogramGenerates(a.executedPlan)
      // AQE hides materialized subtrees inside query-stage nodes; a
      // REUSED exchange shows as a leaf ReusedExchangeExec (no subtree),
      // so recursing every stage still counts each original exactly once
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        histogramGenerates(s.plan)
    }).sum
    for ((name, fn) <- Seq[(String, () => DataFrame)](
      "q114" -> (() => TextQueries.q114UnigramNll(spark, sf)),
      "q108" -> (() => TextQueries.q108Bm25(spark, sf)),
      "q67" -> (() => TextQueries.q67TfIdf(spark, sf)))) {
      // isolate queries from each other: identical tokenize subtrees
      // would otherwise share one cache entry across queries and hide
      // a later query's Generate from the count
      spark.catalog.clearCache()
      seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
      val df = fn()
      // execute first: exchange reuse is decided when AQE materializes
      // stages, so the pre-execution plan still shows one Exchange per
      // consumer — the AQE-FINAL plan is the one the claim is about
      df.count()
      val plan = df.queryExecution.executedPlan
      val n = histogramGenerates(plan)
      assert(n === 1, s"$name: expected exactly one histogram " +
        s"Generate (tokenize-once), found $n in:\n$plan")
    }
  }

  test("no gated query re-evaluates a generator subtree above its " +
      "Generate (sweep over every SparkEntry entry)") {
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hs = generatorRecomputeHazards(fn(spark, sf))
        if (hs.isEmpty) Nil else Seq(s"$name: ${hs.mkString("; ")}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
