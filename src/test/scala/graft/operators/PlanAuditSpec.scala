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
    plan.collect { case f: FileSourceScanExec =>
      f.requiredSchema.fieldNames.toSeq }

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
}
