package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextQueries
import graft.sources.Tables
import graft.textops.TextStats

/** Scratch profiler (not shipped; deleted before commit). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      Console.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm

    for (round <- 1 to 2) {
      Console.err.println(s"--- round $round")
      time("a_words_only") {
        docs.select(col("doc_id"), TextStats.words(col("text")).as("w"))
          .write.format("noop").mode("overwrite").save()
      }
      time("b_shingles_only") {
        docs.select(col("doc_id"),
            array_distinct(TextStats.shingles(col("text"), 3)).as("sh"))
          .write.format("noop").mode("overwrite").save()
      }
      time("c_posting") {
        docs.select(col("doc_id"),
            array_distinct(TextStats.shingles(col("text"), 3)).as("sh"))
          .select(col("doc_id"), size(col("sh")).as("n_sh"),
            explode(col("sh")).as("shingle"))
          .write.format("noop").mode("overwrite").save()
      }
      time("d_full_q28") {
        TextQueries.q28NgramJaccard(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
