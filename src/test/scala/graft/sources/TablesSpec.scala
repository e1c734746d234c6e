package graft.sources

import graft.SparkSpec

/** The events loader needs `spark.sql.legacy.parquet.nanosAsLong` (the table
  * stores TIMESTAMP(NANOS)), but must not leave it set on a shared session —
  * that would silently change how OTHER nanos parquet reads decode. An
  * option-only read is NOT possible on this Spark version (schema inference
  * reads the session conf and throws PARQUET_TYPE_ILLEGAL otherwise —
  * verified empirically), so the loader scopes the conf around schema
  * resolution; these specs pin the restore, post-restore execution, and the
  * exact decoded values.
  */
class TablesSpec extends SparkSpec {

  private val key = "spark.sql.legacy.parquet.nanosAsLong"
  private val sf = "/root/testdata/sf0.001"

  test("events: loads nanos ts as truncated micros TimestampType") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType.typeName === "timestamp")
    assert(df.count() > 0)
  }

  test("events: does not leave the legacy nanos conf set on the session") {
    spark.conf.unset(key)
    Tables.events(spark, sf)
    // registered SQL confs report their default ("false") when unset
    assert(spark.conf.get(key) === "false")
  }

  test("events: restores a pre-existing conf value instead of clobbering") {
    spark.conf.set(key, "false")
    try {
      val df = Tables.events(spark, sf)
      assert(spark.conf.get(key) === "false")
      // execution still decodes nanos-as-long AFTER the restore: the
      // per-read option pins the scan's hadoopConf copy
      assert(df.select("ts").limit(1).collect().nonEmpty)
    } finally spark.conf.unset(key)
  }

  test("events: executes (not just resolves) after the conf restore") {
    spark.conf.unset(key)
    val df = Tables.events(spark, sf)
    assert(spark.conf.get(key) === "false")
    val n = df.filter("value >= 0 OR value < 0").count()
    assert(n > 0)
  }

  test("events: decoded values equal the exact ns→µs truncation") {
    spark.conf.unset(key)
    val df = Tables.events(spark, sf)
    // raw nanos longs — the reference values the loader's micros must
    // floor-match, row by row (the raw read needs the same scoped conf;
    // resolve the frame fully inside the window)
    spark.conf.set(key, "true")
    val raw = try {
      val r = spark.read.option(key, "true").parquet(s"$sf/events.parquet")
        .selectExpr("event_id", "ts AS raw_ns")
      r.schema
      r
    } finally spark.conf.unset(key)
    val bad = df.select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.expr("unix_micros(ts)").as("got"))
      .join(raw, "event_id")
      .filter("got <> raw_ns div 1000")
    assert(bad.count() === 0)
  }
}
