package graft.sources

import graft.SparkSpec

/** The events loader handles two driver-testdata generations: TIMESTAMP
  * (MICROS), which reads directly, and TIMESTAMP(NANOS), which needs
  * `spark.sql.legacy.parquet.nanosAsLong` scoped around schema resolution
  * (an option-only read throws PARQUET_TYPE_ILLEGAL on this Spark version —
  * verified empirically) and must not leave the conf set on a shared
  * session. The real testdata currently ships micros; the nanos path is
  * pinned against a committed pyarrow-written fixture
  * (src/test/resources/events_nanos/events.parquet, timestamp[ns]) so the
  * legacy branch stays covered whichever generation the driver writes.
  */
class TablesSpec extends SparkSpec {

  private val key = "spark.sql.legacy.parquet.nanosAsLong"
  private val sf = "/root/testdata/sf0.001"
  private val nanosDir =
    getClass.getResource("/events_nanos").getPath

  test("events: real testdata loads with a timestamp-typed ts") {
    val df = Tables.events(spark, sf)
    // micros generation surfaces as TIMESTAMP_NTZ (pyarrow naive micros);
    // either timestamp flavor is fine — DuckDB's naive TIMESTAMP matches
    // NTZ semantics exactly, so the oracle comparison stays value-exact
    assert(df.schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(df.count() > 0)
  }

  test("events: loads nanos fixture as truncated micros TimestampType") {
    val df = Tables.events(spark, nanosDir)
    assert(df.schema("ts").dataType.typeName === "timestamp")
    assert(df.count() === 24)
  }

  test("events: does not leave the legacy nanos conf set on the session") {
    spark.conf.unset(key)
    Tables.events(spark, nanosDir)
    // registered SQL confs report their default ("false") when unset
    assert(spark.conf.get(key) === "false")
  }

  test("events: restores a pre-existing conf value instead of clobbering") {
    spark.conf.set(key, "false")
    try {
      val df = Tables.events(spark, nanosDir)
      assert(spark.conf.get(key) === "false")
      // execution still decodes nanos-as-long AFTER the restore: the
      // per-read option pins the scan's hadoopConf copy
      assert(df.select("ts").limit(1).collect().nonEmpty)
    } finally spark.conf.unset(key)
  }

  test("events: executes (not just resolves) after the conf restore") {
    spark.conf.unset(key)
    val df = Tables.events(spark, nanosDir)
    assert(spark.conf.get(key) === "false")
    val n = df.filter("value >= 0 OR value < 0").count()
    assert(n === 24)
  }

  test("events: nanos fixture values equal the exact ns→µs truncation") {
    spark.conf.unset(key)
    val df = Tables.events(spark, nanosDir)
    // raw nanos longs — the reference values the loader's micros must
    // floor-match, row by row (the raw read needs the same scoped conf;
    // resolve the frame fully inside the window)
    spark.conf.set(key, "true")
    val raw = try {
      val r = spark.read.option(key, "true")
        .parquet(s"$nanosDir/events.parquet")
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

  test("events: micros generation does not touch the legacy conf") {
    spark.conf.unset(key)
    Tables.events(spark, sf).schema
    assert(spark.conf.get(key) === "false")
  }
}
