package graft.sources

import graft.SparkSpec

/** The events loader needs `spark.sql.legacy.parquet.nanosAsLong` (the table
  * stores TIMESTAMP(NANOS)), but must not leave it set on a shared session —
  * that would silently change how OTHER nanos parquet reads decode.
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
}
