package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory,
  WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** EXECUTOR-side parquet writing for the graft DSv2 streaming sink
  * (`writeStream.toTable("graft.main.t")`): each task writes its
  * partition's rows straight to an immutable parquet file under the
  * table's data dir using Spark's own [[ParquetWriteSupport]] (the
  * exact InternalRow→parquet encoder `df.write.parquet` uses, so files
  * are byte-compatible with every other commit path), and the commit
  * MESSAGE carries only the file's table-relative path — the driver's
  * epoch commit then publishes ONE catalog transaction naming all of
  * them. This is the shape a 1000-executor sink needs: data never
  * funnels through the driver; the driver handles O(files) metadata.
  *
  * Lives in the `org.apache.spark.sql` namespace because
  * [[ParquetWriteSupport]] is `private[sql]` — same shim policy as the
  * package object's converters.
  */
object GraftStreamingParquet {

  /** The parquet-writer Configuration entries Spark's own
    * `ParquetFileFormat.prepareWrite` would set, captured DRIVER-side
    * from the session so executors reproduce them exactly. Kept as a
    * small Map (Configuration is not serializable). */
  def writerConf(schema: StructType): Map[String, String] = {
    val conf = new Configuration(false)
    ParquetWriteSupport.setSchema(schema, conf)
    val sql = SQLConf.get
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sql.sessionLocalTimeZone)
    // modern (proleptic-Gregorian) timestamps — what every other graft
    // commit path writes
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  private class Builder(path: HPath, support: WriteSupport[InternalRow])
      extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration)
        : WriteSupport[InternalRow] = support
  }

  private[graftshim] def openWriter(absPath: String,
      confMap: Map[String, String]): ParquetWriter[InternalRow] = {
    // defaults loaded (fs.* bindings), session keys overlaid
    val conf = new Configuration(true)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    new Builder(new HPath(absPath), new ParquetWriteSupport())
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }
}

/** One committed file, table-relative — the only thing that crosses
  * from executors to the driver's epoch commit. */
final case class GraftFileMessage(relPath: String)
    extends WriterCommitMessage

/** Per-task writer: opens lazily (empty partitions commit no file),
  * writes every row to `<tableRoot>/<dirRel>/part-...parquet`, commits
  * the relative path. Abort deletes the partial file — an aborted
  * epoch leaves no referenced state (unreferenced leftovers are
  * vacuum scratch). `requiredOrdinals` are the table's NOT NULL
  * columns: the incoming query schema may type them nullable (parquet
  * sources always do), so the constraint is enforced per row HERE —
  * loudly, before the value reaches a parquet `required` field. */
final class GraftStreamDataWriter(tableRoot: String, dirRel: String,
    confMap: Map[String, String], requiredOrdinals: Seq[Int],
    partitionId: Int, taskId: Long,
    epochId: Long) extends DataWriter[InternalRow] {

  private var writer: ParquetWriter[InternalRow] = _
  private var rel: String = _
  private val required = requiredOrdinals.toArray

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < required.length) {
      if (row.isNullAt(required(i)))
        throw new IllegalArgumentException(
          s"graft streaming sink: NULL in NOT NULL column ordinal " +
            s"${required(i)} (partition $partitionId, epoch $epochId)")
      i += 1
    }
    if (writer == null) {
      rel = s"$dirRel/part-$epochId-$partitionId-$taskId-" +
        s"${java.util.UUID.randomUUID()}.snappy.parquet"
      val abs = java.nio.file.Paths.get(tableRoot, rel)
      java.nio.file.Files.createDirectories(abs.getParent)
      writer = GraftStreamingParquet.openWriter(abs.toString, confMap)
    }
    writer.write(row)
  }

  override def commit(): WriterCommitMessage = {
    if (writer == null) GraftFileMessage("")
    else { writer.close(); writer = null; GraftFileMessage(rel) }
  }

  override def abort(): Unit = {
    if (writer != null) {
      writer.close(); writer = null
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(tableRoot, rel))
    }
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}

/** The factory shipped to executors — plain serializable data. */
final case class GraftStreamWriterFactory(tableRoot: String,
    dirRel: String, confMap: Map[String, String],
    requiredOrdinals: Seq[Int])
    extends StreamingDataWriterFactory with DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(tableRoot, dirRel, confMap,
      requiredOrdinals, partitionId, taskId, epochId)

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId, epochId = -1L)
}
