package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping document chunking — the RAG / context-window prep step:
  * every document becomes ⌈len/stride⌉ fixed-size character windows
  * (`size` chars, consecutive windows overlapping by `size - stride`), so
  * a passage near a cut boundary is always fully contained in at least
  * one chunk.
  *
  * Pure projection + explode: shuffle-free, embarrassingly parallel, and
  * the row multiplication (~len/stride per doc) happens AFTER the scan's
  * column pruning. At 100 TB the operative rule is chunk-late: keep the
  * corpus in document rows through filters/dedup (fewer, bigger rows) and
  * explode into chunks only at the consumer boundary — this operator is
  * that boundary, so no shuffle ever moves the multiplied rows.
  *
  * Offsets are `0, stride, 2·stride, …` while < len (a zero-length
  * document yields one empty chunk at offset 0 — every doc is represented
  * downstream). The last chunk is short when the tail is; no padding.
  */
object Chunking {

  /** Per-chunk rows: (…, chunk_idx, offset, chunk, n_chars). */
  def chunkByChars(docs: DataFrame, textCol: Column, size: Int,
      stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    docs
      .select(col("*"),
        posexplode(sequence(lit(0),
          greatest(length(textCol) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "offset")))
      .withColumn("chunk", textCol.substr(col("offset") + 1, lit(size)))
      .withColumn("n_chars", length(col("chunk")))
  }
}
