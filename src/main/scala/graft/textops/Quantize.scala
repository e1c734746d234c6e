package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-style) embedding quantization — the storage/serving
  * compression step an ANN stack applies before indexing at scale (a
  * 100 TB float corpus quantizes 4× smaller with bounded recall loss;
  * FAISS `SQ8` per-vector variant).
  *
  * Per vector: `code_i = floor((x_i − vmin) / (vmax − vmin) · 255 + 0.5)`
  * with (vmin, vmax) the vector's own range — 0..255 codes, exact
  * endpoints. Reconstruction `vmin + code · (vmax − vmin) / 255` bounds
  * the per-dimension error by half a step: `(vmax − vmin) / 510`.
  *
  * Every step is an IEEE-double array expression with a FIXED operation
  * order (the scaladoc formula is the implementation), so the DuckDB
  * oracle restates it literally and hash-matches: `floor(x + 0.5)` is
  * used instead of `round` precisely because the engines disagree on
  * round's tie rule but agree on floor. Pure projection — shuffle-free,
  * codegen'd builtins, scales with splits.
  */
object Quantize {

  /** Adds vmin/vmax, int codes, and max reconstruction error. Constant
    * vectors (vmax = vmin) map to code 0 everywhere with zero error —
    * guarded identically on both engine sides.
    *
    * The cast array and its min/max are bound as REAL columns in a chain
    * of projections before any lambda references them. Inlining
    * `array_min(d)` straight into the `transform` lambda re-evaluates an
    * O(d) aggregate per ELEMENT — O(d²) per row — and the first cut of
    * this function did exactly that: 3.6 s isolated at sf0.1 vs 0.51 s
    * for this shape (Catalyst's CollapseProject keeps multiply-referenced
    * aliases as separate projections, so the binding survives
    * optimization).
    */
  def scalarQuantize(embs: DataFrame, vecCol: Column): DataFrame = {
    val span = col("vmax") - col("vmin")
    embs
      .withColumn("graft_d", transform(vecCol, x => x.cast("double")))
      .withColumn("vmin", array_min(col("graft_d")))
      .withColumn("vmax", array_max(col("graft_d")))
      .withColumn("codes", transform(col("graft_d"), x =>
        when(span === 0.0, 0)
          .otherwise(floor((x - col("vmin")) / span * 255.0 + 0.5))
          .cast("int")))
      .withColumn("max_abs_err",
        array_max(zip_with(col("graft_d"), col("codes"), (x, c) =>
          abs(x - (col("vmin") + c.cast("double") * span / 255.0)))))
      .drop("graft_d")
  }
}
