package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-matrix statistics — the Gram/covariance accumulation a
  * pipeline runs before whitening, PCA projection, or drift checks on
  * an embedding corpus (no reference analog; extension surface).
  *
  * Scale shape: the d×d statistics are SUMS over rows, so the whole
  * computation is one narrow per-row expansion (the upper-triangle
  * product list, d(d+1)/2 entries) feeding a map-side-combined hash
  * aggregate keyed (i, j) — the exchange carries at most
  * d(d+1)/2 rows PER TASK regardless of corpus size, and no row data
  * ever shuffles. Compute is the inherent O(n·d²) of a Gram matrix,
  * spread embarrassingly parallel. Contributions are rounded to 6dp
  * and summed as DECIMAL(28,6) (the engine's order-free FP policy), so
  * the result is partitioning-invariant and exactly oracle-mirrorable.
  */
object EmbedStats {

  /** Upper-triangle Gram sums G_ij = Σ round6(v_i·v_j) and covariance
    * cov_ij = G_ij/n − (S_i/n)(S_j/n) for an embedding column of width
    * `dim`. Rows whose vector length ≠ `dim` are excluded (ragged
    * input must not silently skew the statistics).
    * @return (i, j, gram, cov) for 0 ≤ i ≤ j < dim. */
  def gramCov(df: DataFrame, vecCol: Column, dim: Int): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    import graft.functions.TextFunctions.round6
    val base = df.select(transform(vecCol, _.cast("double")).as("__v"))
      .filter(size(col("__v")) === dim)
    // all (i, j, p) upper-triangle products in ONE per-row pass; __v is
    // a projected attribute, so lambda references are plain reads (the
    // bindOnce rule), not re-evaluations
    val pairs = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct(i.as("i"), j.as("j"),
          round6(element_at(col("__v"), i + lit(1)) *
            element_at(col("__v"), j + lit(1))).as("p")))))
    val sums = base.select(explode(pairs).as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.p").cast("decimal(28,6)")).cast("double").as("gram"))
    val dims = base.select(posexplode(col("__v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(round6(col("x")).cast("decimal(28,6)")).cast("double").as("s"),
        count(lit(1)).as("n"))
    sums
      .join(broadcast(dims.select(col("i"), col("s").as("__si"), col("n"))), "i")
      .join(broadcast(dims.select(col("i").as("j"), col("s").as("__sj"))), "j")
      .select(col("i"), col("j"), col("gram"),
        round6(col("gram") / col("n") -
          (col("__si") / col("n")) * (col("__sj") / col("n"))).as("cov"))
  }
}
