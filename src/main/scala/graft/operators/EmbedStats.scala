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

  /** INT8 EMBEDDING QUANTIZATION — the serving-side compression every
    * vector store offers (per-tensor absmax scheme: scale =
    * max|x|/127, q = round(x/scale), 4× smaller than float32): one
    * map-side-combinable scalar aggregate calibrates the scale (a
    * bounded plan parameter, the centroid pattern), then quantization
    * and the reconstruction error are a single zero-shuffle
    * projection.
    *
    * Portability contract: rounding is `floor(x/scale + 0.5)`
    * (half-up toward +∞ for BOTH signs — engine `round()` functions
    * disagree at midpoints), clamped to ±127; `mse` is the ascending-
    * index left-fold of (x − q·scale)² divided by dim, round6'd — the
    * exact IEEE sequence an oracle's `list_reduce` replays.
    * @return (vec_id, qvec array<int>, mse) */
  def int8Quantize(
      embs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.TextFunctions.round6
    val base = embs.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), _.cast("double")).as("__v"))
    // Option-collect: max() over an empty input is NULL, and a raw
    // getDouble would NPE before the intended diagnostic fires.
    val absmax = Option(base
      .agg(max(array_max(transform(col("__v"), x => abs(x))))).head
      .getAs[java.lang.Double](0)).map(_.doubleValue).getOrElse(0.0)
    require(absmax > 0.0,
      "int8Quantize: empty or all-zero corpus has no quantization scale")
    val scale = absmax / 127.0
    val q = base.withColumn("qvec",
      transform(col("__v"), x =>
        greatest(lit(-127), least(lit(127),
          floor(x / lit(scale) + lit(0.5)))).cast("int")))
    q.select(col("vec_id"), col("qvec"),
      round6(aggregate(
        zip_with(col("__v"), col("qvec"), (x, qi) => {
          val e = x - qi.cast("double") * lit(scale)
          e * e
        }),
        lit(0.0), (acc, e) => acc + e) /
        size(col("__v")).cast("double")).as("mse"))
  }

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
    // ONE aggregation pass: per-row upper-triangle products from the
    // [[graft.functions.UpperTriProducts]] codegen kernel (HOF lambdas
    // evaluate interpreted per element — the first implementation's
    // dominant cost), element-wise summed by
    // [[graft.functions.MicroVecSum]] (scaled-long state, exactly the
    // round6+DECIMAL policy) alongside the per-dim value sums and the
    // row count. No explode of the product stream ever happens: the
    // exchange carries one d(d+1)/2-long buffer per partial, and the
    // only row expansion is the 1-row result fanning out to its
    // d(d+1)/2 output rows.
    import graft.functions.MicroVecSum.micro_vec_sum
    import graft.functions.UpperTriProducts.upper_tri_products
    val nPairs = dim * (dim + 1) / 2
    val agged = base.agg(
      micro_vec_sum(upper_tri_products(col("__v"), dim), nPairs).as("__g"),
      micro_vec_sum(transform(col("__v"), x => round6(x)), dim).as("__s"),
      count(lit(1)).as("__n"))
    import df.sparkSession.implicits._
    val posIdx = (0 until dim).flatMap(i => (i until dim).map(j => (i, j)))
      .zipWithIndex.map { case ((i, j), p) => (p, i, j) }
      .toDF("pos", "i", "j")
    agged
      .select(col("__s"), col("__n"),
        posexplode(col("__g")).as(Seq("pos", "gram")))
      .join(broadcast(posIdx), "pos")
      .select(col("i"), col("j"), col("gram"),
        round6(col("gram") / col("__n") -
          (element_at(col("__s"), col("i") + lit(1)) / col("__n")) *
          (element_at(col("__s"), col("j") + lit(1)) / col("__n")))
          .as("cov"))
  }

  /** TOP-PRINCIPAL-COMPONENT projection — the PCA step an embedding
    * pipeline runs off [[gramCov]]'s statistics (drift axes, whitening
    * prep, 1-D ordering of a corpus): the dominant eigenvector of the
    * covariance matrix by POWER ITERATION, then pc1 = round6(v·w) per
    * row.
    *
    * Determinism/oracle story: the iteration runs DRIVER-side on the
    * collected covariance matrix — a bounded d² plan parameter, the
    * same class as IVF centroids — starting from the constant vector
    * round6(1/√d) and re-rounding each iterate to the 6dp grid. Since
    * [[gramCov]]'s covariances are themselves round6'd and
    * oracle-equal, both engines iterate the IDENTICAL double sequence
    * (ascending-j folds, one sqrt, one division — mirrored
    * op-for-op), so even the eigenvector's arbitrary SIGN matches and
    * the projection has an exact oracle. Fixed `iters` (no
    * convergence test — a data-dependent trip count would not be
    * SQL-mirrorable); 8 iterations separate the dominant axis in
    * practice, more sharpen it.
    *
    * Scale shape: one [[gramCov]] pass (see its note) + one narrow
    * projection scan with the d-double weight vector as a literal —
    * the corpus never shuffles. Fails fast on a zero covariance
    * matrix (no dominant axis) rather than emitting NaNs.
    * @return (vec_id, pc1), ragged rows excluded like [[gramCov]]. */
  def pcaProject(
      df: DataFrame, idCol: Column, vecCol: Column, dim: Int,
      iters: Int = 8): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    import graft.functions.TextFunctions.round6
    val c = Array.ofDim[Double](dim, dim)
    gramCov(df, vecCol, dim).select(col("i"), col("j"), col("cov"))
      .collect().foreach { r =>
        val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        c(i)(j) = v
        c(j)(i) = v
      }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    var w = Array.fill(dim)(r6(1.0 / math.sqrt(dim.toDouble)))
    for (_ <- 1 to iters) {
      val u = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i)(j) * w(j); j += 1 }
        acc
      }
      var nAcc = 0.0
      var i = 0
      while (i < dim) { nAcc += u(i) * u(i); i += 1 }
      val n = math.sqrt(nAcc)
      require(n > 0.0,
        "pcaProject: covariance matrix is zero — no dominant axis")
      w = u.map(x => r6(x / n))
    }
    val wLit = typedLit(w.toSeq)
    df.select(idCol.cast("long").as("vec_id"),
        transform(vecCol, _.cast("double")).as("__v"))
      .filter(size(col("__v")) === dim)
      .select(col("vec_id"),
        round6(graft.functions.VecFunctions.foldDot(col("__v"), wLit))
          .as("pc1"))
  }
}
