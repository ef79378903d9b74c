package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN at scale (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): vectors are
  * split into `m` subspaces, each quantized independently to one of `k`
  * codewords, so a d-dim float vector compresses to `m` small codes
  * (m=8, k=16 → 8 codes of 4 bits: 32× smaller than float32 at d=64)
  * and query-time distance becomes `m` table lookups per candidate —
  * the memory layout that lets a 100 TB embedding corpus fit its
  * scan-side working set in RAM.
  *
  * Division of labor (the same sidecar pattern as [[Ivf]]): codebooks
  * are TRAINED on a bounded, deterministic, hash-ordered sample
  * collected to the driver (≤ `maxTrainRows` rows — Lloyd's iterations
  * on ~2000×64 doubles are microseconds of driver CPU, not a cluster
  * job), then shipped into the plan as literals; ENCODING and ADC
  * scoring are pure codegen'd HOF expressions over the full
  * distributed table — one pass, no shuffle, no UDF.
  */
object Pq {

  /** Per-subspace codebooks: `codebooks(j)(c)` is the c-th codeword
    * (a subDim-length Array[Double]) of subspace j. Trained by seeded
    * Lloyd's iterations on the first `maxTrainRows` vectors in
    * portable-hash order of `idCol` (deterministic across runs and
    * partitionings). Initialization: k evenly spaced vectors of the
    * ordered sample per subspace; an emptied cluster keeps its previous
    * centroid. `dim` must divide into `m` equal subspaces. */
  def trainCodebooks(embs: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int = 8, k: Int = 16, iters: Int = 10,
                     maxTrainRows: Int = 2000): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subspaces")
    val subDim = dim / m
    val sample: Array[Array[Double]] = embs
      .select(col(idCol), col(vecCol))
      .orderBy(Dedup.portableTokenHash(col(idCol).cast("string")), col(idCol))
      .limit(maxTrainRows)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty table")
    (0 until m).map { j =>
      val subs = sample.map(v => v.slice(j * subDim, (j + 1) * subDim))
      var centroids: Array[Array[Double]] =
        Array.tabulate(k)(c => subs((c.toLong * subs.length / k).toInt).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Long](k)
        subs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var i = 0
            while (i < subDim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        centroids = Array.tabulate(k)(c =>
          if (counts(c) == 0) centroids(c)
          else sums(c).map(_ / counts(c)))
      }
      centroids
    }.toArray
  }

  /** Adds `codeCol` (array<int>, length m): per subspace, the index of
    * the L2-nearest codeword. Codebooks ride as literals; the argmin is
    * a codegen'd HOF chain evaluated once per (row, subspace). */
  def encode(df: DataFrame, vecCol: String,
             codebooks: Array[Array[Array[Double]]],
             codeCol: String = "pq_code"): DataFrame = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    val codes = (0 until m).map { j =>
      val sub = slice(col(vecCol), j * subDim + 1, subDim)
      val cb = typedLit(codebooks(j).map(_.toSeq).toSeq)
      val dists = transform(cb, cw =>
        aggregate(zip_with(sub, cw, (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, v) => acc + v))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    df.withColumn(codeCol, array(codes: _*))
  }

  /** Asymmetric-distance (ADC) approximate L2² to `query`: the
    * per-subspace distances query↔codeword are precomputed driver-side
    * into an m×k lookup literal, so scoring a candidate is m
    * `element_at` lookups — no vector arithmetic in the scan. */
  def adcDistance(codeCol: Column, codebooks: Array[Array[Array[Double]]],
                  query: Seq[Double]): Column = {
    val subDim = codebooks(0)(0).length
    val lut: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, j) =>
      val qs = query.slice(j * subDim, (j + 1) * subDim)
      cb.toSeq.map(cw => cw.zip(qs).map { case (c, q) =>
        (q - c) * (q - c) }.sum)
    }.toSeq
    aggregate(
      zip_with(codeCol, typedLit(lut), (cd, l) => element_at(l, cd + 1)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** PQ-ANN top-k: encode once (or reuse a stored `codeCol`), score by
    * ADC, take the k smallest — scan + TakeOrdered, no shuffle. */
  def topK(encoded: DataFrame, idCol: String, codeCol: String,
           codebooks: Array[Array[Array[Double]]], query: Seq[Double],
           k: Int): DataFrame =
    encoded
      .withColumn("adc_dist", adcDistance(col(codeCol), codebooks, query))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
}
