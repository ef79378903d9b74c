package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *   - `bruteForceTopK` — exact cosine against every vector, global top-k.
  *     One scan, no shuffle of vectors (top-k via TakeOrdered); the
  *     correctness baseline.
  *   - `lshTopK` — random-hyperplane LSH bucketing: vectors land in a
  *     sign-bit bucket; the query probes only its own bucket (and
  *     optionally near buckets). At 100 TB this turns a full scan into a
  *     bucket-pruned scan when the bucketed table is written partitioned
  *     by `lsh_bucket` (partition pruning does the skipping).
  *
  * All vector math is codegen'd `zip_with`/`aggregate` HOFs over doubles —
  * no UDF, no driver-side loop.
  */
object Similarity {

  /** Sequential-fold dot product in double precision — the codegen'd
    * custom expression (graft.functions.VectorDot). */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vectorDot(a, b)

  /** Builtin-HOF formulation of the same fold; kept as the semantic
    * reference for VectorDot (OpsSpec asserts bit-equality). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic random hyperplanes (fixed seed): `planes` rows of
    * `dim` doubles, embedded as plan literals. Public so an independent
    * oracle can re-derive the exact same bucketing (the plane values are
    * part of the operator's deterministic contract, not hidden state). */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id from `planes` hyperplanes (assumes 64-dim
    * vectors by default; pass `dim` to match the embedding width). */
  def lshBucket(vec: Column, planes: Int, dim: Int = 64): Column =
    hyperplanes(planes, dim).zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  def withLshBucket(embs: DataFrame, vecCol: String, planes: Int,
                    dim: Int = 64): DataFrame =
    embs.withColumn("lsh_bucket", lshBucket(col(vecCol), planes, dim))

  /** Exact brute-force cosine top-k of `embs` against a literal query
    * vector. Returns (id, cos_sim) ordered desc with id tie-break. */
  def bruteForceTopK(embs: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    embs.select(col(idCol),
        cosine(col(vecCol), typedLit(query)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)

  /** Symmetric per-vector int8 quantization — the 4× memory/IO lever for
    * embedding storage and ANN at corpus scale (float32 → int8 at rest,
    * in shuffles, and in executor cache; recall loss is bounded by
    * half-step error ≤ scale/2 per axis). `scale = max|v| / 127`;
    * `q_i = clamp(⌊v_i/scale + 0.5⌋, ±127)` — floor(x+0.5) rather than
    * round() because banker's-rounding tie behavior differs across
    * engines and this op's contract is bit-reproducible anywhere (the
    * oracle replays it in DuckDB). Zero vectors quantize to zeros.
    * Output: input + `scale` (double) + `q` (array<byte>). */
  def quantizeInt8(embs: DataFrame, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x))) / 127d
    embs
      .withColumn("scale", scale)
      .withColumn("q",
        when(col("scale") === 0d, transform(v, _ => lit(0).cast("byte")))
          .otherwise(transform(v, x =>
            greatest(lit(-127d), least(lit(127d), floor(x / col("scale") + 0.5d)))
              .cast("byte"))))
  }

  /** Dequantized vector (`array<double>`): `q_i * scale`. Compose with
    * [[cosine]] for approximate scoring over quantized storage. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, x => x.cast("double") * scaleCol)

  /** LSH-pruned top-k: score only vectors in the query's bucket. With
    * `probes > 1`, also search buckets at hamming distance 1 (multi-probe)
    * to trade recall for scan size. */
  def lshTopK(embs: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, planes: Int = 8,
              probes: Int = 1): DataFrame = {
    val dim = query.length
    val bucketed = withLshBucket(embs, vecCol, planes, dim)
    val qBucket = hyperplanes(planes, dim).zipWithIndex.map { case (p, i) =>
      if (p.zip(query).map { case (x, y) => x * y }.sum >= 0) 1 << i else 0
    }.sum
    val targets: Seq[Int] =
      if (probes <= 1) Seq(qBucket)
      else qBucket +: (0 until planes).map(b => qBucket ^ (1 << b))
    bucketed.filter(col("lsh_bucket").isin(targets: _*))
      .select(col(idCol), cosine(col(vecCol), typedLit(query)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }
}
