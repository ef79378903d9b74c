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

  /** Per-group mean pooling of embeddings (chunk embeddings → document
    * embedding, cluster centroids, label prototypes), elementwise and
    * EXACT: each element quantizes to `floor(v·10⁶)` int64 BEFORE
    * summation, so group sums are independent of partitioning /
    * summation order and the oracle replays them bit-for-bit (a double
    * mean differs in the last ulps between any two summation orders).
    * Tall output — (group, pos, n_vecs, mean_e6) — via one posexplode
    * feeding one map-side-combined aggregate; the shuffle carries
    * (group, dim-index, partial sum) triples, never vectors. Mixed
    * dimensionalities pool per-position over the vectors that have that
    * position (n_vecs is per-cell). */
  def meanPoolE6(embs: DataFrame, groupCol: String, vecCol: String): DataFrame =
    embs
      .select(col(groupCol),
        posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("_v").cast("double") * 1e6).cast("long")).as("sum_e6"))
      .withColumn("mean_e6", intDiv(col("sum_e6"), col("n_vecs")))

  /** Centroid silhouette on SQUARED distances — the clustering-quality
    * score per point: a² = squared distance to the own-label centroid,
    * b² = min squared distance to any other label's centroid,
    * s = (b² − a²) / max(a², b²) in [−1, 1], projected to e6.
    * (The classic all-pairs silhouette is O(n²); the centroid variant
    * is the standard scale substitute and one relational pass here.)
    *
    * Exactness discipline: elements quantize to `floor(v·2¹²)` int64
    * (a POWER-OF-TWO scale, so the float→int step itself is exact, not
    * rounded), centroids stay as (Σq, n) integer rationals, and the
    * per-dim terms (q·n − Σq)² are exact int64 summed relationally —
    * integer addition is order-independent, so no partitioning can
    * move the result. Only the final a²/b² division and the s ratio
    * promote to double — one exactly-rounded expression written
    * identically in the oracle. The per-point-per-label work is
    * |points|·dims·|labels| rows of (long, long) — shuffles carry dim
    * terms, never vectors, and labels are the only fan-out factor. */
  def silhouetteE6(embs: DataFrame, idCol: String, labelCol: String,
                   vecCol: String): DataFrame = {
    val dims = embs.select(col(idCol).as("_id"), col(labelCol).as("_own"),
        posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .withColumn("q", floor(col("_v").cast("double") * 4096).cast("long"))
    val cent = dims.groupBy(col("_own").as("_lbl"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
    val terms = dims.join(cent, Seq("pos"))
      .select(col("_id"), col("_own"), col("_lbl"),
        (col("q") * col("n") - col("s")).as("t"), col("n"))
    val d2 = terms.groupBy(col("_id"), col("_own"), col("_lbl"), col("n"))
      .agg(sum(col("t") * col("t")).as("num"))
      .withColumn("d2",
        col("num").cast("double") / (col("n") * col("n")).cast("double"))
    d2.groupBy(col("_id").as(idCol), col("_own").as(labelCol))
      .agg(min(when(col("_lbl") === col("_own"), col("d2"))).as("a2"),
        min(when(col("_lbl") =!= col("_own"), col("d2"))).as("b2"))
      .withColumn("s_e6",
        when(col("b2").isNull || (col("a2") === 0d && col("b2") === 0d),
          lit(null).cast("long"))
          .otherwise(floor(lit(1000000.0d) * (col("b2") - col("a2")) /
            greatest(col("a2"), col("b2"))).cast("long")))
      .select(col(idCol), col(labelCol), col("s_e6"))
  }

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

  /** Batch top-k retrieval: answers MANY queries in one bucket-local
    * pass — the batch-inference shape ([[lshTopK]] collects a single
    * query vector to the driver; when queries are themselves a table,
    * the right plan is an equi-join on the LSH bucket, with multi-probe
    * as a bounded explode of the query side). Per-query ranking orders
    * by unrounded cosine with the candidate id as tie-break. Returns
    * (qid, cid, cos_sim, rk). */
  def batchTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int = 5, planes: Int = 8, dim: Int = 64,
                probes: Int = 1): DataFrame = {
    val c = withLshBucket(corpus, vecCol, planes, dim)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"),
        col("lsh_bucket").as("cb"))
      .withColumn("cnrm", norm(col("cv")))
    val q0 = withLshBucket(queries, qvecCol, planes, dim)
      .select(col(qidCol).as("qid"), col(qvecCol).as("qv"),
        col("lsh_bucket").as("qb"))
      .withColumn("qnrm", norm(col("qv")))
    // multi-probe = the query's bucket plus its hamming-1 flips; buckets
    // are distinct, so a candidate pairs with a query at most once
    val targets: Column =
      if (probes <= 1) array(col("qb"))
      else array(col("qb") +:
        (0 until planes).map(i => col("qb").bitwiseXOR(lit(1 << i))): _*)
    val pairs = q0.withColumn("tb", explode(targets))
      .join(c, col("tb") === col("cb"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm")))
          .as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("cid"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Approximate k-NN graph: each vector's top-`k` cosine neighbors among
    * vectors sharing its LSH bucket — the all-pairs primitive behind
    * near-dup clustering, diversity sampling, and graph-based ANN index
    * builds. The candidate join is bucket-local (never O(n²) over the
    * corpus): with `planes` hyperplanes the corpus splits into 2^planes
    * buckets, the single explicit repartition on the bucket is the one
    * exchange both join sides reuse, and norms are materialized per
    * vector before the pair join (see [[graft.ops.Dedup.embeddingNearDup]]).
    * Per-source ranking orders by unrounded cosine with the neighbor id
    * as tie-break. Neighbors in other buckets are missed — the recall
    * trade every bucketed ANN makes; more planes → smaller buckets →
    * cheaper join and lower recall. */
  def knnGraph(embs: DataFrame, idCol: String, vecCol: String,
               k: Int = 3, planes: Int = 4, dim: Int = 64): DataFrame = {
    // pinned width (r19): the bucket self-join's dot products are the
    // compute; AQE's byte-based coalescing would serialize them
    val bucketed = pinnedWidth(withLshBucket(embs, vecCol, planes, dim)
      .select(col(idCol).as("vid"), col(vecCol).as("v"), col("lsh_bucket"))
      .withColumn("nrm", norm(col("v"))), col("lsh_bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    val pairs = a.join(b, col("a.lsh_bucket") === col("b.lsh_bucket") &&
        col("a.vid") =!= col("b.vid"))
      .select(col("a.vid").as("src_id"), col("b.vid").as("dst_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src_id")).orderBy(col("cos_sim").desc, col("dst_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions:
    * one dot product per output axis against the deterministic Gaussian
    * [[hyperplanes]] (same fixed seed the LSH family uses, so an oracle
    * can replay the projection from the plane literals). Pure codegen'd
    * per-row work — no shuffle, no fitting pass; at 100 TB this is the
    * cheap first stage before any pairwise computation, shrinking both
    * the shuffle width and the downstream distance math by dim/outDim. */
  def randomProject(embs: DataFrame, vecCol: String, outDim: Int,
                    dim: Int = 64, outPrefix: String = "p"): DataFrame =
    hyperplanes(outDim, dim).zipWithIndex.foldLeft(embs) { case (df, (p, i)) =>
      df.withColumn(s"$outPrefix$i", dot(col(vecCol), typedLit(p)))
    }
}
