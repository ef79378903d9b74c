package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Anomaly, Ivf, Similarity}
import java.sql.Timestamp

/** MLlib-backed ops: IVF ANN recall vs brute force; anomaly scoring
  * surfaces the planted outlier. */
class MlOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("IVF top-k finds the exact nearest neighbours of a query (high recall)") {
    val rnd = new scala.util.Random(3)
    // three well-separated gaussian blobs in 8-d + a known near-identical pair
    def blob(center: Array[Float], n: Int, from: Int) =
      (from until from + n).map(i => (i.toLong,
        center.map(c => c + rnd.nextGaussian().toFloat * 0.05f)))
    val data = blob(Array.fill(8)(1f), 60, 0) ++
      blob(Array.fill(8)(-1f), 60, 100) ++
      blob(Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f), 60, 200)
    val embs = data.toDF("vec_id", "embedding")
    val query = data.head._2.map(_.toDouble).toSeq

    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = Ivf.build(embs, "vec_id", "embedding", nLists = 6)
    val ivf = Ivf.topK(idx, "vec_id", "embedding", query, k = 10, nProbe = 2)
      .collect().map(_.getLong(0)).toSet

    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall, brute=$brute ivf=$ivf")
  }

  test("IVF+PQ composed top-k keeps high recall on clustered data") {
    val rnd = new scala.util.Random(11)
    // well-separated blobs: PQ's GOOD case (structure to quantize), so
    // the composed path should track brute force closely
    def blob(center: Array[Float], n: Int, from: Int) =
      (from until from + n).map(i => (i.toLong,
        center.map(c => c + rnd.nextGaussian().toFloat * 0.05f)))
    val data = blob(Array.fill(8)(1f), 60, 0) ++
      blob(Array.fill(8)(-1f), 60, 100) ++
      blob(Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f), 60, 200)
    val embs = data.toDF("vec_id", "embedding")
    val query = data.head._2.map(_.toDouble).toSeq

    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = Ivf.build(embs, "vec_id", "embedding", nLists = 6)
    val cb = graft.ops.Pq.trainCodebooks(embs, "vec_id", "embedding",
      dim = 8, m = 4, k = 8)
    val composed = Ivf.topKIvfPq(idx, cb, "vec_id", "embedding", query,
      k = 10, nProbe = 2, shortlist = 30)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect composed).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF+PQ recall $recall, brute=$brute got=$composed")
  }

  test("persisted IVF index: identical top-k after reopen, probe prunes partitions") {
    val rnd = new scala.util.Random(7)
    val embs = (0 until 120).map(i => (i.toLong,
      Array.fill(8)((rnd.nextGaussian() * 0.3 + (if (i % 2 == 0) 1 else -1)).toFloat)))
      .toDF("vec_id", "embedding")
    val query = Seq.fill(8)(1.0)
    val idx = Ivf.build(embs, "vec_id", "embedding", nLists = 4)
    val direct = Ivf.topK(idx, "vec_id", "embedding", query, k = 5, nProbe = 2)
      .collect().map(_.getLong(0)).toSeq

    val path = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    Ivf.writeIndexed(idx, path)
    val reopened = Ivf.readIndexed(spark, path)
    assert(reopened.centroids.map(_._1).sorted.toSeq === idx.centroids.map(_._1).sorted.toSeq)
    val fromDisk = Ivf.topK(reopened, "vec_id", "embedding", query, k = 5, nProbe = 2)
    assert(fromDisk.collect().map(_.getLong(0)).toSeq === direct)
    // the probe's cell filter must reach the scan as a NON-EMPTY
    // partition filter (an unfiltered scan of a partitioned table still
    // prints "PartitionFilters: []", so check the bracket content)
    val plan = fromDisk.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ivf_cell".r.findFirstIn(plan).isDefined,
      s"no partition pruning in plan:\n$plan")
  }

  test("IVF append: new vectors land in the model's cells and are immediately searchable") {
    val rnd = new scala.util.Random(11)
    def blob(sign: Int, n: Int, from: Int) =
      (from until from + n).map(i => (i.toLong,
        Array.fill(8)((rnd.nextGaussian() * 0.2 + sign).toFloat)))
    val embs = (blob(1, 50, 0) ++ blob(-1, 50, 100)).toDF("vec_id", "embedding")
    val idx = Ivf.build(embs, "vec_id", "embedding", nLists = 4)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_app_").toString
    Ivf.writeIndexed(idx, path)

    // re-assigning the original corpus against the sidecar centroids
    // must reproduce the model's own cell assignment (same metric +
    // first-minimum tie rule as KMeans transform)
    val reassigned = Ivf.assignCells(idx.centroids, embs, "vec_id", "embedding")
      .select("vec_id", "ivf_cell").as[(Long, Int)].collect().toMap
    val original = idx.assigned
      .select("vec_id", "ivf_cell").as[(Long, Int)].collect().toMap
    assert(reassigned === original)

    // append a fresh batch near the positive blob; no retrain
    val fresh = blob(1, 10, 500).toDF("vec_id", "embedding")
    Ivf.append(spark, path, fresh, "vec_id", "embedding")
    val after = Ivf.readIndexed(spark, path)
    assert(after.assigned.count() === 110L)
    // an appended vector is its own nearest neighbour under the probe
    val q = fresh.head().getSeq[Float](1).map(_.toDouble).toSeq
    val top = Ivf.topK(after, "vec_id", "embedding", q, k = 1, nProbe = 2)
      .head().getLong(0)
    assert(top === 500L)
    // centroid sidecar untouched by the append
    assert(after.centroids.map(_._1).sorted.toSeq
      === idx.centroids.map(_._1).sorted.toSeq)
  }

  test("PQ on clustered data: high recall vs exact L2, low distortion, exact roundtrip determinism") {
    import graft.ops.Pq
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    def blob(center: Array[Float], n: Int, from: Int) =
      (from until from + n).map(i => (i.toLong,
        center.map(c => c + rnd.nextGaussian().toFloat * 0.05f)))
    val data = blob(Array.fill(8)(1f), 60, 0) ++
      blob(Array.fill(8)(-1f), 60, 100) ++
      blob(Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f), 60, 200)
    val embs = data.toDF("vec_id", "embedding")
    val query = data.head._2.map(_.toDouble).toSeq

    val cb = Pq.trainCodebooks(embs, "vec_id", "embedding", dim = 8, m = 4, k = 8)
    val enc = Pq.encode(embs, "embedding", cb)
    val l2 = aggregate(zip_with(col("embedding"), typedLit(query),
      (x, y) => (x - y) * (x - y)), lit(0.0), (a, v) => a + v)
    val exact = embs.withColumn("d", l2)
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val pq = Pq.topK(enc, "vec_id", "pq_code", cb, query, k = 10)
      .collect().map(_.getLong(0)).toSet
    // what PQ promises on clustered data is CLUSTER-level fidelity:
    // every ADC top-10 row must come from the query's own blob (ids
    // 0-59) — within a tight blob the points are identical at
    // quantization resolution, so exact rank inside it is tie-noise,
    // not signal. Still require real overlap with the exact set.
    assert(pq.forall(_ < 60), s"PQ leaked other-cluster ids: $pq")
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall $recall on clustered data, exact=$exact pq=$pq")

    // tight clusters quantize almost losslessly
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    val recon = flatten(zip_with(col("pq_code"), cbLit,
      (cd, cws) => element_at(cws, cd + 1)))
    val errSq = aggregate(zip_with(col("embedding"), recon,
      (x, r) => (x - r) * (x - r)), lit(0.0), (a, v) => a + v)
    val normSq = aggregate(col("embedding"), lit(0.0), (a, v) => a + v * v)
    val dist = enc.agg((sum(errSq) / sum(normSq)).as("rd")).head().getDouble(0)
    assert(dist <= 0.1, s"relative distortion $dist on tight clusters")

    // deterministic: retraining on the same data gives identical codebooks
    val cb2 = Pq.trainCodebooks(embs, "vec_id", "embedding", dim = 8, m = 4, k = 8)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq === cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("anomaly scoring ranks a planted outlier far above routine traffic") {
    // one entity: varied-but-routine payments, plus one wild amount
    // planted mid-sequence with an ordinary inter-txn gap (so the amount
    // is the only anomalous dimension)
    var clock = Timestamp.valueOf("2021-01-01 08:00:00").getTime
    val routine = (0 until 50).map { i =>
      clock += (60 + (i % 7) * 90) * 1000L
      (1L, i.toLong, new Timestamp(clock), 10.0 + (i % 10))
    }
    val mid = routine(25)._3.getTime + 30 * 1000L
    val outlier = Seq((1L, 999L, new Timestamp(mid), 9999.0))
    val txns = (routine ++ outlier).toDF("user_id", "event_id", "ts", "value")

    val scored = Anomaly.score(
      Anomaly.features(txns, "user_id", "ts", "value"),
      Seq("amt_z", "gap_s", "hour"), k = 3)
    val top = scored.orderBy(org.apache.spark.sql.functions.col("anomaly_score").desc)
      .select("event_id").head().getLong(0)
    assert(top === 999L)
    // scores exist for every row and are non-negative
    assert(scored.filter("anomaly_score < 0").count() === 0)
    assert(scored.count() === 51)
  }
}
