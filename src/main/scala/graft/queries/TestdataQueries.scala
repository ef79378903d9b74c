package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.etl.Scd2
import graft.ops.{intDiv, AsOfJoin, Dedup, FuzzyJoin, Selection, SetJoin, Similarity, TextAnalysis}
import graft.rules.FraudRules
import scala.jdk.CollectionConverters._

/** The SURVEY §2 operator inventory mapped onto the driver's testdata
  * tables (TESTDATA.md / FIXTURES.md §B), one named query per operator,
  * each with matching ANSI SQL for the DuckDB oracle where the semantics
  * are SQL-expressible (hash-function-based ops are rows-only).
  *
  * Hash-stability rules: money aggregates sum exact int64 cents
  * (`cents`, below) on BOTH sides — double sums are order-sensitive and
  * double→decimal tie-rounding differs across engines; epoch arithmetic
  * truncates per-timestamp on both sides; every computed column is
  * aliased identically in the DataFrame code and the SQL.
  */
object TestdataQueries {

  /** Schema-adaptive events reader. The driver's generator has shipped
    * `ts` with two physical types across rounds: TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects (read the nanos as long and
    * truncate to micros — exactly what DuckDB does on load, keeping
    * oracle comparisons aligned), and plain timestamp[us] without
    * timezone (Spark reads TIMESTAMP_NTZ; cast to the session-TZ
    * timestamp so downstream unix_timestamp arithmetic is unchanged).
    * Branch on the observed schema rather than assuming either — the
    * generator may flip again (it did between r6 and r7, which broke 57
    * of 179 oracle queries for a round). */
  private[graft] def readEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") readEvents(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  private val d182 = DecimalType(18, 2)

  /** Money columns arrive as doubles; summing them as DECIMAL requires a
    * double→decimal conversion whose tie-rounding differs between engines
    * (Spark casts via the shortest decimal string with HALF_UP, DuckDB
    * rounds the binary value half-to-even), which flips a few cents on
    * boundary rows and breaks the oracle hash. `floor(x*100)` is a pure
    * IEEE op — bit-identical everywhere — so sums are exact int64 cents. */
  private def cents(c: Column): Column = floor(c * 100).cast("long")

  /** Identifier-safe per-SF token for scratch paths — trailing-slash
    * insensitive so "/x/sf0.01" and "/x/sf0.01/" land in one place (the
    * static oracle SQL embeds the same token via this function, so the
    * two sides cannot drift). */
  private def sfToken(dir: String): String =
    dir.replaceAll("/+$", "").replaceAll("[^A-Za-z0-9]", "_")

  /** Placeholder in oracle SQL for the per-SF scratch token; bound to a
    * concrete SF by [[oracleSqlFor]] at dump time. */
  private val SfTokenPlaceholder = "__GRAFT_SF_TOKEN__"

  /** Reset-and-create a per-SF scratch dir for queries that materialize
    * fixtures or warehouse state (s1/s2/c2). */
  private def scratchDir(prefix: String, dir: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"${prefix}_${sfToken(dir)}")
    graft.catalog.TableCatalog.deleteRecursively(p)
    java.nio.file.Files.createDirectories(p)
    p
  }

  /** Runs `body` with `spark.sql.shuffle.partitions` scoped down for the
    * stateful streaming fixtures: each state partition costs a
    * state-store commit per micro-batch, and the gate's batches carry a
    * few thousand rows — 32 partitions is pure per-batch overhead at
    * fixture scale. The checkpoint pins the value at first run, so this
    * is a fixture-scale knob, not a semantics change (state hashing by
    * key is partition-count-independent for results). */
  private def withStreamPartitions[T](s: SparkSession, n: Int = 4)(body: => T): T = {
    val old = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", old)
  }

  /** The c1 SCD2 test world: a customer-derived dim (keys not divisible
    * by 7, original segments, open since 2020-01-01) merged with a
    * staging snapshot where every 10th key changed segment — shared by
    * the merge and as-of queries. */
  private def scd2MergedDim(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val dim = cust.filter(col("c_custkey") % 7 =!= 0).select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
      lit(java.sql.Date.valueOf("2020-01-01")).as("effective_from"),
      lit(java.sql.Date.valueOf("3000-01-01")).as("effective_to"),
      lit(false).as("deleted_flg"))
    val stg = cust.select(col("c_custkey").as("k"),
      when(col("c_custkey") % 10 === 0, "CHANGED")
        .otherwise(col("c_mktsegment")).as("seg"))
    Scd2.merge(dim, stg, Scd2.DimSpec("k", Seq("seg")),
      java.sql.Date.valueOf("2021-01-01"))
  }

  private val scd2MergeOracleSql: String =
    """WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg,
      |    DATE '2020-01-01' AS effective_from, DATE '3000-01-01' AS effective_to,
      |    FALSE AS deleted_flg FROM customer WHERE c_custkey % 7 <> 0),
      |  stg AS (SELECT c_custkey AS k,
      |    CASE WHEN c_custkey % 10 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS seg FROM customer)
      |SELECT d.k AS k, d.seg AS seg, d.effective_from AS effective_from,
      |       d.effective_to AS effective_to, d.deleted_flg AS deleted_flg
      |FROM dim d LEFT JOIN stg s ON d.k = s.k
      |WHERE s.k IS NULL OR NOT (d.seg <> s.seg)
      |UNION ALL
      |SELECT d.k, d.seg, d.effective_from, DATE '2021-01-01', TRUE
      |FROM dim d JOIN stg s ON d.k = s.k WHERE d.seg <> s.seg
      |UNION ALL
      |SELECT s.k, s.seg, DATE '2021-01-01', DATE '3000-01-01', FALSE
      |FROM stg s LEFT JOIN dim d ON d.k = s.k WHERE d.k IS NULL OR d.seg <> s.seg""".stripMargin

  /** Shared DuckDB CTE text for the word-trigram inverted index —
    * distinct shingles per doc (`tri`), per-doc shingle counts
    * (`sizes`), and candidate pair intersection counts (`p0`). Three
    * oracles build on the same tokenization; one definition keeps them
    * from drifting apart. */
  private val trigramCte: String =
    """splits AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |toks AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM splits),
      |tri AS (SELECT DISTINCT doc_id,
      |    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY lead(tok, 2) OVER w IS NOT NULL),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM tri GROUP BY doc_id)""".stripMargin

  /** Smoothed corpus-unigram negative-log-likelihood per document —
    * ONE definition shared by the x_unigram_logprob and x_ccnet_buckets
    * oracles (the two must score documents identically or the bucket
    * cuts drift from the scores they claim to rank). Mirrors
    * [[graft.ops.TextAnalysis.unigramLogProb]] at alpha = 0.5. */
  private val unigramLmCte: String =
    """tk AS (SELECT doc_id, tok FROM
      |    (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
      |     FROM documents) WHERE tok <> ''),
      |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY tok),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tk),
      |lm AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
      |    CAST(floor(-avg(ln((tf.c + 0.5) / (tot.n + 0.5 * tot.v))) * 10000)
      |      AS BIGINT) AS nll_e4
      |  FROM tk JOIN tf USING (tok) CROSS JOIN tot
      |  GROUP BY tk.doc_id)""".stripMargin

  /** DuckDB replay of [[graft.ops.Pii.luhnValid]] over string expression
    * `m`: strip non-digits, reverse, double every second digit with
    * digit-sum folding, valid iff length 13–19 and total ≡ 0 (mod 10).
    * The digit list is re-spelled per use (no SQL let-binding in a
    * lambda position); ONE builder so the three call sites cannot
    * drift. */
  private def luhnSql(m: String): String = {
    val digits =
      s"list_reverse(string_split(regexp_replace($m, '[^0-9]', '', 'g'), ''))"
    s"(len($digits) BETWEEN 13 AND 19 AND coalesce(list_sum(" +
      s"list_transform(range(1, len($digits) + 1), i -> " +
      s"CASE WHEN (i - 1) % 2 = 0 THEN CAST($digits[i] AS INTEGER) " +
      s"WHEN CAST($digits[i] AS INTEGER) * 2 > 9 " +
      s"THEN CAST($digits[i] AS INTEGER) * 2 - 9 " +
      s"ELSE CAST($digits[i] AS INTEGER) * 2 END)), 0) % 10 = 0)"
  }

  /** Exact-Jaccard candidate pairs over [[trigramCte]] at `minJaccard`
    * (no doc-frequency cut — the callers that need one add it). */
  private def trigramPairsSql(minJaccard: Double): String =
    s"""$trigramCte,
       |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       |  FROM tri a JOIN tri b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (SELECT id_a, id_b, common,
       |    CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
       |  FROM p0
       |  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= $minJaccard)""".stripMargin

  /** DuckDB replay of the portable 62-bit hash (PortableHash62 /
    * Dedup.portableTokenHash) of string expression `e` — the same
    * h31 | (h37 · 2³²) fold the splits/fingerprint oracles inline.
    * ONE line on purpose: interpolated into stripMargin'd SQL, a
    * line-leading bitwise `|` would be eaten as a margin marker. */
  private def portableHashSql(e: String): String =
    s"(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ord(c) AS BIGINT))), " +
      "(acc, c) -> (acc * 31 + c) % 1000000007) | " +
      s"(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ord(c) AS BIGINT))), " +
      "(acc, c) -> (acc * 37 + c) % 998244353) * 4294967296))"

  /** Exact lower-weighted-median crossover per return flag — shared by
    * the direct (x_weighted_median) and bucketed
    * (x_weighted_median_bucketed) formulations, which must agree. */
  private lazy val weightedMedianOracleSql: String =
    """WITH li AS (SELECT l_returnflag AS g,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
      |pv AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS vw
      |  FROM li GROUP BY 1, 2),
      |cum AS (SELECT g, v,
      |    CAST(sum(vw) OVER (PARTITION BY g ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
      |    CAST(sum(vw) OVER (PARTITION BY g) AS BIGINT) AS tw
      |  FROM pv)
      |SELECT g, CAST(min(v) AS BIGINT) AS wmedian_c,
      |  CAST(max(tw) AS BIGINT) AS total_w
      |FROM cum WHERE cw * 2 >= tw GROUP BY 1""".stripMargin

  /** Cell-exact Count-Min replay over order custkeys (3×512, salted
    * portable hashes) — shared by x_countmin and x_stream_countmin,
    * whose persisted streaming state must equal the one-shot sketch. */
  private lazy val countMinOracleSql: String =
    s"""WITH src AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders),
       |d AS (SELECT i FROM (VALUES (0), (1), (2)) t(i)),
       |cells AS (SELECT i,
       |    ${portableHashSql("'cm' || i || ':' || CAST(k AS VARCHAR)")} % 512
       |      AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM src CROSS JOIN d GROUP BY 1, 2),
       |exact AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM src GROUP BY 1),
       |top AS (SELECT * FROM exact ORDER BY n DESC, k LIMIT 20),
       |probes AS (SELECT top.k, d.i,
       |    ${portableHashSql("'cm' || d.i || ':' || CAST(top.k AS VARCHAR)")} % 512
       |      AS bucket
       |  FROM top CROSS JOIN d),
       |est AS (SELECT p.k, min(coalesce(c.cnt, 0)) AS est FROM probes p
       |  LEFT JOIN cells c ON c.i = p.i AND c.bucket = p.bucket GROUP BY 1)
       |SELECT top.k, top.n, CAST(est.est AS BIGINT) AS est
       |FROM top JOIN est ON top.k = est.k""".stripMargin

  /** One BPE merge round in DuckDB: pair counts over `cur${r-1}` via the
    * trigramCte-style unnest+lead, the deterministic argmax, and the
    * greedy left-to-right rewrite in PURE WINDOW SQL. Greedy semantics
    * without a fold: overlapping candidates only occur for a == b
    * (tok[p]=a ∧ tok[p+1]=b=a chains), where greedy keeps every ODD
    * offset within a run of consecutive candidate positions — a
    * gaps-and-islands parity rule. A merged position emits the fused
    * symbol; the position after a merged one is dropped; everything
    * else passes through. (A struct-state list_reduce replay of the
    * Spark fold crashes DuckDB on real columns — the semantics, not
    * the technique, are what the oracle must mirror.) */
  private def bpeRoundSql(r: Int): String = {
    val prev = s"cur${r - 1}"
    s"""tok$r AS (SELECT doc_id, unnest(toks) AS tok,
       |    generate_subscripts(toks, 1) AS pos FROM $prev),
       |cnt$r AS (SELECT p1, p2, count(*) AS c FROM (
       |    SELECT tok AS p1, lead(tok) OVER
       |      (PARTITION BY doc_id ORDER BY pos) AS p2 FROM tok$r
       |    QUALIFY p2 IS NOT NULL) GROUP BY 1, 2),
       |best$r AS (SELECT p1, p2 FROM cnt$r ORDER BY c DESC, p1, p2 LIMIT 1),
       |cand$r AS (SELECT t.doc_id, t.pos FROM tok$r t
       |  JOIN tok$r n ON n.doc_id = t.doc_id AND n.pos = t.pos + 1
       |  CROSS JOIN best$r WHERE t.tok = p1 AND n.tok = p2),
       |mrg$r AS (SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos, row_number() OVER
       |      (PARTITION BY doc_id, grp ORDER BY pos) AS off
       |    FROM (SELECT doc_id, pos, pos - row_number() OVER
       |        (PARTITION BY doc_id ORDER BY pos) AS grp FROM cand$r))
       |  WHERE off % 2 = 1),
       |cur$r AS (SELECT doc_id, list(newtok ORDER BY pos) AS toks FROM (
       |    SELECT t.doc_id, t.pos,
       |      CASE WHEN m.pos IS NOT NULL THEN p1 || '_' || p2
       |           ELSE t.tok END AS newtok
       |    FROM tok$r t CROSS JOIN best$r
       |    LEFT JOIN mrg$r m ON m.doc_id = t.doc_id AND m.pos = t.pos
       |    LEFT JOIN mrg$r d ON d.doc_id = t.doc_id AND d.pos = t.pos - 1
       |    WHERE d.pos IS NULL)
       |  GROUP BY doc_id)""".stripMargin
  }

  /** The x_bpe_apply oracle: replay sample-trained BPE (`rounds` merges
    * induced on the first `sampleN` docs in portable-hash order) and the
    * sequential merge-table apply over the WHOLE corpus, then
    * fingerprint every rewritten doc. Two tricks keep 2×`rounds` rewrite
    * stages tractable in DuckDB:
    *   - every chain CTE is MATERIALIZED (DuckDB inlines by default; an
    *     inlined 24-deep chain re-opens the parquet per reference);
    *   - each greedy rewrite is ONE string `replace`: tokens joined with
    *     DOUBLED chr(1) separators and the pattern wrapped in single
    *     separators makes non-overlapping left-to-right `replace` exactly
    *     the greedy leftmost merge fold ([a,a,b]: '␁a␁␁a␁␁b␁' matches
    *     '␁a␁␁b␁' only at the second 'a' → [a, a_b]; [a,b,a,b]: the
    *     consumed trailing '␁' leaves the next occurrence's own '␁'
    *     intact → [a_b, a_b] — mergeOnce's exact overlap rule).
    * Training rounds count pairs with the proven unnest+lead argmax
    * (count desc, p1, p2 — binary collation, matching the driver-local
    * UTF-8-byte tie-break in Bpe.trainOnSample). */
  private def bpeApplyOracleSql(rounds: Int, sampleN: Int): String = {
    val sep = "chr(1)"
    def wrap(listExpr: String) =
      s"$sep || array_to_string($listExpr, $sep || $sep) || $sep"
    val pat = s"$sep || p1 || $sep || $sep || p2 || $sep"
    val rep = s"$sep || p1 || '_' || p2 || $sep"
    def bestSql(r: Int) =
      s"""scnt$r AS MATERIALIZED (SELECT p1, p2, count(*) AS c FROM (
         |    SELECT tok AS p1, lead(tok) OVER
         |      (PARTITION BY doc_id ORDER BY pos) AS p2
         |    FROM (SELECT doc_id, unnest(toks) AS tok,
         |      generate_subscripts(toks, 1) AS pos FROM samp${r - 1})
         |    QUALIFY p2 IS NOT NULL) GROUP BY 1, 2),
         |best$r AS MATERIALIZED (SELECT p1, p2 FROM scnt$r
         |  ORDER BY c DESC, p1, p2 LIMIT 1)""".stripMargin
    def sampRewrite(r: Int) =
      s"""samp$r AS MATERIALIZED (SELECT doc_id,
         |  list_filter(string_split(replace(${wrap("toks")}, $pat, $rep),
         |    $sep), t -> t <> '') AS toks
         |  FROM samp${r - 1} CROSS JOIN best$r)""".stripMargin
    def curRewrite(r: Int) =
      s"""cur$r AS MATERIALIZED (SELECT doc_id, replace(s, $pat, $rep) AS s
         |  FROM cur${r - 1} CROSS JOIN best$r)""".stripMargin
    val parts = Seq(
      "corpus AS MATERIALIZED (SELECT doc_id, " +
        "list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks " +
        "FROM documents)",
      s"""samp0 AS MATERIALIZED (SELECT doc_id, toks FROM corpus
         |  ORDER BY ${portableHashSql("CAST(doc_id AS VARCHAR)")}, doc_id
         |  LIMIT $sampleN)""".stripMargin) ++
      (1 to rounds).flatMap(r => Seq(bestSql(r), sampRewrite(r))) ++
      Seq(s"cur0 AS MATERIALIZED (SELECT doc_id, ${wrap("toks")} AS s FROM corpus)") ++
      (1 to rounds).map(curRewrite) ++
      Seq(s"""fin AS (SELECT doc_id, list_filter(string_split(s, $sep),
             |  t -> t <> '') AS toks FROM cur$rounds)""".stripMargin)
    s"""WITH ${parts.mkString(",\n")}
       |SELECT c0.doc_id, CAST(len(c0.toks) AS BIGINT) AS n_before,
       |  CAST(len(fin.toks) AS BIGINT) AS n_after,
       |  ${portableHashSql("array_to_string(fin.toks, ' ')")} AS fp
       |FROM fin JOIN corpus c0 ON c0.doc_id = fin.doc_id""".stripMargin
  }

  /** The fixed-point PageRank oracle: `iterations` damped rounds in
    * chained CTEs over the e/nodes/deg/nn prelude, integer-exact (`//`
    * and the 85/100 damping replay ops.PageRank's int64 arithmetic
    * bit-for-bit — no doubles, so no summation-order drift). */
  private def pagerankRoundsSql(iterations: Int): String =
    (1 to iterations).map { i =>
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""c$i AS (SELECT e.dst, p.pr // d.deg AS c
         |  FROM e JOIN $prev p ON e.src = p.id JOIN deg d ON d.src = e.src),
         |s$i AS (SELECT dst, CAST(sum(c) AS BIGINT) AS m FROM c$i GROUP BY dst),
         |p$i AS (SELECT nodes.id, 150000000000 // nn.n + (85 * coalesce(s$i.m, 0)) // 100 AS pr
         |  FROM nodes CROSS JOIN nn LEFT JOIN s$i ON s$i.dst = nodes.id)""".stripMargin
    }.mkString(",\n")

  /** Personalized-PageRank rounds: [[pagerankRoundsSql]] with the
    * teleport term restricted to the seed set (`seedPred` over
    * nodes.id, mass split `// ns.n` across seeds) — replaying
    * ops.PageRank.runPersonalized's int64 arithmetic bit-for-bit. */
  private def pprRoundsSql(iterations: Int, seedPred: String): String =
    (1 to iterations).map { i =>
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""c$i AS (SELECT e.dst, p.pr // d.deg AS c
         |  FROM e JOIN $prev p ON e.src = p.id JOIN deg d ON d.src = e.src),
         |s$i AS (SELECT dst, CAST(sum(c) AS BIGINT) AS m FROM c$i GROUP BY dst),
         |p$i AS (SELECT nodes.id,
         |    CASE WHEN $seedPred THEN 150000000000 // ns.n ELSE 0 END
         |      + (85 * coalesce(s$i.m, 0)) // 100 AS pr
         |  FROM nodes CROSS JOIN ns LEFT JOIN s$i ON s$i.dst = nodes.id)""".stripMargin
    }.mkString(",\n")

  /** The 16-bit Morton interleave as literal DuckDB SQL over `zx`/`zy` —
    * the same 32 shift/mask terms ZOrder.zValue builds as Columns. */
  private def interleave16Sql: String =
    (0 until 16).map(i =>
      s"(((zx >> $i) & 1) << ${2 * i}) | (((zy >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")

  /** The k-core peel unrolled as chained DuckDB CTEs: round i derives
    * degrees from e{i-1}, keeps vertices with deg ≥ k, and filters
    * edges to kept endpoints — the same rounds KCore.kcore runs (peel
    * is monotone: at fixpoint further rounds are identities).
    * MATERIALIZED is load-bearing: each round references the previous
    * CTE twice, so inlining doubles the join tree per round — 2^rounds
    * plan blowup (measured: the inlined form never finishes at 8
    * rounds; materialized runs in ~1 s). */
  private def kcorePeelSql(k: Int, rounds: Int): String =
    (1 to rounds).map { i =>
      s"""n$i AS MATERIALIZED (SELECT src AS id FROM e${i - 1} GROUP BY 1
         |  HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN n$i a ON e.src = a.id JOIN n$i b ON e.dst = b.id)""".stripMargin
    }.mkString(",\n")

  /** The Hilbert xy2d bit walk as chained DuckDB CTEs over (hx, hy,
    * hd), top level first — the same `bits` projection steps
    * Hilbert.withHilbert builds (quadrant digit + frame rotation per
    * level). Each CTE is referenced exactly once, so no MATERIALIZED is
    * needed — the chain stays linear. `keep` = payload columns carried
    * through. */
  private def hilbertSql(bits: Int, keep: String): String =
    (bits - 1 to 0 by -1).map { level =>
      val s = 1L << level
      val j = bits - level // h1 is the first step after h0
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      val x1 = s"(CASE WHEN $ry = 0 AND $rx = 1 THEN ${s - 1} - hx ELSE hx END)"
      val y1 = s"(CASE WHEN $ry = 0 AND $rx = 1 THEN ${s - 1} - hy ELSE hy END)"
      s"""h$j AS (SELECT $keep,
         |  CASE WHEN $ry = 0 THEN $y1 ELSE $x1 END AS hx,
         |  CASE WHEN $ry = 0 THEN $x1 ELSE $y1 END AS hy,
         |  hd + ${s * s} * xor(3 * $rx, $ry) AS hd
         |  FROM h${j - 1})""".stripMargin
    }.mkString(",\n")

  /** Skilling's n-D Hilbert transform as literal DuckDB SQL — one
    * chained CTE per in-place step of the C loop (Hilbert.withHilbertN
    * replays the same steps as Column projections): inverse-undo per
    * (bit plane, dimension), sequential Gray decode, trailing xor-mask,
    * then the transposed-coordinate interleave with dimension 0 most
    * significant. Expects a CTE `s0` carrying `$key, g0..g{n-1}`; the
    * chain ends in `hnd` with `$key, hd`. Single-reference CTEs form a
    * linear projection chain (no MATERIALIZED needed — the 2^rounds
    * explosion only bites CTEs referenced twice). */
  private def hilbertNdSql(n: Int, bits: Int, key: String): String = {
    val gs = 0 until n
    val steps = scala.collection.mutable.Buffer[String]()
    var prev = "s0"
    var idx = 0
    def cte(exprs: Seq[String]): Unit = {
      idx += 1
      steps += s"s$idx AS (SELECT $key, ${exprs.mkString(", ")} FROM $prev)"
      prev = s"s$idx"
    }
    for (level <- bits - 1 to 1 by -1) {
      val q = 1L << level
      val p = q - 1
      for (i <- 0 until n) {
        if (i == 0)
          cte(gs.map { j =>
            if (j == 0) s"CASE WHEN (g0 & $q) != 0 THEN xor(g0, $p) ELSE g0 END AS g0"
            else s"g$j"
          })
        else
          cte(gs.map { j =>
            if (j == 0)
              s"CASE WHEN (g$i & $q) != 0 THEN xor(g0, $p) " +
                s"ELSE xor(g0, xor(g0, g$i) & $p) END AS g0"
            else if (j == i)
              s"CASE WHEN (g$i & $q) != 0 THEN g$i " +
                s"ELSE xor(g$i, xor(g0, g$i) & $p) END AS g$i"
            else s"g$j"
          })
      }
    }
    for (i <- 1 until n)
      cte(gs.map(j => if (j == i) s"xor(g$i, g${i - 1}) AS g$i" else s"g$j"))
    val t =
      if (bits == 1) "CAST(0 AS BIGINT)"
      else (1 until bits).map { k =>
        s"(CASE WHEN (g${n - 1} & ${1L << k}) != 0 THEN ${(1L << k) - 1} ELSE 0 END)"
      }.reduce((a, b) => s"xor($a, $b)")
    cte(gs.map(j => s"g$j") :+ s"$t AS t")
    cte(gs.map(j => s"xor(g$j, t) AS g$j"))
    val interleave = (for { i <- 0 until n; j <- 0 until bits }
      yield s"(((g$i >> $j) & 1) << ${j * n + (n - 1 - i)})")
      .mkString("(", " | ", ")")
    (steps :+ s"hnd AS (SELECT $key, $interleave AS hd FROM $prev)")
      .mkString(",\n")
  }

  /** The n-column Morton interleave as literal DuckDB SQL over
    * `z0..z{n-1}` — the same n·bits shift/mask terms ZOrder.zValueN
    * builds as Columns (bit i of dim j → position n·i+j). */
  private def interleaveNdSql(n: Int, bits: Int): String =
    (for { i <- 0 until bits; j <- 0 until n }
      yield s"(((z$j >> $i) & 1) << ${n * i + j})")
      .mkString("(", " | ", ")")

  /** DuckDB expression for the sign-bit LSH bucket of `v DOUBLE[]` under
    * the SAME deterministic hyperplanes Similarity uses — the plane
    * values are embedded as list literals (Scala Double.toString is the
    * shortest round-trip representation, so DuckDB parses back the exact
    * same doubles and the bucket bits agree bit-for-bit). */
  private def bucketSql(planes: Int, dim: Int = 64): String =
    graft.ops.Similarity.hyperplanes(planes, dim).zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(v, ${p.mkString("[", ", ", "]")}) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** name -> (query impl, optional DuckDB oracle SQL). */
  val registry: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(

    // ---------------------------------------------------------- A1/A-agg
    "q1_agg" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") < 30)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"))),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM lineitem WHERE l_quantity < 30
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------------- P1/P2/F1/F2
    "p1_project_literals" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        col("c_name").as("full_name"),
        col("c_mktsegment").as("segment"),
        to_date(lit("15032021"), "ddMMyyyy").as("effective_from"),
        lit(java.sql.Date.valueOf("3000-01-01")).as("effective_to"),
        lit(false).as("deleted_flg"))),
      Some("""SELECT c_custkey AS id, c_name AS full_name, c_mktsegment AS segment,
             |  CAST(strptime('15032021', '%d%m%Y') AS DATE) AS effective_from,
             |  DATE '3000-01-01' AS effective_to, FALSE AS deleted_flg
             |FROM customer""".stripMargin)),

    // ------------------------------------------------- P5/P6/P9 predicates
    "p5_filter_pack" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "events")
        .filter(col("event_type").isin("click", "view", "error") &&
          col("value").isNotNull &&
          col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")) &&
          col("value").between(1, 8))
        .select("event_id", "user_id", "value")),
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type IN ('click','view','error') AND value IS NOT NULL
             |  AND ts < TIMESTAMP '2024-01-20 00:00:00' AND value BETWEEN 1 AND 8""".stripMargin)),

    // ----------------------------------------------------------- J1 star
    "j1_star_join" -> (((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      // only `nation` (25 rows, bounded by spec) carries a broadcast hint;
      // customer scales with SF, so its strategy is left to size-based
      // selection
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("l_extendedprice"))).as("revenue_c"))
    }),
      Some("""SELECT n_name, count(*) AS cnt,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderstatus = 'F' GROUP BY n_name""".stripMargin)),

    // ------------------------------------- J2/C6 cross-pair theta (rule 4)
    "j2_c6_cross_pair" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .select(col("event_id").as("trans_id"), col("ts").as("trans_date"),
          col("user_id").as("card_num"), col("event_type").as("terminal_city"),
          col("user_id").as("client_id"))
      FraudRules.crossCityRule(ev)
    }),
      Some("""SELECT DISTINCT a.event_id AS trans_id, a.user_id AS client_id
             |FROM events a JOIN events b ON a.user_id = b.user_id
             |WHERE a.event_type <> b.event_type
             |  AND abs(CAST(floor(epoch(a.ts)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)) <= 3600""".stripMargin)),

    // ------------------------------------------------- J3 interval join
    "j3_interval_join" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val r1 = ev.select(col("event_id"), col("user_id"), col("ts"))
      val r2 = ev.select(col("user_id").as("u2"), col("ts").as("ts2"))
      r1.join(r2, col("user_id") === col("u2") &&
          col("ts2").between(col("ts"), col("ts") + expr("INTERVAL 20 MINUTES")))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("cnt_20min"))
    }),
      Some("""SELECT r1.event_id AS event_id, count(*) AS cnt_20min
             |FROM events r1 JOIN events r2 ON r2.user_id = r1.user_id
             |  AND r2.ts BETWEEN r1.ts AND r1.ts + INTERVAL 20 MINUTE
             |GROUP BY r1.event_id""".stripMargin)),

    // ----------------------- J3 via the BucketRangeJoin OPTIMIZER RULE
    // The DIRECT join formulation (same code as j3_interval_join),
    // materialized with spark.graft.bucketRangeJoin=true so the
    // injected Rule[LogicalPlan] rewrites it into the time-bucketed
    // form during optimization. Same oracle as j3_interval_join: a hash
    // match proves the rewrite is semantics-free end to end. The write
    // inside the closure pins WHEN the rule is active (queries return
    // lazy frames; a conf left set would leak into other queries).
    "j3_interval_rule" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_rangejoin", dir)
      val out = scratch.resolve("out").toString
      s.conf.set(graft.plans.BucketRangeJoin.ConfKey, "true")
      try {
        val ev = t(s, dir, "events")
        val r1 = ev.select(col("event_id"), col("user_id"), col("ts"))
        val r2 = ev.select(col("user_id").as("u2"), col("ts").as("ts2"))
        val df = r1.join(r2, col("user_id") === col("u2") &&
            col("ts2").between(col("ts"), col("ts") + expr("INTERVAL 20 MINUTES")))
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("cnt_20min"))
        assert(df.queryExecution.optimizedPlan.toString.contains("_graft_ib"),
          "BucketRangeJoin rule did not fire on the J3 shape")
        df.write.mode("overwrite").parquet(out)
      } finally s.conf.set(graft.plans.BucketRangeJoin.ConfKey, "false")
      s.read.parquet(out)
    }),
      Some("""SELECT r1.event_id AS event_id, count(*) AS cnt_20min
             |FROM events r1 JOIN events r2 ON r2.user_id = r1.user_id
             |  AND r2.ts BETWEEN r1.ts AND r1.ts + INTERVAL 20 MINUTE
             |GROUP BY r1.event_id""".stripMargin)),

    // -------------------------------- J3 at scale: bucketed interval join
    // Same semantics and SAME oracle as j3_interval_join, through
    // ops.IntervalJoin (time-bucketed equi-join, 2× bounded fan-out —
    // the hot-key-safe plan for 100 TB).
    "j3_interval_bucketed" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val r1 = ev.select(col("event_id"), col("user_id"), col("ts"))
      val r2 = ev.select(col("user_id"), col("ts").as("ts2"))
      graft.ops.IntervalJoin.joinWithin(r1, r2, "user_id", "ts", "ts2", 1200L)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("cnt_20min"))
    }),
      Some("""SELECT r1.event_id AS event_id, count(*) AS cnt_20min
             |FROM events r1 JOIN events r2 ON r2.user_id = r1.user_id
             |  AND r2.ts BETWEEN r1.ts AND r1.ts + INTERVAL 20 MINUTE
             |GROUP BY r1.event_id""".stripMargin)),

    // ---------------------------------------------------- J4 left outer
    "j4_left_join" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |GROUP BY c_custkey""".stripMargin)),

    // ----------------------------------------------------- J5 anti join
    "j5_anti_join" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin)),

    // ----------------------------------------------------- J6 semi join
    "j6_semi_join" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin)),

    // --------------------------------------------------- J7 upsert join
    "j7_upsert_join" -> (((s: SparkSession, dir: String) => {
      val cust = t(s, dir, "customer")
      val dim = cust.filter(col("c_custkey") % 7 =!= 0).select(
        col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        lit(java.sql.Date.valueOf("3000-01-01")).as("effective_to"))
      val stg = cust.select(col("c_custkey").as("k"),
        when(col("c_custkey") % 10 === 0, "CHANGED")
          .otherwise(col("c_mktsegment")).as("seg"))
      stg.alias("s").join(dim.alias("d"),
          col("s.k") === col("d.k") &&
          col("d.effective_to") === lit(java.sql.Date.valueOf("3000-01-01")), "left")
        .filter(col("d.k").isNull || col("d.seg") =!= col("s.seg"))
        .select(col("s.k").as("k"), col("s.seg").as("seg"))
    }),
      Some("""WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg,
             |    DATE '3000-01-01' AS effective_to FROM customer WHERE c_custkey % 7 <> 0),
             |  stg AS (SELECT c_custkey AS k,
             |    CASE WHEN c_custkey % 10 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS seg FROM customer)
             |SELECT s.k AS k, s.seg AS seg
             |FROM stg s LEFT JOIN dim d ON s.k = d.k AND d.effective_to = DATE '3000-01-01'
             |WHERE d.k IS NULL OR d.seg <> s.seg""".stripMargin)),

    // --------------------------------------------- S1 date discovery
    // The filename-date scanner over a fixture chosen to catch the
    // reference's lexicographic-ordering bug (main.py:33, SURVEY §2.9.2):
    // DDMMYYYY strings sort 01022021 (Feb 1) BEFORE 02012021 (Jan 2)
    // lexicographically — chronological discovery must invert that, and
    // the literal oracle pins the corrected order (plus dedup across
    // files of one date and ignoring date-less names).
    "s1_date_discovery" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_s1", dir)
      Seq("transactions_15122020.txt", "transactions_01022021.txt",
        "terminals_02012021.csv", "passport_blacklist_01022021.csv",
        "readme_nodate.txt").foreach(f =>
        java.nio.file.Files.createFile(scratch.resolve(f)))
      val dates = graft.io.Sources.listUniqueDates(scratch.toString)
      import s.implicits._
      dates.zipWithIndex.map { case (d, i) =>
        (i, d, graft.io.Sources.parseDate(d))
      }.toDF("ord", "date_str", "dt")
    }),
      Some("""SELECT * FROM (VALUES
             |  (0, '15122020', DATE '2020-12-15'),
             |  (1, '02012021', DATE '2021-01-02'),
             |  (2, '01022021', DATE '2021-02-01')) t(ord, date_str, dt)""".stripMargin)),

    // ----------------------------------------- fsck integrity checker
    // (r16) A deterministic crash-residue scenario — stray unmanifested
    // ------------------------------- QUARANTINE fence (r18, VERDICT
    // r17 missing #4): an operator investigating a sick table fences
    // ALL writers — locked verbs via the one check in the lease-lock
    // machinery, plain append/overwrite explicitly — while reads keep
    // serving. The query proves the lifecycle end to end: a fenced SQL
    // INSERT refuses loudly (and leaves NO partial rows), reads and
    // fsck serve throughout, unquarantine restores, and the final
    // table state equals the oracle's relational replay of exactly the
    // writes that were allowed to land.
    "x_quarantine_fence" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_quar", dir)
      val cname = "gqf_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val base = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"))
      s.sql(s"CREATE TABLE $cname.q (okey BIGINT, price_c BIGINT, " +
        "y STRING) PARTITIONED BY (y)")
      cat.insertPartitioned("q", base.filter(col("okey") % 2 === 0))
      val fencedAt = cat.read("q").count()
      s.sql(s"CALL $cname.system.quarantine('q', 'leaf sizes under " +
        "investigation')")
      // every fenced write refuses LOUDLY, naming reason and lift
      base.filter(col("okey") % 2 === 1).createOrReplaceTempView("quar_src")
      val e = try {
        s.sql(s"INSERT INTO $cname.q SELECT * FROM quar_src")
        null: Throwable
      } catch { case ex: Throwable => ex }
      def rootMsg(ex: Throwable): String = {
        var c = ex; val sb = new StringBuilder
        while (c != null) { sb.append(c.getMessage).append(' '); c = c.getCause }
        sb.toString
      }
      require(e != null && rootMsg(e).contains("QUARANTINED") &&
        rootMsg(e).contains("leaf sizes under investigation"),
        s"a fenced INSERT must refuse naming the reason, got: $e")
      // the refusal was ATOMIC: no partial rows landed
      require(cat.read("q").count() == fencedAt,
        "a fenced INSERT must leave NO partial rows")
      // reads and fsck serve while fenced
      require(s.sql(s"SELECT count(*) FROM $cname.q").head().getLong(0)
        == fencedAt, "reads must serve while fenced")
      require(s.sql(s"CALL $cname.system.fsck('q')").collect()
        .exists(r => r.getAs[String]("check") == "quarantined"),
        "fsck must report the fence")
      // lift; the same write now lands exactly once
      require(s.sql(s"CALL $cname.system.unquarantine('q')")
        .head().getAs[Boolean]("was_quarantined"),
        "unquarantine must report the lifted fence")
      s.sql(s"INSERT INTO $cname.q SELECT * FROM quar_src")
      require(s.sql(s"CALL $cname.system.fsck('q')").collect()
        .forall(r => r.getAs[String]("check") != "quarantined"),
        "a lifted fence must leave no finding")
      s.sql(s"SELECT y, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.q GROUP BY y")
    }),
      Some("""SELECT CAST(year(o_orderdate) AS VARCHAR) AS y,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
             |    AS BIGINT) AS sum_c
             |FROM orders GROUP BY 1""".stripMargin)),

    // parquet, orphan publish intent, orphan branch dir, scratch
    // entries, a stale collapse intent — must surface as EXACTLY these
    // (severity, check) rows, clean before injection and after vacuum-
    // style cleanup. The literal oracle pins the triage taxonomy.
    "x_fsck" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_fsck", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val pre = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"))
      cat.createPartitionedVersioned("pv", pre.schema, Seq("y"))
      val v = cat.appendPartitionedVersioned("pv", pre)
      require(cat.fsck("pv").isEmpty, "a healthy table must be clean")
      // inject one residue per class, deterministically
      val snap = java.nio.file.Paths.get(cat.path("pv"), s"_v$v")
      val leaf = {
        val st = java.nio.file.Files.list(snap)
        try st.iterator().asScala.filter(p =>
          java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("y=")).toSeq
          .minBy(_.getFileName.toString)
        finally st.close()
      }
      java.nio.file.Files.write(leaf.resolve("stray-crash.parquet"),
        Array[Byte](80, 65, 82, 49))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(cat.path("pv"), "_brpend_ghost"),
        "{}".getBytes("UTF-8"))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(cat.path("pv"), "_branchdata_ghost-e1"))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(cat.path("pv"), "_tmp_ins-crashed"))
      import s.implicits._
      def tally(phase: String, rows: Seq[(String, String, String)]) =
        rows.map { case (sev, check, _) => (sev, check) }
          .groupBy(identity).map { case ((sev, c), xs) =>
            (phase, sev, c, xs.size.toLong) }.toSeq
      val found = tally("found", cat.fsck("pv"))
      // repair-then-reverify (r17): the safe subset folds the intent,
      // sweeps the orphan dir and the scratch; the DATA finding (the
      // stray unmanifested parquet — a human decision about bytes)
      // must survive both the repair and the re-check
      cat.fsck("pv", repair = true, graceMs = 0L)
      val after = tally("after_repair", cat.fsck("pv"))
      // (the stray fake-parquet makes the table unreadable until the
      // operator decides about it — which is the point; FsckSpec pins
      // that repair never touches data files)
      // the fleet sweep agrees with the per-table verdict (r17)
      require(cat.fsckAll().map { case (t2, s2, c2, _) => (t2, s2, c2) }
        .toSet == after.map(x => ("pv", x._2, x._3)).toSet,
        "fsckAll must report exactly the per-table findings")
      (found ++ after).sortBy(x => (x._1, x._2, x._3))
        .toDF("phase", "severity", "check", "n")
    }),
      Some("""SELECT * FROM (VALUES
             |  ('found', 'info', 'scratch', CAST(1 AS BIGINT)),
             |  ('found', 'warn', 'orphan_branch_dir', CAST(1 AS BIGINT)),
             |  ('found', 'warn', 'publish_intent', CAST(1 AS BIGINT)),
             |  ('found', 'warn', 'unmanifested_file', CAST(1 AS BIGINT)),
             |  ('after_repair', 'warn', 'unmanifested_file', CAST(1 AS BIGINT)))
             |  t(phase, severity, "check", n)""".stripMargin)),

    // ------------------------------------------------- S9 file archiver
    // Post-load archival (reference main.py:20-30, 117): only the
    // requested date's files move to archive/ with the .backup suffix,
    // other dates and date-less files stay. The literal oracle pins the
    // resulting directory state.
    "s9_archiver" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_s9", dir)
      Seq("transactions_01012021.txt", "terminals_01012021.csv",
        "transactions_02012021.txt", "readme.txt").foreach(f =>
        java.nio.file.Files.createFile(scratch.resolve(f)))
      graft.io.Archiver.filesToArchive(scratch.toString, "01012021")
      def ls(p: java.nio.file.Path): Seq[String] = {
        val st = java.nio.file.Files.list(p)
        try st.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(_.getFileName.toString).toSeq.sorted
        finally st.close()
      }
      import s.implicits._
      (ls(scratch).map(("in", _)) ++ ls(scratch.resolve("archive")).map(("archive", _)))
        .toDF("where", "name")
    }),
      Some("""SELECT * FROM (VALUES
             |  ('in', 'readme.txt'),
             |  ('in', 'transactions_02012021.txt'),
             |  ('archive', 'terminals_01012021.csv.backup'),
             |  ('archive', 'transactions_01012021.txt.backup')) t("where", name)""".stripMargin)),

    // --------------------------------------------- S8 truncate-reload
    // Staging overwrite semantics (TRUNCATE + INSERT, main.py:53-55):
    // after two loads the table holds exactly the SECOND snapshot — no
    // residue from the first. The oracle derives the second snapshot
    // directly from the source table.
    "s8_truncate_reload" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val cat = new TableCatalog(s, scratchDir("graft_s8", dir).toString)
      val c = t(s, dir, "customer")
      cat.overwrite("stg", c.select(col("c_custkey"), col("c_name")))
      cat.overwrite("stg", c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_name")))
      cat.read("stg")
    }),
      Some("""SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0""")),

    // --------------------------------------------- S2 decimal-comma CSV
    // ---------------- S10: closed-history compaction under the gate
    // TableCatalog.compactClosed on a ~90-date closed history derived
    // from orders: dates before the cutoff migrate into month-compacted
    // archive storage. The output is the FULL post-compaction history
    // (content preservation is value-level checked) plus per-row archive
    // membership and the archived-partition count — both of which DuckDB
    // recomputes as pure date expressions over the same source, so a
    // compaction that lost, duplicated, or mis-placed any row fails the
    // hash. File-count and atomic-swap behavior: TableCatalogSpec.
    "s10_compact" -> (((s: SparkSession, dir: String) => {
      val cat = new graft.catalog.TableCatalog(s,
        scratchDir("graft_s10", dir).toString)
      val closed = t(s, dir, "orders")
        .filter(col("o_orderdate") <
          lit(java.sql.Timestamp.valueOf("1995-04-01 00:00:00")))
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("seg"),
          lit(java.sql.Date.valueOf("1994-01-01")).as("effective_from"),
          col("o_orderdate").cast("date").as("effective_to"),
          lit(true).as("deleted_flg"))
        // one file per date — the layout Runner's per-date batches
        // actually produce (without this, every write task emits a
        // sliver into every one of the 151 partitions)
        .repartition(col("effective_to"))
      cat.appendPartitioned("dim_s10_closed", closed, "effective_to")
      val n = cat.compactClosed("dim_s10", java.sql.Date.valueOf("1995-03-01"))
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("seg", StringType),
        StructField("effective_from", DateType),
        StructField("effective_to", DateType),
        StructField("deleted_flg", BooleanType)))
      val arch = cat.readOrEmpty("dim_s10_closed_archive", schema)
        .select(col("k").as("ak")).distinct()
      cat.readScd2("dim_s10", schema)
        .join(arch, col("k") === col("ak"), "left")
        .select(col("k"), col("seg"), col("effective_to"),
          col("ak").isNotNull.as("in_archive"),
          lit(n.toLong).as("n_archived"))
    }),
      Some("""WITH src AS (SELECT o_orderkey AS k, o_orderstatus AS seg,
             |    CAST(o_orderdate AS DATE) AS effective_to
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01 00:00:00')
             |SELECT k, seg, effective_to,
             |  effective_to < DATE '1995-03-01' AS in_archive,
             |  (SELECT CAST(count(DISTINCT effective_to) AS BIGINT) FROM src
             |    WHERE effective_to < DATE '1995-03-01') AS n_archived
             |FROM src""".stripMargin)),

    // The production transactions parser (`;`-separated, decimal COMMA,
    // header — reference main.py:103) under the value-level gate: a
    // deterministic fixture derived from `events` is written once to a
    // per-SF scratch file, read back through Sources.readTransactionsCsv,
    // and DuckDB reads the SAME file with its own CSV reader — both the
    // locale normalization (`12,34` → 12.34 DECIMAL) and the timestamp
    // parse are cross-checked byte-for-byte.
    "s2_csv_source" -> (((s: SparkSession, dir: String) => {
      val file = scratchDir("graft_s2", dir).resolve("transactions_01012024.txt")
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      val lines = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("event_id")).limit(2000).collect().map { r =>
          // Locale.ROOT: the default locale may use other digit glyphs
          // or separators, silently corrupting the fixture
          val amt = String.format(java.util.Locale.ROOT, "%.2f",
            Double.box(r.getDouble(4))).replace('.', ',')
          val ts = fmt.format(r.getTimestamp(1).toInstant)
          s"TX${r.getLong(0)};$ts;C${r.getLong(2)};${r.getString(3)};$amt;OK;T${r.getLong(2) % 20}"
        }
      java.nio.file.Files.write(file, java.util.Arrays.asList(
        ("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal"
          +: lines.toSeq): _*))
      // amt re-emitted as exact int64 cents: a DECIMAL output column
      // stringifies differently across engine bridges ("0.20" vs "0.2")
      // even when numerically identical — same hash-stability rule as
      // `cents` everywhere else; the locale-comma parse is still what's
      // under test (the cast happens AFTER readTransactionsCsv's
      // normalization to DECIMAL(18,2))
      graft.io.Sources.readTransactionsCsv(s, file.toString)
        .withColumn("amt_c", (col("amt") * 100).cast("long")).drop("amt")
    }),
      // the oracle path carries the per-SF scratch token as a placeholder
      // that oracleSqlFor binds to the VERIFY-TIME SF dir (through the
      // same sfToken sanitizer the query uses), so the gate can run at
      // any SF and DuckDB reads that run's own fixture; the scratch file
      // is per-SF precisely so a later bench run at another SF cannot
      // overwrite it before the DuckDB compare reads it
      Some(s"""SELECT transaction_id AS trans_id, transaction_date AS trans_date,
             |  card_num, oper_type,
             |  CAST(CAST(replace(amount, ',', '.') AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt_c,
             |  oper_result, terminal
             |FROM read_csv('${sys.props("java.io.tmpdir")}/graft_s2_${SfTokenPlaceholder}/transactions_01012024.txt',
             |  delim = ';', header = true,
             |  columns = {'transaction_id': 'VARCHAR', 'transaction_date': 'TIMESTAMP',
             |    'card_num': 'VARCHAR', 'oper_type': 'VARCHAR', 'amount': 'VARCHAR',
             |    'oper_result': 'VARCHAR', 'terminal': 'VARCHAR'})""".stripMargin)),

    // ------------------------------------------------ S3/S4 xlsx source
    // The native StAX OOXML reader under the value-level gate (ref:
    // main.py:98, 111 read the daily drops via pandas.read_excel). The
    // fixture is written BOTH as real xlsx (shared strings + raw
    // numeric cells, graft.io.Xlsx.writeSheet) and as an identical-
    // content CSV; Spark parses the XLSX through XlsxAdapter, DuckDB
    // parses the CSV — a hash match proves zip/XML cell decoding,
    // header-name mapping and type conversion end to end.
    "x_xlsx_source" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_xlsx", dir)
      val rows = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("nation"),
          cents(col("s_acctbal")).as("bal_c"))
        .orderBy(col("s_suppkey")).limit(500).collect().map { r =>
          Seq("T" + r.getLong(0), r.getString(1),
            "#" + r.getLong(2), "#" + r.getLong(3))
        }.toSeq
      val header = Seq("terminal", "name", "nation", "bal_c")
      graft.io.Xlsx.writeSheet(
        scratch.resolve("terminals_01012024.xlsx").toString, "terminals",
        header +: rows)
      java.nio.file.Files.write(scratch.resolve("terminals_01012024.csv"),
        (header.mkString(",") +: rows.map(_.map(_.stripPrefix("#"))
          .mkString(","))).asJava)
      new graft.io.XlsxAdapter("terminals").read(s,
        scratch.resolve("terminals_01012024.xlsx").toString,
        StructType(Seq(
          StructField("terminal", StringType),
          StructField("name", StringType),
          StructField("nation", LongType),
          StructField("bal_c", LongType))))
    }),
      Some(s"""SELECT terminal, name, nation, bal_c
             |FROM read_csv('${sys.props("java.io.tmpdir")}/graft_xlsx_${SfTokenPlaceholder}/terminals_01012024.csv',
             |  header = true,
             |  columns = {'terminal': 'VARCHAR', 'name': 'VARCHAR',
             |    'nation': 'BIGINT', 'bal_c': 'BIGINT'})""".stripMargin)),

    // ------------------------------------------------ S5 JDBC source
    // The live-database ingest path (ref main.py:65-94) under the
    // value-level gate at last (VERDICT r5 missing #4's sibling —
    // previously spec-only): deterministic supplier-derived rows are
    // INSERTed into an embedded in-memory Derby over JDBC, read back
    // through spark.read.jdbc, and the DuckDB oracle recomputes the
    // same rows from the supplier table — so type mapping (BIGINT /
    // VARCHAR round-trips), row completeness, and the projection all
    // hash-check. Derby ships in Spark's jar directory; the per-SF db
    // name keeps gate runs at different SFs independent. Production
    // partitioned JDBC reads stay behind Sources.JdbcSourceDb.
    "x_jdbc_source" -> (((s: SparkSession, dir: String) => {
      val url = s"jdbc:derby:memory:graftv_${sfToken(dir)};create=true"
      val rows = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("nation"),
          cents(col("s_acctbal")).as("bal_c"))
        .orderBy(col("s_suppkey")).collect()
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.execute("DROP TABLE suppliers")
        catch { case _: java.sql.SQLException => () } // first run: no table
        st.execute("CREATE TABLE suppliers (k BIGINT, name VARCHAR(64), " +
          "nation BIGINT, bal_c BIGINT)")
        st.close()
        val ps = conn.prepareStatement("INSERT INTO suppliers VALUES (?, ?, ?, ?)")
        rows.foreach { r =>
          ps.setLong(1, r.getLong(0)); ps.setString(2, r.getString(1))
          ps.setLong(3, r.getLong(2)); ps.setLong(4, r.getLong(3))
          ps.addBatch()
        }
        ps.executeBatch(); ps.close()
      } finally conn.close()
      s.read.jdbc(url, "suppliers", new java.util.Properties())
        .select(col("K").as("k"), col("NAME").as("name"),
          col("NATION").as("nation"), col("BAL_C").as("bal_c"))
    }),
      Some("""SELECT s_suppkey AS k, s_name AS name,
             |  CAST(s_nationkey AS BIGINT) AS nation,
             |  CAST(floor(s_acctbal * 100) AS BIGINT) AS bal_c
             |FROM supplier""".stripMargin)),

    // ------------------------------------------- approx distinct (HLL)
    // The at-scale replacement for exact countDistinct: Spark's
    // HyperLogLog++ sketch merges map-side (no shuffle of raw values).
    // The sketch estimate is engine-specific, so the oracle pins the
    // EXACT count (DuckDB-computable) plus the bounded-error property:
    // rsd = 0.05 ⇒ the estimate sits within ±5·rsd of exact with
    // overwhelming margin on these cardinalities.
    "x_approx_distinct" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("cohort"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.05).as("approx"))
        .select(col("cohort"), col("exact_users"),
          (abs(col("approx") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.25).as("approx_ok"))),
      Some("""SELECT user_id % 10 AS cohort,
             |  count(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
             |FROM events GROUP BY 1""".stripMargin)),

    // ------------------------------------------------ J9 bloom-pruned join
    // Explicit runtime-filter pattern through ops.BloomJoin: a bloom
    // sketch of the (selective) build side's keys prunes the probe side
    // BEFORE its exchange, and the exact join then removes the sketch's
    // false positives — so the oracle is the PLAIN join, proving the
    // bloom pass is semantics-free (same trick as j8's salting oracle).
    "j9_bloom_join" -> (((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.ops.BloomJoin.inner(li, urgent, "l_orderkey", "o_orderkey",
          expectedItems = 200000L)
        .groupBy(col("o_orderstatus"), col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"))
    }),
      Some("""SELECT o_orderstatus, l_returnflag, count(*) AS cnt,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_orderpriority = '1-URGENT'
             |GROUP BY o_orderstatus, l_returnflag""".stripMargin)),

    // ----------------------------------------------------- J8 salted join
    // Skew-resilient equi-join through ops.SkewJoin: probe rows salt
    // deterministically, the dim replicates ×salts — and the oracle is
    // simply the PLAIN join, proving the salting is semantics-free.
    "j8_salted_join" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val users = ev.select(col("user_id")).distinct()
        .withColumn("segment", pmod(col("user_id"), lit(5)))
      graft.ops.SkewJoin.saltedEquiJoin(ev, users, Seq("user_id"),
          salts = 8, discriminator = col("event_id"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("sum_value_c"))
    }),
      Some("""WITH users AS (SELECT DISTINCT user_id, user_id % 5 AS segment FROM events)
             |SELECT segment, count(*) AS cnt,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
             |FROM events e JOIN users u ON e.user_id = u.user_id
             |GROUP BY segment""".stripMargin)),

    // ------------------------------------------------- C1 SCD2 merge (!)
    // Exercises the REAL Scd2.merge operator against an independent SQL
    // formulation of the same semantics.
    "c1_scd2_merge" -> (((s: SparkSession, dir: String) =>
      scd2MergedDim(s, dir)),
      Some(scd2MergeOracleSql)),

    // ------------------------------------------- C1b SCD2 as-of read
    // Point-in-time read over the merged history: at 2020-06-15 every
    // key's ORIGINAL version applies (the merge closed changed rows at
    // 2021-01-01, exclusive upper bound), including rows now flagged
    // closed — as-of ignores deleted_flg and selects by interval.
    "c1b_scd2_asof" -> (((s: SparkSession, dir: String) =>
      Scd2.asOf(scd2MergedDim(s, dir), java.sql.Date.valueOf("2020-06-15"))),
      Some(s"""SELECT * FROM ($scd2MergeOracleSql) t
             |WHERE effective_from <= DATE '2020-06-15'
             |  AND DATE '2020-06-15' < effective_to""".stripMargin)),

    // ----------------------------------------------- time travel read
    // The payoff of the snapshot-versioned commit layout: two
    // replaceAtomic commits of a dimension, then snapshot 1 read back
    // AFTER snapshot 2 committed — copy-on-write makes the old version
    // an ordinary immutable parquet scan (readVersion), and the current
    // read resolves 2. The output joins both versions per key (v2 NULL
    // where version 2 dropped the row), so the oracle re-derives both
    // states from the source table and any pointer/retention bug — a
    // stale read, a pruned previous snapshot — breaks the hash.
    "x_time_travel" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_tt", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), cents(col("c_acctbal")).as("bal_c"))
      cat.replaceAtomic("dim_tt", base)
      cat.replaceAtomic("dim_tt",
        base.filter(col("k") % 10 =!= 0)
          .withColumn("bal_c", col("bal_c") + lit(100L)))
      cat.readVersion("dim_tt", 1L)
        .select(col("k"), col("bal_c").as("bal_v1"))
        .join(cat.read("dim_tt").select(col("k"), col("bal_c").as("bal_v2")),
          Seq("k"), "left")
    }),
      Some("""WITH v1 AS (SELECT c_custkey AS k,
             |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_v1 FROM customer),
             |v2 AS (SELECT c_custkey AS k,
             |    CAST(floor(c_acctbal * 100) AS BIGINT) + 100 AS bal_v2
             |  FROM customer WHERE c_custkey % 10 <> 0)
             |SELECT v1.k, v1.bal_v1, v2.bal_v2
             |FROM v1 LEFT JOIN v2 ON v1.k = v2.k""".stripMargin)),

    // ------------------------------------- named snapshot tags (r8)
    // Time travel PAST the retention window: v1 is tagged, three more
    // swaps land under zero retention (so every untagged superseded
    // snapshot except the immediately-previous one is pruned), and the
    // tag still resolves v1 exactly — the pin is the only reason the
    // bytes survive. Content identical to the x_time_travel derivation
    // so the oracle replays both sides from the source table.
    "x_snapshot_tag" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_tag", dir)
      val cat = new TableCatalog(s, scratch.toString,
        snapshotRetentionMs = 0L)
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), cents(col("c_acctbal")).as("bal_c"))
      cat.replaceAtomic("dim_tg", base)
      cat.tag("dim_tg", "baseline")
      (1 to 3).foreach { i =>
        cat.replaceAtomic("dim_tg",
          base.filter(col("k") % 10 =!= 0)
            .withColumn("bal_c", col("bal_c") + lit(100L * i)))
      }
      // v2 and v3 are swept (untagged, aged out at retention 0); the
      // tagged v1 must still be on disk
      require(!cat.versions("dim_tg").contains(2L) &&
        cat.versions("dim_tg").contains(1L),
        s"retention should keep only tagged/recent: ${cat.versions("dim_tg")}")
      cat.readTag("dim_tg", "baseline")
        .select(col("k"), col("bal_c").as("bal_tagged"))
        .join(cat.read("dim_tg").select(col("k"), col("bal_c").as("bal_now")),
          Seq("k"), "left")
    }),
      Some("""WITH v1 AS (SELECT c_custkey AS k,
             |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_tagged
             |  FROM customer),
             |vn AS (SELECT c_custkey AS k,
             |    CAST(floor(c_acctbal * 100) AS BIGINT) + 300 AS bal_now
             |  FROM customer WHERE c_custkey % 10 <> 0)
             |SELECT v1.k, v1.bal_tagged, vn.bal_now
             |FROM v1 LEFT JOIN vn ON v1.k = vn.k""".stripMargin)),

    // --------------------------- write-audit-publish branches (r11)
    // The WAP loop end-to-end: a load stages onto a branch (invisible
    // to main readers), the would-be state is audited under the
    // table's CHECK constraints (a violating stage refuses), main
    // moves on independently, and publish lands the branch as one
    // versioned APPEND rebased onto the moved head. The oracle is the
    // pure relational content — three UNION ALL slices — so the hash
    // proves isolation, audit, and rebase all preserved the data.
    "x_wap_branch" -> (((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_wap", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        col("n_regionkey").cast("long").as("rk"))
      cat.replaceAtomic("dim_wap", base)
      cat.addConstraint("dim_wap", "k_nonneg", "k >= 0")
      val nBase = base.count()
      val nBranch = base.filter(col("rk") === 1L).count()
      // stage: a derived slice onto the branch — main must not see it
      cat.appendToBranch("dim_wap", "load", base.filter(col("rk") === 1L)
        .select((col("k") + lit(100L)).as("k"), col("name"), col("rk")))
      require(cat.read("dim_wap").count() == nBase,
        "branch rows leaked into the main read")
      // audit: constraints + expected count over the would-be state
      require(cat.auditBranch("dim_wap", "load") == nBase + nBranch,
        "audit saw the wrong would-be state")
      // a violating stage refuses at the write — the gate is real
      val refused =
        try { cat.appendToBranch("dim_wap", "load",
          Seq((-1L, "BAD", 0L)).toDF("k", "name", "rk")); false }
        catch { case e: Exception
          if String.valueOf(e.getMessage).contains("k_nonneg") => true }
      require(refused, "a constraint-violating branch write must refuse")
      // main moves mid-branch; publish rebases onto the new head
      cat.appendAtomic("dim_wap", base.filter(col("rk") === 3L)
        .select((col("k") + lit(200L)).as("k"), col("name"), col("rk")))
      cat.publishBranch("dim_wap", "load")
      require(cat.branches("dim_wap").isEmpty, "publish must consume the branch")
      cat.read("dim_wap").select(col("k"), col("name"), col("rk"))
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             |  CAST(n_regionkey AS BIGINT) AS rk FROM nation
             |UNION ALL
             |SELECT CAST(n_nationkey AS BIGINT) + 100, n_name,
             |  CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 1
             |UNION ALL
             |SELECT CAST(n_nationkey AS BIGINT) + 200, n_name,
             |  CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 3""".stripMargin)),

    // ------------------------------ WAP repair: audit → fix → publish
    // (r12, verdict #2) The loop the append-only branch dead-ended on:
    // the audit FINDS bad rows, mergeBranchInto REPAIRS them on the
    // branch (main untouched — the in-query require pins isolation),
    // the re-audit passes, and publish lands the fixed state as ONE
    // versioned REPLACE. The oracle replays the repaired final state
    // relationally; an un-merged fix, a leaked pre-fix publish, or a
    // rebase that shouldn't have happened all break the hash.
    "x_wap_fix" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_wapfix", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        col("n_regionkey").cast("long").as("rk"))
      cat.replaceAtomic("dim_fix", base)
      val nBase = base.count()
      // stage: region-1 rows arrive with a CORRUPT region key (+1000)
      cat.appendToBranch("dim_fix", "load", base.filter(col("rk") === 1L)
        .select((col("k") + lit(100L)).as("k"), col("name"),
          (col("rk") + lit(1000L)).as("rk")))
      // audit: the quality gate catches the corruption on the branch
      val badRows = cat.readBranch("dim_fix", "load")
        .filter(col("rk") > 100L)
      require(badRows.count() > 0, "the audit must see the staged corruption")
      require(cat.read("dim_fix").filter(col("rk") > 100L).count() == 0,
        "corruption leaked into the main read")
      // fix ON THE BRANCH: merge corrected rows over the bad keys
      val fixes = badRows.select(col("k"), col("name"),
        (col("rk") - lit(1000L)).as("rk"))
      val (upd, del, ins, _) = cat.mergeBranchInto("dim_fix", "load",
        fixes, Seq("k"))
      require(upd > 0 && del == 0 && ins == 0,
        s"the fix must UPDATE the bad rows in place (upd=$upd)")
      require(cat.readBranch("dim_fix", "load")
        .filter(col("rk") > 100L).count() == 0, "re-audit must pass")
      require(cat.read("dim_fix").count() == nBase,
        "main must stay unaware until publish")
      cat.publishBranch("dim_fix", "load")
      require(cat.branches("dim_fix").isEmpty, "publish must consume the branch")
      cat.read("dim_fix").select(col("k"), col("name"), col("rk"))
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             |  CAST(n_regionkey AS BIGINT) AS rk FROM nation
             |UNION ALL
             |SELECT CAST(n_nationkey AS BIGINT) + 100, n_name,
             |  CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 1""".stripMargin)),

    // ------------------------------ the WAP loop, SQL-complete (r12 #3)
    // Every verb of write-audit-publish from PLAIN SQL: INSERT INTO
    // g.`t@branch` stages (the branch is born on the first INSERT),
    // SELECT FROM t@branch audits, INSERT OVERWRITE t@branch repairs
    // (REPLACE-mode staging), CALL publish_branch lands it, CALL
    // expire_branches stops the leak of a forgotten branch — no Scala
    // anywhere. The oracle replays the repaired publish plus main's
    // isolation from the expired branch.
    "x_sql_wap" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlwap", dir)
      val cname = "gwap_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      cat.replaceAtomic("wt", t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        col("n_regionkey").cast("long").as("rk")))
      // stage from SQL: region-2 clones with a corrupt rk (+1000)
      s.sql(s"""INSERT INTO $cname.`wt@load`
               |SELECT k + 100 AS k, name, rk + 1000 AS rk
               |FROM $cname.wt WHERE rk = 2""".stripMargin)
      // audit from SQL
      val bad = s.sql(
        s"SELECT count(*) FROM $cname.`wt@load` WHERE rk > 100").head().getLong(0)
      require(bad > 0, "the SQL audit must see the staged corruption")
      require(s.sql(s"SELECT count(*) FROM $cname.wt WHERE rk > 100")
        .head().getLong(0) == 0, "corruption leaked into main")
      // repair from SQL: OVERWRITE the branch with the corrected state
      s.sql(s"""INSERT OVERWRITE $cname.`wt@load`
               |SELECT k, name, CASE WHEN rk > 100 THEN rk - 1000 ELSE rk END AS rk
               |FROM $cname.`wt@load`""".stripMargin)
      require(s.sql(s"SELECT count(*) FROM $cname.`wt@load` WHERE rk > 100")
        .head().getLong(0) == 0, "the SQL re-audit must pass")
      s.sql(s"CALL $cname.system.publish_branch('wt', 'load')").collect()
      // a second branch is forgotten; the SQL leak-stopper expires it
      s.sql(s"INSERT INTO $cname.`wt@stale` VALUES (9999, 'GHOST', 0)")
      Thread.sleep(5)
      val dropped = s.sql(s"CALL $cname.system.expire_branches('wt', 1)")
        .collect().map(_.getString(0)).toSeq
      require(dropped == Seq("stale"), s"expire_branches dropped $dropped")
      s.sql(s"SELECT k, name, rk FROM $cname.wt")
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             |  CAST(n_regionkey AS BIGINT) AS rk FROM nation
             |UNION ALL
             |SELECT CAST(n_nationkey AS BIGINT) + 100, n_name,
             |  CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 2""".stripMargin)),

    // --------------------- SQL row-level branch repair (r12 verdict #2)
    // The last Scala-only step of the WAP loop falls: the natural fix
    // verbs — UPDATE / DELETE on g.`t@branch` — now run as row-level
    // SQL against the branch's WOULD-BE state and flip it to a
    // REPLACE-mode life (the mergeBranchInto commit shape), so
    // stage → audit fails → UPDATE the branch → audit passes → publish
    // is SQL end to end. Scale posture: the statement's scan is the
    // branch audit surface (base ∪ staged), its write is one
    // distributed rewrite staged by Spark's own parquet committer and
    // committed by a locked pointer flip refusing a branch that
    // changed lives mid-statement — same optimistic-concurrency
    // posture as the main-table RLO. The oracle replays the repaired
    // publish relationally.
    "x_sql_wap_fix" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlwapfix", dir)
      val cname = "gwfx_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      cat.replaceAtomic("wt", t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        col("n_regionkey").cast("long").as("rk")))
      // stage from SQL: region-3 clones with a corrupt rk (+1000),
      // plus one junk row that should not publish at all
      s.sql(s"""INSERT INTO $cname.`wt@fix`
               |SELECT k + 100 AS k, name, rk + 1000 AS rk
               |FROM $cname.wt WHERE rk = 3""".stripMargin)
      s.sql(s"INSERT INTO $cname.`wt@fix` VALUES (9999, 'JUNK', 0)")
      require(s.sql(s"SELECT count(*) FROM $cname.`wt@fix` WHERE rk > 100")
        .head().getLong(0) > 0, "the SQL audit must see the corruption")
      // the fix verbs are plain row-level SQL ON THE BRANCH
      s.sql(s"UPDATE $cname.`wt@fix` SET rk = rk - 1000 WHERE rk > 100")
      s.sql(s"DELETE FROM $cname.`wt@fix` WHERE k = 9999")
      require(s.sql(s"SELECT count(*) FROM $cname.`wt@fix` " +
        "WHERE rk > 100 OR k = 9999").head().getLong(0) == 0,
        "the SQL re-audit must pass")
      require(s.sql(s"SELECT count(*) FROM $cname.wt WHERE rk > 100")
        .head().getLong(0) == 0, "the fix leaked into main before publish")
      s.sql(s"CALL $cname.system.publish_branch('wt', 'fix')").collect()
      require(cat.branches("wt").isEmpty, "publish must consume the branch")
      s.sql(s"SELECT k, name, rk FROM $cname.wt")
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             |  CAST(n_regionkey AS BIGINT) AS rk FROM nation
             |UNION ALL
             |SELECT CAST(n_nationkey AS BIGINT) + 100, n_name,
             |  CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 3""".stripMargin)),

    // ------------------------------ branch diff: the audit's answer
    // (r12) "What would this publish change?" — diffBranch tags the
    // would-be state's additions and removals vs the branch's base.
    // Append mode short-circuits to the staged files (base never
    // scanned); a merge-fix flips to replace mode where the diff is
    // the multiset-exact exceptAll both ways — the updated row shows
    // as remove(old)+add(new). The oracle states the final diff
    // relationally.
    "x_branch_diff" -> (((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_brdiff", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        col("n_regionkey").cast("long").as("rk"))
      cat.replaceAtomic("dim_bd", base)
      cat.appendToBranch("dim_bd", "load", base.filter(col("rk") === 1L)
        .select((col("k") + lit(100L)).as("k"), col("name"), col("rk")))
      // append mode: additions only — the staged slice verbatim
      val d1 = cat.diffBranch("dim_bd", "load")
      require(d1.filter(col("change_type") === "remove").count() == 0,
        "an append-mode branch removes nothing")
      // the fix flips to replace mode: nation 0 gets rk rewritten to 99
      cat.mergeBranchInto("dim_bd", "load",
        base.filter(col("k") === 0L).select(col("k"), col("name"),
          lit(99L).as("rk")), Seq("k"))
      cat.diffBranch("dim_bd", "load")
        .select(col("change_type"), col("k"), col("name"), col("rk"))
    }),
      Some("""SELECT 'add' AS change_type, CAST(n_nationkey AS BIGINT) + 100 AS k,
             |  n_name AS name, CAST(n_regionkey AS BIGINT) AS rk
             |FROM nation WHERE n_regionkey = 1
             |UNION ALL
             |SELECT 'add', CAST(n_nationkey AS BIGINT), n_name, 99
             |FROM nation WHERE n_nationkey = 0
             |UNION ALL
             |SELECT 'remove', CAST(n_nationkey AS BIGINT), n_name,
             |  CAST(n_regionkey AS BIGINT)
             |FROM nation WHERE n_nationkey = 0""".stripMargin)),

    // ------------------------ merge-on-read DELETE from SQL (r12)
    // The O(matches) delete was Scala-only ("the O(delta) forms remain
    // the Scala mergeInto / deleteVectorize" — VersionedTable doc); now
    // `CALL g.system.delete_vectorize(t, predicate)` vectorizes from
    // SQL (predicate through Spark's own parser — the WHERE dialect),
    // the live-vector read guard still refuses bare SQL scans, and
    // `apply_delete_vectors` folds + unblocks. Oracle replays the
    // surviving rows relationally.
    "x_sql_mor_delete" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_sqlmor", dir)
      val cname = "gmor_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new TableCatalog(s, scratch.toString)
      cat.append("cust_mor", t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey"),
        cents(col("c_acctbal")).as("bal_c"),
        col("c_mktsegment").as("seg")))
      // 1-in-31 keys ≈ 3% — safely under the auto-fold threshold, so
      // the vectors stay LIVE and the verb stays O(matches)
      val n = s.sql(s"CALL $cname.system.delete_vectorize('cust_mor', " +
        "'ckey % 31 = 0')").head().getLong(0)
      require(n > 0, "the 1-in-31 condition matched nothing")
      val refused =
        try { s.sql(s"SELECT count(*) FROM $cname.cust_mor").collect(); false }
        catch { case e: Exception
          if String.valueOf(e.getMessage).contains("deletion vectors") => true }
      require(refused, "a bare SQL read must refuse while vectors live")
      val folded = s.sql(
        s"CALL $cname.system.apply_delete_vectors('cust_mor')")
        .head().getLong(0)
      require(folded == n, s"folded $folded != vectored $n")
      s.sql(s"SELECT seg, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"sum(bal_c) AS sum_bal_c FROM $cname.cust_mor GROUP BY seg")
    }),
      Some("""SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_bal_c
             |FROM customer WHERE c_custkey % 31 <> 0
             |GROUP BY 1""".stripMargin)),

    // --------------------------- branch schema evolution (r12 #6)
    // A long-lived branch survives an additive upstream column: the
    // widened write evolves the branch declaration (mergeSchema), the
    // audit surface null-fills base and pre-evolution staged files, and
    // publish lands the union shape on main as a schema-evolving
    // append. The oracle states the union relationally (NULL-filled
    // sides included) — a dropped column, a lost pre-evolution row, or
    // null-filling gone wrong all break the hash.
    "x_wap_evolve" -> (((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_wapevo", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val base = t(s, dir, "region").select(
        col("r_regionkey").cast("long").as("k"), col("r_name").as("name"))
      cat.replaceAtomic("evo", base)
      cat.appendToBranch("evo", "feed", Seq((100L, "EARLY")).toDF("k", "name"))
      // the upstream feed gains a column mid-branch
      cat.appendToBranch("evo", "feed",
        Seq((101L, "LATE", "fresh")).toDF("k", "name", "src"),
        mergeSchema = true)
      val audit = cat.readBranch("evo", "feed")
      require(audit.columns.toSeq == Seq("k", "name", "src"),
        s"the audit surface must show the union shape: ${audit.columns.toSeq}")
      require(audit.filter(col("src").isNull).count() == base.count() + 1,
        "base and pre-evolution staged rows must null-fill the new column")
      cat.publishBranch("evo", "feed")
      cat.read("evo").select(col("k"), col("name"), col("src"))
    }),
      Some("""SELECT CAST(r_regionkey AS BIGINT) AS k, r_name AS name,
             |  CAST(NULL AS VARCHAR) AS src FROM region
             |UNION ALL SELECT 100, 'EARLY', NULL
             |UNION ALL SELECT 101, 'LATE', 'fresh'""".stripMargin)),

    // --------------------------- mergeable NDV through appends (r11)
    // The incremental-maintenance gap closed: appendIndexed used to
    // DROP NDV (HLL point estimates don't merge), leaving join planning
    // blind until the next full ANALYZE. Now per-column DataSketches
    // HLL sketches persist beside the head and the append hll_unions in
    // ONLY the new files' sketches — O(new data). The oracle is exact
    // COUNT(DISTINCT) over the union: at these cardinalities (25
    // brands, 5 mfgrs) the sketch is in sparse mode and EXACT, so a
    // hash compare proves the merge saw both slices' value sets
    // (brand ~25 distinct, size ~50 distinct in the synthetic part).
    "x_ndv_merge" -> (((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_ndvm", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val part = t(s, dir, "part").select(
        col("p_partkey").cast("long").as("k"),
        col("p_brand").as("brand"),
        col("p_size").cast("long").as("sz"))
      cat.overwriteIndexed("pt", part.filter(col("k") % 2 === 0L),
        skipCols = Seq("brand", "sz"))
      val st1 = cat.stats("pt").get
      require(st1.ndvNonce.nonEmpty && st1.ndv.nonEmpty,
        "analyze must land the sketch sidecar pointer")
      cat.appendIndexed("pt", part.filter(col("k") % 2 === 1L),
        skipCols = Seq("brand", "sz"))
      val st2 = cat.stats("pt").get
      require(st2.ndv.nonEmpty && st2.ndvNonce.nonEmpty &&
        st2.ndvNonce != st1.ndvNonce,
        "the append must MERGE ndv under a fresh sketch nonce, not drop it")
      Seq(("brand", st2.ndv("brand")), ("sz", st2.ndv("sz")))
        .toDF("c", "ndv")
    }),
      Some("""SELECT 'brand' AS c, COUNT(DISTINCT p_brand) AS ndv FROM part
             |UNION ALL
             |SELECT 'sz' AS c, COUNT(DISTINCT p_size) AS ndv FROM part""".stripMargin)),

    // --------------------------- zero-copy CLONE (r11)
    // SHALLOW CLONE semantics: the clone's v1 hard-links the source's
    // current snapshot (no bytes copied), then the two tables diverge
    // independently — the source appends, the clone rewrites, and each
    // side's content is exactly what its own commits say. The oracle is
    // the pure relational statement of both divergent states.
    "x_clone" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_clone", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        col("n_regionkey").cast("long").as("rk"))
      cat.replaceAtomic("src", base)
      cat.cloneTable("src", "dst")
      // source diverges by append; clone diverges by rewrite
      cat.appendAtomic("src", base.filter(col("rk") === 2L)
        .select((col("k") + lit(100L)).as("k"), col("name"), col("rk")))
      cat.replaceAtomic("dst", cat.read("dst").filter(col("rk") <= 1L))
      require(cat.read("dst").count() < base.count(),
        "the clone's rewrite must not be visible-proof")
      cat.read("src").select(lit("src").as("side"), col("k"), col("name"),
          col("rk"))
        .unionAll(cat.read("dst").select(lit("dst").as("side"), col("k"),
          col("name"), col("rk")))
    }),
      Some("""SELECT 'src' AS side, CAST(n_nationkey AS BIGINT) AS k,
             |  n_name AS name, CAST(n_regionkey AS BIGINT) AS rk FROM nation
             |UNION ALL
             |SELECT 'src', CAST(n_nationkey AS BIGINT) + 100, n_name,
             |  CAST(n_regionkey AS BIGINT) FROM nation WHERE n_regionkey = 2
             |UNION ALL
             |SELECT 'dst', CAST(n_nationkey AS BIGINT), n_name,
             |  CAST(n_regionkey AS BIGINT) FROM nation
             |WHERE n_regionkey <= 1""".stripMargin)),

    // --------------------------- commit-log catalog + ANALYZE (r8)
    // The same committed content must come out of the append-only
    // commit-log pointer protocol (LogCommitter — the object-store
    // design) as out of POSIX renames: a two-swap catalog cycle runs
    // entirely log-backed, the dim is ANALYZEd, and the read comes
    // through the stats-driven broadcast hint (fresh stats at the
    // committed version → the join hash-builds on the dim). The oracle
    // knows nothing of storage — identical values prove the protocol.
    "x_commit_log" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.{LogCommitter, TableCatalog}
      val scratch = scratchDir("graft_clog", dir)
      val cat = new TableCatalog(s, scratch.toString,
        committer = LogCommitter)
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          cents(col("c_acctbal")).as("bal_c"))
      cat.replaceAtomic("dim_cl", base)
      cat.replaceAtomic("dim_cl",
        base.filter(col("k") % 7 =!= 0))
      val st = cat.analyze("dim_cl")
      require(st.version.contains(2L), s"stats should stamp v2: $st")
      val orders = t(s, dir, "orders")
        .select(col("o_custkey").as("k"), cents(col("o_totalprice")).as("price_c"))
      orders.join(cat.readHinted("dim_cl"), Seq("k"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("sum_price_c"))
    }),
      Some("""WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg
             |  FROM customer WHERE c_custkey % 7 <> 0)
             |SELECT dim.seg, count(*) AS n_orders,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c
             |FROM orders JOIN dim ON orders.o_custkey = dim.k
             |GROUP BY dim.seg""".stripMargin)),

    // ------------------------------- VACUUM crashed-writer residue (r9)
    // The storage-reclaim verb, value-gated like x_commit_log: a
    // versioned table accretes all three crash-residue classes
    // (pointer/sidecar write-asides, a full uncommitted _vN snapshot,
    // compaction staging), vacuum must report EXACTLY those classes and
    // delete them, and the committed snapshots must read back
    // byte-identically — which the oracle proves by replaying the
    // post-vacuum aggregate over raw customer. A vacuum that over-deletes
    // (touching _v1/_v2, the pointer, or the stats sidecar) changes rows;
    // one that under-deletes fails the require.
    "x_vacuum" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      import java.nio.file.{Files, Paths}
      val scratch = scratchDir("graft_vacuum", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val base = t(s, dir, "customer").select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"), cents(col("c_acctbal")).as("bal_c"))
      cat.replaceAtomic("dim_vac", base)
      cat.replaceAtomic("dim_vac", base.filter(col("k") % 7 =!= 0))
      val p = Paths.get(cat.path("dim_vac"))
      Files.write(p.resolve("_version.tmp"), "9".getBytes)
      Files.write(p.resolve("_stats.json.tmp-dead"), "{}".getBytes)
      val orphan = p.resolve("_v99")
      Files.createDirectories(orphan)
      Files.write(orphan.resolve("dead.parquet"), Array.fill(16)(0.toByte))
      val stage = p.resolve("_tmp_1999-01")
      Files.createDirectories(stage)
      Files.write(stage.resolve("dead"), Array.fill(4)(0.toByte))
      val rep = cat.vacuum("dim_vac", graceMs = 0L)
      require(rep.map(r => (r._1, r._2)) == Seq(("staging", 1L),
        ("uncommitted_snapshot", 1L), ("write_aside", 2L)),
        s"vacuum report off: $rep")
      require(!Files.exists(orphan) && !Files.exists(stage),
        "residue must be gone")
      require(cat.versions("dim_vac") == Seq(1L, 2L),
        "committed snapshots must survive vacuum")
      cat.read("dim_vac").groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("bal_c")).as("sum_bal_c"))
    }),
      Some("""SELECT c_mktsegment AS seg, count(*) AS n,
             |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_bal_c
             |FROM customer WHERE c_custkey % 7 <> 0
             |GROUP BY 1""".stripMargin)),

    // ---------------------- catalog-level VACUUM (multi-table txn residue)
    // The multi-table-commit machinery's crashed-writer sweep: an
    // orphan cpin tag (a generation that never committed), a catalog
    // write-aside, and the superseded generation's snapshot file are
    // fabricated/aged, vacuumCatalog reports them by class, and the
    // LIVE generation must survive — readConsistent still resolves
    // every pin afterwards, which is what the output proves.
    "x_vacuum_catalog" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      import java.nio.file.{Files, Paths}
      val scratch = scratchDir("graft_cvac", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val base = t(s, dir, "customer").select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"), cents(col("c_acctbal")).as("bal_c"))
      cat.commitAll(replace = Seq("cv_dim" -> base))
      cat.commitAll(replace = Seq(
        "cv_dim" -> base.filter(col("k") % 7 =!= 0)))
      Files.write(Paths.get(cat.path("cv_dim"), "_tag_cpin_99"), "1".getBytes)
      Files.write(Paths.get(cat.root, "_catalog", "_tmp_dead"), "x".getBytes)
      val rep = cat.vacuumCatalog(graceMs = 0L)
      require(rep.map(r => (r._1, r._2)) == Seq(("orphan_pin", 1L),
        ("superseded_snapshot", 1L), ("write_aside", 1L)),
        s"vacuumCatalog report off: $rep")
      require(cat.vacuumCatalog(graceMs = 0L).isEmpty,
        "second sweep must find a clean catalog")
      cat.readConsistent("cv_dim").groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("bal_c")).as("sum_bal_c"))
    }),
      Some("""SELECT c_mktsegment AS seg, count(*) AS n,
             |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_bal_c
             |FROM customer WHERE c_custkey % 7 <> 0
             |GROUP BY 1""".stripMargin)),

    // ----------------------- string-envelope file skipping (native)
    // A layout range-clustered by a STRING key prunes by native string
    // envelopes (URL-prefix / categorical slices — no numeric
    // surrogate). Bounds compare in unsigned UTF-8 order, the order
    // Spark's own min/max built them in. The require() pins that the
    // probe actually skipped files; the oracle replays the BETWEEN on
    // raw customer, so a wrong envelope (which silently DROPS files)
    // surfaces as missing rows.
    "x_skipping_string" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_sskip", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey"),
        col("c_name"),
        cents(col("c_acctbal")).as("bal_c"))
      cat.overwriteIndexed("sk_cust",
        c.repartitionByRange(16, col("c_name")), Seq("c_name"))
      val lo = "Customer#000000100"
      val hi = "Customer#000000399"
      val pruned = cat.prunedReadRanges("sk_cust", Seq.empty,
        Seq(("c_name", lo, hi)))
      val total = cat.read("sk_cust").inputFiles.length
      require(pruned.inputFiles.length * 2 <= total,
        s"string envelopes pruned nothing: ${pruned.inputFiles.length}/$total")
      pruned.select(col("ckey"), col("c_name"), col("bal_c"))
    }),
      Some("""SELECT CAST(c_custkey AS BIGINT) AS ckey, c_name,
             |  CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
             |FROM customer
             |WHERE c_name BETWEEN 'Customer#000000100' AND 'Customer#000000399'
             |""".stripMargin)),

    // ------------------------- stats-planned join width (r9)
    // The join-cardinality estimate DRIVING a plan (VERDICT r8 next
    // #3), value-gated: both sides are ANALYZEd, the shuffle width is
    // required in-query to come from the System-R estimate (not the
    // session default), and the join runs through joinPlanned — each
    // side hash-repartitioned on its key to the planned width, which
    // the join reuses. The oracle replays the plain join: identical
    // values prove planning never changes results, and the require()s
    // make the bench/verify surface fail loudly if the estimate ever
    // stops feeding the plan.
    "x_join_planned" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_jplan", dir)
      val cat = new TableCatalog(s, scratch.toString)
      cat.replaceAtomic("dim_jp", t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg")))
      cat.replaceAtomic("fact_jp", t(s, dir, "orders")
        .select(col("o_custkey").as("k"), cents(col("o_totalprice")).as("price_c")))
      cat.analyze("dim_jp"); cat.analyze("fact_jp")
      val rowsPerTask = 1000L
      val planned = cat.plannedShufflePartitions(
        "fact_jp", "k", "dim_jp", "k", rowsPerTask = rowsPerTask)
      require(planned.exists(_ >= 1),
        s"fresh stats on both sides must yield a planned width, got $planned")
      // broadcastBytes = 0 forces the repartition branch (at fixture
      // scale the dim's stats would otherwise take the no-shuffle
      // broadcast branch, which has no width to assert — the spec
      // covers that branch)
      val joined = cat.joinPlanned("fact_jp", "k", "dim_jp", "k",
        rowsPerTask = rowsPerTask, broadcastBytes = 0L)
      require(joined.rdd.getNumPartitions == planned.get,
        s"join must run at the planned width ${planned.get}, " +
          s"got ${joined.rdd.getNumPartitions}")
      joined.groupBy(col("seg"))
        .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("sum_price_c"))
    }),
      Some("""SELECT c_mktsegment AS seg, count(*) AS n_orders,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // ------------------------------------------- snapshot diff (CDC)
    // Full-extract change capture: old = customers not divisible by 7,
    // new = customers not divisible by 11 with segments rewritten for
    // %10 keys — yielding all three change types from one deterministic
    // derivation both engines replay.
    "x_snapshot_diff" -> (((s: SparkSession, dir: String) => {
      val cust = t(s, dir, "customer")
      val oldSnap = cust.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      val newSnap = cust.filter(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 10 === 0, "CHANGED")
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"))
      graft.etl.SnapshotDiff.diff(oldSnap, newSnap,
        keys = Seq("c_custkey"), compareCols = Seq("c_mktsegment", "c_nationkey"))
    }),
      Some("""WITH oldt AS (SELECT c_custkey, c_mktsegment, c_nationkey
             |    FROM customer WHERE c_custkey % 7 <> 0),
             |newt AS (SELECT c_custkey,
             |    CASE WHEN c_custkey % 10 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment,
             |    c_nationkey FROM customer WHERE c_custkey % 11 <> 0)
             |SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
             |  CASE WHEN o.c_custkey IS NULL THEN 'insert'
             |       WHEN n.c_custkey IS NULL THEN 'delete' ELSE 'update' END AS change_type,
             |  CASE WHEN o.c_custkey IS NULL OR n.c_custkey IS NULL THEN ''
             |       ELSE concat_ws(',',
             |         CASE WHEN o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'c_mktsegment' END,
             |         CASE WHEN o.c_nationkey IS DISTINCT FROM n.c_nationkey THEN 'c_nationkey' END)
             |  END AS changed_cols
             |FROM oldt o FULL JOIN newt n ON o.c_custkey = n.c_custkey
             |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
             |   OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
             |   OR o.c_nationkey IS DISTINCT FROM n.c_nationkey""".stripMargin)),

    // ----------------------------------------- CDC changeset round trip
    // The closure of the snapshot-diff story: a value-carrying changeset
    // (insert/update rows ship their NEW values) replayed onto the old
    // snapshot must reconstruct the new one EXACTLY — the oracle is the
    // new snapshot itself, so any drift in diff classification, value
    // carriage, or the null-safe retire anti-join fails the hash. This
    // is what lets a full-extract source be consumed incrementally:
    // ship the delta, not the 100 TB snapshot.
    "x_cdc_apply" -> (((s: SparkSession, dir: String) => {
      import graft.etl.SnapshotDiff
      val cust = t(s, dir, "customer")
      val oldSnap = cust.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      val newSnap = cust.filter(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 10 === 0, "CHANGED")
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"))
      val cs = SnapshotDiff.changes(oldSnap, newSnap,
        keys = Seq("c_custkey"), compareCols = Seq("c_mktsegment", "c_nationkey"))
      SnapshotDiff.applyChanges(oldSnap, cs,
        keys = Seq("c_custkey"), compareCols = Seq("c_mktsegment", "c_nationkey"))
    }),
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 10 = 0 THEN 'CHANGED' ELSE c_mktsegment END
             |    AS c_mktsegment,
             |  c_nationkey
             |FROM customer WHERE c_custkey % 11 <> 0""".stripMargin)),

    // ------------------------------------------------ weighted median
    // Lower weighted median of line price (exact cents) weighted by
    // quantity, per return flag: the smallest value whose cumulative
    // weight reaches half the total. This is the DIRECT one-window
    // form — right while a group's distinct values fit one task (they
    // do here by orders of magnitude); its scale sibling below finds
    // the identical crossover with bounded windows. Same j3 direct/
    // bucketed pairing. Exact integers throughout.
    "x_weighted_median" -> (((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        cents(col("l_extendedprice")).as("v"),
        col("l_quantity").cast("long").as("w"))
      val pv = li.groupBy(col("g"), col("v")).agg(sum(col("w")).as("vw"))
      val wcum = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wtot = Window.partitionBy(col("g"))
      pv.withColumn("cw", sum(col("vw")).over(wcum))
        .withColumn("tw", sum(col("vw")).over(wtot))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("g"))
        .agg(min(col("v")).as("wmedian_c"), max(col("tw")).as("total_w"))
    }),
      Some(weightedMedianOracleSql)),

    // --------------------------------- weighted median (scale path)
    // The SAME exact crossover via ops.WeightedQuantile's two-phase
    // bucketed search: the direct form above puts a group's ENTIRE
    // distinct-value domain through one window task (3 return flags →
    // 3 reducers no matter the corpus size); here the windows are
    // bounded at 4096 bucket rows (phase 1) plus one bucket's values
    // (phase 2), so the operator survives groups whose value domains
    // exceed a task. Locally the extra stages cost ~2× the direct form
    // (SCALE.md) — the classic constant-vs-asymptotics trade the j3
    // direct/bucketed pair also documents. Identical oracle: both
    // formulations must land on the same row.
    "x_weighted_median_bucketed" -> (((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        cents(col("l_extendedprice")).as("v"),
        col("l_quantity").cast("long").as("w"))
      graft.ops.WeightedQuantile.weightedMedian(li, "g", "v", "w")
    }),
      Some(weightedMedianOracleSql)),

    // ------------------------------ weighted p90 (rational quantile)
    // The general form at 9/10: the crossover rule qDen·cumw ≥
    // qNum·totw stays in exact int64 (a floating 0.9 would make the
    // crossover row rounding-dependent at mass boundaries), replayed
    // verbatim by the oracle.
    "x_weighted_p90" -> (((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        cents(col("l_extendedprice")).as("v"),
        col("l_quantity").cast("long").as("w"))
      graft.ops.WeightedQuantile.weightedQuantile(li, "g", "v", "w",
        qNum = 9L, qDen = 10L)
    }),
      Some("""WITH li AS (SELECT l_returnflag AS g,
             |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
             |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
             |pv AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS vw
             |  FROM li GROUP BY 1, 2),
             |cum AS (SELECT g, v,
             |    CAST(sum(vw) OVER (PARTITION BY g ORDER BY v
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
             |    CAST(sum(vw) OVER (PARTITION BY g) AS BIGINT) AS tw
             |  FROM pv)
             |SELECT g, CAST(min(v) AS BIGINT) AS wquantile_c,
             |  CAST(max(tw) AS BIGINT) AS total_w
             |FROM cum WHERE cw * 10 >= tw * 9 GROUP BY 1""".stripMargin)),

    // --------------------- WIDE-DECIMAL quantiles (r18, closing the
    // last domain refusal — VERDICT r17 missing #5): a decimal(38,10)
    // whose unscaled integer exceeds int64 exercises BOTH new paths.
    // The value is built EXACTLY (string concat of price cents and an
    // 18-digit zero-padded partkey, sign split by orderkey parity) so
    // both engines hold identical 128-bit decimals. In-query require:
    // percentilesCont on the wide domain equals Spark's own stock
    // percentile() BIT-FOR-BIT (the op's actual contract — monotone
    // decimal→double rounding commutes with order statistics; a DuckDB
    // replay would add cross-engine double-conversion ulp noise, which
    // is exactly what the contract is NOT). The oracle-compared output
    // is the weighted median through the two-word hierarchical search
    // — decimal in, decimal out, no doubles anywhere, replayed by
    // DuckDB's one-window form over the same 128-bit values.
    "x_quantile_wide_decimal" -> (((s: SparkSession, dir: String) => {
      // deterministic quarter-slice BEFORE the decimal construction:
      // parsing a 26-38-digit string into a 128-bit decimal and
      // splitting it is genuine per-row CPU (embarrassingly parallel
      // at scale, but paid per PASS locally) — the slice prices the
      // query honestly while still exercising multi-word high words,
      // low-word slices, and negative domains end to end
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 4 === 1)
        .select(col("l_returnflag").as("g"),
        concat(cents(col("l_extendedprice")).cast("string"),
          lpad(col("l_partkey").cast("string"), 18, "0"))
          .cast("decimal(38,10)").as("v0"),
        col("l_orderkey"), col("l_quantity").cast("long").as("w"))
      // materialize the constructed decimals ONCE (r18 opt): the
      // string-parse + 128-bit construction is the query's real CPU
      // and THREE consumers re-ran it from parquet per pass (the
      // bounded-search pv, the stock contract probe, the weighted
      // median's pv) — one eager checkpoint of the ~150k-row frame
      // makes it one construction pass; every downstream number is
      // unchanged (same rows, same values)
      val df = li.select(col("g"),
        when(col("l_orderkey") % 2 === 1, -col("v0"))
          .otherwise(col("v0")).as("v"), col("w"),
        col("l_orderkey").as("okey"))
        .localCheckpoint(true)
      // contract check, Spark vs Spark: the bounded search on the wide
      // domain is bit-identical to the stock aggregate. BOUNDED input
      // (a deterministic ~6% key slice, both sides identically): the
      // stock aggregate is a single reducer holding every distinct
      // BigDecimal per group — the exact shape the bounded op exists
      // to avoid — and at bench SF the full-data pin measured 25+ s of
      // pure contract-checking; the slice keeps the bit-equality pin
      // at every gate SF while QuantilesSpec owns exhaustive coverage
      val probe = df.filter(col("okey") % 17 === 3).select(col("g"), col("v"))
      val fast = graft.ops.Quantiles.percentilesCont(
        probe, "g", "v",
        Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L)),
        smallThreshold = 0L).orderBy("g").collect().toSeq.map(_.toSeq)
      val stock = probe.groupBy(col("g")).agg(
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"))
        .orderBy("g").collect().toSeq.map(_.toSeq)
      require(fast == stock, "wide-decimal percentilesCont must equal " +
        s"the stock aggregate bit-for-bit; got $fast vs $stock")
      // the 128-bit median travels as its PLAIN string (the driver's
      // pandas bridge renders decimal128 columns in scientific float
      // notation on the DuckDB side — the value is identical, the
      // rendering is not); both engines print decimal(38,10) plain
      graft.ops.WeightedQuantile.weightedMedian(df, "g", "v", "w")
        .select(col("g"), col("wmedian_c").cast("string").as("wmedian_s"),
          col("total_w"))
    }),
      Some("""WITH li AS (SELECT l_returnflag AS g,
             |    CAST(concat(
             |      CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
             |        AS VARCHAR),
             |      lpad(CAST(l_partkey AS VARCHAR), 18, '0'))
             |      AS DECIMAL(38,10)) AS v0,
             |    l_orderkey, CAST(l_quantity AS BIGINT) AS w
             |  FROM lineitem WHERE l_orderkey % 4 = 1),
             |li2 AS (SELECT g, CASE WHEN l_orderkey % 2 = 1
             |    THEN -v0 ELSE v0 END AS v, w FROM li),
             |pv AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS vw
             |  FROM li2 GROUP BY 1, 2),
             |cum AS (SELECT g, v,
             |    CAST(sum(vw) OVER (PARTITION BY g ORDER BY v
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
             |    CAST(sum(vw) OVER (PARTITION BY g) AS BIGINT) AS tw
             |  FROM pv)
             |SELECT g, CAST(min(v) AS VARCHAR) AS wmedian_s,
             |  CAST(max(tw) AS BIGINT) AS total_w
             |FROM cum WHERE cw * 2 >= tw GROUP BY 1""".stripMargin)),

    // --------------------------------------- Gini diversity (rational)
    // Per-user event-type diversity: gini = 1 − Σ(nᵢ/n)² computed as
    // the rational (n² − Σnᵢ²)/n² — numerator and denominator are exact
    // int64s, the e6 projection is one IEEE divide. The entropy-style
    // diversity measure WITHOUT logs, chosen precisely because ln()'s
    // last-bit rounding is libm-dependent and would break the
    // cross-engine hash that this rational form keeps exact.
    "x_gini" -> (((s: SparkSession, dir: String) => {
      val c = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("ni"))
      c.groupBy(col("user_id"))
        .agg(sum(col("ni")).as("n"), sum(col("ni") * col("ni")).as("ss"),
          count(lit(1)).as("n_types"))
        .withColumn("gini_e6",
          floor(lit(1000000.0d) * (col("n") * col("n") - col("ss")) /
            (col("n") * col("n"))).cast("long"))
    }),
      Some("""WITH c AS (SELECT user_id, event_type,
             |    CAST(count(*) AS BIGINT) AS ni FROM events GROUP BY 1, 2),
             |g AS (SELECT user_id, CAST(sum(ni) AS BIGINT) AS n,
             |    CAST(sum(ni * ni) AS BIGINT) AS ss,
             |    CAST(count(*) AS BIGINT) AS n_types
             |  FROM c GROUP BY 1)
             |SELECT user_id, n, ss, n_types,
             |  CAST(floor(1000000.0 * (n * n - ss) / (n * n)) AS BIGINT)
             |    AS gini_e6
             |FROM g""".stripMargin)),

    // ------------------------------------- vocabulary OOV coverage
    // Tokenizer-coverage audit: the corpus top-1000 tokens (count desc,
    // token asc — binary collation in both engines) form the
    // vocabulary; every doc reports its token count, out-of-vocabulary
    // count, and e6 OOV rate. The vocab is a TakeOrdered over the
    // token-count aggregate (never a global sort) and rides a broadcast
    // join back over the exploded tokens — the shape that survives a
    // 100 TB corpus because the vocabulary, not the corpus, is the
    // broadcast side.
    "x_vocab_oov" -> (((s: SparkSession, dir: String) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(1000)
        .select(col("tok"), lit(1).as("in_v"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_e6",
          floor(lit(1000000.0d) * col("n_oov") / col("n_tokens")).cast("long"))
    }),
      Some("""WITH splits AS (SELECT doc_id, string_split(text, ' ') AS l
             |    FROM documents),
             |toks AS (SELECT doc_id, unnest(l) AS tok FROM splits),
             |nz AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
             |vocab AS (SELECT tok FROM (SELECT tok, count(*) AS cnt
             |    FROM nz GROUP BY 1 ORDER BY cnt DESC, tok ASC LIMIT 1000)),
             |j AS (SELECT nz.doc_id, nz.tok, v.tok AS vtok
             |  FROM nz LEFT JOIN vocab v ON nz.tok = v.tok)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_oov,
             |  CAST(floor(1000000.0 *
             |    sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) / count(*))
             |    AS BIGINT) AS oov_e6
             |FROM j GROUP BY 1""".stripMargin)),

    // -------------------------------------------- k-core decomposition
    // The 5-core of the order–supplier bipartite graph from lineitem
    // (supplier node ids offset into their own range): iterative peel —
    // drop vertices with degree < 5, discard their edges, repeat until
    // fixpoint — KCore.kcore runs the cascade with per-round
    // localCheckpoints; the oracle unrolls the same rounds as chained
    // CTEs (peeling is monotone, so once both engines reach fixpoint
    // extra unrolled rounds are no-ops and the hash can't drift).
    "x_kcore" -> (((s: SparkSession, dir: String) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("src"),
          (col("l_suppkey") + lit(100000000L)).as("dst"))
        .distinct()
      graft.ops.KCore.kcore(
        graft.ops.KCore.symmetrize(edges, "src", "dst"), k = 5,
        maxRounds = 8)
    }),
      Some(s"""WITH d AS (SELECT DISTINCT l_orderkey AS src,
             |    l_suppkey + 100000000 AS dst FROM lineitem),
             |e0 AS MATERIALIZED (SELECT src, dst FROM d
             |  UNION SELECT dst AS src, src AS dst FROM d),
             |${kcorePeelSql(5, 8)}
             |SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
             |FROM e8 GROUP BY 1""".stripMargin)),

    // --------------------------------------- referential-integrity audit
    // FK-closure audit (Profile.refIntegrity): orphan counts per
    // declared relationship, with orphans manufactured deterministically
    // by auditing against FILTERED parents — the real tables are clean,
    // and an audit that can only ever print zero proves nothing.
    "x_ri_audit" -> (((s: SparkSession, dir: String) => {
      import graft.ops.Profile
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      Profile.refIntegrity(orders, "o_custkey",
          t(s, dir, "customer").filter(col("c_custkey") % 7 =!= 0),
          "c_custkey", "orders->customer")
        .unionByName(Profile.refIntegrity(li, "l_suppkey",
          t(s, dir, "supplier").filter(col("s_suppkey") % 5 =!= 0),
          "s_suppkey", "lineitem->supplier"))
        .unionByName(Profile.refIntegrity(li, "l_orderkey",
          orders, "o_orderkey", "lineitem->orders"))
    }),
      Some("""WITH rels AS (
             |  SELECT 'orders->customer' AS rel, o_custkey AS fk FROM orders
             |  UNION ALL
             |  SELECT 'lineitem->supplier', l_suppkey FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem->orders', l_orderkey FROM lineitem),
             |pks AS (
             |  SELECT 'orders->customer' AS rel, c_custkey AS pk
             |    FROM customer WHERE c_custkey % 7 <> 0
             |  UNION ALL
             |  SELECT 'lineitem->supplier', s_suppkey FROM supplier
             |    WHERE s_suppkey % 5 <> 0
             |  UNION ALL
             |  SELECT 'lineitem->orders', o_orderkey FROM orders)
             |SELECT r.rel, CAST(count(*) AS BIGINT) AS n_child,
             |  CAST(sum(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_orphan,
             |  CAST(floor(1000000.0 *
             |    sum(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) / count(*))
             |    AS BIGINT) AS orphan_e6
             |FROM rels r LEFT JOIN (SELECT DISTINCT rel, pk FROM pks) p
             |  ON r.rel = p.rel AND r.fk = p.pk
             |GROUP BY 1""".stripMargin)),

    // --------------------------------------- skyline (Pareto frontier)
    // Per-user activity points (event count, summed value cents); the
    // frontier = users no other user beats on both axes. The operator
    // is the sweep identity (groupBy(x) + two-phase exclusive prefix
    // max — Skyline.pareto2D, never an all-pairs join); the oracle IS
    // the all-pairs dominance definition, so the identity itself is
    // what the hash pins. Tie semantics included: exact-duplicate
    // frontier points all survive.
    "x_skyline" -> (((s: SparkSession, dir: String) => {
      val pts = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("val_c"))
      graft.ops.Skyline.pareto2D(pts, "n_events", "val_c")
        .select(col("user_id"), col("n_events"), col("val_c"))
    }),
      Some("""WITH p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS val_c
             |  FROM events GROUP BY 1)
             |SELECT user_id, n_events, val_c FROM p
             |WHERE NOT EXISTS (SELECT 1 FROM p q
             |  WHERE q.n_events >= p.n_events AND q.val_c >= p.val_c
             |    AND (q.n_events > p.n_events OR q.val_c > p.val_c))""".stripMargin)),

    // --------------------------------- grouped Pearson correlation
    // Per-nation correlation between a customer's balance (exact cents)
    // and their order count. The six sufficient statistics are EXACT
    // int64 sums — order-insensitive, so partitioning can't move the
    // hash (a double Σx² would be summation-order-sensitive and break
    // it; ANSI mode turns any future overflow into a loud error, and
    // Σx² fits int64 to ~9M customers per nation). Only the DERIVED
    // terms (covariance, variances, r) promote to double — n·Σxy-style
    // products would overflow int64 at large SF — with the expression
    // written identically on both sides: IEEE multiply/divide/sqrt are
    // exactly rounded, so the e6 projection hash-matches.
    "x_grouped_corr" -> (((s: SparkSession, dir: String) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey").cast("long").as("nation"),
        cents(col("c_acctbal")).as("x"))
      val ord = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("y"))
      val xy = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .select(col("nation"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double")
      val syD = col("sy").cast("double")
      xy.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        // zero-variance guard: a group where all x or all y are equal
        // has no defined correlation — without the CASE the division
        // yields Inf/NaN and ANSI floor(..).cast(long) throws (same
        // guard x_regression carries as den <> 0)
        .withColumn("corr_e6",
          when((nD * col("sxx") - sxD * col("sx")) > 0d &&
               (nD * col("syy") - syD * col("sy")) > 0d,
            floor(lit(1000000.0d) * (nD * col("sxy") - sxD * col("sy")) /
              (sqrt(nD * col("sxx") - sxD * col("sx")) *
               sqrt(nD * col("syy") - syD * col("sy"))))
              .cast("long")))
        .select(col("nation"), col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy"), col("corr_e6"))
    }),
      Some("""WITH ord AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS y
             |    FROM orders GROUP BY 1),
             |xy AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |    CAST(floor(c_acctbal * 100) AS BIGINT) AS x,
             |    coalesce(y, 0) AS y
             |  FROM customer LEFT JOIN ord ON c_custkey = o_custkey),
             |g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(y * y) AS BIGINT) AS syy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM xy GROUP BY 1)
             |SELECT nation, n, sx, sy, sxx, syy, sxy,
             |  CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
             |        AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
             |  THEN CAST(floor(1000000.0 *
             |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             |    (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             |     sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
             |    AS BIGINT) END AS corr_e6
             |FROM g""".stripMargin)),

    // -------------------------------------------------- A1 having count
    "a1_having_count" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 3)),
      Some("""SELECT o_custkey, count(*) AS cnt FROM orders
             |GROUP BY o_custkey HAVING count(*) > 3""".stripMargin)),

    // --------------------------------------- A2 array_agg/ANY membership
    // Literal collect_list + array_contains form (SURVEY §2.4 A2).
    "a2_any_membership" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_returnflag")).as("flags"))
        .filter(array_contains(col("flags"), "R") && array_contains(col("flags"), "A"))
        .select(col("l_orderkey"))),
      Some("""SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
             |HAVING max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
             |   AND max(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) = 1""".stripMargin)),

    // -------------------------------------------------- A3 exact count
    "a3_exact_count" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") === 7)
        .select(col("l_orderkey"))),
      Some("""SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
             |HAVING count(*) = 7""".stripMargin)),

    // --------------------------------- top-k per group via aggregation
    // The bounded-buffer alternative to the W1/W2 window form: shuffles
    // ≤k entries per (group, map partition) instead of every row, and
    // never sorts a whole group. The oracle IS the window form — the
    // gate pins the two plans equal.
    "x_topk_group" -> (((s: SparkSession, dir: String) =>
      graft.ops.TopK.perGroup(t(s, dir, "orders"), Seq("o_custkey"),
        "o_totalprice", "o_orderkey", k = 3)),
      Some("""SELECT o_custkey, rank, o_orderkey AS id, o_totalprice AS v
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
             |  FROM orders) t WHERE rank <= 3""".stripMargin)),

    // -------------------------------------------------- W1 rownum time
    "w1_rownum_time" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))),
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |  SELECT o_custkey, o_orderkey, row_number() OVER
             |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
             |  FROM orders) t WHERE rn <= 3""".stripMargin)),

    // ------------------------------------------------ W2 rownum amount
    "w2_rownum_amount" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))),
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |  SELECT o_custkey, o_orderkey, row_number() OVER
             |    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders) t WHERE rn <= 3""".stripMargin)),

    // --------------------------- W3: sliding-window aggregation — the
    // batch formulation of streaming.StreamingIngest.cardWindowCounts
    // (20-minute windows, 5-minute slide; every event belongs to exactly
    // 4 windows). Window starts exported as epoch seconds so the oracle
    // needs no timezone-sensitive timestamp construction.
    "w3_sliding_window" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "events")
        .groupBy(col("user_id"),
          window(col("ts"), "20 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"),
          max(when(col("event_type") === "error", 1).otherwise(0)).as("has_error"))
        .select(col("user_id"),
          unix_timestamp(col("w.start")).as("window_start_s"),
          col("cnt"), col("has_error"))),
      Some("""WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type
             |  FROM events),
             |w AS (SELECT user_id, event_type,
             |    (es // 300) * 300 - 300 * i AS window_start_s
             |  FROM e, generate_series(0, 3) t(i))
             |SELECT user_id, window_start_s, count(*) AS cnt,
             |  max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error
             |FROM w GROUP BY user_id, window_start_s""".stripMargin)),

    // -------------------------------------------------------- O1 distinct
    "o1_distinct" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "customer").select(col("c_nationkey"), col("c_mktsegment")).distinct()),
      Some("SELECT DISTINCT c_nationkey, c_mktsegment FROM customer")),

    // ------------------------------------------------------ O4 intersect
    "o4_intersect" -> (((s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.filter(col("o_totalprice") > 100000).select(col("o_custkey")))
    }),
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_totalprice > 100000""".stripMargin)),

    // ------------------------------------------- F3-F8 scalar functions
    "f_scalars" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "events").select(
        col("event_id"),
        concat(col("event_type"), lit(" "), col("props")).as("tagged"),
        when(col("value") < 1, "low").when(col("value") < 5, "mid")
          .otherwise("high").as("bucket"),
        abs(col("value") - 5.0).as("dist"),
        (col("ts") + expr("INTERVAL 20 MINUTES")).as("ts_plus"),
        unix_timestamp(col("ts")).as("epoch_s"))),
      Some("""SELECT event_id, event_type || ' ' || props AS tagged,
             |  CASE WHEN value < 1 THEN 'low' WHEN value < 5 THEN 'mid' ELSE 'high' END AS bucket,
             |  abs(value - 5.0) AS dist,
             |  ts + INTERVAL 20 MINUTE AS ts_plus,
             |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
             |FROM events""".stripMargin)),

    // ------------------------------------- C7 rule-5 brute-force pattern
    // Exercises the REAL FraudRules.bruteForceRule against an independent
    // SQL formulation (deterministic tie-breakers on both sides).
    // The events feed is too sparse in real time for 4-in-20-minutes
    // windows, so the mapping compresses the timeline 200× (pure integer
    // epoch arithmetic — no timezone functions — identically on both
    // sides); the rule itself is untouched.
    "c7_bruteforce" -> (((s: SparkSession, dir: String) => {
      val r = t(s, dir, "events").select(
        col("user_id").as("client_id"),
        col("event_id").as("trans_id"),
        expr("timestamp_seconds(1704067200 + (unix_timestamp(ts) - 1704067200) div 200)")
          .as("trans_date"),
        col("value").cast(d182).as("amt"),
        when(col("event_type").isin("click", "view"), "SUCCESS")
          .otherwise("REJECT").as("oper_result"))
        // both sides of the rule's interval self-join re-derived this
        // frame from the one-row-group events file (r18 opt)
        .localCheckpoint(true)
      FraudRules.bruteForceRule(r)
    }),
      Some("""WITH r AS (SELECT user_id AS client_id, event_id AS trans_id,
             |    TIMESTAMP '2024-01-01 00:00:00' + INTERVAL
             |      ((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 200) SECOND AS trans_date,
             |    CAST(value AS DECIMAL(18,2)) AS amt,
             |    CASE WHEN event_type IN ('click','view') THEN 'SUCCESS' ELSE 'REJECT' END AS oper_result
             |  FROM events),
             |joined AS (SELECT r1.client_id, r1.trans_id AS trans_id_start,
             |    r2.trans_id AS trans_id_20min, r2.amt AS amt_20min,
             |    r2.trans_date AS trans_date_20min, r2.oper_result
             |  FROM r r1 JOIN r r2 ON r2.client_id = r1.client_id
             |    AND r2.trans_date BETWEEN r1.trans_date AND r1.trans_date + INTERVAL 20 MINUTE),
             |win AS (SELECT *,
             |    row_number() OVER (PARTITION BY client_id, trans_id_start
             |      ORDER BY trans_date_20min ASC, trans_id_20min ASC) AS rn_datetime,
             |    count(*) OVER (PARTITION BY client_id, trans_id_start) AS cnt,
             |    max(CASE WHEN oper_result = 'SUCCESS' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY client_id, trans_id_start) AS has_success,
             |    max(CASE WHEN oper_result = 'REJECT' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY client_id, trans_id_start) AS has_reject
             |  FROM joined),
             |w4 AS (SELECT *, row_number() OVER (PARTITION BY client_id, trans_id_start
             |      ORDER BY amt_20min DESC, trans_id_20min ASC) AS rn_amt
             |  FROM win WHERE rn_datetime <= 4 AND cnt > 3 AND has_success = 1 AND has_reject = 1)
             |SELECT client_id, trans_id_start AS trans_id FROM w4
             |GROUP BY client_id, trans_id_start
             |HAVING sum(CASE WHEN rn_amt = rn_datetime THEN 1 ELSE 0 END) = 4
             |  AND max(CASE WHEN rn_datetime = 1 THEN oper_result END) = 'REJECT'
             |  AND max(CASE WHEN rn_datetime = 2 THEN oper_result END) = 'REJECT'
             |  AND max(CASE WHEN rn_datetime = 3 THEN oper_result END) = 'REJECT'
             |  AND max(CASE WHEN rn_datetime = 4 THEN oper_result END) = 'SUCCESS'""".stripMargin)),

    // ------------------------------------------- C8 report-shape assembly
    "c8_report_shape" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"), "left")
        .filter(col("c_acctbal") < 0 || col("o_totalprice") > 300000 ||
          col("o_orderstatus") === "P")
        .select(
          col("o_orderkey").as("event_id"),
          col("o_orderdate").as("event_dt"),
          concat(col("c_name"), lit(" "), col("c_mktsegment")).as("who"),
          when(col("c_acctbal") < 0, "NEGATIVE_BAL")
            .when(col("o_totalprice") > 300000, "BIG_ORDER")
            .when(col("o_orderstatus") === "P", "PENDING").as("event_type"))),
      Some("""SELECT o_orderkey AS event_id, o_orderdate AS event_dt,
             |  c_name || ' ' || c_mktsegment AS who,
             |  CASE WHEN c_acctbal < 0 THEN 'NEGATIVE_BAL'
             |       WHEN o_totalprice > 300000 THEN 'BIG_ORDER'
             |       WHEN o_orderstatus = 'P' THEN 'PENDING' END AS event_type
             |FROM orders LEFT JOIN customer ON c_custkey = o_custkey
             |WHERE c_acctbal < 0 OR o_totalprice > 300000 OR o_orderstatus = 'P'""".stripMargin)),

    // ------------------------- C9: the ENTIRE reference pipeline, end to
    // end — star flatten + all five fraud rules + report assembly
    // (main.py:414-560) through the real FraudRules/FraudReport operators,
    // on a deterministic world derived from `events` (cards/accounts/
    // clients/terminals/blacklist synthesized from user_id arithmetic;
    // timeline compressed 200× as in c7). Verified against an independent
    // DuckDB formulation of the whole report query.
    "c9_fraud_pipeline" -> (((s: SparkSession, dir: String) => {
      import graft.report.FraudReport
      val ev = t(s, dir, "events")
      val txn = ev.select(
        col("user_id").as("card_num"),
        col("event_id").as("trans_id"),
        expr("timestamp_seconds(1704067200 + (unix_timestamp(ts) - 1704067200) div 200)")
          .as("trans_date"),
        col("value").cast(d182).as("amt"),
        when(col("event_type").isin("click", "view"), "SUCCESS")
          .otherwise("REJECT").as("oper_result"),
        // a third of the cards stay at one terminal (single city) so the
        // lower-priority brute-force rule is reachable in the report CASE
        ((col("user_id") + when(col("user_id") % 3 === 0, lit(0))
          .otherwise(col("event_id"))) % 20).as("terminal"))
        // materialized ONCE (r18 opt): txn feeds both rule self-joins,
        // the terminal dim and the report assembly — as a lazy subtree
        // each consumer re-scanned events (a one-row-group file, so
        // every re-derivation was also single-task) and re-ran the
        // column derivations; values unchanged
        .localCheckpoint(true)
      val users = ev.select(col("user_id")).distinct()
        .localCheckpoint(true) // feeds 4 dims + the blacklist
      val cards = users.select(col("user_id").as("card_num"),
        col("user_id").as("account_num"), lit(false).as("deleted_flg"))
      val accounts = users.select(col("user_id").as("account_num"),
        col("user_id").as("client"),
        when(col("user_id") % 13 === 0, lit(java.sql.Date.valueOf("2020-01-01")))
          .otherwise(lit(java.sql.Date.valueOf("3000-01-01"))).as("valid_to"),
        lit(false).as("deleted_flg"))
      val clients = users.select(col("user_id").as("client_id"),
        concat(lit("F"), col("user_id")).as("first_name"),
        concat(lit("M"), col("user_id")).as("patrinymic"),
        concat(lit("L"), col("user_id")).as("last_name"),
        concat(lit("P"), col("user_id")).as("passport_num"),
        when(col("user_id") % 11 === 0, lit(java.sql.Date.valueOf("2020-01-01")))
          .otherwise(lit(java.sql.Date.valueOf("3000-01-01"))).as("passport_valid_to"),
        concat(lit("+7"), col("user_id")).as("phone"),
        lit(false).as("deleted_flg"))
      val terminals = txn.select(col("terminal").as("terminal_id")).distinct()
        .select(col("terminal_id"),
          concat(lit("C"), col("terminal_id") % 7).as("terminal_city"),
          lit(false).as("deleted_flg"))
      val blacklist = users.filter(col("user_id") % 17 === 0)
        .select(concat(lit("P"), col("user_id")).as("passport_num"))
      val withClient = FraudRules.txnWithClient(txn, cards, accounts, clients)
        .localCheckpoint(true) // feeds BOTH rules — flatten once (r18 opt)
      val rule4 = FraudRules.crossCityRule(
        FraudRules.cityOfTransactions(withClient, terminals))
      val rule5 = FraudRules.bruteForceRule(withClient)
      FraudReport.assemble(txn, cards, accounts, clients, blacklist,
        rule4, rule5, java.sql.Date.valueOf("2024-02-01"))
    }),
      Some("""WITH txn AS (SELECT user_id AS card_num, event_id AS trans_id,
             |    TIMESTAMP '2024-01-01 00:00:00' + INTERVAL
             |      ((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 200) SECOND AS trans_date,
             |    CAST(value AS DECIMAL(18,2)) AS amt,
             |    CASE WHEN event_type IN ('click','view') THEN 'SUCCESS' ELSE 'REJECT' END AS oper_result,
             |    (user_id + CASE WHEN user_id % 3 = 0 THEN 0 ELSE event_id END) % 20 AS terminal,
             |    user_id
             |  FROM events),
             |users AS (SELECT DISTINCT user_id FROM events),
             |clients AS (SELECT user_id AS client_id,
             |    'F' || CAST(user_id AS VARCHAR) AS first_name,
             |    'M' || CAST(user_id AS VARCHAR) AS patrinymic,
             |    'L' || CAST(user_id AS VARCHAR) AS last_name,
             |    'P' || CAST(user_id AS VARCHAR) AS passport_num,
             |    CASE WHEN user_id % 11 = 0 THEN DATE '2020-01-01' ELSE DATE '3000-01-01' END AS passport_valid_to,
             |    '+7' || CAST(user_id AS VARCHAR) AS phone
             |  FROM users),
             |accounts AS (SELECT user_id AS account_num, user_id AS client,
             |    CASE WHEN user_id % 13 = 0 THEN DATE '2020-01-01' ELSE DATE '3000-01-01' END AS valid_to
             |  FROM users),
             |termcity AS (SELECT terminal_id, 'C' || CAST(terminal_id % 7 AS VARCHAR) AS terminal_city
             |  FROM (SELECT DISTINCT terminal AS terminal_id FROM txn)),
             |blacklist AS (SELECT 'P' || CAST(user_id AS VARCHAR) AS passport_num
             |  FROM users WHERE user_id % 17 = 0),
             |city AS (SELECT t.card_num, t.trans_id, t.trans_date, tc.terminal_city,
             |    t.user_id AS client_id
             |  FROM txn t JOIN termcity tc ON t.terminal = tc.terminal_id),
             |rule4 AS (SELECT DISTINCT a.trans_id, a.client_id
             |  FROM city a JOIN city b ON a.card_num = b.card_num
             |  WHERE a.terminal_city <> b.terminal_city
             |    AND abs(CAST(floor(epoch(a.trans_date)) AS BIGINT)
             |          - CAST(floor(epoch(b.trans_date)) AS BIGINT)) <= 3600),
             |joined AS (SELECT r1.user_id AS client_id, r1.trans_id AS trans_id_start,
             |    r2.trans_id AS trans_id_20min, r2.amt AS amt_20min,
             |    r2.trans_date AS trans_date_20min, r2.oper_result
             |  FROM txn r1 JOIN txn r2 ON r2.user_id = r1.user_id
             |    AND r2.trans_date BETWEEN r1.trans_date AND r1.trans_date + INTERVAL 20 MINUTE),
             |win AS (SELECT *,
             |    row_number() OVER (PARTITION BY client_id, trans_id_start
             |      ORDER BY trans_date_20min ASC, trans_id_20min ASC) AS rn_datetime,
             |    count(*) OVER (PARTITION BY client_id, trans_id_start) AS cnt,
             |    max(CASE WHEN oper_result = 'SUCCESS' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY client_id, trans_id_start) AS has_success,
             |    max(CASE WHEN oper_result = 'REJECT' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY client_id, trans_id_start) AS has_reject
             |  FROM joined),
             |w4 AS (SELECT *, row_number() OVER (PARTITION BY client_id, trans_id_start
             |      ORDER BY amt_20min DESC, trans_id_20min ASC) AS rn_amt
             |  FROM win WHERE rn_datetime <= 4 AND cnt > 3 AND has_success = 1 AND has_reject = 1),
             |rule5 AS (SELECT client_id, trans_id_start AS trans_id FROM w4
             |  GROUP BY client_id, trans_id_start
             |  HAVING sum(CASE WHEN rn_amt = rn_datetime THEN 1 ELSE 0 END) = 4
             |    AND max(CASE WHEN rn_datetime = 1 THEN oper_result END) = 'REJECT'
             |    AND max(CASE WHEN rn_datetime = 2 THEN oper_result END) = 'REJECT'
             |    AND max(CASE WHEN rn_datetime = 3 THEN oper_result END) = 'REJECT'
             |    AND max(CASE WHEN rn_datetime = 4 THEN oper_result END) = 'SUCCESS')
             |SELECT t.trans_date AS event_dt, c.passport_num AS passport,
             |    c.first_name || ' ' || c.patrinymic || ' ' || c.last_name AS fio,
             |    c.phone AS phone,
             |    CASE WHEN b.passport_num IS NOT NULL THEN 'Заблокированный паспорт'
             |         WHEN c.passport_valid_to < t.trans_date THEN 'Просроченный паспорт'
             |         WHEN a.valid_to < t.trans_date THEN 'Недействующий договор'
             |         WHEN h.client_id IS NOT NULL THEN 'Транзакции из разных городов за короткое время'
             |         WHEN r5.client_id IS NOT NULL THEN 'Попытка перебора транзакций'
             |    END AS event_type,
             |    DATE '2024-02-01' AS report_dt
             |FROM txn t
             |LEFT JOIN accounts a ON a.account_num = t.card_num
             |LEFT JOIN clients c ON c.client_id = a.client
             |LEFT JOIN blacklist b ON c.passport_num = b.passport_num
             |LEFT JOIN rule4 h ON h.client_id = c.client_id AND t.trans_id = h.trans_id
             |LEFT JOIN rule5 r5 ON r5.client_id = c.client_id AND t.trans_id = r5.trans_id
             |WHERE b.passport_num IS NOT NULL OR c.passport_valid_to < t.trans_date
             |   OR a.valid_to < t.trans_date OR h.client_id IS NOT NULL
             |   OR r5.client_id IS NOT NULL""".stripMargin)),

    // --------------------- C9b: INCREMENTAL report mode (bounded scan)
    // Same world as c9 but compressed 10× instead of 200× so the
    // timeline spans THREE days (2024-01-01..03), materialized as a
    // load_dt-partitioned fact like Runner's fact_transactions. This
    // pins the CORE bounding property of incremental mode: rule inputs
    // scan only the {date-1, date} partitions (cross-city looks ≤ 1 h
    // either way, brute-force ≤ 20 min forward — every rule partner of
    // a day-D txn is in day D-1..D), report rows the date's own
    // partition. The oracle runs the FULL-scan formulation over all
    // three days and restricts the output to the date — a hash match
    // proves the bounded two-partition scan reproduces the full scan's
    // rows for that date exactly (VERDICT r2 #1). Runner's production
    // path ADDITIONALLY reports yesterday's late edge anti-joined
    // against yesterday's report — that layer (and the partition
    // pruning) is pinned by IncrementalReportSpec's cross-midnight
    // fixtures, not by this oracle.
    "c9b_fraud_pipeline_incremental" -> (((s: SparkSession, dir: String) => {
      import graft.report.FraudReport
      val ev = t(s, dir, "events")
      val txn = ev.select(
        col("user_id").as("card_num"),
        col("event_id").as("trans_id"),
        expr("timestamp_seconds(1704067200 + (unix_timestamp(ts) - 1704067200) div 10)")
          .as("trans_date"),
        col("value").cast(d182).as("amt"),
        when(col("event_type").isin("click", "view"), "SUCCESS")
          .otherwise("REJECT").as("oper_result"),
        ((col("user_id") + when(col("user_id") % 3 === 0, lit(0))
          .otherwise(col("event_id"))) % 20).as("terminal"))
        // the daily-feed contract: each drop holds its day's transactions
        .withColumn("load_dt", to_date(col("trans_date")))
      val scratch = scratchDir("graft_c9b", dir)
      // cluster by the partition column before the dynamic write (the
      // r18 staged-write rule): the un-repartitioned form wrote every
      // day leaf from the scan's single task
      txn.repartition(s.sessionState.conf.numShufflePartitions,
          col("load_dt"))
        .write.mode("overwrite").partitionBy("load_dt")
        .parquet(scratch.resolve("fact").toString)
      val fact = s.read.parquet(scratch.resolve("fact").toString)
      val d = java.sql.Date.valueOf("2024-01-03")
      val ruleTxn = fact.filter(col("load_dt").between(date_sub(lit(d), 1), lit(d)))
      val baseTxn = fact.filter(col("load_dt") === lit(d))
      val users = ev.select(col("user_id")).distinct()
        .localCheckpoint(true) // feeds 4 dims + the blacklist (r18 opt)
      val cards = users.select(col("user_id").as("card_num"),
        col("user_id").as("account_num"), lit(false).as("deleted_flg"))
      val accounts = users.select(col("user_id").as("account_num"),
        col("user_id").as("client"),
        when(col("user_id") % 13 === 0, lit(java.sql.Date.valueOf("2020-01-01")))
          .otherwise(lit(java.sql.Date.valueOf("3000-01-01"))).as("valid_to"),
        lit(false).as("deleted_flg"))
      val clients = users.select(col("user_id").as("client_id"),
        concat(lit("F"), col("user_id")).as("first_name"),
        concat(lit("M"), col("user_id")).as("patrinymic"),
        concat(lit("L"), col("user_id")).as("last_name"),
        concat(lit("P"), col("user_id")).as("passport_num"),
        when(col("user_id") % 11 === 0, lit(java.sql.Date.valueOf("2020-01-01")))
          .otherwise(lit(java.sql.Date.valueOf("3000-01-01"))).as("passport_valid_to"),
        concat(lit("+7"), col("user_id")).as("phone"),
        lit(false).as("deleted_flg"))
      // terminal dim off the MATERIALIZED fact (same rows/column as the
      // pre-write frame — the write is 1:1), not a fresh events scan
      val terminals = fact.select(col("terminal").as("terminal_id")).distinct()
        .select(col("terminal_id"),
          concat(lit("C"), col("terminal_id") % 7).as("terminal_city"),
          lit(false).as("deleted_flg"))
      val blacklist = users.filter(col("user_id") % 17 === 0)
        .select(concat(lit("P"), col("user_id")).as("passport_num"))
      val withClient = FraudRules.txnWithClient(ruleTxn, cards, accounts, clients)
        .localCheckpoint(true) // feeds BOTH rules — flatten once (r18 opt)
      val rule4 = FraudRules.crossCityRule(
        FraudRules.cityOfTransactions(withClient, terminals))
      val rule5 = FraudRules.bruteForceRule(withClient)
      FraudReport.assemble(baseTxn, cards, accounts, clients, blacklist,
        rule4, rule5, java.sql.Date.valueOf("2024-02-01"))
    }),
      Some("""WITH txn AS (SELECT user_id AS card_num, event_id AS trans_id,
             |    TIMESTAMP '2024-01-01 00:00:00' + INTERVAL
             |      ((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 10) SECOND AS trans_date,
             |    CAST(value AS DECIMAL(18,2)) AS amt,
             |    CASE WHEN event_type IN ('click','view') THEN 'SUCCESS' ELSE 'REJECT' END AS oper_result,
             |    (user_id + CASE WHEN user_id % 3 = 0 THEN 0 ELSE event_id END) % 20 AS terminal,
             |    user_id
             |  FROM events),
             |users AS (SELECT DISTINCT user_id FROM events),
             |clients AS (SELECT user_id AS client_id,
             |    'F' || CAST(user_id AS VARCHAR) AS first_name,
             |    'M' || CAST(user_id AS VARCHAR) AS patrinymic,
             |    'L' || CAST(user_id AS VARCHAR) AS last_name,
             |    'P' || CAST(user_id AS VARCHAR) AS passport_num,
             |    CASE WHEN user_id % 11 = 0 THEN DATE '2020-01-01' ELSE DATE '3000-01-01' END AS passport_valid_to,
             |    '+7' || CAST(user_id AS VARCHAR) AS phone
             |  FROM users),
             |accounts AS (SELECT user_id AS account_num, user_id AS client,
             |    CASE WHEN user_id % 13 = 0 THEN DATE '2020-01-01' ELSE DATE '3000-01-01' END AS valid_to
             |  FROM users),
             |termcity AS (SELECT terminal_id, 'C' || CAST(terminal_id % 7 AS VARCHAR) AS terminal_city
             |  FROM (SELECT DISTINCT terminal AS terminal_id FROM txn)),
             |blacklist AS (SELECT 'P' || CAST(user_id AS VARCHAR) AS passport_num
             |  FROM users WHERE user_id % 17 = 0),
             |city AS (SELECT t.card_num, t.trans_id, t.trans_date, tc.terminal_city,
             |    t.user_id AS client_id
             |  FROM txn t JOIN termcity tc ON t.terminal = tc.terminal_id),
             |rule4 AS (SELECT DISTINCT a.trans_id, a.client_id
             |  FROM city a JOIN city b ON a.card_num = b.card_num
             |  WHERE a.terminal_city <> b.terminal_city
             |    AND abs(CAST(floor(epoch(a.trans_date)) AS BIGINT)
             |          - CAST(floor(epoch(b.trans_date)) AS BIGINT)) <= 3600),
             |joined AS (SELECT r1.user_id AS client_id, r1.trans_id AS trans_id_start,
             |    r2.trans_id AS trans_id_20min, r2.amt AS amt_20min,
             |    r2.trans_date AS trans_date_20min, r2.oper_result
             |  FROM txn r1 JOIN txn r2 ON r2.user_id = r1.user_id
             |    AND r2.trans_date BETWEEN r1.trans_date AND r1.trans_date + INTERVAL 20 MINUTE),
             |win AS (SELECT *,
             |    row_number() OVER (PARTITION BY client_id, trans_id_start
             |      ORDER BY trans_date_20min ASC, trans_id_20min ASC) AS rn_datetime,
             |    count(*) OVER (PARTITION BY client_id, trans_id_start) AS cnt,
             |    max(CASE WHEN oper_result = 'SUCCESS' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY client_id, trans_id_start) AS has_success,
             |    max(CASE WHEN oper_result = 'REJECT' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY client_id, trans_id_start) AS has_reject
             |  FROM joined),
             |w4 AS (SELECT *, row_number() OVER (PARTITION BY client_id, trans_id_start
             |      ORDER BY amt_20min DESC, trans_id_20min ASC) AS rn_amt
             |  FROM win WHERE rn_datetime <= 4 AND cnt > 3 AND has_success = 1 AND has_reject = 1),
             |rule5 AS (SELECT client_id, trans_id_start AS trans_id FROM w4
             |  GROUP BY client_id, trans_id_start
             |  HAVING sum(CASE WHEN rn_amt = rn_datetime THEN 1 ELSE 0 END) = 4
             |    AND max(CASE WHEN rn_datetime = 1 THEN oper_result END) = 'REJECT'
             |    AND max(CASE WHEN rn_datetime = 2 THEN oper_result END) = 'REJECT'
             |    AND max(CASE WHEN rn_datetime = 3 THEN oper_result END) = 'REJECT'
             |    AND max(CASE WHEN rn_datetime = 4 THEN oper_result END) = 'SUCCESS')
             |SELECT t.trans_date AS event_dt, c.passport_num AS passport,
             |    c.first_name || ' ' || c.patrinymic || ' ' || c.last_name AS fio,
             |    c.phone AS phone,
             |    CASE WHEN b.passport_num IS NOT NULL THEN 'Заблокированный паспорт'
             |         WHEN c.passport_valid_to < t.trans_date THEN 'Просроченный паспорт'
             |         WHEN a.valid_to < t.trans_date THEN 'Недействующий договор'
             |         WHEN h.client_id IS NOT NULL THEN 'Транзакции из разных городов за короткое время'
             |         WHEN r5.client_id IS NOT NULL THEN 'Попытка перебора транзакций'
             |    END AS event_type,
             |    DATE '2024-02-01' AS report_dt
             |FROM txn t
             |LEFT JOIN accounts a ON a.account_num = t.card_num
             |LEFT JOIN clients c ON c.client_id = a.client
             |LEFT JOIN blacklist b ON c.passport_num = b.passport_num
             |LEFT JOIN rule4 h ON h.client_id = c.client_id AND t.trans_id = h.trans_id
             |LEFT JOIN rule5 r5 ON r5.client_id = c.client_id AND t.trans_id = r5.trans_id
             |WHERE (b.passport_num IS NOT NULL OR c.passport_valid_to < t.trans_date
             |   OR a.valid_to < t.trans_date OR h.client_id IS NOT NULL
             |   OR r5.client_id IS NOT NULL)
             |  AND t.trans_date >= TIMESTAMP '2024-01-03 00:00:00'""".stripMargin)),

    // ================================================== scale extensions

    // ------------------------------------------------------- exact dedup
    "x_dedup_exact" -> (((s: SparkSession, dir: String) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")),
      Some("""SELECT md5(text) AS content_hash, count(*) AS dup_cnt,
             |  min(doc_id) AS keep_id
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // ------------------------------------------ normalized exact dedup
    // The canonicalization pass before exact hashing (case /
    // punctuation / whitespace variants of one sentence must collide):
    // lower → strip [[:punct:]] → collapse \s+ → trim, then the same
    // md5-groupBy as x_dedup_exact. Both engines run the identical
    // portable regex chain (DuckDB needs the 'g' flag; Spark replaces
    // globally by default).
    "x_dedup_normalized" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      Dedup.exact(docs.withColumn("text", Dedup.normalized(col("text"))),
        "doc_id", "text")
    }),
      Some("""WITH n AS (SELECT doc_id,
             |    trim(regexp_replace(regexp_replace(lower(text),
             |      '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS ntext
             |  FROM documents)
             |SELECT md5(ntext) AS content_hash, count(*) AS dup_cnt,
             |  min(doc_id) AS keep_id
             |FROM n GROUP BY md5(ntext)""".stripMargin)),

    // ----------------------------------------------- n-gram Jaccard dedup
    "x_dedup_ngram_jaccard" -> (((s: SparkSession, dir: String) =>
      Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.1, maxDocFreq = 1000)),
      Some(s"""WITH $trigramCte,
             |keep AS (SELECT shingle FROM tri GROUP BY shingle HAVING count(*) <= 1000),
             |f AS (SELECT tri.doc_id, tri.shingle FROM tri JOIN keep USING (shingle)),
             |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, common,
             |  CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
             |FROM pairs JOIN sizes sa ON sa.doc_id = id_a
             |JOIN sizes sb ON sb.doc_id = id_b
             |WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.1""".stripMargin)),

    // ----------------------------- exact set-similarity join (prefix filter)
    // The lossless counterpart to the LSH/maxDocFreq near-dup paths:
    // prefix filtering explodes only each doc's rarest ⌈(1−t)·|doc|⌉+1
    // shingles, and the oracle is the ALL-pairs exact Jaccard — so the
    // gate proves the pruning drops nothing at this threshold. t=0.8 is
    // the operator's design regime (short rare-token prefixes); at
    // loose thresholds the prefix covers most of each doc and the
    // candidate set degenerates toward all-pairs — use ngramJaccard's
    // aggregate-count formulation there instead.
    "x_setjoin_prefix" -> (((s: SparkSession, dir: String) =>
      SetJoin.prefixJaccardJoin(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.8)),
      Some(s"""WITH ${trigramPairsSql(0.8)}
             |SELECT id_a, id_b, common, jaccard FROM pairs""".stripMargin)),

    // ----------------------------- exact containment join (quote/subset)
    // The directed |A∩B|/|A| ≥ t join Jaccard structurally misses (a
    // short quote inside a long page). Probe-side prefix filtering
    // only — the index side explodes fully, the asymmetric cost model
    // of quote detection. The oracle is the ALL-pairs exact directed
    // containment, so the gate proves the probe prefix lossless.
    "x_setjoin_containment" -> (((s: SparkSession, dir: String) =>
      SetJoin.prefixContainmentJoin(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minContainment = 0.8)),
      Some(s"""WITH $trigramCte,
             |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(count(*) AS BIGINT) AS common
             |  FROM tri a JOIN tri b ON a.shingle = b.shingle
             |    AND a.doc_id <> b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, common,
             |  CAST(floor(1000000.0 * common / sa.n_sh) AS BIGINT)
             |    AS containment_e6
             |FROM p0 JOIN sizes sa ON sa.doc_id = id_a
             |WHERE CAST(common AS DOUBLE) >= 0.8 * sa.n_sh - 1e-9""".stripMargin)),

    // -------------------------------------- benchmark decontamination
    // Training-corpus × benchmark n-gram overlap (the leakage check run
    // before an eval set is trusted). The benchmark is synthesized as
    // the first 12 tokens of every 20th document under remapped ids, so
    // every item is contained in its source doc (bench_overlap 1.0
    // there) and near-dup family members surface below it. DuckDB
    // rebuilds both trigram sets and the asymmetric overlap.
    "x_contamination" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000).as("bench_id"),
          concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 12)).as("text"))
      Dedup.crossContamination(docs, "doc_id", "text",
        bench, "bench_id", "text", n = 3, minOverlap = 0.5, maxDocFreq = 1000)
    }),
      Some(s"""WITH $trigramCte,
             |keep AS (SELECT shingle FROM tri GROUP BY shingle HAVING count(*) <= 1000),
             |f AS (SELECT tri.doc_id, tri.shingle FROM tri JOIN keep USING (shingle)),
             |bsrc AS (SELECT doc_id + 100000 AS bench_id,
             |    array_to_string(string_split(text, ' ')[1:12], ' ') AS text
             |  FROM documents WHERE doc_id % 20 = 0),
             |bsplits AS (SELECT bench_id, string_split(text, ' ') AS l FROM bsrc),
             |btoks AS (SELECT bench_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM bsplits),
             |btri AS (SELECT DISTINCT bench_id,
             |    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
             |  FROM btoks WINDOW w AS (PARTITION BY bench_id ORDER BY pos)
             |  QUALIFY lead(tok, 2) OVER w IS NOT NULL),
             |bsizes AS (SELECT bench_id, count(*) AS n_sh FROM btri GROUP BY bench_id),
             |p AS (SELECT f.doc_id AS corpus_id, b.bench_id, count(*) AS common
             |  FROM btri b JOIN f ON b.shingle = f.shingle GROUP BY 1, 2)
             |SELECT corpus_id, bench_id, common,
             |  CAST(common AS DOUBLE) / bs.n_sh AS bench_overlap
             |FROM p JOIN bsizes bs USING (bench_id)
             |WHERE CAST(common AS DOUBLE) / bs.n_sh >= 0.5""".stripMargin)),

    // ------------------------------------------------------- MinHash LSH
    // LSH banding finds the candidates; the exact 3-gram Jaccard is then
    // recomputed per candidate pair, so the oracle (exact pairs ≥ 0.5,
    // same formulation as x_dedup_ngram_jaccard) verifies BOTH that the
    // banding recalls every true pair at this threshold AND that the
    // MinHash estimate is within 0.3 of the exact value. The corpus is
    // bimodal (true pairs ≳ 0.9, next pair ≤ 0.07), so 0.5 sits in the
    // gap; at j ≥ 0.9 the per-pair miss probability of 8 bands × 2 rows
    // is (1-j²)^8 ≈ 2e-6 — and the seeded hashes make it deterministic.
    "x_dedup_minhash_lsh" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      // shingled ONCE (r18 opt): both sides of the verify join consume
      // this frame — lazy, each re-shingled the whole corpus
      // pinned fan-out (r19): the documents scan is one row group, so
      // the shingle pass serialized on one task (QueryProbe: 0.8 s
      // single-task checkpoint stage); session width, not a constant
      val sh = docs.select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .localCheckpoint(true)
      val common = size(array_intersect(col("sh_a"), col("sh_b")))
      val jac = common.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - common)
      Dedup.minhashLsh(docs, "doc_id", "text")
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .filter(jac >= 0.5)
        .select(col("id_a"), col("id_b"), common.as("common"),
          floor(jac * 10000).cast("long").as("jaccard_e4"),
          (abs(col("est_jaccard") - jac) <= 0.3).as("est_ok"))
    }),
      Some(s"""WITH ${trigramPairsSql(0.5)}
             |SELECT id_a, id_b, CAST(common AS INTEGER) AS common,
             |  CAST(floor(jaccard * 10000) AS BIGINT) AS jaccard_e4,
             |  TRUE AS est_ok
             |FROM pairs""".stripMargin)),

    // -------------------------------------- incremental LSH (persisted index)
    // The O(batch)-per-day dedup path: the 90% "existing corpus" builds a
    // persisted band index (TableCatalog round trip through scratch
    // parquet — the real at-rest form), then the 10% "new batch" joins
    // against it WITHOUT re-shingling the corpus. Candidates are filtered
    // to exact 3-gram Jaccard ≥ 0.5 in-plan, so the oracle — exact
    // trigram pairs restricted to pairs touching a new doc — proves (a)
    // recall of every new-touching pair through the index path, (b) zero
    // old-old leakage, (c) the pair_type labeling, (d) the MinHash
    // estimate bound. Same bimodal-corpus argument as x_dedup_minhash_lsh.
    "x_dedup_incremental" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val scratch = scratchDir("graft_lshidx", dir)
      val cat = new TableCatalog(s, scratch.toString)
      cat.overwrite("lsh_index", Dedup.lshIndex(corpus, "doc_id", "text"))
      val cand = Dedup.incrementalPairs(cat.read("lsh_index"), batch,
        "doc_id", "text")
      // shingled ONCE (r18 opt): both sides of the verify join consume
      // this frame — lazy, each re-shingled the whole corpus
      // pinned fan-out (r19): the documents scan is one row group, so
      // the shingle pass serialized on one task (QueryProbe: 0.8 s
      // single-task checkpoint stage); session width, not a constant
      val sh = docs.select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .localCheckpoint(true)
      val common = size(array_intersect(col("sh_a"), col("sh_b")))
      val jac = common.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - common)
      cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .filter(jac >= 0.5)
        .select(col("id_a"), col("id_b"), common.as("common"),
          floor(jac * 10000).cast("long").as("jaccard_e4"),
          col("pair_type"),
          (abs(col("est_jaccard") - jac) <= 0.3).as("est_ok"))
    }),
      Some(s"""WITH ${trigramPairsSql(0.5)}
             |SELECT id_a, id_b, CAST(common AS INTEGER) AS common,
             |  CAST(floor(jaccard * 10000) AS BIGINT) AS jaccard_e4,
             |  CASE WHEN id_a % 10 = 0 AND id_b % 10 = 0 THEN 'new_new'
             |       ELSE 'new_old' END AS pair_type,
             |  TRUE AS est_ok
             |FROM pairs
             |WHERE id_a % 10 = 0 OR id_b % 10 = 0""".stripMargin)),

    // ---------------------------------------------------------- SimHash
    // Fingerprints use the engine-portable token hash (two polynomial
    // folds — Dedup.portableTokenHash) precisely so DuckDB can recompute
    // them and do the exact ALL-PAIRS hamming join: the oracle therefore
    // proves the chunk-bucketed candidate generation recalls every pair
    // at the requested threshold (the round-1 recall bug class).
    "x_dedup_simhash" -> (((s: SparkSession, dir: String) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, tokenHasher = Dedup.portableTokenHash)),
      Some(s"""WITH toks AS (SELECT DISTINCT doc_id, tok FROM
             |    (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents)
             |    WHERE tok <> ''),
             |th AS (SELECT doc_id,
             |    ${portableHashSql("tok")} AS h
             |  FROM toks),
             |bits AS (SELECT doc_id, b,
             |    CASE WHEN sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
             |      THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END AS bitval
             |  FROM th CROSS JOIN generate_series(0, 61) t(b)
             |  GROUP BY doc_id, b),
             |fp AS (SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS fp FROM bits GROUP BY doc_id)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
             |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin)),

    // ------------------------------------------- near-dup components
    // Pairs → clusters → canonical doc: GraphX connected components over
    // the exact-Jaccard ≥ 0.5 pair graph, checked against a DuckDB
    // recursive-CTE transitive closure (min reachable id ≡ Pregel CC
    // label). `kept` marks the canonical survivor per cluster — the
    // decision dedupCorpus applies to the corpus.
    "x_dedup_components" -> (((s: SparkSession, dir: String) => {
      val pairs = Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = 1000)
      Dedup.components(pairs)
        .select(col("doc_id"), col("comp"),
          (col("doc_id") === col("comp")).as("kept"))
    }),
      Some(s"""WITH RECURSIVE ${trigramPairsSql(0.5)},
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |reach AS (SELECT id AS a, id AS b FROM nodes
             |  UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b)
             |SELECT a AS doc_id, min(b) AS comp, (a = min(b)) AS kept
             |FROM reach GROUP BY a""".stripMargin)),

    // ---------------------------------------- near-dup cluster quality
    // Audit surface for the dedup caps: per near-dup cluster, its size,
    // edge count, the weakest in-cluster similarity, the mean similarity,
    // and the edge density. A cluster with low min-jaccard or low density
    // is a chain of pairwise matches gluing genuinely-different docs
    // together (the transitive-closure failure mode every LSH pipeline
    // must watch); this is the signal that tunes minJaccard/caps before
    // a 100 TB run deletes the wrong documents. All similarity stats are
    // exact int64 e4 fixed-point (per-pair floor, integer sums/divides),
    // so the oracle comparison is at value level with no float-order
    // sensitivity.
    "x_cluster_quality" -> (((s: SparkSession, dir: String) => {
      import graft.ops.intDiv
      // pinned: both the component loop and the edge-stats aggregation
      // consume `pairs`, and the inverted-index pair generation is the
      // expensive part — same single-materialization rule as
      // Dedup.components' internal projection
      val pairs = Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = 1000).localCheckpoint(true)
      val comp = Dedup.components(pairs)
      val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("csize"))
      val e4 = floor(col("jaccard") * 10000).cast("long")
      val edges = pairs
        .join(comp.select(col("doc_id").as("id_a"), col("comp")), Seq("id_a"))
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_edges"), min(e4).as("min_jaccard_e4"),
          sum(e4).as("sum_e4"))
      sizes.join(edges, Seq("comp"))
        .select(col("comp"), col("csize"), col("n_edges"),
          col("min_jaccard_e4"),
          intDiv(col("sum_e4"), col("n_edges")).as("avg_jaccard_e4"),
          intDiv(lit(20000L) * col("n_edges"),
            col("csize") * (col("csize") - 1)).as("density_e4"))
    }),
      Some(s"""WITH RECURSIVE ${trigramPairsSql(0.5)},
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |reach AS (SELECT id AS a, id AS b FROM nodes
             |  UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
             |comp AS (SELECT a AS doc_id, min(b) AS comp FROM reach GROUP BY a),
             |cl_sizes AS (SELECT comp, count(*) AS csize FROM comp GROUP BY comp),
             |es AS (SELECT c.comp, count(*) AS n_edges,
             |    min(CAST(floor(jaccard * 10000) AS BIGINT)) AS min_jaccard_e4,
             |    CAST(sum(CAST(floor(jaccard * 10000) AS BIGINT)) AS BIGINT)
             |      AS sum_e4
             |  FROM pairs p JOIN comp c ON p.id_a = c.doc_id
             |  GROUP BY c.comp)
             |SELECT s.comp, s.csize, e.n_edges, e.min_jaccard_e4,
             |  e.sum_e4 // e.n_edges AS avg_jaccard_e4,
             |  (20000 * e.n_edges) // (s.csize * (s.csize - 1)) AS density_e4
             |FROM cl_sizes s JOIN es e USING (comp)""".stripMargin)),

    // --------------------------------------------- ROUGE-N pair metrics
    // Clipped word-bigram overlap (ROUGE-2 P/R/F1, Lin ACL'04 WS) over
    // the near-dup candidate pairs: jaccard says THAT two docs overlap,
    // ROUGE's clipped counts say how much of each side is covered —
    // the asymmetric view that separates "truncated copy" from "shared
    // boilerplate". Everything integer (clipped-multiset sums, e4
    // integer divisions; F1 = 2·ov/(n_ref+n_cand) exactly), so the
    // oracle replays the metric term by term over the same pair set.
    "x_rouge" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = 1000)
      TextAnalysis.rougeN(docs, "doc_id", "text", pairs, n = 2)
    }),
      Some(s"""WITH ${trigramPairsSql(0.5)},
             |rtoks AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents),
             |gcnt AS (SELECT doc_id, gram, count(*) AS c FROM (
             |    SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS gram
             |    FROM rtoks, UNNEST(generate_series(1, len(tk) - 1)) AS u(i))
             |  GROUP BY doc_id, gram),
             |tot AS (SELECT doc_id,
             |    CAST(greatest(len(tk) - 1, 0) AS BIGINT) AS ng FROM rtoks),
             |ov AS (SELECT p.id_a, p.id_b,
             |    CAST(sum(least(a.c, b.c)) AS BIGINT) AS overlap
             |  FROM pairs p
             |  JOIN gcnt a ON a.doc_id = p.id_a
             |  JOIN gcnt b ON b.doc_id = p.id_b AND b.gram = a.gram
             |  GROUP BY 1, 2)
             |SELECT p.id_a, p.id_b, coalesce(o.overlap, 0) AS overlap,
             |  ta.ng AS n_ref, tb.ng AS n_cand,
             |  CASE WHEN tb.ng > 0
             |    THEN (coalesce(o.overlap, 0) * 10000) // tb.ng
             |    ELSE 0 END AS rouge_p_e4,
             |  CASE WHEN ta.ng > 0
             |    THEN (coalesce(o.overlap, 0) * 10000) // ta.ng
             |    ELSE 0 END AS rouge_r_e4,
             |  CASE WHEN ta.ng + tb.ng > 0
             |    THEN (coalesce(o.overlap, 0) * 20000) // (ta.ng + tb.ng)
             |    ELSE 0 END AS rouge_f1_e4
             |FROM pairs p
             |LEFT JOIN ov o ON o.id_a = p.id_a AND o.id_b = p.id_b
             |JOIN tot ta ON ta.doc_id = p.id_a
             |JOIN tot tb ON tb.doc_id = p.id_b""".stripMargin)),

    // ------------------------------------------- deduplicated corpus
    // The end product of the dedup family: the corpus minus every
    // non-canonical member of a near-dup component (exact-Jaccard ≥ 0.5
    // pairs → GraphX components → anti-join). Oracle drops the same ids
    // via the recursive closure.
    "x_dedup_corpus" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = 1000)
      Dedup.dedupCorpus(docs, "doc_id", pairs)
        .select(col("doc_id"), col("n_chars"))
    }),
      Some(s"""WITH RECURSIVE ${trigramPairsSql(0.5)},
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |reach AS (SELECT id AS a, id AS b FROM nodes
             |  UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
             |dropped AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING a <> min(b))
             |SELECT doc_id, n_chars FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin)),

    // ------------------------------ quality-aware canonical selection
    // Same components as x_dedup_corpus, but the survivor of each
    // near-dup cluster is the LONGEST member (n_chars desc, id asc on
    // ties) instead of the minimum id — the curation-grade rule
    // (duplicate clusters hold one full doc plus truncated copies; the
    // judge is which member survives, so a drift in the ranking flips
    // rows and fails the hash).
    "x_dedup_canonical" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = 1000)
      Dedup.dedupCorpusBy(docs, "doc_id", pairs, col("n_chars"))
        .select(col("doc_id"), col("n_chars"))
    }),
      Some(s"""WITH RECURSIVE ${trigramPairsSql(0.5)},
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |reach AS (SELECT id AS a, id AS b FROM nodes
             |  UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
             |comp AS (SELECT a AS doc_id, min(b) AS comp FROM reach GROUP BY a),
             |ranked AS (SELECT c.doc_id, row_number() OVER
             |    (PARTITION BY c.comp ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
             |  FROM comp c JOIN documents d USING (doc_id)),
             |dropped AS (SELECT doc_id FROM ranked WHERE rn > 1)
             |SELECT doc_id, n_chars FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin)),

    // ------------------------------- corpus curation pipeline END TO END
    // The c9 of the extension surface: near-dup dedup (exact-Jaccard
    // pairs → connected components → canonical survivors) → per-language
    // rebalancing (hash cap at 100) → deterministic train/val/test
    // splits → per-(lang, split) doc and token counts. One composite
    // oracle replays the whole chain — closure, hash caps, split
    // thresholds, token counts — so a drift in ANY stage moves the
    // final aggregates and fails the hash.
    "x_curation_pipeline" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = 1000)
      val deduped = Dedup.dedupCorpus(docs, "doc_id", pairs)
      val balanced = graft.ops.Splits.capPerGroup(deduped, "doc_id", "lang", cap = 100L)
      graft.ops.Splits.assignSplit(balanced, "doc_id")
        .select(col("lang"), col("split"),
          TextAnalysis.tokenCount(col("text")).as("nt"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    }),
      Some(s"""WITH RECURSIVE ${trigramPairsSql(0.5)},
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |reach AS (SELECT id AS a, id AS b FROM nodes
             |  UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
             |dropped AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING a <> min(b)),
             |kept AS (SELECT doc_id, lang, text FROM documents
             |  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
             |h AS (SELECT doc_id, lang, text,
             |    ${portableHashSql("CAST(doc_id AS VARCHAR)")} % 10000 AS bucket
             |  FROM kept),
             |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS grp_n FROM kept GROUP BY lang),
             |bal AS (SELECT h.doc_id, h.lang, h.text, h.bucket FROM h
             |  JOIN n ON h.lang = n.lang WHERE bucket * grp_n < 100 * 10000),
             |sp AS (SELECT lang, text,
             |    CASE WHEN bucket < 8000 THEN 'train'
             |         WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
             |  FROM bal)
             |SELECT lang, split, count(*) AS n_docs,
             |  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
             |FROM sp GROUP BY lang, split""".stripMargin)),

    // ------------------------------------------------- rollup (cube family)
    // Hierarchical subtotals in ONE pass — Spark expands the rollup into
    // grouping sets inside a single aggregate (partial map-side combine
    // included), where the naive formulation is three scans + a union.
    // Rolled-up levels surface NULLs, which hash ambiguously against
    // genuine NULL data — the standard disambiguation (grouping() bits +
    // a sentinel label) is applied on BOTH sides; gid is computed from
    // explicit grouping() bits because engines differ in grouping_id
    // conventions.
    "x_rollup" -> (((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice"))).as("sum_cents"),
          // grouping() is only resolvable INSIDE the rollup aggregate
          (grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).cast("long").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("n"), col("sum_cents"))
    }),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
             |  count(*) AS n,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    // --------------------------------------------------------- pivot
    // Wide-format counts per user over the CLOSED event-type domain —
    // pivot with an explicit value list stays one aggregate pass with
    // deterministic output columns (an unlisted-values pivot would need
    // a distinct-scan first and column order would depend on data).
    // Missing combinations fill 0 to match the oracle's conditional
    // counts.
    "x_pivot" -> (((s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id""".stripMargin)),

    // --------------------------------------------------- cube subtotals
    // The full 2^d grouping-set lattice in one aggregate pass — same
    // sentinel/grouping-bit discipline as x_rollup, one more level
    // (the ls-only subtotal rollup doesn't produce).
    "x_cube" -> (((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem")
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice"))).as("sum_cents"),
          (grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).cast("long").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("n"), col("sum_cents"))
    }),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
             |  count(*) AS n,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM lineitem
             |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)),

    // ----------------------------------------- weighted sampling (kept set)
    // Deterministic per-row weighted keep: probability least(n_chars,
    // 500)/500 decided by the portable hash bucket — DuckDB replays the
    // hash and the integer cross-multiplication, so the kept ROW SET
    // must match exactly (rand()-based sampling could verify only
    // counts).
    "x_sample_weighted" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars").cast("long").as("n_chars"),
        least(col("n_chars").cast("long"), lit(500L)).as("w_num"))
      graft.ops.Splits.sampleByWeight(docs, "doc_id", "w_num", weightDen = 500L)
    }),
      Some(s"""WITH h AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             |    least(CAST(n_chars AS BIGINT), 500) AS w_num,
             |    ${portableHashSql("CAST(doc_id AS VARCHAR)")} % 10000 AS bucket
             |  FROM documents)
             |SELECT doc_id, n_chars, w_num FROM h
             |WHERE bucket * 500 < w_num * 10000""".stripMargin)),

    // ------------------------------------- winsorization (outlier clipping)
    // Per-language IQR clipping (p25/p75) of token counts — the
    // robust-stats prep step before scale-sensitive features. QUARTER
    // positions on purpose: interpolated quantiles of integer counts at
    // .25/.5/.75 are exactly representable doubles (the
    // x_quality_percentile precedent), where an 0.05 position's
    // interpolation could differ by an ulp between Spark's and DuckDB's
    // lerp forms and flip the floor. Clipped value floor-scaled on both
    // sides.
    "x_winsorize" -> (((s: SparkSession, dir: String) => {
      val q = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      // routed through the bounded exact-percentile op (r17 — the last
      // stock-percentile call site): smallThreshold = 0 pins the scale
      // path at every gate SF, the x_quality_percentile precedent
      val stats = graft.ops.Quantiles.percentilesCont(q, "lang",
        "n_tokens", Seq(("p25", 1L, 4L), ("p75", 3L, 4L)),
        smallThreshold = 0L)
      q.join(broadcast(stats), "lang")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          floor(greatest(least(col("n_tokens").cast("double"), col("p75")),
            col("p25")) * 100).cast("long").as("clipped_c"))
    }),
      Some("""WITH q AS (SELECT doc_id, lang,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |st AS (SELECT lang, quantile_cont(n_tokens, 0.25) AS p25,
             |    quantile_cont(n_tokens, 0.75) AS p75
             |  FROM q GROUP BY lang)
             |SELECT doc_id, q.lang, n_tokens,
             |  CAST(floor(greatest(least(CAST(n_tokens AS DOUBLE), p75), p25) * 100)
             |    AS BIGINT) AS clipped_c
             |FROM q JOIN st ON q.lang = st.lang""".stripMargin)),

    // ---------------------------------------------------- fuzzy join
    // Edit-distance record linkage: a deterministically-corrupted "dirty
    // feed" (every third part, one character deleted at a key-derived
    // position) is linked back to the distinct part-name catalog within
    // levenshtein <= 1. The oracle is the NAIVE ALL-PAIRS join — a hash
    // match proves the deletion-neighborhood blocking misses no pair.
    "x_fuzzy_join" -> (((s: SparkSession, dir: String) => {
      val part = t(s, dir, "part")
      val catalog = part.groupBy(col("p_name").as("cat_name"))
        .agg(min(col("p_partkey")).as("cat_id"))
      val feed = part.filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("feed_id"),
          expr("concat(substring(p_name, 1, cast(p_partkey % length(p_name) as int)), " +
            "substring(p_name, cast(p_partkey % length(p_name) as int) + 2))")
            .as("feed_name"))
      FuzzyJoin.join(feed, "feed_id", "feed_name",
        catalog, "cat_id", "cat_name", maxDist = 1)
    }),
      Some("""WITH catalog AS (
             |  SELECT p_name AS cat_name, min(p_partkey) AS cat_id
             |  FROM part GROUP BY p_name),
             |feed AS (SELECT p_partkey AS feed_id,
             |    substring(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER)) ||
             |    substring(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2) AS feed_name
             |  FROM part WHERE p_partkey % 3 = 0)
             |SELECT f.feed_id, f.feed_name, c.cat_id, c.cat_name,
             |  CAST(levenshtein(f.feed_name, c.cat_name) AS BIGINT) AS dist
             |FROM feed f JOIN catalog c
             |  ON levenshtein(f.feed_name, c.cat_name) <= 1""".stripMargin)),

    // ---------------------------- Fellegi-Sunter record linkage
    // Blocked probabilistic linkage of the customer table against a
    // deterministically perturbed copy (upper-cased names, truncated
    // addresses, scrambled segments on fixed key residues — both
    // engines build the same dirty copy). Blocking on (nation, balance
    // bucket); integer agreement weights; the two-threshold decision
    // keeps all three classes (match / possible / non_match) visible.
    "x_record_linkage" -> (((s: SparkSession, dir: String) => {
      // phone/email are SYNTHESIZED deterministically (the driver's
      // customer table carries no contact columns) and then perturbed
      // on fixed key residues — both engines build the same dirty copy
      val a = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("cid"), col("c_name").as("name"),
        concat(lit("555-"), (col("c_custkey") % 10000).cast("string"))
          .as("phone"),
        concat(lower(col("c_mktsegment")), lit("-"),
          col("c_custkey").cast("string"), lit("@ex.com")).as("email"),
        col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("long").as("nk"),
        floor(col("c_acctbal") / 100.0d).cast("long").as("balb"))
      val b = a
        .withColumn("name",
          when(col("cid") % 3 === 0, upper(col("name"))).otherwise(col("name")))
        .withColumn("phone",
          when(col("cid") % 11 === 0, lit("555-0000")).otherwise(col("phone")))
        .withColumn("email",
          when(col("cid") % 13 === 0, lit(null).cast("string"))
            .otherwise(col("email")))
        .withColumn("seg",
          when(col("cid") % 7 === 0, lit("UNKNOWN")).otherwise(col("seg")))
      FuzzyJoin.linkage(a, "cid", b, "cid", Seq("nk", "balb"),
        Seq(("name", 24L, -8L), ("phone", 30L, -10L), ("email", 20L, -6L),
          ("seg", 5L, -5L)),
        upper = 40L, lower = 0L)
    }),
      Some("""WITH a AS (SELECT CAST(c_custkey AS BIGINT) AS cid,
             |    c_name AS name,
             |    '555-' || CAST(c_custkey % 10000 AS VARCHAR) AS phone,
             |    lower(c_mktsegment) || '-' || CAST(c_custkey AS VARCHAR)
             |      || '@ex.com' AS email,
             |    c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nk,
             |    CAST(floor(c_acctbal / 100.0) AS BIGINT) AS balb
             |  FROM customer),
             |b AS (SELECT cid,
             |    CASE WHEN cid % 3 = 0 THEN upper(name) ELSE name END AS name,
             |    CASE WHEN cid % 11 = 0 THEN '555-0000' ELSE phone END AS phone,
             |    CASE WHEN cid % 13 = 0 THEN NULL ELSE email END AS email,
             |    CASE WHEN cid % 7 = 0 THEN 'UNKNOWN' ELSE seg END AS seg,
             |    nk, balb FROM a),
             |p AS (SELECT a.cid AS id_a, b.cid AS id_b,
             |    CAST(CASE WHEN a.name IS NULL OR b.name IS NULL THEN 0
             |          WHEN a.name = b.name THEN 24 ELSE -8 END
             |      + CASE WHEN a.phone IS NULL OR b.phone IS NULL THEN 0
             |          WHEN a.phone = b.phone THEN 30 ELSE -10 END
             |      + CASE WHEN a.email IS NULL OR b.email IS NULL THEN 0
             |          WHEN a.email = b.email THEN 20 ELSE -6 END
             |      + CASE WHEN a.seg IS NULL OR b.seg IS NULL THEN 0
             |          WHEN a.seg = b.seg THEN 5 ELSE -5 END AS BIGINT) AS score
             |  FROM a JOIN b ON a.nk = b.nk AND a.balb = b.balb)
             |SELECT id_a, id_b, score,
             |  CASE WHEN score >= 40 THEN 'match'
             |    WHEN score <= 0 THEN 'non_match'
             |    ELSE 'possible' END AS decision
             |FROM p""".stripMargin)),

    // ------------------------------------------- golden-record survivorship
    // The consolidation step AFTER linkage: three synthesized source
    // systems disagree about each customer (case-mangled names, per-source
    // phones with gaps, per-source emails with a recency stamp), and
    // Survivorship.golden picks each field by an explicit deterministic
    // rule — majority vote for name, trusted-source priority for phone,
    // latest-timestamp for email, max for balance. The oracle replays
    // every rule with window functions; tie-breaks are pinned (smallest
    // value) on both sides, so the comparison is at value level.
    "x_golden_record" -> (((s: SparkSession, dir: String) => {
      import graft.ops.Survivorship
      val c = t(s, dir, "customer")
      val srcs = (1 to 3).map { src =>
        c.select(
          col("c_custkey").cast("long").as("cid"),
          lit(src.toLong).as("src"),
          (src match {
            case 1 => col("c_name")
            case 2 => when(col("c_custkey") % 3 === 0, upper(col("c_name")))
              .otherwise(col("c_name"))
            case _ => when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
              .otherwise(col("c_name"))
          }).as("name"),
          when(col("c_custkey") % (6 + src) === 0, lit(null).cast("string"))
            .otherwise(concat(lit(s"555-$src-"),
              (col("c_custkey") % 10000).cast("string"))).as("phone"),
          when((col("c_custkey") + src) % 13 === 0, lit(null).cast("string"))
            .otherwise(concat(lower(col("c_mktsegment")), lit("-"),
              col("c_custkey").cast("string"), lit(s"-s$src@ex.com")))
            .as("email"),
          (floor(col("c_acctbal")).cast("long") + lit(10L * src)).as("bal"),
          ((col("c_custkey") * 37 + src * 101) % 9973).cast("long").as("ts"))
      }.reduce(_ unionByName _)
      Survivorship.golden(srcs, "cid", Seq(
        Survivorship.MostFrequent("name"),
        Survivorship.BySourcePriority("phone", "src"),
        Survivorship.Latest("email", "ts"),
        Survivorship.MaxValue("bal")))
    }),
      Some("""WITH r AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS cid,
             |    CAST(s.src AS BIGINT) AS src,
             |    CASE WHEN s.src = 2 AND c_custkey % 3 = 0 THEN upper(c_name)
             |         WHEN s.src = 3 AND c_custkey % 5 = 0 THEN NULL
             |         ELSE c_name END AS name,
             |    CASE WHEN c_custkey % (6 + s.src) = 0 THEN NULL
             |         ELSE '555-' || CAST(s.src AS VARCHAR) || '-' ||
             |              CAST(c_custkey % 10000 AS VARCHAR) END AS phone,
             |    CASE WHEN (c_custkey + s.src) % 13 = 0 THEN NULL
             |         ELSE lower(c_mktsegment) || '-' ||
             |              CAST(c_custkey AS VARCHAR) || '-s' ||
             |              CAST(s.src AS VARCHAR) || '@ex.com' END AS email,
             |    CAST(floor(c_acctbal) AS BIGINT) + 10 * CAST(s.src AS BIGINT)
             |      AS bal,
             |    CAST((c_custkey * 37 + s.src * 101) % 9973 AS BIGINT) AS ts
             |  FROM customer, (VALUES (1), (2), (3)) s(src)),
             |mode_name AS (
             |  SELECT cid, name FROM (
             |    SELECT cid, name, row_number() OVER (PARTITION BY cid
             |        ORDER BY cnt DESC, name ASC) AS rn
             |    FROM (SELECT cid, name, count(*) AS cnt FROM r
             |          WHERE name IS NOT NULL GROUP BY cid, name))
             |  WHERE rn = 1),
             |pick_phone AS (
             |  SELECT cid, phone FROM (
             |    SELECT cid, phone, row_number() OVER (PARTITION BY cid
             |        ORDER BY src ASC, phone ASC) AS rn
             |    FROM r WHERE phone IS NOT NULL) WHERE rn = 1),
             |pick_email AS (
             |  SELECT cid, email FROM (
             |    SELECT cid, email, row_number() OVER (PARTITION BY cid
             |        ORDER BY ts DESC, email ASC) AS rn
             |    FROM r WHERE email IS NOT NULL) WHERE rn = 1),
             |base AS (SELECT cid, count(*) AS n_records, max(bal) AS bal
             |  FROM r GROUP BY cid)
             |SELECT base.cid, base.n_records, mode_name.name,
             |  pick_phone.phone, pick_email.email, base.bal
             |FROM base
             |LEFT JOIN mode_name USING (cid)
             |LEFT JOIN pick_phone USING (cid)
             |LEFT JOIN pick_email USING (cid)""".stripMargin)),

    // ------------------------------------ streaming record linkage
    // x_record_linkage's O(batch)-per-arrival form: the clean master is
    // persisted once, the dirty source-B records arrive in three
    // micro-batches, and each batch is Fellegi-Sunter-scored against
    // the master's blocking index only (A×B pairs factor over batches —
    // every pair holds exactly one B record). The accumulated matches
    // must equal the ONE-SHOT linkage, so the oracle is x_record_linkage's
    // full SQL verbatim: a pair emitted twice (replay bug), missed
    // (batch-boundary gap), or mis-scored fails the hash.
    "x_stream_linkage" -> (((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val scratch = scratchDir("graft_streamlink", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      val a = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("cid"), col("c_name").as("name"),
        concat(lit("555-"), (col("c_custkey") % 10000).cast("string"))
          .as("phone"),
        concat(lower(col("c_mktsegment")), lit("-"),
          col("c_custkey").cast("string"), lit("@ex.com")).as("email"),
        col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("long").as("nk"),
        floor(col("c_acctbal") / 100.0d).cast("long").as("balb"))
      cat.overwrite("link_master", a)
      val bRows = a
        .withColumn("name",
          when(col("cid") % 3 === 0, upper(col("name"))).otherwise(col("name")))
        .withColumn("phone",
          when(col("cid") % 11 === 0, lit("555-0000")).otherwise(col("phone")))
        .withColumn("email",
          when(col("cid") % 13 === 0, lit(null).cast("string"))
            .otherwise(col("email")))
        .withColumn("seg",
          when(col("cid") % 7 === 0, lit("UNKNOWN")).otherwise(col("seg")))
        .orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4), r.getLong(5), r.getLong(6)))
      val mem = MemoryStream[(Long, String, String, String, String, Long, Long)]
      withStreamPartitions(s) {
        val q = graft.streaming.StreamingIngest.startLinkageMaintenance(
          cat, "link_master", "link_matches",
          mem.toDF().toDF("cid", "name", "phone", "email", "seg", "nk", "balb"),
          "cid", "cid", Seq("nk", "balb"),
          Seq(("name", 24L, -8L), ("phone", 30L, -10L), ("email", 20L, -6L),
            ("seg", 5L, -5L)),
          upper = 40L, lower = 0L, scratch.resolve("ckpt").toString)
        try bRows.grouped(bRows.length / 3 + 1).foreach { g =>
          mem.addData(g.toSeq: _*); q.processAllAvailable()
        } finally q.stop()
      }
      cat.read("link_matches")
        .select(col("id_a"), col("id_b"), col("score"), col("decision"))
    }),
      Some("""WITH a AS (SELECT CAST(c_custkey AS BIGINT) AS cid,
             |    c_name AS name,
             |    '555-' || CAST(c_custkey % 10000 AS VARCHAR) AS phone,
             |    lower(c_mktsegment) || '-' || CAST(c_custkey AS VARCHAR)
             |      || '@ex.com' AS email,
             |    c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nk,
             |    CAST(floor(c_acctbal / 100.0) AS BIGINT) AS balb
             |  FROM customer),
             |b AS (SELECT cid,
             |    CASE WHEN cid % 3 = 0 THEN upper(name) ELSE name END AS name,
             |    CASE WHEN cid % 11 = 0 THEN '555-0000' ELSE phone END AS phone,
             |    CASE WHEN cid % 13 = 0 THEN NULL ELSE email END AS email,
             |    CASE WHEN cid % 7 = 0 THEN 'UNKNOWN' ELSE seg END AS seg,
             |    nk, balb FROM a),
             |p AS (SELECT a.cid AS id_a, b.cid AS id_b,
             |    CAST(CASE WHEN a.name IS NULL OR b.name IS NULL THEN 0
             |          WHEN a.name = b.name THEN 24 ELSE -8 END
             |      + CASE WHEN a.phone IS NULL OR b.phone IS NULL THEN 0
             |          WHEN a.phone = b.phone THEN 30 ELSE -10 END
             |      + CASE WHEN a.email IS NULL OR b.email IS NULL THEN 0
             |          WHEN a.email = b.email THEN 20 ELSE -6 END
             |      + CASE WHEN a.seg IS NULL OR b.seg IS NULL THEN 0
             |          WHEN a.seg = b.seg THEN 5 ELSE -5 END AS BIGINT) AS score
             |  FROM a JOIN b ON a.nk = b.nk AND a.balb = b.balb)
             |SELECT id_a, id_b, score,
             |  CASE WHEN score >= 40 THEN 'match'
             |    WHEN score <= 0 THEN 'non_match'
             |    ELSE 'possible' END AS decision
             |FROM p""".stripMargin)),

    // ----------------------------------------------------- as-of join
    // Generic backward as-of join (pandas merge_asof / kdb aj): every
    // click gets the user's latest view AT or BEFORE it. The right side
    // is deduped per (user, ts) first so the match is unique — DuckDB's
    // native ASOF LEFT JOIN is the oracle, an implementation the union+
    // window plan shares nothing with.
    "x_asof_join" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("ts"))
            .orderBy(col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"),
          col("value").as("view_value"))
      AsOfJoin.asOf(clicks, views, Seq("user_id"), "click_ts", "ts",
          Seq("view_id", "view_value"))
        .select(col("click_id"), col("user_id"), col("click_ts"),
          col("r_view_id").as("view_id"), col("r_ts").as("view_ts"),
          col("r_view_value").as("view_value"))
    }),
      Some("""WITH v AS (
             |  SELECT event_id AS view_id, user_id, ts, value AS view_value
             |  FROM events WHERE event_type = 'view'
             |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
             |    ORDER BY event_id DESC) = 1),
             |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
             |  FROM events WHERE event_type = 'click')
             |SELECT c.click_id, c.user_id, c.click_ts,
             |  v.view_id, v.ts AS view_ts, v.view_value
             |FROM c ASOF LEFT JOIN v
             |  ON c.user_id = v.user_id AND c.click_ts >= v.ts""".stripMargin)),

    // -------------------------------------------------- z-order layout
    // Morton-curve clustering key over (user, time): min-max integral
    // scaling to 16 bits per dimension + bit interleave — exact integer
    // arithmetic end to end, which the oracle replays term by term. The
    // layout property (clustered files get tight envelopes on BOTH
    // dims) is ZOrderSpec's; the gate pins the curve computation.
    "x_zorder" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(col("event_id"),
        col("user_id").as("uid"), unix_timestamp(col("ts")).as("es"))
      graft.ops.ZOrder.withZ(ev, "uid", "es", bits = 16)
        .select(col("event_id"), col("zx"), col("zy"), col("z"))
    }),
      Some(s"""WITH e AS (SELECT event_id, user_id AS uid,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
             |b AS (SELECT min(uid) AS xmin, max(uid) AS xmax,
             |    min(es) AS ymin, max(es) AS ymax FROM e),
             |sc AS (SELECT event_id,
             |    (uid - xmin) // ((xmax - xmin) // 65536 + 1) AS zx,
             |    (es - ymin) // ((ymax - ymin) // 65536 + 1) AS zy
             |  FROM e CROSS JOIN b)
             |SELECT event_id, zx, zy,
             |  $interleave16Sql AS z
             |FROM sc""".stripMargin)),

    // ------------------------------------------------ n-D z-order layout
    // The Morton curve beyond two dimensions (VERDICT r5 missing #5):
    // (user, time, amount-cents) interleaved at 10 bits each — 30 curve
    // bits, well under the 63-bit long envelope. The oracle replays all
    // 30 shift/mask terms and the three integral min-max scalings term
    // by term, same as x_zorder does for 2-D.
    "x_zorder_nd" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(col("event_id"),
        col("user_id").as("uid"), unix_timestamp(col("ts")).as("es"),
        cents(col("value")).as("vc"))
      graft.ops.ZOrder.withZN(ev, Seq("uid", "es", "vc"), bits = 10)
        .select(col("event_id"), col("z0"), col("z1"), col("z2"), col("z"))
    }),
      Some(s"""WITH e AS (SELECT event_id, user_id AS uid,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
             |    CAST(floor(value * 100) AS BIGINT) AS vc FROM events),
             |b AS (SELECT min(uid) AS min0, max(uid) AS max0,
             |    min(es) AS min1, max(es) AS max1,
             |    min(vc) AS min2, max(vc) AS max2 FROM e),
             |sc AS (SELECT event_id,
             |    (uid - min0) // ((max0 - min0) // 1024 + 1) AS z0,
             |    (es - min1) // ((max1 - min1) // 1024 + 1) AS z1,
             |    (vc - min2) // ((max2 - min2) // 1024 + 1) AS z2
             |  FROM e CROSS JOIN b)
             |SELECT event_id, z0, z1, z2,
             |  ${interleaveNdSql(3, 10)} AS z
             |FROM sc""".stripMargin)),

    // ------------------------------------------- Hilbert-curve layout
    // ZOrder's sibling with true locality (consecutive curve positions
    // are grid neighbors — HilbertSpec pins the adjacency property
    // Morton lacks). Same integral min-max scaling as x_zorder, then
    // the xy2d bit walk; the oracle replays every rotation level as a
    // chained CTE.
    "x_hilbert" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(col("event_id"),
        col("user_id").as("uid"), unix_timestamp(col("ts")).as("es"))
      graft.ops.Hilbert.withH(ev, "uid", "es", bits = 10)
        .select(col("event_id"), col("zx"), col("zy"), col("h"))
    }),
      Some(s"""WITH e AS (SELECT event_id, user_id AS uid,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
             |b AS (SELECT min(uid) AS xmin, max(uid) AS xmax,
             |    min(es) AS ymin, max(es) AS ymax FROM e),
             |h0 AS (SELECT event_id,
             |    (uid - xmin) // ((xmax - xmin) // 1024 + 1) AS hx,
             |    (es - ymin) // ((ymax - ymin) // 1024 + 1) AS hy,
             |    CAST(0 AS BIGINT) AS hd
             |  FROM e CROSS JOIN b),
             |hs AS (SELECT event_id, hx AS zx, hy AS zy FROM h0),
             |${hilbertSql(10, "event_id")}
             |SELECT hs.event_id, hs.zx, hs.zy, h10.hd AS h
             |FROM hs JOIN h10 ON hs.event_id = h10.event_id""".stripMargin)),

    // --------------------------------------- n-D Hilbert-curve layout
    // Hilbert catches up with ZOrder.zValueN (VERDICT r6 missing #4 —
    // the curve whose reason to exist is locality should not stop at
    // 2-D): (user, time, amount-cents) through Skilling's transform at
    // 10 bits each, same fixture as x_zorder_nd so the two layouts are
    // directly comparable. The oracle replays every in-place step of
    // the transform — 27 bit-plane CTEs, the Gray decode, the trailing
    // mask, the transposed interleave — so a single mis-ordered xor
    // anywhere in the walk fails the hash. HilbertSpec holds the n=3
    // walk to the adjacency property itself; this query pins the
    // engine-side arithmetic at data scale.
    "x_hilbert_nd" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(col("event_id"),
        col("user_id").as("uid"), unix_timestamp(col("ts")).as("es"),
        cents(col("value")).as("vc"))
      graft.ops.Hilbert.withHN(ev, Seq("uid", "es", "vc"), bits = 10)
        .select(col("event_id"), col("z0"), col("z1"), col("z2"), col("h"))
    }),
      Some(s"""WITH e AS (SELECT event_id, user_id AS uid,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
             |    CAST(floor(value * 100) AS BIGINT) AS vc FROM events),
             |b AS (SELECT min(uid) AS min0, max(uid) AS max0,
             |    min(es) AS min1, max(es) AS max1,
             |    min(vc) AS min2, max(vc) AS max2 FROM e),
             |sc AS (SELECT event_id,
             |    (uid - min0) // ((max0 - min0) // 1024 + 1) AS z0,
             |    (es - min1) // ((max1 - min1) // 1024 + 1) AS z1,
             |    (vc - min2) // ((max2 - min2) // 1024 + 1) AS z2
             |  FROM e CROSS JOIN b),
             |s0 AS (SELECT event_id, z0 AS g0, z1 AS g1, z2 AS g2 FROM sc),
             |${hilbertNdSql(3, 10, "event_id")}
             |SELECT sc.event_id, sc.z0, sc.z1, sc.z2, hnd.hd AS h
             |FROM sc JOIN hnd ON sc.event_id = hnd.event_id""".stripMargin)),

    // -------------------------------------------- join-size prediction
    // Exact inner-join cardinality WITHOUT running the join
    // (Profile.joinCardinality): per-key count frames joined on the
    // distinct keys — Σ cntL·cntR plus overlap and max-single-key
    // stats, the numbers that decide broadcast vs salt vs AQE before a
    // 100 TB join is launched. Orders deliberately filtered to make
    // left/right key sets differ.
    "x_join_cardinality" -> (((s: SparkSession, dir: String) =>
      graft.ops.Profile.joinCardinality(
        t(s, dir, "orders").filter(col("o_orderkey") % 4 =!= 0), "o_custkey",
        t(s, dir, "customer").filter(col("c_custkey") % 3 =!= 0), "c_custkey")),
      Some("""WITH a AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS cl
             |    FROM orders WHERE o_orderkey % 4 <> 0 AND o_custkey IS NOT NULL
             |    GROUP BY 1),
             |b AS (SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS cr
             |    FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey IS NOT NULL
             |    GROUP BY 1)
             |SELECT CAST(sum(coalesce(cl, 0)) AS BIGINT) AS n_left,
             |  CAST(sum(coalesce(cr, 0)) AS BIGINT) AS n_right,
             |  CAST(sum(CASE WHEN cl IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS keys_left,
             |  CAST(sum(CASE WHEN cr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS keys_right,
             |  CAST(sum(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL THEN 1
             |    ELSE 0 END) AS BIGINT) AS keys_common,
             |  CAST(sum(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
             |    THEN cl * cr ELSE 0 END) AS BIGINT) AS join_rows,
             |  CAST(max(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
             |    THEN cl * cr END) AS BIGINT) AS max_key_rows
             |FROM a FULL JOIN b USING (k)""".stripMargin)),

    // ------------------------------------------------ bitemporal read
    // Valid time × transaction time, composed from machinery the
    // catalog already has: per-customer valid-time intervals derived
    // from their order history (lead window), committed TWICE via
    // replaceAtomic (v2 = a correction dropping every third order),
    // then the question a regulated reprocess actually asks — "what
    // did we BELIEVE (tx version 1) was true AS OF valid date D?" —
    // answered by readVersion(1) + the interval as-of filter. The
    // oracle re-derives tx-version 1 from source, so a reader that
    // silently resolves the CURRENT version fails the hash (v2's
    // dropped orders shift interval boundaries).
    "x_bitemporal" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_bt", dir)
      val cat = new TableCatalog(s, scratch.toString)
      def dim(src: DataFrame): DataFrame = src
        .select(col("o_custkey").as("k"), col("o_orderdate").as("effective_from"),
          cents(col("o_totalprice")).as("price_c"), col("o_orderkey"))
        .withColumn("effective_to",
          coalesce(lead(col("effective_from"), 1).over(
            Window.partitionBy(col("k"))
              .orderBy(col("effective_from"), col("o_orderkey"))),
            lit(java.sql.Timestamp.valueOf("9999-12-31 00:00:00"))))
        .drop("o_orderkey")
      val orders = t(s, dir, "orders")
      cat.replaceAtomic("dim_bt", dim(orders))
      cat.replaceAtomic("dim_bt", dim(orders.filter(col("o_orderkey") % 3 =!= 0)))
      val asOf = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      cat.readVersion("dim_bt", 1L)
        .filter(col("effective_from") <= asOf && asOf < col("effective_to"))
        .select(col("k"), col("effective_from"), col("price_c"))
    }),
      Some("""WITH d AS (SELECT o_custkey AS k, o_orderdate AS effective_from,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             |    coalesce(lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
             |        ORDER BY o_orderdate, o_orderkey),
             |      TIMESTAMP '9999-12-31 00:00:00') AS effective_to
             |  FROM orders)
             |SELECT k, effective_from, price_c FROM d
             |WHERE effective_from <= TIMESTAMP '1998-01-01 00:00:00'
             |  AND TIMESTAMP '1998-01-01 00:00:00' < effective_to""".stripMargin)),

    // ------------------------------- manifest-pruned read (data skipping)
    // The z-order payoff END TO END through the catalog's PERSISTED
    // manifest (round 5 — previously the manifest was rebuilt in-query):
    // events written z-clustered via overwriteIndexed (which stores the
    // per-file min/max manifest beside the table), then a 2-D box probe
    // reads back through prunedRead — manifest freshness check, file
    // pruning, re-applied row filter. The oracle is the UNPRUNED filter
    // over the same scratch parquet — row equality proves no file was
    // wrongly skipped (the pruning benefit itself is DataSkippingSpec's
    // measurement; file counts depend on range boundaries and don't
    // belong in a value oracle).
    "x_skipping_read" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_zorder", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val ev = t(s, dir, "events").select(col("event_id"),
        col("user_id").as("uid"), unix_timestamp(col("ts")).as("es"))
      cat.overwriteIndexed("events_z",
        graft.ops.ZOrder.cluster(ev, "uid", "es", bits = 16, numPartitions = 8),
        Seq("uid", "es"))
      // day-2 leg: a DISJOINT uid slice lands via the INCREMENTAL index
      // path (appendIndexed — only the new files are scanned for
      // envelopes), so the driver gate covers both index maintenance
      // modes; the second probe reads rows reachable only through the
      // appended files' index entries
      cat.appendIndexed("events_z",
        graft.ops.ZOrder.cluster(ev.withColumn("uid", col("uid") + lit(100000L)),
          "uid", "es", bits = 16, numPartitions = 4),
        Seq("uid", "es"))
      val es = ("es", 1704672000L, 1705363200L)
      cat.prunedRead("events_z", Seq(("uid", 2L, 9L), es))
        .unionByName(
          cat.prunedRead("events_z", Seq(("uid", 100002L, 100009L), es)))
        .select(col("event_id"), col("uid"), col("es"))
    }),
      Some(s"""SELECT event_id, uid, es
             |FROM read_parquet(
             |  '${sys.props("java.io.tmpdir")}/graft_zorder_${SfTokenPlaceholder}/events_z/*.parquet')
             |WHERE (uid BETWEEN 2 AND 9 OR uid BETWEEN 100002 AND 100009)
             |  AND es BETWEEN 1704672000 AND 1705363200""".stripMargin)),

    // ------------------------------- bloom-pruned point read (equality)
    // The equality half of data skipping: on a round-robin-scattered
    // layout every file's min/max envelope of okey spans ~the whole
    // domain, so RANGE pruning keeps all 8 files — the per-file Bloom
    // filter is what answers "might this file contain okey 1?" before
    // any file is opened (the Parquet-bloom/Delta-bloom-index design at
    // file granularity; sizing tracks rows/file, so the false-positive
    // rate is scale-invariant). The in-query require() pins the pruning
    // itself (≤ half the files opened — okey 1's handful of rows lands
    // in at most a few files); the oracle replays the unpruned equality
    // over raw lineitem, so a wrongly skipped file surfaces as missing
    // rows. BloomSkippingSpec covers append-leg maintenance, staleness
    // refusal, and conjunctive probes.
    "x_bloom_skipping" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_bloom", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("okey"),
        col("l_partkey").cast("long").as("pkey"),
        cents(col("l_extendedprice")).as("price_c"))
      cat.overwriteIndexed("li_bloom", li.repartition(8),
        skipCols = Seq.empty, bloomCols = Seq("okey"))
      val kept = cat.pointKeepFiles("li_bloom", Seq(("okey", 1L)))
      val total = cat.fileEnvelopes("li_bloom").size
      require(kept.size <= total / 2,
        s"bloom probe kept ${kept.size} of $total files — no pruning happened")
      cat.prunedReadPoint("li_bloom", Seq(("okey", 1L)))
        .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("sum_price_c"),
          min(col("pkey")).as("min_pkey"), max(col("pkey")).as("max_pkey"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c,
             |  CAST(min(l_partkey) AS BIGINT) AS min_pkey,
             |  CAST(max(l_partkey) AS BIGINT) AS max_pkey
             |FROM lineitem
             |WHERE l_orderkey = 1""".stripMargin)),

    // --------------------------------- Selinger join ordering (CBO)
    // The System-R enumeration run as a real planning decision: four
    // catalog tables (orders star out to region), each ANALYZEd, the
    // 3-edge join graph DP-ordered from persisted rows/NDV only — no
    // data touched at plan time — then executed left-deep with
    // stats-proven small sides broadcast. The in-query require() pins
    // that the STATS-DRIVEN path planned (fresh stats on all four →
    // Some(order) whose seed is a fact-adjacent table, never a
    // cross product); the oracle replays the join chain in SQL, so any
    // order the planner picks must reproduce it value-for-value.
    // JoinOrderSpec pins the chosen orders on synthetic stats and the
    // stale-stats fallback.
    "x_join_ordered" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_joinorder", dir)
      val cat = new TableCatalog(s, scratch.toString)
      cat.replaceAtomic("jo_orders", t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        col("o_custkey").cast("long").as("o_ckey"),
        cents(col("o_totalprice")).as("total_c")))
      cat.replaceAtomic("jo_customer", t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey"),
        col("c_nationkey").cast("long").as("c_nkey")))
      cat.replaceAtomic("jo_nation", t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nkey"),
        col("n_regionkey").cast("long").as("n_rkey")))
      cat.replaceAtomic("jo_region", t(s, dir, "region").select(
        col("r_regionkey").cast("long").as("rkey"),
        col("r_name").as("r_name")))
      Seq("jo_orders", "jo_customer", "jo_nation", "jo_region")
        .foreach(tb => cat.analyze(tb))
      val edges = Seq(
        ("jo_orders", "o_ckey", "jo_customer", "ckey"),
        ("jo_customer", "c_nkey", "jo_nation", "nkey"),
        ("jo_nation", "n_rkey", "jo_region", "rkey"))
      val plan = cat.planJoinOrder(edges)
      require(plan.isDefined,
        "fresh stats on all four tables must yield a DP plan")
      cat.joinOrdered(edges)
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("sum_total_c"))
    }),
      Some("""SELECT r_name,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_total_c
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin)),

    // ------------------- filter-aware Selinger (selectivity estimates)
    // The full System-R shape: the orders fact is ANALYZEd WITH okey
    // envelopes, the join graph is DP-ordered with the okey<=3000
    // filter's estimateRangeRows selectivity scaled into the fact's
    // base cardinality (pure sidecar metadata — no data touched at plan
    // time), and execution pushes the same range to the scan while the
    // broadcast decision judges the FILTERED size. The require() pins
    // that the filtered plan exists; the oracle replays the filtered
    // chain, so an estimator that changed row routing (rather than just
    // cost) would break the hash. JoinOrderSpec pins the estimator's
    // accuracy and the order flip itself.
    "x_join_filtered" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_joinfilter", dir)
      val cat = new TableCatalog(s, scratch.toString)
      cat.replaceAtomic("jf_orders", t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        col("o_custkey").cast("long").as("o_ckey"),
        cents(col("o_totalprice")).as("total_c")))
      cat.replaceAtomic("jf_customer", t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey"),
        col("c_nationkey").cast("long").as("c_nkey")))
      cat.replaceAtomic("jf_nation", t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nkey"),
        col("n_name").as("n_name")))
      cat.analyze("jf_orders", skipCols = Seq("okey"))
      cat.analyze("jf_customer"); cat.analyze("jf_nation")
      val edges = Seq(
        ("jf_orders", "o_ckey", "jf_customer", "ckey"),
        ("jf_customer", "c_nkey", "jf_nation", "nkey"))
      val flt = Map("jf_orders" -> (("okey", 1L, 3000L)))
      require(cat.planJoinOrder(edges, flt).isDefined,
        "fresh stats + envelopes must yield a filter-aware DP plan")
      require(cat.estimateRangeRows("jf_orders", "okey", 1L, 3000L)
          .exists(_ > 0L),
        "the okey envelope must yield a positive selectivity estimate")
      cat.joinOrdered(edges, filters = flt)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("sum_total_c"))
    }),
      Some("""SELECT n_name,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_total_c
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderkey BETWEEN 1 AND 3000
             |GROUP BY n_name""".stripMargin)),

    // ---------------------------- histogram-informed CBO (skew-proof)
    // A derived orders column that is HOT at 0 (95% of rows) with a
    // thin tail over [1, 10000], written hash-scattered so every file's
    // envelope spans the whole domain: uniform-in-envelope estimates
    // ~everything survives the tail filter (off ~20×), while the
    // equi-depth histogram packs the hot key into zero-width buckets
    // and estimates ~2/B — the in-query require()s pin BOTH estimates
    // (the classic CBO failure VERDICT r9 #4, and its fix), and the
    // filtered join must stay value-correct under either plan.
    // JoinOrderSpec pins that the broadcast decision itself flips only
    // under histogram stats.
    "x_histogram_cbo" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_histcbo", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val orders = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        col("o_custkey").cast("long").as("o_ckey"),
        cents(col("o_totalprice")).as("total_c"))
        .withColumn("skew", when(pmod(col("okey"), lit(20)) =!= 0, lit(0L))
          .otherwise(lit(1L) + pmod(col("okey"), lit(10000))))
      cat.replaceAtomic("h_orders", orders.repartition(8))
      cat.replaceAtomic("h_customer", t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey")))
      cat.analyze("h_customer")
      cat.analyze("h_orders", skipCols = Seq("skew"))
      val rows = cat.stats("h_orders").get.rows
      val envEst = cat.estimateRangeRows("h_orders", "skew", 1L, 10000L).get
      require(envEst > rows * 7 / 10,
        s"scattered envelopes should over-estimate (~all rows), got $envEst/$rows")
      cat.analyze("h_orders", skipCols = Seq("skew"), histCols = Seq("skew"))
      val histEst = cat.estimateRangeRows("h_orders", "skew", 1L, 10000L).get
      require(histEst < rows * 3 / 10,
        s"equi-depth histogram should expose the 5% tail, got $histEst/$rows")
      cat.joinOrdered(Seq(("h_orders", "o_ckey", "h_customer", "ckey")),
          filters = Map("h_orders" -> (("skew", 1L, 10000L))))
        .agg(count(lit(1)).as("n_rows"), sum(col("total_c")).as("sum_total_c"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_total_c
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderkey % 20 = 0""".stripMargin)),

    // --------------------------- transparent materialized-view rewrite
    // The optimizer half of x_incremental_agg: a lineitem fact is
    // committed versioned, createAggView materializes its per-partkey
    // partial state AND registers it, and the SAME aggregation a user
    // would write against the fact is silently answered from the view —
    // the in-query require() pins that the optimized plan scans the
    // view path and not the fact (plan identity), while the oracle
    // replays the aggregation over raw lineitem, so the rewrite must be
    // value-invisible. MvRewriteSpec pins the no-rewrite shapes
    // (DISTINCT, count(col), filters, non-key grouping) and the
    // structural staleness rule (fact overwrite → view stops matching).
    "x_mv_rewrite" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_mv", dir)
      val cat = new TableCatalog(s, scratch.toString)
      cat.replaceAtomic("mv_fact", t(s, dir, "lineitem").select(
        col("l_partkey").cast("long").as("pkey"),
        col("l_suppkey").cast("long").as("skey"),
        cents(col("l_extendedprice")).as("price_c")))
      cat.createAggView("mv_by_part", "mv_fact", Seq("pkey"), "price_c")
      val q = cat.read("mv_fact").groupBy(col("pkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("sum_price_c"),
          min(col("price_c")).as("min_price_c"),
          max(col("price_c")).as("max_price_c"),
          count(col("price_c")).as("cnt_items"))
      val scanned = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.head.toUri.getPath
      }
      require(scanned.nonEmpty && scanned.forall(_.contains("mv_by_part")),
        s"aggregate was not answered from the view (scans: $scanned)")
      q
    }),
      Some("""SELECT CAST(l_partkey AS BIGINT) AS pkey,
             |  CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c,
             |  CAST(min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS min_price_c,
             |  CAST(max(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS max_price_c,
             |  CAST(count(l_extendedprice) AS BIGINT) AS cnt_items
             |FROM lineitem
             |GROUP BY 1""".stripMargin)),

    // ------------------------------------------ OPTIMIZE ZORDER verb
    // Table maintenance on the VERSIONED path: a hash-scattered
    // lineitem projection is committed, rewritten in place by
    // TableCatalog.optimizeZOrder (Morton-clustered versioned commit +
    // unified stats/skipping sidecar refresh in one verb), and probed
    // through prunedRead. The oracle replays the box over raw lineitem,
    // so a wrong file envelope — which silently DROPS files from the
    // probe — surfaces as missing rows, not as a quietly slower scan.
    // DataSkippingSpec asserts the layout half (kept-file count).
    "x_zorder_optimize" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_optimize", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("okey"),
        col("l_partkey").cast("long").as("pkey"),
        cents(col("l_extendedprice")).as("price_c"))
      cat.replaceAtomic("li_opt", li.repartition(8))
      cat.optimizeZOrder("li_opt", Seq("okey", "pkey"), bits = 10,
        numPartitions = 8)
      cat.prunedRead("li_opt", Seq(("okey", 1L, 1000L), ("pkey", 1L, 500L)))
        .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("sum_price_c"),
          min(col("okey")).as("min_okey"), max(col("pkey")).as("max_pkey"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c,
             |  CAST(min(l_orderkey) AS BIGINT) AS min_okey,
             |  CAST(max(l_partkey) AS BIGINT) AS max_pkey
             |FROM lineitem
             |WHERE l_orderkey BETWEEN 1 AND 1000
             |  AND l_partkey BETWEEN 1 AND 500""".stripMargin)),

    // ------------------- SQL row-level DML on a MULTI-GEN pv table
    // (r17 lifted the refusal; r18 made it LEAF-GRANULAR): an UPDATE
    // whose predicate carries a partition-source conjunct (y, identity
    // in BOTH generations) rewrites only the matching leaves per
    // generation — the in-query require pins an untouched leaf's file
    // names across the statement, the proof it was not the r17
    // whole-table copy-on-write. A rewrite-DELETE and a MERGE whose
    // predicates derive nothing keep the whole-table posture. The
    // oracle replays all three statements relationally.
    "x_sql_dml_multigen" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlmg", dir)
      val cname = "gsm_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val base = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("total_c"),
        year(col("o_orderdate")).cast("string").as("y"))
      s.sql(s"CREATE TABLE $cname.pv (okey BIGINT, total_c BIGINT, " +
        "y STRING) PARTITIONED BY (y) TBLPROPERTIES ('versioned'='true')")
      cat.appendPartitionedVersioned("pv", base.filter(col("okey") % 2 === 0))
      cat.repartitionTableLazy("pv",
        Seq(("identity", "y", 0), ("bucket", "okey", 2)))
      cat.appendPartitionedVersioned("pv", base.filter(col("okey") % 2 === 1))
      require(cat.specGenerations("pv").size == 2,
        "the DML must run on a lazily-evolved table")
      val v0 = cat.currentVersion("pv").get
      // file names under a leaf that the pruned UPDATE must NOT touch
      // (either generation's 1996 subtree), walked relative to the
      // snapshot root — hard-linked carries keep names across commits
      def leafNames(v: Long, rel: String): Set[String] = {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(scratch.toString, "pv", s"_v$v", rel)
        if (!java.nio.file.Files.exists(p)) Set.empty
        else {
          val st = java.nio.file.Files.walk(p)
          try st.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(f => p.relativize(f).toString).toSet
          finally st.close()
        }
      }
      val g0Pin = leafNames(v0, "y=1996")
      val g1Pin = leafNames(v0, "_g1/y=1996")
      require(g0Pin.nonEmpty && g1Pin.nonEmpty,
        "both generations must hold a 1996 leaf to pin")
      // LEAF-GRANULAR: the y conjunct is partition-source in both
      // generations — only the y=1995 leaves rewrite
      s.sql(s"UPDATE $cname.pv SET total_c = total_c + 7 " +
        "WHERE okey % 10 = 3 AND y = '1995'")
      val v1 = cat.currentVersion("pv").get
      require(leafNames(v1, "y=1996") == g0Pin &&
        leafNames(v1, "_g1/y=1996") == g1Pin,
        "a pruned UPDATE must carry unmatched leaves byte-identical " +
          "in EVERY generation (r18 leaf-granular DML)")
      // whole-table posture retained for data-column predicates
      s.sql(s"DELETE FROM $cname.pv WHERE okey % 10 = 7")
      base.filter(col("okey") % 100 === 0)
        .createOrReplaceTempView("sqlmg_src")
      s.sql(s"""MERGE INTO $cname.pv t USING sqlmg_src s ON t.okey = s.okey
        WHEN MATCHED THEN UPDATE SET total_c = 0""")
      require(cat.currentVersion("pv").contains(v0 + 3L),
        "each statement must commit exactly one snapshot")
      require(cat.readVersion("pv", v0).count() == base.count(),
        "time travel must keep the pre-DML state")
      s.sql(s"SELECT y, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(total_c) AS sum_c FROM $cname.pv GROUP BY y")
    }),
      Some("""WITH base AS (SELECT o_orderkey AS okey,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS total_c,
             |    CAST(year(o_orderdate) AS VARCHAR) AS y FROM orders),
             |upd AS (SELECT okey, CASE WHEN okey % 10 = 3 AND y = '1995'
             |    THEN total_c + 7 ELSE total_c END AS total_c, y FROM base),
             |del AS (SELECT * FROM upd WHERE okey % 10 <> 7),
             |mrg AS (SELECT okey, CASE WHEN okey % 100 = 0
             |    THEN CAST(0 AS BIGINT) ELSE total_c END AS total_c, y
             |  FROM del)
             |SELECT y, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(total_c) AS BIGINT) AS sum_c
             |FROM mrg GROUP BY y""".stripMargin)),

    // --------------- ENVELOPE-PRUNED row-level DML (r18): the last
    // whole-table posture in row-level SQL was a DATA-column predicate
    // — nothing plan-time could exclude a leaf. With a FRESH skipping
    // index (CALL system.analyze skip_cols at exactly this layout
    // state), per-file min/max envelopes prune the pinned set: leaves
    // provably holding no match carry byte-identical (in-query
    // file-name pins prove it), and a stale index silently disengages
    // (the prunedRead freshness rule — DML never REQUIRES an index).
    // The oracle replays the statements relationally.
    "x_sql_dml_envelope" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlenv", dir)
      val cname = "gse_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val base = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("total_c"),
        year(col("o_orderdate")).cast("string").as("y"))
      s.sql(s"CREATE TABLE $cname.e (okey BIGINT, total_c BIGINT, " +
        "y STRING) PARTITIONED BY (y)")
      cat.insertPartitioned("e", base)
      cat.analyze("e", skipCols = Seq("okey"))
      // okey envelopes overlap every year leaf (keys interleave), so
      // pick the probe from the data: the single leaf holding min(okey)
      // is the only one a `okey <= min` conjunct can match
      val minKey = base.agg(min(col("okey"))).head().getLong(0)
      val minYear = base.filter(col("okey") === minKey)
        .head().getAs[String]("y")
      def leafNames(rel: String): Set[String] = {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(scratch.toString, "e", rel)
        if (!java.nio.file.Files.exists(p)) Set.empty
        else {
          val st = java.nio.file.Files.walk(p)
          try st.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(f => p.relativize(f).toString).toSet
          finally st.close()
        }
      }
      val years = base.select(col("y")).distinct().collect()
        .map(_.getString(0)).sorted
      val others = years.filterNot(_ == minYear)
      require(others.nonEmpty, "need >1 year leaf to prove pruning")
      val pins = others.map(yv => yv -> leafNames(s"y=$yv")).toMap
      s.sql(s"UPDATE $cname.e SET total_c = total_c + 5 " +
        s"WHERE okey <= $minKey")
      require(others.forall(yv => leafNames(s"y=$yv") == pins(yv)),
        "an envelope-pruned UPDATE must leave every provably-disjoint " +
          "year leaf byte-identical (r18 envelope DML pruning)")
      // a data-column DELETE with NO fresh index (the UPDATE above
      // invalidated it) keeps the whole-table posture and still lands
      s.sql(s"DELETE FROM $cname.e WHERE okey % 10 = 7")
      s.sql(s"SELECT y, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(total_c) AS sum_c FROM $cname.e GROUP BY y")
    }),
      Some("""WITH base AS (SELECT o_orderkey AS okey,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS total_c,
             |    CAST(year(o_orderdate) AS VARCHAR) AS y FROM orders),
             |mk AS (SELECT min(okey) AS m FROM base),
             |upd AS (SELECT okey, CASE WHEN okey <= (SELECT m FROM mk)
             |    THEN total_c + 5 ELSE total_c END AS total_c, y
             |  FROM base),
             |del AS (SELECT * FROM upd WHERE okey % 10 <> 7)
             |SELECT y, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(total_c) AS BIGINT) AS sum_c
             |FROM del GROUP BY y""".stripMargin)),

    // ------- ENVELOPE-PRUNED DML on a MULTI-GENERATION table (r18,
    // second sitting): analyze now reads the lazily-evolved composite
    // (one leg per generation, partition values path-derived per
    // file), so data-column row-level statements prune EVERY
    // generation's pinned leaf set by per-file envelope under the same
    // freshness rule. The in-query proof: a whole-table posture
    // rewrites every leaf (all pinned → all replaced → every file name
    // changes); after the pruned UPDATE, BOTH generations must still
    // hold byte-identical leaves. Oracle replays relationally.
    "x_sql_dml_envelope_multigen" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlenvmg", dir)
      val cname = "gsem_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val base = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("total_c"),
        year(col("o_orderdate")).cast("string").as("y"))
      s.sql(s"CREATE TABLE $cname.m (okey BIGINT, total_c BIGINT, " +
        "y STRING) PARTITIONED BY (y)")
      cat.insertPartitioned("m", base.filter(col("okey") % 2 === 0))
      cat.repartitionTableLazy("m",
        Seq(("identity", "y", 0), ("bucket", "okey", 2)))
      cat.insertPartitioned("m", base.filter(col("okey") % 2 === 1))
      require(cat.specGenerations("m").size == 2,
        "the DML must run on a lazily-evolved table")
      cat.analyze("m", skipCols = Seq("total_c"))
      val minC = base.agg(min(col("total_c"))).head().getLong(0)
      def allLeaves(): Map[String, Set[String]] = {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(scratch.toString, "m")
        val st = java.nio.file.Files.walk(root)
        try st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => root.relativize(f).toString)
          .toSeq.groupBy(rel => rel.substring(0, rel.lastIndexOf('/')))
          .map { case (d, fs) => d -> fs.map(_.split('/').last).toSet }
        finally st.close()
      }
      val before = allLeaves()
      s.sql(s"UPDATE $cname.m SET total_c = total_c + 3 " +
        s"WHERE total_c <= $minC")
      val after = allLeaves()
      def untouched(prefix: Boolean) = after.count { case (d, fs) =>
        (if (prefix) d.startsWith("_g1/") else !d.startsWith("_g1/")) &&
          before.get(d).contains(fs)
      }
      require(untouched(false) > 0 && untouched(true) > 0,
        "an envelope-pruned multi-gen UPDATE must leave provably-" +
          "disjoint leaves byte-identical in BOTH generations " +
          s"(untouched: gen0=${untouched(false)} gen1=${untouched(true)})")
      s.sql(s"SELECT y, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(total_c) AS sum_c FROM $cname.m GROUP BY y")
    }),
      Some("""WITH base AS (SELECT o_orderkey AS okey,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS total_c,
             |    CAST(year(o_orderdate) AS VARCHAR) AS y FROM orders),
             |mc AS (SELECT min(total_c) AS m FROM base),
             |upd AS (SELECT okey, CASE WHEN total_c <= (SELECT m FROM mc)
             |    THEN total_c + 3 ELSE total_c END AS total_c, y
             |  FROM base)
             |SELECT y, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(total_c) AS BIGINT) AS sum_c
             |FROM upd GROUP BY y""".stripMargin)),

    // ---------------- SQL row-level DML on a PLAIN lazily-evolved
    // table (r18 — the LAST row-level refusal lifted): the live root
    // has no snapshot to pin, so the statement's freshness is the
    // pinned-listing protocol — each scanned leaf's file print is
    // pinned at scan build and expect-checked under the writer lock at
    // commit. A partition-source conjunct rewrites only the matching
    // leaves per generation (in-query file-name pins prove it); data-
    // column predicates keep the whole-table posture. Oracle replays
    // the statements relationally.
    "x_sql_dml_plain_lazy" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlpl", dir)
      val cname = "gspl_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val base = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("total_c"),
        year(col("o_orderdate")).cast("string").as("y"))
      s.sql(s"CREATE TABLE $cname.pl (okey BIGINT, total_c BIGINT, " +
        "y STRING) PARTITIONED BY (y)")
      cat.insertPartitioned("pl", base.filter(col("okey") % 2 === 0))
      cat.repartitionTableLazy("pl",
        Seq(("identity", "y", 0), ("bucket", "okey", 2)))
      cat.insertPartitioned("pl", base.filter(col("okey") % 2 === 1))
      require(cat.specGenerations("pl").size == 2,
        "the DML must run on a lazily-evolved PLAIN table")
      def leafNames(rel: String): Set[String] = {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(scratch.toString, "pl", rel)
        if (!java.nio.file.Files.exists(p)) Set.empty
        else {
          val st = java.nio.file.Files.walk(p)
          try st.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(f => p.relativize(f).toString).toSet
          finally st.close()
        }
      }
      val g0Pin = leafNames("y=1996")
      val g1Pin = leafNames("_g1/y=1996")
      require(g0Pin.nonEmpty && g1Pin.nonEmpty,
        "both generations must hold a 1996 leaf to pin")
      // leaf-granular: only the y=1995 leaves rewrite, in place
      s.sql(s"UPDATE $cname.pl SET total_c = total_c + 7 " +
        "WHERE okey % 10 = 3 AND y = '1995'")
      require(leafNames("y=1996") == g0Pin &&
        leafNames("_g1/y=1996") == g1Pin,
        "a pruned UPDATE must leave unmatched leaves in place " +
          "byte-identical in EVERY generation (r18 pinned-listing DML)")
      // whole-table posture for data-column predicates
      s.sql(s"DELETE FROM $cname.pl WHERE okey % 10 = 7")
      base.filter(col("okey") % 100 === 0)
        .createOrReplaceTempView("sqlpl_src")
      s.sql(s"""MERGE INTO $cname.pl t USING sqlpl_src s ON t.okey = s.okey
        WHEN MATCHED THEN UPDATE SET total_c = 0""")
      s.sql(s"SELECT y, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(total_c) AS sum_c FROM $cname.pl GROUP BY y")
    }),
      Some("""WITH base AS (SELECT o_orderkey AS okey,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS total_c,
             |    CAST(year(o_orderdate) AS VARCHAR) AS y FROM orders),
             |upd AS (SELECT okey, CASE WHEN okey % 10 = 3 AND y = '1995'
             |    THEN total_c + 7 ELSE total_c END AS total_c, y FROM base),
             |del AS (SELECT * FROM upd WHERE okey % 10 <> 7),
             |mrg AS (SELECT okey, CASE WHEN okey % 100 = 0
             |    THEN CAST(0 AS BIGINT) ELSE total_c END AS total_c, y
             |  FROM del)
             |SELECT y, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(total_c) AS BIGINT) AS sum_c
             |FROM mrg GROUP BY y""".stripMargin)),

    // --------------------------- Z-ORDER on a DOUBLE dimension (r17)
    // optimizeZOrder previously demanded integral dims (the exact
    // integral scale). Doubles now quantize in VALUE space
    // (ZOrder.dimQuantizer) — this pins the end-to-end loop on a real
    // double column: cluster events by (value, user_id), prune a 2-D
    // box through the long-probe envelope contract (truncating
    // envelopes are exact for integer-endpoint probes), and the
    // aggregate hash-matches DuckDB computing the same box unclustered.
    // The in-plan require proves pruning HAPPENED (fewer files opened).
    "x_zorder_double" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_zdouble", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val ev = readEvents(s, dir).select(
        col("user_id").cast("long").as("uid"),
        col("value").cast("double").as("v"))
      cat.replaceAtomic("ev_zd", ev.repartition(8))
      cat.optimizeZOrder("ev_zd", Seq("v", "uid"), bits = 8,
        numPartitions = 8)
      val allFiles = cat.read("ev_zd").inputFiles.length
      val pr = cat.prunedRead("ev_zd",
        Seq(("v", 50L, 150L), ("uid", 0L, 3L)))
      require(pr.inputFiles.length < allFiles,
        s"the double-dim z-order must prune files " +
          s"(${pr.inputFiles.length} of $allFiles)")
      pr.agg(count(lit(1)).as("n_rows"),
        sum(cents(col("v"))).as("sum_v_c"),
        countDistinct(col("uid")).as("n_users"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_v_c,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events
             |WHERE value >= 50 AND value <= 150
             |  AND user_id BETWEEN 0 AND 3""".stripMargin)),

    // --------------------------------- OPTIMIZE small-file compaction
    // The other maintenance verb: a 64-tiny-file orders projection is
    // committed, compacted by TableCatalog.compactSmallFiles (coalesce
    // repack through the versioned commit — shuffle-free), and read
    // back. n_files = 1 is deterministic here (targetBytes far above
    // the table size), so the output row proves the repack HAPPENED and
    // the aggregate proves it lost nothing — both oracle-checked.
    "x_optimize_compact" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_compact", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      cat.replaceAtomic("o_small", o.repartition(64))
      val nFiles = cat.compactSmallFiles("o_small", targetBytes = 1L << 30)
      cat.read("o_small")
        .agg(count(lit(1)).as("n_rows"), sum(col("total_c")).as("sum_total_c"))
        .withColumn("n_files", lit(nFiles.toLong))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_total_c,
             |  CAST(1 AS BIGINT) AS n_files
             |FROM orders""".stripMargin)),

    // ------------------------------------------------ RESTORE verb
    // The rollback story end to end: good orders snapshot committed and
    // tagged, a corrupted deploy committed over it (totals zeroed), then
    // restoreTag replays the GOOD content as a new monotonic commit —
    // the in-query require()s pin the version arithmetic (v3 = copy of
    // v1) and that the bad version remains inspectable history; the
    // oracle replays the good content from raw orders, so a restore
    // that resurrected the corrupted rows fails the hash.
    "x_restore" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_restore", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      cat.replaceAtomic("r_orders", o)
      val good = cat.tag("r_orders", "good")
      cat.replaceAtomic("r_orders", o.withColumn("total_c", lit(0L)))
      val restored = cat.restoreTag("r_orders", "good")
      require(restored == good + 2,
        s"expected restore commit v${good + 2}, got v$restored")
      require(cat.readVersion("r_orders", good + 1)
          .agg(sum(col("total_c"))).head().getLong(0) == 0L,
        "the corrupted version must remain inspectable history")
      cat.read("r_orders")
        .agg(count(lit(1)).as("n_rows"), sum(col("total_c")).as("sum_total_c"),
          max(col("okey")).as("max_okey"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_total_c,
             |  CAST(max(o_orderkey) AS BIGINT) AS max_okey
             |FROM orders""".stripMargin)),

    // ------------------------ streaming aggregate-view maintenance
    // The MV loop closed over a live feed: a bounded lineitem slice
    // (okey < 3000, stable at every SF) arrives as 3 MemoryStream
    // micro-batches; each lands in the plain fact as one atomic
    // batch_id partition and the registered view folds exactly the new
    // files (created on batch 0, incrementally refreshed after). The
    // final aggregation must be silently answered FROM THE VIEW (plan
    // require) and equal the oracle's replay of the whole slice — a
    // batch the view missed, double-folded, or half-published breaks
    // the hash. StreamingMvSpec pins replay convergence and the
    // foreign-incarnation reset.
    "x_stream_mv" -> (((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val scratch = scratchDir("graft_streammv", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      val slice = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 3000)
        .select(col("l_orderkey").cast("long").as("okey"),
          col("l_partkey").cast("long").as("pkey"),
          cents(col("l_extendedprice")).as("price_c"))
        .as[(Long, Long, Long)].collect()
      val mem = MemoryStream[(Long, Long, Long)]
      withStreamPartitions(s) {
        val q = graft.streaming.StreamingIngest.startAggViewMaintenance(
          cat, "smv_fact", "smv_view", Seq("pkey"), "price_c",
          mem.toDF().toDF("okey", "pkey", "price_c"),
          scratch.resolve("ckpt").toString)
        try (0 until 3).foreach { bi =>
          mem.addData(slice.filter(_._1 % 3 == bi).toIndexedSeq: _*)
          q.processAllAvailable()
        } finally q.stop()
      }
      val agg = cat.read("smv_fact").groupBy(col("pkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("sum_price_c"))
      val scanned = agg.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.head.toUri.getPath
      }
      require(scanned.nonEmpty && scanned.forall(_.contains("smv_view")),
        s"stream-maintained view did not answer the aggregation ($scanned)")
      agg
    }),
      Some("""SELECT CAST(l_partkey AS BIGINT) AS pkey,
             |  CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c
             |FROM lineitem
             |WHERE l_orderkey < 3000
             |GROUP BY 1""".stripMargin)),

    // ------------------------- streaming write-audit-publish (r11)
    // The audited-ingest loop end-to-end on REAL checkpointed
    // micro-batches: three batches stage onto a branch (main count
    // pinned unchanged after every trigger), the audit sees the
    // would-be state, ONE publish lands all of them, and the stream
    // keeps staging onto the re-created branch afterwards (dropped,
    // so the oracle is the published state). Constraint enforcement
    // rides every staged batch.
    "x_stream_wap" -> (((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val scratch = scratchDir("graft_streamwap", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"), col("n_regionkey").cast("long").as("rk"))
      cat.replaceAtomic("wap_t", base)
      cat.addConstraint("wap_t", "k_nonneg", "k >= 0")
      val nBase = base.count()
      val slice = t(s, dir, "customer").filter(col("c_custkey") <= 90)
        .select((col("c_custkey").cast("long") + lit(1000L)).as("k"),
          col("c_name").as("name"), col("c_nationkey").cast("long").as("rk"))
        .as[(Long, String, Long)].collect()
      val mem = MemoryStream[(Long, String, Long)]
      withStreamPartitions(s) {
        val q = graft.streaming.StreamingIngest.startBranchIngest(
          cat, "wap_t", "load", mem.toDF().toDF("k", "name", "rk"),
          scratch.resolve("ckpt").toString)
        try (0 until 3).foreach { bi =>
          mem.addData(slice.filter(_._1 % 3 == bi).toIndexedSeq: _*)
          q.processAllAvailable()
          require(cat.read("wap_t").count() == nBase,
            s"staged batch $bi leaked into the main read")
        } finally q.stop()
      }
      require(cat.auditBranch("wap_t", "load") == nBase + slice.length,
        "the audit must see base plus every staged batch")
      cat.publishBranch("wap_t", "load")
      require(cat.branches("wap_t").isEmpty, "publish must consume the branch")
      cat.read("wap_t").select(col("k"), col("name"), col("rk"))
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             |  CAST(n_regionkey AS BIGINT) AS rk FROM nation
             |UNION ALL
             |SELECT CAST(c_custkey AS BIGINT) + 1000, c_name,
             |  CAST(c_nationkey AS BIGINT)
             |FROM customer WHERE c_custkey <= 90""".stripMargin)),

    // ------------------- self-promoting streaming WAP (r12, publishEvery)
    // x_stream_wap with the promotion INSIDE the loop: every 2nd staged
    // batch the ingest audits-and-publishes itself (same publishBranch,
    // CHECK constraints re-judge staged files first), so the WAP
    // cadence needs no operator process; a trailing odd batch stays
    // staged until the operator's final publish. The oracle replays the
    // final state; a doubled batch through the self-publish boundary or
    // a leaked unpublished batch breaks the hash.
    "x_stream_wap_auto" -> (((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val scratch = scratchDir("graft_streamwapauto", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"), col("n_regionkey").cast("long").as("rk"))
      cat.replaceAtomic("wap_a", base)
      cat.addConstraint("wap_a", "k_nonneg", "k >= 0")
      val nBase = base.count()
      val slice = t(s, dir, "customer").filter(col("c_custkey") <= 90)
        .select((col("c_custkey").cast("long") + lit(1000L)).as("k"),
          col("c_name").as("name"), col("c_nationkey").cast("long").as("rk"))
        .as[(Long, String, Long)].collect()
      val mem = MemoryStream[(Long, String, Long)]
      withStreamPartitions(s) {
        val q = graft.streaming.StreamingIngest.startBranchIngest(
          cat, "wap_a", "load", mem.toDF().toDF("k", "name", "rk"),
          scratch.resolve("ckpt").toString, publishEvery = 2)
        try (0 until 3).foreach { bi =>
          mem.addData(slice.filter(_._1 % 3 == bi).toIndexedSeq: _*)
          q.processAllAvailable()
        } finally q.stop()
      }
      // batches 0+1 self-published; batch 2 is still staged
      val mid = cat.read("wap_a").count()
      require(mid > nBase && mid < nBase + slice.length,
        s"expected a partial self-publish, got $mid of ${nBase + slice.length}")
      require(cat.branches("wap_a").keySet == Set("load"),
        "the trailing batch must still be staged")
      cat.publishBranch("wap_a", "load") // the operator drains the tail
      cat.read("wap_a").select(col("k"), col("name"), col("rk"))
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
             |  CAST(n_regionkey AS BIGINT) AS rk FROM nation
             |UNION ALL
             |SELECT CAST(c_custkey AS BIGINT) + 1000, c_name,
             |  CAST(c_nationkey AS BIGINT)
             |FROM customer WHERE c_custkey <= 90""".stripMargin)),

    // ------------- exactly-once streaming into a pv fact (r14 next #3)
    // The production-ingest shape: each micro-batch commits ONE pv
    // snapshot stamped with `sb-<token>-<batchId>` provenance, so a
    // replayed batch (at-least-once delivery, or the crash window
    // between commit and marker) adds ZERO rows — pinned by a direct
    // same-batch replay AND a kill/resume from the checkpoint whose
    // first resumed chunk re-delivers batch 0's data. The oracle is
    // the final relational state; any duplicate or lost batch breaks
    // the hash.
    "x_stream_pv" -> (((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val scratch = scratchDir("graft_streampv", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      val all = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("k"), col("c_name").as("name"),
        pmod(col("c_nationkey"), lit(5)).cast("string").as("dt"))
      cat.createPartitionedVersioned("spv", all.schema, Seq("dt"))
      val first = all.filter(col("k") <= 120)
        .as[(Long, String, String)].collect()
      val second = all.filter(col("k") > 120 && col("k") <= 150)
        .as[(Long, String, String)].collect()
      val ckpt = scratch.resolve("ckpt").toString
      val mem = MemoryStream[(Long, String, String)]
      withStreamPartitions(s) {
        val q = graft.streaming.StreamingIngest
          .startPartitionedVersionedAppend(cat, "spv",
            mem.toDF().toDF("k", "name", "dt"), ckpt)
        try { mem.addData(first.toIndexedSeq: _*); q.processAllAvailable() }
        finally q.stop()
      }
      require(cat.currentVersion("spv").contains(2L),
        "one micro-batch must be exactly ONE snapshot commit")
      // crash window: the same batch id replays directly — zero rows
      val token = graft.streaming.StreamingIngest.queryToken(ckpt)
      val n0 = cat.read("spv").count()
      cat.appendPartitionedVersionedBatch("spv",
        first.toIndexedSeq.toDF("k", "name", "dt"), 0L, token)
      require(cat.read("spv").count() == n0 &&
        cat.currentVersion("spv").contains(2L),
        "a replayed batch must add zero rows and zero commits")
      // kill/resume: the fresh source restarts offsets, so its first
      // chunk REPLAYS as batch 0 (re-delivered data — must skip) and
      // the next chunk is batch 1 (new data — must land once)
      val mem2 = MemoryStream[(Long, String, String)]
      withStreamPartitions(s) {
        val q2 = graft.streaming.StreamingIngest
          .startPartitionedVersionedAppend(cat, "spv",
            mem2.toDF().toDF("k", "name", "dt"), ckpt)
        try {
          mem2.addData(first.toIndexedSeq: _*)
          q2.processAllAvailable()
          require(cat.read("spv").count() == n0,
            "the resumed incarnation re-landed a committed batch")
          mem2.addData(second.toIndexedSeq: _*)
          q2.processAllAvailable()
        } finally q2.stop()
      }
      require(cat.read("spv").count() == n0 + second.length,
        "the post-resume batch must land exactly once")
      cat.read("spv").select(col("k"), col("name"), col("dt"))
    }),
      Some("""SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
             |  CAST(c_nationkey % 5 AS VARCHAR) AS dt
             |FROM customer WHERE c_custkey <= 150""".stripMargin)),

    // ---------------------------- incremental MV refresh (plain fact)
    // The maintenance loop of x_mv_rewrite for an append-style fact:
    // day-1 lineitem rows (odd orderkeys) are loaded plain, the view
    // registered (freshness = the exact FILE SET, checked against the
    // matched scan's own file index); the day-2 append (even orderkeys)
    // un-matches the view — pinned by an in-query require() — and
    // refreshAggViewIncremental folds ONLY the appended files' partials
    // into the view state (O(new data), min/max exact because plain
    // facts only gain files). The final aggregation must be answered
    // from the refreshed view (plan-identity require) and must equal
    // the oracle's full-lineitem replay — a partial that failed to
    // merge, or a stale view answering early, breaks the hash.
    "x_mv_incremental" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_mvinc", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("okey"),
        col("l_partkey").cast("long").as("pkey"),
        cents(col("l_extendedprice")).as("price_c"))
      cat.overwrite("inc_fact", li.filter(pmod(col("okey"), lit(2)) === 1))
      cat.createAggView("inc_view", "inc_fact", Seq("pkey"), "price_c")
      cat.append("inc_fact", li.filter(pmod(col("okey"), lit(2)) === 0))
      def agg = cat.read("inc_fact").groupBy(col("pkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("sum_price_c"))
      def scansOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.head.toUri.getPath
        }
      require(scansOf(agg).forall(!_.contains("inc_view")),
        "a stale view answered after the append")
      val folded = cat.refreshAggViewIncremental("inc_view", "inc_fact")
      require(folded > 0, s"append produced no new files to fold ($folded)")
      val q = agg
      require(scansOf(q).nonEmpty && scansOf(q).forall(_.contains("inc_view")),
        s"refreshed view did not answer the aggregation (${scansOf(q)})")
      q
    }),
      Some("""SELECT CAST(l_partkey AS BIGINT) AS pkey,
             |  CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c
             |FROM lineitem
             |GROUP BY 1""".stripMargin)),

    // ------------------ incremental MV refresh (VERSIONED fact, via CDC)
    // The consumer the change feed exists for (VERDICT r9 missing #2):
    // the fact is snapshot-versioned (freshness = the immutable _vN
    // path), the day-2 delta lands via appendAtomic (hard-linked
    // carry-over + 2 new files), and refreshAggViewIncremental folds
    // the delta at O(delta) — the in-query require() pins that EXACTLY
    // the appended files were folded (return = 2, the changed-file
    // count), and the final aggregation must be answered from the
    // re-pinned view (plan identity) while equaling the oracle's
    // full-lineitem replay.
    "x_mv_cdc" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_mvcdc", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("okey"),
        col("l_partkey").cast("long").as("pkey"),
        cents(col("l_extendedprice")).as("price_c"))
      cat.replaceAtomic("cdc_fact", li.filter(pmod(col("okey"), lit(2)) === 1))
      cat.createAggView("cdc_view", "cdc_fact", Seq("pkey"), "price_c")
      cat.appendAtomic("cdc_fact",
        li.filter(pmod(col("okey"), lit(2)) === 0).repartition(2))
      def agg = cat.read("cdc_fact").groupBy(col("pkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("sum_price_c"))
      def scansOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.head.toUri.getPath
        }
      require(scansOf(agg).forall(!_.contains("cdc_view")),
        "a stale view answered after the versioned append")
      val folded = cat.refreshAggViewIncremental("cdc_view", "cdc_fact")
      require(folded == 2,
        s"O(delta) violated: expected the 2 appended files to fold, got $folded")
      val q = agg
      require(scansOf(q).nonEmpty && scansOf(q).forall(_.contains("cdc_view")),
        s"re-pinned view did not answer the aggregation (${scansOf(q)})")
      q
    }),
      Some("""SELECT CAST(l_partkey AS BIGINT) AS pkey,
             |  CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c
             |FROM lineitem
             |GROUP BY 1""".stripMargin)),

    // ------------------------------------------------ ANSI MERGE INTO
    // The general DML verb over a versioned orders target: source rows
    // update matched keys (+1 cent marker), delete matched multiples of
    // 10, insert unmatched keys; the result is ONE snapshot commit. The
    // output row carries the final-table aggregate AND the four action
    // counts, each replayed by the oracle as set algebra over raw
    // orders — a row routed to the wrong action changes a count or the
    // sum and fails the hash. MergeIntoSpec pins NULL-predicate,
    // cardinality-violation, time-travel, and composite-key behavior.
    "x_merge_into" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_merge", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      cat.replaceAtomic("m_orders", o.filter(pmod(col("okey"), lit(3)) =!= 0))
      val src = o.filter(pmod(col("okey"), lit(2)) === 0)
        .withColumn("total_c", col("total_c") + 1)
      val (u, d, i, k) = cat.mergeInto("m_orders", src, Seq("okey"),
        deleteWhenMatched = Some(pmod(col("okey"), lit(10)) === 0))
      require(u > 0 && d > 0 && i > 0 && k > 0,
        s"merge fixture must exercise every action, got u=$u d=$d i=$i k=$k")
      cat.read("m_orders")
        .agg(count(lit(1)).as("n_rows"), sum(col("total_c")).as("sum_total_c"))
        .withColumn("n_updated", lit(u)).withColumn("n_deleted", lit(d))
        .withColumn("n_inserted", lit(i)).withColumn("n_kept", lit(k))
    }),
      Some("""WITH t AS (
             |  SELECT o_orderkey AS k,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS tc
             |  FROM orders WHERE o_orderkey % 3 <> 0),
             |s AS (
             |  SELECT o_orderkey AS k,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) + 1 AS tc
             |  FROM orders WHERE o_orderkey % 2 = 0),
             |m AS (
             |  SELECT k, tc FROM t WHERE k NOT IN (SELECT k FROM s)
             |  UNION ALL
             |  SELECT s.k, s.tc FROM s JOIN t ON s.k = t.k WHERE s.k % 10 <> 0
             |  UNION ALL
             |  SELECT k, tc FROM s WHERE k NOT IN (SELECT k FROM t))
             |SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(tc) AS BIGINT) AS sum_total_c,
             |  (SELECT CAST(count(*) AS BIGINT) FROM s JOIN t ON s.k = t.k
             |    WHERE s.k % 10 <> 0) AS n_updated,
             |  (SELECT CAST(count(*) AS BIGINT) FROM s JOIN t ON s.k = t.k
             |    WHERE s.k % 10 = 0) AS n_deleted,
             |  (SELECT CAST(count(*) AS BIGINT) FROM s
             |    WHERE k NOT IN (SELECT k FROM t)) AS n_inserted,
             |  (SELECT CAST(count(*) AS BIGINT) FROM t
             |    WHERE k NOT IN (SELECT k FROM s)) AS n_kept
             |FROM m""".stripMargin)),

    // ------------------------------------ deletion vectors (merge-on-read)
    // The instant-delete path deleteWhere's partition rewrite can't
    // give: deleting 1% of a plain lineitem projection writes ONLY the
    // (file, position) vector sidecar — the in-query require()s pin
    // that zero data files changed, that re-deleting is idempotent
    // (0 new rows), and that folding the vectors (applyDeleteVectors)
    // removes exactly the vectored count. Both the merge-on-read
    // aggregate and the post-fold plain aggregate must equal the
    // oracle's NOT(cond) replay — a vector that missed a row, double-
    // counted one, or resurrected one shows up as a value mismatch.
    "x_delete_vectors" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_dv", dir)
      val cat = new TableCatalog(s, scratch.toString)
      cat.overwrite("li_mor", t(s, dir, "lineitem").select(
        col("l_partkey").cast("long").as("pkey"),
        cents(col("l_extendedprice")).as("price_c")).repartition(8))
      val before = java.nio.file.Files.list(
        java.nio.file.Paths.get(cat.path("li_mor"))).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).toSet
      val deadCond = pmod(col("pkey"), lit(97)) === 0
      val n1 = cat.deleteVectorize("li_mor", deadCond)
      require(n1 > 0, "the 1-in-97 partkey condition matched nothing")
      require(cat.deleteVectorize("li_mor", deadCond) == 0L,
        "re-deleting the same condition must be idempotent")
      val after = java.nio.file.Files.list(
        java.nio.file.Paths.get(cat.path("li_mor"))).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).toSet
      require(before == after, "a data file changed under merge-on-read delete")
      val mor = cat.readMor("li_mor")
        .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("sum_price_c"))
        .head()
      require(cat.applyDeleteVectors("li_mor") == n1,
        "folding the vectors removed a different row count than vectored")
      val folded = cat.read("li_mor")
        .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("sum_price_c"))
      require(folded.head() == mor,
        "post-fold plain read disagrees with the merge-on-read view")
      // threshold-crossing case (VERDICT r9 next #3): a 1-in-7 delete
      // (~14% of the survivors) crosses the default 10% auto-fold
      // threshold, so the SAME deleteVectorize call must fold — no live
      // vectors afterwards, and the read plan has no anti-join leg left
      val n2 = cat.deleteVectorize("li_mor", pmod(col("pkey"), lit(7)) === 0)
      require(n2 > 0, "the 1-in-7 partkey condition matched nothing")
      require(!cat.hasDeleteVectors("li_mor"),
        "crossing the auto-fold threshold must fold in the same verb")
      require(!cat.readMor("li_mor").queryExecution.executedPlan
        .toString.toLowerCase.contains("join"),
        "post-auto-fold read plan must carry no anti-join leg")
      cat.read("li_mor")
        .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("sum_price_c"))
        .withColumn("n_deleted", lit(n1 + n2))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_price_c,
             |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
             |    WHERE l_partkey % 97 = 0 OR l_partkey % 7 = 0) AS n_deleted
             |FROM lineitem
             |WHERE NOT (l_partkey % 97 = 0) AND NOT (l_partkey % 7 = 0)""".stripMargin)),

    // ------------------------------------- change data feed (O(delta))
    // appendAtomic commits a new snapshot sharing the previous one's
    // files by hard link, so changesBetween diffs the FILE SETS and
    // reads only the delta: the step-1 feed's in-query require() pins
    // that exactly the two appended files are opened — none of the four
    // carried-over ones. Step 2 is a full rewrite (deletes + updates),
    // the degrade-gracefully path equal to the complete SnapshotDiff
    // (CdcSpec pins that equality); the oracle replays both changesets
    // as set algebra over raw customer, so a row classified into the
    // wrong change_type — or a resurrected/missed delta file — fails
    // the hash.
    "x_cdc" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_cdc", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey"),
        cents(col("c_acctbal")).as("bal_c"),
        col("c_nationkey").cast("long").as("nk"))
      val v1 = cat.appendAtomic("cdc_cust",
        c.filter(pmod(col("ckey"), lit(3)) =!= 0).repartition(4))
      val v2 = cat.appendAtomic("cdc_cust",
        c.filter(pmod(col("ckey"), lit(3)) === 0).repartition(2))
      val feed12 = cat.changesBetween("cdc_cust", v1, v2, Seq("ckey"))
      require(feed12.inputFiles.nonEmpty && feed12.inputFiles.length <= 2,
        s"O(delta) violated: feed read ${feed12.inputFiles.length} files " +
          "where the append wrote at most 2")
      val next = c.filter(pmod(col("ckey"), lit(5)) =!= 0)
        .withColumn("bal_c", when(pmod(col("ckey"), lit(7)) === 0,
          col("bal_c") + 100).otherwise(col("bal_c")))
      val v3 = cat.replaceAtomic("cdc_cust", next)
      val feed23 = cat.changesBetween("cdc_cust", v2, v3, Seq("ckey"))
      feed12.withColumn("step", lit(1L))
        .unionByName(feed23.withColumn("step", lit(2L)))
    }),
      Some("""WITH c AS (SELECT c_custkey AS ckey,
             |  CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c,
             |  CAST(c_nationkey AS BIGINT) AS nk FROM customer)
             |SELECT ckey, 'insert' AS change_type, bal_c, nk,
             |  CAST(1 AS BIGINT) AS step
             |FROM c WHERE ckey % 3 = 0
             |UNION ALL
             |SELECT ckey, 'delete' AS change_type, CAST(NULL AS BIGINT),
             |  CAST(NULL AS BIGINT), CAST(2 AS BIGINT)
             |FROM c WHERE ckey % 5 = 0
             |UNION ALL
             |SELECT ckey, 'update' AS change_type, bal_c + 100, nk,
             |  CAST(2 AS BIGINT)
             |FROM c WHERE ckey % 5 <> 0 AND ckey % 7 = 0""".stripMargin)),

    // ------------------------------ DSv2 SQL catalog with time travel
    // The versioned catalog exposed to PLAIN SQL (VERDICT r9 missing
    // #5): a GraftSqlCatalog plugin registered under a per-SF name
    // resolves `g.sn` to the committed snapshot and `VERSION AS OF v1`
    // to the retained previous one — no Scala API in the query path.
    // The output joins the two versions per key, so a catalog that
    // resolved either version to the wrong snapshot directory fails the
    // hash (rkey vs rkey_v1 differ by exactly the rewrite's +100).
    "x_sql_catalog" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_sqlcat", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val n = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nkey"),
        col("n_name"),
        col("n_regionkey").cast("long").as("rkey"))
      val v1 = cat.replaceAtomic("sn", n)
      cat.replaceAtomic("sn", n.withColumn("rkey", col("rkey") + 100))
      val cname = "gsql_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      // the SQL maintenance surface (VERDICT r10 next #6): DESCRIBE
      // HISTORY and OPTIMIZE as stored procedures, no Scala API
      val hist = s.sql(s"CALL $cname.system.describe_history('sn')")
        .select("op").collect().map(_.getString(0)).toSeq
      require(hist == Seq("REPLACE", "REPLACE"),
        s"describe_history through SQL returned $hist")
      require(s.sql(s"CALL $cname.system.optimize('sn')")
        .collect().head.getLong(0) >= 1L, "optimize returned no file count")
      // time travel still resolves across the maintenance commit
      s.sql(s"""SELECT cur.nkey, cur.n_name, cur.rkey, old.rkey AS rkey_v1
               |FROM $cname.sn AS cur
               |JOIN (SELECT nkey, rkey FROM $cname.sn VERSION AS OF $v1) AS old
               |  ON cur.nkey = old.nkey""".stripMargin)
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name,
             |  CAST(n_regionkey + 100 AS BIGINT) AS rkey,
             |  CAST(n_regionkey AS BIGINT) AS rkey_v1
             |FROM nation""".stripMargin)),

    // -------------------- SQL partitioned tables (identity transform)
    // `CREATE TABLE ... PARTITIONED BY (y)` maps onto the catalog's
    // Hive-partitioned plain layout: INSERT INTO appends, DELETE routes
    // through the partition-granular purge (a fully-purged year's
    // directory disappears — pinned in-query), and the scan partition-
    // prunes. Oracle: the surviving rows recomputed from orders.
    "x_sql_partitioned" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlpart", dir)
      val cname = "gsqlp_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val view = s"ord_$cname"
      t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"))
        .createOrReplaceTempView(view)
      s.sql(s"CREATE TABLE $cname.po (okey BIGINT, price_c BIGINT, " +
        "y STRING) PARTITIONED BY (y)")
      s.sql(s"INSERT INTO $cname.po SELECT okey, price_c, y FROM $view")
      s.sql(s"DELETE FROM $cname.po WHERE y = '1995'")
      require(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(scratch.toString, "po", "y=1995")),
        "a fully-purged partition's directory must disappear")
      require(java.nio.file.Files.exists(
        java.nio.file.Paths.get(scratch.toString, "po", "y=1996")),
        "surviving partitions must keep their directories")
      s.sql(s"SELECT y, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.po GROUP BY y")
    }),
      Some("""SELECT CAST(year(o_orderdate) AS VARCHAR) AS y,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_c
             |FROM orders WHERE year(o_orderdate) <> 1995
             |GROUP BY 1""".stripMargin)),

    // --------------------- multi-column partitioned CREATE TABLE (r11)
    // PARTITIONED BY (y, prio) nests Hive directories in declaration
    // order; INSERT appends under both levels and a both-column probe
    // prunes to the leaf (required in-query). Values prove the nested
    // layout loses nothing.
    "x_sql_partitioned_multi" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlpm", dir)
      val cname = "gsqlpm_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val view = s"ordm_$cname"
      t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"),
        col("o_orderpriority").substr(1, 1).as("prio"))
        .createOrReplaceTempView(view)
      s.sql(s"CREATE TABLE $cname.pom (okey BIGINT, price_c BIGINT, " +
        "y STRING, prio STRING) PARTITIONED BY (y, prio)")
      s.sql(s"INSERT INTO $cname.pom SELECT okey, price_c, y, prio FROM $view")
      // nested in declaration order
      require(java.nio.file.Files.list(
        java.nio.file.Paths.get(scratch.toString, "pom")).iterator().hasNext)
      def leafFiles(y: String, prio: String): Set[String] = {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(scratch.toString, "pom",
          s"y=$y", s"prio=$prio")
        if (!java.nio.file.Files.exists(p)) Set.empty
        else {
          val st = java.nio.file.Files.list(p)
          try st.iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet
          finally st.close()
        }
      }
      // pick an untouched leaf (prio 1, earliest year) to pin that the
      // DML legs below rewrite ONLY affected leaves
      val y0 = s.sql(s"SELECT min(y) FROM $cname.pom WHERE prio = '1'")
        .head().getString(0)
      val before = leafFiles(y0, "1")
      require(before.nonEmpty, s"no files under y=$y0/prio=1")
      // DML leg 1 (r12 verdict #4): row-level DELETE on the nested
      // layout — partition-granular purge of matching leaves only
      s.sql(s"DELETE FROM $cname.pom WHERE okey % 10 = 0 AND prio = '2'")
      // DML leg 2: UPDATE pruned by both partition columns
      val yMax = s.sql(s"SELECT max(y) FROM $cname.pom WHERE prio = '3'")
        .head().getString(0)
      s.sql(s"UPDATE $cname.pom SET price_c = price_c + 7 " +
        s"WHERE y = '$yMax' AND prio = '3'")
      require(leafFiles(y0, "1") == before,
        "DML on other partitions must not rewrite this leaf's files")
      s.sql(s"SELECT y, prio, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.pom GROUP BY y, prio")
    }),
      Some("""WITH pom AS (SELECT o_orderkey AS okey,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             |    CAST(year(o_orderdate) AS VARCHAR) AS y,
             |    substr(o_orderpriority, 1, 1) AS prio
             |  FROM orders),
             |surv AS (SELECT * FROM pom WHERE NOT (okey % 10 = 0 AND prio = '2')),
             |ymax AS (SELECT max(y) AS y FROM surv WHERE prio = '3')
             |SELECT surv.y, surv.prio, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN surv.prio = '3' AND surv.y = (SELECT y FROM ymax)
             |    THEN price_c + 7 ELSE price_c END) AS BIGINT) AS sum_c
             |FROM surv GROUP BY 1, 2""".stripMargin)),

    // --------------------- partition-spec evolution (r12 verdict #3)
    // A `y`-partitioned fact needs `(y, prio)` after the fact — the
    // first schema-lifecycle wall with no workaround short of a manual
    // CTAS + rename. `CALL g.system.repartition` evolves the spec: one
    // staged full rewrite into the new leaf layout (the heavy half
    // unlocked against a pinned file listing — hours at 100 TB and no
    // writer blocked), then an O(leaf dirs) locked swap of the
    // directories and the spec sidecar. The in-query require()s pin
    // the contract: the nested leaves exist after the evolve, a DELETE
    // pruned by BOTH columns purges only matching leaves, and an
    // untouched leaf keeps its files byte-for-byte. Oracle replays the
    // surviving rows relationally.
    "x_sql_repartition" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_sqlrp", dir)
      val cname = "gsqlrp_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val view = s"ordr_$cname"
      t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"),
        col("o_orderpriority").substr(1, 1).as("prio"))
        .createOrReplaceTempView(view)
      // born under spec A: y only
      s.sql(s"CREATE TABLE $cname.rp (okey BIGINT, price_c BIGINT, " +
        "y STRING, prio STRING) PARTITIONED BY (y)")
      s.sql(s"INSERT INTO $cname.rp SELECT okey, price_c, y, prio FROM $view")
      val y0 = s.sql(s"SELECT min(y) FROM $cname.rp").head().getString(0)
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(
        scratch.toString, "rp", s"y=$y0")), "spec A must nest y only")
      // evolve to (y, prio)
      s.sql(s"CALL $cname.system.repartition('rp', 'y,prio')").collect()
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(
        scratch.toString, "rp", s"y=$y0", "prio=1")),
        "the evolved layout must nest y/prio")
      def leafFiles(y: String, prio: String): Set[String] = {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(scratch.toString, "rp",
          s"y=$y", s"prio=$prio")
        if (!java.nio.file.Files.exists(p)) Set.empty
        else {
          val st = java.nio.file.Files.list(p)
          try st.iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet
          finally st.close()
        }
      }
      val pinned = leafFiles(y0, "1")
      require(pinned.nonEmpty, s"no files under y=$y0/prio=1")
      // DML pruned by BOTH columns of the evolved spec rewrites only
      // the affected leaves
      val yMax = s.sql(s"SELECT max(y) FROM $cname.rp").head().getString(0)
      s.sql(s"DELETE FROM $cname.rp WHERE y = '$yMax' AND prio = '5'")
      require(leafFiles(y0, "1") == pinned,
        "a DELETE pruned to other leaves must not rewrite this one")
      // the Iceberg-standard DDL verbs (r13 verdict #6), pure SQL:
      // ADD PARTITION FIELD nests a third (transform) level, DROP
      // removes it again — content identical either way, which the
      // oracle hash proves
      s.sql(s"ALTER TABLE $cname.rp ADD PARTITION FIELD bucket(4, okey)")
        .collect()
      require({
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.list(java.nio.file.Paths.get(
          scratch.toString, "rp", s"y=$y0", "prio=1"))
        try st.iterator().asScala.exists(
          _.getFileName.toString.startsWith("okey_bucket="))
        finally st.close()
      }, "ADD PARTITION FIELD must nest the bucket level")
      s.sql(s"ALTER TABLE $cname.rp DROP PARTITION FIELD bucket(4, okey)")
        .collect()
      require(leafFiles(y0, "1").nonEmpty,
        "DROP PARTITION FIELD must flatten back to (y, prio)")
      s.sql(s"SELECT y, prio, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.rp GROUP BY y, prio")
    }),
      Some("""WITH rp AS (SELECT o_orderkey AS okey,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             |    CAST(year(o_orderdate) AS VARCHAR) AS y,
             |    substr(o_orderpriority, 1, 1) AS prio
             |  FROM orders),
             |ymax AS (SELECT max(y) AS y FROM rp)
             |SELECT y, prio, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(price_c) AS BIGINT) AS sum_c
             |FROM rp WHERE NOT (prio = '5' AND y = (SELECT y FROM ymax))
             |GROUP BY 1, 2""".stripMargin)),

    // --------------------------- ALTER COLUMN widening (r12 verdict #4)
    // int->long / decimal growth as a METADATA-ONLY commit: the new
    // version hard-links the same files and declares the wider type in
    // the schema log; Spark's parquet up-cast readers serve the old
    // bytes, appends write the wide shape natively, and time travel
    // keeps the type each version declared. The in-query require()s
    // pin the contract (same file names across the widen commits, the
    // narrow type at v1, refusals for narrowing/cross-family); the
    // oracle replays base + beyond-int-range appends relationally.
    "x_schema_widen" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      import org.apache.spark.sql.types._
      val scratch = scratchDir("graft_widen", dir)
      val cat = new TableCatalog(s, scratch.toString)
      // pmod keeps the narrow phase int-safe at ANY scale extent (the
      // sf1 gate's scaled custkeys exceed int range under a bare cast)
      val base = t(s, dir, "customer").select(
        pmod(col("c_custkey"), lit(1000000000L)).cast("int").as("ckey"),
        col("c_nationkey").cast("int").as("nk"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
      cat.replaceAtomic("wc", base)
      def snapFiles(v: Long): Set[String] = {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.list(
          java.nio.file.Paths.get(cat.path("wc"), s"_v$v"))
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally st.close()
      }
      val f1 = snapFiles(1L)
      cat.widenColumn("wc", "ckey", LongType)
      cat.widenColumn("wc", "bal", DecimalType(20, 4))
      require(snapFiles(3L) == f1, "widening must rewrite NO data file")
      require(cat.read("wc").schema("ckey").dataType == LongType)
      // the appended keys exceed int range — only the wide shape holds them
      cat.appendAtomic("wc", base.filter(col("nk") < 5).select(
        (col("ckey").cast("long") + lit(5000000000L)).as("ckey"),
        col("nk"),
        (col("bal") + lit(new java.math.BigDecimal("0.0001")))
          .cast("decimal(20,4)").as("bal")))
      require(cat.readVersion("wc", 1L).schema("ckey").dataType ==
        IntegerType, "time travel must keep the narrow declared type")
      require(
        try { cat.widenColumn("wc", "nk", StringType); false }
        catch { case _: IllegalArgumentException => true },
        "a cross-family ALTER must refuse")
      require(
        try { cat.widenColumn("wc", "bal", DecimalType(10, 2)); false }
        catch { case _: IllegalArgumentException => true },
        "a decimal shrink must refuse")
      cat.read("wc").groupBy("nk").agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("ckey")).as("sum_k"),
        sum(col("bal")).cast("double").as("sum_bal"))
        .select(col("nk"), col("n"), col("sum_k"), col("sum_bal"))
    }),
      Some("""WITH wc AS (
             |  SELECT CAST(c_custkey % 1000000000 AS BIGINT) AS ckey,
             |    CAST(c_nationkey AS INT) AS nk,
             |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(20,4)) AS bal
             |  FROM customer
             |  UNION ALL
             |  SELECT CAST(c_custkey % 1000000000 AS BIGINT) + 5000000000,
             |    CAST(c_nationkey AS INT),
             |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 0.0001 AS DECIMAL(20,4))
             |  FROM customer WHERE c_nationkey < 5)
             |SELECT nk, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(ckey) AS BIGINT) AS sum_k,
             |  CAST(sum(bal) AS DOUBLE) AS sum_bal
             |FROM wc GROUP BY nk""".stripMargin)),

    // -------------- hidden partitioning transforms (r12 "missing" #3)
    // Iceberg's `days(ts)` / `bucket(n, col)` specs over the Hive
    // layout: the transforms materialize as HIDDEN generated partition
    // columns — INSERT supplies the declared shape and the write
    // derives the rest, SELECT never sees them, reads prune leaf dirs
    // from SOURCE-column predicates (best-effort — row filters still
    // apply), and row-level DML narrows its rewrite to the derived
    // leaves. The in-query require()s pin each of those; the oracle
    // replays insert-then-delete relationally.
    "x_sql_transform_part" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_tfp", dir)
      val cname = "gtfp_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val view = s"ev_$cname"
      t(s, dir, "events").select(col("event_id").as("ekey"),
        cents(col("value")).as("val_c"), col("ts"))
        .createOrReplaceTempView(view)
      s.sql(s"CREATE TABLE $cname.tp (ekey BIGINT, val_c BIGINT, " +
        "ts TIMESTAMP) PARTITIONED BY (days(ts), bucket(8, ekey))")
      s.sql(s"INSERT INTO $cname.tp SELECT ekey, val_c, ts FROM $view")
      require(s.sql(s"SELECT * FROM $cname.tp").columns.toSeq ==
        Seq("ekey", "val_c", "ts"),
        "generated partition columns must stay hidden from SELECT *")
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(
        scratch.toString, "tp", "ts_day=2024-01-01")),
        "the layout must nest ts_day under Iceberg naming")
      def servedDirs(df: org.apache.spark.sql.DataFrame,
          prefix: String): Set[String] =
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan match {
              case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
                f.fileIndex.inputFiles.toSeq
              case _ => Seq.empty[String]
            }
        }.flatten.flatMap(_.split("/").find(_.startsWith(prefix))).toSet
      val served = servedDirs(s.sql(s"SELECT ekey FROM $cname.tp " +
        "WHERE ts >= timestamp'2024-01-20 00:00:00'"), "ts_day=")
      require(served.nonEmpty && served.forall(_ >= "ts_day=2024-01-20"),
        s"day-leaf pruning must serve only ts_day >= 2024-01-20: $served")
      require(servedDirs(s.sql(s"SELECT val_c FROM $cname.tp " +
        "WHERE ekey = 42"), "ekey_bucket=").size <= 1,
        "bucket equality must prune to one bucket's dirs")
      // DML: the gen-derived bound narrows the rewrite; the purged day
      // leaves disappear, later days keep their files untouched
      s.sql(s"DELETE FROM $cname.tp WHERE ts < timestamp'2024-01-05 00:00:00'")
      require(!java.nio.file.Files.exists(java.nio.file.Paths.get(
        scratch.toString, "tp", "ts_day=2024-01-01")),
        "a fully purged day leaf must disappear")
      // spec evolution crosses transform boundaries: drop the bucket
      // level — the rewrite re-derives days(ts) and flattens the tree
      s.sql(s"CALL $cname.system.repartition('tp', 'days(ts)')").collect()
      require({
        val st = java.nio.file.Files.list(java.nio.file.Paths.get(
          scratch.toString, "tp", "ts_day=2024-01-20"))
        try {
          import scala.jdk.CollectionConverters._
          !st.iterator().asScala.exists(
            _.getFileName.toString.startsWith("ekey_bucket="))
        } finally st.close()
      }, "the evolved spec must flatten the bucket level away")
      // ADD COLUMN on the partitioned plain table is a sidecar update:
      // no snapshot pointer planted, old rows null-fill
      s.sql(s"ALTER TABLE $cname.tp ADD COLUMN tag STRING")
      require(s.sql(s"SELECT count(*) FROM $cname.tp WHERE tag IS NOT NULL")
        .head().getLong(0) == 0L,
        "pre-ALTER rows must null-fill the added column")
      s.sql(s"SELECT CAST(CAST(ts AS DATE) AS STRING) AS d, " +
        "CAST(count(*) AS BIGINT) AS n, sum(val_c) AS sum_c " +
        s"FROM $cname.tp GROUP BY 1")
    }),
      Some("""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
             |GROUP BY 1""".stripMargin)),

    // ----------- truncate + hours transforms at value level (r13)
    // Two legs sharing one result shape: documents under
    // truncate(1, lang) — 'en' and 'es' COLLIDE into prefix 'e', the
    // prefix-sharding semantics — with a string-bound DELETE narrowed
    // by the derived prefix; events under hours(ts) with a
    // timestamp-bound DELETE purging whole hour leaves. A wrong
    // derivation on either write or prune side surfaces as a value
    // mismatch against the relational replay.
    "x_sql_transform_more" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_tfm", dir)
      val cname = "gtfm_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val dv = s"doc_$cname"; val ev = s"ev_$cname"; val ov = s"ord_$cname"
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        col("n_chars")).createOrReplaceTempView(dv)
      t(s, dir, "events").select(col("event_id").as("ekey"), col("ts"))
        .createOrReplaceTempView(ev)
      t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        col("o_totalprice").as("price")).createOrReplaceTempView(ov)
      s.sql(s"CREATE TABLE $cname.td (doc_id BIGINT, lang STRING, " +
        "n_chars BIGINT) PARTITIONED BY (truncate(1, lang))")
      s.sql(s"INSERT INTO $cname.td SELECT doc_id, lang, n_chars FROM $dv")
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(
        scratch.toString, "td", "lang_trunc=e")),
        "'en' and 'es' must collide into the shared prefix leaf 'e'")
      s.sql(s"DELETE FROM $cname.td WHERE lang >= 'p'")
      require(!java.nio.file.Files.exists(java.nio.file.Paths.get(
        scratch.toString, "td", "lang_trunc=z")),
        "the string bound must purge the 'z' prefix leaf")
      s.sql(s"CREATE TABLE $cname.th (ekey BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (hours(ts))")
      // four days = ~96 hour leaves: leaf-count is the cost driver
      // here (720 leaves benched 3x slower with identical coverage)
      s.sql(s"INSERT INTO $cname.th SELECT ekey, ts FROM $ev " +
        "WHERE ts < timestamp'2024-01-05 00:00:00'")
      s.sql(s"DELETE FROM $cname.th " +
        "WHERE ts < timestamp'2024-01-03 00:00:00'")
      // DECIMAL truncate leg (r13 verdict #5 — the Iceberg
      // truncate(W, decimal), the reference's own amt DECIMAL shape,
      // main.ddl:43): width 10000000 on the unscaled value = 100000.00
      // buckets; a decimal-bound DELETE purges the high leaves
      s.sql(s"CREATE TABLE $cname.ta (okey BIGINT, amt DECIMAL(12,2)) " +
        "PARTITIONED BY (truncate(10000000, amt))")
      s.sql(s"INSERT INTO $cname.ta SELECT okey, " +
        s"CAST(CAST(floor(price) AS BIGINT) AS DECIMAL(12,2)) AS amt " +
        s"FROM $ov")
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(
        scratch.toString, "ta", "amt_trunc=0.00")),
        "decimal leaves must render at the source scale (0.00)")
      def amtLeaves(): Seq[java.math.BigDecimal] = {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.list(
          java.nio.file.Paths.get(scratch.toString, "ta"))
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("amt_trunc="))
          .map(n => new java.math.BigDecimal(n.drop("amt_trunc=".length)))
          .toSeq
        finally st.close()
      }
      require(amtLeaves().exists(
        _.compareTo(new java.math.BigDecimal("200000.00")) >= 0),
        "orders must populate leaves above the delete bound")
      s.sql(s"DELETE FROM $cname.ta WHERE amt >= 200000.00")
      require(!amtLeaves().exists(
        _.compareTo(new java.math.BigDecimal("200000.00")) >= 0),
        "the decimal bound must purge every leaf at or above it")
      s.sql(s"SELECT 'lang' AS leg, lang AS key, " +
        s"CAST(count(*) AS BIGINT) AS n, sum(n_chars) AS sv " +
        s"FROM $cname.td GROUP BY lang").unionAll(
        s.sql(s"SELECT 'hour' AS leg, CAST(CAST(ts AS DATE) AS STRING) " +
          s"AS key, CAST(count(*) AS BIGINT) AS n, sum(ekey) AS sv " +
          s"FROM $cname.th GROUP BY 2")).unionAll(
        s.sql(s"SELECT 'amt' AS leg, " +
          s"CAST(CAST(floor(amt / 100000) AS BIGINT) AS STRING) AS key, " +
          s"CAST(count(*) AS BIGINT) AS n, sum(okey) AS sv " +
          s"FROM $cname.ta GROUP BY 2"))
    }),
      Some("""SELECT 'lang' AS leg, lang AS key,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sv
             |FROM documents WHERE lang IS NULL OR NOT (lang >= 'p')
             |GROUP BY lang
             |UNION ALL
             |SELECT 'hour', CAST(CAST(ts AS DATE) AS VARCHAR),
             |  CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
             |FROM events WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
             |  AND ts < TIMESTAMP '2024-01-05 00:00:00'
             |GROUP BY 2
             |UNION ALL
             |SELECT 'amt', CAST(CAST(floor(amt / 100000) AS BIGINT) AS VARCHAR),
             |  CAST(count(*) AS BIGINT), CAST(sum(okey) AS BIGINT)
             |FROM (SELECT o_orderkey AS okey,
             |  CAST(floor(o_totalprice) AS DECIMAL(12,2)) AS amt FROM orders)
             |WHERE amt < 200000.00
             |GROUP BY 2""".stripMargin)),

    // ---------------- per-leaf OPTIMIZE for partitioned plain tables
    // Every INSERT INTO lands shuffle-partition-many files per touched
    // leaf; CALL system.optimize on a partitioned plain table compacts
    // each qualifying leaf independently (staged unlocked, swapped
    // under the pinned listing). The require()s pin one-file leaves
    // and byte-for-row content; the oracle replays the two inserts.
    "x_sql_optimize_parts" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_optp", dir)
      val cname = "goptp_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val view = s"ordo_$cname"
      t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"))
        .createOrReplaceTempView(view)
      s.sql(s"CREATE TABLE $cname.op (okey BIGINT, price_c BIGINT, " +
        "y STRING) PARTITIONED BY (y)")
      s.sql(s"INSERT INTO $cname.op SELECT okey, price_c, y FROM $view " +
        "WHERE okey % 2 = 0")
      s.sql(s"INSERT INTO $cname.op SELECT okey, price_c, y FROM $view " +
        "WHERE okey % 2 = 1")
      val y0 = s.sql(s"SELECT min(y) FROM $cname.op").head().getString(0)
      def filesIn(y: String): Int = {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.list(java.nio.file.Paths.get(
          scratch.toString, "op", s"y=$y"))
        try st.iterator().asScala.count(
          _.getFileName.toString.endsWith(".parquet"))
        finally st.close()
      }
      require(filesIn(y0) >= 2, "two inserts must land >= 2 files")
      val out = s.sql(s"CALL $cname.system.optimize('op', 128)").collect()
      require(out.nonEmpty, "optimize must report compacted leaves")
      require(filesIn(y0) == 1,
        s"leaf y=$y0 must compact to one file, has ${filesIn(y0)}")
      s.sql(s"SELECT y, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.op GROUP BY y")
    }),
      Some("""SELECT CAST(year(o_orderdate) AS VARCHAR) AS y,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM orders GROUP BY 1""".stripMargin)),

    // ----------------- PARTITIONED VERSIONED tables (r13 verdict #1)
    // The two table worlds unified: a year-partitioned versioned fact
    // (the reference's own date-stamped transactions, main.ddl:105-115,
    // is this shape) gets snapshot isolation, time travel, O(delta)
    // CDC, AND leaf-pruned scans/DML on one table. Two appends commit
    // v2/v3 whose shared leaves HARD-LINK (file names pinned equal
    // across snapshots — no bytes copied); the feed between them
    // classifies exactly the second append; a Scala partial-leaf
    // DELETE rewrites one leaf as a snapshot commit; a SQL
    // whole-leaf DELETE drops another; time travel still reaches the
    // pre-delete state. The oracle replays every step relationally.
    "x_part_versioned" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_pv", dir)
      val cname = "gpv_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val pre = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("dt"))
      s.sql(s"CREATE TABLE $cname.pv (okey BIGINT, price_c BIGINT, " +
        "dt STRING) PARTITIONED BY (dt) TBLPROPERTIES ('versioned'='true')")
      cat.appendPartitionedVersioned("pv",
        pre.filter(pmod(col("okey"), lit(3)) =!= 0))          // v2
      cat.appendPartitionedVersioned("pv",
        pre.filter(pmod(col("okey"), lit(3)) === 0))          // v3
      // hard-link evidence: a leaf carried from v2 to v3 keeps its
      // exact file names (links, not copies — append cost is O(new))
      val leaf0 = {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.list(
          java.nio.file.Paths.get(scratch.toString, "pv", "_v2"))
        try st.iterator().asScala.map(_.getFileName.toString)
          .find(_.startsWith("dt=")).getOrElse(
            throw new IllegalStateException("no leaf in _v2"))
        finally st.close()
      }
      def leafNames(v: Long): Set[String] = {
        import scala.jdk.CollectionConverters._
        val d = java.nio.file.Paths.get(scratch.toString, "pv", s"_v$v", leaf0)
        val st = java.nio.file.Files.list(d)
        try st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally st.close()
      }
      require(leafNames(2L).nonEmpty &&
        leafNames(2L).subsetOf(leafNames(3L)),
        "an append must CARRY the existing leaf's files by name (links)")
      // time travel: v2 holds exactly the first append
      require(s.sql(s"SELECT count(*) FROM $cname.pv VERSION AS OF 2")
        .head().getLong(0) ==
        s.sql(s"SELECT count(*) FROM $cname.pv").head().getLong(0) -
          cat.changesBetween("pv", 2L, 3L, Seq("okey")).count(),
        "v2 + the v2→v3 feed must reconcile with the head count")
      // leaf pruning inside the SNAPSHOT dir: a dt probe PLANS only
      // that year's leaf (identity pruning happens at planning — the
      // planned FilePartitions are the honest evidence, the file
      // index still lists the whole snapshot)
      val years = s.sql(s"SELECT DISTINCT dt FROM $cname.pv ORDER BY dt")
        .collect().map(_.getString(0)).toSeq
      val yProbe = years(math.min(1, years.size - 1))
      val planned = s.sql(
        s"SELECT okey FROM $cname.pv WHERE dt = '$yProbe'")
        .queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan match {
              case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
                f.toBatch.planInputPartitions().toSeq.flatMap {
                  case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
                    fp.files.map(_.filePath.toString)
                  case _ => Seq.empty[String]
                }
              case _ => Seq.empty[String]
            }
        }.flatten.flatMap(_.split("/").find(_.startsWith("dt="))).toSet
      require(planned == Set(s"dt=$yProbe"),
        s"partition pruning must plan only dt=$yProbe inside the " +
          s"snapshot: $planned")
      // the CDC delta between the appends is exactly append #2
      val feed = cat.changesBetween("pv", 2L, 3L, Seq("okey"))
      require(feed.filter(col("change_type") =!= "insert").count() == 0L,
        "an append-only interval must classify as pure inserts")
      // partial-leaf DELETE (Scala verb): one leaf rewrites, committed
      // as a snapshot; whole-leaf DELETE (SQL): the 1996 leaf drops
      val (yPart, yFull) = (years.head, years.last)
      cat.deleteWherePartsVersioned("pv",
        col("dt") === yPart && pmod(col("okey"), lit(2)) === 0)
      s.sql(s"DELETE FROM $cname.pv WHERE dt = '$yFull'")
      require(!java.nio.file.Files.exists(java.nio.file.Paths.get(
        scratch.toString, "pv",
        s"_v${cat.currentVersion("pv").get}", s"dt=$yFull")),
        "a fully-deleted year leaf must not be carried into the head")
      require(s.sql(s"SELECT count(*) FROM $cname.pv VERSION AS OF 3")
        .head().getLong(0) > s.sql(s"SELECT count(*) FROM $cname.pv")
        .head().getLong(0),
        "time travel must still reach the pre-delete state")
      // dt-scoped SQL UPDATE: a snapshot replace of ONE leaf (the
      // row-level path over the pinned snapshot — unscanned leaves
      // hard-link through); the oracle replays the bump relationally
      val yUpd = years(1)
      s.sql(s"UPDATE $cname.pv SET price_c = price_c + 7 " +
        s"WHERE dt = '$yUpd' AND okey % 10 = 0")
      // result: per-year head state + the CDC insert counts, one shape
      val headAgg = s.sql(s"SELECT dt, CAST(count(*) AS BIGINT) AS n_now, " +
        s"sum(price_c) AS sum_now_c FROM $cname.pv GROUP BY dt")
      val insAgg = feed.groupBy("dt")
        .agg(count(lit(1)).cast("long").as("n_ins"))
      insAgg.join(headAgg, Seq("dt"), "left")
        .select(col("dt"), col("n_ins"),
          coalesce(col("n_now"), lit(0L)).as("n_now"),
          coalesce(col("sum_now_c"), lit(0L)).as("sum_now_c"))
    }),
      Some("""WITH pre AS (SELECT o_orderkey AS okey,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             |  CAST(year(o_orderdate) AS VARCHAR) AS dt FROM orders),
             |cur AS (SELECT * FROM pre
             |  WHERE dt <> (SELECT max(dt) FROM pre)
             |  AND NOT (dt = (SELECT min(dt) FROM pre) AND okey % 2 = 0)),
             |upd AS (SELECT okey, dt, CASE WHEN okey % 10 = 0 AND
             |    dt = (SELECT min(dt) FROM pre
             |          WHERE dt > (SELECT min(dt) FROM pre))
             |  THEN price_c + 7 ELSE price_c END AS price_c FROM cur),
             |ins AS (SELECT dt, CAST(count(*) AS BIGINT) AS n_ins
             |  FROM pre WHERE okey % 3 = 0 GROUP BY dt)
             |SELECT ins.dt AS dt, ins.n_ins,
             |  COALESCE(c.n_now, 0) AS n_now,
             |  COALESCE(c.sum_now_c, 0) AS sum_now_c
             |FROM ins LEFT JOIN (SELECT dt, CAST(count(*) AS BIGINT) AS n_now,
             |    CAST(sum(price_c) AS BIGINT) AS sum_now_c
             |  FROM upd GROUP BY dt) c ON ins.dt = c.dt""".stripMargin)),

    // ------------------- WAP on partitioned versioned facts (r14 #1)
    // The capstone of the table-worlds unification: a date-partitioned
    // versioned fact stages whole leaf trees on a BRANCH (main readers
    // never see them), audits the would-be state, and publishes as ONE
    // snapshot commit whose carry hard-links the current tree and
    // whose adopt hard-links the staged leaves. A dropped branch
    // leaves the head byte-identical (pinned by version + leaf file
    // names). The oracle replays the whole loop relationally.
    "x_pv_wap" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_pvwap", dir)
      val cname = "gpw_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val pre = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("dt"))
      s.sql(s"CREATE TABLE $cname.pv (okey BIGINT, price_c BIGINT, " +
        "dt STRING) PARTITIONED BY (dt) TBLPROPERTIES ('versioned'='true')")
      cat.appendPartitionedVersioned("pv",
        pre.filter(pmod(col("okey"), lit(3)) =!= 0))          // v2 = base
      // LAZY EVOLUTION before any WAP (r17 verdict next #1): the whole
      // loop below — append staging, SQL audits, replace-mode claims,
      // both publishes — runs on a 2-GENERATION table: gen0 holds the
      // base under the (dt) layout, every later write routes into
      // _g1's (dt, bucket(okey,2)) layout, and the replace claims must
      // excise matching gen0 rows from inside foreign leaves
      cat.repartitionTableLazy("pv",
        Seq(("identity", "dt", 0), ("bucket", "okey", 2)))
      require(cat.specGenerations("pv").size == 2,
        "the WAP loop must exercise a lazily-evolved table")
      val years = pre.select(col("dt")).distinct().orderBy(col("dt"))
        .collect().map(_.getString(0)).toSeq
      val (y1, y2) = (years.head, years.last)
      // stage TWO dates on the branch — two separate stagings, the
      // backfill shape; main must not see either until publish
      val staged = pre.filter(pmod(col("okey"), lit(3)) === 0 &&
        col("dt").isin(y1, y2))
      cat.appendToBranch("pv", "wap", staged.filter(col("dt") === y1))
      // the second date stages from SQL — the whole WAP loop runs in
      // plain SQL on the pv layout too (r15: the t@branch seam learned
      // the leaf-tree union)
      staged.filter(col("dt") === y2)
        .createOrReplaceTempView("pvwap_stage2")
      s.sql(s"INSERT INTO $cname.`pv@wap` " +
        "SELECT okey, price_c, dt FROM pvwap_stage2")
      val baseN = s.sql(s"SELECT count(*) FROM $cname.pv").head().getLong(0)
      require(cat.readVersion("pv", 2L).count() == baseN,
        "staged branch rows leaked onto main before publish")
      // the audit half: constraints judge the would-be state — from
      // SQL (the leaf-tree union scan) and from the Scala verb alike
      val stagedN = staged.count()
      require(s.sql(s"SELECT count(*) FROM $cname.`pv@wap`")
        .head().getLong(0) == baseN + stagedN,
        "the SQL audit surface must see base ∪ staged")
      require(cat.auditBranch("pv", "wap") == baseN + stagedN,
        "audit must see base ∪ staged")
      require(cat.diffBranch("pv", "wap").count() == stagedN,
        "diff must answer with exactly the staged rows")
      val v = cat.publishBranch("pv", "wap")
      require(v == 3L && cat.branches("pv").isEmpty,
        s"publish must land ONE commit and consume the branch (v=$v)")
      // CDC over the publish interval = exactly the staged rows
      val feed = cat.changesBetween("pv", 2L, 3L, Seq("okey"))
      require(feed.filter(col("change_type") =!= "insert").count() == 0L &&
        feed.count() == stagedN,
        "the publish feed must classify as pure inserts of the staged rows")
      // a dropped branch leaves the head byte-identical: same version,
      // same leaf file names
      def headLeafFiles(): Set[String] = {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(scratch.toString, "pv",
          s"_v${cat.currentVersion("pv").get}")
        val st = java.nio.file.Files.walk(root)
        try st.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(p => root.relativize(p).toString).toSet
        finally st.close()
      }
      val before = headLeafFiles()
      cat.appendToBranch("pv", "junk",
        pre.filter(pmod(col("okey"), lit(7)) === 0))
      cat.dropBranch("pv", "junk")
      require(cat.currentVersion("pv").contains(3L) &&
        headLeafFiles() == before,
        "a dropped branch must leave the head byte-identical")
      // REPLACE leg (r16 verdict next #3): GDPR-excise okey%5==0 from
      // the y1 partition UNDER AUDIT — stage the rewritten partition
      // on a replace-mode branch, audit the would-be state, publish
      // the partition swap as one commit, CDC classifies the replace
      val headN = baseN + stagedN
      val y1head = s.sql(
        s"SELECT count(*) FROM $cname.pv WHERE dt = '$y1'")
        .head().getLong(0)
      val survivors = cat.read("pv")
        .filter(col("dt") === y1 && pmod(col("okey"), lit(5)) =!= 0)
      val survN = survivors.count()
      // stage through the SQL face: INSERT OVERWRITE t@branch is the
      // dynamic-partition replace under audit (r16)
      survivors.createOrReplaceTempView("pvwap_gdpr_stage")
      s.sql(s"INSERT OVERWRITE $cname.`pv@gdpr` " +
        "SELECT okey, price_c, dt FROM pvwap_gdpr_stage")
      // the SQL face derives claims from the staged rows' OWN tuples;
      // under the evolved (dt, bucket(okey,2)) spec a y1 bucket no
      // survivor happens to land in would escape the claim — claim any
      // missing (y1, bucket) tuple explicitly (the zero-row dropParts
      // staging, a partition DROP under audit)
      val presentBuckets = survivors
        .select(pmod(hash(col("okey")), lit(2)).cast("string").as("b"))
        .distinct().collect().map(_.getString(0)).toSet
      val missingBuckets = Seq("0", "1").filterNot(presentBuckets)
        .map(b => Seq(Some(y1), Some(b)))
      if (missingBuckets.nonEmpty)
        cat.replacePartitionsOnBranch("pv", "gdpr",
          pre.filter(lit(false)), dropParts = missingBuckets)
      require(s.sql(s"SELECT count(*) FROM $cname.pv").head().getLong(0)
        == headN, "main must be untouched by replace staging")
      require(s.sql(s"SELECT count(*) FROM $cname.`pv@gdpr` " +
        s"WHERE dt = '$y1'").head().getLong(0) == survN,
        "the SQL audit must serve the rewritten partition")
      require(cat.auditBranch("pv", "gdpr") == headN - y1head + survN,
        "the branch view is base minus the claimed leaf plus staged")
      val vR = cat.publishBranch("pv", "gdpr")
      require(cat.branches("pv").isEmpty,
        "publish must consume the replace branch")
      // the KEYED feed nets the unchanged survivors out: the excised
      // rows classify as pure deletes and nothing else survives
      val feedR = cat.changesBetween("pv", vR - 1L, vR, Seq("okey"))
      require(feedR.filter(col("change_type") === "delete").count()
        == y1head - survN &&
        feedR.filter(col("change_type") =!= "delete").count() == 0L,
        "the keyed replace feed must be exactly the excised deletes")
      // result: per-date head state + published insert/replace counts
      val headAgg = s.sql(s"SELECT dt, CAST(count(*) AS BIGINT) AS n_now, " +
        s"sum(price_c) AS sum_now_c FROM $cname.pv GROUP BY dt")
      val pubAgg = feed.groupBy("dt")
        .agg(count(lit(1)).cast("long").as("n_pub"))
      headAgg.join(pubAgg, Seq("dt"), "left")
        .select(col("dt"), col("n_now"), col("sum_now_c"),
          coalesce(col("n_pub"), lit(0L)).as("n_pub"),
          when(col("dt") === y1, lit(survN)).otherwise(lit(0L))
            .cast("long").as("n_repl"))
    }),
      Some("""WITH pre AS (SELECT o_orderkey AS okey,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             |  CAST(year(o_orderdate) AS VARCHAR) AS dt FROM orders),
             |head AS (SELECT * FROM pre WHERE okey % 3 <> 0
             |  OR dt IN ((SELECT min(dt) FROM pre),
             |            (SELECT max(dt) FROM pre))),
             |head2 AS (SELECT * FROM head
             |  WHERE NOT (dt = (SELECT min(dt) FROM pre)
             |             AND okey % 5 = 0)),
             |pub AS (SELECT dt, CAST(count(*) AS BIGINT) AS n_pub
             |  FROM pre WHERE okey % 3 = 0
             |  AND dt IN ((SELECT min(dt) FROM pre),
             |             (SELECT max(dt) FROM pre)) GROUP BY dt),
             |repl AS (SELECT dt, CAST(count(*) AS BIGINT) AS n_repl
             |  FROM head WHERE dt = (SELECT min(dt) FROM pre)
             |  AND okey % 5 <> 0 GROUP BY dt)
             |SELECT h.dt AS dt, h.n_now, h.sum_now_c,
             |  COALESCE(p.n_pub, 0) AS n_pub,
             |  COALESCE(r.n_repl, 0) AS n_repl
             |FROM (SELECT dt, CAST(count(*) AS BIGINT) AS n_now,
             |    CAST(sum(price_c) AS BIGINT) AS sum_now_c
             |  FROM head2 GROUP BY dt) h
             |LEFT JOIN pub p ON h.dt = p.dt
             |LEFT JOIN repl r ON h.dt = r.dt""".stripMargin)),

    // ------------------- LAZY partition-spec evolution (r13 verdict #2)
    // The Iceberg rule: evolving a spec moves ZERO data — old files
    // keep the old layout (and their exact names, pinned by the
    // in-query require), new writes land in a fresh hidden `_g1`
    // subtree under the new spec, and the union read prunes each
    // generation under its own spec. The eager rewrite stays as the
    // compaction that collapses generations; the require() pins that
    // the multi-generation pruned read and the compacted table agree
    // row-for-row, and the oracle replays the whole thing relationally.
    "x_repartition_lazy" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_lz", dir)
      val cname = "glz_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val pre = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"),
        month(col("o_orderdate")).cast("int").as("m"))
      s.sql(s"CREATE TABLE $cname.lz (okey BIGINT, price_c BIGINT, " +
        "y STRING, m INT) PARTITIONED BY (y)")
      cat.insertPartitioned("lz", pre.filter(pmod(col("okey"), lit(2)) === 0))
      def allFiles(): Set[String] = {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.walk(
          java.nio.file.Paths.get(scratch.toString, "lz"))
        try st.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(_.toString).toSet
        finally st.close()
      }
      val before = allFiles()
      cat.repartitionTableLazy("lz",
        Seq(("identity", "y", 0), ("identity", "m", 0)))
      require(allFiles() == before,
        "lazy evolution must move ZERO data files (metadata-only)")
      cat.insertPartitioned("lz",
        pre.filter(pmod(col("okey"), lit(2)) === 1))
      require(allFiles().intersect(before) == before,
        "the old generation's files must survive byte-identical")
      require({
        import scala.jdk.CollectionConverters._
        val g1 = java.nio.file.Paths.get(scratch.toString, "lz", "_g1")
        val st = java.nio.file.Files.walk(g1, 2)
        try st.iterator().asScala.exists(
          _.getFileName.toString.startsWith("m="))
        finally st.close()
      }, "post-evolution inserts must land in the NESTED (y, m) layout")
      // the pruned union read: one scan per generation, each with its
      // own partition filter, one year served
      val y0 = cat.readPartitioned("lz").select(min(col("y")))
        .head().getString(0)
      val prunedRead = cat.readPartitioned("lz").filter(col("y") === y0)
      val scans = prunedRead.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      require(scans.size == 2 && scans.forall(_.partitionFilters.nonEmpty),
        s"the union read must prune BOTH generations (${scans.size} scans)")
      val multiRows = prunedRead.groupBy(col("y"), col("m"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("price_c")).as("sum_c"))
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq
      // the SQL surface serves the SAME multi-generation union (the
      // composite per-generation scan — no compaction needed to query)
      val sqlMulti = s.sql(s"SELECT y, m, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.lz WHERE y = '$y0' " +
        "GROUP BY y, m")
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq
      require(sqlMulti == multiRows,
        "the SQL multi-generation read must match the Scala union")
      // row-level DML ACROSS generations without compacting (r14 next
      // #4): the purge and the update each route per generation —
      // okey%50=0 hits even keys (gen0) and odd ones (gen1), okey%7=0
      // likewise — rewriting only affected leaves in each subtree
      val (affT, _) = cat.deleteWhereParts("lz", Seq("y"),
        pmod(col("okey"), lit(50)) === 0)
      require(affT.nonEmpty, "the cross-generation purge must claim leaves")
      val updN = cat.updateWhereParts("lz",
        pmod(col("okey"), lit(7)) === 0,
        Seq("price_c" -> (col("price_c") + lit(5L))))
      require(updN > 0L, "the cross-generation update must touch rows")
      require(cat.specGenerations("lz").size == 2,
        "DML must route per generation, never force a compaction")
      // post-DML multi-generation state, re-read pruned
      val multiRows2 = s.sql(s"SELECT y, m, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.lz WHERE y = '$y0' " +
        "GROUP BY y, m")
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq
      // compact: the generations collapse into one (y, m) tree and the
      // SQL surface serves it again — values identical to the
      // multi-generation pruned read
      cat.repartitionTableTransformed("lz",
        Seq(("identity", "y", 0), ("identity", "m", 0)))
      require(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(scratch.toString, "lz", "_g1")),
        "compaction must collapse the lazy generation away")
      val out = s.sql(s"SELECT y, m, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.lz WHERE y = '$y0' " +
        "GROUP BY y, m")
      val sqlRows = out.collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq
      require(sqlRows == multiRows2,
        "the multi-generation post-DML read and the compacted table " +
          "must agree row-for-row")
      out
    }),
      Some("""WITH pre AS (SELECT o_orderkey AS okey,
             |  CAST(year(o_orderdate) AS VARCHAR) AS y,
             |  CAST(month(o_orderdate) AS INT) AS m,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders),
             |kept AS (SELECT y, m, CASE WHEN okey % 7 = 0
             |    THEN price_c + 5 ELSE price_c END AS price_c
             |  FROM pre WHERE okey % 50 <> 0)
             |SELECT y, m, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(price_c) AS BIGINT) AS sum_c
             |FROM kept WHERE y = (SELECT min(y) FROM pre)
             |GROUP BY y, m""".stripMargin)),

    // -------- LAZY spec evolution on a partitioned VERSIONED fact
    // (r14 verdict next #5): the generation sidecar composes with the
    // `_vN` snapshot tree — evolving moves ZERO data (pinned by the
    // file census), post-evolution appends nest a `_g1` subtree INSIDE
    // each new snapshot, reads (Scala and SQL) union the generations
    // each pruned under its own spec, time travel reaches
    // pre-evolution snapshots under the OLD spec, CDC classifies
    // across the boundary, and compactGenerationsVersioned collapses
    // the generations as one snapshot commit. Oracle = the final
    // relational state.
    "x_pv_repartition_lazy" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_pvlz", dir)
      val cname = "gpl_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val pre = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"),
        month(col("o_orderdate")).cast("int").as("m"))
      s.sql(s"CREATE TABLE $cname.plz (okey BIGINT, price_c BIGINT, " +
        "y STRING, m INT) PARTITIONED BY (y) " +
        "TBLPROPERTIES ('versioned'='true')")
      cat.appendPartitionedVersioned("plz",
        pre.filter(pmod(col("okey"), lit(2)) === 0))            // v2
      def snapFiles(v: Long): Set[String] = {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(scratch.toString, "plz", s"_v$v")
        val st = java.nio.file.Files.walk(root)
        try st.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(p => root.relativize(p).toString).toSet
        finally st.close()
      }
      val v2files = snapFiles(2L)
      cat.repartitionTableLazy("plz",
        Seq(("identity", "y", 0), ("identity", "m", 0)))
      require(cat.currentVersion("plz").contains(2L) &&
        snapFiles(2L) == v2files && cat.partitionSpecVersioned("plz"),
        "pv lazy evolution must be metadata-only and keep the flag")
      cat.appendPartitionedVersioned("plz",
        pre.filter(pmod(col("okey"), lit(2)) === 1))            // v3
      require(snapFiles(3L).filterNot(_.startsWith("_g1/")) == v2files,
        "the carry must hard-link the old generation's files by name; " +
          "new rows nest in the snapshot's _g1 subtree")
      require(snapFiles(3L).exists(_.startsWith("_g1/")),
        "post-evolution appends must land in the _g1 subtree")
      // time travel reaches the PRE-evolution snapshot under the OLD spec
      val evens = pre.filter(pmod(col("okey"), lit(2)) === 0).count()
      require(s.sql(s"SELECT count(*) FROM $cname.plz VERSION AS OF 2")
        .head().getLong(0) == evens,
        "VERSION AS OF must serve the pre-evolution snapshot")
      require(cat.readVersion("plz", 2L).count() == evens,
        "Scala time travel must serve the pre-evolution snapshot")
      // CDC across the evolution boundary: v2→v3 is exactly the odds
      val feed = cat.changesBetween("plz", 2L, 3L, Seq("okey"))
      require(feed.filter(col("change_type") =!= "insert").count() == 0L &&
        feed.count() == pre.count() - evens,
        "the cross-evolution feed must classify the _g1 rows as inserts")
      // row-level DELETE crosses the generations as ONE snapshot commit
      // (okey%50=0 hits evens in gen0 and odds in _g1); time travel
      // keeps the pre-delete multi-generation state
      val vPre = cat.currentVersion("plz").get
      val (affD, _) = cat.deleteWherePartsVersioned("plz",
        pmod(col("okey"), lit(50)) === 0)
      require(affD.nonEmpty &&
        cat.currentVersion("plz").contains(vPre + 1L),
        "the cross-generation purge must land as ONE snapshot commit")
      require(cat.readVersion("plz", vPre).count() == pre.count(),
        "time travel must keep the pre-delete multi-generation state")
      // the SQL multi-generation read prunes + serves both layouts
      val y0 = s.sql(s"SELECT min(y) FROM $cname.plz").head().getString(0)
      val multi = s.sql(s"SELECT y, m, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.plz WHERE y = '$y0' " +
        "GROUP BY y, m")
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq
      // compaction collapses the generations as ONE snapshot commit and
      // serves the identical state
      val vc = cat.compactGenerationsVersioned("plz")
      require(cat.specGenerations("plz").size == 1 &&
        cat.currentVersion("plz").contains(vc),
        "compaction must collapse to one generation")
      val out = s.sql(s"SELECT y, m, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.plz WHERE y = '$y0' " +
        "GROUP BY y, m")
      require(out.collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq
        == multi,
        "the multi-generation read and the compacted snapshot must agree")
      out
    }),
      Some("""WITH pre AS (SELECT o_orderkey AS okey,
             |  CAST(year(o_orderdate) AS VARCHAR) AS y,
             |  CAST(month(o_orderdate) AS INT) AS m,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders),
             |kept AS (SELECT y, m, price_c FROM pre WHERE okey % 50 <> 0)
             |SELECT y, m, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(price_c) AS BIGINT) AS sum_c
             |FROM kept WHERE y = (SELECT min(y) FROM pre)
             |GROUP BY y, m""".stripMargin)),

    // ---------------- MULTI-GENERATION pv DML (r16, verdict next #1):
    // after a LAZY spec evolution, the tuple-addressed maintenance
    // verbs — explicit-tuple DROP/OVERWRITE, per-leaf OPTIMIZE, and
    // branch write-audit-publish — all route PER GENERATION instead of
    // refusing until compaction: the evolve-at-need loop has no
    // maintenance outage window. Tuples address the CURRENT spec;
    // matching rows purge from every generation under its own layout,
    // each verb one snapshot commit. The oracle replays the whole
    // sequence relationally in DuckDB.
    "x_pv_multigen_dml" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_pvmg", dir)
      val cname = "gmgd_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val pre = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"),
        month(col("o_orderdate")).cast("int").as("m"))
      s.sql(s"CREATE TABLE $cname.pmd (okey BIGINT, price_c BIGINT, " +
        "y STRING, m INT) PARTITIONED BY (y) " +
        "TBLPROPERTIES ('versioned'='true')")
      cat.appendPartitionedVersioned("pmd",
        pre.filter(pmod(col("okey"), lit(2)) === 0))            // gen0
      cat.repartitionTableLazy("pmd",
        Seq(("identity", "y", 0), ("identity", "m", 0)))
      cat.appendPartitionedVersioned("pmd",
        pre.filter(pmod(col("okey"), lit(2)) === 1))            // _g1
      val y0 = pre.select(min(col("y"))).head().getString(0)
      // (1) explicit-tuple DROP of (y0, m=1): gen0 stores that data
      // inside its y=y0 leaf (m is a data column there), _g1 as its
      // own leaf — both purge, ONE commit, zero rows left behind
      val vd0 = cat.currentVersion("pmd").get
      cat.dropPartitionsVersioned("pmd", Seq(Seq(Some(y0), Some("1"))))
      require(cat.currentVersion("pmd").contains(vd0 + 1L),
        "cross-generation tuple drop must land as ONE commit")
      // (2) explicit-tuple OVERWRITE of (y0, m=2): repricing backfill —
      // the partition's rows are replaced by the doubled originals;
      // old-generation leaves keep their non-matching survivors
      val repl = pre.filter(col("y") === y0 && col("m") === 2)
        .withColumn("price_c", col("price_c") * 2)
      val vo0 = cat.currentVersion("pmd").get
      cat.overwritePartitionTuplesVersioned("pmd", repl,
        Seq(Seq(Some(y0), Some("2"))), vo0)
      require(cat.currentVersion("pmd").contains(vo0 + 1L),
        "cross-generation tuple overwrite must land as ONE commit")
      // (3) per-leaf OPTIMIZE across BOTH generations' layouts:
      // rows must not change, qualifying leaves must shrink
      val beforeN = cat.read("pmd").count()
      val rep = cat.compactPartitionsVersioned("pmd", minFiles = 2)
      require(rep.forall { case (_, b, a) => a < b },
        s"every compacted leaf must shrink its file count: $rep")
      require(cat.read("pmd").count() == beforeN,
        "OPTIMIZE must never change rows")
      // (4) branch write-audit-publish on the multi-generation tree:
      // staged rows (negated keys) land in the current generation's
      // subtree; the SQL audit sees base ∪ staged; publish carries
      // the prefixed leaf paths into the next snapshot
      val staged = pre.filter(pmod(col("okey"), lit(1000)) === 7)
        .withColumn("okey", -col("okey"))
      cat.appendToBranch("pmd", "wap", staged)
      val audit = s.sql(
        s"SELECT count(*) AS n FROM $cname.`pmd@wap` WHERE okey < 0")
        .head().getLong(0)
      require(audit == staged.count(),
        "the branch audit must see exactly the staged rows")
      val vp0 = cat.currentVersion("pmd").get
      cat.publishBranch("pmd", "wap")
      require(cat.currentVersion("pmd").contains(vp0 + 1L),
        "publish must land as ONE commit")
      s.sql(s"SELECT y, m, CAST(count(*) AS BIGINT) AS n, " +
        s"sum(price_c) AS sum_c FROM $cname.pmd WHERE y = '$y0' " +
        "GROUP BY y, m")
    }),
      Some("""WITH pre AS (SELECT o_orderkey AS okey,
             |  CAST(year(o_orderdate) AS VARCHAR) AS y,
             |  CAST(month(o_orderdate) AS INT) AS m,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders),
             |y0 AS (SELECT min(y) AS y0 FROM pre),
             |afterdrop AS (SELECT * FROM pre
             |  WHERE NOT (y = (SELECT y0 FROM y0) AND m = 1)),
             |afterow AS (
             |  SELECT * FROM afterdrop
             |  WHERE NOT (y = (SELECT y0 FROM y0) AND m = 2)
             |  UNION ALL
             |  SELECT okey, y, m, price_c * 2 AS price_c FROM pre
             |  WHERE y = (SELECT y0 FROM y0) AND m = 2),
             |finalt AS (
             |  SELECT * FROM afterow
             |  UNION ALL
             |  SELECT -okey AS okey, y, m, price_c FROM pre
             |  WHERE okey % 1000 = 7)
             |SELECT y, m, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(price_c) AS BIGINT) AS sum_c
             |FROM finalt WHERE y = (SELECT y0 FROM y0)
             |GROUP BY y, m""".stripMargin)),

    // ---------------- per-file skipping INSIDE partitioned leaves
    // (r13 verdict #3): a year-partitioned fact whose non-partition
    // predicate used to read whole leaves now carries per-file
    // envelopes under each leaf dir — ANALYZE runs under the spec's
    // declared schema with a basePath, prunedRead opens only files
    // whose envelope intersects the probe, and the in-query require
    // pins that the probed leaf serves STRICTLY fewer files than it
    // holds. The oracle is the unpruned relational filter — pruning
    // must never change results, only file counts.
    "x_skipping_part" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_skp", dir)
      val cname = "gskp_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val cat = new graft.catalog.TableCatalog(s, scratch.toString)
      val pre = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"))
      s.sql(s"CREATE TABLE $cname.sp (okey BIGINT, price_c BIGINT, " +
        "y STRING) PARTITIONED BY (y)")
      // range-cluster by okey so each leaf holds 4 files with disjoint
      // key ranges — the layout a 100 TB fact would OPTIMIZE into
      cat.insertPartitioned("sp",
        pre.repartitionByRange(4, col("okey")))
      cat.analyze("sp", cols = Seq("okey"), skipCols = Seq("okey"))
      // bounds as exact ORDER STATISTICS (45th/55th percentile keys),
      // not min/max arithmetic: a synthesized key domain can be
      // arbitrarily clustered, leaving an arithmetic mid-range empty
      val nk = pre.count()
      def kth(k: Long): Long = pre.select(col("okey")).orderBy(col("okey"))
        .offset(k.toInt).limit(1).head().getLong(0)
      val (loK, hiK) = (kth(nk * 45 / 100), kth(nk * 55 / 100))
      val prunedDf = cat.prunedRead("sp", Seq(("okey", loK, hiK)))
      // evidence: inside a leaf that HOLDS matches, strictly fewer
      // files open than the leaf serves (file skipping composes with
      // the directory layout — the leaf alone could not prune this)
      val kept = prunedDf.inputFiles.toSet
      val y0 = prunedDf.select(min(col("y"))).head().getString(0)
      def leafFiles(y: String): Set[String] = {
        import scala.jdk.CollectionConverters._
        val d = java.nio.file.Paths.get(scratch.toString, "sp", s"y=$y")
        val st = java.nio.file.Files.list(d)
        try st.iterator().asScala.map(_.toUri.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally st.close()
      }
      val leaf = leafFiles(y0)
      val keptInLeaf = kept.count(_.contains(s"/y=$y0/"))
      require(keptInLeaf > 0 && keptInLeaf < leaf.size,
        s"file skipping inside leaf y=$y0 must open strictly fewer " +
          s"files than the leaf holds ($keptInLeaf of ${leaf.size})")
      prunedDf.groupBy(col("y"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("price_c")).as("sum_c"))
    }),
      Some("""WITH pre AS (SELECT o_orderkey AS okey,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             |  CAST(year(o_orderdate) AS VARCHAR) AS y FROM orders),
             |b AS (SELECT
             |  (SELECT okey FROM pre ORDER BY okey LIMIT 1 OFFSET
             |    (SELECT count(*) * 45 // 100 FROM pre)) AS a,
             |  (SELECT okey FROM pre ORDER BY okey LIMIT 1 OFFSET
             |    (SELECT count(*) * 55 // 100 FROM pre)) AS z)
             |SELECT y, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(price_c) AS BIGINT) AS sum_c
             |FROM pre, b
             |WHERE okey >= a AND okey <= z
             |GROUP BY y""".stripMargin)),

    // ------------------------- change feed across OPTIMIZE (dataChange)
    // OPTIMIZE commits rename every file while provably preserving
    // content, so the feed treats them as dataChange=false (the Delta
    // rule): the in-query require()s pin that (a) a maintenance-only
    // interval answers from commit metadata with ZERO files listed and
    // (b) the feed across append→OPTIMIZE→append opens only the four
    // appended files — the direct name diff would re-read the whole
    // compacted table just to discover the rewrite changed nothing.
    "x_cdc_dchange" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_cdcd", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey"),
        cents(col("c_acctbal")).as("bal_c"),
        col("c_nationkey").cast("long").as("nk"))
      val v1 = cat.appendAtomic("dc_cust",
        c.filter(pmod(col("ckey"), lit(3)) === 1).repartition(2))
      val v2 = cat.appendAtomic("dc_cust",
        c.filter(pmod(col("ckey"), lit(3)) === 2).repartition(2))
      val v3 = { cat.compactSmallFiles("dc_cust")
        cat.currentVersion("dc_cust").get }
      require(v3 == v2 + 1, s"OPTIMIZE must commit one version, got $v3")
      val (_, _, a0, r0) = cat.changedRowsBetween("dc_cust", v2, v3)
      require(a0.isEmpty && r0.isEmpty,
        s"maintenance-only interval must be empty metadata-only, got " +
          s"${a0.size} added / ${r0.size} removed")
      val v4 = cat.appendAtomic("dc_cust",
        c.filter(pmod(col("ckey"), lit(3)) === 0).repartition(2))
      val feed = cat.changesBetween("dc_cust", v1, v4, Seq("ckey"))
      require(feed.inputFiles.length <= 4,
        s"dataChange=false violated: feed across OPTIMIZE read " +
          s"${feed.inputFiles.length} files where the appends wrote 4")
      feed
    }),
      Some("""WITH c AS (SELECT c_custkey AS ckey,
             |  CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c,
             |  CAST(c_nationkey AS BIGINT) AS nk FROM customer)
             |SELECT ckey, 'insert' AS change_type, bal_c, nk
             |FROM c WHERE ckey % 3 <> 1""".stripMargin)),

    // ----------------------------- SQL DML through the versioned catalog
    // The write half of the DSv2 surface (r10): CREATE TABLE AS /
    // INSERT INTO / INSERT OVERWRITE in PLAIN SQL resolve to the
    // catalog's own commit verbs via the V1Write bridge — each SQL
    // statement is a real versioned commit (lock, hard-link carry,
    // history entry, change-feed visibility). The require() pins the
    // logged verb sequence; the output joins the current snapshot to
    // the pre-overwrite version, so a write that bypassed the pointer
    // (or an overwrite that failed to retain v3) fails the hash.
    "x_sql_insert" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_sqlins", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val cname = "gins_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nkey"),
        col("n_name"),
        col("n_regionkey").cast("long").as("rkey"))
        .createOrReplaceTempView(s"${cname}_nation")
      s.sql(s"""CREATE TABLE $cname.sn AS
               |SELECT nkey, n_name, rkey FROM ${cname}_nation
               |WHERE nkey % 2 = 0""".stripMargin)
      s.sql(s"""INSERT INTO $cname.sn
               |SELECT nkey, n_name, rkey FROM ${cname}_nation
               |WHERE nkey % 2 = 1""".stripMargin)
      val vPre = cat.currentVersion("sn").get
      s.sql(s"""INSERT OVERWRITE $cname.sn
               |SELECT nkey, n_name, rkey + 100 AS rkey FROM $cname.sn""".stripMargin)
      val ops = cat.history("sn").orderBy("version")
        .select("op").collect().map(_.getString(0)).toSeq
      require(ops == Seq("REPLACE", "APPEND", "APPEND", "REPLACE"),
        s"SQL DML must land as commit verbs, history logged $ops")
      s.sql(s"""SELECT cur.nkey, cur.n_name, cur.rkey, old.rkey AS rkey_v1
               |FROM $cname.sn AS cur
               |JOIN (SELECT nkey, rkey FROM $cname.sn VERSION AS OF $vPre) old
               |  ON cur.nkey = old.nkey""".stripMargin)
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name,
             |  CAST(n_regionkey + 100 AS BIGINT) AS rkey,
             |  CAST(n_regionkey AS BIGINT) AS rkey_v1
             |FROM nation""".stripMargin)),

    // ------------------------------- CHECK constraints (write invariants)
    // Delta-model invariants enforced INLINE in the write's own scan
    // (when/raise_error filter — no second validation pass): the
    // require()s pin that a violating batch fails BEFORE the commit
    // point (pointer unmoved, content clean) and that ALTER refuses a
    // constraint existing rows violate. The output aggregates the final
    // table; had the violating batch leaked — or the valid one been
    // blocked — the counts and sums fail the hash.
    "x_constraints" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_cons", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      val v1 = cat.replaceAtomic("co", o.filter(col("okey") % 2 === 0))
      cat.addConstraint("co", "total_nonneg", "total_c >= 0")
      val altered =
        try { cat.addConstraint("co", "okey_tiny", "okey < 100"); true }
        catch { case _: IllegalArgumentException => false }
      require(!altered, "ALTER must refuse a constraint existing rows violate")
      val failed =
        try { cat.appendAtomic("co", o.filter(col("okey") % 2 === 1)
            .withColumn("total_c", -col("total_c") - 1)); false }
        catch { case _: Exception => true }
      require(failed, "a violating append must fail the write job")
      require(cat.currentVersion("co").contains(v1),
        "violating append moved the version pointer")
      cat.appendAtomic("co", o.filter(col("okey") % 2 === 1))
      cat.read("co").groupBy((col("okey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("total_c")).as("sum_c"))
    }),
      Some("""SELECT o_orderkey % 10 AS bucket, count(*) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM orders GROUP BY 1""".stripMargin)),

    // --------------------------- multi-table transactions (catalog pins)
    // commitAll + readConsistent: cross-table snapshot isolation on top
    // of the per-table pointers. The require() pins the torn-read
    // scenario this exists for — a single-table commit advances the
    // BARE fact pointer while the consistent view stays on the last
    // catalog snapshot (fact and dim all-old) — and the output joins
    // fact to dim through the consistent view after the second txn, so
    // a pin resolving to the wrong version fails the hash.
    "x_txn" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_txn", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        col("o_custkey").cast("long").as("ckey"),
        cents(col("o_totalprice")).as("total_c"))
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey"),
        col("c_nationkey").cast("long").as("nk"))
      val evens = o.filter(col("okey") % 2 === 0)
      cat.commitAll(replace = Seq("tx_fact" -> evens, "tx_dim" -> c))
      val nEven = evens.count()
      // a lone single-table commit = the torn state a crash (or an
      // interleaved writer) produces: bare readers move, consistent
      // readers do not
      cat.replaceAtomic("tx_fact", o)
      require(cat.read("tx_fact").count() > nEven,
        "bare pointer must see the single-table commit")
      require(cat.readConsistent("tx_fact").count() == nEven,
        "consistent view must stay on the catalog snapshot")
      val c2 = cat.commitAll(replace = Seq("tx_fact" -> o))
      require(cat.catalogPins(c2).contains("tx_dim"),
        "untouched tables must carry their pins forward")
      // the consistent read in PLAIN SQL: the `c<N>` namespace resolves
      // every table as generation c2 pinned it
      val cname = "gtxn_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      s.sql(s"""SELECT d.nk, count(*) AS n, sum(f.total_c) AS sum_c
               |FROM $cname.c$c2.tx_fact f
               |JOIN $cname.c$c2.tx_dim d ON f.ckey = d.ckey
               |GROUP BY d.nk""".stripMargin)
    }),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin)),

    // ---------- multi-table txn with a PARTITIONED VERSIONED member
    // (r15): a date-partitioned versioned fact and its flat dim commit
    // as ONE catalog flip — the pv member stages its leaf tree
    // unlocked (spec-pinned) and lands as one snapshot inside the txn;
    // consistent readers never see the fact without its dim,
    // catalog time travel reaches the pv snapshot, and the `c<N>` SQL
    // namespace serves the pinned pv version with leaf pruning. The
    // oracle replays the final joined state relationally.
    "x_pv_txn" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_pvtxn", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val pre = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("dt"),
        pmod(col("o_orderkey"), lit(25)).cast("long").as("nk"))
      val dim = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nk"),
        col("n_name").as("name"))
      cat.createPartitionedVersioned("pxf", pre.schema, Seq("dt"))
      val evens = pre.filter(pmod(col("okey"), lit(2)) === 0)
      val c1 = cat.commitAll(
        replace = Seq("pxd" -> dim.withColumn("gen", lit(1L))),
        append = Seq("pxf" -> evens))
      val nEven = evens.count()
      // a lone pv append outside the txn (the odds, minus the slice
      // the NEXT txn will land): bare readers move, the consistent
      // view stays on the catalog snapshot
      cat.appendPartitionedVersioned("pxf",
        pre.filter(pmod(col("okey"), lit(2)) === 1 &&
          pmod(col("okey"), lit(1000)) =!= 999))
      require(cat.read("pxf").count() > nEven,
        "the bare pointer must see the single-table pv append")
      require(cat.readConsistent("pxf").count() == nEven,
        "the consistent view must stay on the catalog snapshot")
      val c2 = cat.commitAll(
        replace = Seq("pxd" -> dim.withColumn("gen", lit(2L))),
        append = Seq("pxf" ->
          pre.filter(pmod(col("okey"), lit(1000)) === 999)))
      // catalog time travel reaches the c1-pinned pv snapshot
      require(cat.readConsistentAt("pxf", c1).count() == nEven,
        "catalog time travel must serve the pv member's old snapshot")
      require(cat.readConsistentAt("pxd", c1)
        .select(max(col("gen"))).head().getLong(0) == 1L,
        "catalog time travel must pair the OLD dim with the old fact")
      // the c<N> SQL namespace serves the pinned pv fact (leaf tree
      // under the declared spec) joined to its generation's dim
      val cname = "gpx_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      s.sql(s"""SELECT f.dt, d.name, CAST(count(*) AS BIGINT) AS n,
               |sum(f.price_c) AS sum_c
               |FROM $cname.c$c2.pxf f
               |JOIN $cname.c$c2.pxd d ON f.nk = d.nk
               |GROUP BY f.dt, d.name""".stripMargin)
    }),
      Some("""WITH f AS (SELECT
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             |  CAST(year(o_orderdate) AS VARCHAR) AS dt,
             |  o_orderkey % 25 AS nk FROM orders)
             |SELECT f.dt, n.n_name AS name, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(f.price_c) AS BIGINT) AS sum_c
             |FROM f JOIN nation n ON f.nk = n.n_nationkey
             |GROUP BY f.dt, n.n_name""".stripMargin)),

    // ----------------------- SQL ALTER TABLE ADD COLUMN (evolution DDL)
    // Additive evolution from PLAIN SQL: ALTER commits a zero-row
    // mergeSchema append (no data rewritten — old files null-fill on
    // read), and the next INSERT carries the new column. The output
    // unions pre- and post-evolution rows, so a wrong union schema, a
    // lost null-fill, or an ALTER that rewrote/dropped rows fails the
    // hash.
    "x_sql_alter" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_sqlalter", dir)
      new TableCatalog(s, scratch.toString) // root laid out
      val cname = "galt_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nkey"),
        col("n_name"),
        col("n_regionkey").cast("long").as("rkey"))
        .createOrReplaceTempView(s"${cname}_nation")
      s.sql(s"""CREATE TABLE $cname.an AS
               |SELECT nkey, n_name FROM ${cname}_nation""".stripMargin)
      s.sql(s"ALTER TABLE $cname.an ADD COLUMN rkey BIGINT")
      s.sql(s"""INSERT INTO $cname.an
               |SELECT nkey + 100, n_name, rkey FROM ${cname}_nation""".stripMargin)
      s.sql(s"""SELECT nkey, n_name, coalesce(rkey, -1L) AS rkey
               |FROM $cname.an""".stripMargin)
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name,
             |  CAST(-1 AS BIGINT) AS rkey FROM nation
             |UNION ALL
             |SELECT CAST(n_nationkey + 100 AS BIGINT), n_name,
             |  CAST(n_regionkey AS BIGINT) FROM nation""".stripMargin)),

    // --------------------- change feed shipped to Structured Streaming
    // shipFeed materializes the classified feed as one atomic
    // `commit_version=<v>/` partition per commit, and STOCK Structured
    // Streaming tails it (readStream.parquet — no custom source). The
    // require()s pin per-version idempotence (a replay with a lost
    // checkpoint ships zero new files) and that the OPTIMIZE commit
    // shipped nothing (dataChange=false); the output is everything the
    // file stream delivered, hashed against the oracle's replay of all
    // three contentful commits.
    "x_cdc_stream" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      import graft.streaming.ChangeFeed
      import java.nio.file.Files
      val scratch = scratchDir("graft_cdcs", dir)
      val cat = new TableCatalog(s, scratch.resolve("wh").toString)
      val feedDir = scratch.resolve("feed")
      val ckpt = scratch.resolve("offsets/cs.offset")
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ckey"),
        cents(col("c_acctbal")).as("bal_c"),
        col("c_nationkey").cast("long").as("nk"))
      cat.appendAtomic("cs_cust",
        c.filter(pmod(col("ckey"), lit(3)) =!= 0).repartition(2))
      ChangeFeed.shipFeed(cat, "cs_cust", Seq("ckey"), feedDir, ckpt)
      cat.appendAtomic("cs_cust",
        c.filter(pmod(col("ckey"), lit(3)) === 0).repartition(2))
      cat.compactSmallFiles("cs_cust") // dataChange=false: ships nothing
      val next = c.filter(pmod(col("ckey"), lit(5)) =!= 0)
        .withColumn("bal_c", when(pmod(col("ckey"), lit(7)) === 0,
          col("bal_c") + 100).otherwise(col("bal_c")))
      cat.replaceAtomic("cs_cust", next)
      ChangeFeed.shipFeed(cat, "cs_cust", Seq("ckey"), feedDir, ckpt)
      val shipped = {
        import scala.jdk.CollectionConverters._
        val l = Files.list(feedDir)
        try l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("commit_version=")).toSeq.sorted
        finally l.close()
      }
      require(shipped == Seq("commit_version=1", "commit_version=2",
        "commit_version=4"),
        s"OPTIMIZE must ship nothing, replays nothing twice: $shipped")
      Files.delete(ckpt) // lost checkpoint: the replay must ship 0 files
      val before = s.read.parquet(feedDir.toString).inputFiles.toSet
      ChangeFeed.shipFeed(cat, "cs_cust", Seq("ckey"), feedDir, ckpt)
      require(s.read.parquet(feedDir.toString).inputFiles.toSet == before,
        "a replayed shipFeed double-shipped files")
      val sch = s.read.parquet(feedDir.toString).schema
      val outDir = scratch.resolve("out")
      s.readStream.schema(sch).parquet(feedDir.toString)
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", scratch.resolve("sckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(180000)
      s.read.parquet(outDir.toString)
        .select(col("ckey"), col("change_type"), col("bal_c"), col("nk"),
          col("commit_version"))
    }),
      Some("""WITH c AS (SELECT c_custkey AS ckey,
             |  CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c,
             |  CAST(c_nationkey AS BIGINT) AS nk FROM customer)
             |SELECT ckey, 'insert' AS change_type, bal_c, nk,
             |  CAST(1 AS BIGINT) AS commit_version
             |FROM c WHERE ckey % 3 <> 0
             |UNION ALL
             |SELECT ckey, 'insert', bal_c, nk, CAST(2 AS BIGINT)
             |FROM c WHERE ckey % 3 = 0
             |UNION ALL
             |SELECT ckey, 'delete', CAST(NULL AS BIGINT),
             |  CAST(NULL AS BIGINT), CAST(4 AS BIGINT)
             |FROM c WHERE ckey % 5 = 0
             |UNION ALL
             |SELECT ckey, 'update', bal_c + 100, nk, CAST(4 AS BIGINT)
             |FROM c WHERE ckey % 5 <> 0 AND ckey % 7 = 0""".stripMargin)),

    // --------------------------------- SQL DELETE through the catalog
    // DELETE FROM in plain SQL: the predicate arrives as DSv2 V2
    // predicates and translates node-for-node (including the % the V1
    // filter bridge silently drops — the motivating bug: a scan-style
    // conversion losing one OR branch is a silent PARTIAL delete);
    // survivors re-commit as one versioned snapshot. The require()s
    // pin the changesBetween classification (deletes only, exact
    // count); the oracle replays the complement on raw orders.
    "x_sql_delete" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_sqldel", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val cname = "gdel_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      val v1 = cat.replaceAtomic("del_o", o)
      val nBefore = o.count()
      s.sql(s"DELETE FROM $cname.del_o WHERE okey % 10 = 0 OR total_c < 2000000")
      val feed = cat.changesBetween("del_o", v1, v1 + 1, Seq("okey"))
      val byType = feed.groupBy("change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(byType.keySet == Set("delete"),
        s"DELETE must classify as deletes only, got $byType")
      require(byType("delete") ==
        nBefore - cat.read("del_o").count(),
        "feed delete count != rows removed")
      cat.read("del_o")
        .agg(count(lit(1)).as("n"), sum(col("total_c")).as("sum_c"),
          min(col("okey")).as("min_okey"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_c,
             |  CAST(min(o_orderkey) AS BIGINT) AS min_okey
             |FROM orders
             |WHERE NOT (o_orderkey % 10 = 0
             |  OR CAST(floor(o_totalprice * 100) AS BIGINT) < 2000000)
             |""".stripMargin)),

    // ------------------------------------- SQL UPDATE (row-level op)
    // `UPDATE g.t SET … WHERE …` through the DSv2 group-based row-level
    // path: Spark plans ReplaceData over the operation's scan, the
    // replacement rows stage through the stock parquet BatchWrite, and
    // replaceFromStaged renames them into the next snapshot (1× write
    // amplification, optimistic version check). The require()s pin the
    // parts the oracle can't see: the history op is UPDATE, the change
    // feed classifies EXACTLY the touched keys as updates (zero
    // inserts/deletes — the group-granularity scan contract; a scan
    // that honored pushed filters would delete every untouched row).
    "x_sql_update" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_sqlupd", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val cname = "gupd_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      val v1 = cat.replaceAtomic("upd_o", o)
      val nTouched = o.filter(col("okey") % 7 === 3).count()
      s.sql(s"UPDATE $cname.upd_o SET total_c = total_c + 100 " +
        "WHERE okey % 7 = 3")
      require(cat.history("upd_o").orderBy("version").select("op")
        .collect().map(_.getString(0)).last == "UPDATE",
        "history must log the UPDATE commit")
      val byType = cat.changesBetween("upd_o", v1, v1 + 1, Seq("okey"))
        .groupBy("change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(byType == Map("update" -> nTouched),
        s"UPDATE must classify exactly the touched keys, got $byType")
      require(cat.read("upd_o").count() == o.count(),
        "untouched rows must survive the rewrite")
      cat.read("upd_o")
        .agg(count(lit(1)).as("n"), sum(col("total_c")).as("sum_c"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)
             |    + CASE WHEN o_orderkey % 7 = 3 THEN 100 ELSE 0 END)
             |    AS BIGINT) AS sum_c
             |FROM orders""".stripMargin)),

    // --------------------------------------- SQL MERGE INTO (row-level)
    // All three action kinds in one statement — WHEN MATCHED AND <cond>
    // DELETE / WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT — through
    // the same ReplaceData path, committed as ONE versioned snapshot.
    // Target = orders with okey%3!=0; source = orders with okey%2=0, so
    // matched keys are {%3!=0, %2=0}, inserts are {%3=0, %2=0}, and the
    // oracle replays the action arithmetic over plain orders.
    "x_sql_merge" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_sqlmrg", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val cname = "gmrg_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      val v1 = cat.replaceAtomic("mrg_t", o.filter(col("okey") % 3 =!= 0))
      o.filter(col("okey") % 2 === 0).createOrReplaceTempView("mrg_src")
      s.sql(
        s"""MERGE INTO $cname.mrg_t AS t USING mrg_src AS s ON t.okey = s.okey
           |WHEN MATCHED AND s.total_c < 5000000 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET total_c = s.total_c + 7
           |WHEN NOT MATCHED THEN INSERT (okey, total_c)
           |  VALUES (s.okey, s.total_c)
           |""".stripMargin)
      require(cat.history("mrg_t").orderBy("version").select("op")
        .collect().map(_.getString(0)).last == "MERGE",
        "history must log the MERGE commit")
      val byType = cat.changesBetween("mrg_t", v1, v1 + 1, Seq("okey"))
        .groupBy("change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(Set("insert", "update", "delete").subsetOf(byType.keySet),
        s"all three MERGE action kinds must land, got $byType")
      cat.read("mrg_t")
        .agg(count(lit(1)).as("n"), sum(col("total_c")).as("sum_c"),
          sum(col("okey")).as("sum_okey"))
    }),
      Some("""WITH oc AS (SELECT o_orderkey AS okey,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS total_c
             |  FROM orders),
             |merged AS (
             |  SELECT okey, total_c FROM oc
             |  WHERE okey % 3 <> 0 AND okey % 2 <> 0
             |  UNION ALL
             |  SELECT okey, total_c + 7 FROM oc
             |  WHERE okey % 3 <> 0 AND okey % 2 = 0 AND total_c >= 5000000
             |  UNION ALL
             |  SELECT okey, total_c FROM oc
             |  WHERE okey % 3 = 0 AND okey % 2 = 0)
             |SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(total_c) AS BIGINT) AS sum_c,
             |  CAST(sum(okey) AS BIGINT) AS sum_okey
             |FROM merged""".stripMargin)),

    // ------------------------------------------- commit history (audit)
    // DESCRIBE HISTORY for the versioned catalog: every commit logs the
    // verb that produced it (one ~100 B write-once entry, bounded by
    // commit count, never data size). The query drives four different
    // verbs over disjoint thirds of orders and pins the logged op
    // sequence + landed sizes in require(); the returned aggregate is
    // over the final table, which the verbs must have reassembled into
    // exactly the full orders slice for the oracle to match.
    "x_history" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_history", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      cat.replaceAtomic("h_orders", o.filter(col("okey") % 3 === 0))
      cat.appendAtomic("h_orders", o.filter(col("okey") % 3 === 1))
      cat.mergeInto("h_orders", o.filter(col("okey") % 3 === 2), Seq("okey"))
      cat.compactSmallFiles("h_orders")
      val hr = cat.history("h_orders")
        .select(col("version"), col("op"), col("files"), col("bytes"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      require(hr.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L),
        s"one history row per committed version: ${hr.mkString(",")}")
      require(hr.map(_._2).toSeq ==
        Seq("REPLACE", "APPEND", "MERGE", "OPTIMIZE_COMPACT"),
        s"logged verbs: ${hr.map(_._2).mkString(",")}")
      require(hr.forall(e => e._3 > 0L && e._4 > 0L),
        "files/bytes must describe the landed snapshot")
      require(cat.versionAtTimestamp("h_orders",
        System.currentTimeMillis()) == Some(4L),
        "a now-probe must resolve the current version")
      cat.read("h_orders").agg(count(lit(1)).as("n_rows"),
        sum(col("total_c")).as("sum_total_c"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_total_c
             |FROM orders""".stripMargin)),

    // --------------------------------------------- schema evolution
    // Additive evolution on the hard-linked snapshot layout: half of
    // orders lands without the priority column, the other half appends
    // WITH it under the explicit mergeSchema opt-in, so the committed
    // snapshot mixes file schemas and only the schema log makes reads
    // deterministic (footer sampling would randomly drop the column or
    // the old rows). The aggregate groups on the null-filled column —
    // every old row must surface as the sentinel bucket, every new row
    // under its real priority, value-exact against the oracle's direct
    // computation.
    "x_evolution_log" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_evolog", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"),
        col("o_orderpriority").as("prio"))
      cat.replaceAtomic("e_orders",
        o.filter(col("okey") % 2 === 0).drop("prio"))
      cat.appendAtomic("e_orders", o.filter(col("okey") % 2 === 1),
        mergeSchema = true)
      require(cat.read("e_orders").columns.toSeq == Seq("okey", "total_c", "prio"),
        "the declared schema must be the evolution union, in order")
      require(cat.readVersion("e_orders", 1L).columns.toSeq ==
        Seq("okey", "total_c"),
        "time travel must read the pre-evolution shape")
      cat.read("e_orders")
        .groupBy(coalesce(col("prio"), lit("NONE")).as("prio"))
        .agg(count(lit(1)).as("n_orders"), sum(col("total_c")).as("sum_total_c"))
    }),
      Some("""SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
             |    ELSE 'NONE' END AS prio,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_total_c
             |FROM orders
             |GROUP BY 1""".stripMargin)),

    // --------------------------------------------- bucketed co-located join
    // The shuffle-amortization story: both sides bucketed on the join
    // key at write time, so the fact-fact join elides its exchanges —
    // at 100 TB, ONE bucketed write pays the shuffle every subsequent
    // join of these tables would otherwise repeat. The session entries
    // are dropped first, so the query also proves the `_buckets.json`
    // sidecar recovery path: a fresh JVM re-registers from metadata
    // (no re-bucketing) and still gets the exchange-free plan, pinned
    // by the in-query require; values ride the ordinary oracle hash.
    "x_bucketed_join" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_bucketed", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        col("o_custkey").cast("long").as("ckey"))
      val l = t(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("okey"),
        cents(col("l_extendedprice")).as("price_c"))
      cat.overwriteBucketed("b_orders", o, "okey", 8)
      cat.overwriteBucketed("b_lineitem", l, "okey", 8)
      // simulate a fresh session: only files + sidecar remain
      cat.dropBucketed("b_orders"); cat.dropBucketed("b_lineitem")
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = cat.readBucketed("b_orders")
          .join(cat.readBucketed("b_lineitem"), Seq("okey"))
          .groupBy(col("ckey"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("price_c")).as("sum_price_c"))
        require(!j.queryExecution.executedPlan.toString
            .contains("Exchange hashpartitioning(okey"),
          "bucketed co-located join must not shuffle on the join key")
        j
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }),
      Some("""SELECT CAST(o_custkey AS BIGINT) AS ckey,
             |  CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
             |    AS BIGINT) AS sum_price_c
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_custkey""".stripMargin)),

    // --------------------------------------------- change-feed mirror
    // The CDC consumer loop end-to-end: a downstream replica maintained
    // from the commit-version change feed — bootstrap (full snapshot as
    // inserts), an append-only O(delta) catch-up, then a rewrite with
    // updates AND deletes — with the offset checkpoint advancing only
    // after each apply. The require()s pin the per-step sync results
    // (Resync → Delta → Delta → Fresh); the returned replica rows must
    // hash-equal the oracle's direct computation of the final upstream
    // state, so a feed that misclassified, double-applied, or dropped a
    // change breaks value equality row-for-row.
    "x_cdc_mirror" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      import graft.streaming.ChangeFeed
      val scratch = scratchDir("graft_cdcmirror", dir)
      val cat = new TableCatalog(s, scratch.resolve("wh").toString)
      val ckpt = scratch.resolve("offsets/src.offset")
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      cat.replaceAtomic("m_src", o.filter(col("okey") % 3 === 0))
      require(ChangeFeed.mirror(cat, "m_src", "m_dst", Seq("okey"), ckpt) ==
        ChangeFeed.Resync(1L), "bootstrap must ship the initial snapshot")
      cat.appendAtomic("m_src", o.filter(col("okey") % 3 === 1))
      require(ChangeFeed.mirror(cat, "m_src", "m_dst", Seq("okey"), ckpt) ==
        ChangeFeed.Delta(1L, 2L), "append catch-up must be a delta")
      cat.replaceAtomic("m_src", cat.read("m_src")
        .filter(col("okey") % 5 =!= 0)
        .withColumn("total_c", when(col("okey") % 7 === 0,
          col("total_c") + 100L).otherwise(col("total_c"))))
      require(ChangeFeed.mirror(cat, "m_src", "m_dst", Seq("okey"), ckpt) ==
        ChangeFeed.Delta(2L, 3L), "rewrite catch-up must be a delta")
      require(ChangeFeed.mirror(cat, "m_src", "m_dst", Seq("okey"), ckpt) ==
        ChangeFeed.Fresh, "a caught-up consumer must do nothing")
      cat.read("m_dst").select(col("okey"), col("total_c"))
    }),
      Some("""SELECT CAST(o_orderkey AS BIGINT) AS okey,
             |  CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
             |    + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END
             |    AS BIGINT) AS total_c
             |FROM orders
             |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 5 <> 0"""
        .stripMargin)),

    // ----------------------------------- partitioned change-feed mirror
    // The O(changed-partitions) apply: the replica is a year-partitioned
    // plain table and each catch-up rewrites only the partitions the
    // feed names — bootstrap, a one-partition append, then a rewrite
    // that empties a whole year (its directory must disappear, like
    // deleteWhere's purge). The require()s pin the sync results and the
    // dropped directory; the replica's full row set rides the oracle
    // hash against the final upstream state computed directly.
    "x_cdc_mirror_part" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      import graft.streaming.ChangeFeed
      val scratch = scratchDir("graft_cdcpart", dir)
      val cat = new TableCatalog(s, scratch.resolve("wh").toString)
      val ckpt = scratch.resolve("offsets/src.offset")
      val o = t(s, dir, "orders").select(
        concat(lit("y"), year(col("o_orderdate"))).as("dt"),
        col("o_orderkey").cast("long").as("okey"),
        cents(col("o_totalprice")).as("total_c"))
      cat.replaceAtomic("p_src", o.filter(col("okey") % 2 === 0))
      require(ChangeFeed.mirrorPartitioned(cat, "p_src", "p_dst",
        Seq("dt", "okey"), "dt", ckpt) == ChangeFeed.Resync(1L))
      cat.appendAtomic("p_src",
        o.filter(col("okey") % 2 === 1 && col("dt") === "y1995"))
      require(ChangeFeed.mirrorPartitioned(cat, "p_src", "p_dst",
        Seq("dt", "okey"), "dt", ckpt) == ChangeFeed.Delta(1L, 2L))
      cat.replaceAtomic("p_src", cat.read("p_src").filter(col("dt") =!= "y1998"))
      require(ChangeFeed.mirrorPartitioned(cat, "p_src", "p_dst",
        Seq("dt", "okey"), "dt", ckpt) == ChangeFeed.Delta(2L, 3L))
      require(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(cat.path("p_dst"), "dt=y1998")),
        "an emptied partition's directory must disappear from the replica")
      cat.read("p_dst").select(col("dt"), col("okey"), col("total_c"))
    }),
      Some("""SELECT 'y' || CAST(year(o_orderdate) AS VARCHAR) AS dt,
             |  CAST(o_orderkey AS BIGINT) AS okey,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS total_c
             |FROM orders
             |WHERE (o_orderkey % 2 = 0
             |    OR (o_orderkey % 2 = 1 AND year(o_orderdate) = 1995))
             |  AND year(o_orderdate) <> 1998""".stripMargin)),

    // ------------------------------------------- TIMESTAMP AS OF (SQL)
    // Time travel by wall clock through plain SQL: the history log maps
    // an instant captured BETWEEN two commits back to the first
    // version, so the query must return the PRE-rewrite rkey values —
    // a resolver that lands on the current snapshot (or rounds the
    // wrong way) fails the oracle hash on every row.
    "x_timestamp_as_of" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_tsasof", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val n = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("nkey"),
        col("n_name"),
        col("n_regionkey").cast("long").as("rkey"))
      cat.replaceAtomic("tn", n)
      Thread.sleep(30)
      val between = new java.sql.Timestamp(System.currentTimeMillis())
      Thread.sleep(30)
      cat.replaceAtomic("tn", n.withColumn("rkey", col("rkey") + 100))
      val cname = "gts_" +
        scratch.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      s.conf.set(s"spark.sql.catalog.$cname",
        classOf[graft.sql.GraftSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cname.root", scratch.toString)
      s.sql(s"""SELECT nkey, n_name, rkey
               |FROM $cname.tn TIMESTAMP AS OF '$between'""".stripMargin)
    }),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name,
             |  CAST(n_regionkey AS BIGINT) AS rkey
             |FROM nation""".stripMargin)),

    // --------------------------------------------- embedding near-dup
    // The synthetic embeddings top out at pairwise cos ≈ 0.48, so the
    // threshold is set where real pairs exist (0.35) and the plane count
    // low enough that moderate-cos pairs still collide in a bucket.
    // The hyperplanes are deterministic literals (Similarity.hyperplanes),
    // so the oracle embeds the same planes and re-derives the bucketing
    // and the exact cosine independently in DuckDB.
    "x_dedup_embedding" -> (((s: SparkSession, dir: String) =>
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), "vec_id", "embedding",
        minCos = 0.35, planes = 4)
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bk AS (SELECT vec_id, v, ${bucketSql(4)} AS bucket FROM e)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
             |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(a.v, b.v) >= 0.35""".stripMargin)),

    // --------------------------------------------- ANN brute-force top-k
    "x_ann_bruteforce" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("qv")), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),
      Some("""SELECT e.vec_id, round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cos_sim
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |WHERE e.vec_id <> 0
             |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10""".stripMargin)),

    // -------------------------------------------------- ANN LSH-bucketed
    // Same deterministic-hyperplane trick as x_dedup_embedding: DuckDB
    // recomputes the query vector's bucket, the multi-probe target set
    // (hamming ≤ 1 flips), and the exact cosine top-k over the probed
    // buckets. Both sides SELECT the top 10 by the unrounded cosine
    // (rank-10/11 gap ≈ 2e-4 ≫ double noise) and project it rounded.
    "x_ann_lsh" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Similarity.lshTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        q, k = 10, planes = 6, probes = 2)
        .select(col("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))
    }),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bk AS (SELECT vec_id, v, ${bucketSql(6)} AS bucket FROM e),
             |qb AS (SELECT bucket AS qbucket, v AS qv FROM bk WHERE vec_id = 0)
             |SELECT bk.vec_id AS vec_id, round(list_cosine_similarity(bk.v, qb.qv), 4) AS cos_sim
             |FROM bk, qb
             |WHERE bk.vec_id <> 0 AND xor(bk.bucket, qb.qbucket) IN (0, 1, 2, 4, 8, 16, 32)
             |ORDER BY list_cosine_similarity(bk.v, qb.qv) DESC, bk.vec_id ASC
             |LIMIT 10""".stripMargin)),

    // -------------------------------------------- IVF ANN (property oracle)
    // The centroids come from a KMeans fit, which no SQL engine can
    // replay, so the check is an in-query recall property: the IVF top-10
    // is compared against the brute-force top-10 computed in the same
    // query, and the oracle pins (k, n_results, recall_ok). The synthetic
    // embeddings are structureless gaussian noise, so nProbe=4/nLists=16
    // bounds recall (~overlap, not identity); MlOpsSpec asserts ≥0.9
    // recall on clustered data — the case IVF exists for.
    "x_ann_ivf" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val base = e.filter(col("vec_id") =!= 0)
      val idx = graft.ops.Ivf.build(base, "vec_id", "embedding", nLists = 16)
      val ivfTop = graft.ops.Ivf.topK(idx, "vec_id", "embedding", q, k = 10, nProbe = 4)
        .select(col("vec_id"))
      // ONE brute-force scan at k=50; rank within the 50-row result
      // (driver-small post-limit) distinguishes top-10 membership
      val bf = Similarity.bruteForceTopK(base, "vec_id", "embedding", q, k = 50)
        .withColumn("bf_rank", row_number().over(
          Window.orderBy(col("cos_sim").desc, col("vec_id").asc)))
        .select(col("vec_id"), col("bf_rank"))
      // measured on this corpus: hits@10 = 4, hits-in-top-50 = 10, stable
      // across local[2..32]; the bounds leave margin for KMeans init
      // shifts under a different partitioning (tools/IvfProbe).
      ivfTop.join(bf, Seq("vec_id"), "left")
        .agg(count(lit(1)).as("n_results"),
          sum(when(col("bf_rank") <= 10, 1).otherwise(0)).as("h10"),
          sum(when(col("bf_rank").isNotNull, 1).otherwise(0)).as("h50"))
        .select(lit(10).as("k"), col("n_results"),
          (col("h10") >= 2).as("recall_ok"),
          (col("h50") >= 8).as("top50_ok"))
    }),
      Some("""SELECT 10 AS k, CAST(10 AS BIGINT) AS n_results,
             |  TRUE AS recall_ok, TRUE AS top50_ok""".stripMargin)),

    // ------------------------------------ PQ ANN (property oracle)
    // Product quantization: codebooks from a deterministic driver-side
    // Lloyd's fit (not SQL-replayable), so the oracle pins measured
    // invariants. The synthetic embeddings are iid gaussian — PQ's
    // worst case (distances concentrate) — so the meaningful checks are
    // the DISTORTION (measured 0.54-0.58 across SFs; ≈ the k^(-2/subDim)
    // = 0.5 rate-distortion expectation for noise, and a broken argmin
    // or codebook would blow past 1.0) and the ADC estimate error on
    // the returned top-10 (measured 0.33-0.40); recall proper is
    // MlOpsSpec's clustered-data case, where PQ earns its keep. h50
    // bound from tools/PqProbe: 8/7/3 at sf0.001/0.01/0.1.
    "x_ann_pq" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val base = e.filter(col("vec_id") =!= 0)
      val cb = graft.ops.Pq.trainCodebooks(base, "vec_id", "embedding", dim)
      val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
      val enc = graft.ops.Pq.encode(base, "embedding", cb)
      val recon = flatten(zip_with(col("pq_code"), cbLit,
        (cd, cws) => element_at(cws, cd + 1)))
      val errSq = aggregate(zip_with(col("embedding"), recon,
        (x, r) => (x - r) * (x - r)), lit(0.0), (a, v) => a + v)
      val normSq = aggregate(col("embedding"), lit(0.0), (a, v) => a + v * v)
      val l2q = aggregate(zip_with(col("embedding"), typedLit(q),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
      val exact50 = base.withColumn("d", l2q)
        .orderBy(col("d").asc, col("vec_id").asc).limit(50)
        .withColumn("bf_rank", row_number().over(
          Window.orderBy(col("d").asc, col("vec_id").asc)))
        .select(col("vec_id"), col("bf_rank"))
      val top = graft.ops.Pq.topK(enc, "vec_id", "pq_code", cb, q, k = 10)
        .withColumn("exact", l2q)
      val dist = enc.agg((sum(errSq) / sum(normSq)).as("rd")).head().getDouble(0)
      // Relative ADC error only over neighbors at nonzero exact
      // distance: a corpus can contain the query vector itself (the sf1
      // extent probe's key-shifted copies do — caught by the r9 sf1
      // correctness gate as a division by zero under ANSI mode), and a
      // zero-distance hit has no meaningful relative error.
      top.join(exact50, Seq("vec_id"), "left")
        .agg(count(lit(1)).as("n_results"),
          avg(when(col("exact") > 0.0,
            abs(col("adc_dist") - col("exact")) / col("exact"))).as("adc_err"),
          sum(when(col("bf_rank").isNotNull, 1).otherwise(0)).as("h50"))
        .select(lit(10).as("k"), col("n_results"),
          lit(dist <= 0.75).as("distortion_ok"),
          (col("adc_err") <= 0.6).as("adc_ok"),
          (col("h50") >= 1).as("h50_ok"))
    }),
      Some("""SELECT 10 AS k, CAST(10 AS BIGINT) AS n_results,
             |  TRUE AS distortion_ok, TRUE AS adc_ok, TRUE AS h50_ok""".stripMargin)),

    // ------------------------------- IVF+PQ composed ANN (property)
    // The billion-scale composition: coarse cells prune the scan
    // (nProbe/nLists of the corpus), ADC ranks candidates with integer
    // code lookups only, and just the 50-row shortlist pays exact
    // cosine. Property oracle (codebooks + KMeans are driver-trained,
    // not SQL-replayable): result count, shortlist recall vs the
    // brute-force top-50, and agreement with plain IVF on the same
    // probes — the composed path can only lose candidates PQ misranks.
    // Measured (tools/IvfPqProbe, stable across local[2..32]):
    // h10=4/3, h50=10/7, ivf_agree=8/5 at sf0.01/sf0.1 — bounds sit
    // below the worst measurement to leave KMeans-init margin.
    "x_ann_ivfpq" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      val dimN = e.select(size(col("embedding"))).head().getInt(0)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val base = e.filter(col("vec_id") =!= 0)
      val idx = graft.ops.Ivf.build(base, "vec_id", "embedding", nLists = 16)
      val cb = graft.ops.Pq.trainCodebooks(base, "vec_id", "embedding", dimN)
      val top = graft.ops.Ivf.topKIvfPq(idx, cb, "vec_id", "embedding", q,
        k = 10, nProbe = 4, shortlist = 50)
        .select(col("vec_id"))
      val bf = Similarity.bruteForceTopK(base, "vec_id", "embedding", q, k = 50)
        .withColumn("bf_rank", row_number().over(
          Window.orderBy(col("cos_sim").desc, col("vec_id").asc)))
        .select(col("vec_id"), col("bf_rank"))
      val ivfOnly = graft.ops.Ivf.topK(idx, "vec_id", "embedding", q,
        k = 10, nProbe = 4).select(col("vec_id").as("ivf_id"))
      top.join(bf, Seq("vec_id"), "left")
        .join(ivfOnly, col("vec_id") === col("ivf_id"), "left")
        .agg(count(lit(1)).as("n_results"),
          sum(when(col("bf_rank") <= 10, 1).otherwise(0)).as("h10"),
          sum(when(col("bf_rank").isNotNull, 1).otherwise(0)).as("h50"),
          sum(when(col("ivf_id").isNotNull, 1).otherwise(0)).as("ivf_agree"))
        .select(lit(10).as("k"), col("n_results"),
          (col("h10") >= 2).as("recall_ok"),
          (col("h50") >= 5).as("top50_ok"),
          (col("ivf_agree") >= 4).as("ivf_agree_ok"))
    }),
      Some("""SELECT 10 AS k, CAST(10 AS BIGINT) AS n_results,
             |  TRUE AS recall_ok, TRUE AS top50_ok, TRUE AS ivf_agree_ok"""
        .stripMargin)),

    // ---------------------------------------- online z-score anomaly
    // The stateful streaming scorer (StreamingIngest.zscoreAlerts) in
    // BATCH mode: each event scores against the card's PRIOR amount
    // history via exact integer moments (n, Σcents, Σcents²), alerting
    // when (n·x − S)² > k²(nQ − S²). Every output column is an exact
    // int64 DuckDB recomputes with running window sums; only the final
    // comparison squares in double (identical IEEE multiply on both
    // engines). Cross-micro-batch state equivalence is StreamingSpec's.
    "x_anomaly_zscore" -> (((s: SparkSession, dir: String) => {
      val txns = t(s, dir, "events").select(
        col("user_id").cast("string").as("card_num"),
        col("ts").as("trans_date"),
        col("event_id").cast("string").as("trans_id"),
        cents(col("value")).as("cents"))
      graft.streaming.StreamingIngest.zscoreAlerts(s, txns, k = 2, minN = 5L)
    }),
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS card_num,
             |    CAST(event_id AS VARCHAR) AS trans_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
             |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
             |w AS (SELECT card_num, trans_id, cents,
             |    CAST(count(*) OVER pw AS BIGINT) AS n_prior,
             |    CAST(coalesce(sum(cents) OVER pw, 0) AS BIGINT) AS s,
             |    CAST(coalesce(sum(cents * cents) OVER pw, 0) AS BIGINT) AS q
             |  FROM e WINDOW pw AS (PARTITION BY card_num ORDER BY es, trans_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT card_num, trans_id, cents, n_prior,
             |  n_prior * cents - s AS score_num,
             |  n_prior * q - s * s AS score_den
             |FROM w WHERE n_prior >= 5
             |  AND CAST(n_prior * cents - s AS DOUBLE) * CAST(n_prior * cents - s AS DOUBLE)
             |      > 4 * CAST(n_prior * q - s * s AS DOUBLE)""".stripMargin)),

    // ------------------------------- MLlib anomaly scoring (property oracle)
    // KMeans centroids are not SQL-replayable; the oracle pins the
    // full-data invariants instead (row count from the real table, score
    // nonnegativity, cluster-id range). The feature engineering half of
    // the operator has a full value-level oracle in x_anomaly_features.
    "x_anomaly_kmeans" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(
        col("user_id"), col("event_id"), col("ts"), col("value"))
      val featured = graft.ops.Anomaly.features(ev, "user_id", "ts", "value")
      // sample sizing from the RAW table's metadata-cheap count — the
      // window-feature lineage is never executed just to size the sample
      graft.ops.Anomaly.score(featured, Seq("amt_z", "gap_s", "hour"), k = 8,
          inputRows = Some(ev.count()))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("cluster")).as("n_clusters"),
          min(col("anomaly_score")).as("min_s"))
        .select(col("n_rows"),
          (col("n_clusters").between(1, 8)).as("clusters_ok"),
          (col("min_s") >= 0).as("scores_nonneg"))
    }),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows, TRUE AS clusters_ok,
             |  TRUE AS scores_nonneg FROM events""".stripMargin)),

    // --------------------------------------------- batch ANN retrieval
    // Similarity.batchTopK: five query vectors answered in ONE
    // bucket-equi-join pass with hamming-1 multi-probe (the query side
    // explodes to its probe set — never a per-query driver loop).
    // DuckDB recomputes buckets, probe sets (xor bit flips), and the
    // per-query ranking.
    "x_ann_batch" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      Similarity.batchTopK(
        e.filter(col("vec_id") >= 5), "vec_id", "embedding",
        e.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 5, planes = 6, probes = 2)
        .select(col("qid"), col("cid"), col("rk"),
          round(col("cos_sim"), 4).as("cos_sim"))
    }),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bk AS (SELECT vec_id, v, ${bucketSql(6)} AS bucket FROM e),
             |q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM bk WHERE vec_id < 5),
             |c AS (SELECT vec_id AS cid, v AS cv, bucket AS cb FROM bk WHERE vec_id >= 5),
             |probes AS (SELECT qid, qv,
             |    CASE WHEN f = -1 THEN qb ELSE xor(qb, (1 << f)) END AS tb
             |  FROM q CROSS JOIN (SELECT unnest(range(-1, 6)) AS f) t),
             |p AS (SELECT qid, cid, list_cosine_similarity(qv, cv) AS cs
             |  FROM probes JOIN c ON c.cb = probes.tb),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY qid
             |    ORDER BY cs DESC, cid) AS rk FROM p)
             |SELECT qid, cid, CAST(rk AS INTEGER) AS rk, round(cs, 4) AS cos_sim
             |FROM rk WHERE rk <= 5""".stripMargin)),

    // ------------------------------------------------------ k-NN graph
    // Similarity.knnGraph: each vector's top-3 cosine neighbors within
    // its LSH bucket — bucket-local candidate join, never all-pairs.
    // DuckDB recomputes the buckets from the same deterministic plane
    // literals and replays the per-source ranking (unrounded cosine,
    // neighbor-id tie-break), so a missed or extra neighbor anywhere in
    // the graph fails the hash.
    "x_knn_graph" -> (((s: SparkSession, dir: String) =>
      Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, planes = 4)
        .select(col("src_id"), col("dst_id"), col("rk"),
          round(col("cos_sim"), 4).as("cos_sim"))),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bk AS (SELECT vec_id, v, ${bucketSql(4)} AS bucket FROM e),
             |p AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
             |    list_cosine_similarity(a.v, b.v) AS cs
             |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY src_id
             |    ORDER BY cs DESC, dst_id) AS rk FROM p)
             |SELECT src_id, dst_id, CAST(rk AS INTEGER) AS rk,
             |  round(cs, 4) AS cos_sim
             |FROM rk WHERE rk <= 3""".stripMargin)),

    // --------------------------------- k-NN classification + confusion
    // ML-evaluation surface: each vector's label is predicted by the
    // majority vote of its k=5 LSH-bucketed nearest neighbours (vote
    // count desc, label asc on ties) and compared against its true
    // label — output is the confusion matrix. Fully value-level: DuckDB
    // replays buckets, ranking, vote, and tie-break, so one flipped
    // neighbour anywhere moves a matrix cell and fails the hash.
    "x_knn_classify" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      val g = Similarity.knnGraph(e, "vec_id", "embedding", k = 5, planes = 4)
      val lbl = e.select(col("vec_id"), col("label").cast("long").as("lab"))
      val votes = g.join(lbl.withColumnRenamed("vec_id", "dst_id")
          .withColumnRenamed("lab", "nb_lab"), Seq("dst_id"))
        .groupBy(col("src_id"), col("nb_lab"))
        .agg(count(lit(1)).as("v"))
      val w = Window.partitionBy(col("src_id"))
        .orderBy(col("v").desc, col("nb_lab").asc)
      val pred = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("src_id").as("vec_id"), col("nb_lab").as("pred"))
      pred.join(lbl, Seq("vec_id"))
        .groupBy(col("lab").as("true_label"), col("pred").as("pred_label"))
        .agg(count(lit(1)).as("n"))
    }),
      Some(s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS lab,
             |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bk AS (SELECT vec_id, lab, v, ${bucketSql(4)} AS bucket FROM e),
             |p AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id, b.lab AS nb_lab,
             |    list_cosine_similarity(a.v, b.v) AS cs
             |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY src_id
             |    ORDER BY cs DESC, dst_id) AS rk FROM p),
             |votes AS (SELECT src_id, nb_lab, CAST(count(*) AS BIGINT) AS v
             |  FROM rk WHERE rk <= 5 GROUP BY 1, 2),
             |pred AS (SELECT src_id, nb_lab AS pred FROM (SELECT *,
             |    row_number() OVER (PARTITION BY src_id
             |      ORDER BY v DESC, nb_lab ASC) AS rn FROM votes)
             |  WHERE rn = 1)
             |SELECT e.lab AS true_label, pred.pred AS pred_label,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM pred JOIN e ON e.vec_id = pred.src_id
             |GROUP BY 1, 2""".stripMargin)),

    // ------------------------------- half-life decayed aggregation
    // Recency weighting without libm: a one-day half-life decay
    // floor(cents·2²⁰ / 2^age) is EXACT integer arithmetic — powers of
    // two are the only decay base whose weights an engine pair can
    // agree on bit-for-bit (0.9^age via pow() is libm-dependent).
    // One map-side-combined aggregate; the anchor is a fixed date so
    // reruns are deterministic.
    "x_decayed_sum" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        cents(col("value")).as("c"),
        datediff(lit("2024-01-31").cast("date"), to_date(col("ts")))
          .cast("long").as("age"))
      ev.withColumn("dv",
          expr("c * 1048576L div shiftleft(1L, cast(age as int))"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("dv")).as("decayed_e20"),
          sum(col("c")).as("raw_c"))
    }),
      Some("""WITH ev AS (SELECT user_id,
             |    CAST(floor(value * 100) AS BIGINT) AS c,
             |    CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-01-31')
             |      AS BIGINT) AS age FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(c * 1048576 // (CAST(1 AS BIGINT) << age)) AS BIGINT)
             |    AS decayed_e20,
             |  CAST(sum(c) AS BIGINT) AS raw_c
             |FROM ev GROUP BY 1""".stripMargin)),

    // ------------------------------------- random projection (JL) to 4-d
    // Similarity.randomProject: per-row dot products against the
    // deterministic Gaussian planes — no shuffle, no fit. DuckDB replays
    // the projection from the same plane literals; outputs floor-scale
    // to int64.
    "x_embed_project" -> (((s: SparkSession, dir: String) =>
      Similarity.randomProject(t(s, dir, "embeddings"), "embedding", outDim = 4)
        .select(col("vec_id") +: (0 until 4).map(i =>
          floor(col(s"p$i") * lit(1e6)).cast("long").as(s"p${i}_e6")): _*)),
      Some({
        val projCols = graft.ops.Similarity.hyperplanes(4, 64).zipWithIndex.map {
          case (p, i) =>
            s"CAST(floor(list_dot_product(v, ${p.mkString("[", ", ", "]")}) * 1000000.0) AS BIGINT) AS p${i}_e6"
        }.mkString(",\n  ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
           |SELECT vec_id,
           |  $projCols
           |FROM e""".stripMargin
      })),

    // ------------------------------------- anomaly feature engineering
    // The deterministic half of the anomaly operator — per-entity z-score,
    // velocity gap, hour-of-day — with a full value-level DuckDB oracle.
    // amt_z is floor-scaled to e2: the window mean/stddev are double
    // reductions whose summation order differs across engines (~1e-13),
    // so 2 decimals keeps a 1e11× margin to the floor boundary.
    "x_anomaly_features" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(
        col("user_id"), col("event_id"), col("ts"), col("value"))
      graft.ops.Anomaly.features(ev, "user_id", "ts", "value",
          tieCols = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          floor(col("amt_z") * 100).cast("long").as("amt_z_e2"),
          col("gap_s").cast("long").as("gap_s"),
          col("hour").cast("int").as("hour"))
    }),
      Some("""SELECT event_id, user_id,
             |  CAST(floor((CASE WHEN sd > 0 THEN (value - mean) / sd ELSE 0.0 END) * 100) AS BIGINT) AS amt_z_e2,
             |  gap_s, CAST(hour(ts) AS INTEGER) AS hour
             |FROM (SELECT event_id, user_id, ts, value,
             |    avg(value) OVER (PARTITION BY user_id) AS mean,
             |    stddev_pop(value) OVER (PARTITION BY user_id) AS sd,
             |    coalesce(CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id), CAST(0 AS BIGINT)) AS gap_s
             |  FROM events)""".stripMargin)),

    // ------------------------------------------------- text statistics
    // ------------------------------------- approx percentile (t-digest)
    // percentile_approx beside the exact percentile, same pattern as
    // x_approx_distinct: the oracle recomputes the EXACT median and
    // pins the approx within a tolerance band in-plan (the sketch path
    // is the 100 TB default — a single-pass mergeable summary instead
    // of a full sort — and the property proves it lands on target).
    "x_approx_percentile" -> (((s: SparkSession, dir: String) => {
      val base = t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      // the exact pin routes through the adaptive bounded-percentile op
      // (r17 — no stock single-reducer percentile call sites remain):
      // below the distinct threshold it IS the stock aggregate, above
      // it the bucketed search keeps the pin computable at all
      val exact = graft.ops.Quantiles.percentilesCont(base, "lang",
        "n_tokens", Seq(("p50_exact", 1L, 2L)))
      base.groupBy(col("lang"))
        // accuracy 2000 → rank error ≤ n/2000; at the gate SFs the
        // sketch lands within a rank or two of the true median
        .agg(expr("percentile_approx(n_tokens, 0.5, 2000)").as("approx"))
        .join(broadcast(exact), Seq("lang"))
        .select(col("lang"), col("p50_exact"),
          (abs(col("approx") - col("p50_exact")) <=
            greatest(col("p50_exact") * 0.1, lit(3.0))).as("approx_ok"))
    }),
      Some("""SELECT lang,
             |  quantile_cont(CAST(len(string_split(text, ' ')) AS BIGINT), 0.5) AS p50_exact,
             |  TRUE AS approx_ok
             |FROM documents GROUP BY lang""".stripMargin)),

    // --------------------------------- repetition / diversity signals
    // TextAnalysis.repetitionSignals: max-term-frequency ratio and
    // type-token ratio per doc (the Gopher repetition rules). Ratios are
    // one int/int division floor-scaled — bit-identical across engines.
    "x_quality_repetition" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.repetitionSignals(t(s, dir, "documents"), "doc_id", "text")),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
             |  FROM documents),
             |tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks WHERE term <> '' GROUP BY doc_id, term)
             |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             |  count(*) AS n_distinct, CAST(max(tf) AS BIGINT) AS max_tf,
             |  CAST(floor(CAST(max(tf) AS DOUBLE) / CAST(sum(tf) AS BIGINT) * 1000000.0) AS BIGINT) AS top_ratio_e6,
             |  CAST(floor(CAST(count(*) AS DOUBLE) / CAST(sum(tf) AS BIGINT) * 1000000.0) AS BIGINT) AS ttr_e6
             |FROM tc GROUP BY doc_id""".stripMargin)),

    // ------------------------------------- unigram LM quality scoring
    // The cheap perplexity-filter analog: every document scored by mean
    // negative ln-probability of its tokens under the corpus's own
    // smoothed unigram distribution (alpha = 0.5). Both engines replay
    // the same p(tok) = (c + α)/(N + α·V); the score ships floor-scaled
    // ×10⁴ so summation-order ulps can't flip the hash.
    "x_unigram_logprob" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.unigramLogProb(t(s, dir, "documents"), "doc_id", "text",
        alpha = 0.5)),
      Some(s"""WITH $unigramLmCte
             |SELECT doc_id, n_toks, nll_e4 FROM lm""".stripMargin)),

    // ------------------------------------ CCNet perplexity bucketing
    // The CCNet head/middle/tail cut: per-language equal-count thirds
    // of the unigram-LM score (most -> least fluent). The oracle is the
    // textbook window ntile; the engine side is the closed-form
    // distributed ntile over a two-phase global rank
    // (Selection.groupedNtile) — no per-language single-task sort, and
    // SelectionSpec pins the closed form to the window semantics.
    "x_ccnet_buckets" -> (((s: SparkSession, dir: String) =>
      Selection.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text",
        "lang")),
      Some(s"""WITH $unigramLmCte
             |SELECT lm.doc_id, d.lang, lm.n_toks, lm.nll_e4,
             |  CASE ntile(3) OVER (PARTITION BY d.lang
             |      ORDER BY lm.nll_e4, lm.doc_id)
             |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
             |  END AS bucket
             |FROM lm JOIN documents d ON d.doc_id = lm.doc_id""".stripMargin)),

    // --------------------------------------------- PII scan with Luhn
    // The scan side of the PII pipeline (x_redact_pii is the rewrite
    // side): per-class occurrence counts plus Luhn mod-10 validation of
    // card-shaped digit runs, computed with codegen'd HOFs — no UDF.
    // The synthetic corpus carries no PII, so both engines inject the
    // SAME deterministic doctored spans (one Luhn-valid card, one
    // formatted-but-invalid — the validator must split them).
    "x_pii_scan" -> (((s: SparkSession, dir: String) => {
      val dirty = t(s, dir, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 7 === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail.example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" call 415-555-0199 now"))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit(" card 4111-1111-1111-1111 on file"))
          .otherwise(lit("")),
        when(col("doc_id") % 17 === 0, lit(" card 4111 1111 1111 1112 rejected"))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0, lit(" from 10.0.0.1"))
          .otherwise(lit(""))))
      graft.ops.Pii.scan(dirty, "doc_id", "text")
    }),
      Some(s"""WITH dirty AS (SELECT doc_id, text
             |    || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
             |        || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
             |    || CASE WHEN doc_id % 11 = 0 THEN ' call 415-555-0199 now' ELSE '' END
             |    || CASE WHEN doc_id % 13 = 0 THEN ' card 4111-1111-1111-1111 on file' ELSE '' END
             |    || CASE WHEN doc_id % 17 = 0 THEN ' card 4111 1111 1111 1112 rejected' ELSE '' END
             |    || CASE WHEN doc_id % 19 = 0 THEN ' from 10.0.0.1' ELSE '' END AS text
             |  FROM documents),
             |c AS (SELECT doc_id,
             |    CAST(len(regexp_extract_all(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
             |    CAST(len(regexp_extract_all(text,
             |      '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS BIGINT) AS n_phone,
             |    CAST(len(regexp_extract_all(text,
             |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
             |    regexp_extract_all(text,
             |      '\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b') AS cards
             |  FROM dirty)
             |SELECT doc_id, n_email, n_phone, n_ipv4,
             |  CAST(len(cards) AS BIGINT) AS n_card_like,
             |  CAST(len(list_filter(cards, m -> ${luhnSql("m")})) AS BIGINT)
             |    AS n_card_valid,
             |  n_email + n_phone + n_ipv4
             |    + CAST(len(list_filter(cards, m -> ${luhnSql("m")})) AS BIGINT)
             |    > 0 AS has_pii
             |FROM c""".stripMargin)),

    // ------------------------------------ cross-source overlap matrix
    // Mixture-design analytics over the near-dup pair set: how much
    // content do sources share? Unordered (source, source) cells with
    // pair counts and exact floor-scaled Jaccard mass; the diagonal is
    // within-source duplication. Same inverted-index pair generation
    // (and the same keep-cut) as x_dedup_ngram_jaccard.
    "x_source_overlap" -> (((s: SparkSession, dir: String) =>
      Dedup.sourceOverlap(t(s, dir, "documents"), "doc_id", "text",
        "source", n = 3, minJaccard = 0.1, maxDocFreq = 1000)),
      Some(s"""WITH $trigramCte,
             |keep AS (SELECT shingle FROM tri GROUP BY shingle HAVING count(*) <= 1000),
             |f AS (SELECT tri.doc_id, tri.shingle FROM tri JOIN keep USING (shingle)),
             |p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
             |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |pairs AS (SELECT id_a, id_b,
             |    CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
             |  FROM p0 JOIN sizes sa ON sa.doc_id = id_a
             |  JOIN sizes sb ON sb.doc_id = id_b
             |  WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.1),
             |lab AS (SELECT least(da.source, db.source) AS source_a,
             |    greatest(da.source, db.source) AS source_b,
             |    CAST(floor(jaccard * 1000000.0) AS BIGINT) AS j_e6
             |  FROM pairs JOIN documents da ON da.doc_id = pairs.id_a
             |  JOIN documents db ON db.doc_id = pairs.id_b)
             |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(sum(j_e6) AS BIGINT) AS sum_jaccard_e6
             |FROM lab GROUP BY 1, 2""".stripMargin)),

    // --------------------------------------- Zipf rank-frequency slope
    // Corpus-health datasheet row: OLS slope of ln(freq) vs log2(rank)
    // at power-of-two ranks per language — natural text sits near
    // -ln 2 x 10^6 ~ -693147 (Zipf s ~ 1); spam/boilerplate bends it.
    // x and y are exact int64 (one libm ln per point), the OLS is
    // integer sums with one final division — the x_regression
    // discipline; ranking is the distributed two-phase grouped rank.
    "x_zipf" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.zipfSlope(t(s, dir, "documents"), "text", "lang",
        maxExp = 8)),
      Some("""WITH tk AS (SELECT lang, tok FROM (SELECT lang,
             |      unnest(string_split_regex(text, '\s+')) AS tok FROM documents)
             |  WHERE tok <> ''),
             |tf AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS freq
             |  FROM tk GROUP BY 1, 2),
             |ranked AS (SELECT lang, freq, row_number() OVER
             |    (PARTITION BY lang ORDER BY freq DESC, tok ASC) AS rank FROM tf),
             |pts AS (SELECT lang, freq,
             |    CAST(round(log2(rank)) AS BIGINT) AS x,
             |    CAST(floor(ln(freq) * 1000000.0) AS BIGINT) AS y
             |  FROM ranked WHERE rank IN (1, 2, 4, 8, 16, 32, 64, 128, 256)),
             |s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_points,
             |    max(CASE WHEN x = 0 THEN freq END) AS f1,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             |    sum(x * y) AS sxy
             |  FROM pts GROUP BY 1),
             |d AS (SELECT *, n_points * sxy - sx * sy AS num,
             |    n_points * sxx - sx * sx AS den FROM s)
             |SELECT lang, n_points, f1,
             |  CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) AS BIGINT)
             |    AS slope_e6
             |FROM d WHERE den <> 0""".stripMargin)),

    // ----------------------------------- per-language quality percentiles
    // EXACT percentiles (Spark `percentile` ↔ DuckDB `quantile_cont`,
    // both linear interpolation) of per-doc token counts per language,
    // plus the count of docs under the p25 cut — the corpus-curation
    // "drop the bottom quartile per language" decision as one
    // aggregation + broadcast join back. Interpolated quantiles of
    // INTEGER counts at quarter positions are exactly representable
    // doubles, so the values hash identically across engines.
    "x_quality_percentile" -> (((s: SparkSession, dir: String) => {
      val q = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      // the BOUNDED two-phase exact percentile (r16 — no reducer ever
      // holds a group's whole value domain); smallThreshold = 0 pins
      // the scale path at every gate SF, hash-identical to the stock
      // aggregate by Quantiles' contract
      val stats = graft.ops.Quantiles.percentilesCont(q, "lang",
        "n_tokens", Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L)),
        smallThreshold = 0L)
      q.join(broadcast(stats), "lang")
        .groupBy(col("lang"), col("p25"), col("p50"), col("p75"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_tokens") < col("p25"), 1L).otherwise(0L)).as("n_below_p25"))
    }),
      Some("""WITH q AS (SELECT doc_id, lang,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |st AS (SELECT lang, quantile_cont(n_tokens, 0.25) AS p25,
             |    quantile_cont(n_tokens, 0.5) AS p50,
             |    quantile_cont(n_tokens, 0.75) AS p75
             |  FROM q GROUP BY lang)
             |SELECT q.lang, p25, p50, p75, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN n_tokens < p25 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_p25
             |FROM q JOIN st ON q.lang = st.lang
             |GROUP BY q.lang, p25, p50, p75""".stripMargin)),

    // ------------------------------------------- TF-IDF salient terms
    // Relevance.tfIdfTopTerms: per-doc top-3 terms by tf·ln(N/df). The
    // ranking orders by the floor-scaled INT score with the term as
    // tie-break: the tiny vocabulary makes mathematically-equal scores
    // via different float paths common (2·ln(1.25) = ln(1.5625)), and
    // last-ulp doubles can order differently across engines — int
    // comparison cannot.
    "x_tfidf" -> (((s: SparkSession, dir: String) =>
      graft.ops.Relevance.tfIdfTopTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
             |  FROM documents),
             |tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks WHERE term <> '' GROUP BY doc_id, term),
             |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tc GROUP BY term),
             |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tc),
             |scored AS (SELECT tc.doc_id, tc.term, tc.tf, dfreq.df,
             |    CAST(floor(tc.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df)
             |      * 1000000.0) AS BIGINT) AS tfidf_e6
             |  FROM tc JOIN dfreq USING (term) CROSS JOIN n),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY tfidf_e6 DESC, term) AS rk FROM scored)
             |SELECT doc_id, term, tf, df, tfidf_e6
             |FROM rk WHERE rk <= 3""".stripMargin)),

    // ------------------------------------------------ BM25 retrieval
    // Relevance.bm25TopK: ranked retrieval for a 3-term query. Scores
    // are per-(doc,term) contributions floor-scaled to int64 BEFORE the
    // per-doc sum (double summation order differs across engines; int
    // sums don't), avgdl is an exact integer sum over count (never
    // avg()), and the top-20 boundary breaks ties on doc_id.
    "x_bm25" -> (((s: SparkSession, dir: String) =>
      graft.ops.Relevance.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("join", "hash", "stream"), k = 20)),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
             |  FROM documents),
             |tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks WHERE term <> '' GROUP BY doc_id, term),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tc GROUP BY doc_id),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl FROM dl),
             |qdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tc
             |  WHERE term IN ('join', 'hash', 'stream') GROUP BY term),
             |c AS (SELECT tc.doc_id,
             |    CAST(floor(
             |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * (1.2 + 1.0))
             |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
             |        * 1000000.0) AS BIGINT) AS contrib_e6
             |  FROM tc JOIN qdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
             |SELECT doc_id, count(*) AS n_matched,
             |  CAST(sum(contrib_e6) AS BIGINT) AS score_e6
             |FROM c GROUP BY doc_id
             |ORDER BY score_e6 DESC, doc_id LIMIT 20""".stripMargin)),

    // --------------------------------- MaxScore-pruned BM25 retrieval
    // Same ranking contract as x_bm25, computed through upper-bound
    // pruning: "dup" is rare (df ≈ 5% — high idf, ub ≈ 6-15× the
    // frequent terms'), so θ from the k-th best single-term partial
    // exceeds ub(query)+ub(the) and the two frequent posting lists
    // become non-essential — only "dup"-matching docs enter the scoring
    // aggregate. The oracle is the EXACT ranking (identical SQL shape
    // to x_bm25), so a hash match proves the pruning lossless,
    // tie-breaks included.
    "x_bm25_pruned" -> (((s: SparkSession, dir: String) =>
      graft.ops.Relevance.bm25TopKPruned(t(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("dup", "query", "the"), k = 20)),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
             |  FROM documents),
             |tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks WHERE term <> '' GROUP BY doc_id, term),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tc GROUP BY doc_id),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl FROM dl),
             |qdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tc
             |  WHERE term IN ('dup', 'query', 'the') GROUP BY term),
             |c AS (SELECT tc.doc_id,
             |    CAST(floor(
             |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * (1.2 + 1.0))
             |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
             |        * 1000000.0) AS BIGINT) AS contrib_e6
             |  FROM tc JOIN qdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
             |SELECT doc_id, count(*) AS n_matched,
             |  CAST(sum(contrib_e6) AS BIGINT) AS score_e6
             |FROM c GROUP BY doc_id
             |ORDER BY score_e6 DESC, doc_id LIMIT 20""".stripMargin)),

    // ------------------------------------- batch multi-query BM25
    // A 3-query table answered in ONE plan (the retrieval/eval shape —
    // per-query loops don't scale to query logs): queries explode to
    // (query_id, term), broadcast against the term counts, per-query
    // top-5 by window. DuckDB replays the whole fan-out including the
    // corpus-level df/idf and the rank tie-break.
    "x_bm25_batch" -> (((s: SparkSession, dir: String) => {
      import s.implicits._
      val queries = Seq(("q1", "join hash"), ("q2", "dup window"),
        ("q3", "the query scan")).toDF("query_id", "qtext")
      graft.ops.Relevance.bm25BatchTopK(t(s, dir, "documents"), "doc_id",
        "text", queries, "query_id", "qtext", k = 5)
    }),
      Some("""WITH q AS (SELECT * FROM (VALUES ('q1', 'join hash'),
             |    ('q2', 'dup window'), ('q3', 'the query scan'))
             |    t(query_id, qtext)),
             |qt AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
             |  FROM q),
             |toks AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
             |  FROM documents),
             |tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks WHERE term <> '' GROUP BY doc_id, term),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tc GROUP BY doc_id),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl FROM dl),
             |qdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tc
             |  WHERE term IN (SELECT term FROM qt) GROUP BY term),
             |c AS (SELECT qt.query_id, tc.doc_id,
             |    CAST(floor(
             |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * (1.2 + 1.0))
             |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
             |        * 1000000.0) AS BIGINT) AS contrib_e6
             |  FROM tc JOIN qt USING (term) JOIN qdf USING (term)
             |  JOIN dl USING (doc_id) CROSS JOIN stats),
             |g AS (SELECT query_id, doc_id, count(*) AS n_matched,
             |    CAST(sum(contrib_e6) AS BIGINT) AS score_e6
             |  FROM c GROUP BY query_id, doc_id)
             |SELECT query_id, doc_id, n_matched, score_e6, rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY score_e6 DESC, doc_id) AS rk FROM g) t
             |WHERE rk <= 5""".stripMargin)),

    "x_text_stats" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("n_subtokens"),
        length(col("text")).cast("long").as("n_chars_m"),
        TextAnalysis.occurrences(col("text"), "the").as("n_the"))),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_subtokens,
             |  CAST(length(text) AS BIGINT) AS n_chars_m,
             |  CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS n_the
             |FROM documents""".stripMargin)),

    // ------------------------------------------ tokenizer fertility
    // The multilingual-corpus budgeting metric: subword units per
    // whitespace word, per (lang, source) stratum — the number that
    // decides how many TOKENS a corpus slice actually costs to train
    // on. Exact int64 sums; ONE floor division at the end, so the
    // oracle hash-matches despite the ratio.
    "x_tokenizer_fertility" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "documents")
        .select(col("lang"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("nt"),
          TextAnalysis.regexTokenCount(col("text")).as("ns"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("sum_words"),
          sum(col("ns")).as("sum_subtokens"))
        .withColumn("fertility_e6",
          when(col("sum_words") > 0,
            floor(col("sum_subtokens") * lit(1000000L) / col("sum_words"))
              .cast("long"))
            .otherwise(lit(null).cast("long")))),
      Some("""WITH d AS (SELECT lang, source,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             |    END AS nt,
             |    CAST(len(regexp_extract_all(text,
             |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS ns
             |  FROM documents)
             |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(nt) AS BIGINT) AS sum_words,
             |  CAST(sum(ns) AS BIGINT) AS sum_subtokens,
             |  CASE WHEN sum(nt) > 0 THEN CAST(floor(
             |      CAST(sum(ns) AS BIGINT) * 1000000 / CAST(sum(nt) AS BIGINT))
             |    AS BIGINT) ELSE NULL END AS fertility_e6
             |FROM d GROUP BY lang, source""".stripMargin)),

    // -------------------------------------------------- language ID
    "x_text_langid" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.languageId(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("lang"), col("lang_guess"))),
      Some("""WITH sc AS (SELECT doc_id, lang,
             |  CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, 'and', ''))) / 3 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, 'of', ''))) / 2 AS BIGINT) AS s_en,
             |  CAST((length(text) - length(replace(text, 'le', ''))) / 2 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, 'la', ''))) / 2 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, 'et', ''))) / 2 AS BIGINT) AS s_fr,
             |  CAST((length(text) - length(replace(text, 'el', ''))) / 2 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, 'los', ''))) / 3 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, 'que', ''))) / 3 AS BIGINT) AS s_es,
             |  CAST((length(text) - length(replace(text, 'der', ''))) / 3 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, 'und', ''))) / 3 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, 'die', ''))) / 3 AS BIGINT) AS s_de,
             |  CAST((length(text) - length(replace(text, '的', ''))) / 1 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, '是', ''))) / 1 AS BIGINT)
             |    + CAST((length(text) - length(replace(text, '在', ''))) / 1 AS BIGINT) AS s_zh
             |  FROM documents)
             |SELECT doc_id, lang,
             |  CASE WHEN greatest(s_en, s_fr, s_es, s_de, s_zh) = 0 THEN 'und'
             |       WHEN s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'en'
             |       WHEN s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'fr'
             |       WHEN s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'es'
             |       WHEN s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'de'
             |       ELSE 'zh' END AS lang_guess
             |FROM sc""".stripMargin)),

    // -------------------------------- deterministic train/val/test split
    // Per-row assignment verified value-level: DuckDB replays the
    // engine-portable modular hash (same fold the fingerprint/SimHash
    // oracles pin) and the 80/10/10 basis-point thresholds, so a drifted
    // hash, threshold, or normalization fails the hash on any row.
    "x_splits" -> (((s: SparkSession, dir: String) =>
      graft.ops.Splits.assignSplit(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")),
      Some(s"""WITH h AS (SELECT doc_id,
             |    ${portableHashSql("CAST(doc_id AS VARCHAR)")} AS hv
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN hv % 10000 < 8000 THEN 'train'
             |       WHEN hv % 10000 < 9000 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM h""".stripMargin)),

    // --------------------------------- k-fold assignment (k = 5)
    // Cross-validation folds as a pure function of the id — same
    // portable-hash bucket as x_splits, mod k. Per-doc value oracle.
    "x_kfold" -> (((s: SparkSession, dir: String) =>
      graft.ops.Splits.assignFold(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", k = 5)),
      Some(s"""SELECT doc_id,
             |  (${portableHashSql("CAST(doc_id AS VARCHAR)")} % 10000) % 5 AS fold
             |FROM documents""".stripMargin)),

    // ------------------------------- per-group rebalancing (cap at 100)
    // Splits.capPerGroup over languages: hash-deterministic downsampling
    // of over-represented groups via integer cross-multiplication
    // (bucket·n < cap·10000) — DuckDB replays the portable hash, the
    // group counts, and the exact inequality, so the KEPT ROW SET (not
    // just its size) must match.
    "x_rebalance" -> (((s: SparkSession, dir: String) =>
      graft.ops.Splits.capPerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", cap = 100L)),
      Some(s"""WITH h AS (SELECT doc_id, lang,
             |    ${portableHashSql("CAST(doc_id AS VARCHAR)")} % 10000 AS bucket
             |  FROM documents),
             |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS grp_n
             |  FROM documents GROUP BY lang)
             |SELECT doc_id, h.lang FROM h JOIN n ON h.lang = n.lang
             |WHERE bucket * grp_n < 100 * 10000""".stripMargin)),

    // ------------------------------- int8 embedding quantization
    // Per-vector symmetric quantization (scale = max|v|/127, floor(x+.5)
    // — not round(), whose tie behavior differs across engines). DuckDB
    // replays scale and every quantized component from the same floats;
    // q serialized to CSV because the gate's pandas sort can't order
    // list cells. Dequantized-cosine usage is spec'd in OpsSpec.
    "x_quantize_int8" -> (((s: SparkSession, dir: String) =>
      Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"),
          floor(col("scale") * 1e9).cast("long").as("scale_e9"),
          concat_ws(",", transform(col("q"), x => x.cast("string"))).as("q_csv"))),
      Some("""WITH v AS (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |s AS (SELECT vec_id, v,
             |    list_max(list_transform(v, x -> abs(x))) / 127 AS scale FROM v)
             |SELECT vec_id, CAST(floor(scale * 1000000000) AS BIGINT) AS scale_e9,
             |  array_to_string(CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
             |    ELSE list_transform(v, x ->
             |      CAST(greatest(-127, least(127, floor(x / scale + 0.5))) AS INTEGER))
             |    END, ',') AS q_csv
             |FROM s""".stripMargin)),

    // ----------------------------------- gap-based sessionization
    // 30-minute-gap sessions over the events stream, one window shuffle;
    // DuckDB replays the lag/boundary/running-sum formulation exactly
    // (second-truncated epochs both sides).
    "x_sessionize" -> (((s: SparkSession, dir: String) =>
      graft.ops.Sessionize.sessions(t(s, dir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 1800L)
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("span_s"))),
      Some("""WITH e AS (SELECT user_id, event_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
             |g AS (SELECT user_id, event_id, es,
             |    coalesce(es - lag(es) OVER w, CAST(0 AS BIGINT)) AS gap_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
             |x AS (SELECT user_id, es,
             |    CAST(sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY es, event_id
             |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM g)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |  max(es) - min(es) AS span_s
             |FROM x GROUP BY user_id, session_idx""".stripMargin)),

    // ----------------------------------- equi-depth histogram profile
    // 10 equal-frequency buckets over event amounts (exact cents): the
    // bucket index is (rank−1)·k div n over the DISTRIBUTED global rank
    // (never a single-task ntile window); DuckDB replays rank, bucket
    // arithmetic, and per-bucket ranges value-for-value.
    "x_histogram" -> (((s: SparkSession, dir: String) =>
      graft.ops.Profile.equiDepthHistogram(
        t(s, dir, "events").select(cents(col("value")).as("cents"),
          col("event_id")),
        "cents", "event_id", k = 10, numPartitions = 8)),
      Some("""WITH e AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
             |    event_id FROM events),
             |r AS (SELECT cents,
             |    CAST(row_number() OVER (ORDER BY cents, event_id) AS BIGINT) AS rk
             |  FROM e),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
             |SELECT ((rk - 1) * 10) // n AS bucket, count(*) AS n_rows,
             |  min(cents) AS lo, max(cents) AS hi
             |FROM r CROSS JOIN nn GROUP BY 1""".stripMargin)),

    // ------------------------------------------ join-key skew report
    // The pre-join diagnostic: top-10 heaviest o_custkey values with
    // their table share plus the concentration facts (distinct keys,
    // max/mean multiplicity) that pick broadcast vs salt vs AQE. DuckDB
    // replays the count-by-key, the (count desc, key asc) top-k and the
    // floor-scaled ratios exactly.
    "x_skew_report" -> (((s: SparkSession, dir: String) =>
      graft.ops.Profile.skewReport(t(s, dir, "orders"), "o_custkey", k = 10)),
      Some("""WITH pk AS (SELECT o_custkey AS kv, CAST(count(*) AS BIGINT) AS n_rows
             |  FROM orders GROUP BY o_custkey),
             |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(max(n_rows) AS BIGINT) AS max_rows FROM pk),
             |top AS (SELECT kv, n_rows,
             |    row_number() OVER (ORDER BY n_rows DESC, kv ASC NULLS FIRST) AS rank
             |  FROM pk QUALIFY rank <= 10)
             |SELECT rank, coalesce(CAST(kv AS VARCHAR), 'NULL') AS key_value,
             |  n_rows,
             |  CAST(floor(n_rows * 1000000.0 / n_total) AS BIGINT) AS share_e6,
             |  n_total, n_keys,
             |  CAST(floor(max_rows * n_keys * 100 / n_total) AS BIGINT) AS skew_ratio_e2
             |FROM top CROSS JOIN tot""".stripMargin)),

    // ------------------------------- MAD robust outliers (median/median)
    // Median absolute deviation per event type over exact cents: medians
    // of int64s interpolate to halves/quarters (exactly representable),
    // and the 5·MAD outlier test compares those exact values — no
    // stddev, no mean, robust to the outliers it is hunting.
    "x_mad" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
      // ADAPTIVE exact-percentile routing (r16): the op falls back to
      // the stock aggregate while every group's distinct-value count
      // fits one reducer, and switches to the bounded bucketed search
      // above the threshold — same numbers either way (QuantilesSpec)
      val med = graft.ops.Quantiles.percentilesCont(ev, "event_type",
        "c", Seq(("med_c", 1L, 2L)))
      val dev = ev.join(med, Seq("event_type"))
        .withColumn("dev", abs(col("c") - col("med_c")))
      // dev is DOUBLE (exact halves — a median of int64s interpolates
      // at .5): the sortable-bits domain (r17) runs the bounded search
      // on it directly, retiring the r16 doubled-int detour; both are
      // bit-exact here and QuantilesSpec pins the double path against
      // the stock aggregate
      val mad = graft.ops.Quantiles.percentilesCont(
        dev, "event_type", "dev", Seq(("mad_c", 1L, 2L)))
        .select(col("event_type"), col("mad_c"))
      dev.join(mad, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("med_c")).as("med_c"),
          min(col("mad_c")).as("mad_c"),
          sum(when(col("dev") > col("mad_c") * 5, 1L).otherwise(0L))
            .as("n_outliers"))
    }),
      Some("""WITH e AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c
             |    FROM events),
             |m AS (SELECT event_type, quantile_cont(c, 0.5) AS med_c
             |  FROM e GROUP BY 1),
             |d AS (SELECT e.event_type, abs(c - med_c) AS dev, med_c
             |  FROM e JOIN m USING (event_type)),
             |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad_c
             |  FROM d GROUP BY 1)
             |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
             |  min(med_c) AS med_c, min(mad_c) AS mad_c,
             |  CAST(sum(CASE WHEN dev > 5 * mad_c THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers
             |FROM d JOIN md USING (event_type) GROUP BY 1""".stripMargin)),

    // ------------------------------------- rolling range-frame window
    // 7-day trailing spend per user over daily purchase totals — the
    // RANGE frame (value-based, gap-aware: 6 PRECEDING means six DAYS,
    // not six rows) that no other query pins. Exact int64 cents
    // throughout, so the window sums hash-match.
    "x_rolling" -> (((s: SparkSession, dir: String) => {
      val daily = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(sum(cents(col("value"))).as("day_cents"))
        .withColumn("dn", datediff(col("d"), lit("2024-01-01").cast("date")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("dn"))
        .rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("roll_cents", sum(col("day_cents")).over(w))
        .withColumn("roll_days", count(lit(1)).over(w))
        .select("user_id", "d", "day_cents", "roll_cents", "roll_days")
    }),
      Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d,
             |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |n AS (SELECT *, date_diff('day', DATE '2024-01-01', d) AS dn FROM daily)
             |SELECT user_id, d, day_cents,
             |  CAST(sum(day_cents) OVER (PARTITION BY user_id ORDER BY dn
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents,
             |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY dn
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_days
             |FROM n""".stripMargin)),

    // --------------------------------------- Markov transition matrix
    // First-order event-type transitions per user (lead over the
    // Sessionize ordering convention: whole epoch seconds + event_id,
    // so sub-second reader precision can't flip the sequence), row-
    // normalized to e6 fixed-point probabilities — floor of a pure
    // IEEE divide, portable across engines.
    "x_markov" -> (((s: SparkSession, dir: String) =>
      graft.ops.Events.transitions(t(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id")),
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
             |p AS (SELECT event_type AS src, lead(event_type) OVER
             |    (PARTITION BY user_id ORDER BY es, event_id) AS dst FROM e),
             |c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
             |  FROM p WHERE dst IS NOT NULL GROUP BY 1, 2)
             |SELECT src, dst, n,
             |  CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS row_total,
             |  CAST(floor(n * 1000000.0 / (sum(n) OVER (PARTITION BY src)))
             |    AS BIGINT) AS p_e6
             |FROM c""".stripMargin)),

    // ------------------------------ distribution windows (ntile pack)
    // Per-nation quartile assignment + percent_rank + cume_dist over
    // customer balances — the rank-distribution window family no other
    // query pins. The ordering is (exact cents, custkey): unique, so
    // rank = row position in both engines; the fractional ranks are
    // single IEEE divides of small ints, e6-floored. Partitioned
    // windows shuffle once on the partition key; a GLOBAL equi-depth
    // split at scale belongs to Profile.equiDepth (x_histogram), which
    // avoids the one-task ORDER BY this family would need un-partitioned.
    "x_ntile" -> (((s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey").cast("long").as("nation"),
        cents(col("c_acctbal")).as("bal_c"))
      val w = Window.partitionBy(col("nation"))
        .orderBy(col("bal_c"), col("c_custkey"))
      c.select(col("nation"), col("c_custkey"), col("bal_c"),
        ntile(4).over(w).cast("long").as("quartile"),
        floor(percent_rank().over(w) * lit(1000000.0d)).cast("long")
          .as("pct_rank_e6"),
        floor(cume_dist().over(w) * lit(1000000.0d)).cast("long")
          .as("cume_e6"))
    }),
      Some("""WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
             |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer)
             |SELECT nation, c_custkey, bal_c,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  CAST(floor(percent_rank() OVER w * 1000000.0) AS BIGINT)
             |    AS pct_rank_e6,
             |  CAST(floor(cume_dist() OVER w * 1000000.0) AS BIGINT) AS cume_e6
             |FROM c WINDOW w AS (PARTITION BY nation ORDER BY bal_c, c_custkey)"""
        .stripMargin)),

    // ------------------------------- grouped least-squares regression
    // Per-event-type linear trend of spend (exact cents) on day number:
    // the five sufficient statistics (n, Σx, Σy, Σx², Σxy) are exact
    // int64 sums — order-insensitive, hash-stable — and slope/intercept
    // are derived from them by IEEE arithmetic written identically on
    // both sides. One map-side-combined aggregate; no window, no join.
    "x_regression" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        cents(col("value")).as("y"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
        .filter(col("den") =!= 0L)
        .withColumn("slope_e6",
          floor(lit(1000000.0d) * col("num") / col("den")).cast("long"))
        .withColumn("icept_e6",
          floor((lit(1000000.0d) * col("sy") -
            (lit(1000000.0d) * col("num") / col("den")) * col("sx")) / col("n"))
            .cast("long"))
    }),
      Some("""WITH e AS (SELECT event_type,
             |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
             |      AS BIGINT) AS x,
             |    CAST(floor(value * 100) AS BIGINT) AS y FROM events),
             |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM e GROUP BY 1),
             |d AS (SELECT *, n * sxy - sx * sy AS num,
             |    n * sxx - sx * sx AS den FROM s)
             |SELECT event_type, n, sx, sy, sxx, sxy, num, den,
             |  CAST(floor(1000000.0 * num / den) AS BIGINT) AS slope_e6,
             |  CAST(floor((1000000.0 * sy - (1000000.0 * num / den) * sx) / n)
             |    AS BIGINT) AS icept_e6
             |FROM d WHERE den <> 0""".stripMargin)),

    // ------------------------------------------- triangle counting
    // Per-vertex triangle participation in the undirected k-NN graph —
    // the local-clustering signal of the embedding space. The edge set
    // is BOUNDED-DEGREE by construction (≤ 2k per vertex), so wedge
    // volume is O(k²·|V|): the graph choice, not just the (degree, id)
    // orientation inside Triangles, is what keeps triangle counting
    // linear at corpus scale. (The first cut ran on the co-purchase
    // graph — avg degree ~120 at sf0.1, 72M wedges, 85 s; a dense
    // co-occurrence graph needs a weight threshold BEFORE triangle
    // counting.) Oracle: knn CTE → undirected edge distinct → plain
    // three-way join.
    "x_triangles" -> (((s: SparkSession, dir: String) => {
      import graft.ops.Triangles
      val g = Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 3, planes = 4)
      val edges = g.select(least(col("src_id"), col("dst_id")).as("a"),
        greatest(col("src_id"), col("dst_id")).as("b")).distinct()
      Triangles.perVertexCounts(edges)
    }),
      Some(s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |    FROM embeddings),
             |bk AS (SELECT vec_id, v, ${bucketSql(4)} AS bucket FROM e0),
             |p AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
             |    list_cosine_similarity(a.v, b.v) AS cs
             |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY src_id
             |    ORDER BY cs DESC, dst_id) AS rk FROM p),
             |e AS (SELECT DISTINCT least(src_id, dst_id) AS a,
             |    greatest(src_id, dst_id) AS b FROM rk WHERE rk <= 3),
             |tri AS (SELECT e1.a AS u, e1.b AS x, e2.b AS y
             |  FROM e e1 JOIN e e2 ON e1.b = e2.a
             |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
             |SELECT vertex, CAST(count(*) AS BIGINT) AS n_tri FROM (
             |  SELECT u AS vertex FROM tri
             |  UNION ALL SELECT x FROM tri
             |  UNION ALL SELECT y FROM tri)
             |GROUP BY 1""".stripMargin)),

    // ------------------------------- persisted HLL sketches (merge)
    // The distinct-count sibling of x_stream_countmin's maintenance
    // story: per-(type, day) HyperLogLog sketches are PERSISTED as
    // binary state (KBs per cell — the incremental form: a new day adds
    // one sketch row, never re-scans history), then merged across days
    // for the full-range distinct estimate. Property oracle for the
    // estimate (DataSketches internals aren't SQL-replayable) beside
    // exact values the oracle recomputes: distinct days and exact
    // distinct users. lgk=12 → ~1.6% relative error; the 5% bound
    // leaves margin.
    "x_hll_merge" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_hll", dir)
      val ev = t(s, dir, "events")
      ev.groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .write.mode("overwrite").parquet(s"$scratch/sketches")
      val merged = s.read.parquet(s"$scratch/sketches")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      merged.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            col("n_exact") * lit(0.05d)).as("est_ok"))
    }),
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
             |  TRUE AS est_ok
             |FROM events GROUP BY 1""".stripMargin)),

    // ------------------------------------------- IQR fence outliers
    // The third robust-outlier family beside MAD (x_mad) and z-score
    // (x_anomaly_zscore): Tukey fences at Q1/Q3 ± 1.5·IQR over exact
    // cents — interpolated quartiles of int64s are exactly
    // representable (quarters), so the fences and the counts they gate
    // hash-match.
    "x_outlier_iqr" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
      // the bounded exact-percentile search, pinned to the scale path
      // (smallThreshold = 0) so every gate SF proves hash parity
      val q = graft.ops.Quantiles.percentilesCont(ev, "event_type", "c",
          Seq(("q1", 1L, 4L), ("q3", 3L, 4L)), smallThreshold = 0L)
        .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
        .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      ev.join(q, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("lo")).as("lo"),
          max(col("hi")).as("hi"),
          sum(when(col("c") < col("lo") || col("c") > col("hi"), 1L)
            .otherwise(0L)).as("n_outliers"))
    }),
      Some("""WITH e AS (SELECT event_type,
             |    CAST(floor(value * 100) AS BIGINT) AS c FROM events),
             |q AS (SELECT event_type, quantile_cont(c, 0.25) AS q1,
             |    quantile_cont(c, 0.75) AS q3 FROM e GROUP BY 1),
             |f AS (SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo,
             |    q3 + (q3 - q1) * 1.5 AS hi FROM q)
             |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
             |  min(lo) AS lo, max(hi) AS hi,
             |  CAST(sum(CASE WHEN c < lo OR c > hi THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM e JOIN f USING (event_type) GROUP BY 1""".stripMargin)),

    // ------------------------------------------- gaps and islands
    // Consecutive-day activity streaks per user — the classic
    // rn-difference trick: within a user's DISTINCT active days,
    // day_number − row_number is constant exactly along a run of
    // consecutive days, so one window plus one groupBy finds every
    // island without self-joins or iteration. Output: streak count,
    // longest streak, total active days.
    "x_gaps_islands" -> (((s: SparkSession, dir: String) => {
      val days = t(s, dir, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("d"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      val islands = days
        .withColumn("grp", col("d") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
      islands.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("max_streak"),
          sum(col("len")).as("active_days"))
    }),
      Some("""WITH days AS (SELECT DISTINCT user_id,
             |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
             |      AS BIGINT) AS d FROM events),
             |g AS (SELECT user_id, d,
             |    d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
             |  FROM days),
             |islands AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
             |  FROM g GROUP BY 1, 2)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
             |  CAST(max(len) AS BIGINT) AS max_streak,
             |  CAST(sum(len) AS BIGINT) AS active_days
             |FROM islands GROUP BY 1""".stripMargin)),

    // ---------------------------------------- feature-store composite
    // A per-user feature table assembled from four operator families in
    // one job — the feature-engineering capstone beside the fraud (c9)
    // and curation (x_curation_pipeline) composites: event volume +
    // exact spend, type-diversity Gini, half-life decayed spend, and
    // longest activity streak, joined on the entity key (every side is
    // already one row per user, so the joins are co-partitioned by
    // AQE). The oracle replays all four feature families in one SQL —
    // drift in ANY feature moves its column and fails the hash.
    "x_feature_store" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val base = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("spend_c"))
      val gini = ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("ni"))
        .groupBy(col("user_id"))
        .agg(sum(col("ni")).as("n"), sum(col("ni") * col("ni")).as("ss"))
        .select(col("user_id"),
          floor(lit(1000000.0d) * (col("n") * col("n") - col("ss")) /
            (col("n") * col("n"))).cast("long").as("gini_e6"))
      val decayed = ev.select(col("user_id"), cents(col("value")).as("c"),
          datediff(lit("2024-01-31").cast("date"), to_date(col("ts")))
            .cast("long").as("age"))
        .withColumn("dv",
          expr("c * 1048576L div shiftleft(1L, cast(age as int))"))
        .groupBy(col("user_id")).agg(sum(col("dv")).as("decayed_e20"))
      val streak = {
        val days = ev.select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("d")).distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
        days.withColumn("grp", col("d") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("user_id")).agg(max(col("len")).as("max_streak"))
      }
      base.join(gini, Seq("user_id"))
        .join(decayed, Seq("user_id"))
        .join(streak, Seq("user_id"))
    }),
      Some("""WITH base AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS spend_c
             |  FROM events GROUP BY 1),
             |tc AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS ni
             |  FROM events GROUP BY 1, 2),
             |gini AS (SELECT user_id,
             |    CAST(floor(1000000.0 * (sum(ni) * sum(ni) - sum(ni * ni)) /
             |      (sum(ni) * sum(ni))) AS BIGINT) AS gini_e6
             |  FROM tc GROUP BY 1),
             |dec AS (SELECT user_id,
             |    CAST(sum(CAST(floor(value * 100) AS BIGINT) * 1048576 //
             |      (CAST(1 AS BIGINT) << date_diff('day', CAST(ts AS DATE),
             |        DATE '2024-01-31'))) AS BIGINT) AS decayed_e20
             |  FROM events GROUP BY 1),
             |days AS (SELECT DISTINCT user_id,
             |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
             |      AS BIGINT) AS d FROM events),
             |isl AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
             |  FROM (SELECT user_id, d,
             |      d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
             |    FROM days) GROUP BY user_id, grp),
             |streak AS (SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
             |  FROM isl GROUP BY 1)
             |SELECT base.user_id, n_events, spend_c, gini_e6, decayed_e20,
             |  max_streak
             |FROM base JOIN gini USING (user_id) JOIN dec USING (user_id)
             |JOIN streak USING (user_id)""".stripMargin)),

    // ---------------------------------------------- Count-Min sketch
    // Sublinear frequency estimation: a 3×512 sketch built over order
    // custkeys in ONE bounded aggregation (map-side combine caps each
    // partition's shuffle at depth·width cells), probed for the top-20
    // customers beside their exact counts. The salted hashes are the
    // engine-portable 62-bit fold, so DuckDB rebuilds the sketch cell
    // for cell and the `est` column hash-matches EXACTLY — collisions
    // and all — while est ≥ n pins the no-underestimate guarantee.
    "x_countmin" -> (((s: SparkSession, dir: String) => {
      import graft.ops.Sketches
      val src = t(s, dir, "orders").select(col("o_custkey").cast("long").as("k"))
      val sketch = Sketches.countMinBuild(src, col("k"), depth = 3, width = 512)
      val top = src.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("k").asc).limit(20)
      val est = Sketches.countMinEstimate(sketch, top.select(col("k")),
        col("k"), depth = 3, width = 512)
      top.join(est, top("k") === est("key"))
        .select(col("k"), col("n"), col("est"))
    }),
      Some(countMinOracleSql)),

    // ----------------------- streaming Count-Min maintenance under the gate
    // The sketch absorbed from a STREAM: three micro-batches of order
    // custkeys merge into the persisted state (cell sums add — the
    // commutative-monoid property that makes sketches distributable),
    // with the micro-batch id committed in the same atomic swap so a
    // replayed batch is never double-counted. The final state must
    // equal the one-shot sketch over all orders — the oracle is
    // x_countmin's cell-exact replay, verbatim.
    "x_stream_countmin" -> (((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.ops.Sketches
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val scratch = scratchDir("graft_streamcm", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      val src = t(s, dir, "orders")
        .select(col("o_custkey").cast("long").as("k"),
          col("o_orderkey").cast("long").as("ok"))
      // bounded fixture feed (the x_stream_dedup convention): keys
      // partitioned into three drops by order key
      val keys = src.collect().map(r => (r.getLong(0), r.getLong(1)))
      val mem = MemoryStream[Long]
      withStreamPartitions(s) {
        val q = graft.streaming.StreamingIngest.startSketchMaintenance(
          cat, "cm_state", mem.toDF().toDF("k"), "k",
          scratch.resolve("ckpt").toString, depth = 3, width = 512)
        try (0 until 3).foreach { i =>
          mem.addData(keys.collect { case (k, ok) if ok % 3 == i => k }
            .toIndexedSeq: _*)
          q.processAllAvailable()
        } finally q.stop()
      }
      val state = cat.read("cm_state").select(col("row"), col("bucket"), col("cnt"))
      val top = src.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("k").asc).limit(20)
      val est = Sketches.countMinEstimate(state, top.select(col("k")),
        col("k"), depth = 3, width = 512)
      top.join(est, top("k") === est("key"))
        .select(col("k"), col("n"), col("est"))
    }),
      Some(countMinOracleSql)),

    // ---------------------------- BPE-style merge induction (3 rounds)
    // Tokenizer training's core loop at word granularity: three rounds
    // of corpus-argmax adjacent-pair fusion with greedy left-to-right
    // rewriting (ops.Bpe). The oracle replays ALL of it — pair counts,
    // the deterministic argmax, and the rewrite fold (DuckDB
    // list_reduce with (acc, pending) struct state ≡ Spark's aggregate
    // HOF) — and the output fingerprints every rewritten sequence with
    // the portable hash, so one wrong merge anywhere in any round
    // fails the hash. R rounds = R corpus passes with only (pair,
    // count) rows ever shuffled: the honest BPE cost model.
    "x_bpe" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        expr("filter(split(trim(text), '\\\\s+'), t -> length(t) > 0)")
          .as("toks"))
      val before = docs.select(col("doc_id"), size(col("toks")).as("n_before"))
      val (merged, _) = graft.ops.Bpe.train(docs, "doc_id", rounds = 3)
      merged
        .select(col("doc_id"), size(col("toks")).as("n_after"),
          graft.functions.PortableHash62.portableHash62(
            concat_ws(" ", col("toks"))).as("fp"))
        .join(before, Seq("doc_id"))
    }),
      Some(s"""WITH cur0 AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
             |  FROM documents),
             |${bpeRoundSql(1)},
             |${bpeRoundSql(2)},
             |${bpeRoundSql(3)}
             |SELECT c3.doc_id, CAST(len(c3.toks) AS BIGINT) AS n_after,
             |  ${portableHashSql("array_to_string(c3.toks, ' ')")} AS fp,
             |  CAST(len(c0.toks) AS BIGINT) AS n_before
             |FROM cur3 c3 JOIN cur0 c0 ON c0.doc_id = c3.doc_id"""
        .stripMargin)),

    // ----------------------- BPE at character granularity (2 rounds)
    // The same machinery as x_bpe on CHARACTER symbols — actual
    // byte-pair encoding: two merge rounds over the first 40
    // characters of each doc, fingerprinted per doc. Pins the claim
    // that Bpe's fold/argmax are granularity-agnostic; the oracle
    // splits per character exactly like the portable-hash replays do.
    "x_bpe_char" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        expr("filter(split(substring(text, 1, 40), ''), c -> c <> '')")
          .as("toks"))
      val before = docs.select(col("doc_id"), size(col("toks")).as("n_before"))
      val (merged, _) = graft.ops.Bpe.train(docs, "doc_id", rounds = 2)
      merged
        .select(col("doc_id"), size(col("toks")).as("n_after"),
          graft.functions.PortableHash62.portableHash62(
            concat_ws(" ", col("toks"))).as("fp"))
        .join(before, Seq("doc_id"))
    }),
      Some(s"""WITH cur0 AS (SELECT doc_id,
             |    list_filter(string_split(substr(text, 1, 40), ''),
             |      c -> c <> '') AS toks
             |  FROM documents),
             |${bpeRoundSql(1)},
             |${bpeRoundSql(2)}
             |SELECT c2.doc_id, CAST(len(c2.toks) AS BIGINT) AS n_after,
             |  ${portableHashSql("array_to_string(c2.toks, ' ')")} AS fp,
             |  CAST(len(c0.toks) AS BIGINT) AS n_before
             |FROM cur2 c2 JOIN cur0 c0 ON c0.doc_id = c2.doc_id"""
        .stripMargin)),

    // --------------- sample-trained BPE + one-pass merge-table apply
    // The scale-safe tokenizer pipeline (VERDICT r5 top_next): a
    // 24-entry merge table is induced on a bounded deterministic
    // sample (96 docs in portable-hash order — the Pq.trainCodebooks
    // sidecar pattern, driver-local microseconds), then the WHOLE
    // table is applied corpus-wide in exactly ONE pass by the
    // codegen'd BpeApply kernel — vs x_bpe's R-corpus-rewrites cost
    // model, which is honest for induction but unusable for applying
    // a real 10k-50k-merge vocabulary. The oracle replays everything:
    // sample selection, all 24 training argmaxes, and the sequential
    // 24-fold rewrite of every corpus doc, fingerprinted per doc — so
    // one wrong merge choice OR one kernel deviation from sequential
    // semantics anywhere fails the hash.
    "x_bpe_apply" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        expr("filter(split(trim(text), '\\\\s+'), t -> length(t) > 0)")
          .as("toks"))
      val merges = graft.ops.Bpe.trainOnSample(docs, "doc_id",
        rounds = 24, maxTrainRows = 96)
      val applied = graft.ops.Bpe.applyMerges(col("toks"), merges)
      docs.select(col("doc_id"), size(col("toks")).as("n_before"),
        size(applied).as("n_after"),
        graft.functions.PortableHash62.portableHash62(
          concat_ws(" ", applied)).as("fp"))
    }),
      Some(bpeApplyOracleSql(rounds = 24, sampleN = 96))),

    // ----------------------------------- exact AUC (Mann–Whitney)
    // The ranking-quality metric for a trained scorer, computed
    // EXACTLY: AUC = U/(n₁n₀) with midranks for ties, where 2·midrank
    // = 2·lo + tie − 1 keeps everything in int64 until one final IEEE
    // divide. Global ranks come from Packing.withGlobalRank (the
    // distributed prefix-sum rank) — a bare row_number() over a global
    // ORDER BY would funnel every scored entity through ONE task,
    // which is the whole reason this metric is usually approximated at
    // scale. Score: total spend; label: more purchases than clicks.
    "x_auc" -> (((s: SparkSession, dir: String) => {
      val per = t(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(cents(col("value"))).as("sc"),
          when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
               sum(when(col("event_type") === "click", 1L).otherwise(0L)), 1L)
            .otherwise(0L).as("y"))
      // checkpoint BEFORE ranking: repartitionByRange's sampling pass
      // executes its input once more, so un-materialized `per` would
      // re-aggregate the full event table per pass (probed: the rank
      // stage alone cost 2.2 s on 1500 rows); downstream consumers then
      // re-derive cheaply from the materialized rows
      val perCk = per.localCheckpoint(true)
      val ranked = graft.ops.Packing.withGlobalRank(perCk,
        Seq("sc", "user_id"), "pos")
      val grp = ranked.groupBy(col("sc").as("sc2"))
        .agg(min(col("pos")).as("lo"), count(lit(1)).as("tie"))
      val mid2 = ranked.join(grp, col("sc") === col("sc2"))
        .withColumn("mr2", lit(2L) * col("lo") + col("tie") - 1L)
      mid2.agg(
          sum(when(col("y") === 1L, col("mr2")).otherwise(0L)).as("r1_2"),
          sum(col("y")).as("n1"), count(lit(1)).as("n"))
        .withColumn("n0", col("n") - col("n1"))
        .withColumn("u2", col("r1_2") - col("n1") * (col("n1") + 1))
        .withColumn("auc_e6",
          floor(lit(1000000.0d) * col("u2") /
            (lit(2.0d) * col("n1") * col("n0"))).cast("long"))
        .select(col("n1"), col("n0"), col("u2"), col("auc_e6"))
    }),
      Some("""WITH per AS (SELECT user_id,
             |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sc,
             |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |       > sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      THEN 1 ELSE 0 END AS y
             |  FROM events GROUP BY 1),
             |r AS (SELECT *, row_number() OVER (ORDER BY sc, user_id) AS pos
             |  FROM per),
             |g AS (SELECT sc AS sc2, CAST(min(pos) AS BIGINT) AS lo,
             |    CAST(count(*) AS BIGINT) AS tie FROM r GROUP BY 1),
             |m AS (SELECT r.y, 2 * g.lo + g.tie - 1 AS mr2
             |  FROM r JOIN g ON r.sc = g.sc2),
             |a AS (SELECT
             |    CAST(sum(CASE WHEN y = 1 THEN mr2 ELSE 0 END) AS BIGINT) AS r1_2,
             |    CAST(sum(y) AS BIGINT) AS n1, CAST(count(*) AS BIGINT) AS n
             |  FROM m)
             |SELECT n1, n - n1 AS n0, r1_2 - n1 * (n1 + 1) AS u2,
             |  CAST(floor(1000000.0 * (r1_2 - n1 * (n1 + 1)) /
             |    (2.0 * n1 * (n - n1))) AS BIGINT) AS auc_e6
             |FROM a""".stripMargin)),

    // ------------------------------------ calibration deciles
    // Reliability diagram data for the same scorer/label pair as
    // x_auc: decile membership comes from the DISTRIBUTED global rank
    // — bin = (10·(pos−1)) div n, equal-mass bins without a one-task
    // ntile — and each bin reports its exact positive rate as e6. A
    // miscalibrated-scorer audit is a training-pipeline staple; every
    // number here is an exact integer until the final divide.
    "x_calibration" -> (((s: SparkSession, dir: String) => {
      val per = t(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(cents(col("value"))).as("sc"),
          when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
               sum(when(col("event_type") === "click", 1L).otherwise(0L)), 1L)
            .otherwise(0L).as("y"))
      val ranked = graft.ops.Packing.withGlobalRank(
        per.localCheckpoint(true), Seq("sc", "user_id"), "pos")
      val n = Window.partitionBy()
      ranked
        .withColumn("nn", count(lit(1)).over(n))
        .withColumn("bin", expr("(10 * (pos - 1)) div nn"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_bin"), sum(col("y")).as("n_pos"),
          min(col("sc")).as("sc_min"), max(col("sc")).as("sc_max"))
        .withColumn("rate_e6",
          floor(lit(1000000.0d) * col("n_pos") / col("n_bin")).cast("long"))
    }),
      Some("""WITH per AS (SELECT user_id,
             |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sc,
             |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |       > sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      THEN 1 ELSE 0 END AS y
             |  FROM events GROUP BY 1),
             |r AS (SELECT *, row_number() OVER (ORDER BY sc, user_id) AS pos,
             |    count(*) OVER () AS nn FROM per),
             |b AS (SELECT (10 * (pos - 1)) // nn AS bin, y, sc FROM r)
             |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_bin,
             |  CAST(sum(y) AS BIGINT) AS n_pos,
             |  CAST(min(sc) AS BIGINT) AS sc_min,
             |  CAST(max(sc) AS BIGINT) AS sc_max,
             |  CAST(floor(1000000.0 * sum(y) / count(*)) AS BIGINT) AS rate_e6
             |FROM b GROUP BY 1""".stripMargin)),

    // ----------------------------------- precision/recall at k
    // Retrieval-style eval for the spend scorer: the top-100 by
    // (score desc, id) — a TakeOrdered, never a global sort — scored
    // against the purchase-heavy label; precision@k and recall@k as
    // e6 beside the exact hit count.
    "x_precision_at_k" -> (((s: SparkSession, dir: String) => {
      val per = t(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(cents(col("value"))).as("sc"),
          when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
               sum(when(col("event_type") === "click", 1L).otherwise(0L)), 1L)
            .otherwise(0L).as("y"))
      val top = per.orderBy(col("sc").desc, col("user_id").asc).limit(100)
      val tot = per.agg(sum(col("y")).as("total_pos"))
      top.agg(count(lit(1)).as("k"), sum(col("y")).as("hits"))
        .crossJoin(broadcast(tot))
        .select(col("k"), col("hits"), col("total_pos"),
          floor(lit(1000000.0d) * col("hits") / col("k")).cast("long")
            .as("precision_e6"),
          floor(lit(1000000.0d) * col("hits") / col("total_pos")).cast("long")
            .as("recall_e6"))
    }),
      Some("""WITH per AS (SELECT user_id,
             |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sc,
             |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |       > sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      THEN 1 ELSE 0 END AS y
             |  FROM events GROUP BY 1),
             |top AS (SELECT * FROM per ORDER BY sc DESC, user_id ASC LIMIT 100),
             |tot AS (SELECT CAST(sum(y) AS BIGINT) AS total_pos FROM per)
             |SELECT CAST(count(*) AS BIGINT) AS k,
             |  CAST(sum(y) AS BIGINT) AS hits, total_pos,
             |  CAST(floor(1000000.0 * sum(y) / count(*)) AS BIGINT)
             |    AS precision_e6,
             |  CAST(floor(1000000.0 * sum(y) / total_pos) AS BIGINT)
             |    AS recall_e6
             |FROM top CROSS JOIN tot GROUP BY total_pos""".stripMargin)),

    // ----------------------------------------- raw-SQL entry path
    // The engine's ANSI SQL front door — reference users write SQL, so
    // one registry query runs END TO END through spark.sql over temp
    // views (TPC-H Q3 shape: segment-filtered customers × orders ×
    // lineitem, grouped revenue, top-10). The oracle is near-verbatim
    // the same SQL: the point is that the text itself is portable.
    // Catalyst treats the parsed plan identically to the DataFrame
    // form — filters push to the scans, dims broadcast.
    "x_sql_api" -> (((s: SparkSession, dir: String) => {
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_orderkey,
          CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
            AS BIGINT)) AS BIGINT) AS revenue_c,
          CAST(o_orderdate AS DATE) AS odate
        FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue_c DESC, l_orderkey ASC
        LIMIT 10""")
    }),
      Some("""SELECT l_orderkey,
             |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |    AS BIGINT)) AS BIGINT) AS revenue_c,
             |  CAST(o_orderdate AS DATE) AS odate
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue_c DESC, l_orderkey ASC
             |LIMIT 10""".stripMargin)),

    // ------------------------------- time-weighted average (TWAP)
    // Duration-weighted mean event value per user: each observation
    // holds until the next one (lead delta in whole epoch seconds —
    // the Sessionize ordering convention), so a value's weight is the
    // time it was in force, not its sample count — the metric plain
    // AVG silently gets wrong on irregular series. Σ(v·dt) and Σdt
    // stay exact int64; one window + one aggregate.
    "x_twap" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("es"), col("event_id"),
        cents(col("value")).as("c"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("es").asc, col("event_id").asc)
      ev.withColumn("dt", lead(col("es"), 1).over(w) - col("es"))
        .filter(col("dt").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_holds"), sum(col("dt")).as("span_s"),
          sum(col("c") * col("dt")).as("vt"))
        .filter(col("span_s") > 0)
        .withColumn("twap_c_e2",
          floor(lit(100.0d) * col("vt") / col("span_s")).cast("long"))
    }),
      Some("""WITH e AS (SELECT user_id, event_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
             |    CAST(floor(value * 100) AS BIGINT) AS c FROM events),
             |d AS (SELECT user_id, c,
             |    lead(es) OVER (PARTITION BY user_id
             |      ORDER BY es ASC, event_id ASC) - es AS dt
             |  FROM e),
             |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_holds,
             |    CAST(sum(dt) AS BIGINT) AS span_s,
             |    CAST(sum(c * dt) AS BIGINT) AS vt
             |  FROM d WHERE dt IS NOT NULL GROUP BY 1)
             |SELECT user_id, n_holds, span_s, vt,
             |  CAST(floor(100.0 * vt / span_s) AS BIGINT) AS twap_c_e2
             |FROM g WHERE span_s > 0""".stripMargin)),

    // --------------------------------- peak concurrency (sweep line)
    // Max simultaneous open intervals per user — each event opens a
    // 5-minute presence window; the sweep turns intervals into ±1
    // boundary events and a running sum per user, whose max is the
    // peak. One union, one window, one aggregate: no interval
    // self-join, so cost is O(n log n) by partition instead of the
    // O(n²) pairwise-overlap formulation. Boundary order pins
    // END-BEFORE-START at the same instant (a window closing exactly
    // when another opens does not overlap it) via the delta sort key.
    "x_concurrency" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("s"))
        .withColumn("e", col("s") + 300L)
      val bounds = ev.select(col("user_id"), col("s").as("at"), lit(1L).as("delta"))
        .unionByName(ev.select(col("user_id"), col("e").as("at"),
          lit(-1L).as("delta")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("at").asc, col("delta").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds.withColumn("open", sum(col("delta")).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("open")).as("peak"), count(lit(1)).as("n_bounds"))
    }),
      Some("""WITH ev AS (SELECT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
             |b AS (SELECT user_id, s AS at, CAST(1 AS BIGINT) AS delta FROM ev
             |  UNION ALL
             |  SELECT user_id, s + 300, CAST(-1 AS BIGINT) FROM ev),
             |r AS (SELECT user_id,
             |    CAST(sum(delta) OVER (PARTITION BY user_id
             |      ORDER BY at ASC, delta ASC ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS open
             |  FROM b)
             |SELECT user_id, CAST(max(open) AS BIGINT) AS peak,
             |  CAST(count(*) AS BIGINT) AS n_bounds
             |FROM r GROUP BY 1""".stripMargin)),

    // ------------------------------- first/last_value frame semantics
    // The window family's classic pitfall, pinned explicitly: with the
    // DEFAULT frame (range unbounded-preceding → current-row),
    // last_value is just the current row; the useful "per-partition
    // last" needs the full-frame override. Both engines replay both
    // frames, plus nth_value on the full frame — each customer's
    // first/second/latest order keys by date.
    "x_first_last" -> (((s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"))
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val full = ord.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      o.select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(ord).as("first_default"),
          last(col("o_orderkey")).over(ord).as("last_default"),
          last(col("o_orderkey")).over(full).as("last_full"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_full"))
    }),
      Some("""SELECT o_custkey, o_orderkey,
             |  first_value(o_orderkey) OVER w AS first_default,
             |  last_value(o_orderkey) OVER w AS last_default,
             |  last_value(o_orderkey) OVER wf AS last_full,
             |  nth_value(o_orderkey, 2) OVER wf AS second_full
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |    ORDER BY o_orderdate ASC, o_orderkey ASC),
             |  wf AS (PARTITION BY o_custkey
             |    ORDER BY o_orderdate ASC, o_orderkey ASC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
        .stripMargin)),

    // --------------------------------------- Levenshtein distances
    // String-similarity scoring with the BUILT-IN edit distance both
    // engines implement identically over unicode code points —
    // complementing FuzzyJoin's deletion-neighborhood candidate
    // generation (which avoids computing this on all pairs) with the
    // direct metric itself: each customer name against its +1000
    // neighbor, distance histogram.
    "x_levenshtein" -> (((s: SparkSession, dir: String) => {
      val d16 = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 16).as("p"))
      val a = d16.alias("a"); val b = d16.alias("b")
      a.join(b, col("a.doc_id") + 1 === col("b.doc_id"))
        .select(levenshtein(col("a.p"), col("b.p")).as("d"))
        .groupBy(col("d").cast("long").as("d"))
        .agg(count(lit(1)).as("n"))
    }),
      Some("""WITH p AS (SELECT doc_id, substr(text, 1, 16) AS p FROM documents)
             |SELECT CAST(levenshtein(a.p, b.p) AS BIGINT) AS d,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM p a JOIN p b ON a.doc_id + 1 = b.doc_id
             |GROUP BY 1""".stripMargin)),

    // ----------------------------------------- ANSI try_* arithmetic
    // ANSI mode is ON (Spark 4 default): bare division by zero or an
    // overflowing cast THROWS. try_divide/try_cast are the sanctioned
    // null-on-error escape hatches — pinned against DuckDB's
    // NULLIF/TRY_CAST equivalents on a real zero-denominator case
    // (customers with no 1996 orders) and an out-of-range cast.
    "x_try_arith" -> (((s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      val per = o.groupBy(col("o_custkey"))
        .agg(sum(when(year(col("o_orderdate")) === 1995, cents(col("o_totalprice")))
            .otherwise(0L)).as("c95"),
          sum(when(year(col("o_orderdate")) === 1996, 1L).otherwise(0L)).as("n96"))
      // multiplier chosen so the int64 product is safe (ANSI would
      // throw on a long overflow BEFORE try_cast could catch it) while
      // any non-zero value still overflows int32 → NULL
      per.select(col("o_custkey"), col("c95"), col("n96"),
        try_divide(col("c95"), col("n96")).as("per96"),
        expr("try_cast(c95 * 1000L as int)").as("overflow_int"))
    }),
      Some("""WITH per AS (SELECT o_custkey,
             |    CAST(sum(CASE WHEN year(o_orderdate) = 1995
             |      THEN CAST(floor(o_totalprice * 100) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS c95,
             |    CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n96
             |  FROM orders GROUP BY 1)
             |SELECT o_custkey, c95, n96,
             |  CAST(c95 AS DOUBLE) / NULLIF(n96, 0) AS per96,
             |  TRY_CAST(c95 * 1000 AS INTEGER) AS overflow_int
             |FROM per""".stripMargin)),

    // -------------------------------------- parse-time quarantine
    // Ingest discipline for an unattended feed: every 7th fixture row
    // carries an unparseable timestamp; PERMISSIVE + corrupt-record
    // capture must route exactly those rows (with their raw text) to
    // quarantine while the rest load normally — one scan serves both
    // outputs. Amounts are written as exact comma-cents so the good
    // side's sum is the standard `cents` the oracle recomputes from
    // the source rows; the corruption rule (id % 7) is replayed by the
    // oracle, so a swallowed or over-quarantined row moves a count.
    "x_quarantine" -> (((s: SparkSession, dir: String) => {
      val file = scratchDir("graft_quar", dir).resolve("transactions_03012024.txt")
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      val lines = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .orderBy(col("event_id")).limit(2000).collect().map { r =>
          val c = math.floor(r.getDouble(3) * 100).toLong
          val amt = s"${c / 100},${"%02d".format(c % 100)}"
          val ts = if (r.getLong(0) % 7 == 0) "NOT-A-TIMESTAMP"
                   else fmt.format(r.getTimestamp(1).toInstant)
          s"TX${r.getLong(0)};$ts;C${r.getLong(2)};purchase;$amt;OK;T1"
        }
      java.nio.file.Files.write(file, java.util.Arrays.asList(
        ("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal"
          +: lines.toSeq): _*))
      val (good, bad) = graft.io.Sources.readTransactionsCsvQuarantined(
        s, file.toString)
      good.agg(count(lit(1)).as("n"),
          sum((col("amt") * 100).cast("long")).as("amt_c"))
        .select(lit("good").as("kind"), col("n"), col("amt_c"))
        .unionByName(bad.agg(count(lit(1)).as("n"))
          .select(lit("quarantined").as("kind"), col("n"),
            lit(null).cast("long").as("amt_c")))
    }),
      Some("""WITH src AS (SELECT event_id, value FROM events
             |  ORDER BY event_id LIMIT 2000)
             |SELECT 'good' AS kind, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS amt_c
             |FROM src WHERE event_id % 7 <> 0
             |UNION ALL
             |SELECT 'quarantined', CAST(count(*) AS BIGINT),
             |  CAST(NULL AS BIGINT)
             |FROM src WHERE event_id % 7 = 0""".stripMargin)),

    // ------------------------------------------- JSON-lines source
    // The third file format on the source surface (CSV, Excel, …): the
    // engine writes documents as JSONL and reads them back through an
    // explicit schema; DuckDB parses the SAME file with read_json, so
    // the gate covers the round trip through the actual bytes — a
    // serializer/parser drift on either side fails the hash. Schema-on-
    // read with an explicit StructType: inference would cost an extra
    // pass at scale and can mis-type sparse columns.
    "x_jsonl_source" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_jsonl", dir)
      t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
        .coalesce(1)
        .write.mode("overwrite").json(s"$scratch/docs")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType)))
      s.read.schema(schema).json(s"$scratch/docs")
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),
      Some(s"""SELECT doc_id, lang, n_chars
             |FROM read_json('${sys.props("java.io.tmpdir")}/graft_jsonl_${SfTokenPlaceholder}/docs/*.json',
             |  columns = {'doc_id': 'BIGINT', 'lang': 'VARCHAR',
             |    'n_chars': 'BIGINT'})""".stripMargin)),

    // ------------------------------------------------ ORC round trip
    // Columnar-format interop: the customer table written as
    // segment-partitioned ORC and read back through partition
    // discovery, aggregated per segment. DuckDB cannot read ORC, so
    // the oracle recomputes from the source table — the round trip
    // (write, partition discovery, scan, agg) is what's under test.
    "x_orc_roundtrip" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_orc", dir)
      t(s, dir, "customer")
        .select(col("c_custkey"), cents(col("c_acctbal")).as("bal_c"),
          col("c_mktsegment"))
        .write.mode("overwrite").partitionBy("c_mktsegment")
        .orc(s"$scratch/cust")
      s.read.orc(s"$scratch/cust")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("bal_c")).as("sum_bal_c"))
    }),
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_bal_c
             |FROM customer GROUP BY 1""".stripMargin)),

    // ------------------------------------------------------ EXCEPT
    // The set-difference completing the set-op family beside
    // o4_intersect: customers active in 1995-Q1 who never returned that
    // year — Spark plans EXCEPT as a distinct left-anti join, so the
    // shuffle carries distinct keys only.
    "x_except" -> (((s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1995)
      val q1 = o.filter(month(col("o_orderdate")) <= 3).select(col("o_custkey"))
      val rest = o.filter(month(col("o_orderdate")) > 3).select(col("o_custkey"))
      q1.except(rest)
    }),
      Some("""SELECT o_custkey FROM orders
             |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 3
             |EXCEPT
             |SELECT o_custkey FROM orders
             |WHERE year(o_orderdate) = 1995 AND month(o_orderdate) > 3"""
        .stripMargin)),

    // ---------------------------------------- association rules
    // Market-basket metrics over co-purchased part pairs (support ≥ 2
    // orders): support/confidence/lift as e6 fixed point — pure IEEE
    // divides over exact int64 counts, with the corpus size carried
    // IN-PLAN (one-row aggregate broadcast by the cross join, not a
    // driver-side collect). The pair generator is the per-group
    // self-join bounded by basket size; everything downstream is keyed
    // on items.
    "x_assoc_rules" -> (((s: SparkSession, dir: String) => {
      import graft.ops.Triangles
      val li = t(s, dir, "lineitem")
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = Triangles.cooccurrenceEdges(li, "l_orderkey", "l_partkey",
        minCount = 2L)
      val cnt = op.groupBy(col("p")).agg(count(lit(1)).as("n"))
      val tot = op.agg(countDistinct(col("o")).as("n_orders"))
      edges
        .join(cnt.select(col("p").as("a"), col("n").as("na")), Seq("a"))
        .join(cnt.select(col("p").as("b"), col("n").as("nb")), Seq("b"))
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("w"), col("na"), col("nb"),
          col("n_orders"),
          floor(lit(1000000.0d) * col("w") / col("n_orders")).cast("long")
            .as("support_e6"),
          floor(lit(1000000.0d) * col("w") / col("na")).cast("long")
            .as("conf_e6"),
          floor(lit(1000000.0d) * col("w") * col("n_orders") /
            (col("na") * col("nb"))).cast("long").as("lift_e6"))
    }),
      Some("""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             |    FROM lineitem),
             |e AS (SELECT a.p AS a, b.p AS b, CAST(count(*) AS BIGINT) AS w
             |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |c AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY 1),
             |tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM op)
             |SELECT a, b, w, ca.n AS na, cb.n AS nb, n_orders,
             |  CAST(floor(1000000.0 * w / n_orders) AS BIGINT) AS support_e6,
             |  CAST(floor(1000000.0 * w / ca.n) AS BIGINT) AS conf_e6,
             |  CAST(floor(1000000.0 * w * n_orders / (ca.n * cb.n)) AS BIGINT)
             |    AS lift_e6
             |FROM e JOIN c ca ON ca.p = e.a JOIN c cb ON cb.p = e.b
             |CROSS JOIN tot""".stripMargin)),

    // ---------------------------------------- schema-evolution read
    // A table whose later batches grew a column: batch 1 writes
    // (key, seg), batch 2 writes (key, seg, nation). mergeSchema
    // reconciles the footers and null-fills the old rows — the
    // evolution path a long-lived warehouse table needs (cheap here:
    // schema union at planning time; at scale prefer an explicit
    // migration for tables with thousands of files, since mergeSchema
    // reads every footer). Oracle: the same union with NULLs.
    "x_schema_evolution" -> (((s: SparkSession, dir: String) => {
      val scratch = scratchDir("graft_schevo", dir)
      val cust = t(s, dir, "customer")
      cust.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").parquet(s"$scratch/t/b=1")
      cust.filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_nationkey").cast("long").as("nation"))
        .write.mode("overwrite").parquet(s"$scratch/t/b=2")
      s.read.option("mergeSchema", "true").parquet(s"$scratch/t")
        .select(col("c_custkey"), col("c_mktsegment"), col("nation"))
    }),
      Some("""SELECT c_custkey, c_mktsegment, CAST(NULL AS BIGINT) AS nation
             |FROM customer WHERE c_custkey % 2 = 0
             |UNION ALL
             |SELECT c_custkey, c_mktsegment, CAST(c_nationkey AS BIGINT)
             |FROM customer WHERE c_custkey % 2 = 1""".stripMargin)),

    // --------------------------- column mapping: RENAME by field id
    // ALTER ... RENAME COLUMN as a METADATA commit (the Delta column-
    // mapping model on Spark's native parquet fieldId read path): half
    // of customer lands under the OLD name, the column renames with no
    // rewrite (pinned: the rename snapshot hard-links the same file
    // names), the other half appends THROUGH the new name, and one
    // aggregate reads both file generations under the renamed schema.
    // Oracle: the same aggregate straight off customer.
    "x_evolution_rename" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val cat = new TableCatalog(s, scratchDir("graft_rename", dir).toString)
      val cust = t(s, dir, "customer").select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"), cents(col("c_acctbal")).as("bal"))
      val v1 = cat.replaceAtomic("c", cust.filter(col("k") % 2 === 0))
      val names1 = s.read.parquet(cat.path("c") + s"/_v$v1")
        .inputFiles.map(_.split('/').last).sorted.toSeq
      val v2 = cat.renameColumn("c", "seg", "segment")
      val names2 = s.read.parquet(cat.path("c") + s"/_v$v2")
        .inputFiles.map(_.split('/').last).sorted.toSeq
      require(names1 == names2,
        "RENAME COLUMN rewrote data files — it must be metadata-only")
      require(cat.readVersion("c", v1).columns.contains("seg"),
        "time travel must keep the name each version declared")
      cat.appendAtomic("c", cust.filter(col("k") % 2 === 1)
        .select(col("k"), col("seg").as("segment"), col("bal")))
      cat.read("c").groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("bal")).as("sum_bal"))
    }),
      Some("""SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_bal
             |FROM customer GROUP BY 1""".stripMargin)),

    // ------------------------ NESTED schema evolution (r16 verdict
    // next #4): ADD / RENAME / DROP / widen of struct FIELDS as
    // metadata-only commits. The files are stamped with field ids at
    // EVERY struct depth by the initial full rewrite, so the nested
    // rename serves pre-rename bytes BY ID (never null-fill), the
    // nested drop retires the field's id, old files null-fill a
    // nested ADD, and the nested widen up-casts old leaves in place.
    // In-query requires pin metadata-only (file names identical
    // across all four evolution commits) and time travel to the
    // pre-rename shape. The oracle replays the final shape
    // relationally.
    "x_evolution_nested" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val cat = new TableCatalog(s, scratchDir("graft_nest", dir).toString)
      val pre = t(s, dir, "orders").select(col("o_orderkey").as("okey"),
        cents(col("o_totalprice")).as("price_c"),
        year(col("o_orderdate")).cast("string").as("y"),
        month(col("o_orderdate")).cast("int").as("m"))
      def packed(df: org.apache.spark.sql.DataFrame, withHalf: Boolean) =
        df.select(col("okey"), struct(
          (Seq(col("price_c"), col("y"), col("m")) ++
            (if (withHalf) Seq(floor(col("price_c") / 2).cast("long")
              .as("half")) else Seq.empty)): _*).as("info"))
      val v1 = cat.replaceAtomic("ne",
        packed(pre.filter(pmod(col("okey"), lit(2)) === 0),
          withHalf = false))
      def names(v: Long): Seq[String] = s.read
        .parquet(cat.path("ne") + s"/_v$v")
        .inputFiles.map(_.split('/').last).sorted.toSeq
      val n1 = names(v1)
      // (1) nested ADD: metadata-only, old rows null-fill
      val v2 = cat.addNestedColumn("ne", Seq("info"),
        org.apache.spark.sql.types.StructField("half",
          org.apache.spark.sql.types.LongType, nullable = true))
      require(names(v2) == n1, "nested ADD must be metadata-only")
      require(cat.read("ne").filter(col("info.half").isNotNull)
        .count() == 0L, "old rows must null-fill the added field")
      // the evolving append carries the new field
      cat.appendAtomic("ne",
        packed(pre.filter(pmod(col("okey"), lit(2)) === 1),
          withHalf = true))
      // (2) nested RENAME: old bytes serve by id under the new name
      val v4 = cat.renameColumnPath("ne", Seq("info", "price_c"), "cents")
      require(names(v4).size == names(v4).distinct.size &&
        n1.forall(names(v4).contains),
        "nested RENAME must carry the original files by link")
      require(cat.read("ne").filter(col("info.cents").isNull).count()
        == 0L, "pre-rename bytes must serve BY ID under the new name")
      require(cat.readVersion("ne", v2).schema("info").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.contains("price_c"),
        "time travel must keep the nested name each version declared")
      // (3) nested widen int -> bigint on m
      cat.widenColumnPath("ne", Seq("info", "m"),
        org.apache.spark.sql.types.LongType)
      // (4) nested DROP of y — its id retires
      val v6 = cat.dropColumnPath("ne", Seq("info", "y"))
      require(names(v6).size == names(v4).size,
        "nested DROP must be metadata-only")
      cat.read("ne").groupBy(col("info.m").as("m"))
        .agg(count(lit(1)).as("n"), sum(col("info.cents")).as("sum_c"),
          sum(col("info.half")).as("sum_h"))
    }),
      Some("""WITH pre AS (SELECT o_orderkey AS okey,
             |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             |  CAST(month(o_orderdate) AS INT) AS m FROM orders),
             |rows_t AS (
             |  SELECT price_c, m, CAST(NULL AS BIGINT) AS half
             |  FROM pre WHERE okey % 2 = 0
             |  UNION ALL
             |  SELECT price_c, m, CAST(floor(price_c / 2.0) AS BIGINT)
             |    AS half
             |  FROM pre WHERE okey % 2 = 1)
             |SELECT CAST(m AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(price_c) AS BIGINT) AS sum_c,
             |  CAST(sum(half) AS BIGINT) AS sum_h
             |FROM rows_t GROUP BY 1""".stripMargin)),

    // --------------------- change feed across an ADD COLUMN boundary
    // The feed no longer refuses additive evolution: old-version files
    // null-fill the added column under the union schema, so an interval
    // spanning ADD COLUMN classifies truthfully instead of forcing an
    // O(table) resync (VERDICT r10 next #5). The evolving append is
    // also O(delta) ACROSS the boundary — pinned: no removed files, so
    // only the appended rows are read. Oracle: the expected inserts
    // recomputed from orders.
    "x_cdc_evolved" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val cat = new TableCatalog(s, scratchDir("graft_cdcevo", dir).toString)
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        cents(col("o_totalprice")).as("c"))
      val v1 = cat.replaceAtomic("f", o.filter(col("k") % 3 =!= 0))
      cat.appendAtomic("f",
        o.filter(col("k") % 3 === 0).withColumn("src", lit("late")),
        mergeSchema = true)
      val v2 = cat.currentVersion("f").get
      val (_, _, _, removed) = cat.changedRowsBetween("f", v1, v2)
      require(removed.isEmpty,
        "an evolving append's feed must stay O(delta): no removed files")
      cat.changesBetween("f", v1, v2, Seq("k"))
        .groupBy(col("change_type"), col("src"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
    }),
      Some("""SELECT 'insert' AS change_type, 'late' AS src,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_c
             |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin)),

    // ------------------------------------------------ GROUPING SETS
    // The explicit grouping-sets lattice — (status, year), (status),
    // () — with per-column grouping flags (portable across engines,
    // unlike the bit-packed grouping_id whose bit order is
    // engine-defined) distinguishing real NULL groups from aggregated
    // ones. Completes the OLAP family beside x_rollup and x_cube.
    "x_grouping_sets" -> (((s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders").select(col("o_orderstatus").as("st"),
        year(col("o_orderdate")).cast("long").as("y"),
        cents(col("o_totalprice")).as("c"))
      o.groupingSets(
          Seq(Seq(col("st"), col("y")), Seq(col("st")), Seq()),
          col("st"), col("y"))
        .agg(grouping(col("st")).cast("long").as("g_st"),
          grouping(col("y")).cast("long").as("g_y"),
          count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
        .select(col("st"), col("y"), col("g_st"), col("g_y"),
          col("n"), col("sum_c"))
    }),
      Some("""SELECT o_orderstatus AS st, CAST(year(o_orderdate) AS BIGINT) AS y,
             |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
             |  CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_y,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_c
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, year(o_orderdate)),
             |  (o_orderstatus), ())""".stripMargin)),

    // ------------------------------------ targeted deletion (GDPR purge)
    // Right-to-be-forgotten through the real catalog: a year-partitioned
    // fact copy of orders purges every row of the %13 customers —
    // rewriting ONLY partitions that contain matches (untouched years
    // keep their files byte-for-byte; TableCatalogSpec pins that via
    // mtimes, plus the explicit clearing of fully-purged partitions
    // that dynamic overwrite alone cannot do). Oracle: the surviving
    // rows recomputed directly from orders.
    "x_gdpr_delete" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val cat = new TableCatalog(s, scratchDir("graft_gdpr", dir).toString)
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("c"),
        year(col("o_orderdate")).cast("string").as("y"))
      cat.appendPartitioned("fact_g", o, "y")
      cat.deleteWhere("fact_g", "y", col("o_custkey") % 13 === 0)
      cat.read("fact_g")
        .groupBy(col("y"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
    }),
      Some("""SELECT CAST(year(o_orderdate) AS VARCHAR) AS y,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_c
             |FROM orders WHERE o_custkey % 13 <> 0
             |GROUP BY 1""".stripMargin)),

    // ------------------------------- incremental aggregate maintenance
    // Materialized-view maintenance end to end in a scratch warehouse:
    // seven yearly batches of orders each append ONE partial-state
    // partition (count/sum/min/max per customer — O(batch) maintenance,
    // the raw year is never re-scanned), aged states are compacted into
    // a base partition, and the reader merges states — never facts.
    // The oracle recomputes the aggregate directly from all orders, so
    // the gate proves partial-merge == full recompute through the real
    // TableCatalog append/compact/read cycle.
    "x_incremental_agg" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      import graft.ops.IncrementalAgg
      val cat = new TableCatalog(s, scratchDir("graft_iagg", dir).toString)
      val o = t(s, dir, "orders").select(col("o_custkey"),
        cents(col("o_totalprice")).as("c"),
        year(col("o_orderdate")).cast("string").as("y"))
      (1995 to 2001).foreach { yy =>
        val batch = o.filter(col("y") === yy.toString)
        // one file per state partition: a batch's state is orders of
        // magnitude smaller than its facts, and a single sorted file
        // per batch is the at-rest shape merge-on-read wants (32
        // shuffle-partition files per tiny batch was pure write/list
        // overhead — measured 3x the whole query's cost at sf0.1)
        cat.appendPartitioned("agg_state",
          IncrementalAgg.partials(batch, Seq("o_custkey"), col("c"))
            .withColumn("batch", lit(yy.toString)).coalesce(1), "batch")
      }
      val compacted = IncrementalAgg.compact(cat.read("agg_state"),
        Seq("o_custkey"), "batch", cutoff = "1999")
      cat.overwrite("agg_state_c", compacted)
      IncrementalAgg.merge(cat.read("agg_state_c"), Seq("o_custkey"))
    }),
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_c,
             |  CAST(min(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS min_c,
             |  CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS max_c,
             |  CAST(count(o_totalprice) AS BIGINT) AS cnt_c
             |FROM orders GROUP BY 1""".stripMargin)),

    // ------------------------------------------ funnel / cohort analytics
    // Strict-sequence conversion funnel (first view, first click AFTER
    // it, first purchase after that) — each stage is a filtered min
    // aggregate chained on the entity key; the oracle replays the
    // chain with correlated min-joins.
    "x_funnel" -> (((s: SparkSession, dir: String) =>
      graft.ops.Events.funnel(t(s, dir, "events"), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))),
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS view_ts FROM events
             |    WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (SELECT e.user_id, min(ts) AS click_ts FROM events e
             |    JOIN s1 ON e.user_id = s1.user_id
             |    WHERE event_type = 'click' AND ts > view_ts GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, min(ts) AS purchase_ts FROM events e
             |    JOIN s2 ON e.user_id = s2.user_id
             |    WHERE event_type = 'purchase' AND ts > click_ts GROUP BY e.user_id)
             |SELECT s1.user_id, view_ts, click_ts, purchase_ts,
             |  1 + CASE WHEN click_ts IS NULL THEN 0 ELSE 1 END
             |    + CASE WHEN purchase_ts IS NULL THEN 0 ELSE 1 END AS stages_done
             |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin)),

    "x_cohort" -> (((s: SparkSession, dir: String) =>
      graft.ops.Events.cohortRetention(t(s, dir, "events"), "user_id", "ts")),
      Some("""WITH a AS (SELECT DISTINCT user_id AS e, CAST(ts AS DATE) AS d
             |    FROM events),
             |c AS (SELECT e, min(d) AS cohort_date FROM a GROUP BY e)
             |SELECT cohort_date, date_diff('day', cohort_date, d) AS day_offset,
             |  CAST(count(DISTINCT e) AS BIGINT) AS n_active
             |FROM a JOIN c USING (e) GROUP BY 1, 2""".stripMargin)),

    // --------------------------------------- semi-structured (JSON) props
    // Typed extraction from the JSON props column via from_json (the
    // engine's native JSON path); the oracle re-derives the value with
    // a regex so the check is implementation-independent.
    "x_json_extract" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "events")
        .select(from_json(col("props"),
            StructType(Seq(StructField("k", IntegerType)))).getField("k")
          .cast("long").as("k_val"))
        .groupBy(pmod(col("k_val"), lit(10)).as("k_mod"))
        .agg(count(lit(1)).as("cnt"), sum(col("k_val")).as("k_sum"))),
      Some("""WITH v AS (SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
             |      AS BIGINT) AS k_val FROM events)
             |SELECT k_val % 10 AS k_mod, count(*) AS cnt,
             |  CAST(sum(k_val) AS BIGINT) AS k_sum
             |FROM v GROUP BY 1""".stripMargin)),

    // -------------------------------------------------- unpivot (melt)
    "x_unpivot" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retail"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")),
          "metric", "value")),
      Some("""SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
             |FROM part
             |UNION ALL
             |SELECT p_partkey, 'retail', p_retailprice FROM part""".stripMargin)),

    // ---------------------------------------------- exact phrase search
    // Consecutive-token phrase matching via the positional inverted
    // index: each word probes its own postings and adjacency is an
    // equi-join on the aligned start — the oracle replays positions
    // with generate_subscripts over the same regex split.
    "x_phrase_search" -> (((s: SparkSession, dir: String) => {
      val idx = graft.ops.Relevance.positionalIndex(
        t(s, dir, "documents"), "doc_id", "text")
      graft.ops.Relevance.phraseSearch(idx, Seq("slow", "hash", "batch"))
    }),
      Some("""WITH sp AS (SELECT doc_id, string_split_regex(text, '\s+') AS l
             |    FROM documents),
             |tk AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
             |  FROM sp),
             |tf AS (SELECT doc_id, tok, pos FROM tk WHERE length(tok) > 0),
             |m0 AS (SELECT doc_id, pos AS start FROM tf WHERE tok = 'slow'),
             |m1 AS (SELECT doc_id, pos - 1 AS start FROM tf WHERE tok = 'hash'),
             |m2 AS (SELECT doc_id, pos - 2 AS start FROM tf WHERE tok = 'batch')
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
             |  min(start) AS first_pos
             |FROM m0 JOIN m1 USING (doc_id, start) JOIN m2 USING (doc_id, start)
             |GROUP BY doc_id""".stripMargin)),

    // ----------------------------------------- PageRank (link centrality)
    // Three damped power-iteration rounds over a deterministic
    // customer→order-bucket graph (hub structure from the modulo).
    // Integer fixed-point end to end, so the oracle's chained-CTE
    // replay hash-matches exactly.
    "x_pagerank" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "orders").select(col("o_custkey").as("src"),
        (col("o_orderkey") % 500).as("dst"))
      graft.ops.PageRank.run(e, "src", "dst", iterations = 3)
    }),
      Some(s"""WITH e AS (SELECT DISTINCT o_custkey AS src, o_orderkey % 500 AS dst
             |    FROM orders),
             |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
             |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
             |p0 AS (SELECT id, 1000000000000 // n AS pr FROM nodes CROSS JOIN nn),
             |${pagerankRoundsSql(3)}
             |SELECT id, pr AS pr_e12 FROM p3""".stripMargin)),

    // ------------------------------------- personalized PageRank
    // Same graph and fixed-point arithmetic as x_pagerank, but ALL
    // teleport mass returns to the seed set (custkeys % 50 = 0) —
    // rank becomes proximity to the seeds ("more like these" corpus
    // expansion / account-ring spread). Non-seed sources hold 0 until
    // inflow reaches them, so the oracle catches any drift in the
    // restricted restart.
    "x_ppr" -> (((s: SparkSession, dir: String) => {
      val e = t(s, dir, "orders").select(col("o_custkey").as("src"),
        (col("o_orderkey") % 500).as("dst"))
      val seeds = t(s, dir, "orders")
        .select(col("o_custkey").as("id"))
        .filter(col("id") % 50 === 0).distinct()
      graft.ops.PageRank.runPersonalized(e, "src", "dst", seeds, "id",
        iterations = 3)
    }),
      Some(s"""WITH e AS (SELECT DISTINCT o_custkey AS src, o_orderkey % 500 AS dst
             |    FROM orders),
             |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
             |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
             |sd AS (SELECT DISTINCT o_custkey AS id FROM orders
             |  WHERE o_custkey % 50 = 0),
             |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sd),
             |p0 AS (SELECT nodes.id,
             |    CASE WHEN nodes.id IN (SELECT id FROM sd)
             |      THEN 1000000000000 // ns.n ELSE 0 END AS pr
             |  FROM nodes CROSS JOIN ns),
             |${pprRoundsSql(3, "nodes.id IN (SELECT id FROM sd)")}
             |SELECT id, pr AS pr_e12 FROM p3""".stripMargin)),

    // --------------------------------------- silhouette (cluster QA)
    // Centroid silhouette on squared distances over the labeled
    // embeddings — the clustering-quality score per vector, exact
    // int64 end to end (power-of-two quantization, integer centroid
    // rationals, (q·n − Σq)² terms) with one identically-written
    // double projection at the end.
    "x_silhouette" -> (((s: SparkSession, dir: String) =>
      graft.ops.Similarity.silhouetteE6(t(s, dir, "embeddings"),
        "vec_id", "label", "embedding")),
      Some("""WITH dims AS (SELECT vec_id, label AS own,
             |    generate_subscripts(embedding, 1) AS pos,
             |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 4096)
             |      AS BIGINT) AS q
             |  FROM embeddings),
             |cent AS (SELECT own AS lbl, pos, CAST(sum(q) AS BIGINT) AS s,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM dims GROUP BY 1, 2),
             |d2 AS (SELECT vec_id, own, lbl, n,
             |    CAST(sum((q * n - s) * (q * n - s)) AS BIGINT) AS num
             |  FROM dims JOIN cent USING (pos) GROUP BY 1, 2, 3, 4),
             |ab AS (SELECT vec_id, own AS label,
             |    min(CASE WHEN lbl = own
             |      THEN CAST(num AS DOUBLE) / CAST(n * n AS DOUBLE) END) AS a2,
             |    min(CASE WHEN lbl <> own
             |      THEN CAST(num AS DOUBLE) / CAST(n * n AS DOUBLE) END) AS b2
             |  FROM d2 GROUP BY 1, 2)
             |SELECT vec_id, label,
             |  CASE WHEN b2 IS NULL OR (a2 = 0 AND b2 = 0) THEN NULL
             |    ELSE CAST(floor(1000000.0 * (b2 - a2) / greatest(a2, b2))
             |      AS BIGINT) END AS s_e6
             |FROM ab""".stripMargin)),

    // ------------------------------------ rendezvous (consistent) sharding
    // Highest-random-weight routing of customers to 8 shards: argmax
    // over salted portable hashes, a pure zero-shuffle expression
    // (Shard.rendezvousShard). The oracle refolds every salted hash
    // and replays the argmax relationally (QUALIFY over hash DESC,
    // shard ASC), so a drift in the salt format, the fold, or the tie
    // order moves assignments and fails the hash.
    "x_shard" -> (((s: SparkSession, dir: String) =>
      graft.ops.Shard.withShard(
        t(s, dir, "customer").select(col("c_custkey")), "c_custkey", 8)),
      Some(s"""WITH ks AS (SELECT c_custkey,
             |    unnest(generate_series(0, 7)) AS sh FROM customer),
             |h AS (SELECT c_custkey, sh,
             |    ${portableHashSql("CAST(c_custkey AS VARCHAR) || ':' || CAST(sh AS VARCHAR)")} AS hv
             |  FROM ks)
             |SELECT c_custkey, CAST(sh AS BIGINT) AS shard FROM h
             |QUALIFY row_number() OVER (PARTITION BY c_custkey
             |  ORDER BY hv DESC, sh ASC) = 1""".stripMargin)),

    // ------------------------------------------------ mode per group
    // Modal event type per user with the deterministic tie order every
    // grouped-mode needs (count DESC, value ASC) — one count aggregate
    // + one bounded per-user window, never a global sort.
    "x_mode" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "events").groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("cnt").desc, col("event_type").asc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("cnt"))),
      Some("""SELECT user_id, event_type AS mode_type,
             |  CAST(count(*) AS BIGINT) AS cnt
             |FROM events GROUP BY user_id, event_type
             |QUALIFY row_number() OVER (PARTITION BY user_id
             |  ORDER BY count(*) DESC, event_type ASC) = 1""".stripMargin)),

    // --------------------------------------- quantile normalization
    // Map each nation's balance distribution onto the GLOBAL balance
    // distribution (the cross-batch feature-alignment transform):
    // per-group rank q of n maps to global position
    // floor((q−1)·(N−1)/(n−1))+1, whose global order statistic is the
    // normalized value. Both ranks ride the two-phase distributed
    // prefix sum (Packing.withGlobalRank) — integer-exact end to end,
    // so the oracle's window replay matches bit-for-bit. Singleton
    // groups pin to the global median position.
    "x_quantile_norm" -> (((s: SparkSession, dir: String) => {
      import graft.ops.Packing
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey").cast("long").as("nation"),
        cents(col("c_acctbal")).as("bal_c"))
      val g = Packing.withGlobalRank(cust, Seq("bal_c", "c_custkey"), "gpos")
        .localCheckpoint(true)
      val n = g.count()
      val grouped = g.withColumn("q", row_number().over(
          Window.partitionBy(col("nation"))
            .orderBy(col("bal_c"), col("c_custkey"))))
        .withColumn("gn", count(lit(1)).over(Window.partitionBy(col("nation"))))
      val withTarget = grouped.withColumn("tpos",
        when(col("gn") === 1, lit((n - 1) / 2 + 1))
          .otherwise(intDiv((col("q") - 1) * lit(n - 1), col("gn") - 1) + 1))
      withTarget.join(
          g.select(col("gpos").as("tpos"), col("bal_c").as("norm_c")),
          Seq("tpos"))
        .select(col("c_custkey"), col("nation"), col("bal_c"), col("norm_c"))
    }),
      Some("""WITH c AS (SELECT c_custkey,
             |    CAST(c_nationkey AS BIGINT) AS nation,
             |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
             |  FROM customer),
             |g AS (SELECT *, CAST(row_number() OVER (ORDER BY bal_c, c_custkey)
             |      AS BIGINT) AS gpos,
             |    CAST(count(*) OVER () AS BIGINT) AS nn,
             |    CAST(row_number() OVER (PARTITION BY nation
             |      ORDER BY bal_c, c_custkey) AS BIGINT) AS q,
             |    CAST(count(*) OVER (PARTITION BY nation) AS BIGINT) AS gn
             |  FROM c),
             |tt AS (SELECT c_custkey, nation, bal_c,
             |    CASE WHEN gn = 1 THEN (nn - 1) // 2 + 1
             |      ELSE ((q - 1) * (nn - 1)) // (gn - 1) + 1 END AS tpos
             |  FROM g)
             |SELECT tt.c_custkey, tt.nation, tt.bal_c, g.bal_c AS norm_c
             |FROM tt JOIN g ON g.gpos = tt.tpos""".stripMargin)),

    // ------------------------------- exact k-per-group deterministic sample
    // Two orders per customer, hash-ranked: the eval-set contract
    // ("exactly k, reproducibly") on top of the bounded-buffer top-k.
    // The oracle replays the portable-hash priority and both
    // tie-breaks.
    "x_sample_group" -> (((s: SparkSession, dir: String) =>
      graft.ops.Splits.sampleExactPerGroup(t(s, dir, "orders"),
        "o_orderkey", Seq("o_custkey"), k = 2)),
      Some(s"""SELECT o_custkey, rank, id FROM (
             |  SELECT o_custkey, o_orderkey AS id,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY ${portableHashSql("CAST(o_orderkey AS VARCHAR)")} % 1000000,
             |        o_orderkey) AS rank
             |  FROM orders) t WHERE rank <= 2""".stripMargin)),

    // ------------------------------------- mixture under per-source budget
    // Training-set mixing: longest-documents-first per source until the
    // source's char budget is spent (two overridden budgets + a
    // default). The engine side rides the distributed prefix sum; the
    // oracle replays the same greedy cutoff with a plain per-source
    // window, proving the two-phase sum computes the identical
    // cumulative.
    "x_mixture" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").withColumn("neg_chars", -col("n_chars"))
      graft.ops.Mixture.byBudget(docs, "doc_id", "source", "n_chars",
        priorityCols = Seq("neg_chars"),
        budgets = Map("src0" -> 2000L, "src1" -> 12000L),
        defaultBudget = 4000L)
    }),
      Some("""WITH c AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS cost,
             |    CAST(coalesce(sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY -n_chars, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS cum_before
             |  FROM documents)
             |SELECT doc_id, source, cost, cum_before FROM c
             |WHERE cum_before < CASE source WHEN 'src0' THEN 2000
             |  WHEN 'src1' THEN 12000 ELSE 4000 END""".stripMargin)),

    // ------------------------------------ expectations (batch validation)
    // One-pass declarative constraint check over events: a range rule, a
    // set rule, a pattern rule, and an always-passing not-null rule.
    // Metrics is the per-rule violation tally; the rows query pins the
    // row-level violation lists (rule order, 3VL: NULL predicate =
    // violation) that the clean/quarantine split derives from.
    "x_expectations" -> (((s: SparkSession, dir: String) =>
      graft.ops.Expectations.metrics(t(s, dir, "events"), Seq(
        graft.ops.Expectations.between("value", 0, 20),
        graft.ops.Expectations.inSet("event_type", Seq("click", "view", "purchase")),
        graft.ops.Expectations.matches("props", "\"k\": [0-9]+"),
        graft.ops.Expectations.notNull("user_id")))),
      Some("""SELECT 'value_between' AS rule, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN NOT coalesce(value >= 0 AND value <= 20, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
             |FROM events
             |UNION ALL
             |SELECT 'event_type_in_set', count(*),
             |  CAST(sum(CASE WHEN NOT coalesce(event_type IN ('click', 'view', 'purchase'), FALSE) THEN 1 ELSE 0 END) AS BIGINT)
             |FROM events
             |UNION ALL
             |SELECT 'props_matches', count(*),
             |  CAST(sum(CASE WHEN NOT coalesce(regexp_matches(props, '"k": [0-9]+'), FALSE) THEN 1 ELSE 0 END) AS BIGINT)
             |FROM events
             |UNION ALL
             |SELECT 'user_id_not_null', count(*),
             |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |FROM events""".stripMargin)),

    "x_expectations_rows" -> (((s: SparkSession, dir: String) =>
      graft.ops.Expectations.quarantine(t(s, dir, "events"), Seq(
        graft.ops.Expectations.between("value", 0, 20),
        graft.ops.Expectations.inSet("event_type", Seq("click", "view", "purchase"))))
        .select(col("event_id"),
          concat_ws(",", col("violations")).as("violated"))),
      Some("""SELECT event_id, concat_ws(',',
             |    CASE WHEN NOT coalesce(value >= 0 AND value <= 20, FALSE) THEN 'value_between' END,
             |    CASE WHEN NOT coalesce(event_type IN ('click', 'view', 'purchase'), FALSE) THEN 'event_type_in_set' END)
             |  AS violated
             |FROM events
             |WHERE NOT coalesce(value >= 0 AND value <= 20, FALSE)
             |   OR NOT coalesce(event_type IN ('click', 'view', 'purchase'), FALSE)""".stripMargin)),

    // --------------------------------------- heavy hitters (exact top-k)
    // Token frequencies over the documents corpus: Misra-Gries candidate
    // pass + exact recount. The oracle is the FULL count-by-value top-k,
    // so the gate proves the bounded-state pruning loses nothing at this
    // (k, capacity) on a Zipf-shaped vocabulary.
    "x_heavy_hitters" -> (((s: SparkSession, dir: String) => {
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      graft.ops.Profile.heavyHitters(toks, "tok", k = 20, capacity = 512)
    }),
      Some("""WITH toks AS (SELECT unnest(string_split_regex(text, '\s+')) AS tok
             |  FROM documents),
             |cnts AS (SELECT tok AS value, CAST(count(*) AS BIGINT) AS cnt
             |  FROM toks WHERE length(tok) > 0 GROUP BY tok
             |  ORDER BY cnt DESC, value ASC LIMIT 20)
             |SELECT row_number() OVER (ORDER BY cnt DESC, value ASC) AS rank,
             |  value, cnt FROM cnts""".stripMargin)),

    // ------------------------------------------ data-QA profiling
    // One-pass per-column profile over events; columns restricted to
    // long/varchar where min/max stringification is engine-stable
    // (double→string and timestamp→string formats differ across
    // engines — the profile of those types is spec'd, not oracled).
    "x_profile" -> (((s: SparkSession, dir: String) =>
      graft.ops.Profile.summarize(
        t(s, dir, "events").select(col("user_id"), col("event_type"),
          col("event_id")),
        Seq("user_id", "event_type", "event_id"))),
      Some("""SELECT 'user_id' AS "column", count(*) AS n,
             |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  count(DISTINCT user_id) AS n_distinct,
             |  CAST(min(user_id) AS VARCHAR) AS min_s, CAST(max(user_id) AS VARCHAR) AS max_s
             |FROM events
             |UNION ALL
             |SELECT 'event_type', count(*),
             |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  count(DISTINCT event_type),
             |  CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR)
             |FROM events
             |UNION ALL
             |SELECT 'event_id', count(*),
             |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  count(DISTINCT event_id),
             |  CAST(min(event_id) AS VARCHAR), CAST(max(event_id) AS VARCHAR)
             |FROM events""".stripMargin)),

    // -------------------------------------------- PII redaction
    // Every document gets a synthetic contact tail (email + phone +
    // 16-digit card) appended IN the query on both sides, then scrubbed;
    // DuckDB replays the identical three-pass regexp_replace chain
    // (RE2 ≡ Java for these portable patterns; 'g' flag — DuckDB
    // replaces first-match-only by default, Spark replaces all).
    "x_redact_pii" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.redactPii(concat(col("text"),
          lit(" contact u"), col("doc_id"),
          lit("@mail.example.com or +7 915 123-45-67 card 4276123456781234 now")))
          .as("clean"))),
      Some("""SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(
             |    text || ' contact u' || CAST(doc_id AS VARCHAR)
             |      || '@mail.example.com or +7 915 123-45-67 card 4276123456781234 now',
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b\d{16}\b', '<CARD>', 'g'),
             |    '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS clean
             |FROM documents""".stripMargin)),

    // --------------------------- contrastive triplets (pair mining)
    // (anchor, positive, negative) training triplets: positives are the
    // exact-Jaccard ≥ 0.5 near-dup pairs, negatives drawn by rotating a
    // hash-ordered global ranking by a fixed shift — deterministic, so
    // DuckDB replays the portable hash, the row_number ranking, the
    // rotation, and the collision filter; the Spark ranking itself is
    // the distributed prefix sum (no single-task global window).
    "x_triplets" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val pos = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = 1000)
        .select(col("id_a"), col("id_b"))
      graft.ops.Pairs.contrastiveTriplets(docs, "doc_id", pos,
        shift = 37L, numPartitions = 8)
    }),
      Some(s"""WITH ${trigramPairsSql(0.5)},
             |hh AS (SELECT doc_id,
             |    ${portableHashSql("CAST(doc_id AS VARCHAR)")} AS hv
             |  FROM documents),
             |r AS (SELECT doc_id,
             |    CAST(row_number() OVER (ORDER BY hv, doc_id) AS BIGINT) AS rk
             |  FROM hh),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |rot AS (SELECT r.doc_id,
             |    ((rk - 1 + CASE WHEN 37 % n = 0 THEN 1 ELSE 37 % n END) % n) + 1 AS nrank
             |  FROM r CROSS JOIN nn)
             |SELECT p.id_a AS anchor_id, p.id_b AS positive_id,
             |  r2.doc_id AS negative_id
             |FROM pairs p
             |JOIN rot ON rot.doc_id = p.id_a
             |JOIN r r2 ON r2.rk = rot.nrank
             |WHERE r2.doc_id <> p.id_a AND r2.doc_id <> p.id_b""".stripMargin)),

    // ----------------------- sequence packing (pretraining batches)
    // Concatenate-and-chunk packing: documents laid on one global token
    // tape in doc_id order, cut into 512-token context windows. The
    // Spark side computes offsets with the two-phase DISTRIBUTED prefix
    // sum (per-range-partition totals broadcast back + local running
    // sums — never a global single-task window); the oracle replays the
    // same offsets with one global window, so a drift anywhere in the
    // partition-offset arithmetic fails value-level.
    "x_packing" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.ops.Packing.packSequences(docs, "doc_id", "n_tokens",
        capacity = 512L, numPartitions = 8)
    }),
      Some("""WITH d AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS start_off
             |  FROM d)
             |SELECT doc_id, n_tokens, start_off,
             |  start_off // 512 AS start_bin,
             |  CASE WHEN n_tokens <= 0 THEN start_off // 512
             |    ELSE (start_off + n_tokens - 1) // 512 END AS end_bin
             |FROM c""".stripMargin)),

    // ---------------------------- packing efficiency report
    // The batch-yield summary a packing run is judged by: windows used,
    // token utilization (exact ppm — concat-and-chunk wastes only the
    // final window's tail), and how many documents straddle a window
    // boundary (the attention-mask / document-boundary cost of packing
    // densely). Derived from the same packSequences tape as x_packing,
    // all-integer so the one aggregate row hashes exactly.
    "x_packing_efficiency" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.ops.Packing.packSequences(docs, "doc_id", "n_tokens",
          capacity = 512L, numPartitions = 8)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          (max(col("end_bin")) + 1L).as("n_windows"),
          count(when(col("end_bin") > col("start_bin"), lit(1)))
            .as("n_straddling"))
        .withColumn("util_ppm",
          intDiv(col("total_tokens") * 1000000L, col("n_windows") * 512L))
    }),
      Some("""WITH d AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS start_off
             |  FROM d),
             |p AS (SELECT doc_id, n_tokens, start_off // 512 AS start_bin,
             |    CASE WHEN n_tokens <= 0 THEN start_off // 512
             |      ELSE (start_off + n_tokens - 1) // 512 END AS end_bin
             |  FROM c)
             |SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  CAST(max(end_bin) + 1 AS BIGINT) AS n_windows,
             |  CAST(count(CASE WHEN end_bin > start_bin THEN 1 END) AS BIGINT)
             |    AS n_straddling,
             |  CAST(sum(n_tokens) * 1000000 // ((max(end_bin) + 1) * 512)
             |    AS BIGINT) AS util_ppm
             |FROM p""".stripMargin)),

    // -------------------------- token chunking (context-window prep)
    // 16-token chunks with 4-token overlap (stride 12) over every
    // document; DuckDB rebuilds each chunk's text and token count from
    // the same tokenization, so off-by-one in stride, slice bounds, or
    // the tail chunk fails value-level.
    "x_chunking" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.chunk(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 16, overlap = 4)),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
             |    CASE WHEN NOT regexp_matches(text, '\S') THEN CAST(0 AS BIGINT)
             |         ELSE CAST(len(string_split(text, ' ')) AS BIGINT) END AS n
             |  FROM documents),
             |idx AS (SELECT unnest(range(0,
             |    (SELECT CAST(ceil(max(n) / 12.0) AS BIGINT) + 1 FROM d))) AS i),
             |c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             |    array_to_string(toks[i*12+1 : i*12+16], ' ') AS chunk_text,
             |    CAST(least(16, n - i*12) AS BIGINT) AS n_tokens
             |  FROM d CROSS JOIN idx
             |  WHERE n > 0 AND i < greatest(1, ceil((n - 4) / 12.0)))
             |SELECT doc_id, chunk_id, chunk_text, n_tokens FROM c""".stripMargin)),

    // ---------------------------------------- rolling-hash fingerprint
    // The hash is MODULAR (every intermediate < 2^35, TextAnalysis
    // .rollingHash), so DuckDB replays the identical fold with
    // list_reduce in plain BIGINT — no wrap-around divergence.
    "x_text_fingerprint" -> (((s: SparkSession, dir: String) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.rollingHash(col("text")).as("fingerprint"))),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
             |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
             |FROM documents""".stripMargin)),

    // ----------------------------------- winnowing fingerprints (MOSS)
    // Schleimer et al. SIGMOD'03: k-gram hashes, sliding window of w,
    // keep each window's minimum (rightmost on ties). The oracle
    // replays the identical modular hash chain, computes window minima
    // with a ROWS frame, and recovers the rightmost achiever per
    // window by a max(pos) join — selection-for-selection equality,
    // not just counts. Both sides: k=3 tokens, w=4 grams.
    "x_winnow" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.winnow(t(s, dir, "documents"), "doc_id", "text",
        k = 3, w = 4)),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
             |h AS (SELECT doc_id,
             |    list_transform(tk, t -> list_reduce(
             |      list_prepend(CAST(0 AS BIGINT),
             |        list_transform(string_split(t, ''),
             |          c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 1000000007)) AS th,
             |    CAST(len(tk) AS BIGINT) AS n FROM d),
             |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), th[i+1:i+3]),
             |      (a, x) -> (a * 31 + x) % 1000000007) AS gh
             |  FROM h CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(n) AS BIGINT) FROM h))) AS i) idx
             |  WHERE i <= n - 3),
             |ng AS (SELECT doc_id, max(pos) AS maxpos FROM g GROUP BY doc_id),
             |wm AS (SELECT doc_id, pos AS j,
             |    min(gh) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
             |  FROM g),
             |wj AS (SELECT wm.doc_id, wm.j, wm.wmin
             |  FROM wm JOIN ng USING (doc_id)
             |  WHERE wm.j <= ng.maxpos - 3 OR wm.j = 0),
             |sel AS (SELECT wj.doc_id, max(s.pos) AS pos, wj.wmin AS fp
             |  FROM wj JOIN g s ON s.doc_id = wj.doc_id
             |    AND s.pos BETWEEN wj.j AND wj.j + 3 AND s.gh = wj.wmin
             |  GROUP BY wj.doc_id, wj.j, wj.wmin)
             |SELECT DISTINCT doc_id, pos, fp FROM sel""".stripMargin)),

    // ------------------------------ winnowing similarity pairs (MOSS)
    // The inverted fingerprint index joined to itself: doc pairs
    // sharing ≥ 2 distinct winnowed fingerprints, boilerplate
    // fingerprints capped at docFreq ≤ 100 (the skew bound). Catches
    // copied RUNS (order-sensitive) that set-Jaccard credits and
    // whole-doc hashes miss.
    "x_winnow_pairs" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.winnowPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 3, w = 4, minShared = 2, maxDocFreq = 100)),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
             |h AS (SELECT doc_id,
             |    list_transform(tk, t -> list_reduce(
             |      list_prepend(CAST(0 AS BIGINT),
             |        list_transform(string_split(t, ''),
             |          c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 1000000007)) AS th,
             |    CAST(len(tk) AS BIGINT) AS n FROM d),
             |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), th[i+1:i+3]),
             |      (a, x) -> (a * 31 + x) % 1000000007) AS gh
             |  FROM h CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(n) AS BIGINT) FROM h))) AS i) idx
             |  WHERE i <= n - 3),
             |ng AS (SELECT doc_id, max(pos) AS maxpos FROM g GROUP BY doc_id),
             |wm AS (SELECT doc_id, pos AS j,
             |    min(gh) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
             |  FROM g),
             |wj AS (SELECT wm.doc_id, wm.j, wm.wmin
             |  FROM wm JOIN ng USING (doc_id)
             |  WHERE wm.j <= ng.maxpos - 3 OR wm.j = 0),
             |sel AS (SELECT wj.doc_id, max(s.pos) AS pos, wj.wmin AS fp
             |  FROM wj JOIN g s ON s.doc_id = wj.doc_id
             |    AND s.pos BETWEEN wj.j AND wj.j + 3 AND s.gh = wj.wmin
             |  GROUP BY wj.doc_id, wj.j, wj.wmin),
             |fp2 AS (SELECT DISTINCT doc_id, fp FROM sel),
             |ok AS (SELECT fp FROM fp2 GROUP BY fp
             |  HAVING count(*) BETWEEN 2 AND 100),
             |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(count(*) AS BIGINT) AS shared_fps
             |  FROM fp2 a JOIN ok USING (fp) JOIN fp2 b USING (fp)
             |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT id_a, id_b, shared_fps FROM pr
             |WHERE shared_fps >= 2""".stripMargin)),

    // ----------------------- winnow-driven corpus dedup (composition)
    // The operator families compose: winnowPairs (order-sensitive
    // copied-run detection) feeds the same dedupCorpus used by the
    // Jaccard path — connected components over the pair graph, keep
    // the minimum id per cluster, anti-join the drop list. The oracle
    // rebuilds the identical pair graph and replays the closure.
    "x_winnow_dedup" -> (((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val pairs = TextAnalysis.winnowPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 2, maxDocFreq = 100)
      Dedup.dedupCorpus(docs, "doc_id", pairs)
        .select(col("doc_id"), col("n_chars"))
    }),
      Some("""WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
             |h AS (SELECT doc_id,
             |    list_transform(tk, t -> list_reduce(
             |      list_prepend(CAST(0 AS BIGINT),
             |        list_transform(string_split(t, ''),
             |          c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 1000000007)) AS th,
             |    CAST(len(tk) AS BIGINT) AS n FROM d),
             |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), th[i+1:i+3]),
             |      (a, x) -> (a * 31 + x) % 1000000007) AS gh
             |  FROM h CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(n) AS BIGINT) FROM h))) AS i) idx
             |  WHERE i <= n - 3),
             |ng AS (SELECT doc_id, max(pos) AS maxpos FROM g GROUP BY doc_id),
             |wm AS (SELECT doc_id, pos AS j,
             |    min(gh) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
             |  FROM g),
             |wj AS (SELECT wm.doc_id, wm.j, wm.wmin
             |  FROM wm JOIN ng USING (doc_id)
             |  WHERE wm.j <= ng.maxpos - 3 OR wm.j = 0),
             |sel AS (SELECT wj.doc_id, max(s.pos) AS pos, wj.wmin AS fp
             |  FROM wj JOIN g s ON s.doc_id = wj.doc_id
             |    AND s.pos BETWEEN wj.j AND wj.j + 3 AND s.gh = wj.wmin
             |  GROUP BY wj.doc_id, wj.j, wj.wmin),
             |fp2 AS (SELECT DISTINCT doc_id, fp FROM sel),
             |ok AS (SELECT fp FROM fp2 GROUP BY fp
             |  HAVING count(*) BETWEEN 2 AND 100),
             |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM fp2 a JOIN ok USING (fp) JOIN fp2 b USING (fp)
             |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
             |  HAVING count(*) >= 2),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
             |  UNION SELECT id_b, id_a FROM pr),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |reach AS (SELECT id AS a, id AS b FROM nodes
             |  UNION SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
             |dropped AS (SELECT a AS doc_id FROM reach GROUP BY a
             |  HAVING a <> min(b))
             |SELECT doc_id, n_chars FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin)),

    // --------------------- corpus-wide repeated exact n-grams (r9)
    // The memorization-risk / boilerplate diagnostic (Lee et al. ACL'22):
    // every 5-token gram appearing in ≥ 2 distinct docs, with document
    // frequency and total occurrences. Complements the pairwise ops —
    // which DOC PAIRS overlap is ngramJaccard/winnowPairs; which
    // SEQUENCES recur (what a dedup policy should cut) is this. The
    // oracle regenerates the grams by literal token slicing, so hash
    // equality pins the gram STRINGS, not a proxy.
    "x_repeated_ngrams" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.repeatedNgrams(t(s, dir, "documents"), "doc_id", "text",
        n = 5, minDocs = 2)),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
             |g AS (SELECT doc_id, array_to_string(tk[i+1:i+5], ' ') AS gram
             |  FROM d CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(len(tk)) AS BIGINT) FROM d))) AS i) idx
             |  WHERE i <= len(tk) - 5)
             |SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  count(*) AS n_occ
             |FROM g GROUP BY gram
             |HAVING count(DISTINCT doc_id) >= 2""".stripMargin)),

    // ------------- per-doc duplicated-text fraction (filter signal, r9)
    // repeatedNgrams composed back onto documents: what FRACTION of each
    // doc's 5-grams is corpus-duplicated — the boilerplate/spam cut of
    // web-scale curation (a mostly-duplicated doc is dropped; a doc
    // that merely quotes keeps a low fraction). Basis points via
    // integral DIV on both engines, so the hash is FP-drift-proof.
    "x_dup_fraction" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.duplicatedGramFraction(t(s, dir, "documents"),
        "doc_id", "text", n = 5, minDocs = 2)),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
             |g AS (SELECT doc_id, array_to_string(tk[i+1:i+5], ' ') AS gram
             |  FROM d CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(len(tk)) AS BIGINT) FROM d))) AS i) idx
             |  WHERE i <= len(tk) - 5),
             |df AS (SELECT gram FROM g GROUP BY gram
             |  HAVING count(DISTINCT doc_id) >= 2),
             |pd AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
             |dd AS (SELECT doc_id, count(*) AS n_dup
             |  FROM g JOIN df USING (gram) GROUP BY doc_id)
             |SELECT pd.doc_id, pd.n_grams,
             |  coalesce(dd.n_dup, 0) AS n_dup,
             |  CAST(coalesce(dd.n_dup, 0) * 10000 // pd.n_grams AS BIGINT)
             |    AS dup_frac_e4
             |FROM pd LEFT JOIN dd USING (doc_id)""".stripMargin)),

    // --------------------------------- corpus data card (r9)
    // The per-(source, lang) datasheet: volumes, length extremes, and
    // docs that are byte-exact duplicates of another doc ANYWHERE in
    // the corpus attributed to their stratum (within-stratum grouping
    // would miss cross-strata copies). Digests (md5) shuffle, never
    // bodies; every field is an exact integer.
    "x_data_card" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.corpusCard(t(s, dir, "documents"), "doc_id", "text",
        Seq("source", "lang"))),
      Some("""WITH base AS (SELECT source, lang, count(*) AS n_docs,
             |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |    CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
             |  FROM documents GROUP BY source, lang),
             |dt AS (SELECT md5(text) AS h FROM documents
             |  GROUP BY md5(text) HAVING count(*) >= 2),
             |db AS (SELECT source, lang, count(*) AS n_exact_dup
             |  FROM documents JOIN dt ON md5(text) = dt.h
             |  GROUP BY source, lang)
             |SELECT base.source, base.lang, n_docs, n_tokens, n_chars,
             |  max_tokens,
             |  CAST(n_tokens // n_docs AS BIGINT) AS avg_tokens,
             |  coalesce(db.n_exact_dup, 0) AS n_exact_dup
             |FROM base LEFT JOIN db USING (source, lang)""".stripMargin)),

    // ------------- incrementally maintained gram table (r9)
    // The repeated-ngram table under the append-only ingest contract:
    // three disjoint batches each contribute an UNFILTERED per-gram
    // partial (batch-local distinct docs + occurrences) appended to a
    // catalog state table; merge-on-read sums the partials and only
    // then applies minDocs. The oracle is the BATCH recompute over the
    // whole corpus — equality proves cross-batch duplicates (a gram
    // seen once per batch) are found at merge, the exact case filtering
    // partials too early silently loses. O(batch) per ingest; the
    // corpus is never re-exploded.
    "x_ngram_incremental" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      val scratch = scratchDir("graft_nginc", dir)
      val cat = new TableCatalog(s, scratch.toString)
      val docs = t(s, dir, "documents")
      (0 to 2).foreach { b =>
        cat.append("gram_state",
          TextAnalysis.repeatedNgramsPartial(
            docs.filter(pmod(col("doc_id"), lit(3)) === b),
            "doc_id", "text", n = 5))
      }
      TextAnalysis.repeatedNgramsMerge(cat.read("gram_state"), minDocs = 2)
    }),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
             |g AS (SELECT doc_id, array_to_string(tk[i+1:i+5], ' ') AS gram
             |  FROM d CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(len(tk)) AS BIGINT) FROM d))) AS i) idx
             |  WHERE i <= len(tk) - 5)
             |SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  count(*) AS n_occ
             |FROM g GROUP BY gram
             |HAVING count(DISTINCT doc_id) >= 2""".stripMargin)),

    // ------------- Gopher quality rule table (r9, second sitting)
    // Rae et al. 2021 Appendix A1.1, one boolean per rule + the
    // conjunction; every ratio as integer cross-multiplication so the
    // table replays exactly.
    "x_gopher_rules" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text")),
      Some("""WITH b AS (SELECT doc_id,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
             |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_word_chars,
             |    CAST((length(text) - length(replace(text, '#', '')))
             |      + (length(text) - length(replace(text, '...', ''))) // 3
             |      + (length(text) - length(replace(text, '…', ''))) AS BIGINT) AS n_symbols,
             |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
             |    CAST(len(list_filter(string_split(text, chr(10)),
             |      l -> regexp_matches(trim(l), '^[-*•]'))) AS BIGINT) AS n_bullet_lines,
             |    CAST(len(list_filter(string_split(text, chr(10)),
             |      l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS BIGINT) AS n_ellipsis_lines,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
             |    CAST(len(list_intersect(list_distinct(string_split_regex(trim(text), '\s+')),
             |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop_distinct
             |  FROM documents)
             |SELECT doc_id, n_words, n_word_chars, n_symbols, n_lines,
             |  n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_distinct,
             |  n_words >= 50 AND n_words <= 100000 AS r_word_count,
             |  n_word_chars >= n_words * 3 AND n_word_chars <= n_words * 10
             |    AS r_mean_word_len,
             |  n_symbols * 10 < n_words AS r_symbol_ratio,
             |  n_bullet_lines * 10 < n_lines * 9 AS r_bullet_lines,
             |  n_ellipsis_lines * 10 < n_lines * 3 AS r_ellipsis_lines,
             |  n_alpha_words * 5 >= n_words * 4 AS r_alpha_words,
             |  n_stop_distinct >= 2 AS r_stop_words,
             |  (n_words >= 50 AND n_words <= 100000)
             |    AND (n_word_chars >= n_words * 3 AND n_word_chars <= n_words * 10)
             |    AND (n_symbols * 10 < n_words)
             |    AND (n_bullet_lines * 10 < n_lines * 9)
             |    AND (n_ellipsis_lines * 10 < n_lines * 3)
             |    AND (n_alpha_words * 5 >= n_words * 4)
             |    AND (n_stop_distinct >= 2) AS keep
             |FROM b""".stripMargin)),

    // ------------- streaming quality-filtered ingest (r9, second sitting)
    // The curation filter in the ingest path: a JSONL document feed is
    // gopherRules-scored per micro-batch and only passing docs reach
    // the catalog table — filter-at-ingest, the shape that avoids ever
    // landing (and re-scanning) the rejected 20–50% at 100 TB. Two
    // micro-batches; the oracle replays the batch filter over the same
    // corpus, so stream-vs-batch equality is the gate. The conjunction
    // uses the four rules that discriminate on this synthetic corpus
    // (the stop-word rule is structurally zero here — its vocabulary
    // simply lacks the Gopher stop words; rule sets are tuned per
    // corpus, which is why gopherRules emits per-rule booleans).
    "x_stream_quality" -> (((s: SparkSession, dir: String) => {
      import graft.streaming.StreamingIngest
      import java.nio.file.Files
      val scratch = scratchDir("graft_streamq", dir)
      val in = scratch.resolve("in")
      Files.createDirectories(in)
      def drop(b: Int, cond: Column): Unit = {
        val st = scratch.resolve(s"stage_b$b")
        t(s, dir, "documents").filter(cond).select(col("doc_id"), col("text"))
          .coalesce(1).write.mode("overwrite").json(st.toString)
        val listing = Files.list(st)
        val part = (try listing.iterator().asScala
            .find(_.getFileName.toString.endsWith(".json"))
          finally listing.close())
          .getOrElse(throw new IllegalStateException(s"no json part in $st"))
        Files.move(part, in.resolve(s"b$b.json"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      drop(0, col("doc_id") % 2 === 0)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      withStreamPartitions(s) {
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType)))
        val stream = s.readStream.schema(schema).json(in.toString)
        val clean = TextAnalysis.gopherRules(stream, "doc_id", "text")
          .filter(col("r_word_count") && col("r_mean_word_len") &&
            col("r_symbol_ratio") && col("r_alpha_words"))
          .select(col("doc_id"), col("n_words"), col("n_word_chars"))
        val q = StreamingIngest.startCatalogAppend(cat, "clean_docs", clean,
          scratch.resolve("ckpt").toString)
        try {
          q.processAllAvailable()
          drop(1, col("doc_id") % 2 === 1)
          q.processAllAvailable()
        } finally q.stop()
      }
      cat.read("clean_docs")
    }),
      Some("""WITH b AS (SELECT doc_id,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
             |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_word_chars,
             |    CAST((length(text) - length(replace(text, '#', '')))
             |      + (length(text) - length(replace(text, '...', ''))) // 3
             |      + (length(text) - length(replace(text, '…', ''))) AS BIGINT) AS n_symbols,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words
             |  FROM documents)
             |SELECT doc_id, n_words, n_word_chars FROM b
             |WHERE n_words >= 50 AND n_words <= 100000
             |  AND n_word_chars >= n_words * 3 AND n_word_chars <= n_words * 10
             |  AND n_symbols * 10 < n_words
             |  AND n_alpha_words * 5 >= n_words * 4""".stripMargin)),

    // ------------- DSIR importance scores (r9, second sitting)
    // Target-distribution data selection (Xie et al. NeurIPS'23): score
    // every doc by the mean target/raw count ratio of its hashed
    // word-bigram features, target = the English slice. The bucket
    // table is bounded (512 rows) and broadcast; scores are the exact
    // integer rational form, so DuckDB rebuilds the feature table with
    // the same portable hash and the hash gate is FP-drift-proof.
    "x_dsir" -> (((s: SparkSession, dir: String) =>
      Selection.dsirScores(t(s, dir, "documents"), "doc_id", "text",
        isTarget = col("lang") === "en", n = 2, buckets = 512)),
      Some(s"""WITH d AS (SELECT doc_id, lang = 'en' AS tgt,
             |    string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
             |g AS (SELECT doc_id, tgt, array_to_string(tk[i+1:i+2], ' ') AS gram
             |  FROM d CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(len(tk)) AS BIGINT) FROM d))) AS i) idx
             |  WHERE i <= len(tk) - 2),
             |gb AS (SELECT doc_id, tgt,
             |    ${portableHashSql("gram")} % 512 AS bucket FROM g),
             |bt AS (SELECT bucket, count(*) AS raw_c,
             |    count(*) FILTER (WHERE tgt) AS tgt_c
             |  FROM gb GROUP BY bucket),
             |r AS (SELECT bucket,
             |    (tgt_c + 1) * 1000000 // (raw_c + 1) AS rr FROM bt)
             |SELECT doc_id, count(*) AS n_grams,
             |  CAST(sum(rr) // count(*) AS BIGINT) AS score_e6
             |FROM gb JOIN r USING (bucket)
             |GROUP BY doc_id""".stripMargin)),

    // ------------- span-level exact-substring dedup (r9, second sitting)
    // Lee et al. ACL'22 ExactSubstr: per doc, the merged token-index
    // intervals covered by corpus-duplicated 5-grams — the cut list an
    // excision pass executes. Overlap AND adjacency coalesce (islands
    // merge windowed per doc, state bounded by doc length).
    "x_dedup_spans" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.dedupSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5, minDocs = 2)),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
             |g AS (SELECT doc_id, i AS pos, array_to_string(tk[i+1:i+5], ' ') AS gram
             |  FROM d CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(len(tk)) AS BIGINT) FROM d))) AS i) idx
             |  WHERE i <= len(tk) - 5),
             |df AS (SELECT gram FROM g GROUP BY gram
             |  HAVING count(DISTINCT doc_id) >= 2),
             |cov AS (SELECT doc_id, pos AS s, pos + 5 AS e
             |  FROM g JOIN df USING (gram)),
             |m AS (SELECT doc_id, s, e,
             |    max(e) OVER (PARTITION BY doc_id ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |  FROM cov),
             |isl AS (SELECT doc_id, s, e,
             |    sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY doc_id ORDER BY s
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM m)
             |SELECT doc_id, min(s) AS cut_start, max(e) AS cut_end,
             |  max(e) - min(s) AS n_tokens_cut
             |FROM isl GROUP BY doc_id, island""".stripMargin)),

    // ------------- SemDeDup-shaped embedding dedup (r9, second sitting)
    // Cluster-scoped semantic dedup (Abbas et al. 2023, "SemDeDup"):
    // near-dup pairs found ONLY within deterministic LSH buckets (the
    // role k-means clusters play in the paper — the same O(n²) →
    // O(cluster²) cut), closed into components, one representative kept
    // per component (min id). The oracle replays buckets, pairwise
    // cosine, the RECURSIVE closure, and the keep set.
    "x_semdedup" -> (((s: SparkSession, dir: String) => {
      val embs = t(s, dir, "embeddings")
      val pairs = Dedup.embeddingNearDup(embs, "vec_id", "embedding",
        minCos = 0.35, planes = 4)
        .select(col("id_a"), col("id_b"))
      Dedup.dedupCorpus(embs.select(col("vec_id")), "vec_id", pairs)
    }),
      Some(s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |bk AS (SELECT vec_id, v, ${bucketSql(4)} AS bucket FROM e),
             |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
             |  UNION SELECT id_b, id_a FROM pr),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |reach AS (SELECT id AS a, id AS b FROM nodes
             |  UNION SELECT r.a, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.b),
             |dropped AS (SELECT a AS vec_id FROM reach GROUP BY a
             |  HAVING a <> min(b))
             |SELECT vec_id FROM embeddings
             |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin)),

    // ------------- curriculum-ordered tape (r9, second sitting)
    // Easy-to-hard training order: length-tier phases (the sequence-
    // length-warmup curriculum), seeded shuffle within phase, global
    // batch index on the distributed prefix rank. The oracle's one-task
    // row_number replay is the semantics the two-phase rank must equal.
    "x_curriculum" -> (((s: SparkSession, dir: String) =>
      Selection.curriculumOrder(t(s, dir, "documents"), "doc_id",
        phase = least(intDiv(TextAnalysis.tokenCount(col("text")), lit(20L)),
          lit(4L)),
        batchSize = 64)),
      Some(s"""WITH q AS (SELECT doc_id,
             |    least(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
             |      // 20, 4) AS phase
             |  FROM documents),
             |h AS (SELECT doc_id, phase,
             |    ${portableHashSql("'cu:' || CAST(doc_id AS VARCHAR)")} AS hraw
             |  FROM q),
             |m AS (SELECT doc_id, phase,
             |    (hraw % 4294967296 * (hraw // 4294967296)
             |      + hraw % 4294967296 + hraw // 4294967296) % 1000000007 AS hv
             |  FROM h),
             |r AS (SELECT doc_id, phase,
             |    row_number() OVER (ORDER BY phase, hv, doc_id) - 1 AS idx
             |  FROM m)
             |SELECT doc_id, CAST(phase AS BIGINT) AS phase, idx,
             |  CAST(idx // 64 AS BIGINT) AS batch
             |FROM r""".stripMargin)),

    // ------------- temperature-resampled mixture (r9, second sitting)
    // XLM-R α=1/2 sampling: per-lang weights ⌊√n⌋ (float sqrt corrected
    // to the exact isqrt by cross-multiplication), a 200-doc budget
    // apportioned by largest remainder, then a deterministic hash-rate
    // selection per lang. The oracle replays weights, apportionment,
    // and the kept ROW SET — not just sizes.
    "x_temperature_mix" -> (((s: SparkSession, dir: String) =>
      graft.ops.Mixture.byTemperature(t(s, dir, "documents"), "doc_id",
        "lang", budget = 200L)),
      Some(s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
             |  FROM documents GROUP BY lang),
             |w0 AS (SELECT lang, n_docs,
             |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s0
             |  FROM c),
             |w AS (SELECT lang, n_docs,
             |    CASE WHEN (s0+1)*(s0+1) <= n_docs THEN s0+1
             |         WHEN s0*s0 > n_docs THEN s0-1 ELSE s0 END AS weight
             |  FROM w0),
             |t AS (SELECT sum(weight) AS wtot FROM w),
             |a0 AS (SELECT lang, n_docs, weight,
             |    200 * weight // wtot AS base, (200 * weight) % wtot AS rem
             |  FROM w CROSS JOIN t),
             |a1 AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk,
             |    sum(base) OVER () AS tbase FROM a0),
             |al AS (SELECT lang, n_docs, weight,
             |    CAST(base + CASE WHEN rk <= 200 - tbase THEN 1 ELSE 0 END
             |      AS BIGINT) AS alloc
             |  FROM a1),
             |h AS (SELECT doc_id, lang,
             |    ${portableHashSql("'tm:' || CAST(doc_id AS VARCHAR)")} AS hraw
             |  FROM documents),
             |bk AS (SELECT doc_id, lang,
             |    ((hraw % 4294967296 * (hraw // 4294967296)
             |      + hraw % 4294967296 + hraw // 4294967296) % 1000000007)
             |      % 1000000 AS bucket
             |  FROM h)
             |SELECT bk.doc_id, bk.lang, al.n_docs, al.weight, al.alloc
             |FROM bk JOIN al USING (lang)
             |WHERE bk.bucket * al.n_docs < al.alloc * 1000000""".stripMargin)),

    // ------------- span excision applied (r9, second sitting)
    // The dedupSpans cut list executed: cleaned text with duplicated
    // spans removed. The oracle takes the DIRECT covered-positions
    // route (union of [pos, pos+5) per duplicated gram) — equality
    // with the Spark side's merged-islands route proves interval
    // merging loses/adds no token.
    "x_dedup_excise" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.exciseSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5, minDocs = 2)),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents),
             |d5 AS (SELECT doc_id, tk FROM d WHERE len(tk) >= 5),
             |g AS (SELECT doc_id, i AS pos, array_to_string(tk[i+1:i+5], ' ') AS gram
             |  FROM d5 CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(len(tk)) AS BIGINT) FROM d5))) AS i) idx
             |  WHERE i <= len(tk) - 5),
             |df AS (SELECT gram FROM g GROUP BY gram
             |  HAVING count(DISTINCT doc_id) >= 2),
             |cov AS (SELECT DISTINCT doc_id, pos FROM g JOIN df USING (gram)),
             |cp AS (SELECT DISTINCT doc_id, pos + o AS p
             |  FROM cov CROSS JOIN (SELECT unnest(range(0, 5)) AS o) off),
             |tok AS (SELECT d.doc_id, i AS p, tk[i+1] AS tok
             |  FROM d CROSS JOIN (SELECT unnest(range(0,
             |    (SELECT CAST(max(len(tk)) AS BIGINT) FROM d))) AS i) idx
             |  WHERE i < len(tk)),
             |keep AS (SELECT tok.doc_id, tok.p, tok.tok
             |  FROM tok LEFT JOIN cp ON tok.doc_id = cp.doc_id AND tok.p = cp.p
             |  WHERE cp.p IS NULL)
             |SELECT d.doc_id, coalesce(k.text_clean, '') AS text_clean,
             |  CAST(coalesce(k.n, 0) AS BIGINT) AS n_tokens_kept
             |FROM d LEFT JOIN (SELECT doc_id,
             |    string_agg(tok, ' ' ORDER BY p) AS text_clean,
             |    count(*) AS n
             |  FROM keep GROUP BY doc_id) k USING (doc_id)""".stripMargin)),

    // ------------- deterministic epoch shuffle (r9, second sitting)
    // Reproducible multi-epoch training order: per epoch, docs ordered
    // by the portable hash of "ep{e}:{id}" and batched by the 0-based
    // within-epoch index. The index is the two-phase distributed prefix
    // rank (never a one-task global window); the oracle's one-task
    // row_number replay is the semantics it must equal.
    "x_epoch_shuffle" -> (((s: SparkSession, dir: String) =>
      Selection.epochOrder(t(s, dir, "documents"), "doc_id",
        epochs = 2, batchSize = 64)),
      Some(s"""WITH e AS (SELECT doc_id, unnest(range(1, 3)) AS epoch
             |  FROM documents),
             |h AS (SELECT doc_id, epoch,
             |    ${portableHashSql("'ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS hraw
             |  FROM e),
             |m AS (SELECT doc_id, epoch,
             |    (hraw % 4294967296 * (hraw // 4294967296)
             |      + hraw % 4294967296 + hraw // 4294967296) % 1000000007 AS hv
             |  FROM h),
             |r AS (SELECT doc_id, epoch,
             |    row_number() OVER (PARTITION BY epoch ORDER BY hv, doc_id) - 1
             |      AS idx
             |  FROM m)
             |SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, idx,
             |  CAST(idx // 64 AS BIGINT) AS batch
             |FROM r""".stripMargin)),

    // ------------------------------------------------- text quality signals
    "x_quality_signals" -> (((s: SparkSession, dir: String) =>
      TextAnalysis.qualitySignals(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_chars_sig"), col("n_tokens"),
          floor(col("mean_token_len") * 10000).cast("long").as("mean_token_len_e4"),
          col("punct_cnt"), col("stopword_cnt"))),
      Some("""WITH q AS (SELECT doc_id, text,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
             |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             |    END AS n_tokens
             |  FROM documents)
             |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_sig, n_tokens,
             |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
             |       ELSE CAST(floor(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
             |         / n_tokens * 10000) AS BIGINT)
             |  END AS mean_token_len_e4,
             |  CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS punct_cnt,
             |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |    x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) AS stopword_cnt
             |FROM q""".stripMargin)),

    // --------------------------------------------- multimodal features
    // The decode kernel is the declared stub (no codec libs in this
    // container) and the docs are ASCII, so the oracle replays the byte
    // fold exactly: feature[j]·255 is the integer byte-sum of bucket j
    // (recovered exactly by round — float accumulation error ≪ 0.5), and
    // the digest Σ (j+1)·feature[j]·255 = Σ ((pos-1) mod 16 + 1)·byte is
    // a position-weighted checksum both engines compute in exact int64.
    "x_multimodal_features" -> (((s: SparkSession, dir: String) => {
      val media = t(s, dir, "documents").select(
        col("doc_id").as("media_id"), col("text").cast("binary").as("content"))
      graft.ops.Multimodal.extractFeatures(media, dim = 16)
        .select(col("media_id"), col("decode_ok"),
          aggregate(
            zip_with(col("feature"), sequence(lit(1), lit(16)),
              (f, j) => round(f * 255).cast("long") * j),
            lit(0L), (acc, v) => acc + v).as("digest"))
    }),
      Some("""WITH b AS (SELECT doc_id AS media_id, ord(ch) AS code, pos
             |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch,
             |        generate_subscripts(string_split(text, ''), 1) AS pos FROM documents))
             |SELECT media_id, TRUE AS decode_ok,
             |  CAST(sum(CAST(((pos - 1) % 16 + 1) AS BIGINT) * code) AS BIGINT) AS digest
             |FROM b GROUP BY media_id""".stripMargin)),

    // ------------------------------------------------ frame sampling
    // Video metadata synthesized deterministically from n_chars (the
    // container has no codecs — SURVEY ext), the explode shape and
    // frame keys are the real contract and fully oracle-checked.
    "x_frame_sampling" -> (((s: SparkSession, dir: String) => {
      val media = t(s, dir, "documents").select(
        col("doc_id").as("media_id"),
        struct(lit("video").as("media_type"), lit("mp4").as("format"),
          lit(640).as("width"), lit(360).as("height"),
          (col("n_chars") * 100L).as("duration_ms")).as("meta"))
      graft.ops.Multimodal.sampleFrames(media, stride = 10, maxFrames = 8)
    }),
      Some("""SELECT doc_id AS media_id, CAST(t.i AS INTEGER) AS frame_idx,
             |  CAST(doc_id AS VARCHAR) || '#' || CAST(t.i AS VARCHAR) AS frame_key
             |FROM documents CROSS JOIN generate_series(0, 8) t(i)
             |WHERE t.i <= greatest(least(CAST((n_chars * 100) // 10000 AS INTEGER), 8), 0)""".stripMargin)),

    // --------------------------------------------------- velocity alerts
    // The streaming rule-4 analog (StreamingIngest.velocityAlerts,
    // mapGroupsWithState) run in BATCH mode: each card's full history
    // arrives as one group, so the stateful scan reduces to consecutive-
    // transaction city changes within 1 h — which is exactly a lag()
    // formulation DuckDB can replay value-for-value. This is the only
    // way to put the custom-state operator itself under the oracle (a
    // live stream has no deterministic SQL equivalent).
    "x_velocity_alerts" -> (((s: SparkSession, dir: String) => {
      val txns = t(s, dir, "events").select(
        col("user_id").cast("string").as("card_num"),
        col("event_type").as("city"),
        col("ts").as("trans_date"),
        col("event_id").cast("string").as("trans_id"))
      graft.streaming.StreamingIngest.velocityAlerts(s, txns)
    }),
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS card_num, event_type AS city,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es, CAST(event_id AS VARCHAR) AS trans_id
             |  FROM events),
             |l AS (SELECT card_num, trans_id, city,
             |    lag(city) OVER w AS prevCity, es - lag(es) OVER w AS deltaSeconds
             |  FROM e WINDOW w AS (PARTITION BY card_num ORDER BY es, trans_id))
             |SELECT card_num, trans_id, prevCity, city, deltaSeconds
             |FROM l WHERE prevCity IS NOT NULL AND prevCity <> city
             |  AND deltaSeconds <= 3600""".stripMargin)),

    // -------------------- streaming pipeline END TO END under the gate
    // The whole durable streaming path — file-source CSV drops → decimal-
    // comma parse → stream-static terminal-city join → stateful
    // flatMapGroupsWithState velocity detector → checkpointed exactly-once
    // parquet sink into the catalog — driven INSIDE the query across two
    // micro-batches (the second drop lands after the first is processed,
    // so cross-batch per-card STATE is load-bearing), then the durable
    // table is returned. The two drops split the 200×-compressed timeline
    // at a timestamp boundary, so the forward-only fold over two batches
    // equals a global lag() — which DuckDB recomputes over the same CSV
    // files. A state bug, a lost/duplicated sink row, or a parse drift
    // fails the value-level hash.
    "x_stream_velocity" -> (((s: SparkSession, dir: String) => {
      import graft.streaming.StreamingIngest
      import s.implicits._
      val scratch = scratchDir("graft_stream", dir)
      val in = scratch.resolve("in")
      java.nio.file.Files.createDirectories(in)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      val rows = t(s, dir, "events")
        .select(col("event_id"),
          expr("timestamp_seconds(1704067200 + (unix_timestamp(ts) - 1704067200) div 200)")
            .as("ts2"),
          col("user_id"),
          ((col("user_id") + col("event_id")) % 20).as("term"))
        .orderBy(col("ts2"), col("event_id")).limit(2000).collect()
      val midMillis = rows(rows.length / 2).getTimestamp(1).getTime
      def line(r: org.apache.spark.sql.Row) =
        s"TX${r.getLong(0)};${fmt.format(r.getTimestamp(1).toInstant)};" +
          s"C${r.getLong(2)};PAY;1,00;OK;T${r.getLong(3)}"
      // split at a TIME boundary: every batch-1 event precedes every
      // batch-2 event, so two-batch stateful == one global lag()
      val (first, second) = rows.partition(_.getTimestamp(1).getTime < midMillis)
      val hdr = "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal"
      java.nio.file.Files.write(in.resolve("transactions_01012024.txt"),
        java.util.Arrays.asList((hdr +: first.map(line).toSeq): _*))
      val terminals = (0 until 20).map(tm => (s"T$tm", s"C${tm % 7}", false))
        .toDF("terminal_id", "terminal_city", "deleted_flg")
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      withStreamPartitions(s) {
        val q = StreamingIngest.startCatalogAppend(cat, "stream_alerts",
          StreamingIngest.velocityAlerts(s, StreamingIngest.withCity(
            StreamingIngest.readTransactionStream(s, in.toString), terminals)),
          scratch.resolve("ckpt").toString)
        try {
          q.processAllAvailable()
          java.nio.file.Files.write(in.resolve("transactions_02012024.txt"),
            java.util.Arrays.asList((hdr +: second.map(line).toSeq): _*))
          q.processAllAvailable()
        } finally q.stop()
      }
      cat.read("stream_alerts")
    }),
      Some(s"""WITH raw AS (SELECT * FROM read_csv(
             |    '${sys.props("java.io.tmpdir")}/graft_stream_${SfTokenPlaceholder}/in/transactions_*.txt',
             |    delim = ';', header = true,
             |    columns = {'transaction_id': 'VARCHAR', 'transaction_date': 'TIMESTAMP',
             |      'card_num': 'VARCHAR', 'oper_type': 'VARCHAR', 'amount': 'VARCHAR',
             |      'oper_result': 'VARCHAR', 'terminal': 'VARCHAR'})),
             |t AS (SELECT card_num, transaction_id AS trans_id, transaction_date AS ts,
             |    'C' || CAST(CAST(substr(terminal, 2) AS BIGINT) % 7 AS VARCHAR) AS city
             |  FROM raw),
             |l AS (SELECT card_num, trans_id, city, lag(city) OVER w AS prevCity,
             |    CAST(floor(epoch(ts)) AS BIGINT)
             |      - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS deltaSeconds
             |  FROM t WINDOW w AS (PARTITION BY card_num ORDER BY ts, trans_id))
             |SELECT card_num, trans_id, prevCity, city, deltaSeconds
             |FROM l WHERE prevCity IS NOT NULL AND prevCity <> city
             |  AND deltaSeconds <= 3600""".stripMargin)),

    // -------------------- streaming SCD2 maintenance under the gate
    // startScd2Maintenance driven across THREE date-ordered micro-batches
    // (each day's staged snapshot arrives after the previous is merged,
    // so cross-batch OPEN-SLICE STATE is load-bearing: day-2's close
    // decision reads day-1's merge result from the catalog). Even keys
    // change attr every day (3 versions), odd keys never do (1 open
    // version, no-change branch exercised). DuckDB replays SCD2 as a
    // lag-filtered version list with lead() close dates over the same
    // deterministic literal feed; output = open ∪ closed content.
    "x_stream_scd2" -> (((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.types._
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val scratch = scratchDir("graft_streamscd2", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      val dimSpec = graft.etl.Scd2.DimSpec("id", Seq("attr"))
      val schema = StructType(Seq(
        StructField("id", StringType), StructField("attr", StringType),
        StructField("effective_from", DateType),
        StructField("effective_to", DateType),
        StructField("deleted_flg", BooleanType)))
      def attr(i: Int, di: Int): String =
        if (i % 2 == 0) ((i + di) % 3).toString else "const"
      val mem = MemoryStream[(String, String, java.sql.Date)]
      withStreamPartitions(s) {
        val q = graft.streaming.StreamingIngest.startScd2Maintenance(
          cat, "dim_s", dimSpec, schema,
          mem.toDF().toDF("id", "attr", "change_date"),
          scratch.resolve("ckpt").toString)
        try (0 until 3).foreach { di =>
          val day = java.sql.Date.valueOf(f"2024-01-${di + 1}%02d")
          mem.addData((0 until 50).map(i => (i.toString, attr(i, di), day)): _*)
          q.processAllAvailable()
        } finally q.stop()
      }
      cat.read("dim_s_open")
        .unionByName(cat.read("dim_s_closed")
          .select("id", "attr", "effective_from", "effective_to", "deleted_flg"))
    }),
      Some("""WITH feed AS (
             |  SELECT CAST(i AS VARCHAR) AS id,
             |    CASE WHEN i % 2 = 0 THEN CAST((i + d.di) % 3 AS VARCHAR)
             |      ELSE 'const' END AS attr,
             |    DATE '2024-01-01' + CAST(d.di AS INTEGER) AS day
             |  FROM generate_series(0, 49) t(i)
             |  CROSS JOIN generate_series(0, 2) d(di)),
             |v AS (SELECT id, day, attr,
             |    lag(attr) OVER (PARTITION BY id ORDER BY day) AS prev FROM feed),
             |vers AS (SELECT id, attr, day AS eff_from FROM v
             |  WHERE prev IS NULL OR prev <> attr),
             |o AS (SELECT id, attr, eff_from,
             |    coalesce(lead(eff_from) OVER (PARTITION BY id ORDER BY eff_from),
             |      DATE '3000-01-01') AS eff_to
             |  FROM vers)
             |SELECT id, attr, eff_from AS effective_from,
             |  eff_to AS effective_to,
             |  (eff_to <> DATE '3000-01-01') AS deleted_flg
             |FROM o""".stripMargin)),

    // ------------------- streaming incremental near-dup maintenance
    // The corpus arrives as 3 MemoryStream micro-batches; each batch
    // dedups against the persisted band index of everything before it
    // (new-vs-old broadcast, new-vs-new self-join), then appends its
    // own bands/docs. The accumulated pair table, exact-filtered at
    // jaccard ≥ 0.5, must equal a ONE-SHOT full-corpus dedup — the
    // oracle is the same full trigram-pair closure as the batch dedup
    // queries, so a pair emitted twice (replay bug), missed (index
    // gap), or leaked old-old fails the hash.
    "x_stream_lsh" -> (((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val scratch = scratchDir("graft_streamlsh", dir)
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      val docs = t(s, dir, "documents")
      val rows = docs.select(col("doc_id"), col("text")).orderBy(col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val mem = MemoryStream[(Long, String)]
      withStreamPartitions(s) {
        val q = graft.streaming.StreamingIngest.startDedupMaintenance(
          cat, "docs", "lsh_index", "pairs",
          mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
          scratch.resolve("ckpt").toString)
        try rows.grouped(rows.length / 3 + 1).foreach { g =>
          mem.addData(g.toSeq: _*); q.processAllAvailable()
        } finally q.stop()
      }
      // shingled ONCE (r18 opt): both sides of the verify join consume
      // this frame — lazy, each re-shingled the whole corpus
      // pinned fan-out (r19): the documents scan is one row group, so
      // the shingle pass serialized on one task (QueryProbe: 0.8 s
      // single-task checkpoint stage); session width, not a constant
      val sh = docs.select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .localCheckpoint(true)
      val common = size(array_intersect(col("sh_a"), col("sh_b")))
      val jac = common.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - common)
      cat.read("pairs")
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .filter(jac >= 0.5)
        .select(col("id_a"), col("id_b"), common.as("common"),
          floor(jac * 10000).cast("long").as("jaccard_e4"))
    }),
      Some(s"""WITH ${trigramPairsSql(0.5)}
             |SELECT id_a, id_b, CAST(common AS INTEGER) AS common,
             |  CAST(floor(jaccard * 10000) AS BIGINT) AS jaccard_e4
             |FROM pairs""".stripMargin)),

    // ------------------------------------ embedding mean pooling
    // Label prototypes from the embeddings table: elementwise mean per
    // (label, dimension), fixed-point-exact so the oracle's unnest
    // replay hash-matches.
    "x_embed_pool" -> (((s: SparkSession, dir: String) =>
      graft.ops.Similarity.meanPoolE6(t(s, dir, "embeddings"),
        "label", "embedding")),
      Some("""WITH u AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
             |      AS BIGINT) AS v_e6
             |  FROM embeddings)
             |SELECT label, pos, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(sum(v_e6) AS BIGINT) AS sum_e6,
             |  CAST(sum(v_e6) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_e6
             |FROM u GROUP BY 1, 2""".stripMargin)),

    // ------------------------------- linear-interpolation gap fill
    // resampleFill's sibling for continuous signals: each daily grid
    // point linearly interpolated between its surrounding purchase
    // values (exact int64 deltas, ONE identically-written double
    // division; grid-on-observation takes the observed value, leading
    // gap NULL, trailing gap holds). The oracle replays the union +
    // two ignore-nulls windows and the same interpolation line.
    "x_interpolate" -> (((s: SparkSession, dir: String) => {
      val p = t(s, dir, "events").filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("ts"))
            .orderBy(col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts"), cents(col("value")).as("vc"))
      graft.ops.Resample.interpolateLinear(p, "user_id", "ts", "vc", 86400L)
    }),
      Some("""WITH p AS (SELECT user_id, ts,
             |    CAST(floor(value * 100) AS BIGINT) AS vc FROM events
             |    WHERE event_type = 'purchase'
             |    QUALIFY row_number() OVER (PARTITION BY user_id, ts
             |      ORDER BY event_id DESC) = 1),
             |o AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
             |    max(vc) AS vc, 1 AS is_obs FROM p GROUP BY 1, 2),
             |b AS (SELECT user_id, min(es) AS lo, max(es) AS hi
             |  FROM o GROUP BY 1),
             |g AS (SELECT user_id,
             |    unnest(generate_series(lo - ((lo % 86400) + 86400) % 86400,
             |      hi, 86400)) AS es,
             |    CAST(NULL AS BIGINT) AS vc, 0 AS is_obs FROM b),
             |u AS (SELECT * FROM o UNION ALL SELECT * FROM g),
             |w AS (SELECT user_id, es, is_obs,
             |    last_value(CASE WHEN is_obs = 1 THEN es END IGNORE NULLS)
             |      OVER wp AS pes,
             |    last_value(CASE WHEN is_obs = 1 THEN vc END IGNORE NULLS)
             |      OVER wp AS pvc,
             |    first_value(CASE WHEN is_obs = 1 THEN es END IGNORE NULLS)
             |      OVER wn AS nes,
             |    first_value(CASE WHEN is_obs = 1 THEN vc END IGNORE NULLS)
             |      OVER wn AS nvc
             |  FROM u WINDOW
             |    wp AS (PARTITION BY user_id ORDER BY es ASC, is_obs DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wn AS (PARTITION BY user_id ORDER BY es ASC, is_obs DESC
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, CAST(to_timestamp(es) AS TIMESTAMP) AS grid_ts,
             |  CASE WHEN pes IS NULL THEN NULL
             |    WHEN nes IS NULL OR nes = pes THEN pvc
             |    ELSE CAST(floor(CAST(pvc AS DOUBLE) +
             |      CAST((nvc - pvc) * (es - pes) AS DOUBLE) /
             |      CAST(nes - pes AS DOUBLE)) AS BIGINT) END AS interp_c
             |FROM w WHERE is_obs = 0""".stripMargin)),

    // --------------------------------------- Benford first-digit audit
    // The classic fabricated-numbers screen: first significant digit
    // distribution of order totals vs Benford expectation. The nine
    // expected shares are mathematical constants embedded as literals
    // on BOTH sides (floor(1e6·log10(1+1/d)) — no runtime log, so no
    // cross-engine libm question). Exact counts, e6 shares.
    "x_benford" -> (((s: SparkSession, dir: String) => {
      val digits = t(s, dir, "orders")
        .select(cents(col("o_totalprice")).as("c"))
        .filter(col("c") > 0)
        .select(substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
      val expected = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
        66946L, 57991L, 51152L, 45757L)
      val expCol = element_at(
        array(expected.map(lit): _*), col("digit").cast("int"))
      digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(digits.agg(count(lit(1)).as("nt"))))
        .select(col("digit"), col("n"),
          floor(lit(1000000.0d) * col("n") / col("nt")).cast("long")
            .as("share_e6"),
          expCol.as("benford_e6"))
    }),
      Some("""WITH d AS (SELECT CAST(substr(CAST(
             |      CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR),
             |      1, 1) AS BIGINT) AS digit
             |  FROM orders WHERE CAST(floor(o_totalprice * 100) AS BIGINT) > 0),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM d),
             |e AS (SELECT * FROM (VALUES (1, 301029), (2, 176091),
             |    (3, 124938), (4, 96910), (5, 79181), (6, 66946),
             |    (7, 57991), (8, 51152), (9, 45757)) AS v(dg, be6))
             |SELECT digit, CAST(count(*) AS BIGINT) AS n,
             |  CAST(floor(1000000.0 * count(*) / any_value(nt)) AS BIGINT)
             |    AS share_e6,
             |  CAST(any_value(be6) AS BIGINT) AS benford_e6
             |FROM d CROSS JOIN t JOIN e ON e.dg = d.digit
             |GROUP BY digit""".stripMargin)),

    // ------------------------------------ resample + forward fill
    // Daily grid per user over the purchase series, each point carrying
    // the latest purchase at or before it. DuckDB's native ASOF join
    // fills the same grid — an independent implementation of both the
    // grid arithmetic and the fill.
    "x_resample" -> (((s: SparkSession, dir: String) => {
      val p = t(s, dir, "events").filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("ts"))
            .orderBy(col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.Resample.resampleFill(p, "user_id", "ts", Seq("value"), 86400L)
        .select(col("user_id"), col("grid_ts"),
          col("r_ts").as("last_ts"), col("r_value").as("last_value"))
    }),
      Some("""WITH p AS (SELECT user_id, ts, value FROM events
             |    WHERE event_type = 'purchase'
             |    QUALIFY row_number() OVER (PARTITION BY user_id, ts
             |      ORDER BY event_id DESC) = 1),
             |b AS (SELECT user_id,
             |    CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
             |    CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
             |  FROM p GROUP BY 1),
             |g AS (SELECT user_id, unnest(generate_series(
             |    lo - ((lo % 86400) + 86400) % 86400, hi, 86400)) AS gs FROM b),
             |gt AS (SELECT user_id, CAST(to_timestamp(gs) AS TIMESTAMP) AS grid_ts
             |  FROM g)
             |SELECT gt.user_id, gt.grid_ts, p.ts AS last_ts, p.value AS last_value
             |FROM gt ASOF LEFT JOIN p
             |  ON gt.user_id = p.user_id AND p.ts <= gt.grid_ts""".stripMargin)),

    // ---------------- stream-stream interval join (batch formulation)
    // txnWithRecentAuth's join expression under the value-level gate:
    // transactions (odd events) pair with same-card authorizations
    // (even events) from the preceding 10 minutes, on the c7-compressed
    // timeline. The cross-batch streaming behavior of the same operator
    // is pinned by StreamingSpec.
    "x_stream_authjoin" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(
        col("user_id").cast("string").as("card_num"),
        col("event_id"),
        expr("timestamp_seconds(1704067200 + (unix_timestamp(ts) - 1704067200) div 200)")
          .as("ts2"))
      val txns = ev.filter(col("event_id") % 2 === 1).select(
        col("card_num"), concat(lit("T"), col("event_id")).as("trans_id"),
        col("ts2").as("trans_date"))
      val auths = ev.filter(col("event_id") % 2 === 0).select(
        col("card_num"), concat(lit("A"), col("event_id")).as("auth_id"),
        col("ts2").as("auth_ts"),
        when(col("event_id") % 3 === 0, "DENY").otherwise("OK").as("auth_result"))
      graft.streaming.StreamingIngest.txnWithRecentAuth(txns, auths)
    }),
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS card_num, event_id,
             |    TIMESTAMP '2024-01-01 00:00:00' + INTERVAL
             |      ((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 200) SECOND AS ts2
             |  FROM events),
             |t AS (SELECT card_num, 'T' || CAST(event_id AS VARCHAR) AS trans_id,
             |    ts2 AS trans_date FROM e WHERE event_id % 2 = 1),
             |a AS (SELECT card_num, 'A' || CAST(event_id AS VARCHAR) AS auth_id,
             |    ts2 AS auth_ts,
             |    CASE WHEN event_id % 3 = 0 THEN 'DENY' ELSE 'OK' END AS auth_result
             |  FROM e WHERE event_id % 2 = 0)
             |SELECT t.card_num, t.trans_id, t.trans_date,
             |  a.auth_id, a.auth_ts, a.auth_result
             |FROM t JOIN a ON a.card_num = t.card_num
             |  AND a.auth_ts BETWEEN t.trans_date - INTERVAL 600 SECOND
             |                    AND t.trans_date""".stripMargin)),

    // ------------- stream-stream LEFT OUTER join under the gate
    // Same enrichment as x_stream_authjoin but keeping transactions with
    // NO in-window authorization as null-extended rows — the outer
    // stream-stream join whose streaming emission is watermark-gated
    // (the engine may emit a null row only after proving no match can
    // still arrive; StreamingSpec pins that timing). Here the batch
    // formulation puts the null-extension semantics themselves under
    // the value-level gate as a plain LEFT JOIN.
    "x_stream_authjoin_outer" -> (((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(
        col("user_id").cast("string").as("card_num"),
        col("event_id"),
        expr("timestamp_seconds(1704067200 + (unix_timestamp(ts) - 1704067200) div 200)")
          .as("ts2"))
      val txns = ev.filter(col("event_id") % 2 === 1).select(
        col("card_num"), concat(lit("T"), col("event_id")).as("trans_id"),
        col("ts2").as("trans_date"))
      val auths = ev.filter(col("event_id") % 2 === 0).select(
        col("card_num"), concat(lit("A"), col("event_id")).as("auth_id"),
        col("ts2").as("auth_ts"),
        when(col("event_id") % 3 === 0, "DENY").otherwise("OK").as("auth_result"))
      graft.streaming.StreamingIngest.txnWithRecentAuth(txns, auths,
        joinType = "left_outer")
    }),
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS card_num, event_id,
             |    TIMESTAMP '2024-01-01 00:00:00' + INTERVAL
             |      ((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 200) SECOND AS ts2
             |  FROM events),
             |t AS (SELECT card_num, 'T' || CAST(event_id AS VARCHAR) AS trans_id,
             |    ts2 AS trans_date FROM e WHERE event_id % 2 = 1),
             |a AS (SELECT card_num, 'A' || CAST(event_id AS VARCHAR) AS auth_id,
             |    ts2 AS auth_ts,
             |    CASE WHEN event_id % 3 = 0 THEN 'DENY' ELSE 'OK' END AS auth_result
             |  FROM e WHERE event_id % 2 = 0)
             |SELECT t.card_num, t.trans_id, t.trans_date,
             |  a.auth_id, a.auth_ts, a.auth_result
             |FROM t LEFT JOIN a ON a.card_num = t.card_num
             |  AND a.auth_ts BETWEEN t.trans_date - INTERVAL 600 SECOND
             |                    AND t.trans_date""".stripMargin)),

    // ------------- streaming at-least-once → exactly-once under the gate
    // The second drop REDELIVERS half of the first (at-least-once file
    // feeds: re-dropped files, replayed offsets) plus new transactions;
    // dedupTransactions (dropDuplicatesWithinWatermark keyed on trans_id,
    // watermark-bounded state) must collapse the redelivery ACROSS
    // micro-batches before the checkpointed sink. DuckDB reads the same
    // files — duplicates included — and applies DISTINCT: any missed or
    // over-dropped key fails the value-level hash. amt re-emitted as
    // cents (decimal stringification rule, see s2).
    "x_stream_dedup" -> (((s: SparkSession, dir: String) => {
      import graft.streaming.StreamingIngest
      val scratch = scratchDir("graft_streamdd", dir)
      val in = scratch.resolve("in")
      java.nio.file.Files.createDirectories(in)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      // ordered by EVENT TIME so the second drop's new rows are never
      // beyond-watermark late (delivery order tracks event order, as in
      // a real feed); redelivered rows may be late, but late duplicates
      // drop either way — which is exactly the deduped outcome
      val rows = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("ts"), col("event_id")).limit(1000).collect().map { r =>
          val amt = String.format(java.util.Locale.ROOT, "%.2f",
            Double.box(r.getDouble(4))).replace('.', ',')
          s"TX${r.getLong(0)};${fmt.format(r.getTimestamp(1).toInstant)};" +
            s"C${r.getLong(2)};${r.getString(3)};$amt;OK;T${r.getLong(2) % 20}"
        }
      val hdr = "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal"
      java.nio.file.Files.write(in.resolve("transactions_01012024.txt"),
        java.util.Arrays.asList((hdr +: rows.take(600).toSeq): _*))
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      withStreamPartitions(s) {
        val q = StreamingIngest.startCatalogAppend(cat, "stream_txns",
          StreamingIngest.dedupTransactions(
            StreamingIngest.readTransactionStream(s, in.toString)),
          scratch.resolve("ckpt").toString)
        try {
          q.processAllAvailable()
          // redelivery of rows 300-599 + the genuinely new 400
          java.nio.file.Files.write(in.resolve("transactions_02012024.txt"),
            java.util.Arrays.asList((hdr +: rows.drop(300).toSeq): _*))
          q.processAllAvailable()
        } finally q.stop()
      }
      cat.read("stream_txns")
        .withColumn("amt_c", (col("amt") * 100).cast("long")).drop("amt")
    }),
      Some(s"""SELECT DISTINCT transaction_id AS trans_id, transaction_date AS trans_date,
             |  card_num, oper_type,
             |  CAST(CAST(replace(amount, ',', '.') AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt_c,
             |  oper_result, terminal
             |FROM read_csv('${sys.props("java.io.tmpdir")}/graft_streamdd_${SfTokenPlaceholder}/in/transactions_*.txt',
             |  delim = ';', header = true,
             |  columns = {'transaction_id': 'VARCHAR', 'transaction_date': 'TIMESTAMP',
             |    'card_num': 'VARCHAR', 'oper_type': 'VARCHAR', 'amount': 'VARCHAR',
             |    'oper_result': 'VARCHAR', 'terminal': 'VARCHAR'})""".stripMargin)),

    // -------------------- streaming session windows under the gate
    // The streaming analog of x_sessionize: session_window aggregation
    // with watermark-evicted merge state, driven across two event-time-
    // ordered micro-batches (sessions spanning the drop boundary must
    // merge THROUGH state), then a far-future sentinel drop advances the
    // watermark so every real session closes and append-mode emits its
    // final aggregate into the checkpointed catalog sink. DuckDB replays
    // session assembly over the same CSVs as a lag-based break at
    // delta > gap — Spark's session_window merges windows that overlap
    // OR touch (an event exactly `gap` after the previous one still
    // merges), the same boundary rule as the batch Sessionize op. The
    // sentinel card's own session never closes and is filtered from both
    // sides.
    "x_stream_sessionize" -> (((s: SparkSession, dir: String) => {
      import graft.streaming.StreamingIngest
      val scratch = scratchDir("graft_streamsess", dir)
      val in = scratch.resolve("in")
      java.nio.file.Files.createDirectories(in)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      val rows = t(s, dir, "events")
        .select(col("event_id"),
          expr("timestamp_seconds(1704067200 + (unix_timestamp(ts) - 1704067200) div 200)")
            .as("ts2"),
          col("user_id"))
        .orderBy(col("ts2"), col("event_id")).limit(2000).collect()
      val midMillis = rows(rows.length / 2).getTimestamp(1).getTime
      def line(r: org.apache.spark.sql.Row) =
        s"TX${r.getLong(0)};${fmt.format(r.getTimestamp(1).toInstant)};" +
          s"C${r.getLong(2)};PAY;1,00;OK;T0"
      val (first, second) = rows.partition(_.getTimestamp(1).getTime < midMillis)
      val hdr = "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal"
      java.nio.file.Files.write(in.resolve("transactions_01012024.txt"),
        java.util.Arrays.asList((hdr +: first.map(line).toSeq): _*))
      val cat = new graft.catalog.TableCatalog(s, scratch.resolve("wh").toString)
      withStreamPartitions(s) {
        val q = StreamingIngest.startCatalogAppend(cat, "stream_sessions",
          StreamingIngest.sessionWindows(
            StreamingIngest.readTransactionStream(s, in.toString),
            gapSeconds = 300L),
          scratch.resolve("ckpt").toString)
        try {
          q.processAllAvailable()
          java.nio.file.Files.write(in.resolve("transactions_02012024.txt"),
            java.util.Arrays.asList((hdr +: second.map(line).toSeq): _*))
          q.processAllAvailable()
          // watermark-flush sentinel: far enough ahead that wm = sentinel
          // - 30 min passes every real session's close (+300 s gap)
          val maxMillis = rows.map(_.getTimestamp(1).getTime).max
          val flush = java.time.Instant.ofEpochMilli(maxMillis + 100000L * 1000L)
          java.nio.file.Files.write(in.resolve("transactions_03012024.txt"),
            java.util.Arrays.asList(hdr,
              s"TXFLUSH;${fmt.format(flush)};CFLUSH;PAY;1,00;OK;T0"))
          q.processAllAvailable()
        } finally q.stop()
      }
      cat.read("stream_sessions").filter(col("card_num") =!= "CFLUSH")
    }),
      Some(s"""WITH raw AS (SELECT * FROM read_csv(
             |    '${sys.props("java.io.tmpdir")}/graft_streamsess_${SfTokenPlaceholder}/in/transactions_*.txt',
             |    delim = ';', header = true,
             |    columns = {'transaction_id': 'VARCHAR', 'transaction_date': 'TIMESTAMP',
             |      'card_num': 'VARCHAR', 'oper_type': 'VARCHAR', 'amount': 'VARCHAR',
             |      'oper_result': 'VARCHAR', 'terminal': 'VARCHAR'})),
             |e AS (SELECT card_num, transaction_date AS ts FROM raw
             |  WHERE card_num <> 'CFLUSH'),
             |l AS (SELECT card_num, ts,
             |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
             |        - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 300
             |      THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY card_num ORDER BY ts)),
             |sess AS (SELECT card_num, ts, CAST(sum(brk) OVER (PARTITION BY card_num
             |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             |  FROM l)
             |SELECT card_num, count(*) AS n_events,
             |  min(ts) AS session_start, max(ts) AS session_end
             |FROM sess GROUP BY card_num, sid""".stripMargin)),

    // ------------------------------------------- C2 fact append (idempotent)
    // Exercises the REAL FactLoader + TableCatalog paths end to end in a
    // scratch warehouse: two dates of transaction facts with the second
    // date RERUN (dynamic partition overwrite must not duplicate — quirk
    // SURVEY §2.9.5), plus two blacklist loads where the second is a
    // superset (anti-join dedup, main.py:382-393). The oracle derives the
    // expected final state directly from the source tables.
    "c2_fact_append" -> (((s: SparkSession, dir: String) => {
      import graft.catalog.TableCatalog
      import graft.etl.FactLoader
      // fixed per-SF scratch path, reset at query start: a fresh temp dir
      // per invocation would leak a parquet tree on every Verify/Bench
      // run, and a SHARED one would let a bigger SF's blacklist survive
      // the anti-join and inflate a later small-SF count
      val cat = new TableCatalog(s, scratchDir("graft_c2", dir).toString)
      val o = t(s, dir, "orders")
      def stg(d: String) =
        o.filter(to_date(col("o_orderdate")) === lit(java.sql.Date.valueOf(d)))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .withColumn("load_dt", lit(d))
      cat.appendPartitioned("fact_txn", FactLoader.transactionRows(stg("1995-03-01")), "load_dt")
      cat.appendPartitioned("fact_txn", FactLoader.transactionRows(stg("1995-03-02")), "load_dt")
      // rerun of the second date — must overwrite its own partition only
      cat.appendPartitioned("fact_txn", FactLoader.transactionRows(stg("1995-03-02")), "load_dt")
      val c = t(s, dir, "customer")
      val blSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("passport_num",
          org.apache.spark.sql.types.LongType)))
      val bl1 = c.filter(col("c_custkey") % 17 === 0)
        .select(col("c_custkey").as("passport_num"))
      val bl2 = c.filter(col("c_custkey") % 17 === 0 || col("c_custkey") % 19 === 0)
        .select(col("c_custkey").as("passport_num"))
      cat.append("fact_bl", FactLoader.blacklistRows(bl1, cat.readOrEmpty("fact_bl", blSchema)))
      cat.append("fact_bl", FactLoader.blacklistRows(bl2, cat.read("fact_bl")))
      cat.read("fact_txn")
        .groupBy(col("load_dt").cast("string").as("part"))
        .agg(count(lit(1)).as("cnt"))
        .unionByName(cat.read("fact_bl")
          .agg(count(lit(1)).as("cnt"))
          .select(lit("blacklist").as("part"), col("cnt")))
    }),
      Some("""SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS part, count(*) AS cnt
             |FROM orders
             |WHERE CAST(o_orderdate AS DATE) IN (DATE '1995-03-01', DATE '1995-03-02')
             |GROUP BY 1
             |UNION ALL
             |SELECT 'blacklist' AS part, count(*) AS cnt
             |FROM customer WHERE c_custkey % 17 = 0 OR c_custkey % 19 = 0""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // the registry is a Seq so a DUPLICATE name is expressible — and a
    // Map would silently keep the last body while the oracle kept the
    // last SQL, shipping a query that never runs (this bit r10:
    // a second x_schema_evolution masked the first). Refuse loudly.
    val names = registry.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    registry.map { case (n, (f, _)) => n -> f }.toMap
  }

  /** Static contract view: any SF-dependent scratch path resolves to the
    * correctness-gate SF (sf0.01, the driver default). Prefer
    * [[oracleSqlFor]] when the verify-time SF dir is known. */
  def oracleSql: Map[String, String] = oracleSqlFor("/root/testdata/sf0.01")

  /** Oracle SQL with scratch paths bound to the ACTUAL verify-time SF dir
    * — [[Verify]] dumps this form, so a gate run at any SF reads the
    * matching per-SF fixtures (VERDICT r2 #7: the s2 oracle no longer
    * pins sf0.01). */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    registry.collect { case (n, (_, Some(sql))) =>
      n -> sql.replace(SfTokenPlaceholder, sfToken(sfDir))
    }.toMap
}
