package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan CONTRACTS for the driver query surface — the manual
  * per-round plan audit (no cartesian, filters pushed, dims broadcast,
  * aggregation partial) turned into a regression gate. Plans are built
  * against the smallest testdata SF; assertions target plan SHAPE
  * properties that must hold at every scale, not size-dependent
  * choices. Queries here are the stateless subset (pure DataFrame
  * construction over the testdata parquet — no scratch catalogs, no
  * streaming checkpoints), so building the plan runs at most the tiny
  * sizing jobs a query's own closure performs. */
class PlanContractSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val fn = SparkEntry.queries.getOrElse(name,
      fail(s"query '$name' not registered"))
    fn(spark, dir).queryExecution.executedPlan.toString
  }

  test("no accidental cartesian product anywhere in the stateless surface") {
    // every self-join / pair generator below is bucket- or key-equi
    // joined by construction; a refactor that drops the equi condition
    // turns one of these into an O(n²) cartesian — the single worst
    // plan regression possible at 100 TB
    val stateless = Seq(
      "q1_agg", "j1_star_join", "j2_c6_cross_pair", "j4_left_join",
      "p5_filter_pack", "w1_rownum_time", "o1_distinct",
      "x_dedup_minhash_lsh", "x_dedup_ngram_jaccard", "x_dedup_simhash",
      "x_winnow_pairs", "x_repeated_ngrams", "x_dup_fraction",
      "x_setjoin_prefix", "x_bm25", "x_phrase_search", "x_knn_graph",
      // r9 second sitting: the DSIR bucket join and the span-dedup
      // gram joins are key-equi by construction; the epoch shuffle's
      // only non-equi join is the deliberate 1-row count broadcast
      "x_dsir", "x_dedup_spans", "x_dedup_excise", "x_gopher_rules",
      // r9 third sitting: the overlap matrix rides the shingle-equi
      // pair join, linkage is blocking-key-equi, ccnet/zipf ride the
      // grouped two-phase rank (1-row/bases broadcasts only)
      "x_pii_scan", "x_ccnet_buckets", "x_source_overlap", "x_zipf",
      "x_record_linkage",
      // r9 fourth sitting: survivorship is entity-keyed aggregation +
      // co-partitioned mode joins — no pair space at all
      "x_golden_record")
    stateless.foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"),
        s"$n plans a cartesian product:\n${p.take(2000)}")
    }
  }

  test("ccnet bucketing never plans a per-group ntile window") {
    // the closed-form distributed ntile must keep the dominant
    // language out of a single window partition: the plan may sort
    // within range partitions but must contain NO ntile window
    // function (a refactor back to ntile().over(partitionBy(lang))
    // reintroduces the one-task-per-language sort)
    val p = plan("x_ccnet_buckets")
    assert(!p.toLowerCase.contains("ntile("),
      s"x_ccnet_buckets plans a window ntile:\n${p.take(2000)}")
  }

  test("predicate pushdown reaches the parquet scan for the filter pack") {
    val p = plan("p5_filter_pack")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"p5 scan lost its pushed filters:\n${p.take(2000)}")
  }

  test("the star flatten hash-builds on the dimension tables at dim-fits scale") {
    // at fixture scale every dim is under the broadcast threshold: the
    // fact side must never shuffle for the star join
    val p = plan("j1_star_join")
    assert(p.contains("BroadcastHashJoin"),
      s"star join stopped broadcasting small dims:\n${p.take(2000)}")
  }

  test("q1 aggregation is partial (map-side combine before the exchange)") {
    // two HashAggregate levels around one shuffle — the shape that keeps
    // a 100 TB groupBy's exchange carrying partial states, not rows
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"q1 lost its partial aggregation:\n${p.take(2000)}")
    assert(p.contains("Exchange"), "q1 must aggregate across an exchange")
  }

  test("the column-pruned projection reads only the projected columns") {
    // p1 projects 3 columns of customer: the scan's ReadSchema must not
    // materialize the full row
    val p = plan("p1_project_literals")
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.nonEmpty, s"no ReadSchema in plan:\n${p.take(2000)}")
    assert(!readSchema.contains("c_acctbal") && !readSchema.contains("c_comment"),
      s"p1 scan reads unprojected columns: $readSchema")
  }
}
