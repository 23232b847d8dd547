package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape pins for the headline queries: these assert the
  * plan we DESIGNED for (pushdown reaching the scan, dims broadcast,
  * fact-to-fact shuffles as sort-merge, whole-stage codegen present,
  * heap-based top-k instead of a window sort) — so a regression that
  * silently de-optimizes a query fails CI, not just the benchmark. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("q6: filter is pushed to the parquet scan and prunes columns") {
    val p = planOf("q6_filter_agg")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual.*"), p)
    // projection pruning: the scan must not read the full lineitem row
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_returnflag"),
      "q6 reads a column it never uses:\n" + p)
  }

  test("q5: every dimension joins as broadcast, no SMJ for dims") {
    val p = planOf("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  /** Shuffle exchanges only (BroadcastExchange excluded): formatted
    * plans list each operator once as "(N) Exchange" in the details
    * section — the stable thing to count. */
  private def shuffleExchanges(p: String): Int =
    "\\(\\d+\\) Exchange\\b".r.findAllIn(p).length

  test("q3: top-10 plans as TakeOrdered (bounded heap, no global " +
      "sort); customer broadcasts; exactly one shuffle (the agg)") {
    val p = planOf("q3_top_revenue")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(shuffleExchanges(p) == 1,
      s"q3 grew a shuffle (expected 1):\n$p")
  }

  test("q4: the EXISTS subquery plans as a semi-join, one shuffle " +
      "(the agg), partial aggregation before it") {
    val p = planOf("q4_order_priority")
    assert(p.contains("LeftSemi"), p)
    assert(shuffleExchanges(p) == 1,
      s"q4 grew a shuffle (expected 1):\n$p")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) >= 0,
      "q4 lost its map-side partial aggregate:\n" + p)
  }

  test("q7: every dimension joins as broadcast (no SMJ anywhere); " +
      "exactly one shuffle (the agg)") {
    val p = planOf("q7_volume")
    assert(!p.contains("SortMergeJoin"), p)
    // customer, supplier, and both nation aliases are explicit
    // broadcasts; orders rides under the threshold at this sf
    assert("BroadcastHashJoin".r.findAllIn(p).length / 2 >= 4, p)
    assert(shuffleExchanges(p) == 1,
      s"q7 grew a shuffle (expected 1):\n$p")
  }

  test("q5: exactly one shuffle (the agg) — dims broadcast " +
      "(no-regression exchange count for the headline snowflake)") {
    val p = planOf("q5_region_revenue")
    assert(shuffleExchanges(p) == 1,
      s"q5 grew a shuffle (expected 1):\n$p")
  }

  test("j10: fact-to-fact join is shuffle-based when neither side is broadcastable") {
    // at sf0.001 Catalyst (correctly) broadcasts the tiny orders side;
    // disabling the threshold simulates the 100 TB both-sides-big case
    // and must yield a shuffle join, never a nested loop
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf("j10_large_smj")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q1: aggregation is partial (map-side combine) before the exchange") {
    val p = planOf("q1_agg")
    val firstAgg = p.indexOf("HashAggregate")
    val firstExchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstExchange >= 0, p)
    // formatted plans list operators leaves-first: the partial
    // aggregate must appear below (after) the scan and the final one
    // above; concretely there are >= 2 HashAggregates and an Exchange
    assert(p.indexOf("HashAggregate", firstAgg + 1) >= 0, p)
  }

  test("headline queries stay inside whole-stage codegen") {
    // AQE assigns codegen ids only in the final plan — execute first
    for (n <- Seq("q1_agg", "q6_filter_agg", "q3_top_revenue")) {
      val df = SparkEntry.queries(n)(spark, sf)
      df.collect()
      val p = df.queryExecution.explainString(FormattedMode)
      assert(p.contains("codegen id :"), s"$n:\n$p")
    }
  }

  test("topk_per_key plans TopKPerKeyExec with no partition sort") {
    val p = planOf("topk_per_key")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), "top-k fell back to a window sort:\n" + p)
  }

  test("x6_kmv_poly: the k-minima cut plans as the bounded heap") {
    // the row_number-over-(type, h asc) <= k window must rewrite to
    // TopKPerKeyExec (bounded heap, no per-partition full sort) under
    // the injected TopKRewriteRule — at 100 TB the sketch's memory is
    // then O(groups * k), not O(distinct hashes)
    val p = planOf("x6_kmv_poly")
    assert(p.contains("TopKPerKey"), p)
  }

  test("x2_minhash_lsh signature stage has no shuffle before banding") {
    // the signature subplan is map-only: scanning documents up to the
    // banded explode must not contain an Exchange (the only shuffles
    // are the candidate join + distinct)
    val df: DataFrame = ops.Dedup.signatures(
      Tables.documents(spark, sf), "text", "doc_id", 3, 32)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), "map-only signature stage shuffled:\n" + p)
  }

  test("q2: lineitem is scanned once; the part filter pre-joins as semi") {
    // the correlated-min rewrite must NOT recompute the fact aggregate
    // (a naive min-join-back plans the lineitem subtree twice), and
    // the p_size predicate must reach the fact side as a semi-join
    // BEFORE the aggregate
    val p = planOf("q2_min_cost")
    val liScans = "lineitem".r.findAllIn(p).size
    assert(p.contains("LeftSemi"), p)
    val semiPos = p.indexOf("LeftSemi")
    val aggPos = p.indexOf("HashAggregate")
    assert(semiPos >= 0 && aggPos >= 0, p)
    // formatted plan: the numbered tree lists the semi join as a child
    // of the first aggregate — assert single lineitem scan instead of
    // ordering (robust to plan-id renumbering)
    assert(liScans <= 2, s"lineitem subtree appears replicated:\n$p")
  }

  test("x4_seq_pack: the per-document window is range-partitioned") {
    // the only GLOBAL-order window may be the O(ranges) prefix table;
    // the window over the full document set must be partitioned by rng
    val p = planOf("x4_seq_pack")
    assert(p.contains("windowspecdefinition(rng"),
      "in-range cumsum lost its partitioning:\n" + p)
  }

  test("x2_chunk_dedup: exactly two shuffles (content window + doc agg)") {
    // FormattedMode mentions each node twice (tree + details): count
    // the tree form "Exchange (<id>)" only
    val p = planOf("x2_chunk_dedup")
    val exchanges = "Exchange \\(\\d+\\)".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 Exchanges, saw $exchanges:\n$p")
  }

  test("q21: lineitem is scanned once (decorrelation via one aggregate)") {
    val p = planOf("q21_waiting")
    val liScans = "lineitem".r.findAllIn(p).size
    // one scan node, mentioned in tree + details
    assert(liScans <= 2, s"q21 re-grew multiple lineitem scans:\n$p")
    assert(p.contains("collect_set"), p)
  }

  test("x6_median_mode: one fact shuffle (histogram), no fact-wide sort") {
    val p = planOf("x6_median_mode")
    // the only Sorts allowed are over the tiny (rf, q) histogram —
    // SortExec over lineitem would show a sort BEFORE the first
    // aggregate; assert the first Exchange is below a partial agg
    assert(p.contains("partial_count"), p)
    // bounded shuffle budget: 2 per histogram branch (partial/final
    // agg + rf window re-key); AQE reuses the identical histogram
    // exchange at runtime ("- Exchange (" excludes BroadcastExchange)
    assert("- Exchange \\(".r.findAllIn(p).size <= 4,
      "median/mode shuffle budget exceeded:\n" + p)
  }

  test("x3_matryoshka: candidate pool is a bounded heap, not a window") {
    val p = planOf("x3_matryoshka")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"),
      "matryoshka pool regressed to a global window:\n" + p)
  }

  test("x8_total_sort: range-partitioned exchange feeds the sort") {
    val p = planOf("x8_total_sort")
    assert(p.contains("rangepartitioning"),
      "total sort lost its range partitioning:\n" + p)
    assert(!p.contains("SinglePartition"),
      "total sort funnels through one partition:\n" + p)
  }

  test("mart: scan + 2 broadcast joins + exactly one shuffle (the distinct)") {
    // the claim in nhl/Mart.scala: team_statistics is a per-season
    // 32-row dim, so at 100 TB of games the mart is scan + 2 BHJ +
    // one exchange for the union-distinct — pin it like q2/seq_pack
    val p = planOf("mart_join_union")
    // count tree lines only ("- X (n)"); the formatted detail section
    // repeats every node name once more
    assert("- BroadcastHashJoin ".r.findAllIn(p).size == 2,
      "mart must join its dim twice as broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "a mart dim join regressed to SMJ:\n" + p)
    // "- Exchange (" matches only shuffle exchanges in formatted
    // plans (BroadcastExchange prints as "- BroadcastExchange (")
    assert("- Exchange \\(".r.findAllIn(p).size == 1,
      "mart must shuffle exactly once (union-distinct):\n" + p)
  }

  test("x1_changelog_compact: both windows share one keyed exchange") {
    // the claim in Parity14: last-op rank and op count are window
    // functions over the SAME user_id partitioning — adding the count
    // must not buy a second shuffle of the log
    val p = planOf("x1_changelog_compact")
    val shuffles = "- Exchange \\(".r.findAllIn(p).size
    assert(shuffles <= 2, // key shuffle + final orderBy range exchange
      s"changelog compaction shuffled $shuffles times:\n" + p)
  }

  test("x6_cms_est: the counter matrix joins as broadcast") {
    // the sketch is depth*width rows regardless of corpus size — if
    // it ever plans as a shuffle join the size-invariance is lost
    val p = planOf("x6_cms_est")
    assert(p.contains("BroadcastHashJoin"),
      "CMS counters must broadcast:\n" + p)
  }

  test("x7_weighted_sample: top-k plans as TakeOrdered, not a global sort") {
    // the E-S sample is map-only keys + a bounded top-k: a full sort
    // (range exchange + Sort) here would be a 100 TB scan-sort
    val p = planOf("x7_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "weighted sample must use the bounded top-k operator:\n" + p)
  }

  test("x6_source_drift: the marginals join as broadcast") {
    // row marginal is |sources| rows, N is 1 row — corpus-scale work
    // must stay in the (source, token) aggregate
    val p = planOf("x6_source_drift")
    assert("- BroadcastHashJoin ".r.findAllIn(p).size >= 1,
      "drift marginals must broadcast:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), // the 1-row N cross join
      "the N total must broadcast:\n" + p)
  }

  test("x8_hilbert_curve: the kernel stays inside whole-stage codegen") {
    // AQE assigns codegen ids only in the final plan — execute first
    val df = SparkEntry.queries("x8_hilbert_curve")(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("codegen id :"), p)
    // the native expression must not fall back to interpreted eval
    // via a Project outside codegen: the scan->project span is fused
    assert(!p.contains("BatchEvalPython"), p)
  }

  test("x9_triangles: adjacency joins broadcast; the closure never shuffles wedges") {
    val p = planOf("x9_triangles")
    // degree + adjacency sides broadcast (the wedge/closure stage is
    // map-side); a SortMergeJoin would mean the wedge stream shuffles
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "triangle closure must not shuffle the wedge stream:\n" + p)
    // the native sorted-merge kernel is in the plan, not array_intersect
    assert(p.contains("intersect_count_sorted"), p)
  }

  test("x1_time_travel: the cutoff predicate reaches the parquet scan") {
    val p = planOf("x1_time_travel")
    // ts is normalized in a projection, so the raw scan cannot take
    // the nanos filter — but the filter must still sit scan-side
    // BEFORE the window shuffle (one Exchange total: the key window)
    val exchanges = "Exchange \\(\\d+\\)".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 Exchange, saw $exchanges:\n$p")
  }

  test("x6_tdigest: group digests aggregate partially before the exchange") {
    val p = planOf("x6_tdigest")
    assert(p.contains("partial_tdigest") || p.contains("partial_graft_tdigest"),
      "t-digest must combine map-side (mergeable-sketch contract):\n" + p)
  }

  test("x3_knn_graph_ann: candidate reduction is the two-phase bounded " +
      "heap, partial below the probe exchange") {
    val p = planOf("x3_knn_graph_ann")
    assert(p.contains("TopKPerKeyPartial"),
      "ANN graph must cap candidates map-side before the exchange:\n" + p)
    assert(p.replace("TopKPerKeyPartial", "").contains("TopKPerKey"),
      "the exact keyed top-k pass must follow the partial:\n" + p)
  }

  test("x6_hll_poly: register maxima aggregate partially (mergeable-" +
      "sketch contract) and the register grid never exceeds m rows") {
    val p = planOf("x6_hll_poly")
    // groupBy(j).max(rho) must combine map-side: two HashAggregates
    // around an Exchange, the sketch-merge shape
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) >= 0,
      "register maxima must partial-aggregate:\n" + p)
  }

  test("x8_bloom_prune: probe side broadcasts; the bloom build is a " +
      "keyed bit_or aggregate, never a join per probe") {
    val p = planOf("x8_bloom_prune")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "probe positions are metadata-sized and must broadcast:\n" + p)
    assert(p.contains("bit_or"), p)
  }

  test("x9_label_prop: per-round argmax is a hash aggregate, never a " +
      "window sort over the vote relation") {
    val p = planOf("x9_label_prop")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      "LPA argmax must not plan a window sort (the 37x-at-100x " +
        "regression this replaced):\n" + p)
    assert(p.contains("HashAggregate"), p)
  }

  test("x4_pmi_cooc: unigram and bigram counts partial-aggregate " +
      "below their exchanges") {
    val p = planOf("x4_pmi_cooc")
    val first = p.indexOf("partial_count")
    assert(first >= 0 && p.indexOf("partial_count", first + 1) >= 0,
      "both count aggregates must combine map-side:\n" + p)
  }

  test("x3_mips: probes broadcast; the corpus side never shuffles " +
      "for the scoring join") {
    val p = planOf("x3_mips")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "probe set is k rows and must broadcast:\n" + p)
  }

  test("x1_forget_plan: the file verdict is one keyed aggregate with " +
      "map-side combine; the totals side broadcasts back") {
    val p = planOf("x1_forget_plan")
    val first = p.indexOf("partial_count")
    assert(first >= 0, "per-file counts must partial-aggregate:\n" + p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("runtime bloom-filter join: Catalyst injects might_contain on " +
      "the probe side of a selective fact-fact join when enabled") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creation side must stay UNDER this cap; application side must
      // EXCEED the scan threshold - thresholds point opposite ways
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "512mb",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1b",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      // selective dim side (1 order in 50) joined to the fact: the
      // runtime filter should build a bloom on the filtered side and
      // probe it below the fact scan - row-group skipping at 100 TB
      // the selective predicate must sit on a NON-join column, or
      // constraint propagation clones it onto the fact side and the
      // rule sees no benefit to inject
      val orders = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val p = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter_agg"),
        "runtime bloom filter must inject into the probe side:\n" + p)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("j13_grid_radius: candidates come from a cell EQUI-join — no " +
      "cartesian product anywhere in the plan") {
    val p = planOf("j13_grid_radius")
    assert(!p.contains("CartesianProduct"),
      "the grid must turn the radius join into an equi-join:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("x5_stream_attrib: the interval join keys on user_id — never " +
      "a nested-loop over the range condition") {
    // an event-time interval join MUST keep its equality key in the
    // join condition: dropping it (or expressing only the range)
    // degrades to BroadcastNestedLoopJoin/CartesianProduct — the
    // classic silent de-optimization of stream-stream attribution
    val p = planOf("x5_stream_attrib")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      "attribution join degraded to a nested loop:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(p.matches("(?s).*Join.*user_id.*"), p)
  }

  test("mm_phash_pairs: candidates come from an equi-join on the " +
      "chunk key — never an all-pairs product") {
    val p = planOf("mm_phash_pairs")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      "phash banding degraded to all-pairs:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("x4_bm25_topk: top-k is a bounded heap, never a global sort; " +
      "idf and corpus stats join as broadcast") {
    val p = planOf("x4_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "bm25 top-k degraded to a global sort:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNested"),
      "term-sized idf table must broadcast:\n" + p)
  }

  test("x7_doremi_weights and x7_epoch_plan: no joins at all — the " +
      "whole iteration is windows over the per-domain frame") {
    Seq("x7_doremi_weights", "x7_epoch_plan").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Join"),
        s"$q reintroduced a join into the tiny-frame iteration:\n" + p)
      assert(p.contains("Window"), p)
      // exactly one aggregate keyed on the scan (the per-domain
      // collapse) — partial before its exchange
      assert(p.contains("partial_"),
        s"$q per-domain aggregate lost map-side combine:\n" + p)
    }
  }

  test("mm_caption_align: the bin join is hash-based on (media, bin), " +
      "both histograms combine map-side") {
    val p = planOf("mm_caption_align")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      "caption alignment degraded to a product:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "full-outer bin join must be a keyed join:\n" + p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("mm_audio_fp and mm_video_fp: banded candidates are an " +
      "equi-join on the chunk key — never all-pairs") {
    Seq("mm_audio_fp", "mm_video_fp").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"$q banding degraded to all-pairs:\n" + p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
        || p.contains("BroadcastHashJoin"), p)
    }
  }

  test("x6_theil_sen: the pairwise stage joins on event_type and the " +
      "day aggregate combines map-side — the pair blowup never " +
      "touches the event stream") {
    val p = planOf("x6_theil_sen")
    assert(!p.contains("Cartesian"),
      "pairwise slopes degraded to a cartesian:\n" + p)
    assert(p.contains("partial_count"),
      "the day aggregate lost map-side combine:\n" + p)
  }

  test("x1_surrogate_keys: the rank window is partition-local and " +
      "the offset path combines map-side before its metadata gather") {
    val p = planOf("x1_surrogate_keys")
    // the naive formulation is row_number() OVER (ORDER BY k): ONE
    // Window over Exchange SinglePartition carrying every data row.
    // The scalable plan ranks within pid partitions; the only
    // single-partition work is the <= RangeParts-row offset window,
    // whose input is a map-side-combined count aggregate (metadata)
    assert(p.matches("(?s).*row_number\\(\\) windowspecdefinition\\(pid.*"),
      "the data-side rank must partition by pid:\n" + p)
    assert(p.contains("partial_count"),
      "per-partition counts must combine map-side before the " +
        "offset gather:\n" + p)
  }

  test("x2_sorted_blocking: the window-pair stage is a hash EQUI-join " +
      "on the rank bucket, never a rank theta-join") {
    // the rank stage itself runs inside the lineage truncation (its
    // partition-local window shape is the x1_surrogate_keys pin);
    // this plan covers the pair stage downstream of it
    val p = planOf("x2_sorted_blocking")
    assert(p.matches("(?s).*(BroadcastHashJoin|SortMergeJoin|" +
      "ShuffledHashJoin).*bkt.*"),
      "window pairs must equi-join on the bucket key:\n" + p)
    // a rank-inequality formulation would surface as a cartesian
    // with a range condition (the only nested-loop allowed is the
    // 1-row n_candidates broadcast)
    assert(!p.contains("CartesianProduct"),
      "window pairs fell to a cartesian:\n" + p)
  }

  test("x9_mis round: both undecided-set semi-joins broadcast (the " +
      "kcore alive-set lesson) — no sort-merge re-sort of the edge " +
      "relation per round") {
    val p = planOf("x9_mis")
    assert(!p.contains("SortMergeJoin"),
      "a MIS round re-sorted the edge relation:\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("Exchange arms (pagerank/LPA/HITS rounds): the broadcast arm " +
      "never shuffles, the message arm shuffle-hash-joins with only " +
      "the VECTOR moving (pre-partitioned edges reused)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L))
      .toDF("src", "dst", "w")
      // the production posture: edges pre-partitioned on the join key
      // once, CACHED, and MATERIALIZED (until the cached AQE plan
      // executes it reports UnknownPartitioning and the join would
      // reshuffle the edges — the query comments pin why)
      .repartition(col("src")).persist()
    try {
      edges.count()
      val vec = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("csrc", "r")
      // join-induced shuffles carry the ENSURE_REQUIREMENTS origin; the
      // one-time layout repartition inside the cache is REPARTITION_BY_COL
      def joinShuffles(p: String): Int =
        "ENSURE_REQUIREMENTS".r.findAllIn(p).size
      val bPlan = graft.ops.Exchange
        .vecJoin(vec, edges, col("csrc") === col("src"), msg = false)
        .queryExecution.explainString(FormattedMode)
      assert(bPlan.contains("BroadcastHashJoin"), bPlan)
      assert(joinShuffles(bPlan) == 0,
        "broadcast arm must not shuffle either side:\n" + bPlan)
      val mPlan = graft.ops.Exchange
        .vecJoin(vec, edges, col("csrc") === col("src"), msg = true)
        .queryExecution.explainString(FormattedMode)
      assert(mPlan.contains("ShuffledHashJoin"),
        "message arm must plan a shuffled hash join:\n" + mPlan)
      assert(!mPlan.contains("BroadcastHashJoin"), mPlan)
      // exactly ONE join-induced shuffle: the node-bounded vector; the
      // edges' cached partitioning satisfies the join requirement
      assert(joinShuffles(mPlan) == 1,
        s"message arm must move only the vector " +
          s"(${joinShuffles(mPlan)} shuffles):\n" + mPlan)
    } finally edges.unpersist(blocking = false)
  }

  test("Exchange.vecJoinUsing (the HITS half-step shape): msg form " +
      "plans a shuffled hash join moving only the vector") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L))
      .toDF("c", "p", "w")
      .repartition(col("c")).persist()
    try {
      edges.count()
      val hubs = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("c", "h")
      val mPlan = graft.ops.Exchange
        .vecJoinUsing(hubs, edges, Seq("c"), msg = true)
        .queryExecution.explainString(FormattedMode)
      assert(mPlan.contains("ShuffledHashJoin"), mPlan)
      assert("ENSURE_REQUIREMENTS".r.findAllIn(mPlan).size == 1,
        "using-join msg form must move only the vector:\n" + mPlan)
      val bPlan = graft.ops.Exchange
        .vecJoinUsing(hubs, edges, Seq("c"), msg = false)
        .queryExecution.explainString(FormattedMode)
      assert(bPlan.contains("BroadcastHashJoin"), bPlan)
    } finally edges.unpersist(blocking = false)
  }

  test("hitsQ msg-arm cache setup: ONE materializing action fills " +
      "both co-partitioned edge copies and BOTH report their hash " +
      "partitioning — each half-step join moves only the vector") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the exact two-copy setup hitsQ(msg = true) runs, with only the
    // SECOND cache counted (the job computes through the first)
    val e0 = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L))
      .toDF("c", "p", "w")
    val edgesC = e0.repartition(col("c")).persist()
    val edgesP = edgesC.repartition(col("p")).persist()
    try {
      edgesP.count()
      def oneShuffle(p: String, what: String): Unit = {
        assert(p.contains("ShuffledHashJoin"), s"$what:\n$p")
        assert("ENSURE_REQUIREMENTS".r.findAllIn(p).size == 1,
          s"$what must move only the vector:\n$p")
      }
      val hubs = Seq((1L, 10L)).toDF("c", "h")
      oneShuffle(graft.ops.Exchange
        .vecJoinUsing(hubs, edgesC, Seq("c"), msg = true)
        .queryExecution.explainString(FormattedMode),
        "a-step over the INDIRECTLY materialized copy")
      val auth = Seq((2L, 5L)).toDF("p", "a")
      oneShuffle(graft.ops.Exchange
        .vecJoinUsing(auth, edgesP, Seq("p"), msg = true)
        .queryExecution.explainString(FormattedMode),
        "h-step over the counted copy")
    } finally {
      edgesC.unpersist(blocking = false)
      edgesP.unpersist(blocking = false)
    }
  }

  test("s5_partition_prune: the segment filter prunes partition " +
      "directories at the scan (PartitionFilters non-empty)") {
    val p = planOf("s5_partition_prune")
    assert(p.matches(
      "(?s).*PartitionFilters: \\[[^\\]]*c_mktsegment[^\\]]*BUILDING.*"),
      "partition filter did not reach the scan:\n" + p)
  }

  test("s15_dpp_join: the join-derived partition filter reaches the " +
      "fact scan as a dynamicpruning expression") {
    val p = planOf("s15_dpp_join")
    assert(p.contains("dynamicpruning"),
      "no dynamic partition pruning on the fact scan:\n" + p)
  }

  test("x9_random_walk step: frontier broadcasts (no adjacency " +
      "re-sort) and the hash-min agg is partial before its exchange") {
    import spark.implicits._
    val adj = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("node", "nb")
    val cur = Seq((1L, 1L)).toDF("walk", "node")
    val p = queries.Parity73.walkStep(cur, adj, 1)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"),
      "walk step fell to a sort-merge join (adjacency re-sorted " +
        "per step):\n" + p)
    assert(!p.contains("SortMergeJoin"), p)
    // min over the 44-char string key can only be a SortAggregate
    // (var-length buffer types are not hash-aggregable), but the
    // partial phase still runs map-side before the walk-keyed
    // exchange — that combine, not the aggregate flavor, is the
    // load-bearing property: post-combine only one row per walk
    // crosses the wire.
    assert(p.contains("partial_min"),
      "hash-min not map-side combined:\n" + p)
    // the message arm must NOT broadcast the frontier: shuffle-hash,
    // frontier as build side, adjacency in place
    val pm = queries.Parity73.walkStep(cur, adj, 1, msg = true)
      .queryExecution.explainString(FormattedMode)
    assert(pm.contains("ShuffledHashJoin"), pm)
    assert(!pm.contains("BroadcastHashJoin"), pm)
  }

  test("readIndexed: a key filter prunes FILES through Catalyst's " +
      "own pushdown — the scan's numFiles metric drops to the " +
      "overlapping group's files; the unfiltered scan reads all") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("vidx").toString
    var v = 0L
    (0 until 4).foreach { i => // four disjoint key decades
      v = VersionedTable.commit(spark, p,
        (0 until 5).map(j => (i * 10L + j, s"r$i$j")).toDF("k", "s"),
        v, statsCol = Some("k"))
    }
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    }
    val base = VersionedTable.readIndexed(spark, p, "k").get
    val total = scannedFiles(base)
    val filtered = VersionedTable.readIndexed(spark, p, "k").get
      .filter(col("k") >= 11L && col("k") <= 14L) // inside group 1
    val opened = scannedFiles(filtered)
    assert(opened > 0 && opened < total,
      s"no file pruning: $opened of $total")
    // exactly one group's on-disk files survive
    val g1Files = new java.io.File(s"$p/data").listFiles()
      .filter(_.isDirectory).map(d =>
        d.listFiles().count(f => f.isFile &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))).min
    assert(opened <= total / 2, s"pruning too weak: $opened/$total")
    // content equals the reconciling read path
    val want = VersionedTable.read(spark, p).get
      .filter(col("k") >= 11L && col("k") <= 14L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(filtered.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == want)
    // filters the bounds-walker cannot convert stay correct, unpruned
    val weird = VersionedTable.readIndexed(spark, p, "k").get
      .filter(col("k") % 10 === 1L)
    assert(weird.collect().map(_.getLong(0)).toSet ==
      Set(1L, 11L, 21L, 31L))
    // gating: a DV'd snapshot refuses the flat relation (falls back)
    VersionedTable.deleteKeys(spark, p, Seq(11L).toDF("k"), "k")
    assert(VersionedTable.readIndexed(spark, p, "k").isEmpty,
      "a deletion-vectored snapshot must not expose the flat relation")
  }
}
