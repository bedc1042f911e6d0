package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regressions for the properties that matter at 100 TB but
  * that no row-level oracle can catch: filters reaching the parquet scan,
  * columns pruned at the reader, dimension joins broadcast, map-side
  * fingerprints staying shuffle-free. Each assertion pins a shape the
  * round-2/3 plan audits established; a refactor that silently loses one
  * fails here, not in production.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()
  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("filter and projection push down to the documents parquet scan") {
    import org.apache.spark.sql.functions._
    val df = Tables.documents(spark, dir)
      .filter(col("lang") === "en").select("doc_id", "lang")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"filter not pushed:\n$plan")
    // reader schema holds ONLY the projected columns — not `text`
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      s"projection not pruned: $readSchema")
  }

  test("dimension lookups plan as broadcast joins, not sort-merge") {
    val plan = physical(SparkEntry.queries("j1_broadcast_lookup")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("brute-force cosine topK broadcasts the query side only") {
    val plan = physical(SparkEntry.queries("x1_cosine_topk")(spark, dir))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("simhash fingerprints stay map-side: no Exchange before the sort") {
    import org.apache.spark.sql.functions._
    // the gated d4 query ends in orderBy (one Exchange by construction);
    // assert the FINGERPRINT computation itself adds none
    val df = graft.dedup.SimHash.fingerprints(
      Tables.documents(spark, dir), "doc_id", "text")
    val upstream = physical(df)
    assert(upstream.split("Exchange").length <= 2, // only the final rangepartition allowed
      s"simhash added a shuffle:\n$upstream")
  }

  test("global top-k plans as TakeOrderedAndProject with zero exchanges") {
    val plan = physical(SparkEntry.queries("o3_global_topk")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("DSIR selection is distributed: TakeOrderedAndProject, no single-partition exchange") {
    import org.apache.spark.sql.functions._
    // the r12 verdict's one scale-killer: an un-partitioned row_number
    // window would shuffle the ENTIRE scored pool into one task. The
    // shared Dsir.selectScored tail must keep the corpus-sized rank as a
    // distributed top-k (per-task n-row heaps) — the o3 pattern. Pinned
    // on a bare scored frame so the assertion sees ONLY the selection
    // stage (the LM-totals branches of the full c13 plan contain
    // legitimate 1-row global aggregates).
    val scored = spark.range(1000).select(col("id").as("doc_id"),
      (col("id") % 7).as("n_tokens"), (col("id") * 13 % 997).as("lr_micro"))
    val plan = physical(graft.text.Dsir.selectScored(scored, "doc_id", 100))
    assert(plan.contains("TakeOrderedAndProject"),
      s"DSIR selection lost the distributed top-k:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"DSIR selection funnels through one partition:\n$plan")
    // the full c13 gate rides the same tail
    val gate = physical(SparkEntry.queries("c13_dsir_select")(spark, dir))
    assert(gate.contains("TakeOrderedAndProject"),
      s"c13 gate lost the distributed top-k:\n$gate")
  }

  test("a3_config: entry fan-out broadcasts, config filter stays in codegen") {
    // the driver-host drift question (r10 0.83 s → r12 2.15 s,
    // adjudicated as host scaling three rounds running) becomes
    // mechanically answerable: this pins the plan shape, so a future
    // drift with this test green is HOST, not a plan regression.
    val plan = physical(SparkEntry.queries("a3_config_filter")(spark, dir))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"entry fan-out no longer broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a3_config gained a sort-merge join:\n$plan")
    // the tolerance filter is a native forall Column — a Scala UDF here
    // would break whole-stage codegen on the fan-out (the hot path at
    // scale); the initial AQE plan prints no codegen spans, so pin the
    // expression kind instead
    assert(plan.contains("forall"),
      s"config filter is no longer the native forall Column:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"config filter left codegen (UDF in the fan-out):\n$plan")
  }

  test("group-aggregates run partial map-side combine before the shuffle") {
    val plan = physical(SparkEntry.queries("q1_agg")(spark, dir))
    // two HashAggregate nodes (partial + final) around one Exchange
    assert(plan.split("HashAggregate").length >= 3, plan)
  }

  test("t17 heavy hitters: candidates broadcast into a semi join; MG agg combines map-side") {
    val plan = physical(SparkEntry.queries("t17_heavy_hitters")(spark, dir))
    // the corpus meets the candidate set as a broadcast LeftSemi — the
    // full-vocabulary groupBy never shuffles token strings
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidates not a broadcast semi join:\n$plan")
    // the MG summary itself runs partial+final (mergeable, combine-enabled)
    assert(plan.split("mg_summary").length >= 3,
      s"mg_summary not partial-aggregated:\n$plan")
  }

  test("default IVF centroid path carries (sum,count) state — no collect_list") {
    val df = graft.similarity.Cosine.cellCentroids(
      Tables.embeddings(spark, dir), "label", "embedding")
    val plan = physical(df)
    assert(!plan.contains("collect_list"), s"default centroids collect values:\n$plan")
    // avg is codegen'd HashAggregate; collect_list would force ObjectHashAggregate
    assert(plan.contains("HashAggregate") && !plan.contains("ObjectHashAggregate"), plan)
    // numerically the two paths agree to the rounding the API exposes
    val a = df.collect().map(r => (r.get(0).toString, r.getLong(1)) -> r.getDouble(2)).toMap
    val b = graft.similarity.Cosine.cellCentroidsSorted(
        Tables.embeddings(spark, dir), "label", "embedding")
      .collect().map(r => (r.get(0).toString, r.getLong(1)) -> r.getDouble(2)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-5, s"$k: $v vs ${b(k)}") }
  }

  test("hive-style partitioned writes prune directories at read time") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    val out = s"$tmp/docs"
    try {
      Tables.documents(spark, dir).write.partitionBy("lang").parquet(out)
      val df = spark.read.parquet(out).filter(col("lang") === "en")
      val plan = formatted(df)
      // the lang predicate becomes a PartitionFilters entry on the scan —
      // non-matching directories are never opened, the storage-layout
      // analogue of row-group pushdown
      assert(plan.contains("PartitionFilters") &&
        plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(lang"),
        s"no partition pruning:\n$plan")
      val expected = Tables.documents(spark, dir).filter(col("lang") === "en").count()
      assert(df.count() == expected)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("t18 LM join: vocabulary side broadcast, scalars in-plan, no cartesian blowup") {
    val plan = physical(SparkEntry.queries("t18_unigram_logprob")(spark, dir))
    // the (tot, V) scalars enter as a 1-row broadcast nested-loop cross —
    // the only NLJ allowed; the token join itself must be a hash join
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("c6 mixing: factors broadcast back onto the corpus, corpus never re-shuffled") {
    val plan = physical(SparkEntry.queries("c6_mixture_weights")(spark, dir))
    // the per-source factor frame (dozens of rows) joins the per-doc frame
    // as a broadcast hash join — a sort-merge here would shuffle the corpus
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x10 ADC: codebook and query side broadcast; corpus side streams") {
    val plan = physical(SparkEntry.queries("x10_pq_adc_topk")(spark, dir))
    // 1-row codebook map + tiny query frame: both broadcast; the corpus
    // scan feeds the scoring join without an exchange of its own rows
    assert(plan.split("BroadcastExchange").length >= 3, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("d10 band join is an equi join on (band, band_hash) — never a nested loop") {
    val plan = physical(SparkEntry.queries("d10_cross_snapshot_dedup")(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("c8 first-occurrence is an aggregate, not a corpus window sort") {
    val plan = physical(SparkEntry.queries("c8_paragraph_dedup")(spark, dir))
    // min(struct) winners + doc reassembly: HashAggregates with partial
    // (merge) phases; the only Window would be a corpus-wide row_number
    assert(!plan.contains("Window"), s"c8 fell back to a window sort:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("c10 bloom state reaches the probe as a scalar subquery, not a row column") {
    val df = SparkEntry.queries("c10_paragraph_bloom")(spark, dir)
    val plan = physical(df)
    // the c5 lesson: the 512KB filter must be a runtime constant
    // (scalar-subquery), never carried per-row through a join
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"bloom state not a scalar subquery:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x15 probe selection broadcasts the centroid table") {
    val plan = physical(SparkEntry.queries("x15_ivf_multiprobe")(spark, dir))
    // centroid table is k·dim values: the probe cross join must be a
    // broadcast, and candidate matching an equi join on the cell key
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("t27 bottom-k sample plans as TakeOrderedAndProject - no sort, no shuffle") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
    val plan = physical(graft.ops.BottomK.sample(docs, "doc_id", 64))
    assert(plan.contains("TakeOrderedAndProject"), s"not a k-heap plan:\n$plan")
    // the table loader's round-robin spread is fine; a rangepartition
    // (global sort) or hashpartition (shuffle) would mean the k-heap
    // shape was lost
    assert(!plan.contains("rangepartitioning") && !plan.contains("hashpartitioning"),
      s"bottom-k sorted/shuffled:\n$plan")
  }

  test("x17 whitening stats arrive as a broadcast, corpus side never re-shuffles") {
    val plan = physical(SparkEntry.queries("x17_whiten")(spark, dir))
    // the one-row (means, sds) frame must be broadcast into the corpus
    // map side; the only Exchange allowed upstream of the final orderBy
    // is the stats aggregation itself
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x16 projection planes are plan literals: map-side only, zero joins") {
    val plan = physical(graft.similarity.Cosine.randomProject(
      Tables.embeddings(spark, dir), "vec_id", "embedding", 16, 64))
    assert(!plan.contains("Join"), s"projection introduced a join:\n$plan")
    assert(!plan.contains("rangepartitioning") && !plan.contains("hashpartitioning"),
      s"projection sorted/shuffled:\n$plan")
  }

  test("r2 fusion layer: contributions union into one aggregate keyed (query, doc)") {
    val plan = physical(SparkEntry.queries("r2_hybrid_rrf")(spark, dir))
    assert(plan.contains("Union"), s"fusion lost the union shape:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("t26 per-source signatures combine map-side before their shuffle") {
    val plan = physical(SparkEntry.queries("t26_source_overlap")(spark, dir))
    // the 16-min aggregate must run partially before the Exchange (the
    // whole point: per-source state is 128 B no matter the corpus)
    assert(plan.contains("partial_min"),
      s"no map-side partial min before the shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("r4 append-index search: map-side partial aggs, no corpus cartesian") {
    val plan = physical(SparkEntry.queries("r4_bm25_increment")(spark, dir))
    // the df merge and stats sums must combine map-side before their
    // exchanges; the only nested-loop is the broadcast 1-row stats stamp
    assert(plan.contains("partial_sum"), s"df/stats merge not partial:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x18 appended-index search: centroid table broadcast, no corpus cartesian") {
    val plan = physical(SparkEntry.queries("x18_ivf_append")(spark, dir))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"centroids not broadcast into probe selection:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("x8 sizing count + pair stage share ONE corpus scan (cached projection)") {
    import org.apache.spark.sql.functions._
    // the x8 shape: the sizing count() materializes the persisted
    // projection, so config derivation and the pair stage both read the
    // cache — a second parquet pass over 100 TB for one scalar is the
    // r8 plan-audit finding this pins closed
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nPlanes = graft.similarity.Cosine.autoPlanes(emb.count())
      val pairs = graft.similarity.Cosine.srpPairsMulti(emb, "vec_id",
        "embedding", threshold = 0.4, nPlanes = nPlanes, dim = 64,
        nTables = graft.similarity.Cosine.autoTables(nPlanes))
      // walk the tree (collect does NOT descend into InMemoryRelation's
      // cached build recipe — exactly right: that scan ran once, at the
      // sizing count): every leaf must be a cache read, zero file scans
      val exec = pairs.queryExecution.sparkPlan
      val fileScans = exec.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      val cacheScans = exec.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s }
      assert(cacheScans.nonEmpty,
        s"pair stage not reading the cached projection:\n$exec")
      assert(fileScans.isEmpty,
        s"pair stage re-scans parquet despite the cache:\n$exec")
    } finally emb.unpersist()
  }

  test("r7 tombstoned-index search: only index files scanned, corpus text never read") {
    import org.apache.spark.sql.functions._
    // serving contract: delete + search run entirely from the STORED
    // index — a plan that reaches back to the corpus parquet would drag
    // 100 TB of text into every delete
    val docs = Tables.documents(spark, dir)
    val idxDir = java.nio.file.Files.createTempDirectory("graft_r7_plan").toString
    graft.text.Bm25.writeIndex(
      graft.text.Bm25.buildIndex(docs, "doc_id", "text"), idxDir)
    val sp = spark; import sp.implicits._
    val tomb = Seq(1L, 2L).toDF("doc_id")
    val deleted = graft.text.Bm25.deleteFromIndex(tomb,
      graft.text.Bm25.readIndex(sp, idxDir), "doc_id")
    val out = graft.text.Bm25.searchIndex(
      Seq((999L, "alpha beta gamma")).toDF("doc_id", "text"),
      deleted, "doc_id", "text", k = 5)
    val scanned = out.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("graft_r7_plan")),
      s"tombstoned search escaped the stored index: $scanned")
  }

  test("rep-index stored search prunes to the probe's (band, pbucket) partitions") {
    import org.apache.spark.sql.functions._
    // the stored-side half of the d17 wall-clock story: bands persist
    // partitioned by (band, pbucket = band_hash % ProbeBuckets);
    // searchStored collects the probe's pairs and applies them as STATIC
    // literal partition filters — the listing itself skips every other
    // directory. (Round 12 finding: the former dynamicpruning join-key
    // filter looked right in the initial plan but degraded to a full
    // 64/64-partition scan at runtime whenever the probe lineage was
    // cached or the build side flipped — literal filters cannot.)
    val docs = Tables.documents(spark, dir)
    val sharr = graft.dedup.MinHash.hashedShingleArray(docs, "doc_id", "text", 2)
    val st = graft.dedup.RepIndex.build(sharr, "doc_id")
    val repDir = java.nio.file.Files.createTempDirectory("graft_rep_dpp").toString
    graft.dedup.RepIndex.write(st, repDir)
    val probe = graft.dedup.MinHash.hashedShingleArray(
      docs.filter(col("doc_id") < 2), "doc_id", "text", 2)
    val out = graft.dedup.RepIndex.searchStored(spark, probe, repDir, "doc_id")
    // the band scan's PartitionFilters carry literal (band = b AND
    // pbucket = p) disjuncts, not merely isnotnull guards
    val scanLine = out.queryExecution.executedPlan.toString().linesIterator
      .find(l => l.contains("FileScan") && l.contains("/bands"))
      .getOrElse(fail("no bands FileScan in the stored-search plan"))
    assert("""pbucket#\d+ = \d+""".r.findFirstIn(scanLine).isDefined,
      s"stored band scan carries no literal partition filter:\n$scanLine")
    // and the pruned path returns exactly what the canonical path does
    val viaRead = graft.dedup.RepIndex.search(probe,
      graft.dedup.RepIndex.read(spark, repDir), "doc_id")
    assert(out.collect().toSet == viaRead.collect().toSet)
  }

  test("prefix stored search: stage 1 reads ONLY the prefix column; rerank prunes by literals") {
    import org.apache.spark.sql.functions._
    // the two pruning axes of the stored Matryoshka layout: stage 1's
    // corpus-wide scan must read p/dim of the vector bytes (column
    // pruning — stage 1 runs eagerly inside prefixTopKStored, so pin its
    // shape through the rerank plan's ABSENCE of a prefix read), and
    // stage 2's full-vector scan must carry LITERAL pbucket partition
    // filters plus a pushed neighbor-id In filter from the materialized
    // shortlist. (Round 12: the former (pbucket, id) join relied on
    // dynamic partition pruning, which measurably degraded to
    // dynamicpruningexpression(true) at runtime — every bucket read.)
    val emb = Tables.embeddings(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_prefix_plan").toString
    graft.similarity.Cosine.writePrefixIndex(emb, "vec_id", "embedding", 16, tmp)
    // stage-1 plan shape: the shortlist's own scan reads prefix, not full
    val s1 = formatted(spark.read.parquet(s"$tmp/vectors")
      .select(col("vec_id"), col("prefix")))
    val s1schema = s1.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(s1schema.contains("prefix") && !s1schema.contains("full"),
      s"stage-1 scan reads full vectors: $s1schema")
    val out = graft.similarity.Cosine.prefixTopKStored(spark,
      emb.filter(col("vec_id") < 3), tmp, "vec_id", "embedding", k = 5)
    val scanLine = physical(out).linesIterator
      .find(l => l.contains("FileScan") && l.contains("/vectors"))
      .getOrElse(fail("no vectors FileScan in the rerank plan"))
    assert("""pbucket#\d+ (INSET|IN) """.r.findFirstIn(scanLine).isDefined,
      s"rerank scan carries no literal partition filter:\n$scanLine")
    assert(scanLine.contains("PushedFilters") && scanLine.contains("In(vec_id"),
      s"rerank scan pushes no id filter:\n$scanLine")
    // and the pruned plan returns exactly what the inline form does
    val inline = graft.similarity.Cosine.prefixTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", p = 16, k = 5)
    assert(out.collect().toSet == inline.collect().toSet)
  }

  test("sq8TopK: quantized stage broadcasts queries; exact rerank broadcasts the shortlist") {
    import org.apache.spark.sql.functions._
    // the corpus is never shuffled: stage 1 is a broadcast of the query
    // side over the packed-code scan, stage 2 a broadcast of the
    // |q|·kShort shortlist over the raw-vector scan — no SortMergeJoin
    // (a corpus-wide shuffle) anywhere
    val emb = Tables.embeddings(spark, dir)
    val plan = physical(graft.similarity.Cosine.sq8TopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding",
      dim = 64, k = 5))
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("c12 semantic decontamination is candidate-bounded: no train×eval cartesian") {
    // the r10 verdict's wrong #1: the old plan crossJoined train×eval —
    // ~10^13 cosine evaluations at 100 TB train × a 1M-chunk eval suite.
    // The bounded plan SRP-bands both sides and equi-joins on (t, b);
    // every join in the plan must be hash-keyed, never a nested loop
    val plan = physical(SparkEntry.queries("c12_semantic_decontaminate")(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("segmented index read: N segments = ONE multi-path scan per component") {
    val sp = spark; import sp.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_seg_plan").toString
    val sink = graft.streaming.StreamingIndexMaintenance
      .indexSink(sp, dir2, "doc_id", "text") _
    sink(Seq((1L, "quick brown fox"), (2L, "lazy dog")).toDF("doc_id", "text"), 0L)
    sink(Seq((3L, "sleepy fox")).toDF("doc_id", "text"), 1L)
    sink(Seq((4L, "cooking recipe")).toDF("doc_id", "text"), 2L)
    val idx = graft.streaming.StreamingIndexMaintenance.readLatest(sp, dir2)
    // 3 segments must NOT plan as a 3-way union of scans: the multi-path
    // parquet read is one scan node whose location lists 3 roots
    val scans = idx.postings.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.size == 1, s"postings read is ${scans.size} scans, want 1")
    assert(scans.head.relation.location.rootPaths.size == 3,
      s"expected 3 segment roots: ${scans.head.relation.location.rootPaths}")
  }
}
