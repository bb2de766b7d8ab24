package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan quality gates (SURVEY §4): these queries must keep the plans
  * that survive a 100× scale-up — filters and projections reaching the
  * parquet scan, small dimensions broadcast, partial (map-side) aggregation,
  * top-k as TakeOrderedAndProject (no global sort), codegen on the hot path.
  * A correctness-green query with the wrong plan fails here.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("search filter: predicates and pruned columns reach the parquet scan") {
    val p = plan(SparkEntry.queries("q_search_filter")(spark, sf))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("LessThan(p_size,25)"), "p_size filter must push down")
    // column pruning: scan must not read unneeded columns like p_brand
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("p_brand") && !readSchema.contains("p_retailprice"),
      s"scan reads too much: $readSchema")
  }

  test("flagship agg: tiny dimensions broadcast; partial+final hash aggregation") {
    val p = plan(SparkEntry.queries("q_flagship_agg")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "nation/region must broadcast")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expect partial+final agg")
  }

  test("native selector: partial ObjectHashAggregate before the host exchange") {
    // the native TypedImperativeAggregate must keep the agg selector's
    // partial-aggregation shape: a map-side ObjectHashAggregate combines each
    // partition's candidates into ≤k-entry heaps BEFORE the host shuffle, so
    // the exchange moves O(hosts×budget) buffers, never O(pending) rows
    val p = plan(SparkEntry.queries("q_frontier_select_native")(spark, sf))
    assert(p.contains("ObjectHashAggregate"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "expect partial+final object hash aggregation")
    // the details section spells the aggregate mode: a partial_ invocation
    // of the native aggregate (printed by its expression nodeName) is the
    // map-side combine itself
    assert(p.contains("partial_topkselectnative"),
      "the native aggregate must run in Partial mode before the exchange")
  }

  test("length stats: one pruned corpus scan, partial percentile aggregation") {
    val p = plan(SparkEntry.queries("q_length_stats")(spark, sf))
    // count scan NODES (formatted mode prints tree line + detail header)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size === 1,
      "exactly one corpus scan")
    // exact percentile is a TypedImperativeAggregate: partial buffers
    // map-side, one shuffle on the (tiny) language key — never a global sort
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Sort "), "no global sort for exact quantiles")
    assert(p.contains("ReadSchema: struct<text:string,lang:string>"),
      "scan must read only text+lang")
  }

  test("top-k revenue: TakeOrderedAndProject, not a global sort") {
    val p = plan(SparkEntry.queries("q_topk_revenue")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("cosine top-k: corpus is not shuffled — broadcast query row + top-k") {
    val p = plan(SparkEntry.queries("q_cosine_topk")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the embeddings scan side must have no Exchange before the join
    assert(!p.contains("SortMergeJoin"), "corpus side must not sort-merge")
  }

  test("token stats: whole-stage codegen covers the row-local HOF pipeline") {
    val p = plan(SparkEntry.queries("q_token_stats")(spark, sf))
    assert(p.contains("codegen id"), p) // formatted mode marks codegen spans with [codegen id : N]
    assert(!p.contains("Exchange"), "row-local op must not shuffle")
    assert(p.contains("asciitokens"),
      "tokenize must compile to the native byte-run scanner, not the regex")
  }

  test("dedup signatures compile to the native fused expressions") {
    // guard against a silent regression to the HOF forms: the signature
    // builders must compile to the fused expressions (one token pass each),
    // and no ArrayAggregate fold may remain on the signature path. Asserted
    // on the builders directly (round 6): the LSH queries materialize their
    // signature projections as eager localCheckpoints, so the natives run
    // during construction and no longer appear in the RETURNED plan — the
    // builders below are the exact Columns those projections are built from
    // (minhashSignature = minhashSignatureFromTokens ∘ tokens; simhash =
    // simhashFromTokens ∘ tokens).
    graft.functions.HashExprs.register(spark)
    val base = spark.range(1).selectExpr("CAST(id AS STRING) AS text")
    val pm = plan(base.select(graft.ops.Dedup.minhashSignature(org.apache.spark.sql.functions.col("text")).as("sig")))
    assert(pm.contains("minhashsig"), "minhash must be the native expression")
    assert(pm.contains("asciitokens"), "tokenize must be native in the LSH path")
    assert(!pm.toLowerCase.contains("aggregate("),
      "no HOF fold may remain on the minhash path")
    val ps = plan(base.select(graft.ops.Dedup.simhash(org.apache.spark.sql.functions.col("text")).as("sh")))
    assert(ps.contains("simhash64"), "simhash must be the native expression")
    spark.catalog.clearCache()
  }

  test("semi/anti existence probes plan as joins, not subquery re-scans") {
    val p = plan(SparkEntry.queries("q_semi_anti")(spark, sf))
    assert(p.contains("LeftAnti") || p.contains("ExistenceJoin"), p)
  }

  test("events window agg: partial aggregation before the exchange") {
    val df = SparkEntry.queries("q_events_window")(spark, sf)
    val p  = plan(df)
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0, p)
  }

  test("text search: query terms probe the posting table as a broadcast join") {
    val p = plan(SparkEntry.queries("q_text_search")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "query terms must broadcast-probe")
    spark.catalog.clearCache()
  }

  test("corpus prep: one documents scan, dedup via partitioned window") {
    val p = plan(SparkEntry.queries("q_corpus_prep")(spark, sf))
    // the only table in this query is documents → every parquet scan node is
    // a documents scan; the single-pass contract means exactly one NODE
    // (formatted mode prints each node twice: tree line + detail header)
    val docScans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(docScans === 1, s"expected exactly one parquet scan node:\n$p")
    assert(p.contains("Window"), "dedup keep-min must be a partitioned window")
  }

  test("ANN probes partition-prune the materialized indexes (no cast over the partition column)") {
    // ADVICE r3: a Cast wrapped around the partition attribute before the
    // probe filter can defeat parquet partition pruning — the documented
    // "reads only nProbe bucket directories" property. The probe must put a
    // real partition filter on the scan.
    import graft.ops.Ann
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = Array.tabulate(Ann.Dims)(i => math.sin(i * 0.37))

    val lshDir = java.nio.file.Files.createTempDirectory("lshprune").toString
    Ann.writeLshIndex(Ann.buildLshIndex(e, planes = 6), lshDir)
    val pLsh = plan(Ann.lshTopkIndexed(Ann.readLshIndex(spark, lshDir), qv,
      planes = 6, nProbe = 4, k = 5))
    assert("""PartitionFilters: \[[^\]]*bucket""".r.findFirstIn(pLsh).isDefined,
      s"LSH probe must carry a partition filter on bucket:\n$pLsh")

    val ivfDir = java.nio.file.Files.createTempDirectory("ivfprune").toString
    val cents  = Ann.trainIvfCentroids(e, nlist = 8)
    Ann.writeIvfIndex(Ann.assignIvfCells(e, cents), ivfDir)
    val pIvf = plan(Ann.ivfTopkIndexed(Ann.readIvfIndex(spark, ivfDir), cents,
      qv, nProbe = 2, k = 5))
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(pIvf).isDefined,
      s"IVF probe must carry a partition filter on cell:\n$pIvf")
  }

  test("prep operators: pruned scans, broadcast offsets, partitioned window") {
    // redact/sample are row-local single scans: no Exchange anywhere, and
    // the scan reads only the columns the query needs
    // (the sub-split sf0.001 file legitimately triggers parallelized()'s
    // round-robin spread — a no-op at scale — so only KEYED shuffles are
    // banned here)
    val pr = plan(SparkEntry.queries("q_redact_pii")(spark, sf))
    assert(!pr.contains("hashpartitioning"), "redaction must have no keyed shuffle")
    val prRead = pr.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!prRead.contains("lang"), s"redaction scan reads too much: $prRead")
    val ps = plan(SparkEntry.queries("q_sample_stratified")(spark, sf))
    assert(!ps.contains("Exchange"), "sampling must be shuffle-free")
    val psRead = ps.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!psRead.contains("text"), s"sampling scan reads too much: $psRead")
    // packing: the global running sum must be a bucket-PARTITIONED window
    // with the per-bucket offsets broadcast back — one narrow shuffle on
    // the bucket key, never an all-rows-to-one-task window sort
    val pp = plan(SparkEntry.queries("q_pack_sequences")(spark, sf))
    assert(pp.contains("BroadcastHashJoin"), "bucket offsets must broadcast")
    assert(pp.contains("Window"), pp)
    val winParts = pp.linesIterator.filter(_.contains("partitionBy")).toSeq
    assert(winParts.isEmpty || winParts.forall(_.contains("__b")), pp)
  }

  test("repetition/decontamination/domain-mix: single scan, broadcast eval, partitioned quota window") {
    // repetition: ONE documents scan (token stats row-local, both gram
    // profiles ride a single tagged explode), partial+final aggregation
    val rp = plan(SparkEntry.queries("q_repetition_stats")(spark, sf))
    assert("""\(\d+\) Scan parquet""".r.findAllIn(rp).size === 1,
      s"repetition stats must scan the corpus once:\n$rp")
    assert("HashAggregate".r.findAllIn(rp).size >= 2, "expect partial+final agg")
    val rpRead = rp.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!rpRead.contains("lang") && !rpRead.contains("source"),
      s"repetition scan reads too much: $rpRead")
    // decontamination: eval grams must BROADCAST (benchmark sets are tiny
    // next to the corpus) and the shared gram projection must be persisted
    // so the corpus is scanned once across the eval/train branches
    val pd = SparkEntry.queries("q_decontaminate")(spark, sf)
    val dp = plan(pd)
    assert(dp.contains("BroadcastHashJoin"), "eval gram set must broadcast")
    // materialized as an eager localCheckpoint (round 6) → ExistingRDD
    // scan; a persisted (InMemoryRelation) form is also accepted
    assert(dp.contains("Scan ExistingRDD") || dp.contains("InMemoryTableScan")
        || dp.contains("InMemoryRelation"),
      s"gram projection must be materialized (single corpus scan):\n$dp")
    spark.catalog.clearCache()
    // domain mix: the quota rank must be a source-PARTITIONED window (local
    // per-domain rank after one hash shuffle, never a global sort)
    val dm = plan(SparkEntry.queries("q_domain_mix")(spark, sf))
    assert(dm.contains("Window"), dm)
    val dmParts = dm.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(dmParts.nonEmpty && dmParts.forall(_.contains("source")), dm)
    val dmRead = dm.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!dmRead.contains("text"), s"domain-mix scan reads too much: $dmRead")
  }

  test("source gate: no unpartitioned windows in main (single-task funnels)") {
    // Window.orderBy without partitionBy moves EVERY row through one task —
    // the crawl-order seq regression the verdict flagged. Gate the whole main
    // source tree: every Window definition must start from Window.partitionBy.
    val srcRoot = new java.io.File("src/main/scala")
    def scalaFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(scalaFiles)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val offenders = scalaFiles(srcRoot).flatMap { f =>
      val text = java.nio.file.Files.readString(f.toPath)
      if (text.contains("Window.orderBy")) Some(f.getPath) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window.orderBy found in: ${offenders.mkString(", ")}")
  }

  test("vector rewrite rule: HOF folds optimize to the native expressions, bit-equal") {
    import org.apache.spark.sql.functions._
    import graft.ops.{Ann, Cluster}
    val qv = array((1 to 64).map(d => lit(math.sin(d.toDouble))): _*)
    def build() = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"),
        Ann.cosineHof(col("v"), qv).as("c"),      // dot/(sqrt*sqrt) of folds
        Cluster.dist2(col("v"), qv).as("d"),      // squared-diff fold
        Ann.dot(col("v"), qv).as("p"))            // product fold
    val before = build().collect()

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.VectorRewrite
    try {
      val df = build()
      val opt = df.queryExecution.optimizedPlan.toString()
      assert(opt.contains("cosinesim"), s"cosine fold must fuse:\n$opt")
      assert(opt.contains("l2dist2"), s"dist2 fold must rewrite:\n$opt")
      assert(opt.contains("dotproduct"), s"dot fold must rewrite:\n$opt")
      assert(!opt.contains("aggregate(zip_with"), s"no HOF fold may remain:\n$opt")
      val after = df.collect()
      assert(after.length === before.length)
      before.sortBy(_.getLong(0)).zip(after.sortBy(_.getLong(0))).foreach {
        case (b, a) =>
          (1 to 3).foreach { i =>
            assert(java.lang.Double.doubleToLongBits(b.getDouble(i)) ===
              java.lang.Double.doubleToLongBits(a.getDouble(i)))
          }
      }
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.VectorRewrite)
    }
  }

  test("vector rewrite rule: HOF minhash array-of-folds fuses, bit-equal incl. null") {
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextOps}
    // HOF form over real corpus tokens plus a NULL token array (the HOF
    // wrapper yields k null lanes there — the rewrite must preserve that)
    def build() = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") =!= 0L, array_distinct(TextOps.tokensRegex(col("text"))))
          .as("toks"))
      .select(col("doc_id"),
        Dedup.minhashSignatureFromTokensHof(col("toks")).as("sig"))
    val before = build().collect()

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.VectorRewrite
    try {
      val df = build()
      val opt = df.queryExecution.optimizedPlan.toString()
      assert(opt.contains("minhashsig"), s"minhash folds must fuse:\n$opt")
      assert(!opt.contains("aggregate("), s"no HOF fold may remain:\n$opt")
      val after = df.collect()
      val bm = before.map(r => r.getLong(0) -> r.getSeq[java.lang.Long](1)).toMap
      assert(after.length === before.length)
      after.foreach { r =>
        assert(r.getSeq[java.lang.Long](1) === bm(r.getLong(0)),
          s"doc ${r.getLong(0)} lanes differ")
      }
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.VectorRewrite)
    }
  }

  test("graft extensions: the injection entry point registers cleanly") {
    // getOrCreate cannot re-extend the shared test session, so exercise the
    // injection surface directly (a fresh SparkSessionExtensions accepts the
    // rule + the three function descriptors without throwing), and evaluate
    // an injected builder's expression interpreted.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = Literal.create(Array(1.0, 2.0))
    val b = Literal.create(Array(1.0, 2.0))
    assert(math.abs(graft.functions.CosineSim(a, b).eval(null)
      .asInstanceOf[Double] - 1.0) < 1e-12)
    assert(graft.functions.L2Dist2(a, b).eval(null).asInstanceOf[Double] === 0.0)
    assert(graft.functions.DotProduct(a, b).eval(null).asInstanceOf[Double] === 5.0)
  }
}
