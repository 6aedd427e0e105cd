package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality diagnostics: prints the load-bearing lines
  * (joins/exchanges/pushdown) of each headline query's physical plan.
  * Run: sbt "runMain graft.Plans [sfDir]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(tag: String, df: DataFrame, pats: Seq[String]): Unit = {
      val s = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"==== $tag")
      s.linesIterator
        .filter(l => pats.exists(l.contains))
        .take(16)
        .foreach(println)
    }

    val joiny = Seq("Join", "Exchange", "PushedFilters", "PartitionFilters")
    show("q5_join", operators.Relational.q5Join(spark, sf), joiny)
    show("geo_query_box", operators.GeoOps.geoQueryBox(spark, sf),
      Seq("PushedFilters", "ReadSchema", "Filter (", "Scan"))
    show("crossovers", operators.Crossovers.crossovers(spark, sf),
      Seq("Join", "Exchange", "Window"))
    show("cosine_topk", operators.Similarity.cosineTopk(spark, sf), joiny)
    show("jaccard", operators.Dedup.jaccard(spark, sf), Seq("Join", "Exchange"))
    show("q1_agg", operators.Relational.q1Agg(spark, sf),
      Seq("HashAggregate", "Exchange", "PushedFilters"))
    show("minhash_lsh", operators.Dedup.minhashLsh(spark, sf), joiny)
    show("simhash_pairs", operators.Dedup.simhashPairs(spark, sf), joiny)
    show("ann_ivf", operators.Similarity.annIvf(spark, sf), joiny)
    show("project_epsg", operators.Projections.projectEpsg(spark, sf),
      Seq("Scan", "ReadSchema", "WholeStageCodegen"))
    show("char_ngrams (native)", operators.TextOps.charNgrams(spark, sf),
      Seq("Exchange", "top_trigram", "WholeStageCodegen"))
    show("fingerprint (native)", operators.TextOps.fingerprint(spark, sf),
      Seq("Exchange", "min_shingle_hash", "WholeStageCodegen"))
    show("token_rarity", operators.TextOps.tokenRarity(spark, sf), joiny)
    show("span_dedup", operators.TextOps.spanDedup(spark, sf),
      Seq("HashAggregate", "Exchange", "Expand"))
    show("raster_rgb", operators.RasterOps.rasterRgb(spark, sf), joiny)
    show("asof_join (no join nodes)", operators.TemporalJoins.asofAttribution(spark, sf),
      Seq("Join", "Exchange", "Window"))
    show("range_join", operators.TemporalJoins.rangeAttribution(spark, sf), joiny)
    show("rep_ngrams (native)", operators.CorpusOps.repetition(spark, sf),
      Seq("Exchange", "word_gram_stats", "WholeStageCodegen"))
    show("contamination", operators.CorpusOps.contamination(spark, sf), joiny)
    show("sample (map-side)", operators.CorpusOps.sample(spark, sf),
      Seq("Exchange", "Scan", "PushedFilters"))
    show("zorder (map-side)", operators.GeoOps.zorderKey(spark, sf),
      Seq("Exchange", "Scan", "WholeStageCodegen"))
    show("dup_clusters (post-CC rollup)", operators.Components.dupClusters(spark, sf),
      Seq("Join", "Exchange"))
    show("hilbert (map-side)", operators.GeoOps.hilbertKey(spark, sf),
      Seq("Exchange", "Scan", "WholeStageCodegen"))
    show("q13_histogram", operators.Relational.q13Histogram(spark, sf), joiny)
    show("q21_waiting (semi+anti)", operators.Relational.q21Waiting(spark, sf), joiny)
    show("funnel", operators.Relational.funnel(spark, sf), joiny)
    show("pipeline_e2e", operators.CorpusOps.pipeline(spark, sf), joiny)
    show("modality_audit", operators.Similarity.modalityAudit(spark, sf), joiny)
    show("bpe_encode (pinned merges, map-side)", operators.Bpe.bpeEncodeStats(spark, sf),
      Seq("Exchange", "Scan", "WholeStageCodegen"))
    show("curve_query (BIGMIN key-range pushdown)", operators.GeoOps.curveQuery(spark, sf),
      Seq("PushedFilters", "ReadSchema", "Scan", "Filter ("))
    show("box_time (manifest t0/t1 file pruning)", operators.GeoOps.boxTime(spark, sf),
      Seq("PushedFilters", "ReadSchema", "Scan", "Filter ("))
    show("q7_nations (two-aliased-dim broadcasts)", operators.Relational.q7Nations(spark, sf), joiny)
    show("json_props (codegen'd from_json)", operators.Relational.jsonProps(spark, sf),
      Seq("HashAggregate", "Exchange", "WholeStageCodegen", "Scan"))
    show("json_nested (nested from_json + lateral explode, map-side)",
      operators.Relational.jsonNested(spark, sf),
      Seq("Generate", "HashAggregate", "Exchange", "WholeStageCodegen"))
    show("tfidf (broadcast N, tok-keyed join, per-doc window)",
      operators.CorpusOps.tfidf(spark, sf),
      Seq("Join", "Exchange", "Window", "HashAggregate"))
    show("index_merge (partial-index union + re-agg)",
      operators.GeoOps.indexMerge(spark, sf),
      Seq("Union", "HashAggregate", "Exchange"))
    show("dem_anomaly (broadcast DEM grid, one window + one rollup)",
      operators.DateOps.demAnomaly(spark, sf),
      Seq("BroadcastHashJoin", "Window", "HashAggregate", "PushedFilters"))
    show("minmax_box (manifest z-stats pushdown; boundary leg only)",
      operators.GeoOps.minmaxBox(spark, sf),
      Seq("Scan", "HashAggregate", "Union", "Exchange"))
    show("delete_box (tombstone anti-join after pruning)",
      operators.GeoOps.deleteBox(spark, sf),
      Seq("Join", "Exchange", "PushedFilters"))
    show("upsert_pos read-back (positional (file,row) anti-join on the pruned path)",
      operators.GeoOps.upsertPosBox(spark, sf),
      Seq("Join", "Exchange", "PushedFilters", "row_index"))
    show("self_xover ((track,pass) pair key; same equi-join cell machinery)",
      operators.Crossovers.selfCrossovers(spark, sf),
      Seq("Join", "Exchange", "Window"))
    show("xover_replay (pinned asOf file-list read; post-pin commits planned away)",
      operators.Crossovers.xoverReplay(spark, sf),
      Seq("Scan", "Join", "Exchange", "PushedFilters"))
    show("fpb_glitch (predicate reaches the scan)",
      operators.TrackOps.fpbGlitch(spark, sf),
      Seq("Scan", "PushedFilters", "Filter ("))
    show("id_probe (bloom-pruned file list; In pushed to the scan)",
      operators.GeoOps.idProbe(spark, sf),
      Seq("Scan", "PushedFilters", "Filter ("))
    show("multi_probe ((id,user) filter intersection; file list pre-pruned)",
      operators.GeoOps.multiProbe(spark, sf),
      Seq("Scan", "PushedFilters", "Filter ("))
    show("upsert_str read-back (lexicographic [k0,k1] prune, string keys)",
      operators.GeoOps.upsertStr(spark, sf),
      Seq("Scan", "PushedFilters", "Filter ("))
    show("query_latlon (projected probes -> bin-set semi-join)",
      operators.GeoOps.queryLatLonQ(spark, sf), joiny)
    show("time_curve (t-major layout: disjoint [t0,t1] file runs)",
      operators.GeoOps.timeCurve(spark, sf),
      Seq("Scan", "PushedFilters", "Filter ("))
    show("scoped_compact read-back (BIGMIN ranges on the partly-rewritten layout)",
      operators.GeoOps.scopedCompact(spark, sf),
      Seq("Scan", "PushedFilters", "Filter ("))
    show("geotiff_dem (binaryFile granule decode -> broadcast bilinear)",
      operators.RasterOps.geotiffDem(spark, sf), joiny)
    show("sql_box (DSv2 face: exact pushed filters, NO re-filter above the scan)",
      operators.GeoOps.sqlBox(spark, sf),
      Seq("BatchScan", "GraftScan", "Filter (", "Exchange"))
    show("sql_agg (aggregate pushdown: GraftAggScan partials + final merge)",
      operators.GeoOps.sqlAgg(spark, sf),
      Seq("BatchScan", "GraftAggScan", "HashAggregate", "Exchange"))
    show("sql_dim_join (runtime In-filter reaches the DSv2 scan)",
      operators.GeoOps.sqlDimJoin(spark, sf),
      Seq("BatchScan", "GraftScan", "Join", "dynamicpruning", "RuntimeFilters"))
    show("sql_key_probe (61z26: string key range -> manifest [k0,k1] file prune)",
      operators.GeoOps.sqlKeyProbe(spark, sf),
      Seq("BatchScan", "GraftScan", "Filter (", "Exchange"))
    show("sql_ddl_key (61z32: DDL keyed CDC table, composite leading-prefix prune after SQL UPDATE)",
      operators.GeoOps.sqlDdlKey(spark, sf),
      Seq("BatchScan", "GraftScan", "Filter (", "Exchange"))
    show("sql_limit (61z33: LIMIT file-plan truncation; no Filter above the scan)",
      operators.GeoOps.sqlLimit(spark, sf),
      Seq("BatchScan", "GraftScan", "Limit", "Filter ("))
    show("sql_topk (61z34: key-ordered TopN file truncation; Spark's sort does the final cut)",
      operators.GeoOps.sqlTopk(spark, sf),
      Seq("BatchScan", "GraftScan", "TakeOrdered", "Sort", "Filter ("))
    show("sql_spj (61z35: storage-partitioned join; co-partitioned bucketed scans, ZERO Exchange)",
      operators.GeoOps.sqlSpj(spark, sf),
      Seq("BatchScan", "GraftScan", "Join", "Exchange", "Sort"))
    show("bucket_probe (61z36: IN(keys) -> bucket-id file prune, append-proof)",
      operators.GeoOps.bucketProbe(spark, sf),
      Seq("BatchScan", "GraftScan", "Filter (", "Exchange"))
    show("sql_mor_count (61z19: manifest n_rows - doomed served unopened; boundary scans only)",
      operators.GeoOps.sqlMorCount(spark, sf),
      Seq("BatchScan", "GraftAggScan", "HashAggregate", "Exchange"))
    show("sql_mor_minmax (61z37: MIN/MAX under pending deletes — innocent files stats-served, doomed files scan)",
      operators.GeoOps.sqlMorMinMax(spark, sf),
      Seq("BatchScan", "GraftAggScan", "HashAggregate", "Exchange"))
    show("sql_topk2 (61z38: composite leading-prefix TopN through the struct stats)",
      operators.GeoOps.sqlTopk2(spark, sf),
      Seq("BatchScan", "GraftScan", "TakeOrdered", "Sort", "Filter ("))
    show("sql_ddl_curve (61z39: DDL curve table, BIGMIN box decomposition on SQL-created files)",
      operators.GeoOps.sqlDdlCurve(spark, sf),
      Seq("BatchScan", "GraftScan", "Filter (", "Exchange"))
    show("sql_asof_mor (61z17: pinned read, epoch-sliced tombstone subtraction in the readers)",
      operators.GeoOps.sqlAsOfMor(spark, sf),
      Seq("BatchScan", "GraftScan", "Filter (", "Exchange"))

    // streaming scan: the LAST EXECUTED micro-batch's physical plan
    // (a streaming df has no batch plan to explain before execution) —
    // changelog mode, so both partition arms are exercised
    locally {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("plansstream").toString
      val df = spark.range(500).select($"id",
        ($"id" % 50 * 25.0).as("x"), ($"id" % 37 * 25.0).as("y"),
        $"id".cast("double").as("z"))
      graft.sources.GeoParquet.write(df, dir, 250.0)
      graft.sources.GeoParquet.writeManifest(spark, dir)
      graft.sources.GeoParquet.deleteWhere(spark, dir,
        org.apache.spark.sql.functions.col("id") < 20)
      val q = spark.readStream.format("graft").option("changelog", "true")
        .load(dir)
        .writeStream.format("memory").queryName("plans_stream").start()
      try {
        q.processAllAvailable()
        val buf = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
        println("==== stream_read (61z18/61z21: epoch-range manifest plan, " +
          "insert + delete-retraction partitions)")
        buf.toString("UTF-8").linesIterator
          .filter(l => Seq("MicroBatchScan", "Scan", "Project", "Filter")
            .exists(l.contains))
          .take(8)
          .foreach(println)
      } finally q.stop()
    }

    // SQL mutations: the delta rewrite plan (row-address scan feeding
    // WriteDelta) — EXPLAINed, not executed, on a throwaway layout
    locally {
      import spark.implicits._
      val w = java.nio.file.Files.createTempDirectory("planswh").toString
      spark.conf.set("spark.sql.catalog.plans",
        classOf[graft.sources.v2.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.plans.warehouse", w)
      val df = spark.range(2000).select($"id",
        ($"id" % 50 * 25.0).as("x"), ($"id" % 37 * 25.0).as("y"),
        $"id".cast("double").as("z"))
      graft.sources.GeoParquet.write(df, s"$w/ns/t", 250.0)
      graft.sources.GeoParquet.writeManifest(spark, s"$w/ns/t")
      val plan = spark.sql(
        "EXPLAIN FORMATTED UPDATE plans.ns.t SET z = z + 1 WHERE id % 10 = 0")
        .collect()(0).getString(0)
      println("==== sql_update (delta rewrite: row-address scan -> WriteDelta)")
      plan.linesIterator
        .filter(l => Seq("WriteDelta", "BatchScan", "GraftScan", "_gfile",
          "Filter", "Project").exists(l.contains))
        .take(16).foreach(println)
    }
    spark.stop()
  }
}
