package graft.examples

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two dedup-infrastructure measurements the round-10 verdict asked for,
  * executed at rehearsal scale (typically `/tmp/sf1`, 500k docs):
  *
  *  1. '''Connected-components engine A/B''' (VERDICT item 2): time
  *     [[Dedup.dupGroups]]'s DataFrame-native large-star/small-star path
  *     against the retired GraphX path on the e11 pair graph, asserting the
  *     label maps are IDENTICAL first — the perf claim only counts because
  *     the outputs are pinned equal.
  *
  *  2. '''Capped-Jaccard empirical recall''' (VERDICT item 4): the
  *     `maxDocFreq` cap's recall contract is test-pinned (a pair is found
  *     iff it reaches the threshold on sub-cap shingles alone) but its cost
  *     on REALISTIC data was unmeasured. On a deterministic hash-sample of
  *     the corpus (uncapped is Σ df² and intentionally not run at full sf1 —
  *     the round-9 rehearsal measured it spilling >75 GB), run capped vs
  *     uncapped at several caps and report: pairs found, true pairs lost,
  *     lost-pair histogram by true-Jaccard band, and the maximum Jaccard
  *     lost. Same for the containment family (e106's cap).
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.examples.DedupProbe /tmp/sf1 0.1"`.
  * Results recorded per round in ROUND_NOTES.md / BASELINE.md.
  */
object DedupProbe {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
    f.delete(): Unit
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val frac = if (args.length > 1) args(1).toDouble else 0.1
    // which sections to run: "cc" (engine A/B), "recall" (capped-vs-uncapped
    // on the hash sample), "captime" (full-corpus capped-Jaccard wall time
    // per cap — the Σ df² sensitivity probe for rehearsal scale)
    val sections = (if (args.length > 2) args(2) else "cc,recall")
      .split(",").map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-probe")
      // partitions scale with DATA, not cores: at the 1000× corpus a
      // 32-partition layout hands each shuffle-hash build task a ~200 MB
      // slice it cannot hold (measured: SHJ memory-acquire failure at 50M
      // docs); the standard sizing rule applies — override upward for the
      // heavy legs (e.g. 256 at 50M docs)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.ops.Layout.repairScanParallelism(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text")))

    // ---- 0. full-corpus cap sensitivity (Σ df² realized under the cap) ----
    if (sections("captime")) {
      Seq(1000, 500, 250, 100).foreach { cap =>
        val t0 = System.nanoTime()
        val n = Dedup.ngramJaccardPairs(docs, minJaccard = 0.5, maxDocFreq = cap).count()
        println(f"[dedup-probe] captime jaccard(0.5) cap=$cap%d: $n%d pairs in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    // ---- 0d. PPJoin prefix-filter A/B (round-13): the exact prefix path
    // vs the declared capped path for the e11/e106 shapes, full corpus at
    // this scale — wall + pair counts (the prefix path must emit a SUPERSET
    // of the capped pairs: it is exact, the cap is a recall contract).
    if (sections("ppjoin")) {
      // GRAFT_PPJOIN_ONLY=substring[,substring…] runs matching legs only —
      // rehearsal-scale comparisons don't re-run known-dead or known-slow
      // legs (the containment prefixFilter leg EXHAUSTS scratch at 5M docs
      // by measurement; re-proving that costs an hour and 58 GB)
      val legFilter = sys.env.get("GRAFT_PPJOIN_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      def timed(tag: String)(f: => Long): Unit =
        if (legFilter.forall(_.exists(tag.contains))) try {
          val t0 = System.nanoTime()
          val n = f
          println(f"[dedup-probe] ppjoin $tag: $n%d pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        } catch {
          case e: Throwable =>
            println(s"[dedup-probe] ppjoin $tag FAILED: ${e.getMessage.take(120)}")
        }
      timed("jaccard(0.8) prefixFilter") {
        Dedup.ngramJaccardPairs(docs, minJaccard = 0.8, prefixFilter = true).count()
      }
      timed("jaccard(0.8) cap=1000") {
        Dedup.ngramJaccardPairs(docs, minJaccard = 0.8, maxDocFreq = 1000).count()
      }
      // round-15 verdict item 6: the e106 witness-counted generator on the
      // symmetric family — A/B against the declared cap path above
      timed("jaccard(0.8) prefixDfCap=1000") {
        Dedup.ngramJaccardPairs(docs, minJaccard = 0.8, prefixDfCap = 1000).count()
      }
      timed("jaccard(0.8) atRisk audit (prefixDfCap=1000)") {
        Dedup.ngramJaccardAtRisk(docs, minJaccard = 0.8, prefixDfCap = 1000).count()
      }
      timed("containment(0.9) prefixFilter") {
        Dedup.ngramContainmentPairs(docs, minContainment = 0.9, prefixFilter = true).count()
      }
      timed("containment(0.9) cap=2000") {
        Dedup.ngramContainmentPairs(docs, minContainment = 0.9, maxDocFreq = 2000).count()
      }
      timed("containment(0.9) prefixDfCap=2000") {
        Dedup.ngramContainmentPairs(docs, minContainment = 0.9, prefixDfCap = 2000).count()
      }
      timed("containment(0.9) atRisk audit (prefixDfCap=2000)") {
        Dedup.ngramContainmentAtRisk(docs, minContainment = 0.9, prefixDfCap = 2000).count()
      }
      // round-15 optimization A/B: the witness CANDIDATE GENERATOR alone
      // (the verify stage downstream is shared and identical), df attached
      // by the legacy full-index window vs the fused groupBy+shuffle_hash
      // join with the cap pushed before the rank shuffle
      val shJ = docs
        .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
      // GRAFT_WITNESSGEN_ORDER reverses the leg order — the order-bias
      // control for the A/B (the last leg runs warmest)
      val stratOrder = Seq("postFilter", "cappedWindow", "dfJoin")
      (if (sys.env.contains("GRAFT_WITNESSGEN_ORDER")) stratOrder.reverse
       else stratOrder).foreach { strat =>
        timed(s"jaccard(0.8) witnessgen cap=1000 dfStrategy=$strat") {
          Dedup.prefixWitnessCands(shJ, 7999L, prefixDfCap = 1000,
            lengthBound = true, dfStrategy = strat).count()
        }
      }
    }

    // ---- 0d2. containment candidate-volume diagnostics (round-14): where
    // the Σ prefix_df·df mass of the prefixDfCap path actually sits, on the
    // e106-shaped corpus (documents + planted half excerpts) — the numbers
    // behind the declared cap choice.
    if (sections("c106diag")) {
      val toks = split(trim(col("text")), "\\s+")
      val kk = greatest(floor(size(toks) / 2), lit(3)).cast("int")
      val exc = docs.select((col("doc_id") + 900000000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), kk)).as("text"))
      val corpus = docs.select(col("doc_id"), col("text")).unionAll(exc)
      val sh = corpus
        .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("g"))
        .where(col("n_sh") > 0)
      val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
      // per-doc df-ordered prefix length for t=0.9: n - ceil(n*0.8999) + 1
      val withDf = sh.join(dfreq, Seq("g"))
      val ranked = withDf
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
            .orderBy(col("gdf"), col("g"))))
        .withColumn("pfx", col("rk") <=
          col("n_sh") - ceil(col("n_sh") * 8999 / lit(10000.0)).cast("int") + 1)
      val bands = ranked.groupBy(
          when(col("gdf") <= 10, "a_df<=10").when(col("gdf") <= 100, "b_df<=100")
            .when(col("gdf") <= 500, "c_df<=500").when(col("gdf") <= 2000, "d_df<=2000")
            .otherwise("e_df>2000").as("band"))
        .agg(count(lit(1)).as("entries"),
          sum(when(col("pfx"), 1L).otherwise(0L)).as("prefix_entries"),
          sum(when(col("pfx"), col("gdf")).otherwise(0L)).as("pair_mass"))
        .orderBy(col("band")).collect()
      bands.foreach(r => println(s"[dedup-probe] c106diag ${r.getString(0)}: " +
        s"entries=${r.getLong(1)} prefix=${r.getLong(2)} sum_prefixdf_x_df=${r.getLong(3)}"))
      Seq(2000, 500, 100).foreach { cap =>
        val atRisk = Dedup.ngramContainmentAtRisk(corpus, minContainment = 0.9,
          prefixDfCap = cap).count()
        println(s"[dedup-probe] c106diag atRisk(cap=$cap) = $atRisk docs")
      }
      // staged spill accounting: which stage of the prefixDfCap path pays
      val spill = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) spill.addAndGet(te.taskMetrics.diskBytesSpilled)
      })
      def leg(tag: String)(f: => Long): Unit = {
        val s0 = spill.get(); val t0 = System.nanoTime()
        val n = f
        println(f"[dedup-probe] c106diag leg $tag%-22s: $n%d rows, " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s, spill ${(spill.get() - s0) / 1000000L}%d MB")
      }
      leg("ranked-entries")(ranked.select(col("id"), col("gdf"), col("pfx")).count())
      // candidate stage replicated with the operator's hashed-key window
      // shape, to split candidate-join cost from exact-verify cost
      locally {
        import org.apache.spark.sql.expressions.Window
        val sh2 = corpus
          .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
          .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("g0"))
          .where(col("n_sh") > 0)
          .select(col("id"), col("n_sh"), xxhash64(col("g0")).as("g"))
        val ranked2 = sh2
          .withColumn("gdf", count(lit(1)).over(Window.partitionBy(col("g"))))
          .withColumn("pos", row_number().over(
            Window.partitionBy(col("id")).orderBy(col("gdf"), col("g"))) - 1)
          .where(col("gdf") <= 2000)
        val alpha = ceil(col("n_sh") * 8999 / lit(10000.0)).cast("int")
        val probe = ranked2.where(col("pos") <= col("n_sh") - alpha)
          .select(col("id").as("id_p"), col("n_sh").as("n_p"), col("pos").as("pos_p"), col("g"))
        val index = ranked2.select(col("id").as("id_i"), col("n_sh").as("n_i"),
          col("pos").as("pos_i"), col("g"))
        leg("candidates-distinct") {
          probe.join(index, Seq("g"))
            .where(col("n_p") < col("n_i") ||
              (col("n_p") === col("n_i") && col("id_p") < col("id_i")))
            .select(least(col("id_p"), col("id_i")).as("id_a"),
              greatest(col("id_p"), col("id_i")).as("id_b"))
            .distinct().count()
        }
        // witness-count histogram under an e-extended prefix: how many
        // candidate pairs would survive a >= min(e+1, alpha) witness filter
        for (e <- Seq(1, 2)) {
          val probeE = ranked2.where(col("pos") <= col("n_sh") - alpha + e)
            .select(col("id").as("id_p"), col("n_sh").as("n_p"),
              col("pos").as("pos_p"), col("g"))
          leg(s"witness>=min(${e + 1},alpha)") {
            probeE.join(index, Seq("g"))
              .where(col("n_p") < col("n_i") ||
                (col("n_p") === col("n_i") && col("id_p") < col("id_i")))
              .groupBy(least(col("id_p"), col("id_i")).as("id_a"),
                greatest(col("id_p"), col("id_i")).as("id_b"))
              .agg(count(lit(1)).as("w"), first(col("n_p")).as("n_p"))
              .where(col("w") >= least(lit(e + 1),
                ceil(col("n_p") * 8999 / lit(10000.0)).cast("int")))
              .count()
          }
        }
      }
      leg("full-operator") {
        Dedup.ngramContainmentPairs(corpus, minContainment = 0.9, prefixDfCap = 2000).count()
      }
    }

    // ---- 0e. rarest-segment A/B for the e18 shape (round-13): classic
    // d+1 layout + bucket cap vs m-segment rarest-k selection (exact),
    // with the hot-bucket audit on both layouts.
    if (sections("edseg")) {
      // GRAFT_EDSEG_ONLY runs a single named leg — an OOM on one layout
      // takes the whole SparkContext with it (measured), so rehearsal-scale
      // comparisons run each leg in its own JVM
      val onlyLeg = sys.env.get("GRAFT_EDSEG_ONLY")
      val layouts = Seq(
        ("classic cap=500", () => Dedup.editDistancePairs(docs, maxDist = 5,
          prefixLen = 40, maxSegmentBucket = 500)),
        // round-14 verdict item 5: Gravano q-gram COUNT prefilter between
        // the candidates and the banded DP — measured A/B vs the plain leg
        ("classic cap=500 qgram=3", () => Dedup.editDistancePairs(docs,
          maxDist = 5, prefixLen = 40, maxSegmentBucket = 500, qgramFilter = 3)),
        ("m=8 k=6 rarest", () => Dedup.editDistancePairs(docs, maxDist = 5,
          prefixLen = 40, nSegments = 8, indexSegments = 6)),
        ("m=8 k=6 rarest cap=500", () => Dedup.editDistancePairs(docs, maxDist = 5,
          prefixLen = 40, nSegments = 8, indexSegments = 6, maxSegmentBucket = 500)),
        ("m=12 k=6 rarest", () => Dedup.editDistancePairs(docs, maxDist = 5,
          prefixLen = 40, nSegments = 12, indexSegments = 6)),
        // round-15: bounded-live-scratch slices — same pairs, the candidate
        // exchange split into K sequential materialized sub-jobs (the 5M-doc
        // guard-kill is LIVE shuffle scratch, not candidate volume)
        ("classic cap=500 slices=8", () => Dedup.editDistancePairs(docs,
          maxDist = 5, prefixLen = 40, maxSegmentBucket = 500,
          candidateSlices = 8)))
      // .iterator: on a strict Seq, takeWhile would evaluate its predicate
      // for every leg BEFORE any runs — only the lazy form actually skips
      // the remaining legs after one kills the SparkContext (ADVICE r14)
      val edSpill = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) edSpill.addAndGet(te.taskMetrics.diskBytesSpilled)
      })
      layouts.iterator.filter(l => onlyLeg.forall(_ == l._1))
        .takeWhile(_ => !spark.sparkContext.isStopped).foreach { case (tag, f) =>
        try {
          val s0 = edSpill.get(); val t0 = System.nanoTime()
          val n = f().count()
          println(f"[dedup-probe] edseg $tag%-24s: $n%d pairs in " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s, spill " +
            f"${(edSpill.get() - s0) / 1000000L}%d MB")
        } catch {
          case e: Throwable =>
            println(s"[dedup-probe] edseg $tag FAILED: ${e.getMessage.take(120)}")
        }
      }
    }

    // ---- 0f. e93 corpus-scaled banding recall (round-13): plant a
    // perturbed near-copy of every embedding (deterministic per-dim hash
    // noise), then measure — at the historical fixed 32 planes and at the
    // autoPlanes(corpus) width — how many planted pairs whose TRUE 4dp
    // cosine clears the 0.95 threshold each width recovers, and the wall.
    // This is the measured trade behind Dedup.autoPlanes' bits rule.
    if (sections("e93band")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val noise = transform(col("embedding"), (_, i) =>
        (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") / lit(500.0)
          - lit(1.0)) * lit(0.10))
      val pert = emb.select((col("vec_id") + 200000000L).as("vec_id"),
        zip_with(col("embedding"), noise, (a, b) => a + b).as("embedding"))
      val corpus = emb.unionAll(pert).localCheckpoint(true)
      val nCorpus = corpus.count()
      // ground truth: planted pairs whose exact 4dp cosine clears 0.95
      val planted = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        .join(pert.select((col("vec_id") - 200000000L).as("id_a"),
          col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_a"))
        .select(col("id_a"), col("id_b"),
          round(graft.ext.Similarity.cosine(col("va"), col("vb")), 4).as("cosine"))
        .where(col("cosine") >= 0.95)
        .localCheckpoint(true)
      val nPlanted = planted.count()
      val auto = Dedup.autoPlanes(nCorpus)
      val (rtPlanes, rtBands) = Dedup.autoBanding(minCosine = 0.95)
      Seq(("fixed-32", 32, 4), (s"auto-$auto", auto, 4),
        (s"recall-$rtPlanes/$rtBands", rtPlanes, rtBands)).foreach { case (tag, np, nb) =>
        val t0 = System.nanoTime()
        val found = Dedup.embeddingNearDupMd5(corpus, minCosine = 0.95,
            nPlanes = np, bands = nb)
          .join(planted.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_semi")
          .count()
        println(f"[dedup-probe] e93band $tag%-14s: recall $found%d/$nPlanted%d " +
          f"(${100.0 * found / math.max(1L, nPlanted)}%.1f%%) over $nCorpus%d vecs " +
          f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }

    // ---- 0f2. multi-word LSH frontier (round-14): at minCosine 0.9 with
    // occupancy-driven minBits=12 (400k+ vectors need >= 2^12 buckets per
    // band for drain), NO single 64-bit signature reaches 95% recall —
    // autoBanding(maxSignatureBits=63) proves it by throwing — while the
    // multi-word form (band keys assembled per band, signature spanning
    // several words) reaches it. Planted pairs carry the e93band harness's
    // 0.1-amplitude noise — on this data that puts the typical planted
    // cosine just above 0.9, i.e. recall is measured AT the threshold,
    // where the banding math is weakest (pairs above it only do better).
    if (sections("e93wide")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val noise = transform(col("embedding"), (_, i) =>
        (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") / lit(500.0)
          - lit(1.0)) * lit(0.10))
      val pert = emb.select((col("vec_id") + 200000000L).as("vec_id"),
        zip_with(col("embedding"), noise, (a, b) => a + b).as("embedding"))
      val corpus = emb.unionAll(pert).localCheckpoint(true)
      val nCorpus = corpus.count()
      val planted = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        .join(pert.select((col("vec_id") - 200000000L).as("id_a"),
          col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_a"))
        .select(col("id_a"), col("id_b"),
          round(graft.ext.Similarity.cosine(col("va"), col("vb")), 4).as("cosine"))
        .where(col("cosine") >= 0.9)
        .localCheckpoint(true)
      val nPlanted = planted.count()
      val singleWord = scala.util.Try(
        Dedup.autoBanding(minCosine = 0.9, targetRecall = 0.95, minBits = 12))
      println(s"[dedup-probe] e93wide single-word autoBanding(0.9, R=0.95, " +
        s"minBits=12): ${singleWord.fold(e => "THROWS: " + e.getMessage.take(80),
          r => r.toString)}")
      // round-15: the ONE-CALL rule — bit floor from the corpus count, wide
      // mode selected automatically (nothing passes maxSignatureBits)
      val (widePlanes, wideBands) = Dedup.autoWideBanding(nCorpus,
        minCosine = 0.9, targetRecall = 0.95)
      println(s"[dedup-probe] e93wide autoWideBanding($nCorpus, 0.9, R=0.95) " +
        s"picked ($widePlanes planes, $wideBands bands) unaided")
      // best single-word fallback at the same bit floor: 4 bands x 13 bits
      Seq(("single-52/4", 52, 4), (s"wide-$widePlanes/$wideBands", widePlanes, wideBands))
        .foreach { case (tag, np, nb) =>
          val t0 = System.nanoTime()
          val found = Dedup.embeddingNearDupMd5(corpus, minCosine = 0.9,
              nPlanes = np, bands = nb)
            .join(planted.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_semi")
            .count()
          println(f"[dedup-probe] e93wide $tag%-14s: recall $found%d/$nPlanted%d " +
            f"(${100.0 * found / math.max(1L, nPlanted)}%.1f%%) over $nCorpus%d vecs " +
            f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        }
    }

    // ---- 0g. span-store economics (round-13): the e116 incremental
    // lifecycle vs the one-shot e24 shape at this scale — build (one-time),
    // 0.1%-batch lookup, append, compact, against repeatedSpans over the
    // same corpus∪batch (what a daily run WITHOUT the store pays). The
    // e115/#103 measurement pattern applied to spans.
    if (sections("spanstore")) {
      // fresh temp dir per run — a fixed path would let concurrent probe
      // runs corrupt each other's store (ADVICE r13)
      val store = java.nio.file.Files
        .createTempDirectory("graft_spanstore_probe").toString
      val batch = docs.where(col("doc_id") % 1000 === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(col("text"), lit(" probe batch suffix tokens")).as("text"))
        .localCheckpoint(true)
      val nBatch = batch.count()
      def timed(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[dedup-probe] spanstore $tag%-18s: $n%d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      timed(s"oneshot(union)") {
        Dedup.repeatedSpans(docs.unionAll(batch), n = 10, minDocs = 2,
          hashSpanKey = true)
          .where(col("doc_id") >= 900000000L).count()
      }
      timed("build") {
        Dedup.buildSpanStore(docs, store, n = 10); 0L
      }
      timed(s"lookup($nBatch)") {
        Dedup.spanStoreLookup(spark, store, batch).count()
      }
      timed("append") {
        Dedup.appendSpanStore(spark, store, batch); 0L
      }
      timed("compact") {
        Dedup.compactSpanStore(spark, store); 0L
      }
      timed(s"lookup-postcompact") {
        Dedup.spanStoreLookup(spark, store,
          batch.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))).count()
      }
    }

    // ---- 0h. the next-decade probe (round-14 verdict item 3): the heavy
    // dedup families at a docs-only 1000× corpus (50M docs — one-hop
    // ScaleUp ×10000 from sf0.1), each leg with wall + spill, run ONE LEG
    // PER JVM via GRAFT_HEAVY_ONLY (an OOM takes the SparkContext with it).
    // The point is to find which audited cap or store breaks FIRST and name
    // the mechanism before a real cluster does.
    if (sections("heavy")) {
      val onlyLeg = sys.env.get("GRAFT_HEAVY_ONLY")
      val spill = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) spill.addAndGet(te.taskMetrics.diskBytesSpilled)
      })
      val legs: Seq[(String, () => Long)] = Seq(
        ("e84 minhashNearDupMd5", () =>
          Dedup.minhashNearDupMd5(docs, minJaccard = 0.8).count()),
        ("e84 bucket audit maxBucket=1000", () => {
          val over = Dedup.minhashBucketOverflow(docs, maxBucket = 1000)
            .agg(count(lit(1)), max(col("n_members")),
              sum(col("n_members") * col("n_members"))).head
          println(s"[dedup-probe] heavy e84 audit: overflow buckets " +
            s"${over.getLong(0)}, largest ${if (over.isNullAt(1)) 0L else over.getLong(1)}, " +
            s"sum members^2 over them ${if (over.isNullAt(2)) 0L else over.getLong(2)}")
          over.getLong(0)
        }),
        ("e84 md5 bucket audit maxBucket=1000", () => {
          val over = Dedup.minhashBucketOverflow(docs, maxBucket = 1000, md5 = true)
            .agg(count(lit(1)), max(col("n_members")),
              sum(col("n_members") * col("n_members"))).head
          println(s"[dedup-probe] heavy e84 md5 audit: overflow buckets " +
            s"${over.getLong(0)}, largest ${if (over.isNullAt(1)) 0L else over.getLong(1)}, " +
            s"sum members^2 over them ${if (over.isNullAt(2)) 0L else over.getLong(2)}")
          over.getLong(0)
        }),
        ("e84 native cap=1000", () =>
          Dedup.minhashNearDupNative(docs, minJaccard = 0.8, maxBucket = 1000).count()),
        ("e84 md5 cap=1000", () =>
          Dedup.minhashNearDupMd5(docs, minJaccard = 0.8, maxBucket = 1000).count()),
        ("e11 jaccard cap=1000", () =>
          Dedup.ngramJaccardPairs(docs, minJaccard = 0.8, maxDocFreq = 1000).count()),
        ("e11 jaccard prefixDfCap=1000", () =>
          Dedup.ngramJaccardPairs(docs, minJaccard = 0.8, prefixDfCap = 1000).count()),
        // round-15: stage-checkpointed witness path — the 50M-doc
        // first-to-break was the ranking windows' + candidate join's
        // shuffle files live TOGETHER; staging serializes the stages
        ("e11 jaccard prefixDfCap=1000 staged", () => {
          val dir = java.nio.file.Files.createTempDirectory("graft_stage11").toString
          try Dedup.ngramJaccardPairs(docs, minJaccard = 0.8,
            prefixDfCap = 1000, stageDir = dir).count()
          finally rmrf(new java.io.File(dir))
        }),
        ("e11 jaccard atRisk audit", () =>
          Dedup.ngramJaccardAtRisk(docs, minJaccard = 0.8, prefixDfCap = 1000).count()),
        ("e106 containment prefixDfCap=2000", () =>
          Dedup.ngramContainmentPairs(docs, minContainment = 0.9,
            prefixDfCap = 2000).count()),
        ("e106 containment prefixDfCap=2000 staged", () => {
          val dir = java.nio.file.Files.createTempDirectory("graft_stage106").toString
          try Dedup.ngramContainmentPairs(docs, minContainment = 0.9,
            prefixDfCap = 2000, stageDir = dir).count()
          finally rmrf(new java.io.File(dir))
        }),
        ("e106 atRisk audit", () =>
          Dedup.ngramContainmentAtRisk(docs, minContainment = 0.9,
            prefixDfCap = 2000).count()),
        ("e18 editdist cap=500", () =>
          Dedup.editDistancePairs(docs, maxDist = 5, prefixLen = 40,
            maxSegmentBucket = 500).count()),
        ("e18 editdist cap=500 slices=16", () =>
          Dedup.editDistancePairs(docs, maxDist = 5, prefixLen = 40,
            maxSegmentBucket = 500, candidateSlices = 16).count()),
        // round-16: candidate-distinct staging (the e11 stageDir discipline
        // ported to PassJoin) — one materialized boundary instead of 16
        // corpus re-reads
        ("e18 editdist cap=500 staged", () => {
          val dir = java.nio.file.Files.createTempDirectory("graft_stage18").toString
          try Dedup.editDistancePairs(docs, maxDist = 5, prefixLen = 40,
            maxSegmentBucket = 500, stageDir = Some(dir)).count()
          finally rmrf(new java.io.File(dir))
        }),
        ("e115 spanstore build", () => {
          val dir = java.nio.file.Files.createTempDirectory("graft_heavy_span").toString
          sys.props.put("graft.heavy.spandir", dir)
          Dedup.buildSpanStore(docs, dir, n = 10); 0L
        }),
        ("e115 spanstore 0.1%-batch lookup+append", () => {
          val dir = sys.props.getOrElse("graft.heavy.spandir",
            java.nio.file.Files.createTempDirectory("graft_heavy_span2").toString)
          if (!new java.io.File(s"$dir/posting").exists)
            Dedup.buildSpanStore(docs, dir, n = 10)
          val batch = docs.where(pmod(xxhash64(col("doc_id")), lit(1000L)) === 0)
            .select((col("doc_id") + 900000000000L).as("doc_id"), col("text"))
            .localCheckpoint(true)
          val n = Dedup.spanStoreLookup(spark, dir, batch).count()
          Dedup.appendSpanStore(spark, dir, batch)
          n
        }))
      // .iterator keeps the stop-check lazy (see the edseg comment).
      // EXACT name match wins when the env value names a leg verbatim —
      // several legs are substring-prefixes of their staged/sliced twins,
      // and an A/B control must be runnable alone in its own JVM
      legs.iterator.filter(l => onlyLeg.forall(o =>
          if (legs.exists(_._1 == o)) l._1 == o else l._1.contains(o)))
        .takeWhile(_ => !spark.sparkContext.isStopped).foreach { case (tag, f) =>
        try {
          val s0 = spill.get(); val t0 = System.nanoTime()
          val n = f()
          println(f"[dedup-probe] heavy $tag%-40s: $n%d rows in " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s, spill " +
            f"${(spill.get() - s0) / 1000000L}%d MB")
        } catch {
          case e: Throwable =>
            println(s"[dedup-probe] heavy $tag FAILED: " +
              s"${Option(e.getMessage).getOrElse(e.getClass.getName).take(160)}")
        }
      }
    }

    // ---- 0i. store-lifecycle rehearsal (round-15 verdict item 5): drive
    // the round-14 compaction triggers through a realistic many-batch
    // append loop — compact WHEN TRIGGERED (not on a guessed cadence),
    // measuring lookup cost right before and right after each compaction,
    // so the trigger rule is validated by measurement, not only by spec.
    if (sections("lifecycle")) {
      val nBatches = sys.env.getOrElse("GRAFT_LIFECYCLE_BATCHES", "20").toInt
      val spanDir = java.nio.file.Files.createTempDirectory("graft_lc_span").toString
      val mhDir = java.nio.file.Files.createTempDirectory("graft_lc_mh").toString
      // base = 10% of the corpus, batches 2% each (disjoint hash slices,
      // ids shifted per batch): posting rows cross the 2× growth trigger
      // near batch 5; part files cross 256 around batch 7 — both trigger
      // dimensions get exercised in a 20-batch run
      val slot = pmod(xxhash64(col("doc_id")), lit(50L))
      val base = docs.where(slot < 5)
      def timed[T](f: => T): (T, Double) =
        { val t = System.nanoTime(); val r = f; (r, (System.nanoTime() - t) / 1e9) }
      val (_, tBuild) = timed {
        Dedup.buildSpanStore(base, spanDir, n = 10)
        Dedup.buildMinHashStore(base, mhDir)
      }
      println(f"[dedup-probe] lifecycle build span+mh over ${base.count()}%d docs " +
        f"in $tBuild%.1f s")
      (1 to nBatches).iterator.takeWhile(_ => !spark.sparkContext.isStopped)
        .foreach { b =>
        val batch = docs.where(slot === lit(4L + b))
          .select((col("doc_id") + b * 1000000000000L).as("doc_id"), col("text"))
          .localCheckpoint(true)
        val (nSpan, tSpan) = timed(Dedup.spanStoreLookup(spark, spanDir, batch).count())
        val (nMh, tMh) = timed(Dedup.minHashStoreLookup(spark, mhDir, batch).count())
        val (_, tApp) = timed {
          Dedup.appendSpanStore(spark, spanDir, batch)
          Dedup.appendMinHashStore(spark, mhDir, batch)
        }
        val spanTrig = Dedup.spanStoreNeedsCompaction(spark, spanDir)
        val mhTrig = Dedup.minHashStoreNeedsCompaction(spark, mhDir)
        println(f"[dedup-probe] lifecycle batch $b%02d: span lookup $tSpan%5.1f s " +
          f"($nSpan%d rows), mh lookup $tMh%5.1f s ($nMh%d rows), append $tApp%4.1f s, " +
          f"trigger span=$spanTrig mh=$mhTrig")
        if (spanTrig) {
          val (_, tc) = timed(Dedup.compactSpanStore(spark, spanDir))
          val (_, ta) = timed(Dedup.spanStoreLookup(spark, spanDir, batch).count())
          println(f"[dedup-probe] lifecycle batch $b%02d: span COMPACT $tc%.1f s, " +
            f"lookup $tSpan%.1f -> $ta%.1f s")
        }
        if (mhTrig) {
          val (_, tc) = timed(Dedup.compactMinHashStore(spark, mhDir))
          val (_, ta) = timed(Dedup.minHashStoreLookup(spark, mhDir, batch).count())
          println(f"[dedup-probe] lifecycle batch $b%02d: mh COMPACT $tc%.1f s, " +
            f"lookup $tMh%.1f -> $ta%.1f s")
        }
      }
    }

    // ---- 0a. e18 hot-segment audit + capped timing: segment-bucket sizes
    // drive the PassJoin candidate volume (a B-doc bucket is ~B² DPs); this
    // prints the top buckets at this scale and times the capped operator —
    // the evidence behind the declared `maxSegmentBucket` choice.
    if (sections("hotseg")) {
      val top = Dedup.editDistanceHotSegments(docs, maxDist = 5, prefixLen = 40,
        minBucket = 100).limit(8).collect()
      println(s"[dedup-probe] hotseg top buckets: " +
        top.map(r => s"(l=${r.getInt(0)},i=${r.getInt(1)},n=${r.getLong(3)})").mkString(" "))
      // capped legs FIRST (tightest first): an OOMing leg can take the whole
      // SparkContext with it (measured at sf10), voiding every leg after it
      val hotsegCaps = sys.env.get("GRAFT_HOTSEG_CAPS")
        .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(2000, 0))
      hotsegCaps.iterator.takeWhile(_ => !spark.sparkContext.isStopped).foreach { cap =>
        try {
          val t0 = System.nanoTime()
          val n = Dedup.editDistancePairs(docs, maxDist = 5, prefixLen = 40,
            maxSegmentBucket = cap).count()
          println(f"[dedup-probe] editdist cap=$cap%d: $n%d pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        } catch {
          case e: Throwable =>
            println(s"[dedup-probe] editdist cap=$cap FAILED: ${e.getMessage.take(120)}")
        }
      }
    }

    // ---- 0b. CC engine A/B at graph scale: real dedup pair graphs are tiny
    // (near-dups are rare), so the e11 graph can't exercise the at-scale
    // claim. Synthesize a dedup-cluster-shaped graph — many 10-node chain
    // components (worst diameter for a cluster of that size) plus a handful
    // of 100k-member mega-clusters (the boilerplate-duplicate shape) — and
    // A/B the engines at millions of edges.
    if (sections("ccscale")) {
      val n = 5000000L
      val ids = spark.range(n).select(col("id").as("doc_id"))
      val chains = spark.range(n).where(pmod(col("id"), lit(10)) =!= 0)
        .select(col("id").as("id_a"), (col("id") - 1).as("id_b"))
      // hub index from the SURVIVING id space (id/50), not pmod(id, 5) —
      // rows here all have id % 50 == 0, so that would collapse to one hub:
      // 5 hubs of n/50/5 = 20k members each
      val mega = spark.range(n).where(pmod(col("id"), lit(50)) === 0)
        .select(col("id").as("id_a"),
          (pmod((col("id") / 50).cast("long"), lit(5)) * 1000000000L).as("id_b"))
      val pairs = chains.union(mega).localCheckpoint(true)
      val nPairs = pairs.count()
      def timeIt(tag: String, f: => DataFrame): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[dedup-probe] ccscale $tag: $s%.1f s over $nPairs%d edges")
        s
      }
      val a = timeIt("large-star/small-star", Dedup.dupGroups(ids, pairs))
      val b = timeIt("graphx", Dedup.dupGroups(ids, pairs, useGraphX = true))
      println(f"[dedup-probe] ccscale ratio graphx/df = x${b / a}%.2f")
    }

    // ---- 0c. signature-store build + lookup: portable md5 vs the
    // xxhash64 fast path — the number behind the scaladoc's "~10-20×
    // cheaper corpus-side build" claim, plus the incremental promise
    // itself (a 1% batch lookup must cost a small fraction of a build).
    if (sections("store")) {
      val batch = docs.where(pmod(xxhash64(col("doc_id")), lit(100L)) === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat_ws(" ", col("text"), lit("ingest suffix")).as("text"))
        .localCheckpoint(true)
      val nBatch = batch.count()
      Seq(("portable-md5", true), ("xxhash64", false)).foreach { case (tag, p) =>
        val dir = java.nio.file.Files.createTempDirectory(s"graft_store").toString
        val t0 = System.nanoTime()
        graft.ext.Dedup.buildMinHashStore(docs, dir, portable = p)
        val tb = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val hits = graft.ext.Dedup.minHashStoreLookup(spark, dir, batch).count()
        val tl = (System.nanoTime() - t1) / 1e9
        println(f"[dedup-probe] store $tag%-12s build $tb%.1f s; " +
          f"lookup($nBatch%d batch) $tl%.1f s -> $hits%d dup pairs")
      }
    }

    // ---- 1. CC engine A/B on the e11 pair graph (declared params) ----
    if (sections("cc")) {
      val pairs = Dedup.ngramJaccardPairs(docs, minJaccard = 0.5, maxDocFreq = 1000)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      val nPairs = pairs.count()
      val ids = docs.select(col("doc_id"))
      def labelsFingerprint(df: DataFrame): (Long, BigDecimal) = {
        val r = df.agg(count(lit(1)),
          sum(xxhash64(col("doc_id"), col("group_id")).cast("decimal(38,0)"))).head
        (r.getLong(0), BigDecimal(r.getDecimal(1)))
      }
      val fpDf = labelsFingerprint(Dedup.dupGroups(ids, pairs))
      val fpGx = labelsFingerprint(Dedup.dupGroups(ids, pairs, useGraphX = true))
      require(fpDf == fpGx, s"CC engines disagree: DF $fpDf vs GraphX $fpGx")
      def time(f: => DataFrame): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val tDf = (1 to 3).map(_ => time(Dedup.dupGroups(ids, pairs)))
      val tGx = (1 to 3).map(_ => time(Dedup.dupGroups(ids, pairs, useGraphX = true)))
      println(f"[dedup-probe] CC over $nPairs%d pairs: large-star/small-star " +
        f"${median(tDf)}%.2f s vs GraphX ${median(tGx)}%.2f s " +
        f"(x${median(tGx) / median(tDf)}%.2f); labels identical")
    }
    if (!sections("recall")) { spark.stop(); return }

    // ---- 2. capped vs uncapped recall on a hash-sample ----
    val sample = docs.where(pmod(xxhash64(col("doc_id")), lit(1000L)) < (frac * 1000).toLong)
      .localCheckpoint(true)
    val nSample = sample.count()
    println(s"[dedup-probe] recall sample: $nSample docs (frac $frac)")

    def recallTable(opName: String, run: Int => DataFrame, scoreOf: DataFrame => DataFrame,
        caps: Seq[Int]): Unit = {
      val un = scoreOf(run(0)).localCheckpoint(true)
      val nUn = un.count()
      caps.foreach { cap =>
        val cp = scoreOf(run(cap))
        val nCp = cp.count()
        val lost = un.join(cp.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_anti")
          .localCheckpoint(true)
        val bands = lost.groupBy(floor(col("score") * 10).as("band10"))
          .agg(count(lit(1)).as("n")).orderBy(col("band10"))
          .collect().map(r => s"[${r.getLong(0) / 10.0},${r.getLong(0) / 10.0 + 0.1}): ${r.getLong(1)}")
        val maxLost = lost.agg(max(col("score"))).head()
        val maxLostStr = if (maxLost.isNullAt(0)) "none" else f"${maxLost.getDouble(0)}%.4f"
        println(s"[dedup-probe] $opName cap=$cap: pairs $nCp / uncapped $nUn, " +
          s"lost ${nUn - nCp}; lost by band {${bands.mkString(", ")}}; max score lost $maxLostStr")
      }
    }

    recallTable("jaccard(0.5)",
      cap => Dedup.ngramJaccardPairs(sample, minJaccard = 0.5, maxDocFreq = cap),
      df => df.select(col("id_a"), col("id_b"), col("jaccard").as("score")),
      Seq(2000, 1000, 500, 250))
    recallTable("containment(0.9)",
      cap => Dedup.ngramContainmentPairs(sample, minContainment = 0.9, maxDocFreq = cap),
      df => df.select(col("id_a"), col("id_b"),
        greatest(col("c_a_in_b"), col("c_b_in_a")).as("score")),
      Seq(2000, 1000, 500))

    spark.stop()
  }
}
