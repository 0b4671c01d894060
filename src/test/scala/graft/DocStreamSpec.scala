package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{DocStreams, EventStreams, VecStreams}

/** Streaming documents pipeline == its batch twins on sf0.001. */
class DocStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def batchDocs =
    spark.read.parquet(s"$sf/documents.parquet")

  test("streaming quality filter + token stats == batch (stateless path)") {
    val stream = DocStreams.tokenStats(
      DocStreams.qualityFilter(DocStreams.readStream(spark, sf)))
    val got = EventStreams.runToMemory(spark, stream, "doc_stats")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = DocStreams.tokenStats(DocStreams.qualityFilter(batchDocs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch && got.nonEmpty)
  }

  test("streaming exact dedup keeps one row per content hash, like d1") {
    val stream = DocStreams.dedupeExact(DocStreams.readStream(spark, sf))
    val got = EventStreams.runToMemory(spark, stream, "doc_dedup")
    // d1 keeps min doc_id per hash; streaming keeps the first arrival —
    // the SET of surviving fingerprints is identical either way
    val gotFps = got.select("fp").collect().map(_.getString(0)).toSet
    val d1Fps = SparkEntry.queries("d1_dedup_exact")(spark, sf)
      .select("fp").collect().map(_.getString(0)).toSet
    assert(gotFps == d1Fps)
  }

  test("streaming decontamination == d18's keep verdict on shingle-able " +
      "train docs; short docs pass; eval docs drop") {
    val evalSh = DocStreams.evalShingles(spark, sf)
    assert(evalSh.nonEmpty)
    val stream = DocStreams.decontaminate(DocStreams.readStream(spark, sf), evalSh)
    val kept = EventStreams.runToMemory(spark, stream, "doc_decon")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch twin: same function, same result
    val keptBatch = DocStreams.decontaminate(batchDocs, evalSh)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == keptBatch)
    // d18 parity on its own domain (train docs with >= 3 tokens)
    val d18 = SparkEntry.queries("d18_decontaminate")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    d18.foreach { case (id, keep) =>
      assert(kept.contains(id) == keep, s"doc $id: stream=${kept.contains(id)} d18=$keep")
    }
    // eval docs self-overlap and drop; sub-3-token docs have no shingles
    // and pass (none of either in this corpus would otherwise be pinned)
    val evalIds = batchDocs.filter(col("doc_id") % 50 === 0)
      .filter(size(split(trim(col("text")), " +")) >= 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.nonEmpty && evalIds.forall(!kept.contains(_)))
  }

  test("streaming per-source counts == batch groupBy") {
    val stream = DocStreams.sourceCounts(DocStreams.readStream(spark, sf))
    val got = EventStreams.runToMemory(spark, stream, "doc_sources",
      OutputMode.Complete)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = batchDocs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch && got.nonEmpty)
  }

  test("streaming incremental dedup (stream-static join) == batch twin; " +
      "known dups skipped, fresh docs ingest") {
    // history = even doc_ids; the streamed corpus re-ingests everything,
    // so evens must come back skip_dup (their hash is in history) and
    // odds must ingest (the corpus has no cross-id exact duplicates —
    // d1 proves one hash per doc)
    val history = DocStreams.historyHashes(spark, sf)
      .join(batchDocs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("hist_id")), Seq("hist_id"))
    val stream = DocStreams.incrementalDedup(
      DocStreams.readStream(spark, sf), history)
    val got = EventStreams.runToMemory(spark, stream, "doc_incr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val batch = DocStreams.incrementalDedup(batchDocs, history)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSet == batch.toSet && got.nonEmpty)
    got.foreach { case (id, histId, verdict) =>
      if (id % 2 == 0)
        assert(verdict == "skip_dup" && histId == id,
          s"doc $id must match its own historical hash, got ($histId, $verdict)")
      else
        assert(verdict == "ingest" && histId == -1L,
          s"doc $id is fresh, got ($histId, $verdict)")
    }
  }

  test("streaming incremental novelty (stream-static join) == batch " +
      "twin; re-ingested docs score ~0, fresh-vocabulary docs score 1") {
    // history = even doc_ids' shingle universe; streaming the full
    // corpus back means every even doc finds ALL its shingles known
    // (novelty 0), while odd docs score by genuine overlap
    val history = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 2 === 0)
      .select(split(trim(col("text")), " +").as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(explode(
        graft.catalog.Approx.shinglesOfTokens(col("tok"))).as("s"))
      .distinct()
      .cache()
    // the deployment path: foreachBatch gate — the streaming plan
    // carries raw docs only, the exact per-doc aggregate runs batch-side
    // inside each micro-batch
    val outDir = java.nio.file.Files
      .createTempDirectory("novelty_gate").toString
    val ckDir = java.nio.file.Files
      .createTempDirectory("novelty_ck").toString
    val q = DocStreams.noveltyGate(
      DocStreams.readStream(spark, sf), history, outDir, ckDir)
    try q.processAllAvailable() finally q.stop()
    // stateless by construction: zero state operators in the query
    val lp = q.lastProgress
    assert(lp != null && lp.stateOperators.isEmpty,
      s"novelty gate must hold NO streaming state, got: $lp")
    val got = spark.read.parquet(outDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    val batch = DocStreams.incrementalNovelty(batchDocs, history)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == batch && got.nonEmpty,
      "streaming novelty must equal the batch twin exactly")
    // verdict extremes: every even doc is fully known; some odd doc
    // must carry genuinely novel shingles
    got.foreach { case (id, (_, novel, nov)) =>
      if (id % 2 == 0)
        assert(novel == 0L && nov == 0.0,
          s"re-ingested doc $id must score zero novelty, got $nov")
    }
    assert(got.exists { case (id, (_, novel, _)) => id % 2 == 1 && novel > 0 },
      "some fresh doc must carry novel shingles")
  }

  test("streaming incremental NEAR-dedup (simhash bands, stream-static " +
      "join) == batch twin, and verdicts agree with d44's pair mining") {
    // history = the even docs' simhash band index; stream the full
    // corpus back: every even doc finds itself at Hamming 0 (skip);
    // an odd doc is skipped iff some EVEN doc sits within Hamming 3 —
    // which is exactly the (even, odd) pair set d44 emits
    val history = DocStreams.historySimhashBands(spark, sf)
      .filter(col("hist_id") % 2 === 0)
    val stream = DocStreams.incrementalNearDedup(
      DocStreams.readStream(spark, sf), history)
    // append mode: the stateless rewrite has no streaming aggregation,
    // so each doc emits exactly one verdict row as it arrives
    val got = EventStreams.runToMemory(spark, stream, "doc_near")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val batch = DocStreams.incrementalNearDedup(batchDocs, history)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == batch && got.nonEmpty,
      "streaming near-dedup must equal the batch twin exactly")
    got.foreach { case (id, (hamming, histId, verdict)) =>
      // a re-ingested even doc always finds a Hamming-0 partner (itself
      // at minimum); an exact-duplicate doc may resolve to a SMALLER
      // even doc with the identical signature (min tie-break)
      if (id % 2 == 0)
        assert(verdict == "skip_near_dup" && hamming == 0L && histId <= id,
          s"re-ingested doc $id must match at Hamming 0, got " +
            s"($hamming, $histId, $verdict)")
    }
    // coherence with the batch pair miner: odd docs flagged skip ==
    // odd docs that d44 pairs with an even partner. PRECONDITION: the
    // equality assumes no (band, key) bucket exceeds MaxLshBucket —
    // d44's cap counts full-corpus buckets, the ingest index caps
    // history-side buckets, and the two cap different pair sets on a
    // corpus with mega-buckets. Assert the precondition explicitly so
    // a fixture/scale change fails with the real reason.
    val maxBucket = graft.catalog.Approx.simhashBands(
        graft.catalog.Approx.simhashSig(
          batchDocs.select(col("doc_id"), col("text")), barrier = false))
      .groupBy("band", "key").count()
      .agg(max(col("count"))).collect().head.getLong(0)
    assert(maxBucket <= graft.catalog.Approx.MaxLshBucket,
      s"fixture grew a mega-bucket ($maxBucket): the d44-equality " +
        "below is only defined under the cap — regenerate or rescope")
    val d44Pairs = SparkEntry.queries("d44_simhash_pairs")(spark, sf)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val oddWithEvenPartner = d44Pairs.flatMap { case (a, b) =>
      Seq(a, b).filter(_ % 2 == 1)
        .filter(_ => a % 2 == 0 || b % 2 == 0)
    }.toSet
    val oddSkipped = got.collect {
      case (id, (_, _, "skip_near_dup")) if id % 2 == 1 => id
    }.toSet
    assert(oddSkipped == oddWithEvenPartner,
      s"ingest verdicts must mirror d44: only-stream=" +
        s"${oddSkipped -- oddWithEvenPartner} only-d44=" +
        s"${oddWithEvenPartner -- oddSkipped}")
  }

  test("streaming vector decontamination (broadcast eval set, exact " +
      "cosine) == batch twin, and quarantines exactly e16's drop set") {
    val evalVecs = VecStreams.evalVectors(spark, sf)
    val stream = VecStreams.decontaminateIngest(
      VecStreams.readStream(spark, sf), evalVecs)
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    // append mode: stateless (1-row broadcast eval join + row-local fold)
    val got = EventStreams.runToMemory(spark, stream, "vec_decon")
      .collect().map(key(_)).toMap
    val batch = VecStreams.decontaminateIngest(
      spark.read.parquet(s"$sf/embeddings.parquet"), evalVecs)
      .collect().map(key(_)).toMap
    assert(got == batch && got.nonEmpty,
      "streaming decontamination must equal the batch twin exactly")
    // the eval split is never judged
    assert(got.keySet.forall(_ % 50 != 0))
    got.foreach { case (id, (n, witness, _, verdict)) =>
      assert((verdict == "quarantine") == (n > 0L), s"verdict: $id")
      assert((witness >= 0L) == (n > 0L), s"witness: $id")
    }
    // coherence with e16: the exact brute-force gate can only find a
    // SUPERSET of the multi-probe drops; measured recall is 1.0 on
    // this corpus, so the sets are pinned EQUAL (a probe regression or
    // a cosine divergence both fail loudly)
    val e16Dropped = SparkEntry.queries("e16_semantic_decontam")(spark, sf)
      .filter(col("keep") === 0).collect().map(_.getLong(0)).toSet
    val quarantined = got.collect {
      case (id, (_, _, _, "quarantine")) => id
    }.toSet
    assert(e16Dropped.subsetOf(quarantined),
      "exact gate must cover every multi-probe drop")
    assert(quarantined == e16Dropped,
      s"only-stream=${quarantined -- e16Dropped} " +
        s"only-e16=${e16Dropped -- quarantined}")
  }

  test("vector decontamination with an EMPTY eval set passes every " +
      "vector through as ingest (never swallows the stream)") {
    val emptyEval = VecStreams.evalVectors(spark, sf)
      .filter(col("eval_id") < 0) // provably empty
    val batchVecs = spark.read.parquet(s"$sf/embeddings.parquet")
    val got = VecStreams.decontaminateIngest(batchVecs, emptyEval)
      .collect()
    val nTrain = batchVecs.filter(col("vec_id") % 50 =!= 0).count()
    assert(got.length == nTrain && nTrain > 0,
      "every training vector must surface even with no eval reference")
    got.foreach { r =>
      assert(r.getAs[String]("verdict") == "ingest"
        && r.getAs[Long]("n_near_eval") == 0L
        && r.getAs[Long]("witness_eval") == -1L
        && r.getAs[Double]("max_cos") == -1.0, s"empty-eval row: $r")
    }
  }

  test("ingest near-dedup index drops boilerplate mega-buckets (the " +
      "d7/d44 guard) while genuine near-dups still match") {
    val s2 = spark; import s2.implicits._
    // history: 5,000 byte-identical boilerplate docs (every band a
    // mega-bucket) + one distinct-vocabulary doc
    val cloneText = (0 until 40).map(i => s"clone$i").mkString(" ")
    val realText = (0 until 40).map(i => s"real$i").mkString(" ")
    val histDocs = ((0L until 5000L).map(i => (i, cloneText))
      :+ (90000L, realText)).toDF("doc_id", "text")
    val histDir = java.nio.file.Files
      .createTempDirectory("graft_near_guard").toString
    histDocs.write.mode("overwrite").parquet(s"$histDir/documents.parquet")
    val history = DocStreams.historySimhashBands(spark, histDir)
    // the boilerplate bands must be GONE from the index
    assert(history.filter(col("hist_id") < 5000L).count() == 0L,
      "mega-bucket bands must be dropped at index build")
    // incoming: one more clone (bands all dropped → no candidates →
    // ingest: exact dedup owns byte-identical boilerplate) and one
    // near-copy of the real doc (must still match at Hamming 0)
    val incoming = Seq((100000L, cloneText), (100001L, realText))
      .toDF("doc_id", "text")
    val got = DocStreams.incrementalNearDedup(incoming, history)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(100000L)._3 == "ingest" && got(100000L)._2 == -1L,
      s"clone must fall through to exact dedup, got ${got(100000L)}")
    assert(got(100001L) == ((0L, 90000L, "skip_near_dup")),
      s"real near-dup must still match, got ${got(100001L)}")
  }
}
