package graft.catalog

import graft.Ckpt.StableCheckpoint
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data-pipeline text operators over the `documents` table:
  * exact dedup, token/quality stats, language-ID heuristic, bag-of-words
  * fingerprinting, n-gram Jaccard near-dup pairs. All oracle-checked:
  * set/count math is exact-integer, ratios mirror the oracle's op tree.
  */
object TextDocs {
  import Tables.t

  /** whitespace tokens of trimmed text (trailing-empty-safe on both engines) */
  private def toks(c: Column): Column = split(trim(c), " +")

  /** d28's temperature-mix tail, shared with the composed vector-side
    * pipeline (e18 in Approx): per-source sampling weight tokens^0.5
    * (sqrt is IEEE-correctly-rounded on both engines), then
    * largest-remainder apportionment of `budget` so integer allocations
    * sum EXACTLY to it. `per0` must carry (source, tokens:BIGINT); the
    * input is one row per source, so everything here — the ordered
    * normalizer fold, the global rank window, the two broadcast scalars
    * — is post-aggregation metadata, not data. stableCheckpoint pins it
    * so its two consumers (normalizer + allocator) cost ONE upstream
    * pass, not two. */
  private[graft] def temperatureMix(per0: DataFrame, budget: Long)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = per0
      .withColumn("w", sqrt(col("tokens").cast("double")))
      .stableCheckpoint()
    val tot = per.agg(
      aggregate(array_sort(collect_list(struct(col("source"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("total"))
    val based = per.crossJoin(broadcast(tot))
      .withColumn("p", col("w") / col("total"))
      .withColumn("raw", col("p") * lit(budget).cast("double"))
      .withColumn("base", floor(col("raw")))
      .withColumn("rem", col("raw") - col("base"))
    val sumBase = based.agg(sum(col("base")).as("sum_base"))
    val rk = Window.orderBy(col("rem").desc, col("source"))
    based.crossJoin(broadcast(sumBase))
      .withColumn("rk", row_number().over(rk))
      .select(col("source"), col("tokens"), col("p"),
        (col("base") + when(col("rk") <= lit(budget) - col("sum_base"), 1L)
          .otherwise(0L)).as("alloc"))
      .orderBy("source")
  }

  private val toksSql = "string_split_regex(trim(text), ' +')"

  /** Nano-nat log table for d29: lnano(t) = round(ln(t)*1e9) for t in
    * 1..31, computed ONCE here and embedded verbatim in both the Spark
    * plan (broadcast literal frame) and the oracle SQL — the two engines
    * share values instead of each calling their own libm. */
  private val lnNanoTable: Seq[(Long, Long)] =
    (1L to 31L).map(t => (t, math.round(math.log(t.toDouble) * 1e9)))

  /** round(ln(2)*1e9): the per-octave surprisal step. */
  private val Ln2Nano: Long = lnNanoTable(1)._2

  private val lnNanoSql: String =
    lnNanoTable.map { case (t, l) => s"($t, $l)" }.mkString(", ")

  /** d29 keep threshold: mean bigram surprisal ≤ 3.37 nats (perplexity
    * ≈ e^3.37 ≈ 29) — the corpus median, so the verdict is load-bearing
    * (roughly half kept, half dropped; the sf0.01 spread is 3.25–3.63).
    * In a real deployment this is the per-corpus tuning knob, exactly
    * like CCNet's head/middle/tail perplexity buckets. */
  private val PplTauNano: Long = 3370000000L

  /** English stopword markers — shared with the streaming quality filter
    * (DocStreams) so the two surfaces cannot drift */
  val stopEn: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  /** d3's keep verdict as a reusable predicate: stopword ratio ≥ 0.05 and
    * ≥ 10 tokens. The SINGLE definition behind both the batch catalog
    * query (oracle-checked) and DocStreams.qualityFilter. */
  def qualityKeep(text: Column): Column = {
    val tk = split(trim(text), " +")
    val nTok = size(tk).cast("double")
    val nStop = size(filter(tk, w => w.isInCollection(stopEn))).cast("double")
    nStop / nTok >= 0.05 && nTok >= 10
  }

  /** shared by d6 (pairs) and d11 (clusters): exact 3-shingle Jaccard
    * near-dup pairs over the bounded doc_id slice, with their shingle
    * universe (`d`) for singleton handling */
  private def ngramPairs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // tokens materialized before the shingle lambda (else the split()
    // is inlined into every element_at — see SCALE.md HOF discipline);
    // result is identical, only the plan changes
    val tokens = t(s, dir, "documents").filter(col("doc_id") < 150)
      .select(col("doc_id"), toks(col("text")).as("tok"))
      .filter(size(col("tok")) >= 3)
      .cache()
    val d = tokens.select(col("doc_id"),
      Approx.shinglesOfTokens(col("tok")).as("sh")).cache()
    val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_distinct(concat(col("sh_a"), col("sh_b")))).cast("double"))
      .filter(col("jaccard") >= 0.02)
      .select("id_a", "id_b", "jaccard")
    (d, pairs)
  }

  /** d6's oracle CTE, shared verbatim by d11's oracle */
  private val ngramPairsSql = """WITH d AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(string_split_regex(trim(text), ' +')) - 1),
            i -> string_split_regex(trim(text), ' +')[i] || ' ' ||
                 string_split_regex(trim(text), ' +')[i+1] || ' ' ||
                 string_split_regex(trim(text), ' +')[i+2])) AS sh
          FROM documents
          WHERE doc_id < 150 AND len(string_split_regex(trim(text), ' +')) >= 3),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) AS jaccard
          FROM d a JOIN d b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= 0.02)"""

  /** shared by d4 (per-doc prediction) and d14 (confusion matrix):
    * stopword-marker language heuristic with a FIXED tie order
    * (en > es > de > fr; no markers at all → und) */
  private def langidDf(s: SparkSession, dir: String): DataFrame = {
    val tk = toks(lower(col("text")))
    def hits(ws: Seq[String]) = size(filter(tk, w => w.isInCollection(ws)))
    t(s, dir, "documents")
      .withColumn("s_en", hits(Seq("the", "a", "and")))
      .withColumn("s_es", hits(Seq("el", "la", "los")))
      .withColumn("s_de", hits(Seq("der", "die", "und")))
      .withColumn("s_fr", hits(Seq("le", "les", "et")))
      .withColumn("pred_lang",
        when(col("s_en") === 0 && col("s_es") === 0
          && col("s_de") === 0 && col("s_fr") === 0, lit("und"))
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de")
            && col("s_en") >= col("s_fr"), lit("en"))
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), lit("es"))
          .when(col("s_de") >= col("s_fr"), lit("de"))
          .otherwise(lit("fr")))
  }

  private val langidSql = """WITH sc AS (SELECT doc_id, lang,
          len(list_filter(string_split_regex(trim(lower(text)), ' +'),
            w -> w IN ('the','a','and'))) AS s_en,
          len(list_filter(string_split_regex(trim(lower(text)), ' +'),
            w -> w IN ('el','la','los'))) AS s_es,
          len(list_filter(string_split_regex(trim(lower(text)), ' +'),
            w -> w IN ('der','die','und'))) AS s_de,
          len(list_filter(string_split_regex(trim(lower(text)), ' +'),
            w -> w IN ('le','les','et'))) AS s_fr
          FROM documents),
        p AS (SELECT doc_id, lang,
          CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
            WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
            WHEN s_de >= s_fr THEN 'de'
            ELSE 'fr' END AS pred_lang
          FROM sc)"""

  /** d32/d36 shared: exact set-similarity self-join (Jaccard >= 0.5
    * over 3-shingle sets) via PREFIX FILTERING (Chaudhuri et al.
    * ICDE'06, Bayardo et al. WWW'07 — public): the full-corpus,
    * no-`doc_id <` answer to d6's bounded all-pairs, with EXACT output
    * (unlike d7's recall-bounded LSH). Order the shingle universe
    * rarest-first (df asc, shingle asc); a doc's prefix is its first
    * |d| − ceil(tau·|d|) + 1 shingles in that order. Any pair with
    * Jaccard >= tau must share a prefix shingle (overlap needed is
    * >= ceil(tau·|d|) on each side, and the suffix is shorter than
    * that), so an equi-join on PREFIX shingles finds every qualifying
    * pair; the PPJoin length filter (sizes within 2x at tau = 0.5)
    * prunes before the distinct, and exact verification computes true
    * Jaccard from the full arrays. Scale shape: one shuffle for df,
    * one doc-partitioned window, one equi-join on prefix shingles
    * (rarest-first ordering keeps those buckets small by
    * construction), pair-verify on array columns — never a
    * corpus x corpus product. */
  /** d32 and d36 both need the pair set; compute once per
    * (session, dir) and hand back a localCheckpoint — checkpointed RDDs
    * survive `clearCache()` (a memoized .cache() would silently
    * recompute after it), and the WeakHashMap lets closed sessions'
    * entries be collected. */
  private val setsimMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]())

  private def setsimPairs(s: SparkSession, dir: String): DataFrame = {
    val perDir = setsimMemo.synchronized {
      var m = setsimMemo.get(s)
      if (m == null) { m = scala.collection.mutable.Map.empty; setsimMemo.put(s, m) }
      m
    }
    perDir.synchronized {
      perDir.getOrElseUpdate(dir, PinnedCheckpoints.register(
        setsimPairsUncached(s, dir).stableCheckpoint()))
    }
  }

  private def setsimPairsUncached(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = t(s, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tok"))
      .filter(size(col("tok")) >= 3)
    val docs = tokens
      .select(col("doc_id"), Approx.shinglesOfTokens(col("tok")).as("sh"))
      .cache() // barrier: shingle arrays built once, reused 3x below
    val flat = docs.select(col("doc_id"), explode(col("sh")).as("s1"))
    val dfreq = flat.groupBy("s1").agg(count(lit(1)).as("df"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s1"))
    // tau = 0.5: prefix length |d| - ceil(|d|/2) + 1, integer-exact
    val prefix = flat.join(dfreq, "s1")
      .withColumn("rn", row_number().over(wDoc))
      .join(sizes, "doc_id")
      .filter(col("rn") <= col("sz") - expr("(sz + 1) div 2") + 1)
      .select("s1", "doc_id", "sz")
      .cache() // barrier: both sides of the candidate self-join read the
    //             SAME prefix table — without it the df aggregate and
    //             the per-doc window each plan (and run) twice
    val cand = prefix.select(col("s1"), col("doc_id").as("id_a"),
        col("sz").as("sz_a"))
      .join(prefix.select(col("s1"), col("doc_id").as("id_b"),
        col("sz").as("sz_b")), "s1")
      .filter(col("id_a") < col("id_b") &&
        col("sz_a") * 2 >= col("sz_b") && col("sz_b") * 2 >= col("sz_a"))
      .select("id_a", "id_b").distinct()
    val ja = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val jb = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cand.join(ja, Seq("id_a")).join(jb, Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni")) // J >= 0.5 as exact ints
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni").cast("double"))
          .as("jaccard"))
  }

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "d1_dedup_exact",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select("keep_id", "n_copies", "fp")
          .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, md5(text) AS fp
        FROM documents GROUP BY md5(text) ORDER BY keep_id"""),
      "exact dedup: hash-groupBy, keep lowest doc_id per content hash"),

    QueryDef(
      "d2_token_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(toks(col("text"))).cast("long").as("n_tokens"),
            octet_length(col("text")).cast("long").as("n_bytes"),
            (octet_length(col("text")).cast("double")
              / size(toks(col("text"))).cast("double")).as("bytes_per_token"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CAST(len($toksSql) AS BIGINT) AS n_tokens,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(octet_length(encode(text)) AS DOUBLE)
          / CAST(len($toksSql) AS DOUBLE) AS bytes_per_token
        FROM documents ORDER BY doc_id"""),
      "token counting (whitespace tokenizer) + byte stats"),

    QueryDef(
      "d10_bpe_tokens",
      (s, dir) =>
        // BPE-style pre-tokenization: word pieces OR single non-space
        // punctuation — the usual first pass before byte-pair merging
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"), lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))
              .cast("long").as("n_pieces"),
            size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
              .cast("long").as("n_numbers"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_pieces,
        CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers
        FROM documents ORDER BY doc_id"""),
      "BPE-ish regex token counting (word pieces + punctuation singles)"),

    QueryDef(
      "d12_seq_pack",
      (s, dir) => {
        // sequence packing for LLM training: assign each document wholly
        // to a fixed-token-budget pack. Scale shape: documents are first
        // sharded (pmod of doc_id — at 100 TB this is the partition key),
        // then packed INDEPENDENTLY per shard with a windowed running
        // token total — no global window, no single-reducer sort. A doc
        // lands in the pack its predecessor total points at
        // (concat-and-assign semantics; docs are never split).
        val Budget = 512L; val Shards = 8L
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "documents")
          .select(col("doc_id"),
            pmod(col("doc_id"), lit(Shards)).as("shard"),
            size(toks(col("text"))).cast("long").as("n_tokens"))
          .withColumn("tok_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .select(col("doc_id"), col("shard"), col("n_tokens"),
            (col("shard") * 1000000L + floor(col("tok_before") / Budget))
              .as("pack_id"),
            pmod(col("tok_before"), lit(Budget)).as("pack_offset"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, doc_id % 8 AS shard,
          CAST(len($toksSql) AS BIGINT) AS n_tokens,
          (doc_id % 8) * 1000000 + CAST(FLOOR(CAST(COALESCE(SUM(len($toksSql))
              OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            / 512) AS BIGINT) AS pack_id,
          CAST(COALESCE(SUM(len($toksSql)) OVER (PARTITION BY doc_id % 8
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            % 512 AS pack_offset
        FROM documents ORDER BY doc_id"""),
      "sequence packing: shard -> windowed running token total -> " +
        "fixed-budget pack assignment (concat-and-assign, docs unsplit)"),

    QueryDef(
      "d13_source_quota",
      (s, dir) => {
        // corpus balancing: cap each source's contribution at Q documents,
        // keeping the longest first (deterministic doc_id tiebreak). One
        // window per source partition — the shuffle key is `source`, group
        // size is a single source's documents, and only Q survivors per
        // source leave the stage.
        val Q = 40
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("pick_rank", row_number().over(w).cast("long"))
          .filter(col("pick_rank") <= Q)
          .orderBy("source", "pick_rank")
      },
      Some("""SELECT doc_id, source, n_chars,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC) AS pick_rank
        FROM documents QUALIFY pick_rank <= 40
        ORDER BY source, pick_rank"""),
      "per-source quota sampling: keep top-Q docs per source by length " +
        "(corpus balancing for training mixes)"),

    QueryDef(
      "d3_quality_score",
      (s, dir) => {
        val tk = toks(col("text"))
        val nTok = size(tk).cast("double")
        val nStop = size(filter(tk, w => w.isInCollection(stopEn))).cast("double")
        val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0))).cast("double")
        t(s, dir, "documents")
          .select(col("doc_id"),
            (nStop / nTok).as("stopword_ratio"),
            (nPunct / octet_length(col("text")).cast("double")).as("punct_ratio"),
            when(qualityKeep(col("text")), lit("keep"))
              .otherwise(lit("drop")).as("verdict"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
        CAST(len(list_filter($toksSql,
            w -> w IN ('the','a','of','and','in','to'))) AS DOUBLE)
          / CAST(len($toksSql) AS DOUBLE) AS stopword_ratio,
        CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
          / CAST(octet_length(encode(text)) AS DOUBLE) AS punct_ratio,
        CASE WHEN CAST(len(list_filter($toksSql,
            w -> w IN ('the','a','of','and','in','to'))) AS DOUBLE)
          / CAST(len($toksSql) AS DOUBLE) >= 0.05
          AND len($toksSql) >= 10 THEN 'keep' ELSE 'drop' END AS verdict
        FROM documents ORDER BY doc_id"""),
      "quality scoring: stopword/punctuation ratios + keep/drop verdict"),

    QueryDef(
      "d4_langid",
      (s, dir) => langidDf(s, dir)
        .select(col("doc_id"), col("lang"), col("pred_lang"),
          (col("pred_lang") === col("lang")).as("agree"))
        .orderBy("doc_id"),
      Some(s"""$langidSql
        SELECT doc_id, lang, pred_lang, pred_lang = lang AS agree
        FROM p ORDER BY doc_id"""),
      "language-ID: stopword-marker n-gram heuristic with fixed tie order"),

    QueryDef(
      "d14_langid_confusion",
      (s, dir) => langidDf(s, dir)
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang"),
      Some(s"""$langidSql
        SELECT lang, pred_lang, COUNT(*) AS n FROM p
        GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""),
      "language-ID evaluation: gold-vs-predicted confusion matrix " +
        "(the QA step of the langid pipeline)"),

    QueryDef(
      "d5_fingerprint_bow",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            md5(array_join(array_sort(array_distinct(toks(lower(col("text"))))), " "))
              .as("bow_fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct(
          string_split_regex(trim(lower(text)), ' +'))), ' ')) AS bow_fp
        FROM documents ORDER BY doc_id"""),
      "document fingerprint: canonicalized bag-of-words hash"),

    QueryDef(
      "d6_ngram_jaccard",
      (s, dir) => ngramPairs(s, dir)._2.orderBy("id_a", "id_b"),
      Some(s"""$ngramPairsSql
        SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b"""),
      "n-gram (3-token shingle) Jaccard near-dup pairs on a bounded id slice"),

    QueryDef(
      "d11_dedup_clusters",
      (s, dir) => {
        // pairs → components → cluster id = min doc_id, representative =
        // the min itself. This is the step that turns pairwise near-dup
        // evidence into "keep one doc per cluster" (see
        // operators/ConnectedComponents for the iteration).
        val (d, pairs) = ngramPairs(s, dir)
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        val nodes = d.select(col("doc_id").as("node"))
        // algorithm flag: min-label + pointer doubling by default (right
        // for the shallow components dedup produces); `stars` switches to
        // large-star/small-star for adversarial high-diameter graphs —
        // identical output either way, so the oracle pins both
        val cc = s.conf.getOption("spark.graft.cc.algorithm") match {
          case Some("stars") =>
            graft.operators.ConnectedComponents.largeSmallStar(nodes, edges)
          case _ =>
            graft.operators.ConnectedComponents.minLabel(nodes, edges)
        }
        cc.select(col("node").as("doc_id"), col("cluster").as("cluster_id"),
            (col("cluster") === col("node")).as("is_rep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${ngramPairsSql.stripPrefix("WITH ")},
        sym AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM d
          UNION
          SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node)
        SELECT node AS doc_id, MIN(lbl) AS cluster_id,
          (MIN(lbl) = node) AS is_rep
        FROM reach GROUP BY node ORDER BY doc_id"""),
      "near-dup clusters: min-label connected components over the d6 " +
        "pair graph (the pairs->clusters->representative dedup step)"),

    QueryDef(
      "mm1_binary_meta",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            octet_length(col("text")).cast("long").as("n_bytes"),
            ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte
        FROM documents ORDER BY doc_id"""),
      "multimodal plumbing surface: opaque-binary byte metadata"),

    QueryDef(
      "d15_tfidf_topterms",
      (s, dir) => {
        // distributed tf-idf shape: term counts per doc, document
        // frequency per term, corpus size broadcast as a 1-row frame —
        // two groupBys + a broadcast join + a per-doc window, no driver
        // data paths. The idf is the RATIONAL proxy tf·(N/df): ln() is
        // not correctly-rounded across engines, but *, / are, so this
        // scoring (same ranking for fixed N) is bit-reproducible against
        // the oracle.
        import org.apache.spark.sql.expressions.Window
        val tf = t(s, dir, "documents")
          .select(col("doc_id"), explode(toks(col("text"))).as("term"))
          .filter(col("term") =!= "")
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nDocs = tf.agg(countDistinct(col("doc_id")).as("n"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
          .withColumn("score", col("tf").cast("double")
            * (col("n").cast("double") / col("df").cast("double")))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            col("score"), col("rk"))
          .orderBy("doc_id", "rk")
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, unnest($toksSql) AS term FROM documents),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tk
          WHERE term <> '' GROUP BY doc_id, term),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
        scored AS (
          SELECT f.doc_id, f.term, f.tf, d.df,
            CAST(f.tf AS DOUBLE)
              * (CAST((SELECT n FROM n) AS DOUBLE) / CAST(d.df AS DOUBLE))
              AS score
          FROM tf f JOIN dfreq d USING (term)),
        top AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS rk
          FROM scored)
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
          CAST(df AS BIGINT) AS df, score, CAST(rk AS BIGINT) AS rk
        FROM top WHERE rk <= 5 ORDER BY doc_id, rk"""),
      "tf-idf top-5 terms per document (rational N/df idf proxy — " +
        "bit-reproducible scoring; tf/df/window all distributed)"),

    QueryDef(
      "d16_chunking",
      (s, dir) => {
        // sliding-window token chunking (window 64, stride 48 — the RAG /
        // training-sample preparation step): one explode over per-doc
        // start offsets, chunk text and length via slice — embarrassingly
        // parallel, no shuffle at all beyond the final presentation sort
        val base = t(s, dir, "documents")
          .select(col("doc_id"), toks(col("text")).as("tok"))
        base
          .select(col("doc_id"), col("tok"),
            explode(sequence(lit(0),
              greatest(size(col("tok")) - 1, lit(0)), lit(48))).as("start"))
          .select(col("doc_id"),
            expr("start div 48").as("chunk_id"),
            array_join(slice(col("tok"), col("start") + 1, lit(64)), " ")
              .as("chunk"),
            size(slice(col("tok"), col("start") + 1, lit(64))).cast("long")
              .as("chunk_tokens"))
          .orderBy("doc_id", "chunk_id")
      },
      Some(s"""WITH base AS (
          SELECT doc_id, $toksSql AS tok FROM documents),
        st AS (
          SELECT doc_id, tok,
            unnest(range(0, GREATEST(len(tok), 1), 48)) AS start
          FROM base)
        SELECT doc_id, start // 48 AS chunk_id,
          array_to_string(list_slice(tok, start + 1, start + 64), ' ')
            AS chunk,
          CAST(len(list_slice(tok, start + 1, start + 64)) AS BIGINT)
            AS chunk_tokens
        FROM st ORDER BY doc_id, chunk_id"""),
      "sliding-window token chunking (64-token windows, stride 48) — " +
        "the training-sample / RAG chunk-preparation operator"),

    QueryDef(
      "d17_repetition_quality",
      (s, dir) => {
        // Gopher-style repetition quality rules (Rae et al. 2021 §A1.1):
        // a doc is boilerplate-suspect when one token dominates
        // (top_word_frac) or adjacent 2-grams repeat (dup_2gram_frac).
        // Both are exact-integer ratios, so the oracle is bit-identical.
        // Shape: one explode + two per-doc groupBys, no cross-doc state —
        // linear at any corpus size. Thresholds (0.10 / 0.03) split the
        // synthetic corpus roughly in half; real pipelines tune them.
        // 2-gram stats are per-ROW array math (no shuffle), so they ride
        // the token explode as constant-per-doc columns and fold through
        // the two aggregation levels with min() — JOIN-FREE: a naive
        // two-aggregate-plus-join formulation would self-join two
        // doc-cardinality tables, a real shuffle at corpus scale. The
        // 2-grams come from the bound token array (HOF-inlining
        // discipline, SCALE.md).
        val g = transform(sequence(lit(1), size(col("tok")) - 1), i =>
          concat_ws(" ", element_at(col("tok"), i),
            element_at(col("tok"), i + 1)))
        val tw = t(s, dir, "documents")
          .select(col("doc_id"), toks(col("text")).as("tok"))
          .filter(size(col("tok")) >= 2)
          .select(col("doc_id"), col("tok"),
            size(g).cast("long").as("tot"),
            size(array_distinct(g)).cast("long").as("dis"))
          .select(col("doc_id"), explode(col("tok")).as("w"),
            col("tot"), col("dis"))
          .groupBy("doc_id", "w")
          .agg(count(lit(1)).as("c"), min(col("tot")).as("tot"),
            min(col("dis")).as("dis"))
          .groupBy("doc_id")
          .agg(max(col("c")).as("topc"), sum(col("c")).as("n_tok"),
            min(col("tot")).as("tot"), min(col("dis")).as("dis"))
        val topFrac = col("topc").cast("double") / col("n_tok").cast("double")
        val dupFrac = lit(1.0) - col("dis").cast("double") / col("tot").cast("double")
        tw.select(col("doc_id"), col("n_tok"),
            topFrac.as("top_word_frac"),
            dupFrac.as("dup_2gram_frac"),
            (topFrac <= 0.10 && dupFrac <= 0.03).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, $toksSql AS tok FROM documents),
        tk2 AS (SELECT * FROM tk WHERE len(tok) >= 2),
        tc AS (
          SELECT doc_id, w, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(tok) AS w FROM tk2)
          GROUP BY doc_id, w),
        tw AS (
          SELECT doc_id, MAX(c) AS topc, CAST(SUM(c) AS BIGINT) AS n_tok
          FROM tc GROUP BY doc_id),
        g AS (
          SELECT doc_id, list_transform(range(1, len(tok)),
            i -> tok[i] || ' ' || tok[i + 1]) AS gg
          FROM tk2),
        gs AS (
          SELECT doc_id, CAST(len(gg) AS BIGINT) AS tot,
            CAST(len(list_distinct(gg)) AS BIGINT) AS dis
          FROM g)
        SELECT t.doc_id, t.n_tok,
          CAST(t.topc AS DOUBLE) / CAST(t.n_tok AS DOUBLE) AS top_word_frac,
          1.0 - CAST(s.dis AS DOUBLE) / CAST(s.tot AS DOUBLE) AS dup_2gram_frac,
          (CAST(t.topc AS DOUBLE) / CAST(t.n_tok AS DOUBLE) <= 0.10
            AND 1.0 - CAST(s.dis AS DOUBLE) / CAST(s.tot AS DOUBLE) <= 0.03)
            AS keep
        FROM tw t JOIN gs s USING (doc_id) ORDER BY doc_id"""),
      "Gopher-style repetition quality rules: top-word fraction + " +
        "duplicate-2-gram fraction per doc, exact-integer ratios"),

    QueryDef(
      "d18_decontaminate",
      (s, dir) => {
        // benchmark decontamination (the GPT-3 §C / PaLM recipe): drop
        // training docs sharing n-gram windows with the eval set. The
        // eval split here is doc_id % 50 == 0; window n = 3 because the
        // synthetic vocab is ~40 words (real pipelines use 8–13). Shape:
        // explode shingles → broadcast semi-join against the (small) eval
        // shingle universe → per-doc counts. The eval side is always
        // broadcast-able by construction — benchmarks are tiny next to a
        // 100 TB corpus — so the train side streams map-side, no shuffle
        // besides its own groupBy.
        val sh = t(s, dir, "documents")
          .select(col("doc_id"), toks(col("text")).as("tok"))
          .filter(size(col("tok")) >= 3)
          .select(col("doc_id"),
            explode(Approx.shinglesOfTokens(col("tok"))).as("sh"))
        val evalSh = sh.filter(col("doc_id") % 50 === 0)
          .select(col("sh")).distinct()
        val train = sh.filter(col("doc_id") % 50 =!= 0)
        val totals = train.groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"))
        val hits = train.join(broadcast(evalSh), "sh")
          .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
        totals.join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
            (coalesce(col("n_contaminated"), lit(0L)).cast("double")
              / col("n_shingles").cast("double")).as("contaminated_frac"),
            (coalesce(col("n_contaminated"), lit(0L)) === 0L).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, $toksSql AS tok FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(tok) - 1),
            i -> tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2]))) AS sh
          FROM tk WHERE len(tok) >= 3),
        ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
        train AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        totals AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
          FROM train GROUP BY doc_id),
        hits AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
          FROM train JOIN ev USING (sh) GROUP BY doc_id)
        SELECT t.doc_id, t.n_shingles,
          COALESCE(h.n_contaminated, 0) AS n_contaminated,
          CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
            / CAST(t.n_shingles AS DOUBLE) AS contaminated_frac,
          COALESCE(h.n_contaminated, 0) = 0 AS keep
        FROM totals t LEFT JOIN hits h USING (doc_id) ORDER BY doc_id"""),
      "benchmark decontamination: train docs sharing 3-gram windows with " +
        "the eval split (doc_id % 50 == 0) are flagged; eval shingle " +
        "universe broadcast (tiny vs corpus at any scale)"),

    QueryDef(
      "d19_pii_redact",
      (s, dir) => {
        // PII scrub (the C4 / CCNet hygiene pass): regex redaction of
        // emails and phone numbers with per-doc match counts. The corpus
        // text carries no PII (synthetic word salad), so the query first
        // affixes a DETERMINISTIC synthetic footer derived from doc_id —
        // the redactor under test is the regex pass, which is the real
        // operator and runs inside codegen (regexp_replace/regexp_count
        // are built-ins, no UDF). Patterns stay in the RE2 ∩ Java-regex
        // common dialect so both engines compile them identically.
        val footer = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"))
        val email = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]{2,}"
        val phone = "\\d{3}-\\d{3}-\\d{4}"
        t(s, dir, "documents")
          .select(col("doc_id"), footer.as("t"))
          .select(col("doc_id"),
            // the Scala-API regexp functions take the pattern verbatim —
            // expr("regexp_count(...)") would re-process backslashes in
            // the SQL string literal and corrupt the regex
            regexp_count(col("t"), lit(email)).cast("long").as("n_emails"),
            regexp_count(col("t"), lit(phone)).cast("long").as("n_phones"),
            regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
              phone, "<PHONE>").as("redacted"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
          SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example.com or call 555-'
            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
            || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t,
            '[a-z0-9._]+@[a-z0-9.]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(t,
            '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
          regexp_replace(regexp_replace(t,
            '[a-z0-9._]+@[a-z0-9.]+\.[a-z]{2,}', '<EMAIL>', 'g'),
            '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
        FROM p ORDER BY doc_id"""),
      "PII redaction: regex email/phone scrub with per-doc match counts " +
        "over a deterministic synthetic footer (corpus carries no PII)"),

    QueryDef(
      "d20_source_stats",
      (s, dir) => {
        // per-source corpus report (the mixture-weights input every
        // training run starts from): doc/token/char totals, mean and
        // exact interpolated token percentiles, language spread. One
        // groupBy over 20 sources — the aggregate is partial-combined
        // map-side, percentiles shuffle only (source, n_tok) pairs.
        t(s, dir, "documents")
          .select(col("source"), col("lang"),
            size(toks(col("text"))).cast("long").as("n_tok"), col("n_chars"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("total_tokens"),
            (sum(col("n_tok")).cast("double")
              / count(lit(1)).cast("double")).as("mean_tokens"),
            expr("percentile(n_tok, 0.5)").as("p50_tokens"),
            expr("percentile(n_tok, 0.95)").as("p95_tokens"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy("source")
      },
      Some(s"""WITH b AS (
          SELECT source, lang,
            CAST(len($toksSql) AS BIGINT) AS n_tok, n_chars
          FROM documents)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
          CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS mean_tokens,
          quantile_cont(n_tok, 0.5) AS p50_tokens,
          quantile_cont(n_tok, 0.95) AS p95_tokens,
          COUNT(DISTINCT lang) AS n_langs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM b GROUP BY source ORDER BY source"""),
      "per-source corpus statistics: doc/token/char totals, mean + exact " +
        "interpolated percentiles, language spread — the mixture-weights " +
        "report"),

    QueryDef(
      "d21_interdoc_dup",
      (s, dir) => {
        // cross-document repeated-passage detection (the MassiveText /
        // RefinedWeb "line dedup" analog — this corpus has no newlines,
        // so the unit is a non-overlapping 8-token chunk): hash each
        // chunk, count DISTINCT docs carrying each hash corpus-wide,
        // and report the per-doc fraction of passages shared with some
        // other document. Shape: explode → distinct + groupBy on the
        // chunk hash → one equi-join back on the hash → per-doc groupBy.
        // Every shuffle key is the chunk hash or doc_id — linear in
        // corpus size, never all-pairs; this is the boilerplate-removal
        // pass that runs BEFORE near-dup (d7) in real pipelines.
        val chunks = t(s, dir, "documents")
          .select(col("doc_id"), toks(col("text")).as("tok"))
          .select(col("doc_id"),
            explode(sequence(lit(0),
              greatest(size(col("tok")) - 1, lit(0)), lit(8))).as("start"),
            col("tok"))
          .select(col("doc_id"),
            md5(array_join(slice(col("tok"), col("start") + 1, lit(8)), " "))
              .as("ch"))
        val docsPerChunk = chunks.distinct()
          .groupBy("ch").agg(count(lit(1)).as("n_docs"))
        chunks.join(docsPerChunk, "ch")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
          .select(col("doc_id"), col("n_chunks"), col("n_shared"),
            (col("n_shared").cast("double") / col("n_chunks").cast("double"))
              .as("shared_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH base AS (
          SELECT doc_id, $toksSql AS tok FROM documents),
        st AS (
          SELECT doc_id, tok,
            unnest(range(0, GREATEST(len(tok), 1), 8)) AS start
          FROM base),
        ch AS (
          SELECT doc_id,
            md5(array_to_string(list_slice(tok, start + 1, start + 8), ' '))
              AS ch
          FROM st),
        dpc AS (
          SELECT ch, COUNT(*) AS n_docs
          FROM (SELECT DISTINCT doc_id, ch FROM ch) GROUP BY ch)
        SELECT c.doc_id, COUNT(*) AS n_chunks,
          CAST(SUM(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_shared,
          CAST(SUM(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS shared_frac
        FROM ch c JOIN dpc d USING (ch)
        GROUP BY c.doc_id ORDER BY doc_id"""),
      "cross-document repeated-passage detection: non-overlapping 8-token " +
        "chunk hashes shared across docs (the line-dedup pass before " +
        "near-dup)"),

    QueryDef(
      "d22_train_split",
      (s, dir) => {
        // deterministic train/valid/test split: the assignment is a pure
        // function of a salted key hash (md5 hex, first nibble — 12/16
        // train, 2/16 valid, 2/16 test), so re-running on a grown corpus
        // never moves an already-assigned doc across splits — the
        // stability property random()-based splits lack, and the reason
        // eval contamination stays fixed across pipeline re-runs. Narrow
        // per-row transform: no shuffle, linear at any scale.
        val b = substring(
          md5(concat(col("doc_id").cast("string"), lit(":split:42"))), 1, 1)
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), b.as("bucket"),
            when(b <= "b", "train").when(b <= "d", "valid")
              .otherwise("test").as("split"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
          SELECT doc_id, source,
            substr(md5(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 1)
              AS bucket
          FROM documents)
        SELECT doc_id, source, bucket,
          CASE WHEN bucket <= 'b' THEN 'train'
               WHEN bucket <= 'd' THEN 'valid'
               ELSE 'test' END AS split
        FROM h ORDER BY doc_id"""),
      "deterministic hash-based train/valid/test split (stable under " +
        "corpus growth; 12/2/2 sixteenths by md5 first nibble)"),

    QueryDef(
      "d23_bigram_lm",
      (s, dir) => {
        // corpus bigram language-model counts (the KenLM-style count
        // pass): c(w1 w2) per adjacent pair, c(w1) as the sum of its
        // continuations (so Σ p(w2|w1) = 1 exactly), p as the exact
        // rational c12/c1. Two partial-combined groupBys + one equi-join
        // on the unigram prefix (vocab-sized, shuffles nothing heavy);
        // the deterministic global top-50 compiles to
        // TakeOrderedAndProject — no single-reducer sort.
        val tok = t(s, dir, "documents")
          .select(toks(col("text")).as("tok"))
          .filter(size(col("tok")) >= 2)
        val big = tok
          .select(explode(transform(sequence(lit(1), size(col("tok")) - 1),
            i => concat_ws(" ", element_at(col("tok"), i),
              element_at(col("tok"), i + 1)))).as("g"))
          .select(substring_index(col("g"), " ", 1).as("w1"),
            substring_index(col("g"), " ", -1).as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val uni = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
        big.join(uni, "w1")
          .select(col("w1"), col("w2"), col("c12"), col("c1"),
            (col("c12").cast("double") / col("c1").cast("double")).as("p"))
          .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
          .limit(50)
      },
      Some(s"""WITH tk AS (
          SELECT $toksSql AS tok FROM documents),
        tk2 AS (SELECT * FROM tk WHERE len(tok) >= 2),
        st AS (
          SELECT tok, unnest(range(1, len(tok))) AS i FROM tk2),
        bg AS (SELECT tok[i] AS w1, tok[i + 1] AS w2 FROM st),
        c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
        c1 AS (
          SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1)
        SELECT b.w1, b.w2, b.c12, u.c1,
          CAST(b.c12 AS DOUBLE) / CAST(u.c1 AS DOUBLE) AS p
        FROM c12 b JOIN c1 u USING (w1)
        ORDER BY b.c12 DESC, b.w1 ASC, b.w2 ASC LIMIT 50"""),
      "corpus bigram LM counts: c(w1 w2), prefix totals, exact rational " +
        "p(w2|w1); global top-50 via TakeOrderedAndProject"),

    QueryDef(
      "d24_text_clean",
      (s, dir) => {
        // text hygiene (the C4/CCNet cleaning pass): strip control
        // characters, collapse whitespace runs, trim — with per-doc
        // counts of what was removed (the QA signal). The corpus is
        // clean, so deterministic dirt is affixed first (the d19
        // recipe): doc_id-seeded tabs, BELs, and space runs. Narrow
        // per-row regex transforms — codegen built-ins, linear forever.
        val dirt = concat(col("text"),
          lit(" "), expr("chr(9)"), lit("tail"), expr("chr(7)"),
          expr("repeat(' ', 2 + CAST(doc_id % 3 AS INT))"), lit("end"))
        val ctrl = "[\\x00-\\x1f]"
        val runs = "  +"
        t(s, dir, "documents")
          .select(col("doc_id"), dirt.as("t"))
          .select(col("doc_id"),
            regexp_count(col("t"), lit(ctrl)).cast("long").as("n_ctrl"),
            regexp_count(col("t"), lit(runs)).cast("long").as("n_ws_runs"),
            trim(regexp_replace(regexp_replace(col("t"), ctrl, " "),
              runs, " ")).as("cleaned"))
          .withColumn("n_chars_clean", length(col("cleaned")).cast("long"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
          SELECT doc_id, text || ' ' || chr(9) || 'tail' || chr(7)
            || repeat(' ', CAST(2 + doc_id % 3 AS INT)) || 'end' AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '[\x00-\x1f]')) AS BIGINT)
            AS n_ctrl,
          CAST(len(regexp_extract_all(t, '  +')) AS BIGINT) AS n_ws_runs,
          trim(regexp_replace(regexp_replace(t, '[\x00-\x1f]', ' ', 'g'),
            '  +', ' ', 'g')) AS cleaned,
          CAST(length(trim(regexp_replace(regexp_replace(t,
            '[\x00-\x1f]', ' ', 'g'), '  +', ' ', 'g'))) AS BIGINT)
            AS n_chars_clean
        FROM p ORDER BY doc_id"""),
      "text cleaning (C4-style hygiene): control-char strip + whitespace " +
        "collapse + trim with per-doc removal counts, over deterministic " +
        "synthetic dirt"),

    QueryDef(
      "d25_token_budget",
      (s, dir) => {
        // token-budgeted corpus selection (the data-mixing step: each
        // source contributes its best documents until its TOKEN budget
        // is spent — d13 caps by document count, this caps by what
        // actually costs training compute). Quality proxy = n_chars
        // (longest-first, deterministic doc_id tiebreak), running token
        // sum per source, keep while the running sum fits the budget.
        // One window per source partition; running-frame sum is a
        // single streaming pass per group — same shuffle shape as d13,
        // linear at any scale.
        val B = 1000L
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            size(toks(col("text"))).cast("long").as("n_tokens"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .filter(col("cum_tokens") <= B)
          .orderBy("source", "cum_tokens", "doc_id")
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, source, n_chars,
            CAST(len($toksSql) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens
          FROM tk)
        SELECT doc_id, source, n_chars, n_tokens, cum_tokens
        FROM c WHERE cum_tokens <= 1000
        ORDER BY source, cum_tokens, doc_id"""),
      "token-budgeted corpus selection: best docs per source until the " +
        "source's token budget is spent (data mixing priced in tokens, " +
        "not documents)"),

    QueryDef(
      "d26_incremental_dedup",
      (s, dir) => {
        // incremental ingest dedup: an incoming batch is checked against
        // the HISTORICAL corpus's content hashes — the steady-state form
        // of d1 (which dedups one closed corpus). The corpus has no
        // exact duplicates, so the incoming batch is synthesized
        // deterministically from it: ids ending in 0 mod 5 re-ingest
        // VERBATIM text under a new id (must be caught as dups), ids
        // 1 mod 5 arrive with edited text (must pass). At 100 TB the
        // history is a hash-keyed table and this is ONE equi-join on
        // the hash — no content comparison, AQE handles hot-hash skew,
        // and the history side never needs the text column at all.
        val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val hist = base
          .groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("hist_id"))
        val incoming = base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("new_id"), col("text"))
          .unionAll(base.filter(col("doc_id") % 5 === 1)
            .select((col("doc_id") + 2000000L).as("new_id"),
              concat(col("text"), lit(" v2")).as("text")))
        incoming
          .select(col("new_id"), md5(col("text")).as("fp"))
          .join(hist, Seq("fp"), "left")
          .select(col("new_id"),
            coalesce(col("hist_id"), lit(-1L)).as("hist_id"),
            when(col("hist_id").isNull, lit("ingest"))
              .otherwise(lit("skip_dup")).as("verdict"))
          .orderBy("new_id")
      },
      Some("""WITH hist AS (
          SELECT md5(text) AS fp, MIN(doc_id) AS hist_id
          FROM documents GROUP BY md5(text)),
        incoming AS (
          SELECT doc_id + 1000000 AS new_id, text
          FROM documents WHERE doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + 2000000 AS new_id, text || ' v2' AS text
          FROM documents WHERE doc_id % 5 = 1)
        SELECT i.new_id, COALESCE(h.hist_id, -1) AS hist_id,
          CASE WHEN h.hist_id IS NULL THEN 'ingest'
               ELSE 'skip_dup' END AS verdict
        FROM incoming i LEFT JOIN hist h ON md5(i.text) = h.fp
        ORDER BY i.new_id"""),
      "incremental ingest dedup: incoming batch vs historical content " +
        "hashes via one equi-join (the steady-state form of d1); " +
        "verbatim re-ingests caught, edited docs pass"),

    QueryDef(
      "d27_corpus_shuffle",
      (s, dir) => {
        // epoch-seeded deterministic training-order shuffle: before a
        // corpus is written as packed shards (d12), its documents must be
        // re-ordered pseudo-randomly — and at 100 TB that order must be
        // REPRODUCIBLE (a resumed training run or a re-run of a failed
        // shard writer has to produce the identical order). Seeded hash
        // as sort key gives that: key = md5(epoch ':' doc_id), a fresh
        // independent permutation per epoch, no RNG state anywhere.
        // Global position comes from the q54 scalable-rownum pattern
        // (range partition on the key + per-partition offsets) — the
        // naive ROW_NUMBER() OVER (ORDER BY key) would funnel the corpus
        // through one reducer. Shard id = pos/64 then feeds the shard
        // writer. Two epochs materialized side by side prove the
        // permutations differ while each stays reproducible.
        import org.apache.spark.sql.expressions.Window
        val frames = Seq(0, 1).map { e =>
          val keyed = t(s, dir, "documents")
            .select(col("doc_id"),
              md5(concat(lit(s"$e:"), col("doc_id").cast("string"))).as("k"))
            .repartitionByRange(col("k"))
            .withColumn("pid", spark_partition_id())
            .stableCheckpoint()
          val counts = keyed.groupBy("pid").agg(count(lit(1)).as("n"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
          var acc = 0L
          val offsets = counts.map { case (pid, n) =>
            val o = (pid, acc); acc += n; o
          }.toSeq
          import s.implicits._
          val offDf = offsets.toDF("pid", "off")
          val w = Window.partitionBy(col("pid")).orderBy(col("k"), col("doc_id"))
          keyed.join(broadcast(offDf), "pid")
            .withColumn("pos", col("off") + row_number().over(w).cast("long"))
            .select(lit(e).as("epoch"), col("doc_id"), col("pos"),
              floor((col("pos") - lit(1)) / lit(64)).as("shard"))
        }
        frames.reduce(_.unionAll(_)).orderBy("epoch", "pos")
      },
      Some("""WITH e AS (
          SELECT 0 AS epoch, doc_id,
            md5('0:' || CAST(doc_id AS VARCHAR)) AS k FROM documents
          UNION ALL
          SELECT 1 AS epoch, doc_id,
            md5('1:' || CAST(doc_id AS VARCHAR)) AS k FROM documents),
        p AS (
          SELECT epoch, doc_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k, doc_id)
              AS BIGINT) AS pos
          FROM e)
        SELECT epoch, doc_id, pos,
          CAST(floor((pos - 1) / 64) AS BIGINT) AS shard
        FROM p ORDER BY epoch, pos"""),
      "epoch-seeded deterministic corpus shuffle: md5(epoch:doc_id) sort " +
        "key -> reproducible per-epoch permutation + shard assignment, " +
        "positions via the scalable-rownum pattern (no single-reducer sort)"),

    QueryDef(
      "d28_temperature_mix",
      (s, dir) => {
        // temperature-smoothed source mixing (the mT5/XLM-R alpha-
        // sampling move): raw token mass per source would let one giant
        // crawl drown the small high-quality sources, uniform would
        // oversample the tiny ones — sampling weight T_s^alpha in
        // between. alpha = 0.5 (sqrt: IEEE-correctly-rounded on both
        // engines, so the oracle stays bit-exact where a pow() would
        // drift in the last ulp). The 100k-token budget is then split by
        // largest-remainder apportionment so the integer allocations sum
        // EXACTLY to the budget (floor everyone, hand the leftover to
        // the largest fractional remainders). Everything after the one
        // groupBy runs on a #sources-row frame — the global window and
        // the two broadcast totals are post-aggregation metadata, not
        // data. The normalizer folds w in source order (e5's ordered-
        // fold trick) so the double sum is bit-identical to DuckDB's.
        // localCheckpoint pins the aggregated frame so its two consumers
        // (normalizer + allocator) cost ONE corpus scan, not two.
        temperatureMix(t(s, dir, "documents")
          .groupBy("source").agg(sum(col("n_chars")).as("tokens")), 100000L)
      },
      Some("""WITH per AS (
          SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tokens,
            sqrt(CAST(SUM(n_chars) AS DOUBLE)) AS w
          FROM documents GROUP BY source),
        tot AS (
          SELECT list_reduce(list_prepend(0.0, list(w ORDER BY source)),
            (a, b) -> a + b) AS total
          FROM per),
        px AS (
          SELECT source, tokens, w, w / total AS p,
            (w / total) * 100000.0 AS raw
          FROM per, tot),
        fb AS (
          SELECT *, CAST(floor(raw) AS BIGINT) AS base,
            raw - floor(raw) AS rem
          FROM px),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
            (SELECT SUM(base) FROM fb) AS sum_base
          FROM fb)
        SELECT source, tokens, p,
          CAST(base + CASE WHEN rk <= 100000 - sum_base THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
        FROM rk ORDER BY source"""),
      "temperature-smoothed source mixing: sqrt(token-mass) sampling " +
        "weights (alpha=0.5, bit-exact) + largest-remainder apportionment " +
        "so integer allocations sum exactly to the token budget"),

    QueryDef(
      "d29_perplexity_filter",
      (s, dir) => {
        // LM-based quality filtering — the CCNet/KenLM perplexity move:
        // score every document by its bigram cross-entropy under the
        // corpus's own LM and keep the low-surprisal ones. The libm trap
        // (Java's ln and DuckDB's ln differ in the last ulp on ~0.003%
        // of inputs — measured, 54 mismatches in 2M) is dodged by
        // QUANTIZING counts to 5 significant bits: surprisal(c) =
        // lnNano(c >> s) + s*lnNano(2) with s = max(bitlen(c)-5, 0),
        // from a 31-entry nano-nat table baked into BOTH the plan and
        // the oracle SQL from one Math.log at class-init. All integer
        // math from there: the per-doc sum is order-free and exact, at
        // the cost of ≤ ln(17/16) ≈ 6% probability error — noise for a
        // keep/drop threshold. Scale shape: count tables are vocab-
        // sized; the corpus-scale work is ONE bigram-explode shuffle to
        // count, one (w1,w2) equi-join to score, one doc_id groupBy —
        // the surprisal lookup is a 31-row broadcast.
        val docs = t(s, dir, "documents")
        val inst = docs
          .select(col("doc_id"), toks(col("text")).as("tok"))
          .filter(size(col("tok")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("tok")) - 1),
              i => concat_ws(" ", element_at(col("tok"), i),
                element_at(col("tok"), i + 1)))).as("bg"))
        val c12 = inst.groupBy("bg").agg(count(lit(1)).as("c12"))
          .withColumn("w1", substring_index(col("bg"), " ", 1))
        val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
        val lt = broadcast(
          s.createDataFrame(lnNanoTable).toDF("t", "lnano"))
        def surp(df: DataFrame, cName: String, out: String): DataFrame =
          df.withColumn("_s",
              expr(s"greatest(length(bin($cName)) - 5, 0)"))
            .withColumn("_t", expr(s"shiftright($cName, _s)"))
            .join(lt, col("_t") === col("t"))
            .withColumn(out,
              col("lnano") + col("_s").cast("long") * lit(Ln2Nano))
            .drop("_s", "_t", "t", "lnano")
        val bgSurp = surp(c12, "c12", "s12")
        val uniSurp = surp(c1, "c1", "s1").select("w1", "s1")
        val terms = bgSurp.join(uniSurp, "w1")
          .select(col("bg"), (col("s1") - col("s12")).as("term"))
        val scored = inst.join(terms, "bg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("term")).as("nll_nano"))
        docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("nll_nano"), lit(0L)).as("nll_nano"))
          .withColumn("keep",
            when(col("nll_nano") <= lit(PplTauNano) * col("n_bigrams"), 1L)
              .otherwise(0L))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, $toksSql AS tok FROM documents),
        st AS (
          SELECT doc_id, tok, unnest(range(1, len(tok))) AS i
          FROM tk WHERE len(tok) >= 2),
        bg AS (SELECT doc_id, tok[i] || ' ' || tok[i + 1] AS bg FROM st),
        c12 AS (
          SELECT bg, split_part(bg, ' ', 1) AS w1, COUNT(*) AS c12
          FROM bg GROUP BY bg),
        c1 AS (
          SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
        lt(t, lnano) AS (VALUES $lnNanoSql),
        s12 AS (
          SELECT bg, w1,
            lnano + greatest(length(bin(c12)) - 5, 0) * $Ln2Nano AS s12
          FROM c12 JOIN lt
            ON lt.t = (c12 >> greatest(length(bin(c12)) - 5, 0))),
        s1 AS (
          SELECT w1,
            lnano + greatest(length(bin(c1)) - 5, 0) * $Ln2Nano AS s1
          FROM c1 JOIN lt
            ON lt.t = (c1 >> greatest(length(bin(c1)) - 5, 0))),
        terms AS (
          SELECT b.doc_id, s1.s1 - s12.s12 AS term
          FROM bg b JOIN s12 USING (bg) JOIN s1 USING (w1)),
        sc AS (
          SELECT doc_id, COUNT(*) AS n_bigrams,
            CAST(SUM(term) AS BIGINT) AS nll_nano
          FROM terms GROUP BY doc_id)
        SELECT d.doc_id,
          COALESCE(sc.n_bigrams, 0) AS n_bigrams,
          COALESCE(sc.nll_nano, 0) AS nll_nano,
          CAST(CASE WHEN COALESCE(sc.nll_nano, 0)
            <= $PplTauNano * COALESCE(sc.n_bigrams, 0) THEN 1 ELSE 0 END
            AS BIGINT) AS keep
        FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        ORDER BY d.doc_id"""),
      "LM perplexity quality filter (CCNet shape): per-doc bigram " +
        "cross-entropy vs the corpus LM, counts quantized to 5 " +
        "significant bits so surprisal comes from a 31-entry nano-nat " +
        "literal table — libm-free, order-free exact integer sums"),

    QueryDef(
      "d30_e2e_pipeline",
      (s, dir) => {
        // The preprocessing capstone: the full crawl -> training-shard
        // pipeline as ONE composed query, each stage the semantics of
        // its standalone sibling:
        //   1. re-crawl simulation: every doc_id≡0 (mod 5) arrives a
        //      second time under a new id (the web re-crawl reality
        //      that makes dedup load-bearing — the corpus itself has
        //      no byte dups, d1 proved that);
        //   2. hygiene (d24): deterministic dirt affixed, control
        //      chars stripped, whitespace collapsed — the re-crawl's
        //      different dirt collapses to the SAME cleaned text, so
        //      only cleaning-then-dedup catches it;
        //   3. language + quality gate: target langs, >= 20 tokens;
        //   4. exact dedup (d1): first-id representative per cleaned
        //      fingerprint;
        //   5. sequence packing (d12): per-shard running token totals
        //      -> fixed-512-token pack ids.
        // Every shuffle keys on a hash/id (fingerprint, shard) —
        // the composition is exactly as linear as its worst stage.
        val dirt = concat(col("text"),
          lit(" "), expr("chr(9)"), lit("tail"), expr("chr(7)"),
          expr("repeat(' ', 2 + CAST(doc_id % 3 AS INT))"), lit("end"))
        import org.apache.spark.sql.expressions.Window
        val base = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("lang"), col("text"))
        val crawl = base.unionAll(
          base.filter(pmod(col("doc_id"), lit(5)) === 0)
            .withColumn("doc_id", col("doc_id") + 100000L))
        val cleaned = crawl
          .select(col("doc_id"), col("source"), col("lang"), dirt.as("t"))
          .select(col("doc_id"), col("source"), col("lang"),
            trim(regexp_replace(regexp_replace(col("t"), "[\\x00-\\x1f]",
              " "), "  +", " ")).as("cleaned"))
        val gated = cleaned
          .withColumn("n_tokens",
            size(split(trim(col("cleaned")), " +")).cast("long"))
          .filter(col("lang").isin("en", "de", "fr", "es")
            && col("n_tokens") >= 20)
        val wd = Window.partitionBy(md5(col("cleaned"))).orderBy(col("doc_id"))
        val deduped = gated
          .withColumn("dup_rank", row_number().over(wd))
          .filter(col("dup_rank") === 1)
        val shard = pmod(col("doc_id"), lit(8L))
        val wp = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        deduped
          .select(col("doc_id"), col("source"), col("n_tokens"),
            shard.as("shard"))
          .withColumn("tok_before",
            coalesce(sum(col("n_tokens")).over(wp), lit(0L)))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            (col("shard") * 1000000L + floor(col("tok_before") / 512L))
              .as("pack_id"))
          .orderBy("doc_id")
      },
      Some("""WITH crawl AS (
          SELECT doc_id, source, lang, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, source, lang, text
          FROM documents WHERE doc_id % 5 = 0),
        cleaned AS (
          SELECT doc_id, source, lang,
            trim(regexp_replace(regexp_replace(
              text || ' ' || chr(9) || 'tail' || chr(7)
                || repeat(' ', CAST(2 + doc_id % 3 AS INT)) || 'end',
              '[\x00-\x1f]', ' ', 'g'), '  +', ' ', 'g')) AS cleaned
          FROM crawl),
        gated AS (
          SELECT *, CAST(len(string_split_regex(trim(cleaned), ' +'))
            AS BIGINT) AS n_tokens
          FROM cleaned
          WHERE lang IN ('en', 'de', 'fr', 'es')
            AND len(string_split_regex(trim(cleaned), ' +')) >= 20),
        deduped AS (
          SELECT doc_id, source, n_tokens
          FROM gated
          QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(cleaned)
            ORDER BY doc_id) = 1),
        packed AS (
          SELECT doc_id, source, n_tokens,
            (doc_id % 8) * 1000000
              + CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
                  PARTITION BY doc_id % 8 ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) / 512) AS BIGINT) AS pack_id
          FROM deduped)
        SELECT doc_id, source, n_tokens, pack_id
        FROM packed ORDER BY doc_id"""),
      "the end-to-end preprocessing capstone: re-crawl union -> C4 " +
        "hygiene -> language/quality gate -> exact dedup on CLEANED " +
        "text (catches the re-crawl under different dirt) -> per-shard " +
        "sequence packing; one composed query, every shuffle on a " +
        "hash/id key"),

    QueryDef(
      "d31_inverted_index",
      (s, dir) => {
        // Inverted-index build (term → capped posting list + df/tf): the
        // retrieval-side artifact a RAG corpus ships with. The hot-term
        // hazard at 100 TB is collect_list on a stopword gathering the
        // whole corpus into one task — so the posting list is capped
        // BEFORE collection by the native O(k)-memory TopKPerKey
        // operator (bounded heap per term, never a full per-term sort or
        // an unbounded buffer), and only the ≤20 survivors are
        // collected. df/total_tf come from a separate full aggregate —
        // exact counts, bounded output.
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(toks(col("text"))).as("term"))
          .filter(col("term") =!= "")
        val stats = tok.groupBy("term")
          .agg(count(lit(1)).as("total_tf"),
            count_distinct(col("doc_id")).as("df"))
        val docTerm = tok.select("term", "doc_id").distinct()
        val capped = graft.plans.TopKPerKey.of(
          docTerm, Seq("term"), Seq("doc_id" -> true), 20)
        val postings = capped.groupBy("term")
          // canonical comma-joined string form: sorts/hashes exactly in
          // any downstream comparator (and is what an index file stores)
          .agg(concat_ws(",", transform(
            sort_array(collect_list(col("doc_id"))),
            d => d.cast("string"))).as("postings"))
        stats.join(postings, "term")
          .select("term", "total_tf", "df", "postings")
          .orderBy("term")
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, unnest($toksSql) AS term FROM documents),
        tk2 AS (SELECT * FROM tk WHERE term <> ''),
        dt AS (SELECT DISTINCT term, doc_id FROM tk2)
        SELECT s.term, s.total_tf, s.df, p.postings
        FROM (SELECT term, COUNT(*) AS total_tf,
                COUNT(DISTINCT doc_id) AS df
              FROM tk2 GROUP BY term) s
        JOIN (SELECT term,
                array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings
              FROM dt GROUP BY term) p USING (term)
        ORDER BY term"""),
      "inverted-index build: term -> first-20 posting list + exact " +
        "df/total_tf; the cap is enforced by the native O(k) TopKPerKey " +
        "operator BEFORE collection, so a stopword's postings never " +
        "buffer unbounded"),

    QueryDef(
      "d32_setsim_join",
      (s, dir) => setsimPairs(s, dir).orderBy("id_a", "id_b"),
      // The oracle proves EXACTNESS independently of prefix filtering:
      // it finds pairs by the shared-shingle equi-join (any pair with
      // J > 0 shares a shingle) and counts intersections directly —
      // a different algorithm computing the same relation.
      Some(s"""WITH d AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len($toksSql) - 1),
            i -> $toksSql[i] || ' ' || $toksSql[i+1] || ' ' || $toksSql[i+2]))
            AS sh
          FROM documents WHERE len($toksSql) >= 3),
        s AS (SELECT doc_id, unnest(sh) AS s1 FROM d),
        sz AS (SELECT doc_id, len(sh) AS n FROM d),
        io AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
               FROM s a JOIN s b ON a.s1 = b.s1 AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
        FROM io
        JOIN sz na ON io.id_a = na.doc_id
        JOIN sz nb ON io.id_b = nb.doc_id
        WHERE 2 * i >= na.n + nb.n - i
        ORDER BY id_a, id_b"""),
      "exact set-similarity join (shingle Jaccard >= 0.5) by prefix " +
        "filtering over the FULL corpus — d6's semantics without the " +
        "doc_id bound and without d7's approximation; candidates come " +
        "from an equi-join on rarest-first prefix shingles only"),

    QueryDef(
      "d33_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        // Distributed heavy hitters, sketch-then-verify: a Misra-Gries
        // summary (<= 29 counters, one narrow pass, mergeable) surfaces
        // every candidate that COULD exceed n/30, then one exact
        // aggregation re-counts only those candidates and applies the
        // true integer threshold. The sketch's candidate set varies
        // with the merge schedule; the verified output never does —
        // it equals the exact GROUP BY / HAVING answer (the oracle)
        // while the expensive pass stays O(k) memory per task. At
        // 100 TB with a huge key domain this replaces a full-domain
        // groupBy with a bounded sketch + a sketch-sized verify join.
        val tok = t(s, dir, "documents")
          .select(explode(toks(col("text"))).as("token"))
          .filter(col("token") =!= "")
        val mg = new graft.operators.MisraGries(30)
        val cands = tok.as[String].select(mg.toColumn.name("cands"))
          .select(explode(col("cands")).as("token"))
        val total = tok.agg(count(lit(1)).as("n_total"))
        tok.groupBy("token").agg(count(lit(1)).as("cnt"))
          .join(broadcast(cands), Seq("token")) // sketch-sized: <= 29 rows
          .crossJoin(broadcast(total)) // 1 row
          .filter(col("cnt") * 30 > col("n_total"))
          .select(col("token"), col("cnt"))
          .orderBy("token")
      },
      Some(s"""WITH tk AS (SELECT unnest($toksSql) AS token FROM documents),
        tk2 AS (SELECT token FROM tk WHERE token <> '')
        SELECT token, COUNT(*) AS cnt FROM tk2 GROUP BY token
        HAVING 30 * COUNT(*) > (SELECT COUNT(*) FROM tk2)
        ORDER BY token"""),
      "heavy hitters (tokens with count > n/30) by Misra-Gries sketch + " +
        "exact verify: the one-pass O(k)-memory candidate pass is " +
        "schedule-dependent, the verified output is exact and " +
        "deterministic — matches the plain GROUP BY/HAVING oracle"),

    QueryDef(
      "d34_containment_probe",
      (s, dir) => {
        // Directed CONTAINMENT join (|probe ∩ doc| / |probe| >= 0.8):
        // the asymmetric near-superset relation Jaccard misses — a tiny
        // quotation/benchmark snippet inside a big document scores ~0 on
        // Jaccard but 1.0 on containment. This is d18's decontamination
        // question asked with a graded score instead of a binary
        // any-overlap flag: probes (first-14-token snippets of every
        // 29th doc — the stand-in for an external benchmark/quotation
        // set) against the WHOLE corpus. Exact, via the count-join
        // shape: probe shingles equi-join corpus shingles, per-pair
        // intersection counts from ONE groupBy, integer threshold
        // (5i >= 4|S|) — never an all-pairs product; both probe and
        // corpus sides shuffle only on the shingle key, so the plan is
        // the d21 count-join at heart and scales the same way.
        val tk = t(s, dir, "documents")
          .select(col("doc_id"), toks(col("text")).as("tok"))
          .cache() // barrier: the shingle lambdas below reference tok 3x
        //             per element — without it CollapseProject inlines the
        //             regex split into every element_at (the minhashLshPairs
        //             lesson; measured 8.4s -> ~1s at sf0.1)
        val d = tk.filter(size(col("tok")) >= 3)
          .select(col("doc_id"), Approx.shinglesOfTokens(col("tok")).as("sh"))
        val sn = tk.filter(col("doc_id") % 29 === 0)
          .select(col("doc_id").as("sid"), slice(col("tok"), 1, 14).as("st"))
          .filter(size(col("st")) >= 3)
          .select(col("sid"), Approx.shinglesOfTokens(col("st")).as("ssh"))
          .cache() // probe table read twice: sizes + flattened shingles
        val ps = sn.select(col("sid"), size(col("ssh")).as("n"))
        val pf = sn.select(col("sid"), explode(col("ssh")).as("s1"))
        val cf = d.select(col("doc_id"), explode(col("sh")).as("s1"))
        pf.join(cf, "s1")
          .groupBy("sid", "doc_id").agg(count(lit(1)).as("i"))
          .join(ps, "sid")
          .filter(col("i") * 5 >= col("n") * 4 && col("doc_id") =!= col("sid"))
          .select(col("sid"), col("doc_id"),
            (col("i").cast("double") / col("n").cast("double"))
              .as("containment"))
          .orderBy("sid", "doc_id")
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, $toksSql AS tok FROM documents),
        d AS (SELECT doc_id, list_distinct(list_transform(
            range(1, len(tok) - 1),
            i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS sh
          FROM tk WHERE len(tok) >= 3),
        sn AS (SELECT doc_id AS sid, list_distinct(list_transform(
            range(1, len(tok[1:14]) - 1),
            i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS ssh
          FROM tk WHERE doc_id % 29 = 0 AND len(tok[1:14]) >= 3),
        ps AS (SELECT sid, len(ssh) AS n FROM sn),
        pf AS (SELECT sid, unnest(ssh) AS s1 FROM sn),
        cf AS (SELECT doc_id, unnest(sh) AS s1 FROM d),
        io AS (SELECT sid, doc_id, COUNT(*) AS i
               FROM pf JOIN cf USING (s1) GROUP BY 1, 2)
        SELECT sid, doc_id,
          CAST(i AS DOUBLE) / CAST(n AS DOUBLE) AS containment
        FROM io JOIN ps USING (sid)
        WHERE 5 * i >= 4 * n AND doc_id <> sid
        ORDER BY sid, doc_id"""),
      "directed containment join (snippet-in-document >= 0.8): the " +
        "asymmetric relation Jaccard misses — exact per-pair scores " +
        "from one shingle equi-join + one count groupBy, never an " +
        "all-pairs product; the graded form of d18's decontamination"),

    QueryDef(
      "d35_bm25",
      (s, dir) => {
        // BM25 lexical retrieval scoring (Robertson et al.; k1=1.2,
        // b=0.75) for a 3-term query over the corpus — the scorer that
        // pairs with d31's inverted index to complete the retrieval
        // story next to the ANN tiers. Two libm/determinism moves:
        // (1) idf is the RATIONAL proxy (N−df+0.5)/(df+0.5) — d15's
        // ln-free discipline (ln is monotone, ranking unchanged);
        // (2) the per-doc score is the sum of THREE FIXED COLUMNS in
        // one syntactic order — a groupBy sum over doubles would be
        // schedule-dependent. Every arithmetic op is IEEE double with
        // the identical tree in the oracle, so top-20 is bit-exact.
        // Query mixes two stopword-frequent terms with one rare term
        // ('dup', df 26/500) so both tf saturation AND idf are
        // load-bearing. Scale shape: stats are two aggregates, the
        // 3-row df table and the 1-row totals broadcast; final top-20
        // is TakeOrderedAndProject (never a global sort).
        val terms = Seq("join", "merge", "dup")
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(toks(col("text"))).as("term"))
          .filter(col("term") =!= "")
        val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val tot = tok.agg(count(lit(1)).as("ll"),
          count_distinct(col("doc_id")).as("nn"))
        val dfT = tok.filter(col("term").isInCollection(terms))
          .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
        val tfT = tok.filter(col("term").isInCollection(terms))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val scored = tfT.join(broadcast(dfT), "term").join(dl, "doc_id")
          .crossJoin(broadcast(tot)) // 1 row
          .withColumn("score",
            (col("nn") - col("df") + 0.5) / (col("df") + 0.5) *
              (col("tf") * 2.2) /
              (col("tf") + lit(1.2) *
                (lit(0.25) + lit(0.75) * col("dl") * col("nn") / col("ll"))))
        def sTerm(tm: String) = coalesce(
          max(when(col("term") === tm, col("score"))), lit(0.0))
        scored.groupBy("doc_id")
          .agg(sTerm("join").as("s_join"), sTerm("merge").as("s_merge"),
            sTerm("dup").as("s_dup"))
          .withColumn("bm25", col("s_join") + col("s_merge") + col("s_dup"))
          .select("doc_id", "bm25")
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, unnest($toksSql) AS term FROM documents),
        tk2 AS (SELECT * FROM tk WHERE term <> ''),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk2 GROUP BY 1),
        tot AS (SELECT COUNT(*) AS ll, COUNT(DISTINCT doc_id) AS nn
                FROM tk2),
        dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tk2
                WHERE term IN ('join', 'merge', 'dup') GROUP BY 1),
        tft AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk2
                WHERE term IN ('join', 'merge', 'dup') GROUP BY 1, 2),
        scored AS (
          SELECT t.doc_id, t.term,
            (nn - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)) *
              (tf * CAST(2.2 AS DOUBLE)) /
              (tf + CAST(1.2 AS DOUBLE) *
                (CAST(0.25 AS DOUBLE) +
                 CAST(0.75 AS DOUBLE) * dl * nn / ll)) AS score
          FROM tft t JOIN dft USING (term) JOIN dl USING (doc_id), tot),
        psc AS (SELECT doc_id,
            COALESCE(MAX(CASE WHEN term = 'join' THEN score END),
              CAST(0 AS DOUBLE)) AS s_join,
            COALESCE(MAX(CASE WHEN term = 'merge' THEN score END),
              CAST(0 AS DOUBLE)) AS s_merge,
            COALESCE(MAX(CASE WHEN term = 'dup' THEN score END),
              CAST(0 AS DOUBLE)) AS s_dup
          FROM scored GROUP BY doc_id)
        SELECT doc_id, s_join + s_merge + s_dup AS bm25
        FROM psc ORDER BY bm25 DESC, doc_id LIMIT 20"""),
      "BM25 top-20 retrieval (k1=1.2, b=0.75, rational idf proxy — " +
        "d15's ln-free discipline): fixed-column per-term sums keep the " +
        "double math schedule-independent and bit-exact vs the oracle; " +
        "stats broadcast, top-k is TakeOrderedAndProject"),

    QueryDef(
      "d36_pair_mining",
      (s, dir) => {
        // Contrastive pair mining — the supervision step of embedding-
        // model training (SimCSE/CLIP-style): positives are the corpus's
        // REAL near-duplicate pairs (d32's exact Jaccard >= 0.5 join,
        // read as supervision instead of waste — this corpus has no
        // byte-identical dups, so exact-fingerprint positives would be
        // vacuous), negatives are hash-derived pseudo-random partners
        // anti-joined against the positive set so a sampled "negative"
        // can never be a true near-dup. Everything is deterministic —
        // the negative generator is a pure function of the anchor id
        // (the d22/d27 stability argument applied to pair sampling), so
        // the mined set is reproducible run-to-run. Scale shape: the
        // positive mine is d32's prefix-filtered join; negatives are
        // two id equi-joins + one normalized equi anti-join; no RNG, no
        // corpus product.
        val n = t(s, dir, "documents").count()
        val posPairs = setsimPairs(s, dir)
          .select(col("id_a"), col("id_b")).cache() // read 2x: pos + anti
        val pos = posPairs
          .select(col("id_a").as("anchor"), col("id_b").as("other"),
            lit(1L).as("label"))
        val anchors = pos.select("anchor").distinct()
        val negCand = anchors
          .withColumn("other", explode(array(
            (col("anchor") * 7 + 13) % n, (col("anchor") * 31 + 7) % n)))
          .filter(col("other") =!= col("anchor"))
          .distinct()
        val negs = negCand
          .withColumn("lo", least(col("anchor"), col("other")))
          .withColumn("hi", greatest(col("anchor"), col("other")))
          .join(posPairs.select(col("id_a").as("lo"), col("id_b").as("hi")),
            Seq("lo", "hi"), "left_anti") // normalized equi anti-join
          .select(col("anchor"), col("other"), lit(0L).as("label"))
        pos.unionAll(negs).orderBy("anchor", "other", "label")
      },
      Some(s"""WITH d AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len($toksSql) - 1),
            i -> $toksSql[i] || ' ' || $toksSql[i+1] || ' ' || $toksSql[i+2]))
            AS sh
          FROM documents WHERE len($toksSql) >= 3),
        sp AS (SELECT doc_id, unnest(sh) AS s1 FROM d),
        sz AS (SELECT doc_id, len(sh) AS nsh FROM d),
        io AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
               FROM sp a JOIN sp b ON a.s1 = b.s1 AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        pos AS (SELECT id_a AS anchor, id_b AS other,
            CAST(1 AS BIGINT) AS label
          FROM io
          JOIN sz na ON io.id_a = na.doc_id
          JOIN sz nb ON io.id_b = nb.doc_id
          WHERE 2 * i >= na.nsh + nb.nsh - i),
        anchors AS (SELECT DISTINCT anchor FROM pos),
        nn AS (SELECT COUNT(*) AS n FROM documents),
        negcand AS (
          SELECT DISTINCT anchor, other FROM (
            SELECT anchor, (anchor * 7 + 13) % n AS other FROM anchors, nn
            UNION ALL
            SELECT anchor, (anchor * 31 + 7) % n FROM anchors, nn)
          WHERE other <> anchor),
        negs AS (
          SELECT c.anchor, c.other, CAST(0 AS BIGINT) AS label
          FROM negcand c
          LEFT JOIN pos p ON p.anchor = LEAST(c.anchor, c.other)
            AND p.other = GREATEST(c.anchor, c.other)
          WHERE p.anchor IS NULL)
        SELECT anchor, other, label FROM pos
        UNION ALL SELECT anchor, other, label FROM negs
        ORDER BY anchor, other, label"""),
      "contrastive pair mining: real near-dup pairs (d32's exact " +
        "setsim join) as positives, hash-derived deterministic " +
        "negatives anti-joined against the positive set — reproducible " +
        "supervision for embedding training, all equi-joins"),

    QueryDef(
      "d37_canonical_select",
      (s, dir) => {
        // Canonical representative selection — the "which doc do we
        // KEEP" step that completes the dedup story: d11 keeps the
        // min-id doc per cluster (arbitrary); real curation keeps the
        // BEST one. Clusters come from the FULL-corpus exact setsim
        // pairs (memoized d32 helper) via distributed connected
        // components; the representative is the per-cluster argmax on
        // (token count desc, doc_id asc) — a struct-min, deterministic
        // under ties. Every doc appears (singletons are their own
        // canonical), so the output is a complete keep/drop decision
        // table. Scale shape: CC's equi-join rounds + one bounded
        // struct-min aggregate + one broadcast-back join.
        val pairs = setsimPairs(s, dir)
        val docs = t(s, dir, "documents")
          .select(col("doc_id"),
            size(toks(col("text"))).cast("long").as("quality"))
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        val nodes = docs.select(col("doc_id").as("node"))
        val cc = graft.operators.ConnectedComponents.minLabel(nodes, edges)
        val labeled = cc.select(col("node").as("doc_id"), col("cluster"))
          .join(docs, "doc_id")
        val reps = labeled.groupBy("cluster")
          .agg(min(struct((-col("quality")).as("nq"), col("doc_id")))
            .as("best"))
          .select(col("cluster"), col("best").getField("doc_id").as("rep"))
        labeled.join(reps, "cluster")
          .select(col("doc_id"), col("cluster").as("cluster_id"),
            col("quality"), col("rep"),
            (col("doc_id") === col("rep")).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE d AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len($toksSql) - 1),
            i -> $toksSql[i] || ' ' || $toksSql[i+1] || ' ' || $toksSql[i+2]))
            AS sh
          FROM documents WHERE len($toksSql) >= 3),
        sp AS (SELECT doc_id, unnest(sh) AS s1 FROM d),
        szs AS (SELECT doc_id, len(sh) AS nsh FROM d),
        io AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
               FROM sp a JOIN sp b ON a.s1 = b.s1 AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        prs AS (SELECT id_a, id_b FROM io
          JOIN szs na ON io.id_a = na.doc_id
          JOIN szs nb ON io.id_b = nb.doc_id
          WHERE 2 * i >= na.nsh + nb.nsh - i),
        docs AS (SELECT doc_id,
            len($toksSql) AS quality
          FROM documents),
        sym AS (
          SELECT id_a AS src, id_b AS dst FROM prs
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM prs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM docs
          UNION
          SELECT s.dst, r.lbl FROM reach r JOIN sym s ON r.node = s.src),
        cc AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
               FROM reach GROUP BY node),
        lab AS (SELECT c.doc_id, c.cluster_id, d2.quality
                FROM cc c JOIN docs d2 ON c.doc_id = d2.doc_id),
        reps AS (SELECT cluster_id, doc_id AS rep FROM lab
          QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster_id
            ORDER BY quality DESC, doc_id ASC) = 1)
        SELECT l.doc_id, l.cluster_id, l.quality, r.rep,
          l.doc_id = r.rep AS keep
        FROM lab l JOIN reps r USING (cluster_id)
        ORDER BY l.doc_id"""),
      "canonical selection: full-corpus near-dup clusters (setsim pairs " +
        "+ distributed CC) with the BEST doc kept per cluster (quality " +
        "argmax, deterministic tie-break) — the complete keep/drop " +
        "decision table, singletons included"),

    QueryDef(
      "d39_count_min",
      (s, dir) => {
        // Count-min sketch (Cormode & Muthukrishnan 2005) AS DATAFLOW —
        // the third sketch workhorse next to q21's HLL and d33's
        // Misra-Gries, and unlike both it is fully ORACLE-CHECKABLE:
        // CMS cells are pure order-free sums under deterministic md5
        // hashes, so the whole sketch AND every point estimate are
        // bit-reproducible at any parallelism and expressible in SQL.
        // Sketch = depth 3 × width 64 (one (r, bucket) count table of
        // 192 rows REGARDLESS of corpus size — the point of a sketch);
        // est(w) = min over rows of the w-hashing cell, so est ≥ true
        // always (the one-sided CMS guarantee, exposed as `overest`,
        // and genuinely load-bearing here: the vocabulary collides
        // inside width 64, so min-over-rows is doing real work). Scale
        // shape: the corpus-scale stage is one token explode + one
        // 192-cell aggregate (map-side partial sums collapse everything
        // before the shuffle); probes join the broadcast-sized sketch.
        val hexDig = "'0123456789abcdef'"
        val tk = t(s, dir, "documents")
          .select(explode(toks(col("text"))).as("w"))
        val inst = tk
          .withColumn("r", explode(array(lit(0L), lit(1L), lit(2L))))
          .withColumn("h",
            md5(concat(col("r").cast("string"), lit(":"), col("w"))))
          .selectExpr("w", "r",
            s"CAST(((instr($hexDig, substr(h, 1, 1)) - 1) % 4) * 16" +
              s" + (instr($hexDig, substr(h, 2, 1)) - 1) AS BIGINT) AS bucket")
        val sketch = inst.groupBy(col("r"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val tru = tk.groupBy(col("w")).agg(count(lit(1)).as("true_n"))
        val est = inst.select("w", "r", "bucket").distinct()
          .join(broadcast(sketch), Seq("r", "bucket"))
          .groupBy(col("w")).agg(min(col("cnt")).as("est_n"))
        tru.join(est, "w")
          .select(col("w").as("token"), col("true_n"), col("est_n"),
            (col("est_n") - col("true_n")).as("overest"))
          .orderBy("token")
      },
      Some("""WITH tk AS (
          SELECT unnest(string_split_regex(trim(text), ' +')) AS w
          FROM documents),
        inst AS (
          SELECT w, r,
            ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 4) * 16
              + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket
          FROM (SELECT w, CAST(t.r AS BIGINT) AS r,
              md5(CAST(t.r AS VARCHAR) || ':' || w) AS h
            FROM tk, UNNEST(range(0, 3)) t(r))),
        sketch AS (
          SELECT r, bucket, COUNT(*) AS cnt FROM inst GROUP BY 1, 2),
        tru AS (SELECT w, COUNT(*) AS true_n FROM tk GROUP BY 1),
        pk AS (SELECT DISTINCT w, r, bucket FROM inst),
        est AS (
          SELECT pk.w, MIN(s.cnt) AS est_n
          FROM pk JOIN sketch s USING (r, bucket) GROUP BY 1)
        SELECT t.w AS token, CAST(t.true_n AS BIGINT) AS true_n,
          CAST(e.est_n AS BIGINT) AS est_n,
          CAST(e.est_n - t.true_n AS BIGINT) AS overest
        FROM tru t JOIN est e USING (w) ORDER BY token"""),
      "count-min sketch as dataflow (depth 3 x width 64): corpus " +
        "collapses to a 192-cell count table via map-side partial sums, " +
        "point estimates = min over rows — deterministic md5 cells make " +
        "sketch AND estimates exactly oracle-checkable, est >= true " +
        "exposed per token"),

    QueryDef(
      "d40_ols_suffstats",
      (s, dir) => {
        // Supervised training at the 100 TB shape: ordinary least
        // squares by SUFFICIENT STATISTICS — the whole corpus collapses
        // to six order-free integer sums (n, Σx, Σy, Σx², Σxy, Σy²) in
        // ONE map-side-combining aggregate pass, and the model solves
        // in closed form from that 1-row frame (no iterations, no
        // gradient schedule, nothing touches the corpus twice). Here:
        // predict a document's n_chars from its token count — a real,
        // strong linear relation (chars ≈ tokens · (mean word length
        // + 1)), so the r² verdict is load-bearing. EXACT: the moments
        // are BIGINT; slope/r² are built ONLY from ratios of exact-
        // in-double integers (covariance terms < 2^53 at these scales
        // — the DECIMAL moment path is the same shape when they grow),
        // so every derived double is the same correctly-rounded
        // operation tree in both engines. r² is computed as
        // (num/den1)·(num/den2) — never squaring a BIGINT past 63
        // bits, never casting a wide DECIMAL to DOUBLE.
        val d = t(s, dir, "documents")
          .select(size(toks(col("text"))).cast("long").as("x"),
            col("n_chars").as("y"))
        d.agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              .as("slope"),
            col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
          .select(col("n"), col("slope"),
            ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
              / col("n").cast("double")).as("intercept"),
            (((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
              .as("r2"))
      },
      Some("""WITH d AS (
          SELECT len(string_split_regex(trim(text), ' +')) AS x,
            n_chars AS y
          FROM documents),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(x * y) AS BIGINT) AS sxy,
            CAST(SUM(y * y) AS BIGINT) AS syy
          FROM d)
        SELECT n,
          CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
          (CAST(sy AS DOUBLE)
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
            / CAST(n AS DOUBLE) AS intercept,
          (CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE))
          * (CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * syy - sy * sy AS DOUBLE)) AS r2
        FROM m"""),
      "OLS by sufficient statistics: six order-free integer moments in " +
        "one map-side-combining pass, closed-form slope/intercept/r2 " +
        "from the 1-row frame — supervised training that touches the " +
        "corpus exactly once, bit-exact across engines"),

    QueryDef(
      "d41_novelty",
      (s, dir) => {
        // Per-document NOVELTY — what fraction of a doc's content is
        // first seen HERE? (the curation signal behind "diminishing
        // returns" mixing: late near-copies of earlier content score
        // ~0 and can be down-weighted without a pairwise dedup pass).
        // Attribution is by global first occurrence: each distinct
        // 3-shingle belongs to the LOWEST doc_id containing it (the
        // deterministic stand-in for ingest order), one min-groupBy on
        // the shingle; a doc's novelty = novel shingles / its distinct
        // shingles — two exact integers, one IEEE division. Scale
        // shape: one explode + one shingle-key aggregate + one doc-key
        // aggregate — the d21 count-join discipline, never pairwise.
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), toks(col("text")).as("tok"))
          .filter(size(col("tok")) >= 3)
          .cache() // barrier: the shingle lambda references tok 3x
        val sh = docs
          .select(col("doc_id"),
            explode(Approx.shinglesOfTokens(col("tok"))).as("s"))
        val first = sh.groupBy(col("s"))
          .agg(min(col("doc_id")).as("first_doc"))
        sh.join(first, "s")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_shingles"), col("n_novel"),
            (col("n_novel").cast("double") / col("n_shingles").cast("double"))
              .as("novelty"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len($toksSql) - 1),
            i -> $toksSql[i] || ' ' || $toksSql[i+1] || ' ' ||
                 $toksSql[i+2])) AS sh
          FROM documents WHERE len($toksSql) >= 3),
        e AS (SELECT doc_id, UNNEST(sh) AS s FROM d),
        f AS (SELECT s, MIN(doc_id) AS first_doc FROM e GROUP BY s)
        SELECT e.doc_id, COUNT(*) AS n_shingles,
          CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
          CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM e JOIN f ON e.s = f.s
        GROUP BY e.doc_id ORDER BY e.doc_id"""),
      "per-doc novelty scoring: every distinct 3-shingle attributed to " +
        "its first-occurrence doc (one min-groupBy), novelty = novel / " +
        "total shingles — the diminishing-returns curation signal, " +
        "linear count-join shape, never pairwise"),

    QueryDef(
      "d42_bpe_train",
      (s, dir) => {
        // BPE tokenizer TRAINING as dataflow (Sennrich et al. 2016) —
        // d10 APPLIES fixed merge rules; this LEARNS them from the
        // corpus. The classic two-phase shape that makes it cheap at
        // 100 TB: the corpus is touched ONCE (word-frequency dict),
        // then every merge iteration runs over the VOCAB-sized dict —
        // pair counts are frequency-weighted sums, the argmax merge is
        // deterministic (count desc, pair asc), and applying a merge
        // is a BOUNDARY-ANCHORED left-to-right non-overlapping replace
        // on the space-separated symbol string: separators are doubled
        // so every symbol owns a space on each side, the padded pattern
        // ' a  b ' can then only match a whole adjacent symbol pair
        // (never the tail of a multi-char symbol like 'xa' + 'b'), and
        // the doubled separators collapse back afterwards. replace()'s
        // left-to-right non-overlap IS BPE's greedy order (a a a ->
        // [aa, a]), and the same three nested replaces run identically
        // on BOTH engines.
        // Each iteration collects ONE row (the argmax pair) — driver
        // metadata, same class as e2's literal planes. Output: the 5
        // learned merges with their exact weighted counts.
        val wf = t(s, dir, "documents")
          .select(explode(toks(col("text"))).as("w0"))
          .select(regexp_replace(lower(col("w0")), "[^a-z]", "").as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("w").agg(count(lit(1)).as("f"))
          .withColumn("ws", trim(regexp_replace(col("w"), "(.)", "$1 ")))
          .select("ws", "f")
          .stableCheckpoint() // ONE corpus pass; iterations run on the dict
        var dict = wf
        val merges = scala.collection.mutable.ArrayBuffer
          .empty[(Long, String, String, Long)]
        for (step <- 0 until 5) {
          val best = dict
            .select(col("f"), split(col("ws"), " ").as("sp"))
            .filter(size(col("sp")) >= 2)
            .select(col("f"), explode(expr(
              "transform(sequence(1, size(sp) - 1), " +
                "i -> concat(element_at(sp, i), ' ', element_at(sp, i + 1)))"))
              .as("p"))
            .groupBy("p").agg(sum(col("f")).as("cnt"))
            .orderBy(col("cnt").desc, col("p"))
            .limit(1).collect().head
          val pair = best.getString(0); val cnt = best.getLong(1)
          val merged = pair.replace(" ", "")
          merges += ((step.toLong, pair, merged, cnt))
          val pairD = pair.replace(" ", "  ") // doubled-separator pattern
          dict = dict
            .withColumn("ws", expr(
              s"trim(replace(replace(concat(' ', replace(ws, ' ', '  '), ' '), " +
                s"' $pairD ', ' $merged '), '  ', ' '))"))
            .stableCheckpoint() // constant plan depth across iterations
        }
        import s.implicits._
        merges.toSeq.toDF("step", "pair", "merged", "cnt").orderBy("step")
      },
      Some {
        val steps = (1 to 5).map { k =>
          s"""p$k AS (
          SELECT pr AS p, CAST(SUM(f) AS BIGINT) AS cnt
          FROM (SELECT f, UNNEST(list_transform(
              range(1, len(string_split(ws, ' '))),
              i -> string_split(ws, ' ')[i] || ' ' ||
                   string_split(ws, ' ')[i+1])) AS pr
            FROM d${k - 1})
          GROUP BY pr),
        b$k AS (SELECT p, cnt FROM p$k ORDER BY cnt DESC, p LIMIT 1),
        d$k AS (SELECT trim(replace(replace(
            ' ' || replace(d.ws, ' ', '  ') || ' ',
            ' ' || replace(b.p, ' ', '  ') || ' ',
            ' ' || replace(b.p, ' ', '') || ' '), '  ', ' ')) AS ws,
          d.f FROM d${k - 1} d, b$k b)"""
        }.mkString(",\n        ")
        s"""WITH tok AS (
          SELECT regexp_replace(lower(t.w0), '[^a-z]', '', 'g') AS w
          FROM documents, UNNEST($toksSql) t(w0)),
        wf AS (SELECT w, COUNT(*) AS f FROM tok
          WHERE len(w) > 0 GROUP BY w),
        d0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS ws, f
          FROM wf),
        $steps
        ${(1 to 5).map(k =>
          s"SELECT CAST(${k - 1} AS BIGINT) AS step, p AS pair, " +
            s"replace(p, ' ', '') AS merged, cnt FROM b$k")
          .mkString("\n        UNION ALL ")}
        ORDER BY step"""
      },
      "BPE merge training (5 steps): one corpus pass builds the word-" +
        "frequency dict, each iteration counts weighted symbol pairs " +
        "over the VOCAB-sized dict, deterministic argmax, replace() " +
        "applies the merge with BPE's own greedy left-to-right order — " +
        "tokenizer training that touches the corpus exactly once")
  )

}
