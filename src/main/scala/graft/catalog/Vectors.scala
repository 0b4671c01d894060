package graft.catalog

import graft.Ckpt.StableCheckpoint
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * e1 is the brute-force cosine top-k baseline, fully oracle-checked:
  * float values are exact binary; float*float products in double are exact
  * (24+24 <= 53 mantissa bits); both engines fold the product list
  * sequentially left-to-right, so cosines are bit-identical and the
  * ranking (with vec_id tiebreak) matches exactly.
  *
  * The LSH-bucketed scale path lives in Similarity.scala (rows-only check
  * + recall spec against this baseline).
  */
object Vectors {
  import Tables.t

  /** cast float array to double once */
  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  /** sequential-fold dot product — compiled expression, bit-compatible
    * with the `aggregate(zip_with(...))` HOF formulation AND the DuckDB
    * `list_reduce` oracle (identical left-to-right IEEE addition) */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** fused one-pass cosine — bit-identical to dot/(norm·norm) (see
    * CosineSim), 3× fewer array traversals in the ANN/dedup inner loops */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosine_sim(a, b)

  /** e1's body, shared with e14's recall evaluation: exact brute-force
    * cosine top-3 per query (broadcast-queries shape, (cos desc, c_id)
    * tie-break) — the ground truth every ANN tier measures against. */
  def exactTop3(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), dvec(col("embedding")).as("qv"))
    val c = emb.select(col("vec_id").as("c_id"), dvec(col("embedding")).as("cv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("q_id", "c_id", "rk", "cos")
      .orderBy("q_id", "rk")
  }

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "e4_embed_dedup",
      (s, dir) => {
        // embedding-cosine near-duplicate dedup: pairs with cosine >= τ,
        // keep the lower vec_id as the representative. Brute force over a
        // bounded id slice — the EXACTNESS BASELINE for e8_embed_dedup_ivf
        // (the full-corpus scale path, which pins its recall against this
        // slice); bit-identical cosines make the oracle exact.
        val emb = t(s, dir, "embeddings").filter(col("vec_id") < 300)
          .select(col("vec_id"), dvec(col("embedding")).as("dv"))
        val a = emb.select(col("vec_id").as("id_a"), col("dv").as("va"))
        val b = emb.select(col("vec_id").as("id_b"), col("dv").as("vb"))
        a.join(b, col("id_a") < col("id_b"))
          .withColumn("cos", cosine(col("va"), col("vb")))
          .filter(col("cos") >= 0.4)
          .select(col("id_a").as("keep_id"), col("id_b").as("dup_id"), col("cos"))
          .orderBy("keep_id", "dup_id")
      },
      Some("""WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings WHERE vec_id < 300)
        SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
          list_reduce(list_transform(range(1, len(a.e) + 1),
            i -> a.e[i] * b.e[i]), (x, y) -> x + y)
          / (sqrt(list_reduce(list_transform(a.e, x -> x * x), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(b.e, x -> x * x), (x, y) -> x + y)))
            AS cos
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_reduce(list_transform(range(1, len(a.e) + 1),
            i -> a.e[i] * b.e[i]), (x, y) -> x + y)
          / (sqrt(list_reduce(list_transform(a.e, x -> x * x), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(b.e, x -> x * x), (x, y) -> x + y)))
            >= 0.4
        ORDER BY keep_id, dup_id"""),
      "embedding-cosine near-dup dedup: threshold pairs, keep lowest id"),

    QueryDef(
      "e1_cosine_topk",
      (s, dir) => exactTop3(s, dir),
      Some("""WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        pairs AS (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id,
            list_reduce(list_transform(range(1, len(q.e) + 1),
              i -> q.e[i] * c.e[i]), (a, b) -> a + b)
            / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (a, b) -> a + b))
             * sqrt(list_reduce(list_transform(c.e, x -> x * x), (a, b) -> a + b)))
              AS cos
          FROM v q JOIN v c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 8),
        ranked AS (
          SELECT q_id, c_id, cos,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
          FROM pairs)
        SELECT q_id, c_id, rk, cos FROM ranked WHERE rk <= 3
        ORDER BY q_id, rk"""),
      "brute-force cosine top-k ANN baseline (broadcast queries x all)"),

    QueryDef(
      "e5_quantize",
      (s, dir) => {
        // int8 symmetric embedding quantization — the memory-compression
        // pass before ANN serving (4x smaller vectors): per-vector
        // max-abs scale, q_i = floor(v_i/scale + 0.5) (explicit
        // round-half-up — round() half-mode differs across engines),
        // saturation count and reconstruction SSE as the quality gauges.
        // Entirely per-row array math — no shuffle at all beyond the
        // presentation sort; scales linearly forever. The SSE fold is
        // sequential left-to-right on both engines (bit-identical), and
        // max/floor/|x| are exact, so the oracle needs no tolerance.
        val dv = dvec(col("embedding"))
        val zeroVec = col("m") === 0.0 // all-zero vector: quantize to 0s
        t(s, dir, "embeddings")
          .select(col("vec_id"), dv.as("dv"))
          .withColumn("m", array_max(transform(col("dv"), x => abs(x))))
          .withColumn("scale", col("m") / lit(127.0))
          .withColumn("q", transform(col("dv"), v =>
            when(zeroVec, lit(0L))
              .otherwise(floor(v / col("scale") + lit(0.5)))))
          .select(col("vec_id"), col("scale"),
            size(filter(col("q"), qi => abs(qi) === 127L))
              .cast("long").as("n_sat"),
            aggregate(
              zip_with(col("dv"), col("q"),
                (v, qi) => (v - qi * col("scale")) * (v - qi * col("scale"))),
              lit(0.0), (acc, x) => acc + x).as("sse"))
          .orderBy("vec_id")
      },
      Some("""WITH v AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
          FROM embeddings),
        s AS (
          SELECT vec_id, dv,
            list_aggregate(list_transform(dv, x -> abs(x)), 'max') AS m
          FROM v),
        q AS (
          SELECT vec_id, dv, m, m / 127.0 AS scale,
            list_transform(dv, x -> CASE WHEN m = 0.0 THEN 0.0
              ELSE floor(x / (m / 127.0) + 0.5) END) AS qq
          FROM s)
        SELECT vec_id, scale,
          CAST(len(list_filter(qq, y -> abs(y) = 127)) AS BIGINT) AS n_sat,
          list_reduce(
            list_prepend(0.0, list_transform(range(1, len(dv) + 1),
              i -> (dv[i] - qq[i] * scale) * (dv[i] - qq[i] * scale))),
            (a, b) -> a + b) AS sse
        FROM q ORDER BY vec_id"""),
      "int8 symmetric embedding quantization: max-abs scale, explicit " +
        "round-half-up, saturation count + reconstruction SSE (ordered " +
        "fold, bit-exact) — per-row math, shuffle-free"),

    QueryDef(
      "e9_hash_embed",
      (s, dir) => {
        // feature-hashing document embeddings (the hashing trick,
        // Weinberger et al. 2009): every token maps to one of 64
        // buckets with a ±1 sign, both read straight out of md5 hex
        // nibbles, and the document's embedding is the signed
        // bucket-count vector — the engine's REAL text→vector path
        // (the embeddings table is driver-synthetic). Emitted DENSE in
        // long format (64 rows per doc, zero-filled) so it pivots
        // losslessly to the array form e1/e5/e6 consume. All-integer —
        // no norms, no floats — so the oracle is exact. Scale: one
        // corpus scan, one (doc_id, bucket) shuffle with map-side
        // partial sums, one dense left join on the same key — linear
        // at any corpus size, 64·docs output rows.
        val hexDig = "'0123456789abcdef'"
        val inst = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("w"))
          .withColumn("h", md5(col("w")))
          .selectExpr("doc_id",
            s"CAST(((instr($hexDig, substr(h, 1, 1)) - 1) % 4) * 16" +
              s" + (instr($hexDig, substr(h, 2, 1)) - 1) AS BIGINT) AS bucket",
            s"CAST(CASE WHEN (instr($hexDig, substr(h, 3, 1)) - 1) % 2 = 0" +
              " THEN 1 ELSE -1 END AS BIGINT) AS sgn")
        val sp = inst.groupBy("doc_id", "bucket").agg(sum(col("sgn")).as("v"))
        t(s, dir, "documents")
          .select(col("doc_id"),
            explode(sequence(lit(0L), lit(63L))).as("bucket"))
          .join(sp, Seq("doc_id", "bucket"), "left")
          .select(col("doc_id"), col("bucket"),
            coalesce(col("v"), lit(0L)).as("v"))
          .orderBy("doc_id", "bucket")
      },
      Some("""WITH tk AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w
          FROM documents),
        hx AS (SELECT doc_id, md5(w) AS h FROM tk),
        b AS (
          SELECT doc_id,
            ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 4) * 16
              + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
            CASE WHEN (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) % 2 = 0
              THEN 1 ELSE -1 END AS sgn
          FROM hx),
        sp AS (
          SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS v
          FROM b GROUP BY doc_id, bucket),
        den AS (
          SELECT d.doc_id, CAST(gs.range AS BIGINT) AS bucket
          FROM (SELECT DISTINCT doc_id FROM documents) d
          CROSS JOIN range(0, 64) gs)
        SELECT den.doc_id, den.bucket,
          CAST(COALESCE(sp.v, 0) AS BIGINT) AS v
        FROM den LEFT JOIN sp
          ON den.doc_id = sp.doc_id AND den.bucket = sp.bucket
        ORDER BY den.doc_id, den.bucket"""),
      "feature-hashing (hashing-trick) document embeddings: md5-nibble " +
        "bucket + sign, signed bucket counts as a dense 64-dim integer " +
        "vector in long format — exact oracle, linear, the real " +
        "text-to-vector path that composes with e1/e5/e6"),

    QueryDef(
      "e10_knn_classify",
      (s, dir) => {
        // kNN majority-vote classification — the eval/serving stage on
        // top of similarity search: each query vector takes the label
        // voted by its 5 nearest neighbors (cosine; excluding itself),
        // ties broken (votes DESC, label ASC) so the verdict is
        // deterministic. Candidate generation here is the e1 broadcast
        // brute-force (exactness baseline; e3's IVF is the 100 TB
        // candidate path — the vote stage is identical on top of
        // either). The query side is a CONSTANT eval batch (the e1
        // discipline: vec_id < 500) — the round-7 sf0.5 bench caught
        // the previous %-of-corpus query set turning the broadcast
        // brute-force into O(N²/25) (89× time at 12.5× vectors);
        // a fixed batch keeps it O(|batch|·N), linear in the corpus.
        // The vote itself is a bounded groupBy: ≤ k rows per query
        // ever exist after the rank filter.
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
          .select(col("vec_id").as("q_id"), dvec(col("embedding")).as("qv"))
        val c = emb.select(col("vec_id").as("c_id"),
          dvec(col("embedding")).as("cv"), col("label").as("c_label"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id").asc)
        val knn = broadcast(q).join(c, col("q_id") =!= col("c_id"))
          .withColumn("cos", cosine(col("qv"), col("cv")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
        val votes = knn.groupBy(col("q_id"), col("c_label"))
          .agg(count(lit(1)).as("votes"))
        val w2 = Window.partitionBy(col("q_id"))
          .orderBy(col("votes").desc, col("c_label").asc)
        votes.withColumn("vr", row_number().over(w2))
          .filter(col("vr") === 1)
          .select(col("q_id"), col("c_label").as("pred_label"), col("votes"))
          .orderBy("q_id")
      },
      Some("""WITH v AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        pairs AS (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS c_label,
            list_reduce(list_transform(range(1, len(q.e) + 1),
              i -> q.e[i] * c.e[i]), (a, b) -> a + b)
            / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (a, b) -> a + b))
             * sqrt(list_reduce(list_transform(c.e, x -> x * x), (a, b) -> a + b)))
              AS cos
          FROM v q JOIN v c ON q.vec_id <> c.vec_id
          WHERE q.vec_id % 25 = 0 AND q.vec_id < 500),
        knn AS (
          SELECT q_id, c_label FROM (
            SELECT q_id, c_label,
              ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos DESC, c_id) AS rk
            FROM pairs) WHERE rk <= 5),
        votes AS (
          SELECT q_id, c_label, COUNT(*) AS votes
          FROM knn GROUP BY q_id, c_label)
        SELECT q_id, c_label AS pred_label, votes FROM (
          SELECT q_id, c_label, votes,
            ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY votes DESC, c_label) AS vr
          FROM votes) WHERE vr = 1
        ORDER BY q_id"""),
      "kNN majority-vote classification over the embedding column: " +
        "deterministic tie-break, exact cosine parity with e1; the vote " +
        "stage is bounded (k rows/query) and composes with e3's IVF " +
        "candidates at scale"),

    QueryDef(
      "e13_mmr_rerank",
      (s, dir) => {
        // MMR diversified re-rank (Carbonell & Goldstein 1998) — the
        // serving-side step between retrieval and the user: from each
        // query's top-8 cosine shortlist, greedily pick 4 results
        // maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) with λ = 1/2,
        // so near-duplicate hits (this corpus has genuine embedding
        // near-dups — e4/e8's domain) can't fill the page. EXACT: rel
        // and pairwise sims are the bit-identical e1 cosine, λ = 1/2
        // scales by a power of two (exact), the score is one subtraction
        // of exact-input IEEE ops with a (score desc, c_id) tie-break —
        // so the greedy argmax sequence is deterministic and the whole
        // recurrence unrolls into an exact SQL oracle (the g1
        // discipline applied to a serving policy). Scale shape: the
        // corpus-scale work is ONE broadcast-queries cosine pass (e1's
        // shape — or e3/e12's IVF probes when the corpus outgrows it);
        // everything after runs on shortlist-sized frames (≤ 8 rows per
        // query, localCheckpoint'ed once), and the k-step greedy loop
        // joins only shortlist×selected — never back to the corpus.
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("q_id"), dvec(col("embedding")).as("qv"))
        val c = emb.select(col("vec_id").as("c_id"), dvec(col("embedding")).as("cv"))
        import org.apache.spark.sql.expressions.Window
        val wrel = Window.partitionBy(col("q_id"))
          .orderBy(col("rel").desc, col("c_id").asc)
        val sl = broadcast(q).join(c, col("q_id") =!= col("c_id"))
          .withColumn("rel", cosine(col("qv"), col("cv")))
          .withColumn("rk", row_number().over(wrel))
          .filter(col("rk") <= 8)
          .select(col("q_id"), col("c_id"), col("rel"), col("cv"))
          // the ONLY corpus-scale stage; the greedy loop never re-scans.
          // coalesce(1) right-sizes the checkpointed shortlist (8 rows/
          // query): downstream joins/windows run as single tasks instead
          // of paying 32-partition scheduling per greedy step — with
          // thousands of queries the coalesce target grows, the shape
          // doesn't
          .coalesce(1)
          .stableCheckpoint() // shortlist computed once; greedy never re-scans
        val pr = sl.select(col("q_id"), col("c_id").as("a_id"), col("cv").as("av"))
          .join(sl.select(col("q_id"), col("c_id").as("b_id"), col("cv").as("bv")),
            Seq("q_id"))
          .filter(col("a_id") =!= col("b_id"))
          .select(col("q_id"), col("a_id"), col("b_id"),
            cosine(col("av"), col("bv")).as("sim"))
          .stableCheckpoint() // pairwise sims: probed by all 3 greedy steps
        val slim = sl.select("q_id", "c_id", "rel")
        var selected = slim
          .withColumn("rn", row_number().over(wrel))
          .filter(col("rn") === 1)
          .select(col("q_id"), col("c_id"), col("rel"), lit(1L).as("rk"))
        var remaining = slim.join(selected.select("q_id", "c_id"),
          Seq("q_id", "c_id"), "left_anti")
        for (step <- 2 to 4) {
          val wsc = Window.partitionBy(col("q_id"))
            .orderBy(col("score").desc, col("c_id").asc)
          val pick = remaining
            .join(pr, pr("q_id") === remaining("q_id")
              && pr("a_id") === remaining("c_id"))
            .drop(pr("q_id"))
            .join(selected.select(col("q_id"), col("c_id").as("s_id")),
              Seq("q_id")).filter(col("b_id") === col("s_id"))
            .groupBy(col("q_id"), col("c_id"), col("rel"))
            .agg(max(col("sim")).as("msim"))
            .withColumn("score",
              lit(0.5) * col("rel") - lit(0.5) * col("msim"))
            .withColumn("rn", row_number().over(wsc))
            .filter(col("rn") === 1)
            .select(col("q_id"), col("c_id"), col("rel"),
              lit(step.toLong).as("rk"))
          selected = selected.union(pick) // literal-small frames: 3
          // unrolled steps keep the plan bounded without per-step
          // checkpoint jobs
          remaining = remaining.join(pick.select("q_id", "c_id"),
            Seq("q_id", "c_id"), "left_anti")
        }
        selected.select("q_id", "rk", "c_id", "rel").orderBy("q_id", "rk")
      },
      Some {
        val cos = (a: String, b: String) =>
          s"""list_reduce(list_transform(range(1, len($a.e) + 1),
            i -> $a.e[i] * $b.e[i]), (x, y) -> x + y)
          / (sqrt(list_reduce(list_transform($a.e, x -> x * x), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform($b.e, x -> x * x), (x, y) -> x + y)))"""
        // one greedy step: score survivors against the selected-so-far
        // union, pick the per-query argmax (score desc, c_id tie-break)
        def stepCte(n: Int, prevU: String): String =
          s"""sc$n AS (
          SELECT s.q_id, s.c_id, s.rel, 0.5 * s.rel - 0.5 * MAX(p.sim) AS score
          FROM sl s
          JOIN pr p ON p.q_id = s.q_id AND p.a_id = s.c_id
          JOIN $prevU t ON t.q_id = p.q_id AND t.c_id = p.b_id
          WHERE NOT EXISTS (SELECT 1 FROM $prevU x
            WHERE x.q_id = s.q_id AND x.c_id = s.c_id)
          GROUP BY 1, 2, 3),
        sel$n AS (SELECT q_id, c_id, rel FROM sc$n
          QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY score DESC, c_id) = 1),
        u$n AS (SELECT * FROM $prevU UNION ALL SELECT * FROM sel$n)"""
        s"""WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        cosall AS (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id, ${cos("q", "c")} AS rel
          FROM v q JOIN v c ON q.vec_id <> c.vec_id WHERE q.vec_id < 4),
        sl AS (SELECT q_id, c_id, rel FROM cosall
          QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY rel DESC, c_id) <= 8),
        pr AS (
          SELECT a.q_id, a.c_id AS a_id, b.c_id AS b_id,
            ${cos("va", "vb")} AS sim
          FROM sl a JOIN sl b ON a.q_id = b.q_id AND a.c_id <> b.c_id
          JOIN v va ON va.vec_id = a.c_id
          JOIN v vb ON vb.vec_id = b.c_id),
        sel1 AS (SELECT q_id, c_id, rel FROM sl
          QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY rel DESC, c_id) = 1),
        u1 AS (SELECT * FROM sel1),
        ${stepCte(2, "u1")},
        ${stepCte(3, "u2")},
        ${stepCte(4, "u3")}
        SELECT q_id, rk, c_id, rel FROM (
          SELECT q_id, c_id, rel, CAST(1 AS BIGINT) AS rk FROM sel1
          UNION ALL SELECT q_id, c_id, rel, 2 FROM sel2
          UNION ALL SELECT q_id, c_id, rel, 3 FROM sel3
          UNION ALL SELECT q_id, c_id, rel, 4 FROM sel4)
        ORDER BY q_id, rk"""
      },
      "MMR diversified re-rank (λ=1/2, k=4 of a top-8 shortlist): " +
        "greedy relevance-vs-redundancy selection with bit-exact " +
        "cosines and deterministic tie-breaks — corpus work is one " +
        "retrieval pass, the greedy loop runs on shortlist-sized frames"),

    QueryDef(
      "e15_binary_ann",
      (s, dir) => {
        // BINARY-quantized ANN (the 1-bit tier under e5's int8 and
        // e6's PQ): each 64-dim vector compresses to its SIGN BITS,
        // packed into two BIGINT words — 16 bytes/vector, and the
        // shortlist metric is pure bit math (XOR + popcount), the
        // cheapest distance that exists. Serving = Hamming top-10
        // shortlist over the CODE table only (the e7 discipline:
        // the wide float arrays never enter the scan), then exact
        // cosine re-rank of the 10 survivors via one id equi-join.
        // Everything is deterministic: sign bits are exact float
        // compares, Hamming is integer, the re-rank is the bit-exact
        // e1 cosine — so the full pipeline carries an exact oracle.
        // The 8-query broadcast against the code table is the same
        // deliberate small-side nested loop as e7's ADC scan.
        import org.apache.spark.sql.expressions.Window
        val packLo =
          "aggregate(transform(sequence(0, 31), i -> IF(element_at(embedding, i + 1) > CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)"
        val packHi =
          "aggregate(transform(sequence(0, 31), i -> IF(element_at(embedding, i + 33) > CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)"
        val emb = t(s, dir, "embeddings")
        val codes = emb.select(col("vec_id").as("c_id"),
          expr(packLo).as("c_lo"), expr(packHi).as("c_hi"))
        val qcodes = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"),
            expr(packLo).as("q_lo"), expr(packHi).as("q_hi"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("hamming"), col("c_id"))
        val shortlist = broadcast(qcodes)
          .join(codes, col("q_id") =!= col("c_id"))
          .withColumn("hamming",
            expr("CAST(bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi) AS BIGINT)"))
          .withColumn("srk", row_number().over(w))
          .filter(col("srk") <= 10)
          .select("q_id", "c_id", "hamming")
        val qv = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), dvec(col("embedding")).as("qv"))
        val cv = emb.select(col("vec_id").as("c_id"),
          dvec(col("embedding")).as("cv"))
        val w2 = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))
        shortlist
          .join(broadcast(qv), "q_id").join(cv, "c_id")
          .withColumn("cos", cosine(col("qv"), col("cv")))
          .withColumn("rk", row_number().over(w2).cast("long"))
          .filter(col("rk") <= 3)
          .select("q_id", "c_id", "hamming", "cos", "rk")
          .orderBy("q_id", "rk")
      },
      Some("""WITH codes AS (
          SELECT vec_id,
            CAST(list_sum(list_transform(range(0, 32),
              i -> CASE WHEN embedding[i + 1] > 0
                   THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT)
              AS lo,
            CAST(list_sum(list_transform(range(0, 32),
              i -> CASE WHEN embedding[i + 33] > 0
                   THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT)
              AS hi
          FROM embeddings),
        short AS (
          SELECT q_id, c_id, hamming FROM (
            SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              CAST(bit_count(xor(q.lo, c.lo))
                 + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming,
              ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY bit_count(xor(q.lo, c.lo))
                       + bit_count(xor(q.hi, c.hi)), c.vec_id) AS srk
            FROM codes q JOIN codes c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < 8)
          WHERE srk <= 10),
        v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
            AS e FROM embeddings)
        SELECT q_id, c_id, hamming,
          cos, CAST(rk AS BIGINT) AS rk
        FROM (
          SELECT s.q_id, s.c_id, s.hamming,
            list_reduce(list_transform(range(1, len(q.e) + 1),
              i -> q.e[i] * c.e[i]), (a, b) -> a + b)
            / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (a, b) -> a + b))
             * sqrt(list_reduce(list_transform(c.e, x -> x * x), (a, b) -> a + b)))
              AS cos,
            ROW_NUMBER() OVER (PARTITION BY s.q_id ORDER BY
              list_reduce(list_transform(range(1, len(q.e) + 1),
                i -> q.e[i] * c.e[i]), (a, b) -> a + b)
              / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (a, b) -> a + b))
               * sqrt(list_reduce(list_transform(c.e, x -> x * x), (a, b) -> a + b)))
              DESC, s.c_id) AS rk
          FROM short s
          JOIN v q ON s.q_id = q.vec_id
          JOIN v c ON s.c_id = c.vec_id)
        WHERE rk <= 3
        ORDER BY q_id, rk"""),
      "binary-quantized ANN: 64 sign bits packed into two BIGINT words " +
        "(16 bytes/vector), Hamming (XOR+popcount) top-10 shortlist " +
        "over the code table only, exact-cosine re-rank of the " +
        "survivors — the 1-bit serving tier under int8 (e5) and PQ " +
        "(e6/e7), fully oracle-checked")
  )
}
