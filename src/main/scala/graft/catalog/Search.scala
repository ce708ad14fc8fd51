package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.Tables
import graft.ops.TextOps

/**
 * Full-text retrieval over the `documents` corpus: positional inverted-index
 * postings, conjunctive (AND) matching, exact phrase matching, and BM25
 * ranked top-k — the keyword-search counterpart of the vector family in
 * [[Vectors]] (a training-data pipeline needs both: BM25 for lexical recall
 * in decontamination/retrieval sweeps, embeddings for semantic recall).
 *
 * Reference provenance: the reference declares search-shaped analytics over
 * its event lake but implements none of it (`/root/reference/README.md:23-33`
 * — "user journey analysis", dashboards); the corpus operators come from the
 * driver's LLM-pipeline north star (SURVEY.md §2.9).
 *
 * Cross-engine float discipline ([[graft.ops.Exact]] house rules): BM25 is
 * usually log-idf IEEE soup, so this formulation keeps every per-term score
 * an exact int64 rational — ONE IEEE division per (doc, term), summed
 * row-wise over a FIXED pivot order — so Spark and DuckDB produce
 * bit-identical doubles with no rounding tolerance anywhere.
 *
 * Scale ledger at 100 TB:
 *   - postings/conjunctive/BM25 share ONE corpus-width (doc_id, term)
 *     shuffle (the tf build); everything after is vocabulary- or
 *     query-sized, or a doc_id-keyed join (uniform key, no skew).
 *   - phrase match is map-only: the token array never leaves its row.
 *   - the query-term filter lands BEFORE every join (a 3-term IN list), so
 *     no corpus-sized intermediate survives past the tf aggregate.
 *   - final ranking is sort+limit (TakeOrderedAndProject), never a
 *     single-partition window over the corpus.
 */
object Search extends Family {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))

  /** Fixed demo query — three terms spanning the df spectrum of the
    * synthetic corpus (`spark`/`merge` ~77% of docs, `dup` ~5%). */
  private val QueryTerms = Seq("spark", "merge", "dup")

  /** (doc_id, term, pos) with 1-based positions, lockstep with the oracle's
    * `generate_subscripts`. One narrow Generate, no shuffle. */
  private def positions(d: DataFrame): DataFrame =
    d.select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("p0", "term")))
      .select(col("doc_id"), col("term"), (col("p0") + 1).cast("long").as("pos"))

  /** (doc_id, term, term_count) — the shared tf spine. */
  private def tf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("term_count"))

  // Warmed-aware tf spine: conjunctive/BM25/hybrid all start from the same
  // corpus-width (doc_id, term) aggregate — the materialized posting-list
  // base a deployed search index maintains. Standalone plans are unchanged
  // (the registry is empty outside Bench), and term filters applied on TOP
  // of the spine still push below the aggregate in the unwarmed plan
  // (PushPredicateThroughNonJoin on grouping columns), so the CI plan gates
  // keep seeing the filter-under-agg shape.
  private def tfSpine(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Warmed.getOrBuild("search_tf", dir)(tf(docs(spark, dir)))

  /** Materialize the shared tf spine for `dir` (bench warm path). */
  def warmShared(spark: SparkSession, dir: String): Unit =
    graft.ops.Warmed.warm("search_tf", dir)(tf(docs(spark, dir)))

  private val duckToks =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos
      |  FROM documents)""".stripMargin

  // ---------------------------------------------------------------------
  // Positional posting lists for the query terms: the physical structure a
  // search index materializes (term -> sorted (doc, positions)). The term
  // filter sits UNDER the aggregate, so the only shuffled rows are hits of
  // the 2 requested terms — index build for a full vocabulary is the same
  // aggregate minus the filter, partitioned by term.
  private val postings = Q(
    "search_postings",
    Some(s"""
      WITH $duckToks
      SELECT term, doc_id, COUNT(*) AS n_occ,
        MIN(pos) AS first_pos,
        array_to_string(list(pos ORDER BY pos), ',') AS positions
      FROM toks WHERE term IN ('dup', 'spark')
      GROUP BY term, doc_id
      ORDER BY term, doc_id
    """)) { (spark, dir) =>
    positions(docs(spark, dir))
      .filter(col("term").isin("dup", "spark"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"),
        min(col("pos")).as("first_pos"),
        concat_ws(",", sort_array(collect_list(col("pos")))).as("positions"))
      .orderBy(col("term"), col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // Conjunctive (AND) retrieval: documents containing ALL query terms, with
  // their total hit count — posting-list intersection as a count-distinct
  // filter on the tf spine. Distributed shape: filter to 3 terms (map-side),
  // one doc_id-keyed aggregate, no corpus-width join.
  private val conjunctive = Q(
    "search_conjunctive",
    Some(s"""
      WITH $duckToks,
      tf AS (SELECT doc_id, term, COUNT(*) AS term_count
        FROM toks WHERE term IN ('spark', 'merge', 'dup')
        GROUP BY doc_id, term)
      SELECT doc_id, CAST(SUM(term_count) AS BIGINT) AS total_hits
      FROM tf GROUP BY doc_id
      HAVING COUNT(DISTINCT term) = 3
      ORDER BY doc_id
    """)) { (spark, dir) =>
    tfSpine(spark, dir)
      .filter(col("term").isin(QueryTerms: _*))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_count")).as("total_hits"),
        countDistinct(col("term")).as("n_terms"))
      .filter(col("n_terms") === QueryTerms.length)
      .select(col("doc_id"), col("total_hits"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // Exact phrase match ("slow query"): adjacency-checked inside each row's
  // token array — NO positional self-join, so the operator is map-only and
  // embarrassingly parallel at any corpus size (the join formulation
  // shuffles every posting; this shuffles nothing).
  private val phrase = Q(
    "search_phrase",
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      m AS (SELECT doc_id,
        CASE WHEN len(tk) >= 2 THEN
          list_filter(generate_series(1, len(tk) - 1),
            i -> tk[i] = 'slow' AND tk[i + 1] = 'query')
        ELSE [] END AS hits FROM t)
      SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_matches,
        CAST(hits[1] AS BIGINT) AS first_pos
      FROM m WHERE len(hits) > 0
      ORDER BY doc_id
    """)) { (spark, dir) =>
    // one-pass codegen kernel ([[graft.functions.phrase_positions]]) — the
    // filter(sequence(...)) HOF re-evaluates split(text) INSIDE the lambda
    // for every position (Catalyst does not CSE under LambdaFunction:
    // O(tokens²) per document), and the whole expression ran twice (pushed
    // filter + project); the kernel splits once and scans once
    val hits = graft.functions.phrase_positions(col("text"), "slow", "query")
    docs(spark, dir)
      .select(col("doc_id"), hits.as("hits"))
      .filter(size(col("hits")) > 0)
      .select(col("doc_id"),
        size(col("hits")).cast("long").as("n_matches"),
        element_at(col("hits"), 1).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // BM25 top-10 (k1 = 6/5, b = 3/4, ratio idf (N+1)/(df+1) — the linearized
  // idf this catalog already uses for tf-idf, rank-faithful and exactly
  // rational). Per (doc, term):
  //
  //   score = (44*tf*A*(N+1)) / ((20*tf*A + 6*A + 18*dl*N) * (df+1))
  //
  // which is literally idf * tf(k1+1) / (tf + k1(1-b+b*dl/avgdl)) with
  // avgdl = A/N cleared of fractions: numerator and denominator are exact
  // int64 products (bounded by 44*tf*A*(N+1) ~ 1e13 at sf0.1 — inside
  // double's 2^53 exact-integer range with 100x headroom), so the ONLY IEEE
  // operation per term is the final division, bit-identical in any engine.
  // The per-doc total pivots the 3 terms into fixed columns and adds them
  // in one fixed left-to-right row expression — no sum() over doubles, no
  // accumulation-order nondeterminism.
  //
  // Scale: tf/dl/df derive from the one shared corpus shuffle; N, A, df
  // join back as broadcast singletons; ranking is sort+limit.
  private val bm25 = Q(
    "search_bm25_topk",
    Some(s"""
      WITH $duckToks,
      tfall AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
      dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tfall GROUP BY doc_id),
      tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS a, COUNT(DISTINCT doc_id) AS n FROM tfall),
      qt AS (SELECT doc_id, term, tf FROM tfall WHERE term IN ('spark', 'merge', 'dup')),
      dfr AS (SELECT term, COUNT(*) AS df FROM qt GROUP BY term),
      s AS (
        SELECT qt.doc_id, qt.term,
          CAST(44 * qt.tf * tot.a * (tot.n + 1) AS DOUBLE)
            / CAST((20 * qt.tf * tot.a + 6 * tot.a + 18 * dl.dl * tot.n)
                   * (dfr.df + 1) AS DOUBLE) AS sc
        FROM qt JOIN dl USING (doc_id) JOIN dfr USING (term) CROSS JOIN tot),
      p AS (
        SELECT doc_id,
          COALESCE(MAX(CASE WHEN term = 'spark' THEN sc END), 0.0) AS s_spark,
          COALESCE(MAX(CASE WHEN term = 'merge' THEN sc END), 0.0) AS s_merge,
          COALESCE(MAX(CASE WHEN term = 'dup' THEN sc END), 0.0) AS s_dup
        FROM s GROUP BY doc_id)
      SELECT doc_id, s_spark + s_merge + s_dup AS score, s_spark, s_merge, s_dup
      FROM p ORDER BY score DESC, doc_id LIMIT 10
    """)) { (spark, dir) =>
    val tfall = tfSpine(spark, dir)
    val dl = tfall.groupBy(col("doc_id")).agg(sum(col("term_count")).as("dl"))
    val qt = tfall.filter(col("term").isin(QueryTerms: _*))
    val dfr = qt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tot = tfall.agg(sum(col("term_count")).as("a"),
      countDistinct(col("doc_id")).as("n"))
    val num = lit(44L) * col("term_count") * col("a") * (col("n") + 1L)
    val den = (lit(20L) * col("term_count") * col("a") + lit(6L) * col("a")
      + lit(18L) * col("dl") * col("n")) * (col("df") + 1L)
    def termScore(t: String): Column =
      coalesce(max(when(col("term") === t, col("sc"))), lit(0.0))
    qt.join(dl, Seq("doc_id"))
      .join(broadcast(dfr), Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("sc", num.cast("double") / den.cast("double"))
      .groupBy(col("doc_id"))
      .agg(termScore("spark").as("s_spark"),
        termScore("merge").as("s_merge"),
        termScore("dup").as("s_dup"))
      .select(col("doc_id"),
        (col("s_spark") + col("s_merge") + col("s_dup")).as("score"),
        col("s_spark"), col("s_merge"), col("s_dup"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // Hybrid retrieval: reciprocal rank fusion (RRF, Cormack et al. 2009) of a
  // lexical leg and a semantic leg, query-by-document for the 5 query docs
  // the ANN family already uses (doc ids and vector ids align in the corpus).
  //
  //   rrf(d) = 1/(60 + r_lex(d)) + 1/(60 + r_sem(d))
  //
  // summed only over lists where d appears in the top-30 — the standard
  // fusion a retrieval pipeline runs when it has both a keyword index and an
  // embedding index (each leg catches what the other misses: BM25-style
  // overlap finds exact-term hits, cosine finds paraphrases).
  //
  // Cross-engine float discipline: each leg contributes ONE IEEE division of
  // exact integers (ranks), summed in fixed lex+sem order — bit-identical
  // doubles, no tolerance. Lexical ranks order by (shared distinct terms,
  // shared-term tf mass, doc_id) — all-integer, deterministic; semantic
  // ranks reuse the brute-cosine ordering (round(cos,4), doc_id).
  //
  // Scale ledger: query-side term/vector sets are 5-doc-sized and broadcast;
  // the lexical candidate agg is (q_id, doc_id)-keyed; BOTH top-30 cuts are
  // two-stage salted (the [[graft.ops.VectorOps.topK]] shape) so no
  // corpus-sized list funnels through a 5-partition window; fusion joins two
  // ≤ 30-row-per-query lists.
  private val hybridRrf = Q(
    "search_hybrid_rrf",
    Some(s"""
      WITH $duckToks,
      tfall AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
      qt AS (SELECT doc_id AS q_id, term FROM tfall WHERE doc_id < 5),
      lexcand AS (
        SELECT qt.q_id, t.doc_id, COUNT(DISTINCT t.term) AS n_shared,
               CAST(SUM(t.tf) AS BIGINT) AS tf_sum
        FROM qt JOIN tfall t USING (term)
        WHERE t.doc_id <> qt.q_id
        GROUP BY qt.q_id, t.doc_id),
      lex AS (SELECT q_id, doc_id, r_lex FROM (
        SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
          ORDER BY n_shared DESC, tf_sum DESC, doc_id) AS r_lex
        FROM lexcand) WHERE r_lex <= 30),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      nv AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
      qv AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM nv WHERE vec_id < 5),
      sem0 AS (
        SELECT qv.q_id, nv.vec_id AS doc_id,
          round(list_dot_product(qv.q_emb, nv.emb) / (qv.q_nrm * nv.nrm), 4) AS cos_sim
        FROM qv, nv WHERE nv.vec_id <> qv.q_id),
      sem AS (SELECT q_id, doc_id, r_sem FROM (
        SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
          ORDER BY cos_sim DESC, doc_id) AS r_sem
        FROM sem0) WHERE r_sem <= 30),
      fused AS (
        SELECT COALESCE(l.q_id, s.q_id) AS q_id,
               COALESCE(l.doc_id, s.doc_id) AS doc_id,
          COALESCE(CAST(1 AS DOUBLE) / (60 + l.r_lex), 0.0)
            + COALESCE(CAST(1 AS DOUBLE) / (60 + s.r_sem), 0.0) AS rrf_score,
          CAST(COALESCE(l.r_lex, 0) AS BIGINT) AS r_lex,
          CAST(COALESCE(s.r_sem, 0) AS BIGINT) AS r_sem
        FROM lex l FULL OUTER JOIN sem s
          ON l.q_id = s.q_id AND l.doc_id = s.doc_id)
      SELECT q_id, doc_id, rrf_score, r_lex, r_sem, CAST(rn AS BIGINT) AS rn
      FROM (SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY rrf_score DESC, doc_id) AS rn FROM fused)
      WHERE rn <= 10 ORDER BY q_id, rn
    """)) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val tfall = tfSpine(spark, dir)
    val qt = tfall.filter(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("term"))
    val lexCand = tfall.join(broadcast(qt), Seq("term"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("n_shared"),
        sum(col("term_count")).as("tf_sum"))
    // two-stage salted top-30 with the composite lexical ordering
    val lex = graft.ops.VectorOps.topKBy(lexCand, "q_id", "doc_id",
        Seq(col("n_shared").desc, col("tf_sum").desc), k = 30)
      .select(col("q_id"), col("doc_id"), col("rn").as("r_lex"))
    val e = Vectors.embN(spark, dir)
      .select(col("vec_id"), col("embedding"), col("nrm"))
    val qv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = e.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("doc_id"),
        graft.ops.VectorOps.cosinePre(col("q_emb"), col("embedding"),
          col("q_nrm"), col("nrm")).as("cos_sim"))
    val sem = graft.ops.VectorOps.topK(scored, "q_id", "doc_id", "cos_sim",
        k = 30)
      .select(col("q_id"), col("doc_id"), col("rn").as("r_sem"))
    val fused = lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0)))
          .as("rrf_score"),
        coalesce(col("r_lex"), lit(0)).cast("long").as("r_lex"),
        coalesce(col("r_sem"), lit(0)).cast("long").as("r_sem"))
    fused
      .withColumn("rn", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("rrf_score").desc, col("doc_id"))).cast("long"))
      .filter(col("rn") <= 10)
      .orderBy(col("q_id"), col("rn"))
  }

  // ---------------------------------------------------------------------
  // Known-item retrieval eval (MRR@10 diagnostics): for each probe document
  // (doc_id % 97 — the eval-suite convention decontam uses), build a
  // query from its 10 RAREST terms (global df asc, term asc tiebreak) and
  // rank the corpus by shared-term count, then histogram-intersection mass
  // Σ min(tf_q, tf_d) — the lexical query-by-document leg hybrid RRF uses.
  // self_rank is where the probe finds ITSELF; rr_2520 is the reciprocal
  // rank at cutoff 10 scaled by lcm(1..10)=2520, so every value is an
  // EXACT integer (2520/rank is whole for rank ≤ 10) — MRR@10 =
  // Σ rr_2520 / (2520·N) with zero rounding until one final division.
  // This is the index-health eval a search deployment runs after every
  // build; on this 31-term-vocabulary corpus it honestly reports a mixed
  // board (4 of 6 probes in the top 10 at sf0.01) — rarity is the only
  // discriminator such a tiny vocabulary offers.
  //
  // Scale shape: the probe set is corpus/97 here (test dial; production
  // uses a fixed broadcastable eval set), each probe's query is ≤10 terms,
  // and the candidate join fans out only over the posting lists of those
  // RAREST terms; the ranking window partitions by probe over its own
  // candidates. The tf spine is the shared warmed posting-list base.
  private val knownItem = Q(
    "search_known_item_rank",
    Some(s"""
      WITH $duckToks,
      tfall AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      dfr AS (SELECT term, COUNT(*) AS df FROM tfall GROUP BY term),
      probes AS (SELECT DISTINCT doc_id AS q_doc FROM documents
                 WHERE doc_id % 97 = 0),
      qt0 AS (SELECT p.q_doc, tfall.term, tfall.tf AS q_tf,
                row_number() OVER (PARTITION BY p.q_doc
                  ORDER BY dfr.df, tfall.term) AS rn
              FROM probes p JOIN tfall ON tfall.doc_id = p.q_doc
              JOIN dfr USING (term)),
      qt AS (SELECT q_doc, term, q_tf FROM qt0 WHERE rn <= 10),
      shared AS (SELECT qt.q_doc, tfall.doc_id, COUNT(*) AS n_shared,
                   CAST(SUM(CASE WHEN tfall.tf < qt.q_tf THEN tfall.tf
                                 ELSE qt.q_tf END) AS BIGINT) AS overlap_mass
                 FROM qt JOIN tfall USING (term) GROUP BY 1, 2),
      ranked AS (SELECT q_doc, doc_id,
                   row_number() OVER (PARTITION BY q_doc
                     ORDER BY n_shared DESC, overlap_mass DESC, doc_id)
                     AS rnk
                 FROM shared)
      SELECT q_doc, CAST(rnk AS BIGINT) AS self_rank,
        CAST(CASE WHEN rnk <= 10 THEN 2520 // rnk ELSE 0 END AS BIGINT)
          AS rr_2520
      FROM ranked WHERE doc_id = q_doc ORDER BY q_doc
    """)) { (spark, dir) =>
    val tfall = tfSpine(spark, dir)
    val dfr = tfall.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val probes = docs(spark, dir).filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_doc")).distinct()
    val qt = probes
      .join(tfall, col("doc_id") === col("q_doc"))
      .join(broadcast(dfr), Seq("term"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("q_doc"))
        .orderBy(col("df"), col("term"))))
      .filter(col("rn") <= 10)
      .select(col("q_doc"), col("term"), col("term_count").as("q_tf"))
    val shared = qt.join(tfall, Seq("term"))
      .groupBy(col("q_doc"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"),
        sum(least(col("term_count"), col("q_tf"))).as("overlap_mass"))
    shared
      .withColumn("rnk", row_number().over(Window.partitionBy(col("q_doc"))
        .orderBy(col("n_shared").desc, col("overlap_mass").desc,
          col("doc_id"))).cast("long"))
      .filter(col("doc_id") === col("q_doc"))
      .select(col("q_doc"), col("rnk").as("self_rank"),
        when(col("rnk") <= 10, floor(lit(2520) / col("rnk")).cast("long"))
          .otherwise(0L).as("rr_2520"))
      .orderBy(col("q_doc"))
  }

  override val specs: Seq[Q] =
    Seq(postings, conjunctive, phrase, bm25, hybridRrf, knownItem)
}
