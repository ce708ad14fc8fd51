package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.Tables
import graft.ops.TextOps

/**
 * LLM-data-pipeline text operators over the `documents` table: exact and
 * near deduplication (normalized-hash, MinHash+LSH, n-gram Jaccard, SimHash),
 * quality scoring, language-ID heuristic, token counting, fingerprinting.
 *
 * Oracle-parity notes: all hashing is md5-hex (portable); integer ratios
 * divide as int/int -> double (exact in IEEE, identical across engines);
 * SimHash packs 60 bits via `1L << pos` (never double pow).
 */
object TextLlm extends Family {

  // spread(): the per-row work here (md5/regex/higher-order filters) is the
  // cost center, and the single-file test input would pin it to one core.
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))

  // The LSH candidate-pair frame is the shared spine of the near-dup family
  // (minhash pairs, components, Jaccard + Levenshtein confirms). Routed
  // through graft.ops.Warmed so a harness that materializes it once (Bench)
  // serves all four consumers from one build, while unwarmed runs keep the
  // standalone plan the CI gates audit.
  private def lshPairs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Warmed.getOrBuild("text_lsh_pairs", dir) {
      TextOps.candidatePairs(
        TextOps.lshBands(docs(spark, dir), "doc_id", "text"), "doc_id")
    }

  // Warmed-aware duplicate-cluster labels: dedup_components and
  // dedup_cluster_canonical both run the iterative hash-min pass over the
  // LSH pairs — a dedup pipeline materializes the cluster table once and
  // fans the keep/canonical decisions out from it.
  private def componentsSpine(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Warmed.getOrBuild("dup_components", dir)(
      graft.ops.Components.connectedComponents(
        lshPairs(spark, dir), "doc_a", "doc_b"))

  /** Materialize the shared near-dup spine for `dir` (bench warm path):
    * LSH candidate pairs, then the cluster labels built from them. */
  def warmShared(spark: SparkSession, dir: String): Unit = {
    graft.ops.Warmed.warm("text_lsh_pairs", dir) {
      TextOps.candidatePairs(
        TextOps.lshBands(docs(spark, dir), "doc_id", "text"), "doc_id")
    }
    graft.ops.Warmed.warm("dup_components", dir)(
      graft.ops.Components.connectedComponents(
        lshPairs(spark, dir), "doc_a", "doc_b"))
    graft.ops.Warmed.warm("text_pair_counts", dir)(
      buildPairCounts(spark, dir))
  }

  /** Directed adjacent-token pair counts over the corpus — ONE vocab²-sized
    * aggregate of the corpus-width pair explode, the shared spine
    * `lm_pmi_bigrams` and `text_textrank_terms` both fan out from
    * (collocation stats and the co-occurrence graph are the same counts). */
  private def buildPairCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(
        TextOps.adjacentPairs(TextOps.tokens(col("text")))).as("p"))
      .groupBy(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .agg(count(lit(1)).as("cnt"))

  private[catalog] def pairCounts(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Warmed.getOrBuild("text_pair_counts", dir)(
      buildPairCounts(spark, dir))

  // -------------------------------------------------------------------------
  // Exact dedup: one survivor (min doc_id) per identical text.
  private val dedupExact = Q(
    "dedup_exact",
    Some("""
      SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
      FROM documents GROUP BY text ORDER BY doc_id
    """)) { (spark, dir) =>
    docs(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  // Normalized dedup: case/punct/whitespace-insensitive, keyed by md5.
  private val dedupNorm = Q(
    "dedup_normalized",
    Some("""
      SELECT min(doc_id) AS doc_id,
        md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                ' +', ' ', 'g'))) AS norm_hash,
        COUNT(*) AS n_copies
      FROM documents
      GROUP BY norm_hash
      ORDER BY doc_id
    """)) { (spark, dir) =>
    docs(spark, dir)
      .groupBy(md5(TextOps.normalize(col("text"))).as("norm_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("norm_hash"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  // MinHash (8 perms) + LSH (4 bands x 2 rows): near-dup candidate pairs.
  // Signatures are one narrow projection per doc (TextOps.lshBands); the only
  // shuffle is the band-signature self-join — the 100 TB shape.
  private val minhashLsh = Q(
    "dedup_minhash_lsh_pairs",
    Some(s"""
      WITH ${TextOps.duckPairsCtes}
      SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
    """)) { (spark, dir) =>
    lshPairs(spark, dir)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // Duplicate-cluster resolution: the transitive closure of the LSH pairs
  // (A~B, B~C => one cluster {A,B,C}), each cluster labeled by its min
  // doc_id, canonical = the label holder — what a dedup pipeline KEEPS.
  // Spark side is iterative hash-min propagation (graft.ops.Components:
  // one join + one min-agg per round, O(cluster diameter) rounds); the
  // oracle computes the same closure with a recursive CTE.
  private val components = Q(
    "dedup_components",
    Some(s"""
      WITH RECURSIVE ${TextOps.duckPairsCtes},
      sym AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
      comp AS (
        SELECT a AS doc_id, least(a, min(b)) AS comp_id
        FROM reach GROUP BY a)
      SELECT doc_id, comp_id,
        CAST(doc_id = comp_id AS INTEGER) AS is_canonical
      FROM comp ORDER BY doc_id
    """)) { (spark, dir) =>
    componentsSpine(spark, dir)
      .select(col("id").as("doc_id"), col("comp").as("comp_id"),
        (col("id") === col("comp")).cast("int").as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  // n-gram Jaccard similarity, evaluated on the LSH candidate pairs only
  // (the scale path: LSH bounds the quadratic work to near-duplicates), over
  // per-doc distinct shingle-HASH sets (trigram_hashes kernel — identical
  // int64 values in both engines) + array_intersect — no shingle explode.
  private val jaccard = Q(
    "dedup_ngram_jaccard",
    Some(s"""
      WITH ${TextOps.duckPairsCtes},
      shd AS (SELECT doc_id, list_distinct(hs) AS ds FROM hs)
      SELECT p.doc_a, p.doc_b,
        len(list_intersect(a.ds, b.ds))
          / (len(a.ds) + len(b.ds) - len(list_intersect(a.ds, b.ds))) AS jaccard
      FROM pairs p
      JOIN shd a ON a.doc_id = p.doc_a
      JOIN shd b ON b.doc_id = p.doc_b
      ORDER BY doc_a, doc_b
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
    val pairs = lshPairs(spark, dir)
    val shd = d.select(col("doc_id"),
      array_distinct(graft.functions.trigram_hashes(col("text"))).as("ds"))
    val inter = size(array_intersect(col("dsa"), col("dsb")))
    pairs
      .join(shd.select(col("doc_id").as("doc_a"), col("ds").as("dsa")), Seq("doc_a"))
      .join(shd.select(col("doc_id").as("doc_b"), col("ds").as("dsb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter / (size(col("dsa")) + size(col("dsb")) - inter)).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // SimHash: 60-bit fingerprint from per-token md5 nibbles; majority vote per
  // bit over the document's distinct tokens. Map-only: the bit loop runs as
  // nested higher-order aggregates inside one projection (no 60x explode).
  private val simhash = Q(
    "dedup_simhash",
    Some("""
      WITH td AS (SELECT doc_id,
        list_transform(list_distinct(string_split(text, ' ')), t -> md5(t)) AS hs
        FROM documents)
      SELECT doc_id,
        CAST(list_sum(list_transform(generate_series(0, 59), bit ->
          CASE WHEN list_sum(list_transform(hs, h ->
              2 * (((instr('0123456789abcdef',
                           substr(h, CAST(1 + bit // 4 AS INTEGER), 1)) - 1)
                    >> CAST(3 - bit % 4 AS INTEGER)) & 1) - 1)) > 0
          THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
          ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
      FROM td ORDER BY doc_id
    """)) { (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"),
        graft.functions.simhash60(col("text")).as("simhash"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------------------
  // Quality scoring: token stats + stopword/uniqueness ratios.
  private val quality = Q(
    "text_quality_scores",
    Some("""
      WITH b AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      s AS (
        SELECT doc_id, len(t) AS n_tokens,
          len(list_distinct(t)) AS n_distinct,
          len(list_filter(t, x -> x IN ('the', 'a'))) AS n_stop
        FROM b)
      SELECT doc_id, n_tokens,
        n_distinct / n_tokens AS uniq_ratio,
        n_stop / n_tokens AS stop_ratio,
        0.3 * (n_distinct / n_tokens) + 0.5 * (1 - n_stop / n_tokens)
          + 0.2 * least(1.0, n_tokens / 100.0) AS quality_score
      FROM s ORDER BY doc_id
    """)) { (spark, dir) =>
    qualityFrame(spark, dir)
      .select(col("doc_id"), col("n_tokens"),
        (col("n_distinct") / col("n_tokens")).as("uniq_ratio"),
        (col("n_stop") / col("n_tokens")).as("stop_ratio"),
        col("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Per-doc quality signals + the fixed-order composite score (row-wise
    * IEEE, bit-identical cross-engine) — shared by `text_quality_scores`
    * and the cluster-canonical pick. */
  private def qualityFrame(spark: SparkSession, dir: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_distinct"),
        size(filter(t, x => x.isin("the", "a"))).as("n_stop"))
      .withColumn("quality_score",
        lit(0.3) * (col("n_distinct") / col("n_tokens"))
          + lit(0.5) * (lit(1) - col("n_stop") / col("n_tokens"))
          + lit(0.2) * least(lit(1.0), col("n_tokens") / 100.0))
  }

  // -------------------------------------------------------------------------
  // Per-language quality percentile via the histogram method — the
  // scale-sound form of per-lang percent_rank: quality thresholds are drawn
  // WITHIN each language (so a high-resource language's distribution doesn't
  // set the bar for low-resource ones — the standard per-lang filtering
  // posture), but a corpus-wide percent_rank window would sort every
  // language's full partition. Instead the score is binned on a fixed
  // 128-bin grid (one map-side-combinable (lang, bin) aggregate), the
  // languages × ≤128 cumulative table is metadata-sized, and each doc joins
  // its (lang, bin) row back — percentile resolution is 1/128, exact math
  // is integer counts with ONE IEEE division per doc. Binning a double
  // score is deterministic cross-engine because the score itself is the
  // fixed-order IEEE composite both engines already hash-match.
  private val qualityPctl = Q(
    "text_quality_pctl_by_lang",
    Some("""
      WITH b AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      s AS (SELECT doc_id, lang, len(t) AS nt,
              len(list_distinct(t)) AS nd,
              len(list_filter(t, x -> x IN ('the', 'a'))) AS ns
            FROM b),
      qs AS (SELECT doc_id, lang,
               0.3 * (nd / nt) + 0.5 * (1 - ns / nt)
                 + 0.2 * least(1.0, nt / 100.0) AS q
             FROM s),
      bi AS (SELECT doc_id, lang,
               greatest(0, least(127, CAST(floor(q * 128) AS INTEGER))) AS bin
             FROM qs),
      bc AS (SELECT lang, bin, COUNT(*) AS cnt FROM bi GROUP BY lang, bin),
      cu AS (SELECT lang, bin, cnt,
               SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) - cnt AS below,
               SUM(cnt) OVER (PARTITION BY lang) AS n_lang
             FROM bc)
      SELECT b.doc_id, b.lang, CAST(b.bin AS INTEGER) AS bin,
        CAST(c.below AS BIGINT) AS n_below,
        CAST(c.n_lang AS BIGINT) AS n_lang,
        CAST(c.below AS DOUBLE) / c.n_lang AS pctl
      FROM bi b JOIN cu c ON c.lang = b.lang AND c.bin = b.bin
      ORDER BY doc_id
    """)) { (spark, dir) =>
    val bi = qualityFrame(spark, dir)
      .select(col("doc_id"), col("lang"),
        greatest(lit(0), least(lit(127),
          floor(col("quality_score") * 128).cast("int"))).as("bin"))
    val bc = bi.groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("cnt"))
    val cu = bc
      .withColumn("below",
        sum(col("cnt")).over(Window.partitionBy(col("lang")).orderBy(col("bin")))
          - col("cnt"))
      .withColumn("n_lang",
        sum(col("cnt")).over(Window.partitionBy(col("lang"))))
    bi.join(cu.select(col("lang"), col("bin"), col("below"), col("n_lang")),
        Seq("lang", "bin"))
      .select(col("doc_id"), col("lang"), col("bin"),
        col("below").as("n_below"), col("n_lang"),
        (col("below").cast("double") / col("n_lang")).as("pctl"))
      .orderBy(col("doc_id"))
  }

  // Language-ID heuristic: profile-wordlist overlap, deterministic argmax.
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "row", "table"),
    "de" -> Seq("spark", "stream", "batch"),
    "fr" -> Seq("join", "merge", "sort"),
    "zh" -> Seq("vector", "hash", "query"))

  private val langId = Q(
    "text_lang_id",
    Some {
      val scores = langProfiles.map { case (l, ws) =>
        s"len(list_filter(t, x -> x IN (${ws.map("'" + _ + "'").mkString(", ")}))) AS s_$l"
      }.mkString(",\n          ")
      """
      WITH b AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      s AS (SELECT doc_id, lang,
          """ + scores + """
        FROM b)
      SELECT doc_id, s_en, s_es, s_de, s_fr, s_zh,
        CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh' END AS predicted_lang,
        lang AS actual_lang
      FROM s ORDER BY doc_id
    """
    }) { (spark, dir) =>
    val t = TextOps.tokens(col("text"))
    val scored = docs(spark, dir).select(
      Seq(col("doc_id"), col("lang")) ++ langProfiles.map { case (l, ws) =>
        size(filter(t, x => x.isin(ws: _*))).as(s"s_$l")
      }: _*)
    val p = col("s_en") >= col("s_es") && col("s_en") >= col("s_de") &&
      col("s_en") >= col("s_fr") && col("s_en") >= col("s_zh")
    scored.select(
      col("doc_id"), col("s_en"), col("s_es"), col("s_de"), col("s_fr"), col("s_zh"),
      when(p, "en")
        .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
        .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), "de")
        .when(col("s_fr") >= col("s_zh"), "fr")
        .otherwise("zh").as("predicted_lang"),
      col("lang").as("actual_lang"))
      .orderBy(col("doc_id"))
  }

  // Token counting: whitespace tokens + a BPE-ish segmentation count
  // (vowel-run / consonant-run pieces) + avg token length.
  private val tokenCounts = Q(
    "text_token_counts",
    Some("""
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_ws_tokens,
        len(regexp_extract_all(text, '[aeiou]+|[^aeiou ]+')) AS n_bpe_pieces,
        length(replace(text, ' ', '')) / len(string_split(text, ' ')) AS avg_token_len
      FROM documents ORDER BY doc_id
    """)) { (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n_ws_tokens"),
        expr("size(regexp_extract_all(text, '[aeiou]+|[^aeiou ]+', 0))").as("n_bpe_pieces"),
        (length(regexp_replace(col("text"), " ", ""))
          / size(TextOps.tokens(col("text")))).as("avg_token_len"))
      .orderBy(col("doc_id"))
  }

  // Document fingerprint: 31-ary rolling hash over per-token 16-bit md5
  // prefixes, mod 1e9+7 (exact int64 arithmetic in both engines).
  private val fingerprint = Q(
    "text_fingerprint_rolling",
    Some("""
      SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ' '), t ->
              CAST((instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 4096
                 + (instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1) * 256
                 + (instr('0123456789abcdef', substr(md5(t), 3, 1)) - 1) * 16
                 + (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1) AS BIGINT))),
          (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      FROM documents ORDER BY doc_id
    """)) { (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"),
        graft.functions.rolling_fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------------------
  // Gopher-style hard-filter bundle: the rule battery a pretraining pipeline
  // applies before any model-based scoring (length bounds, uniqueness floor,
  // stopword ceiling, composite-score floor). One map-only pass over the
  // quality spine; output is doc-grain with a REASONS BITMASK (bit per
  // rule) so downstream can both filter (keep) and audit per-rule kill
  // rates without re-running the battery. Thresholds sit inside the
  // corpus's observed ranges so every rule genuinely fires on a slice.
  // Determinism: all comparisons are on integers or on the fixed-order IEEE
  // ratios both engines already hash-match in text_quality_scores.
  private val gopherRules = Q(
    "filter_gopher_rules",
    Some("""
      WITH b AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      s AS (SELECT doc_id, len(t) AS nt, len(list_distinct(t)) AS nd,
              len(list_filter(t, x -> x IN ('the', 'a'))) AS ns FROM b),
      q AS (SELECT doc_id, nt, nd / nt AS ur, ns / nt AS sr,
              0.3 * (nd / nt) + 0.5 * (1 - ns / nt)
                + 0.2 * least(1.0, nt / 100.0) AS qs FROM s),
      r AS (SELECT doc_id, nt,
              CAST(CASE WHEN nt < 20 THEN 1 ELSE 0 END
                 + CASE WHEN nt > 80 THEN 2 ELSE 0 END
                 + CASE WHEN ur < 0.35 THEN 4 ELSE 0 END
                 + CASE WHEN sr > 0.10 THEN 8 ELSE 0 END
                 + CASE WHEN qs < 0.70 THEN 16 ELSE 0 END AS INTEGER) AS reasons
            FROM q)
      SELECT doc_id, nt AS n_tokens, reasons, reasons = 0 AS keep
      FROM r ORDER BY doc_id
    """)) { (spark, dir) =>
    val ur = col("n_distinct") / col("n_tokens")
    val sr = col("n_stop") / col("n_tokens")
    qualityFrame(spark, dir)
      .withColumn("reasons",
        (when(col("n_tokens") < 20, 1).otherwise(0)
          + when(col("n_tokens") > 80, 2).otherwise(0)
          + when(ur < 0.35, 4).otherwise(0)
          + when(sr > 0.10, 8).otherwise(0)
          + when(col("quality_score") < 0.70, 16).otherwise(0)).cast("int"))
      .select(col("doc_id"), col("n_tokens").as("n_tokens"),
        col("reasons"), (col("reasons") === 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------------------
  // Source-level quality gating: drop whole SOURCES whose aggregate quality
  // sits below the median source — the domain/feed-level cut (spam feeds,
  // boilerplate mirrors) that per-doc rules can't see. Scale shape: the
  // per-source rollup is an integer-sum aggregate (exact and
  // order-independent, so map-side partial agg stays enabled — no double
  // summation crosses the wire), the source table is vocabulary-sized and
  // broadcasts back onto the doc grain, and the global threshold is a
  // 1-row broadcast. Source score recomputed from INTEGER TOTALS
  // (0.3*uniq + 0.5*(1-stop) + 0.2*len-term) rather than averaging per-doc
  // doubles — fixed-order IEEE on exact sums, bit-identical cross-engine.
  private val sourceQualityGate = Q(
    "filter_source_quality",
    Some("""
      WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      s AS (SELECT doc_id, source, len(t) AS nt, len(list_distinct(t)) AS nd,
              len(list_filter(t, x -> x IN ('the', 'a'))) AS ns FROM b),
      src AS (SELECT source, COUNT(*) AS n_docs, SUM(nt) AS snt,
                SUM(nd) AS snd, SUM(ns) AS sns FROM s GROUP BY source),
      sq AS (SELECT source,
               0.3 * (snd / snt) + 0.5 * (1 - sns / snt)
                 + 0.2 * least(1.0, (snt / n_docs) / 100.0) AS src_score
             FROM src),
      g AS (SELECT median(src_score) AS thr FROM sq)
      SELECT s.doc_id, s.source, sq.src_score, sq.src_score >= g.thr AS kept
      FROM s JOIN sq ON s.source = sq.source CROSS JOIN g
      ORDER BY doc_id
    """)) { (spark, dir) =>
    val t = TextOps.tokens(col("text"))
    val perDoc = docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(t).as("nt"), size(array_distinct(t)).as("nd"),
        size(filter(t, x => x.isin("the", "a"))).as("ns"))
    val src = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("snt"),
        sum(col("nd")).as("snd"), sum(col("ns")).as("sns"))
      .select(col("source"),
        (lit(0.3) * (col("snd") / col("snt"))
          + lit(0.5) * (lit(1) - col("sns") / col("snt"))
          + lit(0.2) * least(lit(1.0), (col("snt") / col("n_docs")) / lit(100.0)))
          .as("src_score"))
    val thr = src.agg(median(col("src_score")).as("thr"))
    perDoc.select(col("doc_id"), col("source"))
      .join(broadcast(src), "source")
      .crossJoin(broadcast(thr))
      .select(col("doc_id"), col("source"), col("src_score"),
        (col("src_score") >= col("thr")).as("kept"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------------------
  // PII scrubbing — the redaction pass every training-data pipeline runs
  // before tokenization (emails / IPv4s / phone numbers -> typed
  // placeholders). The corpus text is PII-free word salad, so deterministic
  // PII is synthesized from doc_id (the media-fixture discipline: both
  // engines build the identical string, so the REDACTION — match counts,
  // placeholder placement, no over-matching of surrounding text — is what
  // the hash gate checks, via md5 of the fully redacted document).
  //
  // Patterns are written in the RE2-compatible subset (no backreferences,
  // no lookaround) so Java regex (Spark) and RE2 (DuckDB) agree; \b is the
  // ASCII word boundary in both. Scale shape: map-only — three
  // codegen'd regexp_replace passes + three regexp_count, no shuffle except
  // the output sort; at 100 TB this is the classic embarrassingly-parallel
  // scrub stage.
  private val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val piiIpRe = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val piiPhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val piiRedact = Q(
    "text_pii_redact",
    Some("""
      WITH s AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@test.org' ELSE '' END
            || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
            || CAST(doc_id % 254 + 1 AS VARCHAR)
            || ' tel 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
            || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
        CAST(len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INTEGER) AS n_ip,
        CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS INTEGER) AS n_phone,
        md5(regexp_replace(regexp_replace(regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
      FROM s ORDER BY doc_id
    """)) { (spark, dir) =>
    val synth = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
      when(col("doc_id") % 3 === 0, lit(" cc admin@test.org")).otherwise(lit("")),
      lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
      (col("doc_id") % 254 + 1).cast("string"),
      lit(" tel 555-"), (col("doc_id") % 900 + 100).cast("string"), lit("-"),
      (col("doc_id") % 9000 + 1000).cast("string"))
    docs(spark, dir)
      .select(col("doc_id"), synth.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(piiEmailRe)).cast("int").as("n_email"),
        regexp_count(col("t"), lit(piiIpRe)).cast("int").as("n_ip"),
        regexp_count(col("t"), lit(piiPhoneRe)).cast("int").as("n_phone"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("t"),
          lit(piiEmailRe), lit("<EMAIL>")),
          lit(piiIpRe), lit("<IP>")),
          lit(piiPhoneRe), lit("<PHONE>"))).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  // F4 string parsing (SURVEY §2.7): the reference's prefix/suffix threading
  // ("events_YYYYMMDD" table names, "year=" path parts) generalized — parse
  // the numeric id out of the source tag, slice its prefix, count docs.
  private val sourceParse = Q(
    "fn_source_parse",
    Some("""
      SELECT source,
        CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) AS src_num,
        left(source, 3) AS src_prefix,
        CAST(length(source) AS INTEGER) AS src_len,
        COUNT(*) AS n_docs
      FROM documents
      GROUP BY source ORDER BY source
    """)) { (spark, dir) =>
    docs(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(
        col("source"),
        regexp_extract(col("source"), "([0-9]+)", 1).cast("int").as("src_num"),
        substring(col("source"), 1, 3).as("src_prefix"),
        length(col("source")).as("src_len"),
        col("n_docs"))
      .orderBy(col("source"))
  }

  // Repetition quality (the Gopher-rule family): fraction of the document
  // owned by its single most-repeated adjacent bigram — boilerplate/spam
  // flag orthogonal to the stopword/uniqueness scores. Spark side is ONE
  // map-only codegen kernel per doc (top_bigram_count: a JVM hash-count
  // pass, no explode, no shuffle); the oracle pays the explode+group the
  // kernel avoids — at 100 TB that's the difference between a projection
  // and shuffling every bigram of the corpus.
  private val repetition = Q(
    "text_repetition_scores",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      bg AS (SELECT doc_id,
        CASE WHEN len(t) >= 2
          THEN list_transform(generate_series(1, len(t)-1),
               i -> t[i] || ' ' || t[i+1])
          ELSE [] END AS bgs
        FROM tok),
      ex AS (SELECT doc_id, unnest(bgs) AS b FROM bg),
      cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM ex GROUP BY doc_id, b),
      top AS (SELECT doc_id, max(c) AS top_n FROM cnt GROUP BY doc_id)
      SELECT b.doc_id,
        CAST(len(b.bgs) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(t.top_n, 0) AS BIGINT) AS top_bigram_n,
        CASE WHEN len(b.bgs) > 0
          THEN CAST(COALESCE(t.top_n, 0) AS BIGINT) / CAST(len(b.bgs) AS BIGINT)
          ELSE 0.0 END AS top_bigram_frac
      FROM bg b LEFT JOIN top t ON b.doc_id = t.doc_id
      ORDER BY b.doc_id
    """)) { (spark, dir) =>
    val nBigrams = greatest(
      size(split(col("text"), " ")) - 1, lit(0)).cast("long")
    docs(spark, dir)
      .select(col("doc_id"), nBigrams.as("n_bigrams"),
        // coalesce: the kernel null-propagates on null text, the oracle's
        // COALESCE(top_n, 0) yields 0 — match it
        coalesce(graft.functions.top_bigram_count(col("text")), lit(0L))
          .as("top_bigram_n"))
      .select(col("doc_id"), col("n_bigrams"), col("top_bigram_n"),
        when(col("n_bigrams") > 0, col("top_bigram_n") / col("n_bigrams"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  // Sequence packing: fill fixed token-budget training bins in doc_id
  // order (a doc belongs to the bin its first token lands in). The oracle
  // is the natural single-window prefix sum; the Spark side uses
  // graft.ops.Prefix's two-phase scan — range-partitioned local sums plus
  // driver-prefix-summed per-partition offsets — because an un-partitioned
  // `sum OVER (ORDER BY ...)` funnels the whole corpus through ONE reducer
  // at 100 TB. Spec-checked row-identical to the window form.
  private val packBins = Q(
    "pack_token_bins",
    Some("""
      WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id) AS cum FROM t),
      b AS (
        SELECT doc_id, n_tokens,
          CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS bin_id FROM c)
      SELECT bin_id, COUNT(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM b GROUP BY bin_id ORDER BY bin_id
    """)) { (spark, dir) =>
    val t = docs(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    graft.ops.Prefix.packBins(t, "doc_id", "n_tokens", budget = 2000L)
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin_id"))
  }

  // Incremental-ingest dedup: admit or reject a NEW batch (doc_id % 10 == 9
  // plays the fresh crawl) against the EXISTING corpus — the shape a
  // continuously-fed training pipeline runs daily, where re-deduping the
  // whole corpus per batch would be quadratic in ingest history. Exact
  // duplicates match on the normalized 128-bit hash; near-duplicates on a
  // shared MinHash LSH band signature. Both checks are semi-joins AGAINST
  // the corpus side: at 100 TB the corpus's hash and band tables are
  // pre-materialized index tables (the same frames `dedup_normalized` /
  // `dedup_minhash_lsh_pairs` build), the new batch is the small broadcast
  // side, and the corpus is never re-scanned per batch beyond those index
  // reads. Output: one row per new doc with its admit/reject flags.
  private val incremental = Q(
    "dedup_incremental",
    Some(s"""
      WITH ${TextOps.duckPairsCtes},
      nh AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text),
          '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS nh FROM documents),
      newd AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 9),
      oldd AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 9),
      ex AS (SELECT DISTINCT n.doc_id FROM nh n
        JOIN newd ON n.doc_id = newd.doc_id
        WHERE n.nh IN (SELECT o.nh FROM nh o
          JOIN oldd ON o.doc_id = oldd.doc_id)),
      nr AS (SELECT DISTINCT a.doc_id FROM bands a
        JOIN newd ON a.doc_id = newd.doc_id
        JOIN bands b ON b.band = a.band AND b.sig = a.sig
        JOIN oldd ON b.doc_id = oldd.doc_id)
      SELECT newd.doc_id,
        CAST(newd.doc_id IN (SELECT doc_id FROM ex) AS INTEGER) AS dup_exact,
        CAST(newd.doc_id IN (SELECT doc_id FROM nr) AS INTEGER) AS dup_near,
        CAST(newd.doc_id NOT IN (SELECT doc_id FROM ex)
         AND newd.doc_id NOT IN (SELECT doc_id FROM nr) AS INTEGER) AS admit
      FROM newd ORDER BY doc_id
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
    val isNew = col("doc_id") % 10 === 9
    val newDocs = d.filter(isNew)
    val oldDocs = d.filter(!isNew)
    val nh = (f: DataFrame) =>
      f.select(col("doc_id"), md5(TextOps.normalize(col("text"))).as("nh"))
    val dupExact = nh(newDocs)
      .join(nh(oldDocs).select("nh").distinct(), Seq("nh"), "left_semi")
      .select(col("doc_id")).withColumn("de", lit(1))
    val dupNear = TextOps.lshBands(newDocs, "doc_id", "text")
      .join(TextOps.lshBands(oldDocs, "doc_id", "text")
        .select("band", "sig").distinct(), Seq("band", "sig"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("dn", lit(1))
    newDocs.select(col("doc_id"))
      .join(dupExact, Seq("doc_id"), "left")
      .join(dupNear, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("de"), lit(0)).as("dup_exact"),
        coalesce(col("dn"), lit(0)).as("dup_near"),
        when(col("de").isNull && col("dn").isNull, 1).otherwise(0).as("admit"))
      .orderBy(col("doc_id"))
  }

  // Probability-proportional-to-size systematic sampling — the weighted
  // sampler a token-budgeted eval/calibration draw wants: a document's
  // selection probability is proportional to its TOKEN count, via fixed-step
  // points walked over the cumulative token axis (Madow systematic PPS).
  // All arithmetic is int64 — cumulative starts from graft.ops.Prefix's
  // two-phase running sum (no single-reducer window), step = W div n, and
  // the per-doc hit count is two integer divisions over a shifted
  // (all-positive, so floor == truncate in every engine) interval — no
  // float rounding anywhere, unlike exp/log-keyed weighted reservoirs whose
  // libm calls diverge across engines. Deterministic, rerun-stable,
  // one range shuffle at any corpus size.
  private val ppsSample = Q(
    "sample_pps_systematic",
    Some("""
      WITH d AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (SELECT doc_id, n_tokens, CAST(SUM(n_tokens) OVER (
          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS BIGINT) AS cum FROM d),
      p AS (SELECT doc_id, n_tokens, cum - n_tokens AS cum_start,
          greatest((SELECT CAST(SUM(n_tokens) AS BIGINT) FROM d) // 25, 1) AS s
        FROM c),
      h AS (SELECT doc_id, n_tokens, cum_start,
          ((cum_start + n_tokens + s - 1) // s) - ((cum_start + s - 1) // s)
            AS n_hits FROM p)
      SELECT doc_id, n_tokens, cum_start, CAST(n_hits AS BIGINT) AS n_hits
      FROM h WHERE n_hits > 0 ORDER BY doc_id
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val withCum = graft.ops.Prefix.runningSum(d, "doc_id", "n_tokens", "cum")
    val grand = d.agg(sum(col("n_tokens")).as("tw"))
    withCum.crossJoin(broadcast(grand))
      .withColumn("s", greatest(expr("tw div 25"), lit(1L)))
      .withColumn("cum_start", col("cum") - col("n_tokens"))
      .withColumn("n_hits",
        expr("((cum_start + n_tokens + s - 1) div s) - ((cum_start + s - 1) div s)"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("n_tokens"), col("cum_start"), col("n_hits"))
      .orderBy(col("doc_id"))
  }

  // Stratified deterministic sampling — training-data mixture control: the
  // over-represented head stratum (en) is down-sampled to 10% while tail
  // languages keep 50%, with hash-of-key membership so every stratum's
  // sample is rerun-stable and shard-independent (same contract as
  // sample_hash_10pct, per-stratum rates). At 100 TB this is one map-only
  // filter + one aggregation — rates come from a broadcast-sized literal
  // table, never a shuffle of the corpus.
  private val stratifiedSample = Q(
    "sample_stratified_mix",
    Some("""
      WITH t AS (
        SELECT lang, doc_id,
          (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 100 < CASE WHEN lang = 'en' THEN 10 ELSE 50 END) AS kept
        FROM documents)
      SELECT lang, COUNT(*) AS n_total,
        COUNT(CASE WHEN kept THEN doc_id END) AS n_kept,
        min(CASE WHEN kept THEN doc_id END) AS first_kept,
        max(CASE WHEN kept THEN doc_id END) AS last_kept
      FROM t GROUP BY lang ORDER BY lang
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
    val rate = when(col("lang") === "en", 10).otherwise(50)
    val kept = (TextOps.h32(col("doc_id").cast("string")) % 100) < rate
    d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(kept, col("doc_id"))).as("n_kept"),
        min(when(kept, col("doc_id"))).as("first_kept"),
        max(when(kept, col("doc_id"))).as("last_kept"))
      .orderBy(col("lang"))
  }

  // Deterministic hash-based subsampling — the reproducible alternative to
  // rand()-based sampling for training-data splits: membership depends only
  // on the row key, so the sample is stable across engines, partitionings,
  // and reruns (and any shard can be recomputed independently at 100 TB).
  private val hashSample = Q(
    "sample_hash_10pct",
    Some("""
      WITH s AS (
        SELECT doc_id, lang
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 10 = 0)
      SELECT lang, COUNT(*) AS n_docs, min(doc_id) AS first_doc,
        max(doc_id) AS last_doc
      FROM s GROUP BY lang ORDER BY lang
    """)) { (spark, dir) =>
    docs(spark, dir)
      .filter(TextOps.h32(col("doc_id").cast("string")) % 10 === 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"))
  }

  // Deterministic 80/10/10 train/val/test split — the downstream contract
  // every training pipeline needs from its corpus: membership decided by a
  // hash of the ROW KEY (not position, not RNG), so any shard recomputes
  // its assignment independently, reruns are stable, and the three splits
  // are disjoint and exhaustive BY CONSTRUCTION (one hash bucket each).
  // Same md5-bucket primitive as sample_hash_10pct; reported per split x
  // language so leakage-sensitive slices are auditable. Map-only + a
  // bounded hash agg — corpus-linear, no shuffle beyond the tiny agg.
  private val trainValTest = Q(
    "sample_train_val_test",
    Some("""
      WITH s AS (
        SELECT lang, n_chars,
          CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END
            AS split
        FROM (SELECT lang, n_chars,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 10 AS h FROM documents))
      SELECT split, lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM s GROUP BY split, lang ORDER BY split, lang
    """)) { (spark, dir) =>
    val h = TextOps.h32(col("doc_id").cast("string")) % 10
    docs(spark, dir)
      .select(col("lang"), col("n_chars"),
        when(h < 8, "train").when(h === 8, "val").otherwise("test")
          .as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("split"), col("lang"))
  }

  // Edit-distance verification of the LSH candidate pairs (bounded to the
  // 64-char prefix so the O(len^2) DP never explodes on a long outlier) —
  // the character-level confirm pass layered over the token-level LSH.
  private val levenshteinPairs = Q(
    "dedup_levenshtein_pairs",
    Some(s"""
      WITH ${TextOps.duckPairsCtes},
      d AS (SELECT doc_id, substr(text, 1, 64) AS prefix FROM documents)
      SELECT p.doc_a, p.doc_b,
        CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS edit_dist
      FROM pairs p
      JOIN d a ON a.doc_id = p.doc_a
      JOIN d b ON b.doc_id = p.doc_b
      ORDER BY doc_a, doc_b
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
    val pairs = lshPairs(spark, dir)
    val pre = d.select(col("doc_id"), substring(col("text"), 1, 64).as("prefix"))
    pairs
      .join(pre.select(col("doc_id").as("doc_a"), col("prefix").as("pa")), Seq("doc_a"))
      .join(pre.select(col("doc_id").as("doc_b"), col("prefix").as("pb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb")).as("edit_dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // Jaro-Winkler scoring of the same LSH candidate pairs — the
  // record-linkage scorer (Winkler 1990) as the alternative confirm pass:
  // where Levenshtein charges per edit, Jaro-Winkler rewards shared prefix
  // and tolerates transpositions, the right bias for near-dup boilerplate
  // that diverges late in the string. Same bounded shape as the
  // edit-distance confirm: scored on the 64-char ASCII prefix, candidates
  // only, never all-pairs. graft.functions.JaroWinkler is a codegen'd
  // Catalyst expression bit-compatible with DuckDB's builtin on ASCII.
  private val jwPairs = Q(
    "dedup_jw_pairs",
    Some(s"""
      WITH ${TextOps.duckPairsCtes},
      d AS (SELECT doc_id, substr(text, 1, 64) AS prefix FROM documents)
      SELECT p.doc_a, p.doc_b,
        jaro_winkler_similarity(a.prefix, b.prefix) AS jw_sim
      FROM pairs p
      JOIN d a ON a.doc_id = p.doc_a
      JOIN d b ON b.doc_id = p.doc_b
      ORDER BY doc_a, doc_b
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
    val pairs = lshPairs(spark, dir)
    val pre = d.select(col("doc_id"), substring(col("text"), 1, 64).as("prefix"))
    pairs
      .join(pre.select(col("doc_id").as("doc_a"), col("prefix").as("pa")), Seq("doc_a"))
      .join(pre.select(col("doc_id").as("doc_b"), col("prefix").as("pb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.jaro_winkler(col("pa"), col("pb")).as("jw_sim"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // TF-IDF top terms: the corpus-wide signal the per-doc quality scores
  // can't see — a term matters when it's frequent HERE and rare ELSEWHERE.
  // Score is the exact rational (term_count * n_docs) / (doc_len * doc_freq)
  // — rank-equivalent per doc to tf * (a linearized idf), and, unlike
  // log-idf, computable as one int64-exact product each side of a single
  // IEEE division, so both engines produce bit-identical doubles.
  // Shuffle ledger at corpus scale: ONE corpus-width shuffle builds tf
  // (doc_id, term) partials map-side; doc_len re-aggregates tf (strictly
  // smaller), doc_freq is vocabulary-sized, the grand doc count joins back
  // as a broadcast 1-row frame, and the top-3 window partitions by doc_id
  // — per-partition state bounded by one document's vocabulary.
  // The tf<->doc_freq join keys on raw `term`, which is Zipf-distributed:
  // a stopword like "the" appears in nearly every document, so a plain
  // hash join funnels ~n_docs rows through ONE reducer at corpus scale.
  // Routed through Skew.saltedJoin: tf rows spread over nSalts reducers
  // per term, the vocabulary-sized doc_freq side is replicated nSalts x
  // (cheap — it is the SMALL side by construction). When the vocabulary is
  // known-bounded (e.g. post-filter dictionary), `broadcast(dfr)` skips
  // the tf shuffle entirely; Heaps'-law vocabularies on raw web text are
  // NOT bounded, so the salted shuffle is the honest default.
  private val tfidfTopTerms = Q(
    "tfidf_top_terms",
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(
            lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS term_count
        FROM toks WHERE term <> '' GROUP BY doc_id, term),
      dl AS (SELECT doc_id, CAST(SUM(term_count) AS BIGINT) AS doc_len
        FROM tf GROUP BY doc_id),
      dfr AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.term_count, dfr.doc_freq,
          (tf.term_count * n.n_docs) / CAST(dl.doc_len * dfr.doc_freq AS DOUBLE)
            AS score
        FROM tf JOIN dl USING (doc_id) JOIN dfr USING (term) CROSS JOIN n)
      SELECT doc_id, term, term_count, doc_freq, score, rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS rn
        FROM scored) WHERE rn <= 3
      ORDER BY doc_id, rn
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
    // The (doc, term) tf frame is consumed THREE times (dl re-aggregate,
    // doc_freq build, the scored join's left side); localCheckpoint
    // materializes the normalize + explode + first aggregate ONCE instead
    // of re-running the corpus-width regex pass per consumer — the
    // rareBigramRatio spine posture.
    val tf = d
      .select(col("doc_id"),
        explode(split(TextOps.normalize(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("term_count"))
      .localCheckpoint()
    val dl = tf.groupBy(col("doc_id"))
      .agg(sum(col("term_count")).as("doc_len"))
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val n = d.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    graft.ops.Skew.saltedJoin(tf.join(dl, Seq("doc_id")), dfr, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("term_count") * col("n_docs"))
          / (col("doc_len") * col("doc_freq")).cast("double"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("term_count"), col("doc_freq"),
        col("score"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  // Quality-weighted canonical per duplicate cluster — the production
  // upgrade of dedup_components' min-id rule: when a near-dup cluster
  // collapses to one survivor, keep the HIGHEST-QUALITY copy (cleanest
  // boilerplate, best length), not the accidentally-lowest id. The
  // composite score is row-wise fixed-order IEEE (bit-identical in both
  // engines), so the per-cluster argmax is oracle-exact. Scale shape: the
  // components pass is the dominant cost (already O(log diameter)); this
  // adds one doc_id-keyed join + a window partitioned by cluster id —
  // per-partition state bounded by the largest duplicate cluster.
  private val clusterCanonical = Q(
    "dedup_cluster_canonical",
    Some(s"""
      WITH RECURSIVE ${TextOps.duckPairsCtes},
      sym AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
      comp AS (
        SELECT a AS doc_id, least(a, min(b)) AS comp_id
        FROM reach GROUP BY a),
      b2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      s2 AS (SELECT doc_id, len(t) AS n_tokens,
               len(list_distinct(t)) AS n_distinct,
               len(list_filter(t, x -> x IN ('the', 'a'))) AS n_stop
             FROM b2),
      qs AS (SELECT doc_id,
               0.3 * (n_distinct / n_tokens) + 0.5 * (1 - n_stop / n_tokens)
                 + 0.2 * least(1.0, n_tokens / 100.0) AS quality_score
             FROM s2)
      SELECT comp_id, doc_id AS canonical_doc, n_members,
        quality_score AS canonical_quality
      FROM (
        SELECT c.comp_id, c.doc_id, q.quality_score,
          COUNT(*) OVER (PARTITION BY c.comp_id) AS n_members,
          row_number() OVER (PARTITION BY c.comp_id
            ORDER BY q.quality_score DESC, c.doc_id) AS rn
        FROM comp c JOIN qs q USING (doc_id))
      WHERE rn = 1 ORDER BY comp_id
    """)) { (spark, dir) =>
    val comps = componentsSpine(spark, dir)
      .select(col("id").as("doc_id"), col("comp").as("comp_id"))
    val qs = qualityFrame(spark, dir).select(col("doc_id"), col("quality_score"))
    val byComp = Window.partitionBy(col("comp_id"))
    comps.join(qs, Seq("doc_id"))
      .withColumn("n_members", count(lit(1)).over(byComp))
      .withColumn("rn", row_number().over(
        byComp.orderBy(col("quality_score").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("comp_id"), col("doc_id").as("canonical_doc"),
        col("n_members"), col("quality_score").as("canonical_quality"))
      .orderBy(col("comp_id"))
  }

  // -------------------------------------------------------------------------
  // TextRank keyword extraction (Mihalcea & Tarau 2004): weighted PageRank
  // over the token co-occurrence graph — nodes are corpus terms, an edge's
  // weight counts how often the two terms are ADJACENT anywhere in the
  // corpus (support ≥ 2 prunes noise edges), and the stationary score
  // ranks "keywords" the way raw frequency can't (a term scores high by
  // neighboring OTHER high-scoring terms, not by count alone). This is the
  // unsupervised keyword miner a training-data pipeline runs for corpus
  // cards / topic drift alongside tfidf_top_terms (which needs a document
  // grouping; TextRank works corpus-global).
  //
  // Exactness: [[graft.ops.PageRank.runFixedPointWeighted]] — 1e15-scaled
  // integer fixed-point, truncate-before-multiply edge contributions, so
  // five power iterations are bit-identical to the oracle's five unrolled
  // integer CTEs (the graph_pagerank_parts discipline on a text graph).
  // Scale shape: graph build is one corpus-linear bigram aggregate
  // (map-side combinable); iterations are O(iters × |E|) with the edge
  // side exchange-free across rounds; |E| is vocabulary², bounded far
  // below corpus size by Heaps' law and the support floor.
  private val textrankTerms = Q(
    "text_textrank_terms",
    Some {
      val S = "1000000000000000"
      def iter(prev: String, cur: String): String =
        s"""$cur AS (
          SELECT n.node,
                 CAST($S * 15 // 100 // (SELECT n FROM c)
                      + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, sum((r.r // d.wdeg) * e.w) AS s
            FROM e JOIN $prev r ON e.src = r.node JOIN wdeg d ON e.src = d.src
            GROUP BY e.dst) s ON n.node = s.node)"""
      s"""
      WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
      bg AS (SELECT unnest(CASE WHEN len(tk) >= 2 THEN
               list_transform(generate_series(1, len(tk) - 1),
                 i -> {'wa': tk[i], 'wb': tk[i + 1]})
             ELSE [] END) AS p FROM t),
      pw AS (SELECT least((p).wa, (p).wb) AS a, greatest((p).wa, (p).wb) AS b,
               CAST(COUNT(*) AS BIGINT) AS w
             FROM bg WHERE (p).wa <> (p).wb GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      e AS (SELECT a AS src, b AS dst, w FROM pw
            UNION ALL SELECT b, a, w FROM pw),
      wdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg FROM e GROUP BY src),
      nodes AS (SELECT DISTINCT src AS node FROM e),
      c AS (SELECT count(*) AS n FROM nodes),
      r0 AS (SELECT node, CAST($S // (SELECT n FROM c) AS BIGINT) AS r FROM nodes),
      ${iter("r0", "r1")},
      ${iter("r1", "r2")},
      ${iter("r2", "r3")},
      ${iter("r3", "r4")},
      ${iter("r4", "r5")}
      SELECT node AS term, r AS rank_fp, r / $S.0 AS rank
      FROM r5 ORDER BY rank_fp DESC, term LIMIT 20"""
    }
  ) { (spark, dir) =>
    // edge weights fold the DIRECTED pair-count spine ([[pairCounts]] —
    // shared with lm_pmi_bigrams, codegen arrays_zip pair build) to
    // undirected adjacency: w(a,b) = cnt(a→b) + cnt(b→a), a ≠ b
    val pw = pairCounts(spark, dir)
      .filter(col("wa") =!= col("wb"))
      .groupBy(least(col("wa"), col("wb")).as("a"),
        greatest(col("wa"), col("wb")).as("b"))
      .agg(sum(col("cnt")).as("w"))
      .filter(col("w") >= 2)
    val edges = pw.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .union(pw.select(col("b").as("src"), col("a").as("dst"), col("w")))
    graft.ops.PageRank.runFixedPointWeighted(edges, iters = 5)
      .orderBy(col("rank_fp").desc, col("node"))
      .limit(20)
      .select(col("node").as("term"), col("rank_fp"), col("rank"))
  }

  override val specs: Seq[Q] = Seq(clusterCanonical,
    dedupExact, dedupNorm, minhashLsh, components, jaccard, simhash,
    quality, qualityPctl, repetition, langId, tokenCounts, fingerprint,
    gopherRules, sourceQualityGate,
    piiRedact, sourceParse, hashSample, stratifiedSample, ppsSample, trainValTest,
    packBins,
    levenshteinPairs, jwPairs, tfidfTopTerms, incremental, textrankTerms)
}
