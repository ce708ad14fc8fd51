package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.Tables
import graft.ops.TextOps

/**
 * Language-model data-prep operators over `documents`: corpus-informed
 * quality scoring (rare-bigram ratio — the cheap stand-in for CCNet-style
 * LM-perplexity filtering, rank-correlated with "this text doesn't look
 * like the corpus") and tokenizer artifacts (frequency-ranked vocabulary
 * build + per-document token-id encoding — the step that turns cleaned
 * text into trainable sequences).
 *
 * Reference provenance: the reference stops at extraction
 * (`/root/reference/config/queries/extract_events.sql`); these continue the
 * driver's LLM-pipeline north star (SURVEY.md §2.9).
 *
 * Exact-output discipline: all scores are ratios of int64 counts — ONE IEEE
 * division per output row, bit-identical in Spark and DuckDB; token ids are
 * integers. No transcendental functions anywhere (a real perplexity needs
 * log-probs; the rare-mass fraction keeps the filter signal oracle-exact).
 *
 * Scale ledger at 100 TB:
 *   - bigram language model = ONE corpus-width (doc, bigram) aggregate; the
 *     doc→corpus frequency join is Zipf-hot on the head bigrams, so it goes
 *     through [[graft.ops.Skew.saltedJoin]] (same posture as tfidf).
 *   - vocabulary ranking sorts VOCABULARY rows, not corpus rows — Heaps'-law
 *     bounded (≈1e6-1e7 entries for web corpora), metadata-sized next to the
 *     corpus, so its single-partition window is inherent and cheap; the
 *     encode join then BROADCASTS the vocab to the corpus side.
 */
object Lm extends Family {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))

  private val duckToks =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos
      |  FROM documents)""".stripMargin

  // -------------------------------------------------------------------------
  // Rare-bigram ratio: what fraction of a document's bigram occurrences are
  // corpus-rare (total corpus frequency <= 5)? High ratio = text unlike the
  // corpus (gibberish, boilerplate-mangled, or genuinely novel) — the same
  // decision boundary a KenLM perplexity filter draws, expressed in exact
  // integer counts. Per-doc bigram counts aggregate BEFORE the frequency
  // join, so the salted join moves (doc, distinct-bigram) rows, not every
  // occurrence.
  /** The rare-bigram pipeline with the rarity threshold as a dial —
    * `rareMax` is the highest corpus frequency still counted rare. The
    * catalog query pins 5 (the oracle's dial); ScaleSweep's threshold∝N
    * row scales it with the replica factor, because absolute-count rarity
    * degenerates when the sweep multiplies every frequency by the factor
    * (production thresholds track corpus size for the same reason). */
  private[graft] def rareBigramRatio(spark: SparkSession, dir: String,
                                     rareMax: Long): DataFrame = {
    // one-pass codegen bigram kernel ([[graft.functions.adjacent_bigrams]])
    // — the transform(sequence(...)) HOF was interpreted per element, with
    // element_at re-walking the array; the arrays_zip struct formulation
    // pays a struct-array materialization + a second concat projection.
    // The (doc, bigram) partial frame is consumed THREE times (corpus
    // frequency build, bloom tagging, per-doc totals); localCheckpoint
    // materializes the explode + first aggregate ONCE instead of
    // re-evaluating the corpus-width pass per consumer — the same
    // materialize-the-spine posture a deployment takes with its bigram
    // table (MEMORY_AND_DISK, spills instead of OOMing at scale).
    val btf = docs(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.adjacent_bigrams(col("text"))).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("bcnt"))
      .localCheckpoint()
    val cf = btf.groupBy(col("bigram")).agg(sum(col("bcnt")).as("freq"))
    // A doc's bigram is rare UNLESS it's in the corpus-COMMON head
    // (freq > rareMax) — and that head is Zipf-bounded
    // (<= total_occurrences/rareMax distinct), while the rare tail is
    // where Heaps-law growth lives. So instead of salt-joining EVERY
    // distinct (doc, bigram) row against the full frequency table, build
    // a Bloom filter over the head: bloom-negative rows are PROVABLY rare
    // and never shuffle; only head candidates (head hits + ~1% false
    // positives) enter the salted join, whose LEFT backstop re-checks
    // membership exactly — the bloom is invisible in the result, the
    // decontam_bloom discipline applied to the LM filter.
    val common = cf.filter(col("freq") > rareMax)
      .select(col("bigram")).localCheckpoint()
    val bloom = common.stat.bloomFilter("bigram",
      math.max(1000L, common.count()), 0.01)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightCommon = udf((b: String) => bloomB.value.mightContainString(b))
    val tagged = btf.withColumn("mc", mightCommon(col("bigram")))
    val head = graft.ops.Skew.saltedJoin(
        tagged.filter(col("mc")), common.withColumn("hit", lit(1)),
        "bigram", joinType = "left")
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(when(col("hit").isNull, col("bcnt"))), lit(0L))
        .as("rare_head"))
    tagged.groupBy(col("doc_id"))
      .agg(sum(col("bcnt")).as("n_bigrams"),
        coalesce(sum(when(!col("mc"), col("bcnt"))), lit(0L)).as("rare_tail"))
      .join(head, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        (col("rare_tail") + coalesce(col("rare_head"), lit(0L))).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_bigrams").cast("double"))
          .as("rare_ratio"))
      .orderBy(col("doc_id"))
  }

  private val rareBigram = Q(
    "lm_rare_bigram_ratio",
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      bg AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2 THEN
               list_transform(generate_series(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i + 1])
             ELSE [] END) AS bigram FROM t),
      btf AS (SELECT doc_id, bigram, COUNT(*) AS bcnt FROM bg GROUP BY doc_id, bigram),
      cf AS (SELECT bigram, CAST(SUM(bcnt) AS BIGINT) AS freq FROM btf GROUP BY bigram)
      SELECT b.doc_id,
        CAST(SUM(b.bcnt) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(SUM(CASE WHEN cf.freq <= 5 THEN b.bcnt END), 0) AS BIGINT) AS n_rare,
        CAST(COALESCE(SUM(CASE WHEN cf.freq <= 5 THEN b.bcnt END), 0) AS DOUBLE)
          / CAST(SUM(b.bcnt) AS DOUBLE) AS rare_ratio
      FROM btf b JOIN cf USING (bigram)
      GROUP BY b.doc_id ORDER BY b.doc_id
    """)) { (spark, dir) =>
    rareBigramRatio(spark, dir, rareMax = 5L)
  }

  // -------------------------------------------------------------------------
  // Vocabulary build + token-id encode: ids assigned by corpus frequency
  // rank (ties broken by term — the conventional BPE-ish id order), then
  // every document re-expressed as its id sequence. The ranking window sorts
  // only the vocabulary (Heaps-bounded, metadata-sized vs the corpus); the
  // corpus-side encode join broadcasts that vocabulary, so NO corpus-width
  // shuffle happens on the raw token stream — the only data-sized exchange
  // is the per-doc regroup of (pos, id) pairs.
  private val vocabEncode = Q(
    "lm_vocab_encode",
    Some(s"""
      WITH $duckToks,
      vc AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
      vocab AS (SELECT term,
          CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS id
        FROM vc),
      enc AS (SELECT t.doc_id, t.pos, v.id FROM toks t JOIN vocab v USING (term))
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        array_to_string(list(id ORDER BY pos), ',') AS ids_csv
      FROM enc GROUP BY doc_id ORDER BY doc_id
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
    val toks = d.select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("p0", "term")))
      .select(col("doc_id"), col("term"), (col("p0") + 1).cast("long").as("pos"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .withColumn("id", row_number().over(
        Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
      .select(col("term"), col("id"))
    toks.join(broadcast(vocab), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws(",",
          transform(sort_array(collect_list(struct(col("pos"), col("id")))),
            x => x.getField("id"))).as("ids_csv"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------------------
  // BPE merge learning (tokenizer training): the 20 highest-count adjacent
  // symbol merges over the corpus word-frequency table — the artifact a
  // subword tokenizer ships, learned by graft.ops.Bpe's vocab-sized
  // iterative loop (corpus scanned once for word counts; each round is one
  // pair aggregate over the vocabulary plus a 1-row collect; ≤maxLocalVocab
  // vocabularies learn on the driver after one collect).
  //
  // The DuckDB twin UNROLLS the 20 data-dependent rounds as CTE chains —
  // round k = pair-count p{k} over vocab v{k-1}, winner m{k}
  // (ORDER BY cnt DESC, l, r LIMIT 1 — Bpe.learn's exact tie-break), then
  // the greedy left-to-right apply as a recursive read-head scan (the
  // lm_bpe_encode state machine, one symbol or one consumed pair per
  // step) producing v{k}. Every p/m/v is AS MATERIALIZED: each round
  // references its predecessor several times (seed + pair scan + four
  // winner lookups), and DuckDB's default CTE inlining makes that
  // expansion exponential across 20 rounds (observed as a "too many open
  // files" parquet re-scan blowup); materialization restores the
  // once-per-round cost the Spark loop has. A vocabulary exhausted before
  // 20 rounds yields empty m/v tails on both engines (Spark stops the
  // loop; SQL's empty CTEs propagate), so early-stop rows match too.
  private def bpeMergesSql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { k =>
      s"""
      p$k AS MATERIALIZED (
        SELECT pr.l AS l, pr.r AS r, CAST(SUM(n) AS BIGINT) AS cnt FROM (
          SELECT n, unnest(list_transform(generate_series(1, len(syms) - 1),
            j -> struct_pack(l := syms[j], r := syms[j + 1]))) AS pr
          FROM v${k - 1})
        GROUP BY pr.l, pr.r),
      m$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
      a$k AS (
        SELECT syms, n, 1 AS i, CAST([] AS VARCHAR[]) AS out FROM v${k - 1}
        UNION ALL
        SELECT syms, n,
          CASE WHEN i < len(syms) AND syms[i] = (SELECT l FROM m$k)
                AND syms[i + 1] = (SELECT r FROM m$k) THEN i + 2 ELSE i + 1 END,
          CASE WHEN i < len(syms) AND syms[i] = (SELECT l FROM m$k)
                AND syms[i + 1] = (SELECT r FROM m$k)
               THEN list_append(out, syms[i] || syms[i + 1])
               ELSE list_append(out, syms[i]) END
        FROM a$k WHERE i <= len(syms)),
      v$k AS MATERIALIZED (
        SELECT out AS syms, n FROM a$k WHERE i > len(syms) AND len(out) >= 2)"""
    }.mkString(",")
    val union = (1 to nMerges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right", cnt AS pair_count FROM m$k"""
    }.mkString(" UNION ALL ")
    s"""
      WITH RECURSIVE
      w AS MATERIALIZED (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY term),
      v0 AS MATERIALIZED (
        SELECT string_split_regex(term, '') AS syms, n FROM w
        WHERE len(string_split_regex(term, '')) >= 2),
      $rounds
      SELECT * FROM ($union) ORDER BY rank"""
  }

  private val bpeMerges = Q("lm_bpe_merges", Some(bpeMergesSql(20))) { (spark, dir) =>
    val words = docs(spark, dir)
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val merges = graft.ops.Bpe.learn(words, "word", "n", nMerges = 20)
    import spark.implicits._
    merges.toDF()
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        col("pairCount").as("pair_count"))
      .orderBy(col("rank"))
  }

  // -------------------------------------------------------------------------
  // BPE APPLY (tokenizer encode): re-express every document as subword
  // symbols under a FIXED, shipped merge table — the corpus-scale step a
  // training pipeline runs repeatedly (learning runs once, offline; see
  // lm_bpe_merges above). The table below is the 20-merge artifact learned
  // from the sf0.01 corpus, frozen as a literal exactly like the PQ
  // codebook fixtures: apply-with-fixed-artifact is deterministic, so THIS
  // entry carries a full DuckDB oracle even though learning cannot.
  //
  // Scale shape: merges apply to DISTINCT words only (Heaps-bounded vocab,
  // the one justified-UDF input class), then the vocab-sized
  // word→symbols map BROADCASTS back to the corpus token stream — the raw
  // text never shuffles and never enters a UDF. The oracle reproduces
  // graft.ops.Bpe.mergeOnce's symbol-consuming greedy scan exactly, as a
  // recursive CTE advancing a read head one symbol (or one consumed pair)
  // per step, one merge rank at a time — plain string replace() cannot
  // express this (a replaced pair's trailing boundary must remain
  // consumable by the next pair, which non-overlapping scans consume).
  private val FrozenMerges: Seq[graft.ops.Bpe.Merge] = Seq(
    ("e", "r", 4568L), ("i", "n", 2760L), ("o", "w", 2747L),
    ("o", "r", 2696L), ("s", "t", 2676L), ("m", "er", 1852L),
    ("a", "t", 1845L), ("l", "u", 1831L), ("a", "r", 1758L),
    ("p", "ar", 1758L), ("j", "o", 964L), ("jo", "in", 964L),
    ("a", "s", 947L), ("as", "h", 947L), ("h", "ash", 947L),
    ("r", "ow", 943L), ("at", "c", 937L), ("atc", "h", 937L),
    ("b", "atch", 937L), ("a", "n", 936L)
  ).zipWithIndex.map { case ((l, r, c), i) => graft.ops.Bpe.Merge(i + 1, l, r, c) }

  private val bpeEncode = Q(
    "lm_bpe_encode",
    Some {
      val lefts = FrozenMerges.map(m => s"'${m.left}'").mkString("[", ",", "]")
      val rights = FrozenMerges.map(m => s"'${m.right}'").mkString("[", ",", "]")
      val n = FrozenMerges.length
      s"""
      WITH RECURSIVE
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos
        FROM documents),
      tk AS (SELECT doc_id, pos, term FROM toks WHERE term <> ''),
      w AS (SELECT DISTINCT term FROM tk),
      -- state machine per word: m = merge rank, i = 1-based read head over
      -- cur; out accumulates this rank's output symbols. One recursion step
      -- emits one symbol (or one merged pair); i > len(cur) rolls to the
      -- next rank with cur := out.
      enc AS (
        SELECT term, 1 AS m, 1 AS i,
               string_split_regex(term, '') AS cur,
               CAST([] AS VARCHAR[]) AS out
        FROM w
        UNION ALL
        SELECT term,
          CASE WHEN i > len(cur) THEN m + 1 ELSE m END,
          CASE WHEN i > len(cur) THEN 1
               WHEN i < len(cur) AND cur[i] = $lefts[m] AND cur[i+1] = $rights[m]
                 THEN i + 2
               ELSE i + 1 END,
          CASE WHEN i > len(cur) THEN out ELSE cur END,
          CASE WHEN i > len(cur) THEN CAST([] AS VARCHAR[])
               WHEN i < len(cur) AND cur[i] = $lefts[m] AND cur[i+1] = $rights[m]
                 THEN list_append(out, cur[i] || cur[i+1])
               ELSE list_append(out, cur[i]) END
        FROM enc WHERE m <= $n),
      done AS (SELECT term, cur AS syms FROM enc WHERE m = $n + 1),
      ed AS (SELECT t.doc_id, t.pos, d.syms FROM tk t JOIN done d USING (term))
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(len(syms)) AS BIGINT) AS n_subwords,
        array_to_string(flatten(list(syms ORDER BY pos)), ',') AS subs_csv
      FROM ed GROUP BY doc_id ORDER BY doc_id"""
    }
  ) { (spark, dir) =>
    val toks = docs(spark, dir)
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("p0", "term")))
      .select(col("doc_id"), col("term"), (col("p0") + 1).cast("long").as("pos"))
      .filter(col("term") =!= "")
    val merges = FrozenMerges
    val encUdf = udf((w: String) => graft.ops.Bpe.encodeWord(w, merges))
    val encoded = toks.select(col("term")).distinct()
      .withColumn("syms", encUdf(col("term")))
    toks.join(broadcast(encoded), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("syms"))).as("n_subwords"),
        concat_ws(",", flatten(
          transform(sort_array(collect_list(struct(col("pos"), col("syms")))),
            x => x.getField("syms")))).as("subs_csv"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------------------
  // Interpolated Kneser-Ney bigram table — the n-gram LM artifact a
  // CCNet-style quality filter scores against (Kneser & Ney 1995; the
  // KenLM-shipped smoothing). With discount D = 3/4 expressed in quarters,
  //   p_kn(w2|w1) = max(c12 - D, 0)/c1 + D*N1+(w1,.)/c1 * N1+(.,w2)/T
  // becomes ONE exact integer rational per bigram:
  //   num = max(4*c12 - 3, 0)*T + 3*N1+(w1,.)*N1+(.,w2),   den = 4*c1*T
  // and p_kn = num/den is the single IEEE operation (two exact int->double
  // conversions + one division; every value here is far below 2^53 — at
  // 100 TB corpus scale the num/den columns move to DECIMAL(38,0), the
  // division stays the only IEEE step).
  //
  // Scale shape: one corpus-width (w1, w2) aggregate builds the bigram
  // table; everything after is VOCABULARY-sized (context totals, distinct
  // continuation counts, the type grand total as a broadcast 1-row frame).
  // The c1/n_before joins key on single words — Zipf-hot heads, same
  // salted-join escape hatch as tfidf if a head context saturates a
  // reducer. Top-100 by raw count (integer-exact ordering), so the sort is
  // a bounded TakeOrdered, never a corpus sort.
  /** The full (unlimited) KN bigram table — the catalog query is its
    * count-ordered top-100 cut; LmKnSpec checks the KN closure property on
    * this frame (per context w1, probabilities sum to exactly 1). */
  private[catalog] def knTableFull(spark: SparkSession, dir: String): DataFrame = {
    // codegen arrays_zip pair build ([[TextOps.adjacentPairs]]) — the
    // transform(sequence(...)) HOF was interpreted per element
    val c12 = docs(spark, dir)
      .select(explode(TextOps.adjacentPairs(TextOps.tokens(col("text")))).as("p"))
      .select(col("p.wa").as("w1"), col("p.wb").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n_after"))
    val nb = c12.groupBy(col("w2")).agg(count(lit(1)).as("n_before"))
    val tot = c12.agg(count(lit(1)).as("n_types"))
    val num = greatest(lit(4L) * col("c12") - 3L, lit(0L)) * col("n_types") +
      lit(3L) * col("n_after") * col("n_before")
    val den = lit(4L) * col("c1") * col("n_types")
    c12.join(c1, Seq("w1")).join(nb, Seq("w2")).crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12"),
        num.as("kn_num"), den.as("kn_den"),
        (num.cast("double") / den.cast("double")).as("p_kn"),
        col("n_after"), col("n_before"), col("n_types"))
  }

  private val knBigram = Q(
    "lm_kn_bigram_table",
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      bg AS (SELECT unnest(CASE WHEN len(tk) >= 2 THEN
               list_transform(generate_series(1, len(tk) - 1),
                 i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))
             ELSE [] END) AS p FROM t),
      c12 AS (SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
              FROM bg GROUP BY p.w1, p.w2),
      c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                    CAST(COUNT(*) AS BIGINT) AS n_after
             FROM c12 GROUP BY w1),
      nb AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_before
             FROM c12 GROUP BY w2),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c12)
      SELECT b.w1, b.w2, b.c12,
        CAST(GREATEST(4 * b.c12 - 3, 0) * t.n_types
             + 3 * c.n_after * n.n_before AS BIGINT) AS kn_num,
        CAST(4 * c.c1 * t.n_types AS BIGINT) AS kn_den,
        CAST(GREATEST(4 * b.c12 - 3, 0) * t.n_types
             + 3 * c.n_after * n.n_before AS DOUBLE)
          / CAST(4 * c.c1 * t.n_types AS DOUBLE) AS p_kn
      FROM c12 b JOIN c1 c USING (w1) JOIN nb n USING (w2) CROSS JOIN tot t
      ORDER BY b.c12 DESC, b.w1, b.w2 LIMIT 100
    """)) { (spark, dir) =>
    knTableFull(spark, dir)
      .select(col("w1"), col("w2"), col("c12"), col("kn_num"), col("kn_den"),
        col("p_kn"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(100)
  }

  // -------------------------------------------------------------------------
  // KN-model document scoring: every document scored against the corpus
  // Kneser-Ney bigram model (the table lm_kn_bigram_table ships) — the
  // per-document step of a CCNet-style perplexity filter, in this catalog's
  // exact-output discipline. Two signals per doc:
  //   - n_low64: occurrences whose KN probability is below 1/64, decided by
  //     INTEGER cross-multiplication (num*64 < den) — ZERO IEEE operations
  //     in the decision;
  //   - min_pkn: the document's worst bigram probability — p_kn = num/den is
  //     one correctly-rounded division of exact integers, bit-identical
  //     cross-engine, so MIN over them is deterministic too.
  // (A true mean-log-prob needs transcendentals; the threshold mass and the
  // worst-bigram floor are the exact-arithmetic stand-ins, rank-correlated
  // with "this text doesn't look like the corpus". On this smooth synthetic
  // corpus the <1/64 tail is deliberately thin — 25/500 docs; real web text
  // has the fat low-prob tail the filter exists for.)
  //
  // Scale shape: the doc-grain (doc, bigram) aggregate is the only
  // corpus-width frame; model components are bigram-type/vocabulary-sized.
  // The w1/w2 joins inherit rare-bigram's Zipf-head posture (salted-join
  // escape hatch, Skew.saltedJoin) — at this SF plain hash joins hold.
  private val knDocScore = Q(
    "lm_kn_doc_score",
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      bg AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2 THEN
               list_transform(generate_series(1, len(tk) - 1),
                 i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))
             ELSE [] END) AS p FROM t),
      occ AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2,
                     CAST(COUNT(*) AS BIGINT) AS bcnt
              FROM bg GROUP BY doc_id, p.w1, p.w2),
      c12 AS (SELECT w1, w2, CAST(SUM(bcnt) AS BIGINT) AS c12
              FROM occ GROUP BY w1, w2),
      c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                    CAST(COUNT(*) AS BIGINT) AS n_after
             FROM c12 GROUP BY w1),
      nb AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_before
             FROM c12 GROUP BY w2),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c12),
      sc AS (SELECT o.doc_id, o.bcnt,
        GREATEST(4 * c.c12 - 3, 0) * t.n_types
          + 3 * a.n_after * n.n_before AS num,
        4 * a.c1 * t.n_types AS den
        FROM occ o JOIN c12 c USING (w1, w2) JOIN c1 a USING (w1)
        JOIN nb n USING (w2) CROSS JOIN tot t)
      SELECT doc_id,
        CAST(SUM(bcnt) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(SUM(CASE WHEN num * 64 < den THEN bcnt END), 0)
             AS BIGINT) AS n_low64,
        MIN(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) AS min_pkn
      FROM sc GROUP BY doc_id ORDER BY doc_id
    """)) { (spark, dir) =>
    // codegen arrays_zip pair build ([[TextOps.adjacentPairs]]) — the
    // transform(sequence(...)) HOF was interpreted per element
    val occ = docs(spark, dir)
      .select(col("doc_id"),
        explode(TextOps.adjacentPairs(TextOps.tokens(col("text")))).as("p"))
      .select(col("doc_id"), col("p.wa").as("w1"), col("p.wb").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("bcnt"))
      .localCheckpoint() // consumed twice: model build spine + scoring join
    val c12 = occ.groupBy(col("w1"), col("w2"))
      .agg(sum(col("bcnt")).as("c12"))
      .localCheckpoint() // consumed 4x: c1, nb, tot, scoring join
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n_after"))
    val nb = c12.groupBy(col("w2")).agg(count(lit(1)).as("n_before"))
    val tot = c12.agg(count(lit(1)).as("n_types"))
    val num = greatest(lit(4L) * col("c12") - 3L, lit(0L)) * col("n_types") +
      lit(3L) * col("n_after") * col("n_before")
    val den = lit(4L) * col("c1") * col("n_types")
    // Join shape kept deliberately (r19 A/B): folding the model onto c12
    // first (model = c12 ⋈ c1 ⋈ nb ⋈ tot, then ONE occ ⋈ model join)
    // measured SLOWER at sf0.1 — 0.69 s → 0.91 s unhinted (the planner
    // broadcast the checkpointed doc-grain occ side), 0.81 s with the model
    // side hinted. Here occ streams through three successive broadcast
    // probes with NO exchange at all, which beats paying the model-build
    // join chain up front; the occ side only re-shuffles if the model
    // frames outgrow broadcast, which at this catalog's scale they don't.
    occ.join(c12, Seq("w1", "w2")).join(c1, Seq("w1")).join(nb, Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("bcnt"), num.as("num"), den.as("den"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bcnt")).as("n_bigrams"),
        coalesce(sum(when(col("num") * 64L < col("den"), col("bcnt"))), lit(0L))
          .as("n_low64"),
        min(col("num").cast("double") / col("den").cast("double"))
          .as("min_pkn"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------------------
  // PMI collocations: adjacent token pairs that co-occur more than their
  // unigram frequencies predict (Church & Hanks 1990) — the multi-word-
  // expression miner a tokenizer/vocab pipeline runs before merging tokens.
  // PMI is kept as the EXACT probability ratio p(a,b)/(p(a)·p(b)) rather
  // than its log: the ranking is monotone-identical and the output stays
  // transcendental-free (this file's oracle-exactness discipline). All
  // counts are int64; the ratio is ONE fixed-order double expression,
  // bit-identical across engines.
  //
  // Scale shape: ONE corpus token pass feeds both count tables (bigram
  // counts group map-side-combinably; unigram counts and both grand totals
  // derive from the VOCAB-sized aggregates, never a second corpus pass);
  // the unigram side joins onto the bigram table as a vocab-sized
  // broadcast, totals as 1-row broadcasts; the top-k cut bounds the output.
  // The min-count dial (20 at the catalog SF) is the standard collocation
  // support floor — production tracks it with corpus size like the
  // rare-bigram threshold above.
  private val pmiBigrams = Q(
    "lm_pmi_bigrams",
    Some("""
      WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
      uni AS (SELECT unnest(tk) AS w FROM t),
      uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
      nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc),
      bg AS (SELECT unnest(CASE WHEN len(tk) >= 2 THEN
               list_transform(generate_series(1, len(tk) - 1),
                 i -> {'wa': tk[i], 'wb': tk[i + 1]})
             ELSE [] END) AS p FROM t),
      bc AS (SELECT (p).wa AS wa, (p).wb AS wb, CAST(COUNT(*) AS BIGINT) AS cab
             FROM bg GROUP BY 1, 2),
      nb AS (SELECT CAST(SUM(cab) AS BIGINT) AS n FROM bc)
      SELECT wa || ' ' || wb AS bigram, cab AS n_pair,
        (CAST(cab AS DOUBLE) * nt.n * nt.n) / (CAST(nb.n AS DOUBLE) * ua.c * ub.c)
          AS pmi_ratio
      FROM bc
      JOIN uc ua ON ua.w = bc.wa
      JOIN uc ub ON ub.w = bc.wb
      CROSS JOIN nt CROSS JOIN nb
      WHERE cab >= 20
      ORDER BY pmi_ratio DESC, bigram LIMIT 50
    """)) { (spark, dir) =>
    val tk = TextOps.tokens(col("text"))
    // the directed pair-count spine (TextLlm.pairCounts — codegen
    // arrays_zip pair build, shared with text_textrank_terms); vocab²-sized
    val bc = TextLlm.pairCounts(spark, dir)
      .select(col("wa"), col("wb"), col("cnt").as("cab"))
      .localCheckpoint() // consumed 2x: the nb total + the join spine
    val uc = docs(spark, dir).select(explode(tk).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // consumed 3x: nt total + both join sides
    val nt = uc.agg(sum(col("c")).as("nt"))
    val nb = bc.agg(sum(col("cab")).as("nb"))
    bc.join(broadcast(uc.select(col("w").as("wa"), col("c").as("ca"))), "wa")
      .join(broadcast(uc.select(col("w").as("wb"), col("c").as("cb"))), "wb")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
      .filter(col("cab") >= 20)
      .select(concat_ws(" ", col("wa"), col("wb")).as("bigram"),
        col("cab").as("n_pair"),
        ((col("cab").cast("double") * col("nt") * col("nt")) /
          (col("nb").cast("double") * col("ca") * col("cb"))).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("bigram")).limit(50)
  }

  override val specs: Seq[Q] =
    Seq(rareBigram, vocabEncode, bpeMerges, bpeEncode, knBigram, knDocScore,
      pmiBigrams)
}
