package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lake.Tables
import graft.ops.TextOps

/**
 * Training-corpus export operators — the last mile of an LLM data pipeline
 * after dedup/quality (graft.catalog.TextLlm) has picked the survivors:
 * benchmark decontamination, PII pseudonymization, overlapping chunking,
 * and deterministic shard assignment.
 *
 * Scale posture: every op here is map-only or shuffles once on its output
 * key. Decontamination broadcasts the eval-set shingles (eval suites are
 * ~1e5-1e6 n-grams — kilobytes-to-megabytes against a 100 TB corpus);
 * chunking is a Generate (explode) with no shuffle; shard assignment's only
 * wide stage is the per-shard ordering a sorted-shard-file export needs
 * anyway, parallel in the number of shards.
 */
object Corpus extends Family {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))

  /** Reuse-vs-recompute dial: localCheckpoint `df` only when the corpus it
    * derives from is big enough that re-running the derivation per consumer
    * costs more than materializing once. At sf0.1 the A/B is unambiguous
    * the OTHER way — checkpointing the kmv span frame measured SLOWER
    * (0.78 s → 0.88 s overlap, 0.33 s → 0.48 s kmv; the extra job +
    * write/read beats three cheap warm-cache recomputes) — while at 100 TB
    * the repeated corpus passes dominate. Same posture as the PageRank/Lpa
    * 500k dial; the threshold is the source scan's statistics, free. */
  private def checkpointAtScale(df: DataFrame, source: DataFrame): DataFrame =
    if (source.queryExecution.optimizedPlan.stats.sizeInBytes > (1L << 30))
      df.localCheckpoint()
    else df

  // ---------------------------------------------------------------------
  // Benchmark decontamination: docs with doc_id % 97 == 0 play the held-out
  // eval suite; report every training doc sharing at least one word-3-gram
  // with it. Overlap is matched on h32 SHINGLE HASHES via the codegen'd
  // TrigramHashes kernel (one expression per doc — interpreted shingle
  // string construction was the cost center), the same portable-md5 family
  // the MinHash path uses, so the oracle hashes identically. n=3 is the
  // test dial — production decontamination runs 8-13-gram windows.
  private val decontam = Q(
    "decontam_overlap",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
          THEN list_transform(generate_series(1, len(t)-2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
          ELSE [] END AS shs FROM tok),
      hs AS (SELECT doc_id, list_distinct(list_transform(shs,
          s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT))) AS hs FROM sh),
      ev AS (SELECT DISTINCT unnest(hs) AS h FROM hs WHERE doc_id % 97 = 0),
      tr AS (SELECT doc_id, len(hs) AS n_shingles, unnest(hs) AS h
             FROM hs WHERE doc_id % 97 <> 0)
      SELECT tr.doc_id, COUNT(*) AS n_overlap, min(tr.n_shingles) AS n_shingles,
        COUNT(*) / min(tr.n_shingles) AS overlap_frac
      FROM tr JOIN ev ON ev.h = tr.h
      GROUP BY tr.doc_id
      ORDER BY tr.doc_id
    """)) { (spark, dir) =>
    val sh = docs(spark, dir).select(col("doc_id"),
      array_distinct(graft.functions.trigram_hashes(col("text"))).as("hs"))
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("hs")).as("h")).distinct()
    val tr = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"),
        explode(col("hs")).as("h"))
    // Broadcast the eval side: the corpus never shuffles — overlap is a
    // map-side hash join + one agg on doc_id (partial-agg friendly: counts).
    tr.join(broadcast(ev), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"), min(col("n_shingles")).as("n_shingles"))
      .select(col("doc_id"), col("n_overlap"), col("n_shingles"),
        (col("n_overlap") / col("n_shingles")).as("overlap_frac"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // Bloom-prefiltered decontamination — same semantics (and the SAME
  // oracle) as `decontam_overlap`, different physical strategy, the one a
  // 100 TB corpus wants: build a Bloom filter over the eval-set shingle
  // hashes (a distributed aggregate whose merged state is ~1.2 MB at 1e6
  // shingles / 1% fpp — metadata-sized regardless of corpus size), ship it
  // to every executor, and drop non-matching corpus shingles MAP-SIDE
  // before any join. Only the ~1% false-positive survivors plus true
  // overlaps reach the exact-confirm hash join, so the join input shrinks
  // by the non-overlapping fraction of the corpus — the hand-rolled
  // analogue of Spark's InjectRuntimeFilter bloom pushdown, applied where
  // the optimizer can't see it (the filter crosses an explode). The final
  // exact join makes the bloom invisible in the RESULT: false positives
  // are re-checked, so output == `decontam_overlap` bit-for-bit.
  private val decontamBloom = Q(
    "decontam_bloom",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
          THEN list_transform(generate_series(1, len(t)-2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
          ELSE [] END AS shs FROM tok),
      hs AS (SELECT doc_id, list_distinct(list_transform(shs,
          s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT))) AS hs FROM sh),
      ev AS (SELECT DISTINCT unnest(hs) AS h FROM hs WHERE doc_id % 97 = 0),
      tr AS (SELECT doc_id, len(hs) AS n_shingles, unnest(hs) AS h
             FROM hs WHERE doc_id % 97 <> 0)
      SELECT tr.doc_id, COUNT(*) AS n_overlap, min(tr.n_shingles) AS n_shingles,
        COUNT(*) / min(tr.n_shingles) AS overlap_frac
      FROM tr JOIN ev ON ev.h = tr.h
      GROUP BY tr.doc_id
      ORDER BY tr.doc_id
    """)) { (spark, dir) =>
    val sh = docs(spark, dir).select(col("doc_id"),
      array_distinct(graft.functions.trigram_hashes(col("text"))).as("hs"))
    // eval-sized (suite n-grams — metadata next to the corpus at any
    // scale): localCheckpoint so the bloom-build action and the
    // exact-confirm join don't each re-pay the eval shingle pass
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("hs")).as("h")).distinct()
      .localCheckpoint()
    // Distributed bloom build: partial sketches merge up a tree; only the
    // final ~1.2 MB bitset reaches the driver, then broadcasts out once.
    val bloom = ev.stat.bloomFilter("h", 1000000L, 0.01)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomB.value.mightContainLong(h))
    val tr = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"),
        explode(col("hs")).as("h"))
      .filter(mightContain(col("h")))
    tr.join(broadcast(ev), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"), min(col("n_shingles")).as("n_shingles"))
      .select(col("doc_id"), col("n_overlap"), col("n_shingles"),
        (col("n_overlap") / col("n_shingles")).as("overlap_frac"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // PII pseudonymization over the customer dimension: stable surrogate for
  // the name (md5 — joinable across exports without exposing the value),
  // identifying digits masked out, and the account balance generalized to a
  // 1000-unit band (k-anonymity-style coarsening). Digit masking uses only
  // RE2-safe regex (no lookahead) so Spark's Java regex and the oracle's RE2
  // agree. Map-only; the ORDER BY is the only wide stage.
  private val piiMask = Q(
    "pii_mask_customers",
    Some("""
      SELECT c_custkey,
        md5(c_name) AS name_token,
        regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        c_mktsegment
      FROM customer ORDER BY c_custkey
    """)) { (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        md5(col("c_name")).as("name_token"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        floor(col("c_acctbal") / 1000).as("bal_band"),
        col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------------
  // Overlapping token-window chunking (window 40, stride 30): one Generate
  // per document, chunk starts 1, 31, 61, ... — no shuffle, the 100 TB
  // shape for context-window packing. Trailing sub-stride chunks are kept
  // (deterministic; a consumer drops them if unwanted).
  private val ChunkW = 40
  private val ChunkS = 30
  private val chunk = Q(
    "chunk_overlap",
    Some(s"""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      st AS (SELECT doc_id, t, unnest(generate_series(1, len(t), $ChunkS)) AS start
             FROM tok)
      SELECT doc_id, (start - 1) // $ChunkS AS chunk_id,
        array_to_string(list_slice(t, start, least(start + ${ChunkW - 1}, len(t))), ' ')
          AS chunk_text,
        len(list_slice(t, start, least(start + ${ChunkW - 1}, len(t)))) AS n_tokens
      FROM st ORDER BY doc_id, chunk_id
    """)) { (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(1), size(col("toks")), lit(ChunkS)))
          .as(Seq("k", "start")))
      .select(col("doc_id"), col("k").cast("long").as("chunk_id"),
        array_join(slice(col("toks"), col("start"), lit(ChunkW)), " ").as("chunk_text"),
        size(slice(col("toks"), col("start"), lit(ChunkW))).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // ---------------------------------------------------------------------
  // Deterministic global shuffle + shard assignment for a training export:
  // md5-keyed order (rerun-stable, uncorrelated with doc_id locality),
  // shard = h32(key) % 8, position = rank within the shard. The per-shard
  // window IS the sorted-shard-file write order; parallelism = shard count
  // (the export dial — a real run uses thousands of shards, each a
  // reducer-sized sorted file).
  private val NShards = 8
  private val shard = Q(
    "shard_assign",
    Some(s"""
      WITH k AS (SELECT doc_id,
          md5('s42:' || CAST(doc_id AS VARCHAR)) AS skey FROM documents),
      s AS (SELECT doc_id, skey,
          CAST(('0x' || substr(skey, 1, 8)) AS BIGINT) % $NShards AS shard FROM k)
      SELECT doc_id, shard,
        CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)
             AS INTEGER) AS pos
      FROM s ORDER BY shard, pos
    """)) { (spark, dir) =>
    val keyed = docs(spark, dir).select(col("doc_id"),
      md5(concat(lit("s42:"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("shard",
        conv(substring(col("skey"), 1, 8), 16, 10).cast("long") % NShards)
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  // ---------------------------------------------------------------------
  // The end-to-end training-mix report — the whole pre-training data
  // pipeline as ONE declarative plan: normalized-dedup survivors, minimum
  // token count, eval slice + contaminated docs removed, then per
  // (lang, source) document/token totals and each cell's share of the
  // final corpus. Catalyst sees every stage at once, so filters reach the
  // scan and the three membership checks are semi/anti joins against
  // broadcast-sized sides (dedup winners keyed by hash, eval shingles,
  // contaminated ids) — the corpus itself is scanned once and never
  // shuffled until the final (lang, source) aggregate. The grand total
  // joins back via a broadcast 1-row frame, not a global window.
  private val mix = Q(
    "corpus_mix",
    Some("""
      WITH d AS (SELECT doc_id, lang, source,
          len(string_split(text, ' ')) AS n_toks, text FROM documents),
      surv AS (SELECT min(doc_id) AS doc_id FROM documents
        GROUP BY md5(trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))),
      tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
          THEN list_transform(generate_series(1, len(t)-2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
          ELSE [] END AS shs FROM tok),
      hs AS (SELECT doc_id, list_distinct(list_transform(shs,
          s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT))) AS hs FROM sh),
      ev AS (SELECT DISTINCT unnest(hs) AS h FROM hs WHERE doc_id % 97 = 0),
      tr AS (SELECT doc_id, unnest(hs) AS h FROM hs WHERE doc_id % 97 <> 0),
      contaminated AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev ON ev.h = tr.h),
      base AS (SELECT d.* FROM d JOIN surv USING (doc_id)
        WHERE d.doc_id % 97 <> 0 AND d.n_toks >= 20
          AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
      g AS (SELECT lang, source, COUNT(*) AS n_docs,
          CAST(sum(n_toks) AS BIGINT) AS total_tokens
        FROM base GROUP BY lang, source)
      SELECT lang, source, n_docs, total_tokens,
        total_tokens / (SELECT CAST(sum(total_tokens) AS BIGINT) FROM g)
          AS token_share
      FROM g ORDER BY lang, source
    """)) { (spark, dir) =>
    val d = docs(spark, dir)
      .withColumn("n_toks", size(TextOps.tokens(col("text"))).cast("long"))
    val survivors = d
      .groupBy(md5(TextOps.normalize(col("text"))).as("nh"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // consumed 2x (eval shingles + training-side probe) — materialized once
    // past the corpus-size dial, recomputed below it (see checkpointAtScale)
    val sh = checkpointAtScale(d.select(col("doc_id"),
      array_distinct(graft.functions.trigram_hashes(col("text"))).as("hs")),
      d)
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("hs")).as("h")).distinct()
    val contaminated = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(ev), Seq("h"))
      .select("doc_id").distinct()
    val base = d
      .filter(col("doc_id") % 97 =!= 0)
      .filter(col("n_toks") >= 20)
      .join(survivors, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
    val grouped = base.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"))
    val grand = grouped.agg(sum(col("total_tokens")).as("grand"))
    grouped.crossJoin(broadcast(grand))
      .select(col("lang"), col("source"), col("n_docs"), col("total_tokens"),
        (col("total_tokens") / col("grand")).as("token_share"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------------
  // Temperature-based multilingual mixture weights (the XLM-R / mC4 α
  // resampling, Conneau et al. 2020): language l is sampled proportionally
  // to (token share)^α, flattening the head so low-resource languages are
  // upweighted. α = 1/2 keeps the whole readout oracle-exact: x^0.5 is
  // `sqrt`, the ONE transcendental-free power, and IEEE sqrt is correctly
  // rounded on both engines — so weight = sqrt(n_l) / Σ sqrt(n_k) with the
  // normalizer summed in FIXED lang order (the BM25 pivot discipline) is
  // bit-identical cross-engine with no tolerance. `boost` = weight /
  // natural share — the up/down-sampling factor the corpus sampler applies.
  //
  // Scale shape: one corpus-width (lang) aggregate with map-side partials,
  // then a 1-row pivoted normalizer broadcast back — nothing downstream of
  // the aggregate is data-sized. The 5-language pivot is pinned like the
  // search family's QueryTerms (the corpus's lang domain is fixed).
  private val tempMix = Q(
    "sample_temperature_mix",
    Some("""
      WITH g AS (SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang),
      p AS (SELECT
          MAX(CASE WHEN lang = 'de' THEN n_tokens END) AS t_de,
          MAX(CASE WHEN lang = 'en' THEN n_tokens END) AS t_en,
          MAX(CASE WHEN lang = 'es' THEN n_tokens END) AS t_es,
          MAX(CASE WHEN lang = 'fr' THEN n_tokens END) AS t_fr,
          MAX(CASE WHEN lang = 'zh' THEN n_tokens END) AS t_zh
        FROM g),
      z AS (SELECT
          CAST(t_de + t_en + t_es + t_fr + t_zh AS BIGINT) AS n_total,
          sqrt(t_de) + sqrt(t_en) + sqrt(t_es) + sqrt(t_fr) + sqrt(t_zh)
            AS zsum
        FROM p)
      SELECT lang, n_docs, n_tokens,
        CAST(n_tokens AS DOUBLE) / n_total AS natural_share,
        sqrt(n_tokens) / zsum AS temp_weight,
        (sqrt(n_tokens) / zsum) / (CAST(n_tokens AS DOUBLE) / n_total)
          AS boost
      FROM g, z ORDER BY lang
    """)) { (spark, dir) =>
    val langs = Seq("de", "en", "es", "fr", "zh")
    val g = docs(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"))
    val pivots = langs.map(l =>
      max(when(col("lang") === l, col("n_tokens"))).as(s"t_$l"))
    val p = g.agg(pivots.head, pivots.tail: _*)
    val z = p.select(
      langs.map(l => col(s"t_$l")).reduce(_ + _).cast("long").as("n_total"),
      langs.map(l => sqrt(col(s"t_$l"))).reduce(_ + _).as("zsum"))
    val natural = col("n_tokens").cast("double") / col("n_total")
    val weight = sqrt(col("n_tokens")) / col("zsum")
    g.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        natural.as("natural_share"), weight.as("temp_weight"),
        (weight / natural).as("boost"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------------
  // Cross-source duplication matrix: for every source pair, how many
  // distinct 8-token spans appear in BOTH — the "which sources copy from
  // which" governance table a corpus audit ships before choosing dedup
  // scope (within-source dedup misses everything this table shows). Spans
  // at the dedup_span_8gram grain, reduced to DISTINCT (source, span)
  // presence before the join, so the self-join is keyed on the span hash
  // and its fan-out is bounded by sources-per-span (≤ |sources|, a
  // catalog-sized constant) — never docs-per-span, never all-pairs. The
  // output is at most |sources|² rows however large the corpus.
  private val sourceSpanMatrix = Q(
    "dedup_source_span_matrix",
    Some("""
      WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t
                   FROM documents),
      sh AS (SELECT DISTINCT source, unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 7),
               i -> md5(array_to_string(t[i:i+7], ' '))))) AS sh
             FROM tok WHERE len(t) >= 8),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
              COUNT(*) AS n_shared_spans
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
            GROUP BY 1, 2)
      SELECT source_a, source_b, n_shared_spans
      FROM p ORDER BY source_a, source_b
    """)) { (spark, dir) =>
    // one-pass codegen span-hash kernel (see dedup_span_8gram) — the HOF
    // transform formulation is interpreted per span; <8-token docs yield
    // an empty array and drop at the explode. Both self-join legs consume
    // the frame — materialized once past the corpus-size dial.
    val raw = docs(spark, dir)
    val spans = checkpointAtScale(raw.select(col("source"),
      explode(graft.functions.span_hashes8(col("text"))).as("sh"))
      .distinct(), raw)
    spans.alias("a")
      .join(spans.alias("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // ---------------------------------------------------------------------
  // Source-balance Gini: how unevenly character mass spreads across the
  // corpus's sources — the one-number imbalance audit behind corpus_mix's
  // per-source shares (0 = perfectly even, →1 = one source dominates; the
  // signal that triggers temperature resampling). Exact integer rank
  // formulation G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending mass
  // (ties permute freely without changing the sum, so the rank window is
  // deterministic); ONE IEEE division. The rank window runs over the
  // SOURCE table — catalog-sized, never corpus rows.
  private val sourceGini = Q(
    "profile_source_gini",
    Some("""
      WITH s AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
                 FROM documents GROUP BY source),
      r AS (SELECT mass, row_number() OVER (ORDER BY mass, source) AS i
            FROM s),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(mass) AS BIGINT) AS tot,
              CAST(SUM(2 * i * mass) AS BIGINT) AS num2 FROM r)
      SELECT n AS n_sources, tot AS total_chars,
        CAST(num2 - (n + 1) * tot AS DOUBLE) / (n * tot) AS gini
      FROM t
    """)) { (spark, dir) =>
    val s = docs(spark, dir)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("mass"))
    // unpartitioned rank window over the source table — catalog-sized
    val r = s.withColumn("i", row_number()
      .over(Window.orderBy(col("mass"), col("source"))).cast("long"))
    r.agg(count(lit(1)).as("n"), sum(col("mass")).as("tot"),
        sum(lit(2L) * col("i") * col("mass")).as("num2"))
      .select(col("n").as("n_sources"), col("tot").as("total_chars"),
        ((col("num2") - (col("n") + 1) * col("tot")).cast("double") /
          (col("n") * col("tot"))).as("gini"))
  }

  // ---------------------------------------------------------------------
  // KMV (k-minimum-values) distinct-count sketch over the corpus's 8-token
  // span universe: D̂ = (k−1)·2⁶⁰ / h₍ₖ₎ from the k smallest 60-bit span
  // hashes — the workload-sizing estimate a pipeline runs BEFORE committing
  // to span dedup (dedup_span_8gram's shuffle is keyed on exactly this
  // universe). The k-minima come from a sort+limit — per-partition partial
  // top-k then a k-row merge (TakeOrderedAndProject), the mergeable-sketch
  // plan: no corpus-wide sort, and k rows is all that ever reaches the
  // driver side of the plan. Engine-portable because the k-th MINIMUM is
  // order-deterministic (hash ties at the boundary change neither max nor
  // count). The exact-distinct arm is the test-dial audit twin — at 100 TB
  // only the sketch arm runs. ONE IEEE division for the estimate (+ one
  // for the reported relative error).
  private val kmvSpans = Q(
    "agg_kmv_distinct_spans",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                   FROM documents),
      sh AS (SELECT DISTINCT unnest(list_transform(
               generate_series(1, len(t) - 7),
               i -> md5(array_to_string(t[i:i+7], ' ')))) AS sh
             FROM tok WHERE len(t) >= 8),
      h AS (SELECT CAST(('0x' || substr(sh, 1, 15)) AS BIGINT) AS hv FROM sh),
      k AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
      e AS (SELECT MAX(hv) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS k FROM k),
      x AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM h)
      SELECT k, kth_hash, exact_distinct,
        CAST(k - 1 AS DOUBLE) * 1152921504606846976 / kth_hash
          AS est_distinct,
        (CAST(k - 1 AS DOUBLE) * 1152921504606846976 / kth_hash)
          / exact_distinct AS est_ratio
      FROM e CROSS JOIN x
    """)) { (spark, dir) =>
    // one-pass codegen span-hash kernel (see dedup_span_8gram) — the HOF
    // transform formulation is interpreted per span
    val raw = docs(spark, dir)
    // consumed 2x (k-smallest cut + exact count) — materialized once past
    // the corpus-size dial, recomputed below it (see checkpointAtScale)
    val h = checkpointAtScale(raw.select(
        explode(graft.functions.span_hashes8(col("text"))).as("sh"))
      .distinct()
      .select(conv(substring(col("sh"), 1, 15), 16, 10).cast("long").as("hv")),
      raw)
    val e = h.orderBy(col("hv")).limit(256)
      .agg(max(col("hv")).as("kth_hash"), count(lit(1)).as("k"))
    val x = h.agg(count(lit(1)).as("exact_distinct"))
    val est = (col("k") - 1).cast("double") *
      lit(1152921504606846976L) / col("kth_hash")
    e.crossJoin(broadcast(x))
      .select(col("k"), col("kth_hash"), col("exact_distinct"),
        est.as("est_distinct"),
        (est / col("exact_distinct")).as("est_ratio"))
  }

  // ---------------------------------------------------------------------
  // Pairwise source-overlap estimation from per-source KMV sketches: each
  // source is reduced to its k=128 smallest span hashes ONCE, and every
  // source pair's Jaccard is then estimated purely from the two sketches
  // (k smallest of the union; the fraction present in both is ĵ — Beyer
  // et al. 2007). This is the 100 TB governance workflow the exact matrix
  // (dedup_source_span_matrix) can't scale to when sources×spans explodes:
  // the corpus is touched once to build catalog-sized sketches
  // (|sources|·k rows), and ALL pairwise estimates run on that tiny
  // frame. The exact-Jaccard column is the test-dial audit twin (estimate
  // vs truth correlates 0.85 at sf0.01); at scale only the sketch arm
  // runs. Deterministic md5 hashing keeps both engines' sketches — and
  // therefore estimates — bit-identical.
  //
  // Scale shape: one distinct (source, span) projection + a per-source
  // rank window (k-bounded output); the pair expansion and union-rank
  // window run on |sources|²·k rows — catalog-sized, corpus-independent.
  private val sourceOverlapKmv = Q(
    "dedup_source_overlap_kmv",
    Some("""
      WITH tok AS (SELECT source, string_split(text, ' ') AS t
                   FROM documents),
      sh0 AS (SELECT DISTINCT source, unnest(list_transform(
                generate_series(1, len(t) - 7),
                i -> md5(array_to_string(t[i:i+7], ' ')))) AS s8
              FROM tok WHERE len(t) >= 8),
      -- dedup on the FULL 128-bit hash FIRST, truncate to the 60-bit
      -- prefix after — mirroring the Spark arm, so a within-source prefix
      -- collision cannot diverge ns.n / sketch contents across engines
      sh AS (SELECT source,
               CAST(('0x' || substr(s8, 1, 15)) AS BIGINT) AS hv
             FROM sh0),
      ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh
             GROUP BY source),
      sk AS (SELECT source, hv FROM (
               SELECT source, hv,
                 row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
               FROM sh) WHERE rn <= 128),
      srcs AS (SELECT DISTINCT source FROM sk),
      p AS (SELECT a.source AS sa, b.source AS sb
            FROM srcs a JOIN srcs b ON a.source < b.source),
      pm AS (SELECT sa, sb, unnest([sa, sb]) AS source FROM p),
      pr AS (SELECT pm.sa, pm.sb, s.hv,
               MAX(CASE WHEN s.source = pm.sa THEN 1 ELSE 0 END) AS ina,
               MAX(CASE WHEN s.source = pm.sb THEN 1 ELSE 0 END) AS inb
             FROM pm JOIN sk s USING (source)
             GROUP BY pm.sa, pm.sb, s.hv),
      rk AS (SELECT *, row_number() OVER (PARTITION BY sa, sb
               ORDER BY hv) AS rn FROM pr),
      est AS (SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS k,
                CAST(SUM(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
              FROM rk WHERE rn <= 128 GROUP BY sa, sb),
      ex AS (SELECT a.source AS sa, b.source AS sb,
               CAST(COUNT(*) AS BIGINT) AS shared
             FROM sh a JOIN sh b ON a.hv = b.hv AND a.source < b.source
             GROUP BY 1, 2)
      SELECT est.sa AS source_a, est.sb AS source_b, est.k, est.c,
        CAST(est.c AS DOUBLE) / est.k AS jaccard_est,
        CAST(COALESCE(ex.shared, 0) AS DOUBLE)
          / (na.n + nb.n - COALESCE(ex.shared, 0)) AS jaccard_exact
      FROM est
      JOIN ns na ON na.source = est.sa
      JOIN ns nb ON nb.source = est.sb
      LEFT JOIN ex ON ex.sa = est.sa AND ex.sb = est.sb
      ORDER BY source_a, source_b
    """)) { (spark, dir) =>
    // one-pass codegen span-hash kernel (see dedup_span_8gram) — the HOF
    // transform formulation is interpreted per span
    val raw = docs(spark, dir)
    // consumed 4x (per-source counts, the sketch window, both sides of the
    // exact-arm self-join) — materialized once past the corpus-size dial,
    // recomputed below it (see checkpointAtScale)
    val sh = checkpointAtScale(raw
      .select(col("source"),
        explode(graft.functions.span_hashes8(col("text"))).as("s8"))
      .distinct()
      .select(col("source"),
        conv(substring(col("s8"), 1, 15), 16, 10).cast("long").as("hv")),
      raw)
    val ns = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val sk = sh
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hv"))))
      .filter(col("rn") <= 128).drop("rn")
    val srcs = sk.select(col("source")).distinct()
    val p = srcs.select(col("source").as("sa"))
      .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
    // equi-join shape: each pair contributes its two member sources
    val pm = p.select(col("sa"), col("sb"),
      explode(array(col("sa"), col("sb"))).as("source"))
    val pr = pm.join(sk, Seq("source"))
      .groupBy(col("sa"), col("sb"), col("hv"))
      .agg(max(when(col("source") === col("sa"), 1).otherwise(0)).as("ina"),
        max(when(col("source") === col("sb"), 1).otherwise(0)).as("inb"))
    val est = pr
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("sa"), col("sb")).orderBy(col("hv"))))
      .filter(col("rn") <= 128)
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L))
          .as("c"))
    val ex = sh.alias("a")
      .join(sh.alias("b"),
        col("a.hv") === col("b.hv") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("shared"))
    est
      .join(broadcast(ns.select(col("source").as("sa"), col("n").as("na"))),
        Seq("sa"))
      .join(broadcast(ns.select(col("source").as("sb"), col("n").as("nb"))),
        Seq("sb"))
      .join(ex, Seq("sa", "sb"), "left")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("k"), col("c"),
        (col("c").cast("double") / col("k")).as("jaccard_est"),
        (coalesce(col("shared"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("shared"), lit(0L))))
          .as("jaccard_exact"))
      .orderBy(col("source_a"), col("source_b"))
  }

  override val specs: Seq[Q] =
    Seq(decontam, decontamBloom, piiMask, chunk, shard, mix, tempMix,
      sourceSpanMatrix, sourceGini, kmvSpans, sourceOverlapKmv)
}
