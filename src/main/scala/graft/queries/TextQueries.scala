package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup

/** Dedup + text-analysis coverage over the `documents` / `embeddings`
  * tables: exact dedup (in core), n-gram Jaccard, MinHash+LSH, SimHash,
  * cosine near-dup, quality scoring, language ID, fingerprinting.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Exact `documents` row count from parquet footers — one driver RPC,
    * no Spark job; feeds the dedup size-routing hints. */
  private def docCount(s: SparkSession, dir: String): Long =
    graft.sources.ParquetMeta.rowCount(s, s"$dir/documents.parquet")

  /** Stats-gated cache for a BOUNDED table derived from a corpus scan
    * (vocab tables, doc-keyed masks): persist + track only when the
    * SOURCE scan's optimizer-stats bytes exceed
    * `-Dgraft.derived.cacheBytes` (default 64 MB — the SmallBase
    * "cheap to recompute outright" regime); below it the uncached
    * plan shape is kept. Rationale (r14 verdict): each extra reader of
    * the uncached table re-scans the CORPUS, so the cache wins
    * whenever the corpus is big — but at gate scale the
    * materialization overhead measurably exceeded the saved scan
    * (unigram_logprob 0.36 → 0.76 s with an unconditional persist).
    * The decision reads plan stats (no job) and never changes rows —
    * persist affects only the physical execution. */
  private def cacheIfBigSource(src: DataFrame, derived: DataFrame): DataFrame = {
    val bound = java.lang.Long.getLong("graft.derived.cacheBytes", 64L << 20)
    if (src.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(bound))
      graft.operators.CacheRegistry.tracked(
        derived.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    else derived
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact 3-shingle Jaccard near-dup pairs (inverted-index join)
    "dedup_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardShinglePairs(docs(s, dir), "doc_id", "text",
        shingleSize = 3, minJaccard = 0.2)),

    // MinHash(16) + LSH(4 bands × 4 rows) candidate pairs
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshCandidates(docs(s, dir), "doc_id", "text",
        numHashes = 16, bands = 4, shingleSize = 3)),

    // 48-bit SimHash fingerprints
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashFingerprints(docs(s, dir), "doc_id", "text", bits = 48)),

    // embedding-cosine near-duplicate pairs
    "neardup_cosine" -> ((s, dir) =>
      Dedup.cosineNearDupPairs(emb(s, dir), "vec_id", "embedding", minCosine = 0.4)),

    // SRP-banded near-dup mining (the 100 TB path for the query above):
    // md5-derived hyperplanes → 16-bit signatures → 4 band keys →
    // collision pairs → exact cosine verify. The oracle recomputes the
    // ENTIRE pipeline (planes included) in SQL.
    "neardup_lsh_pairs" -> ((s, dir) =>
      graft.operators.SimilaritySearch.lshCosineCandidates(
        emb(s, dir), "vec_id", "embedding", minCosine = 0.4,
        numPlanes = 16, bands = 4)),

    // end-to-end dedup outcome: the surviving document set after dropping
    // the higher-id member of every near-dup pair (jaccard >= 0.5).
    // jaccardPairsAuto picks the physical pair miner by corpus size:
    // inverted-index join here, prefix-filtered AllPairs (no hot-shingle
    // quadratic postings) above 100k docs — row-identical either way.
    "dedup_survivors" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairsAuto(docs(s, dir), "doc_id", "text",
        shingleSize = 3, minJaccard = 0.5, sizeHint = Some(docCount(s, dir)))
      docs(s, dir).select(col("doc_id").cast("long").as("doc_id"))
        .join(pairs.select(col("doc_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
    }),

    // SemDeDup-style semantic pruning (arXiv:2303.09540): hash-seeded
    // cluster assignment, then drop every row with a lower-id in-cluster
    // neighbor at cosine >= 0.4. The oracle replays the full pipeline —
    // seed pick, argmin assignment, within-cluster cosine, drop rule.
    "semdedup_prune" -> ((s, dir) =>
      Dedup.semanticDedup(emb(s, dir), "vec_id", "embedding",
        nClusters = 16, minCosine = 0.4)),

    // per-document duplicated-span profile (the fixed-window form of
    // exact-substring dedup, arXiv:2107.06499): fraction of each doc's
    // positional 3-token windows that occur in >= 2 distinct documents
    "dup_span_docs" -> ((s, dir) =>
      Dedup.duplicatedSpanStats(docs(s, dir), "doc_id", "text",
        window = 3)),

    // span-level dedup REMOVAL (the action form of dup_span_docs):
    // each cross-document duplicated 3-token window survives only in
    // its minimal doc_id; covered tokens elsewhere are stripped and the
    // doc rebuilt. Oracle replays the full pipeline: positional window
    // index, df + canonical doc, coverage expansion, token filter.
    "dedup_span_removal" -> ((s, dir) =>
      Dedup.removeDuplicatedSpans(docs(s, dir), "doc_id", "text",
        window = 3)),

    // incremental (continuous-ingestion) dedup: history docs
    // (doc_id % 3 < 2) stand in for the persisted fingerprint store; the
    // remaining third is the new batch, graded exact-vs-store /
    // exact-within-batch / near(hamming<=3)-vs-store / near-within-batch
    // with first-wins precedence — the batch twin of dedup_stream that a
    // daily crawl drop runs against the archive's store, never its text.
    // Oracle replays fingerprints, band-free hamming (banding is
    // pigeonhole-complete, so a direct filter is equivalent), precedence.
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val store = Dedup.fingerprintStore(
        d.filter(col("doc_id") % 3 < 2), "doc_id", "text", bits = 48)
      Dedup.incrementalVerdicts(store, d.filter(col("doc_id") % 3 === 2),
        "doc_id", "text", bits = 48, maxHamming = 3, blocks = 4)
    }),

    // cluster assignment: connected components over the jaccard >= 0.5
    // pair graph via iterative min-label propagation (O(diameter)
    // rounds); oracle recomputes components with a recursive CTE
    "dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairsAuto(docs(s, dir), "doc_id", "text",
        shingleSize = 3, minJaccard = 0.5, sizeHint = Some(docCount(s, dir)))
      Dedup.nearDupComponents(
        docs(s, dir).select(col("doc_id")), "doc_id", pairs)
    }),

    // exact heavy-hitter tokens via one-pass Misra-Gries sketch (each
    // partition ships <= 32 counters, never the token domain) + exact
    // broadcast recount; the MG undercount bound makes the
    // "cnt*(capacity+1) > N" cut exact, so SQL replays it verbatim
    "heavy_ngrams" -> ((s, dir) =>
      graft.operators.HeavyHitters.heavyNgrams(
        docs(s, dir), "text", n = 1, capacity = 32)),

    // leakage-safe split: near-dup CLUSTERS (jaccard >= 0.5 components,
    // same pair graph as dedup_clusters) are split atomically by an md5
    // hash of the cluster rep — no dup pair straddles train/eval
    "split_leakage_safe" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairsAuto(docs(s, dir), "doc_id", "text",
        shingleSize = 3, minJaccard = 0.5, sizeHint = Some(docCount(s, dir)))
      Dedup.leakageSafeSplit(docs(s, dir), "doc_id", pairs)
    }),

    // END-TO-END training-corpus pipeline: quality floor → exact dedup
    // (keep min id per content hash) → near-dup drop (jaccard ≥ 0.5,
    // higher id loses) → deterministic hash sample. Every stage is an
    // operator from this library; the oracle recomputes the whole
    // composition in SQL. Output: the surviving training set.
    "corpus_pipeline" -> ((s, dir) => {
      // A/B'd and NOT cached (r15): tokenizing once into a bounded
      // (doc_id, n_tokens) keep-mask and re-attaching text per
      // consumer with a broadcast join measured wall-NEUTRAL at the
      // gate (2.03 → 2.17 s) while raising the execution shape from
      // 14 jobs / 23 Exchange nodes to 26 / 38 — the composition is
      // scheduler-bound at this scale, and the mask's cache fill +
      // per-subtree broadcast builds cost more stages than the saved
      // map-side re-tokenizations. At real scale the recompute shape
      // is also the safe one (a doc_id mask join would shuffle the
      // text-bearing corpus — guide §8's "second payload shuffle").
      val quality = docs(s, dir)
        .withColumn("toks", TF.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("ttr", TF.typeTokenRatio(col("toks")))
        .filter(col("n_tokens") >= 20 && col("ttr") >= 0.3)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("n_tokens"))
      val reps = quality
        .groupBy(md5(col("text").cast("binary")).as("th"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val deduped = quality.join(reps, "doc_id")
      // The hint is the PRE-filter corpus size — an upper bound on
      // |deduped|, which is all size routing needs (plan choice only,
      // never rows), and it comes free from the parquet footers.
      val nearPairs = Dedup.jaccardPairsAuto(deduped, "doc_id", "text",
        shingleSize = 3, minJaccard = 0.5, sizeHint = Some(docCount(s, dir)))
      val survivors = deduped
        .join(nearPairs.select(col("doc_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      survivors
        .withColumn("h",
          conv(substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long"))
        .filter(col("h") % 2 === 0)
        .select(col("doc_id"), col("n_tokens"))
    }),

    // The composed pipeline with the TRAINED classifier's keep decision
    // threaded through as a stage (model runs AFTER the rule filter —
    // the fastText-style order quality_classifier documents): train →
    // score → threshold → exact dedup → near-dedup → sample, one
    // chain, every stage replayed by the oracle. The weights come from
    // the same fingerprint-tagged artifact quality_classifier_trained
    // gates (trainAndPersist reuses it; that gate's retrain-equals-
    // artifact require is the integrity tooth for BOTH queries).
    //
    // The keep bar is SELF-CALIBRATED, not hand-set: keep docs whose
    // mean token weight clears the corpus mean — the integer-exact
    // analog of the keep-top-slice-by-classifier-score selection real
    // pipelines run (CCNet/GPT-3 keep by score quantile; an absolute
    // bar is vacuous here because the trained weights are
    // corpus-relative by construction). thr = max(0, Σ score_milli)
    // div (Σ n_tokens) over the FULL corpus: non-negative integer
    // operands, so Spark's truncating div and DuckDB's flooring //
    // agree bit-for-bit, and the max(0,·) clamp keeps a junk-dominated
    // corpus (negative total) at the standalone gate's sm >= 0 rule.
    "corpus_pipeline_clf" -> ((s, dir) => {
      import graft.operators.QualityClassifier
      val dim = QualityClassifier.DefaultDim
      val path = graft.queries.StorePaths.taggedPath(s, "/tmp/graft_clf", dir)
      val weights = QualityClassifier.trainAndPersist(docs(s, dir), path, dim)
      val scoredAll = docs(s, dir)
        .withColumn("toks", TF.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("score_milli",
          QualityClassifier.scoreMilli(col("toks"), weights))
      // A/B'd and NOT mask-cached (r15) — same measured negative as
      // corpus_pipeline: a bounded scored-stats cache + broadcast
      // re-attach read wall-neutral at the gate while inflating jobs
      // 19 → 29 and Exchange nodes 23 → 38; the one driver collect
      // below stays a 2-long threshold row.
      val tot = scoredAll
        .agg(sum(col("score_milli")).as("s"), sum(col("n_tokens")).as("n"))
        .collect()(0)
      val thr =
        if (tot.isNullAt(1) || tot.getLong(1) <= 0) 0L
        else math.max(0L, tot.getLong(0)) / tot.getLong(1)
      val quality = scoredAll
        .withColumn("ttr", TF.typeTokenRatio(col("toks")))
        .filter(col("n_tokens") >= 20 && col("ttr") >= 0.3)
        // the model keep decision: mean token weight >= the corpus mean
        .filter(col("score_milli") >= lit(thr) * col("n_tokens"))
        .select(col("doc_id").cast("long").as("doc_id"), col("text"),
          col("n_tokens"), col("score_milli"))
      val reps = quality
        .groupBy(md5(col("text").cast("binary")).as("th"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val deduped = quality.join(reps, "doc_id")
      val nearPairs = Dedup.jaccardPairsAuto(deduped, "doc_id", "text",
        shingleSize = 3, minJaccard = 0.5, sizeHint = Some(docCount(s, dir)))
      val survivors = deduped
        .join(nearPairs.select(col("doc_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      survivors
        .withColumn("h",
          conv(substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long"))
        .filter(col("h") % 2 === 0)
        .select(col("doc_id"), col("n_tokens"), col("score_milli"))
    }),

    // quality scoring: lexical diversity, stopword ratio, length
    "text_quality" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", TF.tokens(col("text")))
        .withColumn("ttr", TF.typeTokenRatio(col("toks")))
        .withColumn("stop_ratio", TF.tokenSetRatio(col("toks"), TF.StopwordsEn))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          col("ttr"),
          col("stop_ratio"),
          (col("ttr") * lit(0.4) + (lit(1.0) - col("stop_ratio")) * lit(0.3) +
            least(size(col("toks")) / lit(100.0), lit(1.0)) * lit(0.3)).as("quality_score"))),

    // model-based quality filtering: hashed-linear classifier inference
    // (the fastText-style stage pipelines run AFTER rule-based scoring
    // — text_quality / quality_gopher_* are the rules, this is the
    // model). Integer milli-weights derived from the feature index keep
    // the score an exact long sum, so the keep decision thresholds in
    // integer space and the DuckDB oracle replays every bit; the
    // broadcast-weights serving shape is documented on
    // TextFunctions.classifierScoreMilli.
    "quality_classifier" -> ((s, dir) => {
      val dim = 4096
      docs(s, dir)
        .withColumn("toks", TF.tokens(col("text")))
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("score_milli", TF.classifierScoreMilli(col("toks"), dim))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          col("n").as("n_tokens"),
          // RAW division, deliberately un-rounded: both engines compute
          // the identical IEEE double from identical integer operands,
          // while round() DIVERGES on exact-decimal halfway values
          // (Spark rounds the double's Double.toString decimal via
          // BigDecimal.valueOf + HALF_UP; DuckDB rounds the binary
          // value — measured on sf0.1 doc 4783, -1017/16000 =
          // -0.0635625 exactly: -0.063563 vs -0.063562)
          when(col("n") > 0, col("score_milli") / (col("n") * 1000.0))
            .otherwise(0.0).as("score"),
          when(col("score_milli") >= 0 && col("n") > 0, 1L).otherwise(0L)
            .as("keep"))
    }),

    // the REAL-model half of model-based quality filtering (the r12
    // verdict's task #2 — the one "documented, not gated" shape):
    // train integer milli-weights from Gopher-rule labels in one Spark
    // pass (operators/QualityClassifier — smoothed class-purity
    // surrogate, non-negative integer division so Spark div == DuckDB
    // //), persist them as a corpus-fingerprint-tagged parquet
    // artifact, and score through the broadcast-weights codegen kernel
    // (ClassifierMilliSumWeights — the serving shape the hash-derived
    // twin's scaladoc documents). The DuckDB oracle REPLAYS TRAINING
    // AND SERVING bit-for-bit; in-query teeth: a fresh retrain must
    // equal the persisted artifact (determinism + artifact integrity),
    // and the trained model must actually separate its training
    // labels (mean milli-score of pass docs > fail docs).
    "quality_classifier_trained" -> ((s, dir) => {
      import graft.operators.QualityClassifier
      val dim = QualityClassifier.DefaultDim
      val path = graft.queries.StorePaths.taggedPath(s, "/tmp/graft_clf", dir)
      val weights = QualityClassifier.trainAndPersist(docs(s, dir), path, dim)
      require(java.util.Arrays.equals(
          QualityClassifier.train(docs(s, dir), dim), weights),
        "quality_classifier_trained: fresh retrain must equal the " +
          "persisted artifact (training is a deterministic function of " +
          "the corpus; a mismatch means a stale or corrupt artifact)")
      val scored = docs(s, dir)
        .withColumn("toks", TF.tokens(col("text")))
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("score_milli",
          QualityClassifier.scoreMilli(col("toks"), weights))
        .withColumn("label", QualityClassifier.gopherPasses(col("text")))
      val sep = scored.filter(col("n") > 0)
        .groupBy("label")
        .agg(avg(col("score_milli") / col("n")).as("m"))
        .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
      require(sep.getOrElse(true, -1.0) > sep.getOrElse(false, 1.0),
        s"quality_classifier_trained: trained weights do not separate " +
          s"the training labels (pass mean ${sep.get(true)} vs fail " +
          s"mean ${sep.get(false)}) — training regression")
      scored.select(
        col("doc_id").cast("long").as("doc_id"),
        col("n").as("n_tokens"),
        // raw division, un-rounded: identical IEEE double from
        // identical integer operands (see quality_classifier's note)
        when(col("n") > 0, col("score_milli") / (col("n") * 1000.0))
          .otherwise(0.0).as("score"),
        when(col("score_milli") >= 0 && col("n") > 0, 1L).otherwise(0L)
          .as("keep"))
    }),

    // n-gram-marker language ID heuristic (scores + argmax prediction)
    "text_langid" -> ((s, dir) => {
      val base = docs(s, dir).withColumn("toks", TF.tokens(col("text")))
      val scored = TF.LangMarkers.foldLeft(base) { case (df, (lang, markers)) =>
        df.withColumn(s"s_$lang",
          size(filter(col("toks"), x => array_contains(array(markers.map(lit): _*), x)))
            .cast("long"))
      }
      val m = greatest(TF.LangMarkers.map { case (l, _) => col(s"s_$l") }: _*)
      // m === 0 guard: without it the 'und' seed is UNREACHABLE — the
      // max is always attained by some language, so a zero-evidence doc
      // would be labeled by first-wins order ('en') instead of unknown
      val predicted = when(m === 0, lit("und")).otherwise(
        TF.LangMarkers.foldRight(lit("und")) { case ((lang, _), acc) =>
          when(col(s"s_$lang") === m, lit(lang)).otherwise(acc)
        })
      // NOTE: foldRight builds first-match-wins in LangMarkers order
      scored.select(
        col("doc_id").cast("long").as("doc_id"),
        col("s_en"), col("s_es"), col("s_de"), col("s_fr"), col("s_zh"),
        predicted.as("predicted"),
        col("lang"),
        (predicted === col("lang")).cast("long").as("correct"))
    }),

    // token counting: whitespace tokens + BPE-style pre-tokenizer regex
    // ([a-z]+ | digit runs | single other chars) + chars-per-token ratio
    "token_count" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", TF.tokens(col("text")))
        .withColumn("re_toks", expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          size(col("toks")).cast("long").as("ws_tokens"),
          size(col("re_toks")).cast("long").as("bpe_tokens"),
          (length(col("text")) / size(col("re_toks")).cast("double")).as("chars_per_token"))),

    // REAL subword counting (the r13 verdict's task #7 — token_count's
    // regex pre-tokens approximate a budget; pipeline budgets are BPE
    // tokens): a tiny exact byte-pair-merge vocabulary trained in-repo
    // on the gate corpus (operators/BpeTokenizer — 16 most-frequent
    // adjacent-pair merges, lexicographic tie-breaks), persisted as a
    // fingerprint-tagged (rank, left, right) artifact, and scored by
    // one codegen pass (BpeTokenCount — the merge table rides the plan
    // like the classifier's weights). The DuckDB oracle REPLAYS
    // TRAINING (all 16 iterations as chained materialized CTEs: pair
    // count → lexicographic best → the identical left-to-right merge
    // fold as a list_reduce lambda) and scores by joining each word to
    // its trained final state. In-query teeth: retrain-equals-artifact
    // and the full merge count (the gate corpus never exhausts 16).
    "token_count_bpe" -> ((s, dir) => {
      import graft.operators.BpeTokenizer
      val path = graft.queries.StorePaths.taggedPath(s, "/tmp/graft_bpe", dir)
      val merges = BpeTokenizer.trainAndPersist(docs(s, dir), path)
      require(merges == BpeTokenizer.train(docs(s, dir)),
        "token_count_bpe: fresh retrain must equal the persisted " +
          "artifact (training is a deterministic function of the corpus)")
      require(merges.length == BpeTokenizer.DefaultMerges,
        s"token_count_bpe: expected ${BpeTokenizer.DefaultMerges} merges, " +
          s"got ${merges.length} — the gate corpus exhausted the pair " +
          "supply (corpus regression)")
      docs(s, dir)
        .withColumn("toks", TF.tokens(col("text")))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          size(col("toks")).cast("long").as("ws_tokens"),
          BpeTokenizer.tokenCount(col("text"), merges).as("bpe_tokens"))
    }),

    // winnowing fingerprints: char 8-gram rolling hashes, window-4 minima
    "doc_winnow" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      docs(s, dir).select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, t) => TF.winnowJvm(t, 8, 4).map((id, _)) }
        .toDF("doc_id", "fp")
    }),

    // repetition-based quality signals (the Gopher-rules family):
    // duplicate-token fraction and top-bigram concentration per doc.
    // Pure per-document computation → one typed map, zero shuffles
    // (the bigram-explode + two-level groupBy form costs two exchanges
    // for what is local arithmetic).
    "text_repetition" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      docs(s, dir).select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val toks = TF.tokenizeJvm(text)
          if (toks.length < 2) None
          else {
            val n = toks.length
            val dupFrac = 1.0 - toks.distinct.length / n.toDouble
            val counts = new java.util.HashMap[String, Long]()
            var top = 0L
            var i = 0
            while (i < n - 1) {
              val bg = toks(i) + " " + toks(i + 1)
              val c = counts.merge(bg, 1L, (a, b) => a + b)
              if (c > top) top = c
              i += 1
            }
            Some((id, n.toLong, dupFrac, top, (n - 1).toLong, top / (n - 1).toDouble))
          }
        }
        .toDF("doc_id", "n_tokens", "dup_token_frac", "top_bg_cnt", "n_bigrams", "top_bg_ratio")
    }),

    // wide→long UNPIVOT (stack) of per-returnflag aggregates
    "unpivot_lineitem" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"),
          round(sum(col("l_extendedprice")), 2).as("price"),
          round(sum(col("l_discount")), 2).as("disc"))
        .selectExpr("l_returnflag",
          "stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (metric, value)")),

    // source-mixture weights: per-source share and the uniform-target
    // resampling weight (the mixture-balancing primitive)
    "source_mixture" -> ((s, dir) => {
      val d = docs(s, dir)
      val bySrc = d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val totals = d.agg(count(lit(1)).as("total"),
        countDistinct(col("source")).as("n_sources"))
      bySrc.crossJoin(totals)
        .withColumn("share", col("n_docs") / col("total").cast("double"))
        .withColumn("uniform_weight",
          (lit(1.0) / col("n_sources").cast("double")) /
            (col("n_docs") / col("total").cast("double")))
        .select(col("source"), col("n_docs"), col("sum_chars"),
          col("share"), col("uniform_weight"))
    }),

    // temperature-flattened mixture resampling (the p_i ∝ n_i^α rule
    // used to rebalance training mixtures, α = 0.5): per-source keep
    // rate r_i = n_i^(α−1) / max_j n_j^(α−1) — the smallest source
    // keeps everything, big sources are downsampled toward the
    // flattened share. Membership is deterministic md5 keying (same
    // idiom as sample_hash_docs), so the kept set is engine-
    // reproducible, resumable, and independent of partitioning. The
    // rate table is #sources rows — broadcast by construction.
    "mixture_resample_temp" -> ((s, dir) => {
      val d = docs(s, dir)
      // 1/sqrt, NOT pow(x, -0.5): sqrt and divide are CORRECTLY ROUNDED
      // in IEEE-754 (identical in the JVM and DuckDB), while pow is
      // allowed 1-ulp slack per engine — and the unrounded rate feeds a
      // kept-set comparison, where a 1-ulp disagreement flips a doc's
      // membership and splits the oracle hash (the same cross-engine
      // libm rule bigram_logprob and tfidf_terms already follow)
      val bySrc = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("w", lit(1.0) / sqrt(col("n_docs").cast("double")))
      val maxW = bySrc.agg(max(col("w")).as("wmax"))
      val rates = bySrc.crossJoin(broadcast(maxW))
        .select(col("source"), col("n_docs"), (col("w") / col("wmax")).as("rate"))
      val u = conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0)
      val kept = d.join(broadcast(rates), "source")
        .filter(u < col("rate"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      // left join: a source whose whole sample hashes above its rate
      // must still report kept=0, not vanish from the mixture report
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          round(col("rate"), 6).as("rate"),
          coalesce(col("n_kept"), lit(0L)).as("kept"))
    }),

    // Gopher-style quality rule bundle (Rae et al. 2021 §A1.1, the
    // subset computable from the token stream): word-count window,
    // mean-word-length window, alphabetic-word fraction, minimum
    // stopword hits. All four statistics come from ONE native codegen
    // byte-scan per document (gopher_stats — the round-9 verdict's #1:
    // the interpreted-HOF composition this replaces was the last
    // shipped hot path outside WholeStageCodegen; value parity with the
    // HOF form is property-asserted in GopherStatsSpec, and the DuckDB
    // oracle below is character-identical to the round-9 one).
    "quality_gopher_rules" -> ((s, dir) => {
      import org.apache.spark.sql.graft.{GopherStatsUtil => G}
      val st = col("st")
      def slot(i: Int) = element_at(st, i + 1)
      val n = slot(G.NWords)
      val meanLen = when(n > 0,
        slot(G.SumWlen).cast("double") / n.cast("double")).otherwise(lit(0.0))
      val alphaFrac = when(n > 0,
        slot(G.NAlphaWords).cast("double") / n.cast("double")).otherwise(lit(0.0))
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          graft.functions.TextFunctions.gopherStats(col("text")).as("st"))
        .select(col("doc_id"),
          n.as("n_words"), meanLen.as("mean_wlen_raw"),
          alphaFrac.as("alpha_frac_raw"), slot(G.NStop).as("n_stop"))
        .select(col("doc_id"), col("n_words"),
          round(col("mean_wlen_raw"), 4).as("mean_wlen"),
          round(col("alpha_frac_raw"), 4).as("alpha_frac"), col("n_stop"),
          (col("n_words").between(50, 100000) &&
            col("mean_wlen_raw").between(3.0, 10.0) &&
            col("alpha_frac_raw") > 0.8 && col("n_stop") >= 2).as("passes"))
    }),

    // the FULL Gopher bundle from the same single kernel pass: adds the
    // symbol-to-word ratio ('#' + ellipsis per word), the
    // bullet-line-start fraction, and the ellipsis-line-end fraction
    // (Rae et al. §A1.1's remaining document-local rules), emitting
    // per-rule flags plus the combined verdict — a corpus-wide quality
    // filter stays one scan, one predicate, zero shuffles
    "quality_gopher_full" -> ((s, dir) => {
      import org.apache.spark.sql.graft.{GopherStatsUtil => G}
      val st = col("st")
      def slot(i: Int) = element_at(st, i + 1)
      val n = slot(G.NWords)
      def overWords(c: org.apache.spark.sql.Column) =
        when(n > 0, c.cast("double") / n.cast("double")).otherwise(lit(0.0))
      val meanLen = overWords(slot(G.SumWlen))
      val alphaFrac = overWords(slot(G.NAlphaWords))
      val symRatio = overWords(slot(G.NHash) + slot(G.NEllipsis))
      // n_lines ≥ 1 by construction (split of any string has ≥1 piece)
      val bulletFrac = slot(G.NBulletLines).cast("double") / slot(G.NLines).cast("double")
      val ellLineFrac = slot(G.NEllipsisLines).cast("double") / slot(G.NLines).cast("double")
      docs(s, dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          graft.functions.TextFunctions.gopherStats(col("text")).as("st"))
        .select(col("doc_id"), n.as("n_words"),
          meanLen.as("mean_wlen_raw"), alphaFrac.as("alpha_frac_raw"),
          slot(G.NStop).as("n_stop"), symRatio.as("sym_ratio_raw"),
          bulletFrac.as("bullet_frac_raw"), ellLineFrac.as("ell_line_frac_raw"))
        .select(col("doc_id"), col("n_words"),
          round(col("mean_wlen_raw"), 4).as("mean_wlen"),
          round(col("alpha_frac_raw"), 4).as("alpha_frac"), col("n_stop"),
          round(col("sym_ratio_raw"), 4).as("sym_ratio"),
          round(col("bullet_frac_raw"), 4).as("bullet_frac"),
          round(col("ell_line_frac_raw"), 4).as("ell_line_frac"),
          col("n_words").between(50, 100000).as("r_words"),
          col("mean_wlen_raw").between(3.0, 10.0).as("r_wlen"),
          (col("alpha_frac_raw") > 0.8).as("r_alpha"),
          (col("n_stop") >= 2).as("r_stop"),
          (col("sym_ratio_raw") <= 0.1).as("r_sym"),
          (col("bullet_frac_raw") <= 0.9).as("r_bullet"),
          (col("ell_line_frac_raw") <= 0.3).as("r_ell"),
          (col("n_words").between(50, 100000) &&
            col("mean_wlen_raw").between(3.0, 10.0) &&
            col("alpha_frac_raw") > 0.8 && col("n_stop") >= 2 &&
            col("sym_ratio_raw") <= 0.1 && col("bullet_frac_raw") <= 0.9 &&
            col("ell_line_frac_raw") <= 0.3).as("passes"))
    }),

    // exact interpolated length quantiles per source (corpus length
    // profile — the stats that drive truncation/packing choices).
    // Spark `percentile` and DuckDB `quantile_cont` share the linear-
    // interpolation definition, so the values are engine-exact; at
    // 100 TB swap in percentile_approx and a tolerance — the exact form
    // sorts each group, which is the right trade only while groups fit
    // a task (documented boundary, same policy as dup_span_stats).
    "len_quantiles_by_source" -> ((s, dir) =>
      docs(s, dir).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 4).as("p90"),
        round(expr("percentile(n_chars, 0.99)"), 4).as("p99"))),

    // canonicalization for dedup/training: lowercase, trim, collapse
    // runs of spaces, mask digit runs — emitted as a stable fingerprint
    "text_normalize" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("norm",
          regexp_replace(
            lower(trim(regexp_replace(col("text"), "[ ]+", " "))),
            "[0-9]+", "<num>"))
        .select(col("doc_id").cast("long").as("doc_id"),
          md5(col("norm").cast("binary")).as("norm_md5"),
          length(col("norm")).cast("long").as("norm_len"),
          (length(col("text")) - length(col("norm"))).cast("long").as("len_delta"))),

    // deterministic hash-based sampling: ~10% of docs chosen by a
    // content-independent md5 of the id — reproducible across engines
    // and runs (the pipeline-sampling primitive; rng-based sample()
    // is not cross-engine checkable)
    // sequence packing for pretraining batches: docs stream in id order
    // within their language shard and land in fixed-token-budget bins
    // (bin = tokens-before-this-doc ÷ budget — the deterministic
    // streaming-pack rule; shards pack independently, so the window
    // never spans partitions at scale)
    "pack_sequences" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 512
      val w = Window.partitionBy("lang").orderBy("doc_id")
      docs(s, dir)
        .withColumn("n_tokens", size(TF.tokens(col("text"))).cast("long"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          col("n_tokens"),
          ((col("cum") - col("n_tokens")) / budget).cast("long").as("bin"))
    }),

    // stratified train/val/test split: md5-keyed assignment (80/10/10)
    // summarized per (lang, split) — reproducible in any engine
    "corpus_splits" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("n_tokens", size(TF.tokens(col("text"))).cast("long"))
        .withColumn("h",
          conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 100)
        .withColumn("split",
          when(col("h") < 80, "train").when(col("h") < 90, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))),

    "sample_hash_docs" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("h",
          conv(substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long"))
        .filter(col("h") % 10 === 0)
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          length(col("text")).cast("long").as("len_chars"))),

    // document fingerprinting: full-content md5 + 60-bit compact fp
    "doc_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id").cast("long").as("doc_id"),
        md5(col("text").cast("binary")).as("md5_hex"),
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("fp60"))),

    // seeded deterministic training shuffle: md5-keyed global order,
    // sharded so each shard orders independently (the shard is the
    // parallel unit — no single-partition global window at scale; a
    // reader consumes shards in (shard, pos) order for a reproducible
    // epoch permutation).
    "corpus_shuffle" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      docs(s, dir)
        .withColumn("skey",
          conv(substring(md5(concat(lit("shuf:"), col("doc_id"))), 1, 15), 16, 10)
            .cast("long"))
        .withColumn("shard", pmod(col("skey"), lit(8)).cast("long"))
        .withColumn("pos",
          row_number().over(Window.partitionBy("shard").orderBy("skey", "doc_id"))
            .cast("long"))
        .select(col("doc_id").cast("long").as("doc_id"), col("shard"), col("pos"))
    }),

    // unigram LM quality scoring: per-doc mean token log-likelihood
    // under the corpus's own unigram distribution — the classic
    // LM-perplexity quality filter with the corpus as its own model.
    // Vocabulary size grows with the corpus, so the vocab join carries
    // no broadcast hint — AQE picks broadcast when it fits and falls
    // back to shuffle when it doesn't (a forced broadcast OOMs at scale).
    "unigram_logprob" -> ((s, dir) => {
      val toks = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        explode(TF.tokens(col("text"))).as("token"))
      // vocab is VOCABULARY-sized (bounded, unlike the corpus) and read
      // twice (probe join + total); the STATS-GATED persist stops the
      // total branch re-tokenizing the whole corpus for one scalar —
      // but only above the cacheIfBigSource bound, where the saved
      // corpus scan outweighs the materialization (below it the r14
      // unconditional persist measured 0.36 → 0.76 s at the gate)
      val vocab = cacheIfBigSource(docs(s, dir),
        toks.groupBy("token").agg(count(lit(1)).as("cnt")))
      // total token count folds from the vocab aggregate — one fewer
      // full explode scan than counting the token stream again
      val tot = vocab.agg(sum(col("cnt")).as("tot"))
      toks.join(vocab, "token").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          round(avg(log(col("cnt").cast("double") / col("tot").cast("double"))), 4)
            .as("logp_mean"))
    }),

    // interpolated bigram LM perplexity (the CCNet-style quality
    // filter): p(w2|w1) = 0.7·c(w1,w2)/c(w1) + 0.3·c(w2)/T, trained on
    // the corpus itself; per-doc mean bigram log-likelihood and the
    // resulting perplexity. Bigrams come straight off the token ARRAY
    // (transform over an index sequence) — no window, no per-token
    // shuffle to pair neighbors; the count joins are unhinted for the
    // same reason as the unigram entry (vocab grows with the corpus,
    // AQE decides broadcast vs shuffle). Interpolation weights are
    // written as literal doubles in BOTH engines — deriving 0.3 as
    // 1−0.7 yields 0.30000000000000004 and a cross-engine hash split.
    "bigram_logprob" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        TF.tokens(col("text")).as("toks"))
      val toks = t.select(col("doc_id"), explode(col("toks")).as("token"))
      // vocabulary-sized and read THREE times (w1 join, w2 join, total):
      // uncached, each reader re-tokenizes the whole corpus (5 full
      // Generate scans vs 3 cached) — stats-gated like the unigram
      // entry: persist only when the corpus scan is big enough that
      // the saved re-tokenizations beat the materialization cost
      val uni = cacheIfBigSource(docs(s, dir),
        toks.groupBy("token").agg(count(lit(1)).as("cnt1")))
      val tot = uni.agg(sum(col("cnt1")).as("tot"))
      // size >= 2 guard is load-bearing: sequence(2, 1) steps DOWN
      val bi = t.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(2), size(col("toks"))),
          i => struct(element_at(col("toks"), i - 1).as("w1"),
            element_at(col("toks"), i).as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val bcnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
      val scored = bi.join(bcnt, Seq("w1", "w2"))
        .join(uni.select(col("token").as("w1"), col("cnt1").as("c_w1")), "w1")
        .join(uni.select(col("token").as("w2"), col("cnt1").as("c_w2")), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("logp", log(
          lit(0.7) * col("cnt2").cast("double") / col("c_w1").cast("double") +
            lit(0.3) * col("c_w2").cast("double") / col("tot").cast("double")))
      scored.groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          round(avg(col("logp")), 4).as("logp_mean"),
          round(exp(-avg(col("logp"))), 2).as("ppl"))
    }),

    // benchmark decontamination: corpus docs sharing word 4-grams with
    // the held-out set (every 50th doc). Inverted-index join on the
    // n-gram key — the bench side reduces to its distinct n-gram set
    // (broadcast-sized) before the corpus ever joins.
    "contamination_check" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Contamination.ngramOverlap(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 4)
    }),

    // vocabulary build: corpus-wide token frequency + doc frequency,
    // top-100 by (tf desc, token). One map-side-combined groupBy and a
    // TakeOrdered — no full sort of the token table.
    "vocab_topk" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100)),

    // PII scrubbing: the corpus has no natural PII, so PII-shaped
    // strings (email / IPv4 / phone) are synthesized deterministically
    // FROM doc_id inside both engines — the oracle then genuinely
    // verifies the detection counts and the redacted-output bytes.
    "pii_scrub" -> ((s, dir) => {
      val raw = concat(
        col("text"),
        when(col("doc_id") % 3 =!= 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
            ((col("doc_id") * 7) % 256).cast("string")))
          .otherwise(lit("")),
        concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      docs(s, dir)
        .withColumn("raw", raw)
        .withColumn("scrubbed", TF.redactPii(col("raw")))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          size(regexp_extract_all(col("raw"), lit(TF.EmailRe), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(col("raw"), lit(TF.Ipv4Re), lit(0))).cast("long").as("n_ip"),
          size(regexp_extract_all(col("raw"), lit(TF.PhoneRe), lit(0))).cast("long").as("n_phone"),
          md5(col("scrubbed").cast("binary")).as("scrub_md5"),
          (length(col("raw")) - length(col("scrubbed"))).cast("long").as("len_delta"))
    }),

    // CCNet-style boilerplate removal: width-6 token segments repeated
    // across >= 3 docs are dropped; kept_md5 fingerprints the survivors
    // in position order.
    "boilerplate_lines" -> ((s, dir) =>
      graft.operators.Boilerplate.removeBoilerplate(
        docs(s, dir).select(col("doc_id").cast("long").as("doc_id"), col("text")),
        "doc_id", "text", width = 6, minDocs = 3)),

    // per-doc top-5 terms ranked by (tf desc, df asc, token) — raw
    // frequency first, rarity as the tiebreak. Every emitted column is
    // an integer or string, bit-identical across engines by
    // construction; the ln-based tf-idf score itself is NOT emitted
    // (a 1-ulp Java-vs-libm ln difference makes any rounded float score
    // engine-dependent at some boundary — consumers derive it as
    // tf * ln(n_docs/df) from the emitted integers, and n_docs rides
    // along so the row is self-contained). df folds from the cached tf
    // table (one row per (doc, token), so count(*) per token ==
    // distinct docs) — the token explode is computed exactly once.
    "tfidf_terms" -> ((s, dir) => {
      val d = docs(s, dir)
      val tok = d.select(col("doc_id").cast("long").as("doc_id"),
        explode(TF.tokens(col("text"))).as("token"))
      val tf = graft.operators.CacheRegistry.tracked(
        tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val tot = d.agg(count(lit(1)).as("n_docs"))
      // BOUNDED top-k aggregate instead of a row_number Window (r15,
      // guide §2.3/§2.4): the Window re-sorted the whole joined
      // (doc, token) relation inside each partition just to keep 5
      // rows per doc; TopTermsAgg reduces every partition to ≤5
      // entries per doc BEFORE the shuffle under the identical
      // (tf desc, df asc, token asc) order (UTF8String binary compare
      // = SortOrder's string order), so ranks are value-identical
      // (rank = array position + 1) and the full sort is gone from
      // the plan at any scale.
      // no broadcast hint on dfq: vocabulary grows with the corpus, so
      // AQE decides (forced broadcast of an unbounded table OOMs at scale)
      tf.join(dfq, "token")
        .groupBy("doc_id")
        .agg(graft.operators.TopKAggregate.topTerms(
          5, col("tf"), col("df"), col("token")).as("ts"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_docs"),
          posexplode(col("ts")).as(Seq("r0", "t")))
        .select(col("doc_id"), (col("r0") + 1).cast("long").as("rank"),
          col("t.token").as("token"), col("t.tf").as("tf"),
          col("t.df").as("df"), col("n_docs"))
    }),

    // RAG chunking: overlapping token windows (size 32, stride 24) per
    // doc. Pure per-row explode — no shuffle; chunk content is carried
    // as an md5 so the output stays narrow at any scale.
    "chunk_windows" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", TF.tokens(col("text")))
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id").cast("long").as("doc_id"),
          posexplode(transform(sequence(lit(1), size(col("toks")), lit(24)),
            st => slice(col("toks"), st, lit(32)))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
          size(col("col")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("col")).cast("binary")).as("chunk_md5")))
  )

  /** DuckDB 60-bit hash mirroring [[TF.hash60]]. */
  private def dh(seed: Int, s: String): String =
    s"CAST(('0x' || substr(md5('$seed:' || $s), 1, 15)) AS UBIGINT)::BIGINT"

  private val shingleCte =
    """t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
      |  FROM documents
      |), shl AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [] END) AS sh
      |  FROM t
      |)""".stripMargin

  /** Mirror of [[TF.hash28Jvm]] + the universal-hash minhash family. */
  private val h28 = "(CAST(('0x' || substr(md5(s), 1, 7)) AS UBIGINT)::BIGINT)"
  private val minhashList =
    (0 until 16).map(j =>
      s"list_min(list_transform(sh, s -> (${TF.minhashA(j)} * $h28 + ${TF.minhashB(j)}) % ${TF.MinhashP}))")
      .mkString("[", ",\n       ", "]")

  /** The `token_count_bpe` oracle, generated for `n` merges — one CTE
    * triple per training iteration (see the map entry's note; the fold
    * lambda is [[org.apache.spark.sql.graft.BpeUtil.applyMerge]]'s
    * exact rule over chr(31)-joined symbol strings). */
  private def bpeOracle(n: Int): String = {
    val sb = new StringBuilder(
      """WITH t AS MATERIALIZED (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), w0 AS MATERIALIZED (
        |  SELECT w, count(*) AS cnt,
        |    array_to_string(string_split_regex(w, ''), chr(31)) AS s
        |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
        |)""".stripMargin)
    (1 to n).foreach { i =>
      sb.append(
        s""", p$i AS (
           |  SELECT sy[j] AS l, sy[j+1] AS r, sum(cnt) AS c
           |  FROM (SELECT cnt, string_split(s, chr(31)) AS sy FROM w${i - 1}),
           |    unnest(range(1, len(sy))) AS u(j)
           |  GROUP BY 1, 2
           |), b$i AS MATERIALIZED (SELECT l, r FROM p$i ORDER BY c DESC, l, r LIMIT 1
           |), w$i AS MATERIALIZED (
           |  SELECT w, cnt, list_reduce(string_split(s, chr(31)),
           |    (acc, x) -> CASE WHEN x = b$i.r AND (acc = b$i.l OR ends_with(acc, chr(31) || b$i.l))
           |      THEN acc || b$i.r ELSE acc || chr(31) || x END) AS s
           |  FROM w${i - 1}, b$i
           |)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS ws_tokens,
         |  CAST(coalesce(sc.bpe, 0) AS BIGINT) AS bpe_tokens
         |FROM t LEFT JOIN (
         |  SELECT doc_id, sum(len(string_split(w$n.s, chr(31)))) AS bpe
         |  FROM (SELECT doc_id, unnest(toks) AS w FROM t) d JOIN w$n USING (w)
         |  GROUP BY doc_id) sc USING (doc_id)""".stripMargin)
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "unpivot_lineitem" ->
      """WITH a AS (
        |  SELECT l_returnflag, round(sum(l_quantity), 2) AS qty,
        |    round(sum(l_extendedprice), 2) AS price,
        |    round(sum(l_discount), 2) AS disc
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, 'qty' AS metric, qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'price', price FROM a
        |UNION ALL SELECT l_returnflag, 'disc', disc FROM a""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), b AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    1.0 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS dup_token_frac,
        |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
        |  FROM t WHERE len(toks) >= 2
        |), c AS (
        |  SELECT doc_id, n_tokens, dup_token_frac, bg, count(*) AS cnt
        |  FROM b GROUP BY 1, 2, 3, 4
        |)
        |SELECT doc_id, n_tokens, dup_token_frac,
        |  CAST(max(cnt) AS BIGINT) AS top_bg_cnt,
        |  CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |  CAST(max(cnt) AS BIGINT) / CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE) AS top_bg_ratio
        |FROM c GROUP BY 1, 2, 3""".stripMargin,

    "source_mixture" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY source
        |), t AS (
        |  SELECT count(*) AS total, count(DISTINCT source) AS n_sources FROM documents
        |)
        |SELECT source, n_docs, sum_chars,
        |  n_docs / CAST(total AS DOUBLE) AS share,
        |  (1.0 / CAST(n_sources AS DOUBLE)) / (n_docs / CAST(total AS DOUBLE)) AS uniform_weight
        |FROM s, t""".stripMargin,

    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(regexp_replace(text, '[ ]+', ' ', 'g'))),
        |                   '[0-9]+', '<num>', 'g') AS norm,
        |    text
        |  FROM documents
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  md5(norm) AS norm_md5,
        |  CAST(length(norm) AS BIGINT) AS norm_len,
        |  CAST(length(text) - length(norm) AS BIGINT) AS len_delta
        |FROM n""".stripMargin,

    "sample_hash_docs" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |  CAST(length(text) AS BIGINT) AS len_chars
        |FROM documents
        |WHERE CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0""".stripMargin,

    "quality_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, len(toks) AS n_words,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS mean_wlen_raw,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS alpha_frac_raw,
        |    len(list_filter(toks, x -> lower(x) IN
        |      ('the','of','and','to','in','a','is','that'))) AS n_stop
        |  FROM t
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  round(mean_wlen_raw, 4) AS mean_wlen,
        |  round(alpha_frac_raw, 4) AS alpha_frac,
        |  CAST(n_stop AS BIGINT) AS n_stop,
        |  (n_words BETWEEN 50 AND 100000 AND mean_wlen_raw BETWEEN 3.0 AND 10.0
        |    AND alpha_frac_raw > 0.8 AND n_stop >= 2) AS passes
        |FROM s""".stripMargin,

    // Full bundle: per-word statistics as above, plus symbol counts via
    // replace() deltas ('#' 1 byte, '...' and U+2026 3 UTF-8 bytes each
    // — strlen is the byte length, so the deltas are exact and the
    // '...' count shares replace()'s left-to-right non-overlap
    // semantics with the kernel) and line-shape counts over
    // string_split(text, chr(10)).
    "quality_gopher_full" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks,
        |    string_split(text, chr(10)) AS lns
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, len(toks) AS n_words,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS mean_wlen_raw,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS alpha_frac_raw,
        |    len(list_filter(toks, x -> lower(x) IN
        |      ('the','of','and','to','in','a','is','that'))) AS n_stop,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST((strlen(text) - strlen(replace(text, '#', '')))
        |        + (strlen(text) - strlen(replace(text, '...', ''))) / 3
        |        + (strlen(text) - strlen(replace(text, chr(8230), ''))) / 3 AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS sym_ratio_raw,
        |    CAST(len(list_filter(lns, x -> x LIKE '- %' OR x LIKE '* %'
        |        OR x LIKE chr(8226) || ' %')) AS DOUBLE)
        |      / CAST(len(lns) AS DOUBLE) AS bullet_frac_raw,
        |    CAST(len(list_filter(lns, x -> x LIKE '%...'
        |        OR x LIKE '%' || chr(8230))) AS DOUBLE)
        |      / CAST(len(lns) AS DOUBLE) AS ell_line_frac_raw
        |  FROM t
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  round(mean_wlen_raw, 4) AS mean_wlen,
        |  round(alpha_frac_raw, 4) AS alpha_frac,
        |  CAST(n_stop AS BIGINT) AS n_stop,
        |  round(sym_ratio_raw, 4) AS sym_ratio,
        |  round(bullet_frac_raw, 4) AS bullet_frac,
        |  round(ell_line_frac_raw, 4) AS ell_line_frac,
        |  (n_words BETWEEN 50 AND 100000) AS r_words,
        |  (mean_wlen_raw BETWEEN 3.0 AND 10.0) AS r_wlen,
        |  (alpha_frac_raw > 0.8) AS r_alpha,
        |  (n_stop >= 2) AS r_stop,
        |  (sym_ratio_raw <= 0.1) AS r_sym,
        |  (bullet_frac_raw <= 0.9) AS r_bullet,
        |  (ell_line_frac_raw <= 0.3) AS r_ell,
        |  (n_words BETWEEN 50 AND 100000 AND mean_wlen_raw BETWEEN 3.0 AND 10.0
        |    AND alpha_frac_raw > 0.8 AND n_stop >= 2
        |    AND sym_ratio_raw <= 0.1 AND bullet_frac_raw <= 0.9
        |    AND ell_line_frac_raw <= 0.3) AS passes
        |FROM s""".stripMargin,

    "len_quantiles_by_source" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
        |  round(quantile_cont(n_chars, 0.9), 4) AS p90,
        |  round(quantile_cont(n_chars, 0.99), 4) AS p99
        |FROM documents GROUP BY source""".stripMargin,

    "mixture_resample_temp" ->
      """WITH b AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs, 1.0 / sqrt(CAST(n_docs AS DOUBLE)) AS w FROM b),
        |m AS (SELECT max(w) AS wmax FROM w),
        |r AS (SELECT source, n_docs, w / wmax AS rate FROM w CROSS JOIN m),
        |kept AS (
        |  SELECT d.source, count(*) AS n_kept
        |  FROM documents d JOIN r USING (source)
        |  WHERE CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    / 4294967296.0 < rate
        |  GROUP BY 1)
        |SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs,
        |  round(rate, 6) AS rate,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS kept
        |FROM r LEFT JOIN kept USING (source)""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens) / 512.0) AS BIGINT) AS bin
        |FROM t""".stripMargin,

    "corpus_splits" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS h
        |  FROM documents
        |)
        |SELECT lang,
        |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM t GROUP BY 1, 2""".stripMargin,

    "dedup_jaccard_pairs" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(sh) AS sh FROM shl),
         |sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, inter, jac FROM (
         |  SELECT doc_a, doc_b, inter, inter / (x.n + y.n - inter) AS jac
         |  FROM p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
         |) WHERE jac >= 0.2""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $shingleCte,
         |sig AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    $minhashList AS mh
         |  FROM shl WHERE len(sh) > 0
         |),
         |banded AS (
         |  SELECT doc_id, mh, band,
         |    md5(array_to_string(mh[band*4+1 : band*4+4], ',')) AS band_key
         |  FROM sig, unnest([0, 1, 2, 3]) AS u(band)
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.mh AS mha, b.mh AS mhb
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b,
         |  CAST(list_sum(list_transform(list_zip(mha, mhb),
         |    p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS BIGINT) / 16.0 AS est_sim
         |FROM cand""".stripMargin,

    "dedup_simhash" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
         |  FROM documents
         |), h AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    list_transform(list_distinct(toks), tk -> ${dh(97, "tk")}) AS hs
         |  FROM t
         |)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(range(0, 48), b ->
         |    CASE WHEN CAST(list_sum(list_transform(hs, hv -> ((hv >> b) & 1) * 2 - 1)) AS BIGINT) > 0
         |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
         |FROM h WHERE len(hs) > 0""".stripMargin,

    "dedup_incremental" ->
      s"""WITH t AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         |         list_filter(string_split(text, ' '), x -> x != '') AS toks
         |  FROM documents
         |), h AS (
         |  SELECT doc_id, md5(text) AS text_hash,
         |         list_transform(list_distinct(toks), tk -> ${dh(97, "tk")}) AS hs
         |  FROM t
         |), fp AS (
         |  SELECT doc_id, text_hash,
         |    CASE WHEN len(hs) > 0 THEN
         |      CAST(list_sum(list_transform(range(0, 48), bi ->
         |        CASE WHEN CAST(list_sum(list_transform(hs, hv -> ((hv >> bi) & 1) * 2 - 1)) AS BIGINT) > 0
         |             THEN (CAST(1 AS BIGINT) << bi) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
         |    ELSE NULL END AS simhash
         |  FROM h
         |), store AS (SELECT * FROM fp WHERE doc_id % 3 < 2),
         |   batch AS (SELECT * FROM fp WHERE doc_id % 3 = 2),
         |es AS (SELECT b.doc_id, min(s.doc_id) AS v FROM batch b
         |       JOIN store s ON s.text_hash = b.text_hash GROUP BY b.doc_id),
         |eb AS (SELECT b.doc_id, min(b2.doc_id) AS v FROM batch b
         |       JOIN batch b2 ON b2.text_hash = b.text_hash AND b2.doc_id < b.doc_id
         |       GROUP BY b.doc_id),
         |ns AS (SELECT b.doc_id, min(s.doc_id) AS v FROM batch b
         |       JOIN store s ON b.simhash IS NOT NULL AND s.simhash IS NOT NULL
         |        AND bit_count(xor(b.simhash, s.simhash)) <= 3 GROUP BY b.doc_id),
         |nb AS (SELECT b.doc_id, min(b2.doc_id) AS v FROM batch b
         |       JOIN batch b2 ON b.simhash IS NOT NULL AND b2.simhash IS NOT NULL
         |        AND b2.doc_id < b.doc_id AND bit_count(xor(b.simhash, b2.simhash)) <= 3
         |       GROUP BY b.doc_id)
         |SELECT b.doc_id,
         |  CASE WHEN es.v IS NOT NULL THEN 'exact_store'
         |       WHEN eb.v IS NOT NULL THEN 'exact_batch'
         |       WHEN ns.v IS NOT NULL THEN 'near_store'
         |       WHEN nb.v IS NOT NULL THEN 'near_batch'
         |       ELSE 'unique' END AS verdict,
         |  COALESCE(es.v, eb.v, ns.v, nb.v) AS dup_of
         |FROM batch b
         |LEFT JOIN es ON es.doc_id = b.doc_id
         |LEFT JOIN eb ON eb.doc_id = b.doc_id
         |LEFT JOIN ns ON ns.doc_id = b.doc_id
         |LEFT JOIN nb ON nb.doc_id = b.doc_id""".stripMargin,

    "neardup_cosine" ->
      """SELECT id_a, id_b, cos FROM (
        |  SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |) WHERE cos >= 0.4""".stripMargin,

    "neardup_lsh_pairs" ->
      """WITH e AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings),
        |js AS (SELECT unnest(range(0, 16)) AS j),
        |sg AS (
        |  SELECT e.id,
        |    CAST(sum(CASE WHEN list_sum(list_transform(range(1, len(e.embedding)+1), d ->
        |      CAST(e.embedding[d] AS DOUBLE) *
        |      (CAST(CAST(('0x'||substr(md5('plane_'||CAST(js.j AS VARCHAR)||'_'||CAST(d-1 AS VARCHAR)),1,15)) AS UBIGINT) AS BIGINT)
        |       / 576460752303423488.0 - 1.0))) > 0
        |      THEN (CAST(1 AS BIGINT) << CAST(js.j AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
        |  FROM e, js GROUP BY e.id
        |),
        |bv AS (
        |  SELECT id, band, (sig >> (band * 4)) & 15 AS band_val
        |  FROM (SELECT id, sig, unnest([0,1,2,3]) AS band FROM sg)
        |),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bv a JOIN bv b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id
        |)
        |SELECT id_a, id_b, cos FROM (
        |  SELECT cand.id_a, cand.id_b,
        |    list_sum(list_transform(list_zip(ea.embedding, eb.embedding), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS cos
        |  FROM cand JOIN e ea ON cand.id_a = ea.id JOIN e eb ON cand.id_b = eb.id
        |) WHERE cos >= 0.4""".stripMargin,

    // Full replay of the SemDeDup pipeline: same seed pick + argmin
    // assignment as the cluster_assign oracle, same sequential-double
    // cosine as neardup_cosine, then the lower-id-wins drop rule.
    "semdedup_prune" ->
      """WITH b AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS vec FROM embeddings
        |), picked AS (
        |  SELECT id, vec FROM b
        |  ORDER BY CAST(('0x' || substr(md5('ivfseed:' || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT), id
        |  LIMIT 16
        |), seeds AS (
        |  SELECT row_number() OVER (ORDER BY id) - 1 AS cluster, vec AS cvec FROM picked
        |), a AS (
        |  SELECT id, cluster, row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
        |  FROM (
        |    SELECT b.id, s.cluster,
        |      list_sum(list_transform(list_zip(b.vec, s.cvec),
        |        p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
        |    FROM b CROSS JOIN seeds s
        |  )
        |), asg AS (
        |  SELECT id, cluster FROM a WHERE rn = 1
        |), v AS (
        |  SELECT b.id, b.vec, asg.cluster,
        |    sqrt(list_sum(list_transform(b.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM b JOIN asg ON b.id = asg.id
        |), drops AS (
        |  SELECT DISTINCT y.id FROM v x JOIN v y
        |  ON x.cluster = y.cluster AND x.id < y.id
        |  WHERE list_sum(list_transform(list_zip(x.vec, y.vec),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (x.nrm * y.nrm) >= 0.4
        |)
        |SELECT asg.id, CAST(asg.cluster AS BIGINT) AS cluster,
        |  CAST(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM asg LEFT JOIN drops d ON asg.id = d.id""".stripMargin,

    // Positional (non-distinct) windows of the shared 3-token shingle
    // tokenization; cross-doc document frequency over the per-doc
    // distinct index; dup mass joined back per document. Windows are
    // keyed by the md5-derived 60-bit hash — the operator shuffles
    // hashes, not window text (Dedup.duplicatedSpanStats), and the
    // oracle mirrors the same hash, so the gate is key-exact.
    "dup_span_docs" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks) - 1),
        |           i -> CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT))
        |    ELSE [] END) AS sh
        |  FROM t
        |), c AS (
        |  SELECT doc_id, sh, count(*) AS c FROM w GROUP BY 1, 2
        |), d AS (
        |  SELECT sh, count(*) AS ndocs FROM c GROUP BY 1
        |), per AS (
        |  SELECT c.doc_id, sum(c.c) AS n_windows,
        |    sum(CASE WHEN d.ndocs >= 2 THEN c.c ELSE 0 END) AS n_dup
        |  FROM c JOIN d ON c.sh = d.sh GROUP BY 1
        |)
        |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
        |  CAST(COALESCE(per.n_windows, 0) AS BIGINT) AS n_windows,
        |  CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup,
        |  round(CASE WHEN COALESCE(per.n_windows, 0) > 0
        |    THEN CAST(per.n_dup AS DOUBLE) / per.n_windows ELSE 0.0 END, 6) AS dup_frac
        |FROM t LEFT JOIN per ON t.doc_id = per.doc_id""".stripMargin,

    // full replay of removeDuplicatedSpans: positional window index →
    // per-hash (ndocs, min doc) → marked occurrences → covered-position
    // expansion → indexed token filter + rebuild (DuckDB list lambdas
    // are 1-indexed; Spark's are 0-indexed — hence the i-1 shifts)
    "dedup_span_removal" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), wi AS (
        |  SELECT doc_id, toks,
        |    unnest(CASE WHEN len(toks) >= 3 THEN range(1, len(toks) - 1) ELSE [] END) AS i
        |  FROM t
        |), w AS (
        |  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |    CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT) AS sh
        |  FROM wi
        |), s AS (
        |  SELECT sh, count(DISTINCT doc_id) AS ndocs, min(doc_id) AS keep_doc
        |  FROM w GROUP BY 1
        |), m AS (
        |  SELECT w.doc_id, w.pos FROM w JOIN s ON w.sh = s.sh
        |  WHERE s.ndocs >= 2 AND w.doc_id <> s.keep_doc
        |), cov AS (
        |  SELECT DISTINCT m.doc_id, m.pos + u.o AS tp
        |  FROM m, unnest([0, 1, 2]) AS u(o)
        |), d AS (
        |  SELECT doc_id, list_sort(list(tp)) AS drops FROM cov GROUP BY 1
        |)
        |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
        |  CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(len(d.drops), 0) AS BIGINT) AS n_removed,
        |  COALESCE(array_to_string(CASE WHEN d.drops IS NULL THEN t.toks
        |    ELSE list_filter(t.toks, (x, i) -> NOT list_contains(d.drops, i - 1)) END,
        |    ' '), '') AS new_text
        |FROM t LEFT JOIN d ON t.doc_id = d.doc_id""".stripMargin,

    "dedup_survivors" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(sh) AS sh FROM shl),
         |sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), dropped AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM (
         |    SELECT doc_a, doc_b, inter / (x.n + y.n - inter) AS jac
         |    FROM p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
         |  ) WHERE jac >= 0.5
         |)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
         |WHERE CAST(doc_id AS BIGINT) NOT IN (SELECT doc_id FROM dropped)""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
         |ex AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(sh) AS sh FROM shl),
         |sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pe AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT doc_a, doc_b, inter / (x.n + y.n - inter) AS jac
         |    FROM p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
         |  ) WHERE jac >= 0.5
         |), ed AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pe
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pe
         |), reach(a, b) AS (
         |  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN ed e ON e.src = r.b
         |)
         |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_rep
         |FROM reach GROUP BY a""".stripMargin,

    "heavy_ngrams" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS gram
        |  FROM documents
        |), tot AS (SELECT count(*) AS n FROM toks)
        |SELECT gram, CAST(count(*) AS BIGINT) AS cnt
        |FROM toks GROUP BY gram
        |HAVING count(*) * 33 > (SELECT n FROM tot)""".stripMargin,

    "split_leakage_safe" ->
      s"""WITH RECURSIVE $shingleCte,
         |ex AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(sh) AS sh FROM shl),
         |sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pe AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT doc_a, doc_b, inter / (x.n + y.n - inter) AS jac
         |    FROM p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
         |  ) WHERE jac >= 0.5
         |), ed AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pe
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pe
         |), reach(a, b) AS (
         |  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN ed e ON e.src = r.b
         |), comp AS (
         |  SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_rep
         |  FROM reach GROUP BY a
         |)
         |SELECT doc_id, cluster_rep,
         |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, cluster_rep,
         |    CAST(('0x' || substr(md5('split:' || CAST(cluster_rep AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS h
         |  FROM comp
         |)""".stripMargin,

    "corpus_pipeline" ->
      """WITH q1 AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), q2 AS (
        |  SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens, toks
        |  FROM q1
        |  WHERE len(toks) >= 20
        |    AND len(list_distinct(toks)) / CAST(nullif(len(toks), 0) AS DOUBLE) >= 0.3
        |), reps AS (
        |  SELECT min(doc_id) AS doc_id FROM q2 GROUP BY md5(text)
        |), dd AS (
        |  SELECT q2.* FROM q2 JOIN reps ON q2.doc_id = reps.doc_id
        |), shl AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      ELSE [] END) AS sh
        |  FROM dd
        |), ex AS (SELECT doc_id, unnest(sh) AS sh FROM shl),
        |sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), dropped AS (
        |  SELECT DISTINCT doc_b AS doc_id FROM (
        |    SELECT doc_a, doc_b, inter / (x.n + y.n - inter) AS jac
        |    FROM p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
        |  ) WHERE jac >= 0.5
        |)
        |SELECT doc_id, n_tokens FROM dd
        |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |  AND CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0""".stripMargin,

    // corpus_pipeline with the TRAINED classifier stage in the chain:
    // the quality_classifier_trained oracle's train+score CTEs (labels
    // from the Gopher rule over the FULL corpus, hashed features,
    // integer milli-weights, per-doc integer score) composed with
    // corpus_pipeline's dedup+sample CTEs — train → score → threshold
    // → dedup → sample replayed end-to-end in one statement.
    "corpus_pipeline_clf" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), lab AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) BETWEEN 50 AND 100000
        |      AND (CASE WHEN len(toks) > 0 THEN
        |            CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
        |              / CAST(len(toks) AS DOUBLE) ELSE 0.0 END) BETWEEN 3.0 AND 10.0
        |      AND (CASE WHEN len(toks) > 0 THEN
        |            CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |              / CAST(len(toks) AS DOUBLE) ELSE 0.0 END) > 0.8
        |      AND len(list_filter(toks, x -> lower(x) IN
        |            ('the','of','and','to','in','a','is','that'))) >= 2
        |    THEN 1 ELSE 0 END AS label
        |  FROM t
        |), tok AS (
        |  SELECT lab.doc_id, lab.label,
        |    CAST(CAST(('0x' || substr(md5('131:' || u.x), 1, 15)) AS UBIGINT) % 4096 AS BIGINT) AS idx
        |  FROM lab, unnest(lab.toks) AS u(x)
        |), w AS (
        |  SELECT idx,
        |    (2000 * sum(label)) // (count(*) + 1) - 1000 AS wm
        |  FROM tok GROUP BY idx
        |), sc AS (
        |  SELECT tok.doc_id, CAST(sum(w.wm) AS BIGINT) AS score_milli
        |  FROM tok JOIN w USING (idx) GROUP BY tok.doc_id
        |), q0 AS (
        |  SELECT t.doc_id, t.text, CAST(len(t.toks) AS BIGINT) AS n_tokens, t.toks,
        |    coalesce(sc.score_milli, 0) AS score_milli
        |  FROM t LEFT JOIN sc USING (doc_id)
        |), thr AS (
        |  SELECT CASE WHEN coalesce(sum(n_tokens), 0) <= 0 THEN 0
        |    ELSE greatest(0, sum(score_milli)) // sum(n_tokens) END AS v
        |  FROM q0
        |), q2 AS (
        |  SELECT q0.* FROM q0, thr
        |  WHERE n_tokens >= 20
        |    AND len(list_distinct(toks)) / CAST(nullif(len(toks), 0) AS DOUBLE) >= 0.3
        |    AND score_milli >= thr.v * n_tokens
        |), reps AS (
        |  SELECT min(doc_id) AS doc_id FROM q2 GROUP BY md5(text)
        |), dd AS (
        |  SELECT q2.* FROM q2 JOIN reps ON q2.doc_id = reps.doc_id
        |), shl AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      ELSE [] END) AS sh
        |  FROM dd
        |), ex AS (SELECT doc_id, unnest(sh) AS sh FROM shl),
        |sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), dropped AS (
        |  SELECT DISTINCT doc_b AS doc_id FROM (
        |    SELECT doc_a, doc_b, inter / (x.n + y.n - inter) AS jac
        |    FROM p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
        |  ) WHERE jac >= 0.5
        |)
        |SELECT doc_id, n_tokens, score_milli FROM dd
        |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |  AND CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0""".stripMargin,

    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), m AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    len(list_distinct(toks)) / CAST(nullif(len(toks), 0) AS DOUBLE) AS ttr,
        |    len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
        |      / CAST(nullif(len(toks), 0) AS DOUBLE) AS stop_ratio
        |  FROM t
        |)
        |SELECT doc_id, n_tokens, ttr, stop_ratio,
        |  ttr * 0.4 + (1.0 - stop_ratio) * 0.3 + least(n_tokens / 100.0, 1.0) * 0.3 AS quality_score
        |FROM m""".stripMargin,

    "quality_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), w AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(list_sum(list_transform(toks, x ->
        |      CAST(('0x' || substr(md5('137:' ||
        |        CAST(CAST(('0x' || substr(md5('131:' || x), 1, 15)) AS UBIGINT) % 4096 AS VARCHAR)
        |      ), 1, 15)) AS UBIGINT)::BIGINT % 2001 - 1000)), 0) AS BIGINT) AS score_milli
        |  FROM t
        |)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN n_tokens > 0 THEN score_milli / (n_tokens * 1000.0) ELSE 0.0 END AS score,
        |  CAST(CASE WHEN score_milli >= 0 AND n_tokens > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM w""".stripMargin,

    // Full replay of TRAINING + SERVING for the trained classifier:
    // labels = the Gopher passes rule (the quality_gopher_rules
    // oracle's own predicate), features = hash60 mod 4096, weights =
    // (2000·pos) // (tot+1) − 1000 (non-negative operands — DuckDB //
    // floors, Spark div truncates, equal here), score = per-doc sum of
    // the token weights. Bit-for-bit: every stage is integer except
    // the final division of identical integer operands.
    "quality_classifier_trained" ->
      """WITH t AS (
        |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), lab AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) BETWEEN 50 AND 100000
        |      AND (CASE WHEN len(toks) > 0 THEN
        |            CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
        |              / CAST(len(toks) AS DOUBLE) ELSE 0.0 END) BETWEEN 3.0 AND 10.0
        |      AND (CASE WHEN len(toks) > 0 THEN
        |            CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |              / CAST(len(toks) AS DOUBLE) ELSE 0.0 END) > 0.8
        |      AND len(list_filter(toks, x -> lower(x) IN
        |            ('the','of','and','to','in','a','is','that'))) >= 2
        |    THEN 1 ELSE 0 END AS label
        |  FROM t
        |), tok AS (
        |  SELECT lab.doc_id, lab.label,
        |    CAST(CAST(('0x' || substr(md5('131:' || u.x), 1, 15)) AS UBIGINT) % 4096 AS BIGINT) AS idx
        |  FROM lab, unnest(lab.toks) AS u(x)
        |), w AS (
        |  SELECT idx,
        |    (2000 * sum(label)) // (count(*) + 1) - 1000 AS wm
        |  FROM tok GROUP BY idx
        |), sc AS (
        |  SELECT tok.doc_id, CAST(sum(w.wm) AS BIGINT) AS score_milli
        |  FROM tok JOIN w USING (idx) GROUP BY tok.doc_id
        |)
        |SELECT CAST(lab.doc_id AS BIGINT) AS doc_id,
        |  CAST(len(lab.toks) AS BIGINT) AS n_tokens,
        |  CASE WHEN len(lab.toks) > 0
        |    THEN coalesce(sc.score_milli, 0) / (len(lab.toks) * 1000.0)
        |    ELSE 0.0 END AS score,
        |  CAST(CASE WHEN coalesce(sc.score_milli, 0) >= 0 AND len(lab.toks) > 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM lab LEFT JOIN sc USING (doc_id)""".stripMargin,

    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), sc AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |    CAST(len(list_filter(toks, x -> list_contains(['the','a','fast','slow','small'], x))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(toks, x -> list_contains(['el','la','de','los','datos'], x))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','daten'], x))) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(toks, x -> list_contains(['le','la','les','des','est'], x))) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(toks, x -> list_contains(['shuju','biao','hang','lie','suoyin'], x))) AS BIGINT) AS s_zh
        |  FROM t
        |)
        |SELECT doc_id, s_en, s_es, s_de, s_fr, s_zh,
        |  CASE WHEN m = 0 THEN 'und' WHEN s_en = m THEN 'en' WHEN s_es = m THEN 'es' WHEN s_de = m THEN 'de'
        |       WHEN s_fr = m THEN 'fr' WHEN s_zh = m THEN 'zh' ELSE 'und' END AS predicted,
        |  lang,
        |  CAST(CASE WHEN (CASE WHEN m = 0 THEN 'und' WHEN s_en = m THEN 'en' WHEN s_es = m THEN 'es' WHEN s_de = m THEN 'de'
        |       WHEN s_fr = m THEN 'fr' WHEN s_zh = m THEN 'zh' ELSE 'und' END) = lang
        |       THEN 1 ELSE 0 END AS BIGINT) AS correct
        |FROM (SELECT *, greatest(s_en, s_es, s_de, s_fr, s_zh) AS m FROM sc)""".stripMargin,

    "token_count" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks,
        |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS re_toks
        |  FROM documents
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(len(toks) AS BIGINT) AS ws_tokens,
        |  CAST(len(re_toks) AS BIGINT) AS bpe_tokens,
        |  length(text) / CAST(nullif(len(re_toks), 0) AS DOUBLE) AS chars_per_token
        |FROM t""".stripMargin,

    // Full replay of BPE TRAINING + SCORING: the merge loop unrolled as
    // chained CTE triples (pair counts over the current symbol states →
    // lexicographic best pair → the identical left-to-right merge fold
    // as a list_reduce lambda over chr(31)-joined symbols), then each
    // document's words joined to their trained final state. MATERIALIZED
    // is load-bearing: each stage is referenced twice (pair pass + apply
    // pass), so default CTE inlining would expand the 16-stage chain
    // into 2^16 scans of the corpus.
    "token_count_bpe" -> bpeOracle(graft.operators.BpeTokenizer.DefaultMerges),

    "doc_winnow" ->
      """WITH h AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    list_transform(range(1, length(text) - 8 + 2),
        |      i -> CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 7)) AS UBIGINT)::BIGINT) AS hs
        |  FROM documents WHERE length(text) >= 8
        |), w AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(hs) - 4 + 2),
        |      i -> list_min(hs[i : i + 3]))) AS fps
        |  FROM h WHERE len(hs) >= 4
        |)
        |SELECT doc_id, unnest(fps) AS fp FROM w""".stripMargin,

    "doc_fingerprint" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  md5(text) AS md5_hex,
        |  CAST(('0x' || substr(md5(text), 1, 15)) AS UBIGINT)::BIGINT AS fp60
        |FROM documents""".stripMargin,

    "corpus_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('shuf:' || doc_id), 1, 15)) AS UBIGINT)::BIGINT AS skey
        |  FROM documents
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(skey % 8 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS BIGINT) AS pos
        |FROM k""".stripMargin,

    "unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
        |  FROM documents
        |), v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM v)
        |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(avg(ln(CAST(v.cnt AS DOUBLE) / CAST(tot.tot AS DOUBLE))), 4) AS logp_mean
        |FROM tok t JOIN v USING (token) CROSS JOIN tot
        |GROUP BY 1""".stripMargin,

    "bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        |uni AS (SELECT token, count(*) AS cnt1 FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt1) AS BIGINT) AS tot FROM uni),
        |bi0 AS (
        |  SELECT doc_id, toks, unnest(range(2, len(toks) + 1)) AS i
        |  FROM t WHERE len(toks) >= 2
        |), bi AS (SELECT doc_id, toks[i - 1] AS w1, toks[i] AS w2 FROM bi0),
        |bc AS (SELECT w1, w2, count(*) AS cnt2 FROM bi GROUP BY 1, 2)
        |SELECT CAST(bi.doc_id AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(CAST(0.7 AS DOUBLE) * CAST(bc.cnt2 AS DOUBLE) / CAST(u1.cnt1 AS DOUBLE)
        |    + CAST(0.3 AS DOUBLE) * CAST(u2.cnt1 AS DOUBLE) / CAST(tot.tot AS DOUBLE))), 4)
        |    AS logp_mean,
        |  round(exp(-avg(ln(CAST(0.7 AS DOUBLE) * CAST(bc.cnt2 AS DOUBLE) / CAST(u1.cnt1 AS DOUBLE)
        |    + CAST(0.3 AS DOUBLE) * CAST(u2.cnt1 AS DOUBLE) / CAST(tot.tot AS DOUBLE)))), 2)
        |    AS ppl
        |FROM bi JOIN bc USING (w1, w2)
        |  JOIN uni u1 ON bi.w1 = u1.token
        |  JOIN uni u2 ON bi.w2 = u2.token
        |  CROSS JOIN tot
        |GROUP BY 1""".stripMargin,

    "contamination_check" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 4
        |    THEN list_transform(range(1, len(toks) - 2),
        |           i -> array_to_string(toks[i : i + 3], ' '))
        |    ELSE [] END)) AS ng
        |  FROM t
        |), bng AS (SELECT DISTINCT ng FROM g WHERE doc_id % 50 = 0)
        |SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS shared_ngrams
        |FROM g JOIN bng USING (ng)
        |WHERE g.doc_id % 50 <> 0
        |GROUP BY 1""".stripMargin,

    "vocab_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
        |  FROM documents
        |)
        |SELECT token, CAST(count(*) AS BIGINT) AS tf,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM tok GROUP BY 1
        |ORDER BY tf DESC, token LIMIT 100""".stripMargin,

    "pii_scrub" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    text
        |    || CASE WHEN doc_id % 3 <> 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id * 7 % 256 AS VARCHAR) ELSE '' END
        |    || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(regexp_replace(regexp_replace(raw,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<email>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<ip>', 'g'),
        |      '\b[0-9]{3}-[0-9]{4}\b', '<phone>', 'g') AS scrubbed
        |  FROM r
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(raw, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(raw, '\b[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phone,
        |  md5(scrubbed) AS scrub_md5,
        |  CAST(length(raw) - length(scrubbed) AS BIGINT) AS len_delta
        |FROM sc""".stripMargin,

    "boilerplate_lines" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), seg AS (
        |  SELECT doc_id, (st - 1) // 6 AS pos, array_to_string(toks[st : st + 5], ' ') AS seg
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 6)) AS st
        |        FROM t WHERE len(toks) >= 1)
        |), hot AS (
        |  SELECT seg FROM (SELECT seg, count(DISTINCT doc_id) AS nd FROM seg GROUP BY 1)
        |  WHERE nd >= 3
        |)
        |SELECT CAST(s.doc_id AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CASE WHEN h.seg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(coalesce(string_agg(CASE WHEN h.seg IS NULL THEN s.seg END, ' ' ORDER BY s.pos), '')) AS kept_md5
        |FROM seg s LEFT JOIN hot h ON s.seg = h.seg
        |GROUP BY 1""".stripMargin,

    "tfidf_terms" ->
      """WITH tok AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
        |), dfq AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT doc_id, "rank", token, tf, df, n_docs FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfq.df, tot.n_docs,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfq.df ASC, tf.token) AS BIGINT) AS "rank"
        |  FROM tf JOIN dfq USING (token) CROSS JOIN tot
        |) WHERE "rank" <= 5""".stripMargin,

    "chunk_windows" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 24)) AS st
        |  FROM t WHERE len(toks) >= 1
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST((st - 1) // 24 AS BIGINT) AS chunk_id,
        |  CAST(len(toks[st : st + 31]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks[st : st + 31], ' ')) AS chunk_md5
        |FROM c""".stripMargin
  )
}
