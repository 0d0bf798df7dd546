package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting (whitespace + BPE-ish regex), quality scoring,
  * heuristic language ID, and document fingerprinting (rolling hash).
  *
  * All pure column expressions (codegen'd, no UDFs) — at 100 TB these
  * run as a single scan with no shuffle; every formula is expressible
  * in ANSI-ish SQL so each query carries a DuckDB oracle.
  *
  * Cross-engine portability rules: tokens = whitespace split of
  * trim()'d text with empty strings filtered (Spark and DuckDB treat
  * boundary empties differently); hashes go through md5-hex→int64
  * (identical in both engines) instead of engine hash functions.
  */
object TextOps {

  val HashMod = 1000000007L

  /** Chunking / packing parameters for the driver queries — shared
    * between the operators' defaults and the oracle SQL literals so
    * tuning one side cannot silently desync the gate. */
  val ChunkSize = 40
  val ChunkOverlap = 10
  val PackBudget = 512

  /** Whitespace tokens, empties filtered, lowercased. */
  def tokens(c: Column): Column =
    filter(split(trim(lower(c)), "\\s+"), x => x =!= "")

  /** Portable 60-bit string hash → [0, HashMod). */
  def strHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long") % HashMod

  /** BPE-ish token count: letter runs, digit runs, single symbols. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  private val stopEn = Seq("the", "and", "of", "to", "is")

  // ---------------------------------------------------------------- ops

  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      length(col(textCol)).cast("long").as("n_chars"),
      regexp_count(col(textCol), lit(BpePattern)).cast("long").as("n_bpe_tokens"),
      (aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        greatest(size(toks), lit(1)).cast("double")).as("mean_token_len"))
  }

  /** Per-document token-distribution Shannon entropy in EXACT integer
    * milli-bits — the information-theoretic quality scalar next to
    * [[CurationOps.repetitionStats]]' ratio signals: template/
    * keyword-stuffed docs have low entropy, natural prose sits near
    * log2(distinct). H = log2(N) − (Σ nᵢ·log2(nᵢ))/N computed entirely
    * with the unigram trainer's milli-log2 (floor-log2 from the bit
    * length + integer linear fractional octave,
    * [[graft.functions.UnigramKernel.log2Milli]]) — no libm log, no
    * float summation, so both engines emit identical integers.
    * `ent_mbits` = milli-bits per token, integer-divided (div ≡ //).
    *
    * Scale shape: one (doc, token) keyed count + one per-doc agg, both
    * map-side combinable; all arithmetic is per-doc bounded (n ≤ doc
    * length), corpus-size independent. Empty-token docs drop out of
    * the keyed count in both engines alike. */
  def tokenEntropy(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"),
        graft.functions.TextNative.entropy_stats(col(textCol)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"),
        element_at(col("s"), 1).as("n_tokens"),
        element_at(col("s"), 2).as("n_distinct"),
        element_at(col("s"), 3).as("ent_mbits"))

  /** The keyed-aggregation formulation the kernel replaced — kept as
    * the row-exhaustive parity reference (TextEntropySpec): one
    * (doc, token) count + one per-doc agg, milli-log2 via bit-length
    * Column arithmetic. Shuffles one row per TOKEN, which is why the
    * kernel exists. */
  private[graft] def tokenEntropyKeyed(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
    val withL = counts
      .withColumn("nb", (length(conv(col("n"), 10, 2)) - 1).cast("int"))
      .withColumn("l2m",
        lit(1000L) * col("nb") + expr("shiftright(n * 1000, nb)") - 1000L)
    withL.groupBy("doc_id").agg(
        sum("n").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("n") * col("l2m")).as("s_nl"))
      .withColumn("tb", (length(conv(col("n_tokens"), 10, 2)) - 1).cast("int"))
      .withColumn("l2m_tot",
        lit(1000L) * col("tb") + expr("shiftright(n_tokens * 1000, tb)") - 1000L)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        expr("(n_tokens * l2m_tot - s_nl) div n_tokens").as("ent_mbits"))
  }

  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val nChar = greatest(length(col(textCol)), lit(1)).cast("double")
    val stopCnt = size(filter(toks, x => x.isin(stopEn: _*))).cast("double")
    val punctCnt = regexp_count(col(textCol), lit("[.,!?;:]")).cast("double")
    val upperCnt = regexp_count(col(textCol), lit("[A-Z]")).cast("double")
    val meanWlen = aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") / nTok
    docs.select(
      col("doc_id"),
      (stopCnt / nTok).as("stopword_ratio"),
      (punctCnt / nChar).as("punct_ratio"),
      (upperCnt / nChar).as("upper_ratio"),
      round(
        (stopCnt / nTok) * 0.5 +
          least(meanWlen / 10.0, lit(1.0)) * 0.3 +
          (lit(1.0) - punctCnt / nChar) * 0.2, 6).as("quality_score"))
  }

  /** GOPHER-RULES document gate (Rae et al. 2021 §A1.1 — the standard
    * rule-based pre-filter every web-scale pretraining corpus runs
    * BEFORE model-based quality scoring): per-document structural
    * rules, rolled up per source as the drop-reason monitor table a
    * pipeline alerts on. The four rules kept are the ones this
    * corpus's schema can express, each re-derived in EXACT integer
    * arithmetic (cross-multiplied ratios — no float thresholds, so
    * the gate replays hash-identically):
    *   r_words — word count in [5, 100000];
    *   r_wlen  — mean word length in [3, 10] as
    *             3·n_tok ≤ Σ len(tok) ≤ 10·n_tok;
    *   r_stop  — ≥ 1 stopword (the Gopher "contains required words"
    *             fluency screen);
    *   r_punct — punctuation ≤ 10 % of characters as 10·n_punct ≤
    *             n_chars (the symbol-ratio screen).
    *
    * Shape at scale: ONE corpus scan of narrow column expressions into
    * a source-keyed agg with map-side partials — |sources| output
    * rows; the per-doc flags never shuffle. */
  /** Per-document Gopher rule flags (doc_id, source, r_*) — the
    * per-doc half of [[gopherGate]], shared with [[qualityEnsemble]]
    * so the rollup monitor and the ensemble keep/drop decision apply
    * the IDENTICAL rules. */
  private[graft] def gopherFlags(docs: DataFrame, textCol: String,
      extraCols: Seq[String] = Nil): DataFrame = {
    val toks = tokens(col(textCol))
    val ex = extraCols.map(col)
    docs.select(Seq(col("doc_id"), col("source")) ++ ex ++ Seq(
      size(toks).cast("long").as("n_tok"),
      aggregate(toks, lit(0L), (a, x) => a + length(x)).as("sum_wlen"),
      size(filter(toks, x => x.isin(stopEn: _*))).cast("long").as("n_stop"),
      regexp_count(col(textCol), lit("[.,!?;:]")).cast("long").as("n_punct"),
      length(col(textCol)).cast("long").as("n_chars")): _*)
      .select(Seq(col("doc_id"), col("source")) ++ ex ++ Seq(
        col("n_tok"),
        (col("n_tok") >= 5L && col("n_tok") <= 100000L).as("r_words"),
        (col("sum_wlen") >= col("n_tok") * 3L &&
          col("sum_wlen") <= col("n_tok") * 10L).as("r_wlen"),
        (col("n_stop") >= 1L).as("r_stop"),
        (col("n_punct") * 10L <= col("n_chars")).as("r_punct")): _*)
  }

  def gopherGate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val flags = gopherFlags(docs, textCol)
    flags.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("r_words") && col("r_wlen") && col("r_stop") &&
        col("r_punct"), 1L).otherwise(0L)).as("n_pass"),
      sum(when(!col("r_words"), 1L).otherwise(0L)).as("n_fail_words"),
      sum(when(!col("r_wlen"), 1L).otherwise(0L)).as("n_fail_wlen"),
      sum(when(!col("r_stop"), 1L).otherwise(0L)).as("n_fail_stop"),
      sum(when(!col("r_punct"), 1L).otherwise(0L)).as("n_fail_punct"))
  }

  /** Stopword lists for [[languageId]] — shared with the kernel-parity
    * spec and the oracle SQL literals. */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "y", "es", "una"))

  /** Stopword-vote language ID (n-gram-free heuristic; deterministic
    * argmax with fixed priority en > de > fr > es). One-pass native
    * kernel: the HOF formulation (`size(filter(tokens, isin))` per
    * language) re-ran the split/filter tokenizer ~8× per row — same
    * fix as [[languageIdNgram]]'s `trigram_scores`; HOF ≡ kernel is
    * pinned row-exhaustively in StopwordKernelSpec. */
  /** SELF-MEASURING language-ID audit — the lexical twin of the ANN
    * families' recall audits: the confusion matrix of [[languageId]]'s
    * prediction against the corpus's labeled `lang`, one row per
    * (true, predicted) pair with the per-true-language fraction in
    * exact ppm. The quantity a production pipeline watches before
    * trusting a language gate: per-language recall sits on the
    * diagonal, and any off-diagonal mass names exactly WHICH language
    * leaks into which.
    *
    * Shape at scale: the classifier is [[languageId]]'s one-pass
    * narrow kernel; the audit adds one (true, pred)-keyed agg
    * (map-side combine, ≤ L² rows out) and a bounded window over that
    * L²-row frame — nothing corpus-sized past the scan. */
  def langIdConfusion(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val g = languageId(docs, textCol)
      .groupBy(col("labeled_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val wT = org.apache.spark.sql.expressions.Window.partitionBy("labeled_lang")
    g.withColumn("n_true", sum("n").over(wT))
      .withColumn("frac_ppm", expr("(n * 1000000) div n_true"))
  }

  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val allScores = graft.functions.TextNative
      .stopword_scores(col(textCol), StopwordProfiles.map(_._2))
    val withScores = docs.withColumn("_sw", allScores)
    val scores = StopwordProfiles.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(col("_sw"), i + 1)
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    withScores.select(
      (Seq(col("doc_id"), col("lang").as("labeled_lang")) ++
        scores.map { case (l, s) => s.as(s"${l}_score") }) ++ Seq(
        when(en >= greatest(de, fr, es) && en > 0, "en")
          .when(de >= greatest(fr, es) && de > 0, "de")
          .when(fr >= es && fr > 0, "fr")
          .when(es > 0, "es")
          .otherwise("und").as("pred_lang")): _*)
  }

  /** Character-trigram profiles for n-gram language ID. Tiny curated
    * sets of high-frequency trigrams (with word-boundary spaces) per
    * language — the classic n-gram-profile method, shrunk to stay
    * literal/oracle-expressible. */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", "and", "nd ", " an", "ing", "ng ", " of", "of "),
    "de" -> Seq("er ", "en ", "der", " de", "ie ", "die", "und", "nd ", "ein", "ch "),
    "fr" -> Seq(" de", "de ", "es ", "le ", " le", "ent", "nt ", "la ", " la", "ion"),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", " el", "que", "ue ", " qu"))

  /** All distinct char trigrams of the lowercased text column. */
  /** N-gram-profile language ID: score(lang) = |trigrams(text) ∩
    * profile(lang)|, deterministic argmax en > de > fr > es. One-pass
    * native kernel (the HOF trigram array would be recomputed 9×). */
  def languageIdNgram(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val allScores = graft.functions.TextNative
      .trigram_scores(col(textCol), TrigramProfiles.map(_._2))
    val withScores = docs.withColumn("_tri", allScores)
    val scores = TrigramProfiles.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(col("_tri"), i + 1)
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    withScores.select(
      (col("doc_id") +: scores.map { case (l, s) => s.as(s"${l}_tri") }) ++ Seq(
        when(en >= greatest(de, fr, es) && en > 0, "en")
          .when(de >= greatest(fr, es) && de > 0, "de")
          .when(fr >= es && fr > 0, "fr")
          .when(es > 0, "es")
          .otherwise("und").as("pred_lang")): _*)
  }

  /** Order-sensitive rolling fingerprint over token hashes:
    * acc = (acc * 131 + h(tok)) mod p. */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val tokHashes = transform(toks, x =>
      conv(substring(md5(x), 1, 15), 16, 10).cast("long") % HashMod)
    docs.select(
      col("doc_id"),
      aggregate(tokHashes, lit(0L), (acc, h) => (acc * 131L + h) % HashMod)
        .as("fingerprint"))
  }

  /** Overlapping token-window chunks — the RAG/embedding preprocessing
    * step. step = chunkSize − overlap; chunk c starts at token
    * 1 + c·step, for starts ≤ max(1, n_tokens − overlap); each chunk
    * carries its re-joined text and exact token count (the tail chunk
    * may be short). Pure column ops + one explode — a narrow scan, no
    * shuffle, so it chunks 100 TB as fast as the scan reads it. */
  def chunkDocs(docs: DataFrame, textCol: String = "text",
      chunkSize: Int = ChunkSize, overlap: Int = ChunkOverlap): DataFrame = {
    require(chunkSize > overlap && overlap >= 0, s"need chunkSize > overlap >= 0")
    val step = (chunkSize - overlap).toLong
    val toks = tokens(col(textCol))
    docs.select(col("doc_id"), toks.as("_toks"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(1L),
          greatest(size(col("_toks")).cast("long") - overlap, lit(1L)), lit(step)),
        s => slice(col("_toks"), s.cast("int"), lit(chunkSize)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_chunk_tokens"))
      .filter(col("n_chunk_tokens") > 0)
  }

  /** Sequential sequence packing: documents fill `budget`-token bins in
    * doc_id order WITHIN each partition column value — a doc belongs to
    * the bin its first token lands in (bins may overflow by one doc,
    * the streaming-packer contract). The running sum is a window per
    * partition value, never global: packing scales with the number of
    * partitions (lang/source/shard), which is how a 100 TB corpus packs
    * in practice. */
  def packDocs(docs: DataFrame, textCol: String = "text",
      budget: Int = PackBudget, partitionCol: String = "lang"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy("doc_id") // partitionCol renamed below
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.select(col(partitionCol).as("part"), col("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")) / budget.toLong).cast("long"))
      .groupBy("part", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Top-k most distinctive terms per document by TF-IDF. Two keyed
    * aggregations (term frequency per doc, document frequency per
    * term, both with map-side partial combine), one equi-join on the
    * term, and a per-doc window for the top-k — every shuffle is keyed
    * and partial-aggregated, nothing global. The corpus size is one
    * count action up front (parquet answers count(*) from row-group
    * metadata, no data scan) — a join on a constant key constant-folds
    * into a nested-loop join, which the plan audit rightly rejects.
    *
    * The score uses the raw rarity ratio N/df instead of log(N/df):
    * log is monotone, so per-doc TOP-K BY tf*N/df ≡ top-k by
    * tf*log(N/df+eps) ranking-wise, and the ratio stays in exact
    * integer math (`score_ppm = tf * N * 1e6 div df`) — bit-exact
    * across engines where libm log rounding is not. */
  def tfidfTopTerms(docs: DataFrame, textCol: String = "text",
      k: Int = 3, minTokenLen: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) >= minTokenLen)
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_ppm").desc, col("tok").asc)
    tf.join(df, "tok")
      .withColumn("score_ppm", expr(s"(tf * ${nDocs}L * 1000000) div df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("doc_id", "tok", "tf", "df", "score_ppm", "rk")
  }

  /** Top-k collocations: adjacent-token bigrams ranked by PMI — the
    * phrase-mining primitive (finding "new york"-style units before
    * tokenizer training). PMI = log(p(ab) / (p(a)p(b))); log is
    * monotone, so ranking by the integer ratio
    * `c_ab * N * 1e6 div (c_a * c_b)` is rank-equivalent and bit-exact
    * across engines (same discipline as [[tfidfTopTerms]]).
    *
    * Shape at scale: one narrow scan explodes unigrams and bigrams
    * (both keyed hash-aggs with map-side partial combine), two
    * vocabulary-keyed equi-joins attach the unigram counts, and the
    * global top-k runs as TakeOrderedAndProject (per-partition top-k,
    * never a full sort). N is one count action up front — a join on a
    * constant key would constant-fold into a nested-loop join. The
    * `minPairCount` gate prunes the pair table before either join. */
  def pmiBigrams(docs: DataFrame, textCol: String = "text",
      minPairCount: Int = 5, topK: Int = 50): DataFrame = {
    val tok = docs.select(tokens(col(textCol)).as("toks"))
    val uni = tok.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val nTok = tok.agg(sum(size(col("toks")))).first().getLong(0)
    val n1 = greatest(size(col("toks")) - 1, lit(0))
    tok.select(explode(zip_with(
        slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPairCount)
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
      .withColumn("score_ppm", expr(s"(c_ab * ${nTok}L * 1000000) div (c_a * c_b)"))
      .orderBy(col("score_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select("w1", "w2", "c_ab", "c_a", "c_b", "score_ppm")
  }

  /** Bigram-LM "surprise" quality score — the CCNet-style perplexity
    * filter shape: train a stupid-backoff bigram model on the corpus
    * (two keyed count aggregations with map-side partial combine,
    * bigram table pruned to `c_ab >= minCount`), then score every
    * document by the mean inverse conditional probability of its
    * bigrams. Low score = fluent/common text, high = rare or garbled —
    * the signal CCNet thresholds to drop low-quality web text.
    *
    * Exact integer math in ppm (same discipline as [[tfidfTopTerms]]):
    * in-model surprise = `c(w1) * 1e6 div c(w1,w2)` (≈ 1/p(w2|w1));
    * a pruned bigram backs off to the unigram with a 10× stupid-backoff
    * penalty, `N * 1e7 div c(w2)` (≈ 1/(0.1·p(w2))). True perplexity
    * exponentiates a mean log — the arithmetic mean of inverse
    * probabilities is the rank-compatible integer sibling, bit-exact
    * across engines where libm log/exp rounding is not.
    *
    * Shape at scale: the model tables are vocabulary-sized (pruned by
    * `minCount`), every join is a keyed equi-join on the token, and the
    * per-doc aggregation partial-combines map-side. N is one count
    * action up front — joining a constant-folded single row would plan
    * as a nested loop, which the suite-wide plan audit rejects. */
  /** Per-language tokenizer FERTILITY / compression audit — the
    * tokenizer-health table every multilingual pipeline tracks (high
    * fertility = the vocab under-serves that language, its documents
    * cost proportionally more training tokens per word; SentencePiece
    * and production LLM data reports both monitor exactly this ratio).
    * fertility_ppm = BPE tokens per whitespace word,
    * bytes_per_tok_ppm = UTF-8 bytes per BPE token — both exact
    * integer ppm ratios of exact BIGINT sums (the house stance).
    *
    * Shape at scale: ONE corpus scan — the per-doc word count, the
    * native one-pass [[graft.functions.TextNative.bpe_encode]] kernel
    * (train-then-apply: the merge table is a committed artifact), and
    * the byte length are all narrow projections — feeding one
    * lang-keyed agg with map-side partials; the output is
    * |languages| rows. */
  def bpeFertility(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("lang"),
        size(tokens(col(textCol))).cast("long").as("w"),
        size(graft.functions.TextNative.bpe_encode(col(textCol)))
          .cast("long").as("b"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
        sum("b").as("n_bpe"), sum("y").as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe"),
        col("n_bytes"),
        expr("(n_bpe * 1000000) div greatest(n_words, 1)").as("fertility_ppm"),
        expr("(n_bytes * 1000000) div greatest(n_bpe, 1)").as("bytes_per_tok_ppm"))

  def lmSurprise(docs: DataFrame, textCol: String = "text",
      minCount: Int = 2): DataFrame = {
    val tk = docs.select(col("doc_id"), tokens(col(textCol)).as("toks"))
    val n1 = greatest(size(col("toks")) - 1, lit(0))
    val bg = tk.select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = tk.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val nTok = tk.agg(sum(size(col("toks")))).first().getLong(0)
    val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val scored = bg
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
      .withColumn("surprise_ppm",
        when(col("c_ab").isNotNull, expr("(c_a * 1000000) div c_ab"))
          .otherwise(expr(s"(${nTok}L * 10000000) div c_b")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(surprise_ppm) div count(1)").as("avg_surprise_ppm"))
    // single-token / empty docs carry no bigrams: keep them with a
    // null score so the filter stage decides their fate explicitly
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_surprise_ppm"))
  }

  // ------------------------------------------- Kneser-Ney LM filter

  /** Reference-split floor modulus and size target for [[knTrain]]:
    * docs with `doc_id % max(KnRefMod, N div KnRefTarget) == 0` are
    * the held-out high-quality reference the quality LM trains on —
    * CCNet-style perplexity filtering trains its KenLM on a FIXED
    * reference corpus (Wikipedia), never on the crawl being scored,
    * so (a) good-but-unusual documents aren't rewarded merely for
    * resembling the crawl's own noise, and (b) the reference — and
    * with it the model artifact and the training cost — stays
    * CONSTANT-SIZE at any corpus scale (the count-driven-modulus
    * discipline of `servingQueryPred`/`nearDupRecall`). At the sf0.01
    * gate N = 500 ⇒ N div 125 = 4 = the floor, so the modulus is
    * exactly 4 and committed hashes are unaffected. */
  val KnRefMod = 4
  val KnRefTarget = 125

  /** Exact milli-log2 of 1,000,000 under the house bit-length formula
    * (≡ [[sparkL2M]]/[[sqlL2M]] at x = 10⁶) — the zero point that
    * turns a ppm probability into milli-bits of surprise. Derived,
    * not hardcoded, so it cannot desync from the formula. */
  val L2M1M: Long = 1000L * 19 + ((1000000L * 1000) >> 19) - 1000

  /** Shared KN model tables: (bigram model with p_ppm, per-context
    * lambda_ppm, per-word continuation cont_ppm) — all computed on the
    * [[KnRefMod]] reference split only, all in exact integer ppm with
    * truncating division so the whole train replays in DuckDB. */
  private def knTables(docs: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val mod = math.max(KnRefMod.toLong, docs.count() / KnRefTarget)
    val tk = docs.filter(col("doc_id") % mod === 0)
      .select(tokens(col(textCol)).as("toks"))
    val n1 = greatest(size(col("toks")) - 1, lit(0))
    // the bigram-type table is read by model, lambda AND continuation —
    // checkpoint it so the reference pays its one volume pass ONCE
    // (it is materialized here anyway: nTypes needs an action)
    val bi = org.apache.spark.sql.graft.Bridge.freshLocalCheckpoint(
      tk.select(explode(zip_with(
          slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab")))
    // context totals + forward continuation types, both derivable from
    // the (Heaps-sublinear) bigram-type table — no second corpus pass
    val ctx = bi.groupBy("w1").agg(sum("c_ab").as("c_a"),
      count(lit(1)).as("n1_fwd"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("n1_bwd"))
    val nTypes = bi.count() // driver scalar, vocab-bound
    val lam = ctx.select(col("w1"),
      expr("(3 * n1_fwd * 250000) div c_a").as("lam_ppm"))
    val contP = cont.select(col("w2"),
      expr(s"(n1_bwd * 1000000) div ${nTypes}L").as("cont_ppm"))
    // ctx/cont are vocab-keyed rollups of the checkpointed type table
    // (stats-free after the checkpoint, so hint what we know is small)
    val model = bi.join(broadcast(ctx), Seq("w1"))
      .join(broadcast(cont), Seq("w2"))
      .select(col("w1"), col("w2"), col("c_ab"),
        greatest(lit(1L), expr(
          s"(((4 * c_ab) - 3) * 250000) div c_a" +
            s" + (((3 * n1_fwd * 250000) div c_a)" +
            s" * ((n1_bwd * 1000000) div ${nTypes}L)) div 1000000"))
          .as("p_ppm"))
    (model, lam, contP)
  }

  /** Interpolated Kneser-Ney bigram LM TRAINING (Kneser & Ney 1995 —
    * the smoothing inside KenLM, which CCNet-style pipelines use as
    * THE standard perplexity quality filter). Absolute discount
    * D = 3/4 (kept rational so the arithmetic stays integer):
    * p(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
    *          + D·N1+(w1,·)/c(w1) · N1+(·,w2)/|bigram types|,
    * re-derived in exact ppm with truncating division —
    * (c − 3/4)/c_a becomes ((4c−3)·250000) div c_a — and floored at
    * 1 ppm so every probability is log-able. The continuation factor
    * N1+(·,w2) (in how many DISTINCT contexts does w2 appear, not how
    * often) is the KN insight: a word frequent only inside one fixed
    * collocation gets almost no backoff mass (the "san FRANCISCO"
    * case, spec-pinned).
    *
    * Trains on the [[KnRefMod]] reference split. Emits the bigram
    * model table (w1, w2, c_ab, p_ppm) — the artifact [[knScore]]
    * joins against. Every stage is a keyed agg over bigram TYPES
    * (Heaps-sublinear in corpus volume); the one corpus-volume pass is
    * the bigram extraction itself. DuckDB replays train end-to-end. */
  def knTrain(docs: DataFrame, textCol: String = "text"): DataFrame =
    knTables(docs, textCol)._1

  /** Per-document KN PERPLEXITY SCORING over the FULL corpus with the
    * [[knTrain]] reference model — the deployment half of the CCNet
    * quality gate (keep/bucket documents by LM perplexity against a
    * clean reference). Per bigram the surprise is exact milli-bits:
    * s = l2m(10⁶) − l2m(p_ppm) (the bit-length formula on both
    * engines — no libm log in any comparison); per doc,
    * ppl_mbits = Σs div n_bigrams — mean bits per transition, i.e.
    * log2 perplexity in milli-bits (2^(ppl_mbits/1000) is the
    * conventional perplexity). Backoff cascade for unseen events:
    * seen bigram → model p; seen context → λ(w1)·cont(w2); unseen
    * context → cont(w2); everything floored at 1 ppm (the OOV
    * ceiling: a fully-OOV doc scores exactly [[L2M1M]] mbits).
    *
    * Scale shape: the model/λ/cont tables are reference-vocab-bound
    * (fixed-size artifacts once the reference sample is fixed — the
    * perceptron/k-means train-then-apply discipline), so the three
    * joins broadcast; the corpus pays ONE bigram-explode scan and one
    * doc-keyed agg. Docs with <2 tokens keep a null score ([[
    * lmSurprise]]'s explicit-fate discipline). */
  def knScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val (model, lam, contP) = knTables(docs, textCol)
    val tk = docs.select(col("doc_id"), tokens(col(textCol)).as("toks"))
    val n1 = greatest(size(col("toks")) - 1, lit(0))
    val bg = tk.select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val scored = bg
      .join(broadcast(model.select(col("w1"), col("w2"), col("p_ppm"))),
        Seq("w1", "w2"), "left")
      .join(broadcast(lam), Seq("w1"), "left")
      .join(broadcast(contP), Seq("w2"), "left")
      .withColumn("p", greatest(lit(1L),
        when(col("p_ppm").isNotNull, col("p_ppm"))
          .when(col("lam_ppm").isNotNull,
            expr("(lam_ppm * coalesce(cont_ppm, 0L)) div 1000000"))
          .otherwise(coalesce(col("cont_ppm"), lit(0L)))))
      .withColumn("s_mbits", expr(s"${L2M1M}L - ${sparkL2M("p")}"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(s_mbits) div count(1)").as("ppl_mbits"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("ppl_mbits"))
  }

  /** UNIGRAM reference LM scoring — the weak-model arm of
    * [[CurationOps.doremiWeights]]'s excess-loss measurement and the
    * unigram twin of [[knScore]]: p(w) trains on the SAME
    * [[KnRefMod]]-disciplined reference split
    * (p_ppm = max(1, c(w)·10⁶ div n_ref_tokens)), and every corpus
    * document scores as its mean TOKEN surprise in exact milli-bits
    * (OOV floors at 1 ppm ⇒ exactly [[L2M1M]] mbits, like the KN
    * cascade's ceiling). The kn−unigram GAP per document is how much
    * the bigram structure explains — the learnability signal the
    * DoReMi reweighting aggregates per domain.
    *
    * Scale shape: train is one bounded reference scan to a
    * vocab-bound count table; scoring is one token-explode corpus
    * scan through ONE broadcast join + a doc-keyed agg. Zero-token
    * docs keep a null score (the explicit-fate discipline). */
  def uniRefScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val mod = math.max(KnRefMod.toLong, docs.count() / KnRefTarget)
    val rtk = docs.filter(col("doc_id") % mod === 0)
      .select(tokens(col(textCol)).as("toks"))
    val nRef = math.max(1L, Option(
      rtk.agg(sum(size(col("toks")))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L))
    val uni = rtk.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
      .select(col("w"),
        greatest(lit(1L), expr(s"(c_w * 1000000) div ${nRef}L")).as("p_ppm"))
    val scored = docs.select(col("doc_id"), explode(tokens(col(textCol))).as("w"))
      .join(broadcast(uni), Seq("w"), "left")
      .withColumn("p", greatest(lit(1L), coalesce(col("p_ppm"), lit(0L))))
      .withColumn("s_mbits", expr(s"${L2M1M}L - ${sparkL2M("p")}"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("sum(s_mbits) div count(1)").as("uni_mbits"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("uni_mbits"))
  }

  /** Max duplicate-bigram fraction for [[qualityEnsemble]]'s
    * repetition arm as the cross-multiplied integer rule
    * (n_bg − n_distinct)·20 ≤ n_bg, i.e. ≤ 5 % — strict enough to
    * exercise both branches on the gate corpus; production tunes. */
  val RepDupMult = 20L

  /** QUALITY-ENSEMBLE capstone — the FineWeb-style filtering decision
    * as ONE composed per-document plan: (1) the [[gopherGate]] rule
    * flags (shared [[gopherFlags]] derivation, so monitor and decision
    * can never disagree), (2) the Gopher repetition screen
    * (duplicate-bigram fraction via [[RepDupMult]]), and (3) the
    * [[knScore]] perplexity tier — CCNet's head/middle/tail, with the
    * tercile thresholds taken as EXACT order statistics over the
    * bounded reference split's own scores (driver sort of
    * ~[[KnRefTarget]] longs — the train-then-apply discipline; CCNet
    * computes exactly these buckets from its LM's score distribution).
    * keep = all rules pass AND the doc is not in the tail tier.
    *
    * Scale shape: three per-doc derivations over the corpus composed
    * into one job — the flags are a narrow projection riding the main
    * scan, the repetition screen is a (doc, bigram)-keyed agg pair,
    * the KN arm is [[knScore]]'s broadcast train-then-apply; the final
    * assembly is doc_id-keyed joins. No stage sees more than the
    * corpus once; the only driver traffic is the 3 vocab/reference-
    * bound artifacts. */
  def qualityEnsemble(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = knScore(docs, textCol)
    val mod = math.max(KnRefMod.toLong, docs.count() / KnRefTarget)
    val refPpl = scored
      .filter(col("doc_id") % mod === 0 && col("ppl_mbits").isNotNull)
      .select("ppl_mbits").collect().map(_.getLong(0)).sorted
    val n = refPpl.length
    require(n > 0, "reference split produced no scored docs")
    val t1 = refPpl((n + 2) / 3 - 1)
    val t2 = refPpl((2 * n + 2) / 3 - 1)
    val g = gopherFlags(docs, textCol).select(col("doc_id"),
      when(col("r_words") && col("r_wlen") && col("r_stop") &&
        col("r_punct"), 1L).otherwise(0L).as("gopher_pass"))
    val tk = docs.select(col("doc_id"), tokens(col(textCol)).as("w"))
    val nb = greatest(size(col("w")) - 1, lit(0))
    val rep = tk.select(col("doc_id"), explode(zip_with(
        slice(col("w"), lit(1), nb), slice(col("w"), lit(2), nb),
        (x, y) => concat_ws(" ", x, y))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(sum("cnt").as("n_bg"),
        count(lit(1)).as("n_dg"))
      .select(col("doc_id"),
        when((col("n_bg") - col("n_dg")) * RepDupMult <= col("n_bg"), 1L)
          .otherwise(0L).as("rep_pass"))
    docs.select(col("doc_id"))
      .join(g, Seq("doc_id"))
      .join(rep, Seq("doc_id"), "left")
      .join(scored.select(col("doc_id"), col("ppl_mbits")), Seq("doc_id"))
      .select(col("doc_id"), col("gopher_pass"),
        coalesce(col("rep_pass"), lit(1L)).as("rep_pass"),
        col("ppl_mbits"),
        when(col("ppl_mbits").isNull, "na")
          .when(col("ppl_mbits") <= t1, "head")
          .when(col("ppl_mbits") <= t2, "middle")
          .otherwise("tail").as("ppl_tier"))
      .withColumn("keep",
        when(col("gopher_pass") === 1L && col("rep_pass") === 1L &&
          col("ppl_tier").isin("head", "middle"), 1L).otherwise(0L))
  }

  /** DoReMi temperature τ in milli-bits for [[doremiWeights]] —
    * 1000 mbits = one full bit: a domain whose bigram reference model
    * explains one more bit per document than another earns 2× the
    * mixture weight before normalization. */
  val DoremiTauMbits = 1000L

  /** DoReMi-STYLE DOMAIN REWEIGHTING (Xie et al. 2023) — the mixture
    * question the `mix_*` family sizes by volume, answered by
    * LEARNABILITY instead: DoReMi upweights domains where a stronger
    * model's advantage over a weaker one (the "excess loss") is
    * largest — structured, learnable, under-modeled data — via an
    * exponentiated-gradient update. The house instantiation keeps
    * every step integer-exact: the strong arm is the [[knScore]]
    * bigram reference LM and the weak arm the [[uniRefScore]] unigram
    * LM (both trained on the SAME bounded reference split, both
    * scoring in exact milli-bits through the same l2m formula), so
    * per-document excess = uni_mbits − kn_mbits is how much bigram
    * STRUCTURE explains. Per domain: excess as a difference of the
    * two per-domain integer means (never a negative division — floor
    * `//` and truncating `div` agree only on non-negatives); the EG
    * step exp2(shift/τ) on the min-shifted excess (EG weights are
    * normalization-invariant, so the shift is exact in the real-exp
    * world and DEFINES the integer form) via the [[sqlL2M]] trick's
    * inverse — power-of-two shift × linear interpolation:
    * w_raw = (1 << (shift div 1000)) · (1000 + shift mod 1000);
    * weight_ppm = w_raw·10⁶ div Σw_raw. Uniform prior (volume priors
    * are [[CurationOps.mixTemperature]]'s job; DoReMi composes ON TOP
    * of a volume mix).
    *
    * Scale shape: both scoring arms are one-corpus-scan broadcast-join
    * pipelines (reference-vocab-bound artifacts — the train-then-apply
    * discipline); the domain rollup is one keyed agg; the EG update
    * runs over the HANDFUL of domain rows (bounded-global windows).
    * Shift ≤ [[L2M1M]] ⇒ w_raw < 2²⁰·2000 — no overflow anywhere. */
  def doremiWeights(docs: DataFrame, domainCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val kn = knScore(docs, textCol)
      .filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("ppl_mbits"))
    val uni = uniRefScore(docs, textCol)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("uni_mbits"))
    val perDoc = docs.select(col("doc_id"), col(domainCol).as("domain"))
      .join(kn, Seq("doc_id"))
      .join(uni, Seq("doc_id"))
    val dom = perDoc.groupBy("domain").agg(
      count(lit(1)).as("n_docs"),
      expr("sum(ppl_mbits) div count(1)").as("kn_mbits"),
      expr("sum(uni_mbits) div count(1)").as("uni_mbits"))
      .withColumn("excess_mbits", col("uni_mbits") - col("kn_mbits"))
    val w = WindowUtil.boundedGlobal(col("domain")).rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    dom
      .withColumn("shift_mbits",
        col("excess_mbits") - min(col("excess_mbits")).over(w))
      .withColumn("w_raw", expr(
        s"shiftleft(1L, cast(shift_mbits div $DoremiTauMbits as int))" +
          s" * ($DoremiTauMbits + shift_mbits % $DoremiTauMbits)"))
      .withColumn("w_tot", sum(col("w_raw")).over(w))
      .withColumn("weight_ppm", expr("(w_raw * 1000000) div w_tot"))
      .select(col("domain").as(domainCol), col("n_docs"), col("kn_mbits"),
        col("uni_mbits"), col("excess_mbits"), col("weight_ppm"))
  }

  /** DOCUMENT-level learnability selection — the RHO-style rule
    * (Mindermann et al. 2022 "Prioritized Training on Points that are
    * Learnable, Worth Learning, and Not Yet Learnt"; Lin et al. 2024
    * RHO-1) at document granularity, built from the engine's own two
    * reference LMs: excess = uni_mbits − kn_mbits per doc — how much
    * bigram STRUCTURE explains beyond unigram frequencies, the same
    * signal [[doremiWeights]] aggregates per domain, here used to
    * SELECT. High excess = structured, learnable text; ≈0/negative =
    * frequency-only noise (scrambled text scores ~0 by construction —
    * the DoReMi spec's planted separation). keep = excess strictly
    * above the corpus mean excess (one driver scalar — the
    * train-then-apply discipline; truncating div matches both
    * engines on negatives).
    *
    * Scale shape: both scorers are train-on-bounded-reference /
    * apply-everywhere (broadcast model tables, one explode scan
    * each); the doc_id join carries 3 longs per doc; the mean is ONE
    * row collected; the final flag is a narrow projection over the
    * localCheckpoint'd scored frame (scored once, reused by the agg
    * and the output). */
  def rhoSelect(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val kn = knScore(docs, textCol).filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("ppl_mbits").as("kn_mbits"))
    val uni = uniRefScore(docs, textCol).filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("uni_mbits"))
    val perDoc = kn.join(uni, Seq("doc_id"))
      .withColumn("excess_mbits", col("uni_mbits") - col("kn_mbits"))
      .localCheckpoint(eager = false)
    // sum() is NULL on an empty/all-degenerate corpus (every doc
    // filtered by the n_bigrams/n_tokens guards) — Option-wrap like
    // epochWaterfall's driver scalars, so the result is an empty
    // frame instead of an NPE
    val m = perDoc.agg(sum("excess_mbits"), count(lit(1))).first()
    val mean = Option(m.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L) /
      math.max(m.getLong(1), 1L)
    perDoc.select(col("doc_id"), col("kn_mbits"), col("uni_mbits"),
      col("excess_mbits"), (col("excess_mbits") > mean).as("keep"))
  }

  /** Merge rounds for the driver's `bpe_train_merges` query. */
  val BpeTrainRounds = 4

  /** Symbol separator for BPE training state — a control char that
    * whitespace tokenization guarantees absent from any token. */
  val BpeSepChar = "\u0001"

  /** Distributed BPE merge TRAINING (the learner behind the
    * [[graft.functions.BpeKernel]] ENCODER's merge table): the
    * textbook two-phase trainer. Phase 1 is the only full-corpus pass
    * — the word-frequency vocabulary (same shuffle as
    * [[tfidfTopTerms]]'s df table, map-side combined). Phase 2
    * iterates on that vocabulary-sized table: each round counts
    * adjacent symbol pairs weighted by word frequency (overlapping
    * pairs, the standard BPE count), picks the most frequent pair
    * (ties broken lexicographically), records it, and applies the
    * merge to every word via leftmost non-overlapping replacement —
    * `replace` has identical greedy semantics in Spark and DuckDB, so
    * the oracle replays training exactly.
    *
    * Shape at scale: corpus size enters ONLY through phase 1; the R
    * training rounds touch a vocabulary whose size is corpus-sublinear
    * (Heaps' law), each round one keyed agg + a 1-row argmax collect
    * (a driver-side SCALAR, the same discipline as [[pmiBigrams]]'s N)
    * + one map-side replace. The vocab is cached once, so the corpus
    * is scanned once no matter how many rounds run. */
  def bpeTrainMerges(docs: DataFrame, textCol: String = "text",
      rounds: Int = BpeTrainRounds): DataFrame = {
    val spark = docs.sparkSession
    val sep = BpeSepChar
    // phase 1: word-frequency vocab; word → sep-delimited char symbols
    val vocab = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat(lit(sep), array_join(split(col("w"), ""), sep),
        lit(sep)).as("s"), col("n"))
      .persist()
    try {
      var sym = vocab
      val merges = (1 to rounds).map { r =>
        val best = sym
          .select(col("n"), filter(split(col("s"), sep), x => x =!= "").as("c"))
          .filter(size(col("c")) >= 2)
          .select(col("n"), explode(transform(
            sequence(lit(1), size(col("c")) - 1),
            i => struct(element_at(col("c"), i).as("a"),
              element_at(col("c"), i + 1).as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("n").as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1).collect()(0)
        val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
        sym = sym.withColumn("s",
          replace(col("s"), lit(sep + a + sep + b + sep), lit(sep + a + b + sep)))
        (r.toLong, a, b, cnt)
      }
      spark.createDataFrame(merges)
        .toDF("round", "sym_a", "sym_b", "n_pairs")
    } finally vocab.unpersist()
  }

  // ------------------------------------------- unigram-LM tokenizer

  /** Unigram-LM (SentencePiece-family) trainer parameters — shared
    * with the oracle SQL generator so the two replays cannot desync.
    * MaxWordLen bounds the position-unrolled Viterbi DP in the DuckDB
    * replay; longer words fall back to per-character pieces on BOTH
    * engines (a deterministic rule, not an approximation mismatch). */
  val UniMaxPieceLen = 4
  val UniMaxWordLen = 12
  val UniVocab = 64
  val UniRounds = 2

  /** Unigram-LM tokenizer training — the OTHER production tokenizer
    * family next to [[bpeTrainMerges]]'s BPE: instead of greedy merge
    * growing, a piece VOCABULARY is scored as a unigram language model
    * and refined by EM. This is hard-EM (Viterbi-EM): the E-step
    * segments every vocab word with the current piece costs (exact
    * integer milli-log2 costs, [[graft.functions.UnigramKernel]]), the
    * M-step re-estimates piece counts from the segmentations and
    * prunes multi-char pieces that no best-segmentation uses (single
    * chars are floored at count 1 so every string stays encodable —
    * the SentencePiece character-coverage rule).
    *
    * Candidate init: all substrings of length 1..[[UniMaxPieceLen]]
    * of the token vocabulary, occurrence-weighted by word frequency;
    * top-[[UniVocab]] by (count DESC, piece ASC) plus all single
    * characters.
    *
    * Shape at scale: the corpus is touched ONCE (the word-frequency
    * vocab agg — the [[bpeTrainMerges]] phase-1 shape); every EM round
    * runs over the VOCABULARY (corpus-sublinear, Heaps' law) with the
    * piece table collected driver-side (≤ UniVocab + |alphabet| rows —
    * the kmeans/perceptron train-then-apply discipline) and the
    * segmenter applied as a native expression, one keyed agg per
    * round. Exact-integer costs make the whole training replayable in
    * DuckDB ([[unigramOracle]]): floor-log2 comes from the bit length,
    * the fractional octave from an integer linear interpolation —
    * no floating point anywhere in a comparison. */
  def unigramTrain(docs: DataFrame, textCol: String = "text",
      rounds: Int = UniRounds): DataFrame = {
    import graft.functions.UnigramKernel.log2Milli
    val spark = docs.sparkSession
    val wv = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .persist()
    try {
      // init candidates: every substring of length 1..MaxPieceLen,
      // weighted by word frequency (overlapping occurrences count)
      val sub = wv.select(col("n"), explode(flatten(transform(
          sequence(lit(1), length(col("w"))),
          s => transform(
            sequence(lit(1), least(lit(UniMaxPieceLen), length(col("w")) - s + 1)),
            l => col("w").substr(s, l))))).as("piece"))
        .groupBy("piece").agg(sum("n").as("cnt"))
        .persist()
      val top = sub.orderBy(col("cnt").desc, col("piece").asc).limit(UniVocab)
      val singles = sub.filter(length(col("piece")) === 1)
      var pc: Map[String, Long] = top.unionByName(singles)
        .groupBy("piece").agg(max("cnt").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      sub.unpersist()
      for (_ <- 1 to rounds) {
        val total = pc.values.sum
        val costs = pc.toSeq.map { case (p, c) =>
          p -> (log2Milli(total) - log2Milli(c)) }
        val enc = graft.functions.UnigramNative.unigram_encode(
          col("w"), costs, UniMaxWordLen, UniMaxPieceLen)
        val used = wv.filter(length(col("w")) <= UniMaxWordLen)
          .select(col("n"), explode(enc).as("piece"))
          .groupBy("piece").agg(sum("n").as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        pc = used ++ pc.keysIterator
          .filter(p => p.length == 1 && !used.contains(p)).map(_ -> 1L)
      }
      val total = pc.values.sum
      val rows = pc.toSeq.sortBy(_._1).map { case (p, c) =>
        (p, c, log2Milli(total) - log2Milli(c)) }
      spark.createDataFrame(rows).toDF("piece", "cnt", "cost_milli")
    } finally wv.unpersist()
  }

  /** Corpus encoding with the trained unigram vocabulary: per-doc
    * token/piece/cost accounting via the one-pass
    * [[graft.functions.UnigramStats]] kernel — train (vocab-scale,
    * driver-collected) then apply (one narrow corpus scan, zero
    * shuffle before the per-doc projection). */
  def unigramCorpusStats(docs: DataFrame, textCol: String = "text",
      rounds: Int = UniRounds): DataFrame = {
    import graft.functions.UnigramKernel.log2Milli
    val trained = unigramTrain(docs, textCol, rounds).collect()
    val costs = trained.map(r => r.getString(0) -> r.getLong(2)).toSeq
    val total = trained.map(_.getLong(1)).sum
    val st = graft.functions.UnigramNative.unigram_stats(
      col(textCol), costs, log2Milli(total), UniMaxWordLen, UniMaxPieceLen)
    docs.select(col("doc_id"), st.as("st"))
      .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
        col("st.n_pieces").as("n_pieces"),
        col("st.cost_milli").as("cost_milli"))
  }

  // ------------------------------------------- WordPiece tokenizer

  /** WordPiece trainer parameters — shared with the oracle SQL
    * generator so the two replays cannot desync. WpMaxPieceLen bounds
    * the greedy matcher's candidate window (a depth-R merge chain can
    * concatenate at most 2^R characters); WpMaxWordLen bounds the
    * position-unrolled greedy walk in the DuckDB replay (the unigram
    * long-word rule: longer words fall back to per-character pieces on
    * BOTH engines). */
  val WpTrainRounds = 4
  val WpMaxPieceLen = 16
  val WpMaxWordLen = 12

  /** Spark-side exact-integer milli-log2 as a SQL-expr fragment — the
    * Column twin of [[graft.functions.UnigramKernel.log2Milli]] and the
    * oracle's [[sqlL2M]]: floor-log2 from the binary-string length,
    * fractional octave by integer linear interpolation. `bin` and
    * dynamic-count `shiftright` evaluate identically in Spark and
    * DuckDB for all n ≥ 1, so score comparisons can never be flipped
    * by libm log rounding or float summation order. */
  private[graft] def sparkL2M(x: String): String =
    s"(1000*(length(bin($x))-1) + shiftright(($x)*1000, length(bin($x))-1) - 1000)"

  /** WordPiece merge TRAINING (Schuster & Nakajima 2012) — the THIRD
    * production tokenizer family, completing the triple next to
    * [[bpeTrainMerges]] (frequency-greedy merges) and [[unigramTrain]]
    * (EM-pruned piece LM): WordPiece grows the vocabulary by the merge
    * that maximizes the training-corpus LIKELIHOOD gain, i.e.
    * argmax count(ab) / (count(a)·count(b)) — a rare pair of rare
    * symbols can beat a frequent pair of ubiquitous symbols (the
    * distinguishing case BPE gets wrong, pinned in WordpieceSpec).
    *
    * House integer stance: the score is computed in exact MILLI-LOG2 —
    * score = log2(c_ab) − log2(c_a) − log2(c_b) via the bit-length
    * formula ([[sparkL2M]] ≡ the oracle's [[sqlL2M]] ≡
    * [[graft.functions.UnigramKernel.log2Milli]]), so the per-round
    * argmax (ties: score DESC, a ASC, b ASC) replays bit-identically
    * in DuckDB — no libm log anywhere in a comparison. Unit counts
    * count each symbol occurrence in the current segmentation once,
    * weighted by word frequency (the standard formulation).
    *
    * Shape at scale ([[bpeTrainMerges]]'s): the corpus enters ONLY
    * through the phase-1 word-frequency vocab (one scan, map-side
    * combined); each of the R rounds runs two vocabulary-sized keyed
    * aggs (unit counts + overlapping pair counts — Heaps-sublinear),
    * one 1-row argmax collect (a driver scalar, the [[pmiBigrams]]
    * discipline), and one map-side greedy replace. */
  def wordpieceTrainMerges(docs: DataFrame, textCol: String = "text",
      rounds: Int = WpTrainRounds): DataFrame = {
    val spark = docs.sparkSession
    val sep = BpeSepChar
    val vocab = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat(lit(sep), array_join(split(col("w"), ""), sep),
        lit(sep)).as("s"), col("n"))
      .persist()
    try {
      var sym = vocab
      val merges = (1 to rounds).map { r =>
        val cells = sym
          .select(col("n"), filter(split(col("s"), sep), x => x =!= "").as("c"))
        val units = cells
          .select(col("n"), explode(col("c")).as("u"))
          .groupBy("u").agg(sum("n").as("cu"))
        val best = cells
          .filter(size(col("c")) >= 2)
          .select(col("n"), explode(transform(
            sequence(lit(1), size(col("c")) - 1),
            i => struct(element_at(col("c"), i).as("a"),
              element_at(col("c"), i + 1).as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("n").as("cnt"))
          .join(units.select(col("u").as("a"), col("cu").as("ca")), Seq("a"))
          .join(units.select(col("u").as("b"), col("cu").as("cb")), Seq("b"))
          .withColumn("score_milli", expr(
            s"${sparkL2M("cnt")} - ${sparkL2M("ca")} - ${sparkL2M("cb")}"))
          .orderBy(col("score_milli").desc, col("a").asc, col("b").asc)
          .limit(1).collect()(0)
        val (a, b) = (best.getAs[String]("a"), best.getAs[String]("b"))
        sym = sym.withColumn("s",
          replace(col("s"), lit(sep + a + sep + b + sep), lit(sep + a + b + sep)))
        (r.toLong, a, b, best.getAs[Long]("cnt"), best.getAs[Long]("score_milli"))
      }
      spark.createDataFrame(merges)
        .toDF("round", "sym_a", "sym_b", "n_pairs", "score_milli")
    } finally vocab.unpersist()
  }

  /** Corpus encoding with the trained WordPiece vocabulary: per-doc
    * token/piece/char accounting via the one-pass greedy
    * longest-match-first kernel ([[graft.functions.WordpieceStats]] —
    * the BERT inference algorithm; NOT the trainer's merge replay,
    * exactly as in production WordPiece where training builds the
    * vocab and inference greedy-matches it). Vocab = the R merge
    * products, driver-collected (train-then-apply); single characters
    * match implicitly (character-coverage floor), so no UNK path
    * exists. compress_ppm = pieces per char in exact integer ppm —
    * the tokenizer-efficiency scalar next to [[bpeFertility]].
    *
    * Shape at scale: train is vocab-bound ([[wordpieceTrainMerges]]);
    * apply is ONE narrow corpus scan with zero shuffle. */
  def wordpieceCorpusStats(docs: DataFrame, textCol: String = "text",
      rounds: Int = WpTrainRounds): DataFrame = {
    val merges = wordpieceTrainMerges(docs, textCol, rounds).collect()
      .map(r => r.getAs[String]("sym_a") + r.getAs[String]("sym_b")).toSeq
    val st = graft.functions.WordpieceNative.wordpiece_stats(
      col(textCol), merges.distinct, WpMaxWordLen, WpMaxPieceLen)
    docs.select(col("doc_id"), st.as("st"))
      .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
        col("st.n_pieces").as("n_pieces"), col("st.n_chars").as("n_chars"))
      .withColumn("compress_ppm",
        expr("(n_pieces * 1000000) div greatest(n_chars, 1)"))
  }

  /** Query-term set for the driver's `txt_bm25` query (shared with the
    * oracle SQL literals). High-frequency corpus terms so every doc
    * has a chance to score. */
  val Bm25Terms = Seq("vector", "spark", "query", "data", "hash")
  val Bm25TopK = 20

  /** BM25 document ranking for a fixed query-term set — the retrieval
    * scorer behind corpus search / RAG candidate generation. Classic
    * Okapi shape (k1 = 1.2, b = 0.75) re-derived in EXACT integer
    * arithmetic (same discipline as [[tfidfTopTerms]]): with
    * k1 = 6/5 and b = 3/4, the length-normalized tf factor
    * `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` multiplied through by
    * `10·T` (T = total corpus tokens, avgdl = T/N) becomes the integer
    * ratio `22·T·tf / (10·T·tf + 3·T + 9·dl·N)`, and the idf keeps the
    * raw Robertson rarity ratio `(2N−2df+1)/(2df+1)` in milli-units
    * instead of its log — monotone per term, so per-term contributions
    * preserve rank, and the summed score stays a bit-exact BIGINT
    * (float summation order and libm log rounding can never flip a
    * comparison between engines). Integer headroom: contributions are
    * ≤ idf_milli·22·T·tf ≈ 1e17 at sf1 — rescale milli→centi before
    * the corpus outgrows int64.
    *
    * Shape at scale: a FIXED small query-term set means the whole
    * scorer is one corpus scan — per-term tf via codegen'd array HOFs
    * (no explode, no per-term re-scan), per-term df + corpus totals
    * fetched as driver scalars up front (three small actions; a
    * constant-key broadcast of a stats row would plan as a nested
    * loop, which the plan audit rejects) and baked into the score
    * expression as integer literals. The final top-k is
    * TakeOrderedAndProject — per-partition top-k, never a global sort.
    * (An unbounded/ad-hoc term set would need the explode → groupBy →
    * df-join form instead; that variant re-scans the corpus per
    * aggregation and shuffles (doc, term) pairs.) */
  def bm25TopDocs(docs: DataFrame, terms: Seq[String] = Bm25Terms,
      k: Int = Bm25TopK, textCol: String = "text"): DataFrame = {
    val tk = docs.select(col("doc_id"), tokens(col(textCol)).as("toks"))
    val nDocs = docs.count()
    val totals = tk.agg(
      sum(size(col("toks"))).as("n_tok"),
      terms.zipWithIndex.map { case (t0, i) =>
        sum(when(array_contains(col("toks"), t0), 1L).otherwise(0L))
          .as(s"df_$i")
      }: _*).first()
    val nTok = totals.getLong(0)
    val dfs = terms.indices.map(i => totals.getLong(i + 1))
    val scored = tk.select(
      (col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t0, i) =>
          size(filter(col("toks"), x => x === t0)).cast("long").as(s"tf_$i")
        }): _*)
    // per-term idf is a driver-side exact integer (Long `/` truncates
    // toward zero = DuckDB `//` on positives); df = 0 terms contribute
    // nothing because their tf is 0 everywhere
    val contribs = terms.indices.map { i =>
      val idfMilli = ((2 * nDocs - 2 * dfs(i) + 1) * 1000) / (2 * dfs(i) + 1)
      expr(s"CASE WHEN tf_$i > 0 THEN " +
        s"(${idfMilli}L * 22 * ${nTok}L * tf_$i) div " +
        s"(10 * ${nTok}L * tf_$i + 3 * ${nTok}L + 9 * dl * ${nDocs}L) " +
        "ELSE 0L END")
    }
    val hits = terms.indices
      .map(i => when(col(s"tf_$i") > 0, 1L).otherwise(0L))
    scored
      .withColumn("score_u", contribs.reduce(_ + _))
      .withColumn("n_hit_terms", hits.reduce(_ + _))
      .filter(col("n_hit_terms") > 0)
      .orderBy(col("score_u").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("dl"), col("n_hit_terms"), col("score_u"))
  }

  /** Inverted-index BUILD — the text-serving artifact [[bm25TopDocs]]
    * assumes already exists, made explicit as one composed plan (the
    * lexical sibling of the vector side's `serve_index_build`): per
    * term, the document frequency, collection frequency, the top
    * posting by tf (tie → lowest doc_id — the head entry an
    * impact-ordered / WAND-style postings layout stores first so
    * scorers can early-terminate), and the exact integer BM25
    * idf_milli — the SAME `((2N−2df+1)·1000) div (2df+1)` formula
    * [[bm25TopDocs]] computes at query time, so an index built here
    * and a live query can never disagree on a term weight.
    *
    * Shape at scale: the explode reaches the first shuffle already
    * keyed (term, doc_id) with map-side combine — corpus token volume
    * is paid exactly once and carries only (term, id, partial count);
    * the per-term rollup is vocabulary-sized (Heaps-sublinear in the
    * corpus), and the top posting rides that same keyed agg as a
    * `max(struct(tf, −doc_id))` — no per-term window over the
    * postings, no second corpus scan. N is the one driver-side scalar
    * (train-then-apply discipline, as in [[bm25TopDocs]]). */
  def textIndexBuild(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val nDocs = docs.count()
    val postings = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    postings.groupBy("term").agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        max(struct(col("tf"), (-col("doc_id")).as("nid"))).as("_top"))
      .select(col("term"), col("df"), col("cf"),
        (-col("_top.nid")).as("top_doc_id"), col("_top.tf").as("top_tf"),
        expr(s"((2 * ${nDocs}L - 2 * df + 1) * 1000) div (2 * df + 1)")
          .as("idf_milli"))
  }

  /** Per-document Gopher keep decision — [[gopherGate]]'s rule flags
    * WITHOUT the source rollup: a stateless narrow projection, which
    * makes it the STREAMING-legal form of the quality gate (no agg, no
    * watermark, no state — `readStream → this → writeStream` append
    * works unchanged; StreamQualityGateSpec pins stream ≡ batch across
    * micro-batches). The batch twin here shares [[gopherFlags]] with
    * the rollup monitor and [[qualityEnsemble]], so the three surfaces
    * apply the IDENTICAL rules by construction. */
  def gopherKeep(docs: DataFrame, textCol: String = "text"): DataFrame =
    gopherFlags(docs, textCol)
      .select(col("doc_id"), col("r_words"), col("r_wlen"),
        col("r_stop"), col("r_punct"),
        (col("r_words") && col("r_wlen") && col("r_stop") && col("r_punct"))
          .as("keep"))

  // ------------------------------------------------- perceptron classifier

  /** Hashed-feature batch POCKET perceptron (Gallant 1990) — an
    * IN-ENGINE trainable quality/domain classifier (fasttext-shaped:
    * hashed unigram buckets + linear model) with EXACT integer
    * arithmetic, so training itself is DuckDB-oracle-checkable — no
    * float reduction order anywhere. Features: token hash → [0, F)
    * count buckets plus a constant bias slot. One batch round: every
    * misclassified doc (y·(w·x) ≤ 0) contributes y·x to the update —
    * a filter + one (feature)-keyed agg, order-independent. Batch
    * updates oscillate on non-separable data (measured: period-2 flips
    * between the all-positive and all-negative predictors on the
    * driver corpus), so the POCKET rule keeps the round whose incoming
    * weights misclassified fewest docs (tie → earliest) — measured
    * 0.844 accuracy vs 0.658 majority-class base at F=256, R=8.
    *
    * Label: ±1 from a deterministic distant-supervision rule,
    * default count('spark') > count('hash') — a Snorkel-style keyword
    * labeling function. The corpus's `lang` column is NOT learnable
    * from text (all 31 vocabulary tokens occur in every language —
    * verified), so a content-derived label is the honest demo.
    *
    * Shape per round (same centroid-literal pattern as the fixed-point
    * k-means): weights are F+1 longs collected on the driver and baked
    * into the next round's margin EXPRESSION, so the misclassification
    * filter is a narrow projection over the cached dense vectors; the
    * update agg reaches the shuffle with ≤ F+1 rows per task. The dense
    * featurization is two keyed shuffles, paid once. */
  val PercF = 256
  val PercRounds = 8

  /** Default labeling function (see above). */
  def percLabel: Column = {
    val tk = tokens(col("text"))
    when(size(filter(tk, x => x === "spark")) >
      size(filter(tk, x => x === "hash")), 1L).otherwise(-1L)
  }

  private[graft] def perceptronFeatures(docs: DataFrame,
      nFeatures: Int = PercF, labelExpr: Column = percLabel): DataFrame =
    // single narrow pass: the native kernel builds the dense F+1 count
    // vector (bias slot included) per row — no explode, no shuffle;
    // token-less docs get the zero+bias vector by construction
    docs.select(col("doc_id"), labelExpr.as("y"),
      graft.functions.TextNative.feature_counts(col("text"), nFeatures)
        .as("xarr"))

  // native literal-weight dot (r16): the interpreted
  // aggregate(zip_with(...)) fold boxed F+1 longs per doc per round;
  // integer Σ is order-free, so the kernel is bit-identical
  private def perceptronMargin(w: Array[Long]): Column =
    graft.functions.VectorFunctions.vec_dot_const_long(
      col("xarr"), w.toIndexedSeq)

  private def trainPerceptron(fd: DataFrame, nFeatures: Int,
      rounds: Int): Array[Long] = {
    var w = Array.fill(nFeatures + 1)(0L)
    var pocket = w
    var pocketErr = Long.MaxValue
    for (_ <- 1 to rounds) {
      // every pos row of the dense misclassified set carries the same
      // doc count, so any row doubles as the round's error measure of
      // the INCOMING weights (the pocket candidate)
      val upd = fd.filter(col("y") * perceptronMargin(w) <= 0)
        .select(col("y"), posexplode(col("xarr")))
        .groupBy("pos")
        .agg(sum(col("y") * col("col")).as("dw"), count(lit(1)).as("nmis"))
        .collect()
      val err = if (upd.isEmpty) 0L else upd.head.getLong(2)
      if (err < pocketErr) { pocketErr = err; pocket = w }
      val next = w.clone()
      upd.foreach(r => next(r.getInt(0)) += r.getLong(1))
      w = next
    }
    pocket
  }

  /** Trained weight table: feature_id ∈ [0, F) buckets, −1 = bias.
    *
    * The featurized frame is localCheckpoint'd (not persist +
    * finally-unpersist): the returned DataFrame still DEPENDS on it —
    * an eager unpersist here made the caller's action re-run the whole
    * two-shuffle featurization (measured: score 6.15 s → the
    * checkpoint form re-reads executor-local blocks). Blocks drop with
    * the frame's GC, the same lifecycle as the dedup shingle tables. */
  def perceptronTrain(docs: DataFrame, nFeatures: Int = PercF,
      rounds: Int = PercRounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fd = perceptronFeatures(docs, nFeatures).localCheckpoint(eager = false)
    val w = trainPerceptron(fd, nFeatures, rounds)
    w.zipWithIndex.map { case (wv, i) =>
      (if (i == nFeatures) -1L else i.toLong, wv) }
      .toSeq.toDF("feature_id", "w")
  }

  /** Per-doc margin/prediction under the trained weights. */
  def perceptronScore(docs: DataFrame, nFeatures: Int = PercF,
      rounds: Int = PercRounds): DataFrame = {
    val fd = perceptronFeatures(docs, nFeatures).localCheckpoint(eager = false)
    val w = trainPerceptron(fd, nFeatures, rounds)
    val m = perceptronMargin(w)
    fd.select(col("doc_id"), col("y").as("label_y"), m.as("margin"),
        when(m > 0, 1L).otherwise(-1L).as("pred"))
      .withColumn("correct",
        when(col("pred") === col("label_y"), 1L).otherwise(0L))
  }

  /** Apply a trained weight vector to ANY doc frame — batch or
    * STREAMING: the scorer is a pure narrow projection (native
    * featurize kernel + literal-weight margin), so the same Column
    * expressions run unchanged on a streaming scan — the
    * train-offline / score-at-ingest production split. `weights` is
    * indexed [0, F) buckets then bias (the layout
    * [[weightsFromTable]] restores from [[perceptronTrain]] output). */
  def perceptronApply(docs: DataFrame, weights: Array[Long],
      nFeatures: Int = PercF): DataFrame = {
    require(weights.length == nFeatures + 1,
      s"need ${nFeatures + 1} weights, got ${weights.length}")
    val x = graft.functions.TextNative.feature_counts(col("text"), nFeatures)
    val m = graft.functions.VectorFunctions.vec_dot_const_long(
      x, weights.toIndexedSeq)
    docs.select(col("doc_id"), m.as("margin"),
      when(m > 0, 1L).otherwise(-1L).as("pred"))
  }

  /** Collect a [[perceptronTrain]] result back into the dense weight
    * array [[perceptronApply]] expects (feature −1 → bias slot F). */
  def weightsFromTable(trained: DataFrame, nFeatures: Int = PercF): Array[Long] = {
    val w = Array.fill(nFeatures + 1)(0L)
    trained.collect().foreach { r =>
      val f = r.getLong(0)
      w(if (f < 0) nFeatures else f.toInt) = r.getLong(1)
    }
    w
  }

  /** Precision/recall curve over the trained classifier's margins —
    * the threshold-tuning artifact a production quality filter needs
    * (pick the margin cutoff for a target precision before gating
    * billions of docs). One point per DISTINCT margin m: cut at
    * "margin ≥ m", cumulative positives / docs above the cut,
    * precision and recall in exact ppm (integer div).
    *
    * Scale shape: the corpus-sized work is ONE keyed agg (per-margin
    * pos/total counts — the distinct-margin frame is tiny); the
    * cumulative windows and the total-positives frame run on that
    * aggregate, so the global ORDER BY never touches corpus rows. */
  def perceptronPr(docs: DataFrame, nFeatures: Int = PercF,
      rounds: Int = PercRounds): DataFrame = {
    val byM = perceptronScore(docs, nFeatures, rounds)
      .groupBy(col("margin"))
      .agg(sum(when(col("label_y") === 1L, 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("n"))
    // both windows run on the distinct-margin agg frame (bounded by
    // the integer margin-value range, never corpus rows)
    val cum = WindowUtil.boundedGlobal(col("margin"))
      .orderBy(col("margin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = WindowUtil.boundedGlobal(col("margin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byM
      .withColumn("cum_n", sum(col("n")).over(cum))
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .withColumn("total_pos", sum(col("n_pos")).over(all))
      .select(col("margin"), col("cum_n"), col("cum_pos"),
        expr("(cum_pos * 1000000) div cum_n").as("precision_ppm"),
        expr("(cum_pos * 1000000) div greatest(total_pos, 1)")
          .as("recall_ppm"))
  }

  /** Unrolled SQL replay of the pocket-perceptron rounds (bias as
    * feature id F internally, −1 in the output). Round t's margin CTE
    * m{t} evaluates the INCOMING weights w{t−1}, so the pocket pick is
    * argmin over (e_t, t) of the per-round misclassification counts —
    * identical to the driver-side rule. */
  private[graft] def perceptronOracle(nFeatures: Int, rounds: Int,
      mode: String): String = {
    val score = mode != "train"
    val h = s"('0x' || substr(md5(tok), 1, 15))::BIGINT % $HashMod % $nFeatures"
    val roundsSql = (1 to rounds).map { t =>
      val p = s"w${t - 1}"
      s"""m$t AS (SELECT a.doc_id, CAST(SUM(a.cnt * w.w) AS BIGINT) AS m
         |  FROM fa a JOIN $p w ON a.f = w.f GROUP BY 1),
         |u$t AS (SELECT a.f, CAST(SUM(y.y * a.cnt) AS BIGINT) AS dw
         |  FROM fa a JOIN yl y ON a.doc_id = y.doc_id
         |  JOIN m$t m ON m.doc_id = a.doc_id
         |  WHERE y.y * m.m <= 0 GROUP BY 1),
         |w$t AS (SELECT w.f, w.w + COALESCE(u.dw, 0) AS w
         |  FROM $p w LEFT JOIN u$t u ON w.f = u.f)""".stripMargin
    }.mkString(",\n")
    val errsSql = (1 to rounds).map { t =>
      s"""SELECT $t AS t, COUNT(*) AS e FROM m$t m
         |    JOIN yl y ON y.doc_id = m.doc_id WHERE y.y * m.m <= 0""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val wtSql = (1 to rounds).map { t =>
      s"SELECT $t AS t, f, w FROM w${t - 1}"
    }.mkString("\n  UNION ALL\n  ")
    val pocketSql =
      s"""errs AS (
         |  $errsSql),
         |best AS (SELECT t FROM errs QUALIFY ROW_NUMBER() OVER (ORDER BY e, t) = 1),
         |wt AS (
         |  $wtSql),
         |wp AS (SELECT wt.f, wt.w FROM wt JOIN best ON wt.t = best.t)""".stripMargin
    val cumW = "OVER (ORDER BY margin DESC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    val tail = mode match {
      case "train" =>
        s"""SELECT CAST(CASE WHEN f = $nFeatures THEN -1 ELSE f END AS BIGINT)
           |  AS feature_id, CAST(w AS BIGINT) AS w FROM wp""".stripMargin
      case "score" =>
        s"""mf AS (SELECT a.doc_id, CAST(SUM(a.cnt * w.w) AS BIGINT) AS m
           |  FROM fa a JOIN wp w ON a.f = w.f GROUP BY 1)
           |SELECT y.doc_id, CAST(y.y AS BIGINT) AS label_y,
           |  CAST(m.m AS BIGINT) AS margin,
           |  CAST(CASE WHEN m.m > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
           |  CAST(CASE WHEN (CASE WHEN m.m > 0 THEN 1 ELSE -1 END) = y.y
           |    THEN 1 ELSE 0 END AS BIGINT) AS correct
           |FROM yl y JOIN mf m ON y.doc_id = m.doc_id""".stripMargin
      case "pr" =>
        s"""mf AS (SELECT a.doc_id, CAST(SUM(a.cnt * w.w) AS BIGINT) AS m
           |  FROM fa a JOIN wp w ON a.f = w.f GROUP BY 1),
           |bym AS (SELECT m.m AS margin,
           |    SUM(CASE WHEN y.y = 1 THEN 1 ELSE 0 END) AS n_pos,
           |    COUNT(*) AS n
           |  FROM mf m JOIN yl y ON y.doc_id = m.doc_id GROUP BY 1)
           |SELECT margin,
           |  CAST(SUM(n) $cumW AS BIGINT) AS cum_n,
           |  CAST(SUM(n_pos) $cumW AS BIGINT) AS cum_pos,
           |  CAST((SUM(n_pos) $cumW) * 1000000 // (SUM(n) $cumW) AS BIGINT)
           |    AS precision_ppm,
           |  CAST((SUM(n_pos) $cumW) * 1000000
           |    // GREATEST(SUM(n_pos) OVER (), 1) AS BIGINT) AS recall_ppm
           |FROM bym""".stripMargin
    }
    val tailSep = if (score) "," else ""
    s"""WITH tkl AS (
       |  SELECT doc_id, $sqlToks AS toks FROM documents),
       |yl AS (
       |  SELECT doc_id,
       |    CASE WHEN len(list_filter(toks, x -> x = 'spark'))
       |       > len(list_filter(toks, x -> x = 'hash')) THEN 1 ELSE -1 END AS y
       |  FROM tkl),
       |fa AS (
       |  SELECT doc_id, $h AS f, COUNT(*) AS cnt
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tkl)
       |  GROUP BY 1, 2
       |  UNION ALL
       |  SELECT doc_id, $nFeatures AS f, 1 AS cnt FROM documents),
       |w0 AS (SELECT unnest(range(0, ${nFeatures + 1})) AS f, 0::BIGINT AS w),
       |$roundsSql,
       |$pocketSql$tailSep
       |$tail""".stripMargin
  }

  /** Exact-integer milli-log2 in DuckDB — the SQL twin of
    * [[graft.functions.UnigramKernel.log2Milli]]: floor-log2 from the
    * binary-string length, fractional octave by integer linear
    * interpolation. Bit-identical to the Scala form for all n ≥ 1. */
  private[graft] def sqlL2M(x: String): String =
    s"(1000*(length(bin($x))-1) + ((($x)*1000) >> (length(bin($x))-1)) - 1000)"

  /** Full-training SQL replay of [[unigramTrain]] /
    * [[unigramCorpusStats]]. The Viterbi DP is unrolled by position
    * (d{tag}_0..d{tag}_W CTEs, each choosing the (cost ASC, plen DESC)
    * winner over the ≤ MaxPieceLen predecessors — the exact JVM
    * tie-break) and the path is recovered by an unrolled backtrace
    * (bt{tag}_k walks j → j − plen emitting the consumed piece), the
    * labelPropOracle round-generation idiom applied to a DP. Piece
    * costs are [[sqlL2M]] integers, so every segmentation decision
    * replays bit-identically. */
  private[graft] def unigramOracle(rounds: Int, mode: String): String = {
    val P = UniMaxPieceLen; val W = UniMaxWordLen
    // DP + backtrace over word CTE `wordsCte` (col w) with piece-cost
    // CTE `costCte` (piece, cost); emits seg{tag}(w, piece) rows —
    // one per consumed piece instance
    def dpCtes(tag: String, wordsCte: String, costCte: String): String = {
      val d0 = s"d${tag}_0 AS MATERIALIZED (SELECT w, 0::BIGINT AS cost, 0 AS plen FROM $wordsCte)"
      val dj = (1 to W).map { j =>
        val cands = (1 to math.min(P, j)).map { p =>
          s"""SELECT d.w, d.cost + p.cost AS cost, $p AS plen
             |      FROM d${tag}_${j - p} d JOIN $costCte p
             |        ON p.piece = substr(d.w, ${j - p + 1}, $p)
             |      WHERE length(d.w) >= $j""".stripMargin
        }.mkString("\n      UNION ALL\n      ")
        s"""d${tag}_$j AS MATERIALIZED (
           |  SELECT w, cost, plen FROM (
           |    SELECT w, cost, plen,
           |      ROW_NUMBER() OVER (PARTITION BY w ORDER BY cost ASC, plen DESC) AS rn
           |    FROM (
           |      $cands))
           |  WHERE rn = 1)""".stripMargin
      }
      val dall = s"""dall$tag AS MATERIALIZED (
         |  ${(1 to W).map(j => s"SELECT $j AS j, w, plen FROM d${tag}_$j")
              .mkString("\n  UNION ALL\n  ")})""".stripMargin
      val bt0 = s"bt${tag}_0 AS MATERIALIZED (SELECT w, length(w)::BIGINT AS j FROM $wordsCte)"
      val btk = (1 to W).map { k =>
        s"""bt${tag}_$k AS MATERIALIZED (
           |  SELECT b.w, (b.j - d.plen)::BIGINT AS j,
           |    substr(b.w, (b.j - d.plen + 1)::INT, d.plen::INT) AS piece
           |  FROM bt${tag}_${k - 1} b JOIN dall$tag d ON d.w = b.w AND d.j = b.j
           |  WHERE b.j > 0)""".stripMargin
      }
      val segs = s"""seg$tag AS MATERIALIZED (
         |  ${(1 to W).map(k => s"SELECT w, piece FROM bt${tag}_$k")
              .mkString("\n  UNION ALL\n  ")})""".stripMargin
      (Seq(d0) ++ dj ++ Seq(dall, bt0) ++ btk ++ Seq(segs)).mkString(",\n")
    }
    val init =
      s"""wv AS MATERIALIZED (
         |  SELECT w, COUNT(1)::BIGINT AS n
         |  FROM (SELECT unnest($sqlToks) AS w FROM documents) GROUP BY 1),
         |twv AS MATERIALIZED (SELECT w, n FROM wv WHERE length(w) BETWEEN 1 AND $W),
         |sub AS MATERIALIZED (
         |  SELECT piece, SUM(n)::BIGINT AS cnt FROM (
         |    SELECT substr(w, s.i::INT, l.j::INT) AS piece, n
         |    FROM wv,
         |      unnest(range(1, length(w) + 1)) AS s(i),
         |      unnest(range(1, ${P + 1})) AS l(j)
         |    WHERE l.j <= length(w) - s.i + 1)
         |  GROUP BY 1),
         |topv AS (SELECT piece, cnt FROM sub ORDER BY cnt DESC, piece ASC LIMIT $UniVocab),
         |pc0 AS MATERIALIZED (
         |  SELECT piece, MAX(cnt)::BIGINT AS cnt FROM (
         |    SELECT * FROM topv
         |    UNION ALL SELECT piece, cnt FROM sub WHERE length(piece) = 1)
         |  GROUP BY 1)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"pc${r - 1}"
      s"""pcc$r AS MATERIALIZED (
         |  SELECT piece, (${sqlL2M("tt.t")} - ${sqlL2M("cnt")})::BIGINT AS cost
         |  FROM $prev, (SELECT SUM(cnt)::BIGINT AS t FROM $prev) tt),
         |${dpCtes(s"r$r", "twv", s"pcc$r")},
         |usage$r AS MATERIALIZED (
         |  SELECT s.piece, SUM(v.n)::BIGINT AS cnt
         |  FROM segr$r s JOIN twv v ON v.w = s.w GROUP BY 1),
         |pc$r AS MATERIALIZED (
         |  SELECT piece, cnt FROM usage$r
         |  UNION ALL
         |  SELECT piece, 1::BIGINT FROM $prev
         |  WHERE length(piece) = 1
         |    AND piece NOT IN (SELECT piece FROM usage$r))""".stripMargin
    }.mkString(",\n")
    val fin = s"pc$rounds"
    val tail = mode match {
      case "train" =>
        s"""SELECT piece, cnt::BIGINT AS cnt,
           |  (${sqlL2M("tt.t")} - ${sqlL2M("cnt")})::BIGINT AS cost_milli
           |FROM $fin, (SELECT SUM(cnt)::BIGINT AS t FROM $fin) tt""".stripMargin
      case "corpus" =>
        s""",pccf AS MATERIALIZED (
           |  SELECT piece, (${sqlL2M("tt.t")} - ${sqlL2M("cnt")})::BIGINT AS cost
           |  FROM $fin, (SELECT SUM(cnt)::BIGINT AS t FROM $fin) tt),
           |defc AS MATERIALIZED (
           |  SELECT ${sqlL2M("tt.t")}::BIGINT AS c
           |  FROM (SELECT SUM(cnt)::BIGINT AS t FROM $fin) tt),
           |cw AS MATERIALIZED (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
           |dws AS MATERIALIZED (SELECT DISTINCT w FROM cw WHERE length(w) BETWEEN 1 AND $W),
           |${dpCtes("f", "dws", "pccf")},
           |wps AS MATERIALIZED (
           |  SELECT s.w, COUNT(1)::BIGINT AS n_pieces, SUM(p.cost)::BIGINT AS cost
           |  FROM segf s JOIN pccf p ON p.piece = s.piece GROUP BY 1),
           |lws AS MATERIALIZED (
           |  SELECT w, length(w)::BIGINT AS n_pieces, SUM(cst)::BIGINT AS cost FROM (
           |    SELECT x.w AS w, COALESCE(p.cost, (SELECT c FROM defc)) AS cst
           |    FROM (SELECT w, unnest(range(1, length(w) + 1)) AS i
           |          FROM (SELECT DISTINCT w FROM cw WHERE length(w) > $W)) x
           |    LEFT JOIN pccf p ON p.piece = substr(x.w, x.i::INT, 1))
           |  GROUP BY 1),
           |ws AS MATERIALIZED (SELECT * FROM wps UNION ALL SELECT * FROM lws),
           |agg AS (
           |  SELECT c.doc_id, COUNT(1)::BIGINT AS n_tokens,
           |    SUM(s.n_pieces)::BIGINT AS n_pieces, SUM(s.cost)::BIGINT AS cost_milli
           |  FROM cw c JOIN ws s ON s.w = c.w GROUP BY 1)
           |SELECT d.doc_id, COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
           |  COALESCE(a.n_pieces, 0)::BIGINT AS n_pieces,
           |  COALESCE(a.cost_milli, 0)::BIGINT AS cost_milli
           |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
    }
    if (mode == "train") s"WITH $init,\n$roundCtes\n$tail"
    else s"WITH $init,\n$roundCtes$tail"
  }

  // ------------------------------------------------------------ queries

  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "txt_token_stats" -> ((s, d) => tokenStats(t(s, d, "documents"))),
    "txt_entropy" -> ((s, d) => tokenEntropy(t(s, d, "documents"))),
    "txt_quality" -> ((s, d) => qualityScore(t(s, d, "documents"))),
    "txt_gopher_gate" -> ((s, d) => gopherGate(t(s, d, "documents"))),
    "txt_langid" -> ((s, d) => languageId(t(s, d, "documents"))),
    "txt_langid_ngram" -> ((s, d) => languageIdNgram(t(s, d, "documents"))),
    "txt_langid_confusion" -> ((s, d) => langIdConfusion(t(s, d, "documents"))),
    "txt_fingerprint" -> ((s, d) => fingerprint(t(s, d, "documents"))),
    "txt_bm25" -> ((s, d) => bm25TopDocs(t(s, d, "documents"))),
    "serve_text_index" -> ((s, d) => textIndexBuild(t(s, d, "documents"))),
    // the PHYSICAL text index: write the postings/terms/stats
    // artifacts, then report the term-stats table READ BACK from the
    // artifact — the oracle recomputes df/idf_milli from the parquet
    // truth with textIndexBuild's exact formula, so a write/load
    // corruption (lost postings, drifted idf) breaks the hash
    "serve_text_index_write" -> ((s, d) => {
      val dir = graft.serving.IndexStore.scratchDir(d, "text")
      graft.serving.IndexStore.writeText(t(s, d, "documents"), dir)
      graft.serving.IndexStore.loadText(s, dir).terms
        .select(col("term"), col("df"), col("idf_milli"))
    }),
    // the text DELETE lifecycle with the dedup_decontaminate corpus as
    // the deletion set (the takedown composition): write the full
    // index, tombstone the contaminated train docs, compact — the
    // postings drop PHYSICALLY and df/idf/stats recompute under the
    // shrunken corpus; the oracle recomputes the term stats from
    // truth-minus-contaminated, so a leaked posting or a stale idf
    // breaks the hash
    "serve_text_index_delete" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val dir = graft.serving.IndexStore.scratchDir(d, "text_delete")
      graft.serving.IndexStore.writeText(docs, dir)
      graft.serving.IndexStore.deleteText(
        graft.ops.DedupOps.decontaminate(
            docs.filter(col("doc_id") % 50 =!= 0),
            docs.filter(col("doc_id") % 50 === 0))
          .filter(col("contaminated")).select("doc_id"), dir)
      graft.serving.IndexStore.compactText(s, dir)
      graft.serving.IndexStore.loadText(s, dir).terms
        .select(col("term"), col("df"), col("idf_milli"))
    }),
    // the text APPEND lifecycle (round 16 — the family's missing
    // stage): write the base split, append the delta split's postings
    // directory-additively, then report the live per-term posting
    // stats (df/tf over old ∪ delta) joined to the FROZEN terms table
    // (base-only df/idf — the appendAnn stale-until-compaction
    // contract). The oracle recomputes the live side from the full
    // corpus and the frozen side from the base split, so a lost
    // appended posting, a leaked terms rewrite, or a drifted idf all
    // break the hash; new-only terms show df_frozen = 0.
    "serve_text_index_append" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val newPred = col("doc_id") % 10 === 7
      val dir = graft.serving.IndexStore.scratchDir(d, "text_append")
      graft.serving.IndexStore.writeText(docs.filter(!newPred), dir)
      graft.serving.IndexStore.appendText(docs.filter(newPred), dir)
      val idx = graft.serving.IndexStore.loadText(s, dir)
      idx.postings.groupBy("term")
        .agg(count(lit(1)).cast("long").as("df_live"),
          sum("tf").cast("long").as("tf_sum"))
        .join(idx.terms.select(col("term"), col("df").as("df_frozen"),
          col("idf_milli")), Seq("term"), "left")
        .select(col("term"), col("df_live"), col("tf_sum"),
          coalesce(col("df_frozen"), lit(0L)).as("df_frozen"),
          coalesce(col("idf_milli"), lit(0L)).as("idf_milli"))
    }),
    // streaming twin covered by StreamQualityGateSpec (stream ≡ batch)
    "stream_quality_keep" -> ((s, d) => gopherKeep(t(s, d, "documents"))),
    "txt_perceptron_train" -> ((s, d) => perceptronTrain(t(s, d, "documents"))),
    "txt_perceptron_score" -> ((s, d) => perceptronScore(t(s, d, "documents"))),
    "txt_perceptron_pr" -> ((s, d) => perceptronPr(t(s, d, "documents"))),

    // real BPE tokenizer over committed fixture strings: the merge
    // table is the offline-trained artifact (functions.BpeKernel), so
    // the oracle is the independently-computed expected encoding as
    // literals — the mm_decode_imageio pattern. Covers case folding,
    // whitespace, empty input, unseen characters, and greedy
    // longest-merge behavior on concatenated words. Corpus-scale
    // execution + property parity vs a brute-force reference encoder
    // are spec-pinned (BpeSpec).
    "txt_bpe_encode" -> ((s, _) => {
      import s.implicits._
      BpeFixtures.rows.toDF("id", "text")
        .select(col("id").cast("long").as("id"),
          graft.functions.TextNative.bpe_encode(col("text")).as("_tk"))
        .select(col("id"), size(col("_tk")).cast("long").as("n_tokens"),
          array_join(col("_tk"), " ").as("tokens"))
    }),
    // BPE merge TRAINING over the corpus (the learner that produces
    // merge tables like the encoder's) — see [[bpeTrainMerges]]; the
    // oracle replays all four rounds in SQL (identical greedy-replace
    // semantics verified in both engines).
    "bpe_train_merges" -> ((s, d) => bpeTrainMerges(t(s, d, "documents"))),
    // unigram-LM (SentencePiece-family) tokenizer TRAINING — the
    // second production tokenizer family; hard-EM over a substring
    // candidate vocab with exact integer milli-log2 costs, so the
    // DuckDB oracle replays the full training (candidate extraction,
    // both Viterbi E-steps, both count M-steps) bit-identically
    "unigram_train" -> ((s, d) => unigramTrain(t(s, d, "documents"))),
    // WordPiece: likelihood-argmax merge training (the third tokenizer
    // family) + greedy longest-match corpus encode, both replayed in
    // exact milli-log2 / pure-string SQL
    "wordpiece_train" -> ((s, d) => wordpieceTrainMerges(t(s, d, "documents"))),
    "txt_wordpiece_corpus" -> ((s, d) => wordpieceCorpusStats(t(s, d, "documents"))),
    // corpus encode with the trained unigram vocab: train (driver-
    // collected, vocab-scale) then one narrow corpus scan
    "txt_unigram_corpus" -> ((s, d) => unigramCorpusStats(t(s, d, "documents"))),
    // corpus-scale BPE tokenization with the NATIVE kernel (the
    // fixture-literal txt_bpe_encode pins encoder edge cases; this one
    // runs the encoder over every document). The oracle replays the
    // full 64-entry merge table as chained greedy replaces — valid
    // because sequential in-rank-order application is equivalent to
    // lowest-rank-first priority encoding for a well-formed merge list
    // (every composite part is produced by a lower-ranked merge).
    "txt_bpe_corpus" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        graft.functions.TextNative.bpe_encode(col("text")).as("_tk"))
        .select(col("doc_id"), size(col("_tk")).cast("long").as("n_bpe"),
          array_join(col("_tk"), " ").as("bpe_text"))),
    "txt_fertility" -> ((s, d) => bpeFertility(t(s, d, "documents"))),
    "txt_chunks" -> ((s, d) => chunkDocs(t(s, d, "documents"))),
    "txt_pack" -> ((s, d) => packDocs(t(s, d, "documents"))),
    // exact corpus vocabulary head: one explode + one hash-agg shuffle
    // (map-side partial counts), then TakeOrderedAndProject — the
    // frequency table every tokenizer/filter pipeline starts from
    "txt_top_terms" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc)
        .limit(50)),
    "txt_tfidf" -> ((s, d) => tfidfTopTerms(t(s, d, "documents"))),
    "txt_pmi_bigrams" -> ((s, d) => pmiBigrams(t(s, d, "documents"))),
    "txt_lm_surprise" -> ((s, d) => lmSurprise(t(s, d, "documents"))),
    // interpolated Kneser-Ney bigram LM: reference-split train (the
    // CCNet discipline) + full-corpus perplexity scoring, all exact
    // integer ppm / milli-log2 so DuckDB replays train AND score
    "lm_kn_train" -> ((s, d) => knTrain(t(s, d, "documents"))),
    "txt_kn_ppl" -> ((s, d) => knScore(t(s, d, "documents"))),
    "txt_uniref_ppl" -> ((s, d) => uniRefScore(t(s, d, "documents"))),
    "mix_doremi" -> ((s, d) => doremiWeights(t(s, d, "documents"))),
    "curate_rho_select" -> ((s, d) => rhoSelect(t(s, d, "documents"))),
    // the FineWeb-style ensemble: Gopher rules + repetition screen +
    // KN perplexity tercile tier -> one per-doc keep decision
    "curate_quality_ensemble" -> ((s, d) =>
      qualityEnsemble(t(s, d, "documents"))),
    // deterministic train/valid/test split: hash-bucket assignment is
    // reproducible across runs/engines (RNG sampling is not) — the
    // standard trick for stable dataset splits at any scale
    "split_train_test" -> ((s, d) => {
      val h = strHash(concat(lit("split:"), col("doc_id").cast("string")))
      t(s, d, "documents").select(
        col("doc_id"),
        when(h % 100 < 80, "train")
          .when(h % 100 < 90, "valid")
          .otherwise("test").as("split"))
    }),
    "mm_binary_meta" -> ((s, d) =>
      // Multimodal plumbing demo: opaque binary payload column + typed
      // metadata extracted without decoding (byte length + checksum).
      t(s, d, "documents").select(
        col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("payload_md5"),
        col("source")))
  )

  // Shared SQL fragments keep the Spark and DuckDB formulations aligned.
  private val sqlToks = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x != '')"

  /** DuckDB replay of the [[knTables]] training chain (reference
    * split → bigram types → context/continuation stats → interpolated
    * model with the D = 3/4 discount) — shared verbatim by the
    * `lm_kn_train` and `txt_kn_ppl` oracles so the two replays cannot
    * desync. Same truncating-div ppm arithmetic as the Spark side
    * (all operands positive, so DuckDB's floor `//` ≡ Spark's
    * truncating `div`). */
  private lazy val knTrainCtes: String =
    s"""rtk AS (
       |  SELECT $sqlToks AS toks FROM documents
       |  WHERE doc_id % GREATEST($KnRefMod,
       |    (SELECT COUNT(1) FROM documents) // $KnRefTarget) = 0),
       |rbg AS (
       |  SELECT toks[i] AS w1, toks[i+1] AS w2
       |  FROM rtk, unnest(range(1, len(toks))) AS t(i)),
       |bi AS (
       |  SELECT w1, w2, CAST(COUNT(1) AS BIGINT) AS c_ab
       |  FROM rbg GROUP BY w1, w2),
       |ctx AS (
       |  SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a,
       |    CAST(COUNT(1) AS BIGINT) AS n1_fwd
       |  FROM bi GROUP BY w1),
       |cont AS (
       |  SELECT w2, CAST(COUNT(1) AS BIGINT) AS n1_bwd
       |  FROM bi GROUP BY w2),
       |nt AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_types FROM bi),
       |model AS (
       |  SELECT bi.w1, bi.w2, bi.c_ab,
       |    CAST(GREATEST(1,
       |      (((4 * bi.c_ab) - 3) * 250000) // ctx.c_a
       |      + (((3 * ctx.n1_fwd * 250000) // ctx.c_a)
       |         * ((cont.n1_bwd * 1000000) // nt.n_types)) // 1000000)
       |      AS BIGINT) AS p_ppm
       |  FROM bi
       |  JOIN ctx ON bi.w1 = ctx.w1
       |  JOIN cont ON bi.w2 = cont.w2
       |  CROSS JOIN nt)""".stripMargin

  /** DuckDB replay of the [[uniRefScore]] chain (reference split →
    * unigram ppm table → per-doc mean token surprise in milli-bits) —
    * shared by the `txt_uniref_ppl` and `mix_doremi` oracles. CTE
    * names are u-prefixed so the chain composes next to
    * [[knTrainCtes]] without collision. */
  private lazy val uniRefCtes: String =
    s"""urtk AS (
       |  SELECT $sqlToks AS toks FROM documents
       |  WHERE doc_id % GREATEST($KnRefMod,
       |    (SELECT COUNT(1) FROM documents) // $KnRefTarget) = 0),
       |urn AS (SELECT GREATEST(CAST(COALESCE(SUM(len(toks)), 0) AS BIGINT), 1)
       |          AS n FROM urtk),
       |uvoc AS (
       |  SELECT w, CAST(COUNT(1) AS BIGINT) AS c_w
       |  FROM (SELECT unnest(toks) AS w FROM urtk) GROUP BY w),
       |uni AS (
       |  SELECT w, CAST(GREATEST(1, (c_w * 1000000) // urn.n) AS BIGINT) AS p_ppm
       |  FROM uvoc CROSS JOIN urn),
       |udtk AS (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |usc AS (
       |  SELECT udtk.doc_id, GREATEST(1, COALESCE(uni.p_ppm, 0)) AS p
       |  FROM udtk LEFT JOIN uni ON udtk.w = uni.w),
       |uagg AS (
       |  SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_tokens,
       |    CAST(SUM($L2M1M - ${sqlL2M("p")}) // COUNT(1) AS BIGINT)
       |      AS uni_mbits
       |  FROM usc GROUP BY doc_id)""".stripMargin

  /** Replays the committed BPE merge table in rank order as nested
    * greedy replaces over a chr(1)-delimited symbol string per word `w`
    * (shared by the txt_bpe_corpus and txt_fertility oracles). */
  private lazy val bpeReplayWordSql: String = {
    val word0 = "chr(1) || array_to_string(list_transform(" +
      "range(1, length(w) + 1), i -> substr(w, i::INT, 1)), chr(1)) || chr(1)"
    val replayed = graft.functions.BpeKernel.Merges.foldLeft(word0) {
      case (acc, (a, b)) =>
        s"replace($acc, chr(1)||'$a'||chr(1)||'$b'||chr(1), chr(1)||'$a$b'||chr(1))"
    }
    "array_to_string(list_filter(string_split(" +
      s"$replayed, chr(1)), x -> x != ''), ' ')"
  }

  /** Oracle for [[bpeTrainMerges]]: the full R-round training replay —
    * word-frequency vocab, per-round overlapping pair counts weighted
    * by word count, lexicographic-tie argmax, and greedy leftmost
    * non-overlapping merge application (`replace` semantics are
    * identical in Spark and DuckDB, verified on the "aaa" overlap
    * case). Generated from the same round count as the operator. */
  private def bpeTrainSql(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT c[i] AS a, c[i+1] AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
         |    SELECT list_filter(string_split(s, chr(1)), x -> x != '') AS c, n
         |    FROM sym${r - 1}) t, unnest(range(1, len(c))) AS u(i)
         |  GROUP BY 1, 2),
         |best$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |sym$r AS (
         |  SELECT replace(s,
         |    chr(1) || (SELECT a FROM best$r) || chr(1) || (SELECT b FROM best$r) || chr(1),
         |    chr(1) || (SELECT a || b FROM best$r) || chr(1)) AS s, n
         |  FROM sym${r - 1})""".stripMargin
    }.mkString(",\n")
    val out = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, a AS sym_a, b AS sym_b, cnt AS n_pairs FROM best$r")
      .mkString("\nUNION ALL ")
    s"""WITH vocab AS (
       |  SELECT w, COUNT(1) AS n
       |  FROM (SELECT unnest($sqlToks) AS w FROM documents) tw GROUP BY 1),
       |sym0 AS (
       |  SELECT chr(1) || array_to_string(
       |    list_transform(range(1, length(w) + 1), i -> substr(w, i::INT, 1)),
       |    chr(1)) || chr(1) AS s, n FROM vocab),
       |$stages
       |$out""".stripMargin
  }
  /** Shared training-replay CTEs for [[wordpieceTrainMerges]] /
    * [[wordpieceCorpusStats]] oracles: the [[bpeTrainSql]] round
    * structure with the likelihood argmax — per round, unit counts
    * (u$r) and overlapping pair counts (p$r) from the same symbol
    * split, the milli-log2 score join (sc$r), the
    * (score DESC, a, b) argmax (best$r), and the greedy leftmost
    * merge (sym$r). All counts are BIGINT and all scores [[sqlL2M]]
    * integers, so every argmax replays bit-identically. */
  private def wpTrainCtes(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      s"""cl$r AS MATERIALIZED (
         |  SELECT list_filter(string_split(s, chr(1)), x -> x != '') AS c, n
         |  FROM sym${r - 1}),
         |u$r AS (
         |  SELECT u AS sym, CAST(SUM(n) AS BIGINT) AS cu
         |  FROM (SELECT unnest(c) AS u, n FROM cl$r) GROUP BY 1),
         |p$r AS (
         |  SELECT c[i] AS a, c[i+1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM cl$r t, unnest(range(1, len(c))) AS u(i)
         |  GROUP BY 1, 2),
         |sc$r AS (
         |  SELECT p.a, p.b, p.cnt,
         |    (${sqlL2M("p.cnt")} - ${sqlL2M("ua.cu")} - ${sqlL2M("ub.cu")})::BIGINT
         |      AS score_milli
         |  FROM p$r p JOIN u$r ua ON ua.sym = p.a JOIN u$r ub ON ub.sym = p.b),
         |best$r AS (
         |  SELECT a, b, cnt, score_milli FROM sc$r
         |  ORDER BY score_milli DESC, a ASC, b ASC LIMIT 1),
         |sym$r AS (
         |  SELECT replace(s,
         |    chr(1) || (SELECT a FROM best$r) || chr(1) || (SELECT b FROM best$r) || chr(1),
         |    chr(1) || (SELECT a || b FROM best$r) || chr(1)) AS s, n
         |  FROM sym${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""vocab AS MATERIALIZED (
       |  SELECT w, COUNT(1) AS n
       |  FROM (SELECT unnest($sqlToks) AS w FROM documents) tw GROUP BY 1),
       |sym0 AS (
       |  SELECT chr(1) || array_to_string(
       |    list_transform(range(1, length(w) + 1), i -> substr(w, i::INT, 1)),
       |    chr(1)) || chr(1) AS s, n FROM vocab),
       |$stages""".stripMargin
  }

  /** Oracle for [[wordpieceTrainMerges]]: the full R-round replay. */
  private def wpTrainSql(rounds: Int): String = {
    val out = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, a AS sym_a, b AS sym_b, " +
        s"cnt AS n_pairs, score_milli FROM best$r")
      .mkString("\nUNION ALL ")
    s"WITH ${wpTrainCtes(rounds)}\n$out"
  }

  /** Oracle for [[wordpieceCorpusStats]]: replays training, collects
    * the merge-product vocab (wpv), then replays the greedy
    * longest-match walk position-unrolled (g0..g$W: each step's
    * `ROW_NUMBER() OVER (PARTITION BY w ORDER BY l DESC)` picks the
    * longest matching candidate; `u.l = 1 OR ... IN wpv` encodes the
    * implicit single-char coverage floor), with the long-word
    * per-character fallback, joined back to per-doc occurrences. */
  private def wpCorpusSql(rounds: Int): String = {
    val W = WpMaxWordLen; val P = WpMaxPieceLen
    val steps = (1 to W).map { k =>
      s"""g$k AS MATERIALIZED (
         |  SELECT w, pos, np FROM g${k - 1} WHERE pos > length(w)
         |  UNION ALL
         |  SELECT w, pos + l AS pos, np + 1 AS np FROM (
         |    SELECT w, pos, np, l,
         |      ROW_NUMBER() OVER (PARTITION BY w ORDER BY l DESC) AS rn
         |    FROM (
         |      SELECT g.w, g.pos, g.np, u.l
         |      FROM g${k - 1} g, unnest(range(1, ${P + 1})) AS u(l)
         |      WHERE g.pos <= length(g.w) AND u.l <= length(g.w) - g.pos + 1
         |        AND (u.l = 1 OR
         |             substr(g.w, g.pos::INT, u.l::INT) IN (SELECT piece FROM wpv))))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val wpv = (1 to rounds).map(r => s"SELECT a || b AS piece FROM best$r")
      .mkString("\n  UNION ")
    s"""WITH ${wpTrainCtes(rounds)},
       |wpv AS MATERIALIZED (
       |  $wpv),
       |cw AS MATERIALIZED (SELECT doc_id, unnest($sqlToks) AS w FROM documents),
       |dws AS (SELECT DISTINCT w FROM cw WHERE length(w) <= $W),
       |g0 AS (SELECT w, 1::BIGINT AS pos, 0::BIGINT AS np FROM dws),
       |$steps,
       |ws AS (
       |  SELECT w, np FROM g$W
       |  UNION ALL
       |  SELECT w, length(w)::BIGINT AS np
       |  FROM (SELECT DISTINCT w FROM cw WHERE length(w) > $W)),
       |agg AS (
       |  SELECT c.doc_id, COUNT(1)::BIGINT AS n_tokens,
       |    SUM(s.np)::BIGINT AS n_pieces,
       |    SUM(length(c.w))::BIGINT AS n_chars
       |  FROM cw c JOIN ws s ON s.w = c.w GROUP BY 1)
       |SELECT d.doc_id, COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
       |  COALESCE(a.n_pieces, 0)::BIGINT AS n_pieces,
       |  COALESCE(a.n_chars, 0)::BIGINT AS n_chars,
       |  (COALESCE(a.n_pieces, 0) * 1000000 //
       |    GREATEST(COALESCE(a.n_chars, 0), 1))::BIGINT AS compress_ppm
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
  }

  private def sqlScore(words: Seq[String]) =
    s"len(list_filter($sqlToks, x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"

  private val oracleBase: Map[String, String] = Map(
    "txt_perceptron_train" -> perceptronOracle(PercF, PercRounds, "train"),
    "txt_perceptron_score" -> perceptronOracle(PercF, PercRounds, "score"),
    "txt_perceptron_pr" -> perceptronOracle(PercF, PercRounds, "pr"),
    "txt_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len($sqlToks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct($sqlToks)) AS BIGINT) AS n_distinct_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(list_reduce(list_prepend(0::BIGINT, list_transform($sqlToks, x -> length(x)::BIGINT)), (a,b) -> a+b) AS DOUBLE)
         |    / CAST(greatest(len($sqlToks), 1) AS DOUBLE) AS mean_token_len
         |FROM documents""".stripMargin,

    // Verbatim replay of tokenEntropy's integer identity
    // H·N = N·L(N) − Σ nᵢ·L(nᵢ) with L = the unigram trainer's
    // milli-log2; the final div is BIGINT integral division on both
    // engines.
    "txt_entropy" ->
      s"""WITH cnt AS (
         |  SELECT doc_id, tok, COUNT(1) AS n
         |  FROM (SELECT doc_id, unnest($sqlToks) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    COUNT(1) AS n_distinct,
         |    CAST(SUM(n * ${sqlL2M("n")}) AS BIGINT) AS s_nl
         |  FROM cnt GROUP BY 1)
         |SELECT doc_id, n_tokens, CAST(n_distinct AS BIGINT) AS n_distinct,
         |  CAST((n_tokens * ${sqlL2M("n_tokens")} - s_nl) // n_tokens AS BIGINT)
         |    AS ent_mbits
         |FROM per""".stripMargin,

    "txt_quality" ->
      s"""SELECT doc_id,
         |  ${sqlScore(stopEn)}::DOUBLE / greatest(len($sqlToks),1)::DOUBLE AS stopword_ratio,
         |  len(regexp_extract_all(text,'[.,!?;:]'))::DOUBLE / greatest(length(text),1)::DOUBLE AS punct_ratio,
         |  len(regexp_extract_all(text,'[A-Z]'))::DOUBLE / greatest(length(text),1)::DOUBLE AS upper_ratio,
         |  ROUND(
         |    (${sqlScore(stopEn)}::DOUBLE / greatest(len($sqlToks),1)::DOUBLE) * 0.5
         |    + least((list_reduce(list_prepend(0::BIGINT, list_transform($sqlToks, x -> length(x)::BIGINT)), (a,b) -> a+b)::DOUBLE
         |             / greatest(len($sqlToks),1)::DOUBLE) / 10.0, 1.0) * 0.3
         |    + (1.0 - len(regexp_extract_all(text,'[.,!?;:]'))::DOUBLE / greatest(length(text),1)::DOUBLE) * 0.2,
         |    6) AS quality_score
         |FROM documents""".stripMargin,

    "txt_langid" ->
      s"""SELECT doc_id, lang AS labeled_lang,
         |  CAST(${sqlScore(Seq("the", "and", "of", "to", "is"))} AS BIGINT) AS en_score,
         |  CAST(${sqlScore(Seq("der", "die", "und", "ist", "das"))} AS BIGINT) AS de_score,
         |  CAST(${sqlScore(Seq("le", "les", "et", "est", "une"))} AS BIGINT) AS fr_score,
         |  CAST(${sqlScore(Seq("el", "los", "y", "es", "una"))} AS BIGINT) AS es_score,
         |  CASE
         |    WHEN ${sqlScore(Seq("the", "and", "of", "to", "is"))} >= greatest(${sqlScore(Seq("der", "die", "und", "ist", "das"))}, ${sqlScore(Seq("le", "les", "et", "est", "une"))}, ${sqlScore(Seq("el", "los", "y", "es", "una"))})
         |         AND ${sqlScore(Seq("the", "and", "of", "to", "is"))} > 0 THEN 'en'
         |    WHEN ${sqlScore(Seq("der", "die", "und", "ist", "das"))} >= greatest(${sqlScore(Seq("le", "les", "et", "est", "une"))}, ${sqlScore(Seq("el", "los", "y", "es", "una"))})
         |         AND ${sqlScore(Seq("der", "die", "und", "ist", "das"))} > 0 THEN 'de'
         |    WHEN ${sqlScore(Seq("le", "les", "et", "est", "une"))} >= ${sqlScore(Seq("el", "los", "y", "es", "una"))}
         |         AND ${sqlScore(Seq("le", "les", "et", "est", "une"))} > 0 THEN 'fr'
         |    WHEN ${sqlScore(Seq("el", "los", "y", "es", "una"))} > 0 THEN 'es'
         |    ELSE 'und' END AS pred_lang
         |FROM documents""".stripMargin,

    "txt_langid_ngram" -> {
      val sqlTg = "list_distinct(list_transform(range(1, greatest(length(lower(text)) - 2, 0) + 1), i -> substr(lower(text), i::INT, 3)))"
      def score(profile: Seq[String]) =
        s"len(list_intersect($sqlTg, [${profile.map(p => s"'$p'").mkString(",")}]))"
      val Seq(en, de, fr, es) = TrigramProfiles.map(p => score(p._2))
      s"""SELECT doc_id,
         |  CAST($en AS BIGINT) AS en_tri, CAST($de AS BIGINT) AS de_tri,
         |  CAST($fr AS BIGINT) AS fr_tri, CAST($es AS BIGINT) AS es_tri,
         |  CASE
         |    WHEN $en >= greatest($de, $fr, $es) AND $en > 0 THEN 'en'
         |    WHEN $de >= greatest($fr, $es) AND $de > 0 THEN 'de'
         |    WHEN $fr >= $es AND $fr > 0 THEN 'fr'
         |    WHEN $es > 0 THEN 'es'
         |    ELSE 'und' END AS pred_lang
         |FROM documents""".stripMargin
    },

    "bpe_train_merges" -> bpeTrainSql(BpeTrainRounds),
    "wordpiece_train" -> wpTrainSql(WpTrainRounds),
    "txt_wordpiece_corpus" -> wpCorpusSql(WpTrainRounds),
    "unigram_train" -> unigramOracle(UniRounds, "train"),
    "txt_unigram_corpus" -> unigramOracle(UniRounds, "corpus"),

    "txt_bpe_corpus" ->
      s"""SELECT doc_id,
         |  CAST(CASE WHEN s = '' THEN 0 ELSE len(string_split(s, ' ')) END AS BIGINT) AS n_bpe,
         |  s AS bpe_text
         |FROM (SELECT doc_id,
         |  array_to_string(list_transform($sqlToks, w -> $bpeReplayWordSql), ' ') AS s
         |  FROM documents)""".stripMargin,

    // Gopher-rules gate: four integer-exact structural rules per doc,
    // rolled up per source (the drop-reason monitor table)
    // the inverted-index artifact: (term, doc) tf → per-term df/cf +
    // head posting (tf DESC, doc_id ASC) + the committed integer idf
    // the term-stats artifact recomputed from parquet truth: df =
    // distinct docs per term, idf_milli = textIndexBuild's exact
    // integer Robertson ratio
    "serve_text_index_write" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |per AS (
         |  SELECT doc_id, tok
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tk)
         |  GROUP BY 1, 2),
         |dfq AS (SELECT tok AS term, COUNT(1) AS df FROM per GROUP BY 1),
         |n AS (SELECT COUNT(1) AS n_docs FROM documents)
         |SELECT term, CAST(df AS BIGINT) AS df,
         |  CAST(((2 * n.n_docs - 2 * df + 1) * 1000) // (2 * df + 1)
         |    AS BIGINT) AS idf_milli
         |FROM dfq, n""".stripMargin,

    // text delete lifecycle: the write oracle recomputed from
    // truth-minus-contaminated (the decontaminate flagged set)
    "serve_text_index_delete" ->
      s"""WITH del AS (${graft.ops.DedupOps.sqlContaminatedIds}),
         |docs2 AS (
         |  SELECT * FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM del)),
         |tk AS (SELECT doc_id, $sqlToks AS toks FROM docs2),
         |per AS (
         |  SELECT doc_id, tok
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tk)
         |  GROUP BY 1, 2),
         |dfq AS (SELECT tok AS term, COUNT(1) AS df FROM per GROUP BY 1),
         |n AS (SELECT COUNT(1) AS n_docs FROM docs2)
         |SELECT term, CAST(df AS BIGINT) AS df,
         |  CAST(((2 * n.n_docs - 2 * df + 1) * 1000) // (2 * df + 1)
         |    AS BIGINT) AS idf_milli
         |FROM dfq, n""".stripMargin,

    "serve_text_index_append" ->
      s"""WITH base AS (SELECT * FROM documents WHERE doc_id % 10 != 7),
         |tok AS (SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |p AS (
         |  SELECT term, doc_id, COUNT(1)::BIGINT AS tf
         |  FROM tok GROUP BY 1, 2),
         |live AS (
         |  SELECT term, COUNT(1)::BIGINT AS df_live,
         |    CAST(SUM(tf) AS BIGINT) AS tf_sum
         |  FROM p GROUP BY 1),
         |btok AS (SELECT doc_id, unnest($sqlToks) AS term FROM base),
         |bp AS (SELECT term, doc_id FROM btok GROUP BY 1, 2),
         |bdf AS (SELECT term, COUNT(1) AS df FROM bp GROUP BY 1),
         |bn AS (SELECT COUNT(1) AS n FROM base)
         |SELECT l.term, l.df_live, l.tf_sum,
         |  CAST(COALESCE(b.df, 0) AS BIGINT) AS df_frozen,
         |  CAST(COALESCE(
         |    ((2 * bn.n - 2 * b.df + 1) * 1000) // (2 * b.df + 1), 0)
         |    AS BIGINT) AS idf_milli
         |FROM live l LEFT JOIN bdf b ON l.term = b.term, bn""".stripMargin,

    "serve_text_index" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |p AS (
         |  SELECT term, doc_id, COUNT(1)::BIGINT AS tf
         |  FROM tok GROUP BY 1, 2),
         |nd AS (SELECT COUNT(1) AS n FROM documents),
         |top AS (
         |  SELECT term, doc_id AS top_doc_id, tf AS top_tf,
         |    ROW_NUMBER() OVER (PARTITION BY term
         |      ORDER BY tf DESC, doc_id ASC) AS rn
         |  FROM p),
         |agg AS (
         |  SELECT term, COUNT(1)::BIGINT AS df,
         |    CAST(SUM(tf) AS BIGINT) AS cf
         |  FROM p GROUP BY 1)
         |SELECT a.term, a.df, a.cf, t.top_doc_id, t.top_tf,
         |  CAST(((2 * nd.n - 2 * a.df + 1) * 1000) // (2 * a.df + 1)
         |    AS BIGINT) AS idf_milli
         |FROM agg a JOIN top t ON a.term = t.term AND t.rn = 1, nd""".stripMargin,

    // per-doc Gopher keep decision (the streaming-legal projection);
    // rule bodies identical to txt_gopher_gate's CTE
    "stream_quality_keep" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len($sqlToks) AS n_tok,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform($sqlToks, x -> CAST(length(x) AS BIGINT))),
         |      (a, b) -> a + b) AS sum_wlen,
         |    len(list_filter($sqlToks,
         |      x -> list_contains(['the','and','of','to','is'], x))) AS n_stop,
         |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         |    length(text) AS n_chars
         |  FROM documents),
         |r AS (
         |  SELECT doc_id,
         |    (n_tok >= 5 AND n_tok <= 100000) AS r_words,
         |    (sum_wlen >= n_tok * 3 AND sum_wlen <= n_tok * 10) AS r_wlen,
         |    (n_stop >= 1) AS r_stop,
         |    (n_punct * 10 <= n_chars) AS r_punct
         |  FROM f)
         |SELECT doc_id, r_words, r_wlen, r_stop, r_punct,
         |  (r_words AND r_wlen AND r_stop AND r_punct) AS keep
         |FROM r""".stripMargin,

    "txt_gopher_gate" ->
      s"""WITH f AS (
         |  SELECT source,
         |    len($sqlToks) AS n_tok,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform($sqlToks, x -> CAST(length(x) AS BIGINT))),
         |      (a, b) -> a + b) AS sum_wlen,
         |    len(list_filter($sqlToks,
         |      x -> list_contains(['the','and','of','to','is'], x))) AS n_stop,
         |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         |    length(text) AS n_chars
         |  FROM documents),
         |r AS (
         |  SELECT source,
         |    (n_tok >= 5 AND n_tok <= 100000) AS r_words,
         |    (sum_wlen >= n_tok * 3 AND sum_wlen <= n_tok * 10) AS r_wlen,
         |    (n_stop >= 1) AS r_stop,
         |    (n_punct * 10 <= n_chars) AS r_punct
         |  FROM f)
         |SELECT source, COUNT(1)::BIGINT AS n_docs,
         |  CAST(SUM(CASE WHEN r_words AND r_wlen AND r_stop AND r_punct
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST(SUM(CASE WHEN NOT r_words THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_words,
         |  CAST(SUM(CASE WHEN NOT r_wlen THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_wlen,
         |  CAST(SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop,
         |  CAST(SUM(CASE WHEN NOT r_punct THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_punct
         |FROM r GROUP BY source""".stripMargin,

    // per-language tokenizer health: the same BPE replay chain, rolled
    // up to lang-level fertility/compression ratios in exact ppm
    "txt_fertility" ->
      s"""WITH per AS (
         |  SELECT lang,
         |    CAST(len($sqlToks) AS BIGINT) AS n_words,
         |    CAST(CASE WHEN s = '' THEN 0
         |         ELSE len(string_split(s, ' ')) END AS BIGINT) AS n_bpe,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM (SELECT lang, text,
         |    array_to_string(list_transform($sqlToks, w -> $bpeReplayWordSql), ' ') AS s
         |    FROM documents))
         |SELECT lang, COUNT(1)::BIGINT AS n_docs,
         |  CAST(SUM(n_words) AS BIGINT) AS n_words,
         |  CAST(SUM(n_bpe) AS BIGINT) AS n_bpe,
         |  CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
         |  CAST(CAST(SUM(n_bpe) AS BIGINT) * 1000000
         |    // GREATEST(CAST(SUM(n_words) AS BIGINT), 1) AS BIGINT) AS fertility_ppm,
         |  CAST(CAST(SUM(n_bytes) AS BIGINT) * 1000000
         |    // GREATEST(CAST(SUM(n_bpe) AS BIGINT), 1) AS BIGINT) AS bytes_per_tok_ppm
         |FROM per GROUP BY lang""".stripMargin,

    "txt_bpe_encode" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(n AS BIGINT) AS n_tokens,
        |  toks AS tokens
        |FROM (VALUES
        |  (1, 10, 't h e customer table join s a small batch'),
        |  (2, 7, 'filter order b y key hash value'),
        |  (3, 13, 'u n s e e n z e b r a q q'),
        |  (4, 8, 'merge s or t e d vector s'),
        |  (5, 0, ''),
        |  (6, 5, 'customer customer line line data')
        |) AS v(id, n, toks)""".stripMargin,

    "txt_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(0::BIGINT,
         |      list_transform($sqlToks,
         |        x -> ('0x' || substr(md5(x),1,15))::BIGINT % ${HashMod})),
         |    (acc, h) -> (acc * 131 + h) % ${HashMod}) AS fingerprint
         |FROM documents""".stripMargin,

    "txt_top_terms" ->
      s"""SELECT t.term, COUNT(1) AS n
         |FROM (SELECT unnest($sqlToks) AS term FROM documents) t
         |GROUP BY t.term
         |ORDER BY n DESC, t.term ASC
         |LIMIT 50""".stripMargin,

    "txt_bm25" -> {
      val termList = Bm25Terms.map(t0 => s"'$t0'").mkString(", ")
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |n AS (SELECT COUNT(1) AS n_docs FROM documents),
         |tt AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n_tok FROM tk),
         |dld AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk),
         |tf AS (
         |  SELECT doc_id, tok, COUNT(1) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tk)
         |  WHERE tok IN ($termList)
         |  GROUP BY 1, 2),
         |dfq AS (SELECT tok, COUNT(1) AS df FROM tf GROUP BY 1),
         |c AS (
         |  SELECT t.doc_id, dld.dl,
         |    ((((2 * n.n_docs - 2 * d.df + 1) * 1000) // (2 * d.df + 1))
         |       * 22 * tt.n_tok * t.tf)
         |      // (10 * tt.n_tok * t.tf + 3 * tt.n_tok + 9 * dld.dl * n.n_docs)
         |      AS contrib_u
         |  FROM tf t JOIN dfq d USING (tok) JOIN dld USING (doc_id)
         |  CROSS JOIN n CROSS JOIN tt)
         |SELECT doc_id, MAX(dl) AS dl, COUNT(1) AS n_hit_terms,
         |  CAST(SUM(contrib_u) AS BIGINT) AS score_u
         |FROM c GROUP BY doc_id
         |ORDER BY score_u DESC, doc_id ASC
         |LIMIT $Bm25TopK""".stripMargin
    },

    "txt_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
         |tf AS (
         |  SELECT doc_id, tok, COUNT(1) AS tf FROM toks
         |  WHERE len(tok) >= 3 GROUP BY 1, 2),
         |dfq AS (SELECT tok, COUNT(1) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(1) AS n_docs FROM documents)
         |SELECT doc_id, tok, tf, df, score_ppm, rk FROM (
         |  SELECT t.doc_id, t.tok, CAST(t.tf AS BIGINT) AS tf,
         |    CAST(d.df AS BIGINT) AS df,
         |    CAST((t.tf * n.n_docs * 1000000) // d.df AS BIGINT) AS score_ppm,
         |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
         |      ORDER BY (t.tf * n.n_docs * 1000000) // d.df DESC, t.tok ASC) AS rk
         |  FROM tf t JOIN dfq d USING (tok) CROSS JOIN n) s
         |WHERE rk <= 3""".stripMargin,

    "txt_pmi_bigrams" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |n AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n_tok FROM tk),
         |uni AS (
         |  SELECT w, CAST(COUNT(1) AS BIGINT) AS c_w
         |  FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
         |bg AS (
         |  SELECT toks[i] AS w1, toks[i+1] AS w2
         |  FROM tk, unnest(range(1, len(toks))) AS t(i)),
         |pairs AS (
         |  SELECT w1, w2, CAST(COUNT(1) AS BIGINT) AS c_ab FROM bg GROUP BY w1, w2
         |  HAVING COUNT(1) >= 5)
         |SELECT w1, w2, c_ab, u1.c_w AS c_a, u2.c_w AS c_b,
         |  CAST((c_ab * n.n_tok * 1000000) // (u1.c_w * u2.c_w) AS BIGINT) AS score_ppm
         |FROM pairs JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w CROSS JOIN n
         |ORDER BY score_ppm DESC, w1, w2 LIMIT 50""".stripMargin,

    "txt_lm_surprise" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |n AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n_tok FROM tk),
         |bg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
         |  FROM tk, unnest(range(1, len(toks))) AS t(i)),
         |uni AS (
         |  SELECT w, CAST(COUNT(1) AS BIGINT) AS c_w
         |  FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w),
         |bi AS (
         |  SELECT w1, w2, CAST(COUNT(1) AS BIGINT) AS c_ab
         |  FROM bg GROUP BY w1, w2 HAVING COUNT(1) >= 2),
         |scored AS (
         |  SELECT bg.doc_id,
         |    CASE WHEN bi.c_ab IS NOT NULL THEN (u1.c_w * 1000000) // bi.c_ab
         |         ELSE (n.n_tok * 10000000) // u2.c_w END AS s
         |  FROM bg
         |  JOIN uni u1 ON bg.w1 = u1.w
         |  JOIN uni u2 ON bg.w2 = u2.w
         |  LEFT JOIN bi ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
         |  CROSS JOIN n),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(s) // COUNT(1) AS BIGINT) AS avg_surprise_ppm
         |  FROM scored GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(a.n_bigrams, 0::BIGINT) AS n_bigrams,
         |  a.avg_surprise_ppm
         |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "lm_kn_train" ->
      s"""WITH $knTrainCtes
         |SELECT w1, w2, c_ab, p_ppm FROM model""".stripMargin,

    // knScore: the train CTEs verbatim, then the full-corpus bigram
    // scan joined through the seen-bigram / seen-context / continuation
    // backoff cascade; surprise in exact milli-log2
    "txt_kn_ppl" ->
      s"""WITH $knTrainCtes,
         |lam AS (
         |  SELECT w1, CAST((3 * n1_fwd * 250000) // c_a AS BIGINT) AS lam_ppm
         |  FROM ctx),
         |cnt AS (
         |  SELECT w2, CAST((n1_bwd * 1000000) // nt.n_types AS BIGINT) AS cont_ppm
         |  FROM cont CROSS JOIN nt),
         |dtk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |dbg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
         |  FROM dtk, unnest(range(1, len(toks))) AS t(i)),
         |sc AS (
         |  SELECT dbg.doc_id, GREATEST(1,
         |    CASE WHEN m.p_ppm IS NOT NULL THEN m.p_ppm
         |         WHEN l.lam_ppm IS NOT NULL
         |           THEN (l.lam_ppm * COALESCE(c.cont_ppm, 0)) // 1000000
         |         ELSE COALESCE(c.cont_ppm, 0) END) AS p
         |  FROM dbg
         |  LEFT JOIN model m ON dbg.w1 = m.w1 AND dbg.w2 = m.w2
         |  LEFT JOIN lam l ON dbg.w1 = l.w1
         |  LEFT JOIN cnt c ON dbg.w2 = c.w2),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_bigrams,
         |    CAST(SUM($L2M1M - ${sqlL2M("p")}) // COUNT(1) AS BIGINT)
         |      AS ppl_mbits
         |  FROM sc GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(a.n_bigrams, 0::BIGINT) AS n_bigrams,
         |  a.ppl_mbits
         |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "txt_uniref_ppl" ->
      s"""WITH $uniRefCtes
         |SELECT d.doc_id,
         |  coalesce(a.n_tokens, 0::BIGINT) AS n_tokens,
         |  a.uni_mbits
         |FROM documents d LEFT JOIN uagg a USING (doc_id)""".stripMargin,

    // rhoSelect: the two reference-LM replays joined per doc, excess
    // = uni − kn, keep iff strictly above the corpus mean (scalar
    // subquery, truncating div — matches the driver-side Long div)
    "curate_rho_select" ->
      s"""WITH $knTrainCtes,
         |lam AS (
         |  SELECT w1, CAST((3 * n1_fwd * 250000) // c_a AS BIGINT) AS lam_ppm
         |  FROM ctx),
         |cnt AS (
         |  SELECT w2, CAST((n1_bwd * 1000000) // nt.n_types AS BIGINT) AS cont_ppm
         |  FROM cont CROSS JOIN nt),
         |dtk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |dbg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
         |  FROM dtk, unnest(range(1, len(toks))) AS t(i)),
         |sc AS (
         |  SELECT dbg.doc_id, GREATEST(1,
         |    CASE WHEN m.p_ppm IS NOT NULL THEN m.p_ppm
         |         WHEN l.lam_ppm IS NOT NULL
         |           THEN (l.lam_ppm * COALESCE(c.cont_ppm, 0)) // 1000000
         |         ELSE COALESCE(c.cont_ppm, 0) END) AS p
         |  FROM dbg
         |  LEFT JOIN model m ON dbg.w1 = m.w1 AND dbg.w2 = m.w2
         |  LEFT JOIN lam l ON dbg.w1 = l.w1
         |  LEFT JOIN cnt c ON dbg.w2 = c.w2),
         |kagg AS (
         |  SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_bigrams,
         |    CAST(SUM($L2M1M - ${sqlL2M("p")}) // COUNT(1) AS BIGINT)
         |      AS ppl_mbits
         |  FROM sc GROUP BY doc_id),
         |$uniRefCtes,
         |pd AS (
         |  SELECT k.doc_id, k.ppl_mbits AS kn_mbits, u.uni_mbits,
         |    u.uni_mbits - k.ppl_mbits AS excess_mbits
         |  FROM kagg k JOIN uagg u ON k.doc_id = u.doc_id
         |  WHERE k.n_bigrams > 0 AND u.n_tokens > 0)
         |SELECT doc_id, kn_mbits, uni_mbits,
         |  CAST(excess_mbits AS BIGINT) AS excess_mbits,
         |  (excess_mbits > (SELECT CAST(SUM(excess_mbits) AS BIGINT)
         |    // GREATEST(COUNT(1), 1) FROM pd)) AS keep
         |FROM pd""".stripMargin,

    // doremiWeights: the txt_kn_ppl replay (strong arm) + the
    // txt_uniref_ppl replay (weak arm) rolled up per domain, then the
    // integer EG step: min-shifted excess → power-of-two shift ×
    // linear interpolation → ppm normalization over the domain rows
    "mix_doremi" ->
      s"""WITH $knTrainCtes,
         |lam AS (
         |  SELECT w1, CAST((3 * n1_fwd * 250000) // c_a AS BIGINT) AS lam_ppm
         |  FROM ctx),
         |cnt AS (
         |  SELECT w2, CAST((n1_bwd * 1000000) // nt.n_types AS BIGINT) AS cont_ppm
         |  FROM cont CROSS JOIN nt),
         |dtk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |dbg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
         |  FROM dtk, unnest(range(1, len(toks))) AS t(i)),
         |sc AS (
         |  SELECT dbg.doc_id, GREATEST(1,
         |    CASE WHEN m.p_ppm IS NOT NULL THEN m.p_ppm
         |         WHEN l.lam_ppm IS NOT NULL
         |           THEN (l.lam_ppm * COALESCE(c.cont_ppm, 0)) // 1000000
         |         ELSE COALESCE(c.cont_ppm, 0) END) AS p
         |  FROM dbg
         |  LEFT JOIN model m ON dbg.w1 = m.w1 AND dbg.w2 = m.w2
         |  LEFT JOIN lam l ON dbg.w1 = l.w1
         |  LEFT JOIN cnt c ON dbg.w2 = c.w2),
         |kagg AS (
         |  SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_bigrams,
         |    CAST(SUM($L2M1M - ${sqlL2M("p")}) // COUNT(1) AS BIGINT)
         |      AS ppl_mbits
         |  FROM sc GROUP BY doc_id),
         |$uniRefCtes,
         |pd AS (
         |  SELECT d.source AS domain, k.ppl_mbits, u.uni_mbits
         |  FROM documents d
         |  JOIN kagg k ON d.doc_id = k.doc_id
         |  JOIN uagg u ON d.doc_id = u.doc_id),
         |dom AS (
         |  SELECT domain, CAST(COUNT(1) AS BIGINT) AS n_docs,
         |    CAST(SUM(ppl_mbits) // COUNT(1) AS BIGINT) AS kn_mbits,
         |    CAST(SUM(uni_mbits) // COUNT(1) AS BIGINT) AS uni_mbits
         |  FROM pd GROUP BY domain),
         |sh AS (
         |  SELECT *, uni_mbits - kn_mbits AS excess_mbits,
         |    (uni_mbits - kn_mbits)
         |      - MIN(uni_mbits - kn_mbits) OVER () AS shift_mbits
         |  FROM dom),
         |wr AS (
         |  SELECT *, (1::BIGINT << (shift_mbits // $DoremiTauMbits))
         |    * ($DoremiTauMbits + shift_mbits % $DoremiTauMbits) AS w_raw
         |  FROM sh)
         |SELECT domain AS source, n_docs, kn_mbits, uni_mbits,
         |  CAST(excess_mbits AS BIGINT) AS excess_mbits,
         |  CAST((w_raw * 1000000) // (SUM(w_raw) OVER ()) AS BIGINT)
         |    AS weight_ppm
         |FROM wr""".stripMargin,

    // qualityEnsemble: the txt_kn_ppl replay (train CTEs + cascade)
    // composed with the per-doc Gopher flags, the repetition screen,
    // and reference-tercile tier thresholds as exact order statistics
    "curate_quality_ensemble" ->
      s"""WITH $knTrainCtes,
         |lam AS (
         |  SELECT w1, CAST((3 * n1_fwd * 250000) // c_a AS BIGINT) AS lam_ppm
         |  FROM ctx),
         |cnt AS (
         |  SELECT w2, CAST((n1_bwd * 1000000) // nt.n_types AS BIGINT) AS cont_ppm
         |  FROM cont CROSS JOIN nt),
         |dtk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |dbg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
         |  FROM dtk, unnest(range(1, len(toks))) AS t(i)),
         |sc AS (
         |  SELECT dbg.doc_id, GREATEST(1,
         |    CASE WHEN m.p_ppm IS NOT NULL THEN m.p_ppm
         |         WHEN l.lam_ppm IS NOT NULL
         |           THEN (l.lam_ppm * COALESCE(c.cont_ppm, 0)) // 1000000
         |         ELSE COALESCE(c.cont_ppm, 0) END) AS p
         |  FROM dbg
         |  LEFT JOIN model m ON dbg.w1 = m.w1 AND dbg.w2 = m.w2
         |  LEFT JOIN lam l ON dbg.w1 = l.w1
         |  LEFT JOIN cnt c ON dbg.w2 = c.w2),
         |agg AS (
         |  SELECT doc_id,
         |    CAST(SUM($L2M1M - ${sqlL2M("p")}) // COUNT(1) AS BIGINT)
         |      AS ppl_mbits
         |  FROM sc GROUP BY doc_id),
         |gf AS (
         |  SELECT doc_id, CASE WHEN
         |      (n_tok >= 5 AND n_tok <= 100000)
         |      AND (sum_wlen >= n_tok * 3 AND sum_wlen <= n_tok * 10)
         |      AND (n_stop >= 1) AND (n_punct * 10 <= n_chars)
         |    THEN 1 ELSE 0 END AS gopher_pass
         |  FROM (
         |    SELECT doc_id,
         |      len(toks) AS n_tok,
         |      list_reduce(list_prepend(0::BIGINT,
         |        list_transform(toks, x -> CAST(length(x) AS BIGINT))),
         |        (a, b) -> a + b) AS sum_wlen,
         |      len(list_filter(toks,
         |        x -> list_contains(['the','and','of','to','is'], x))) AS n_stop,
         |      len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         |      length(text) AS n_chars
         |    FROM (SELECT doc_id, text, $sqlToks AS toks FROM documents))),
         |rep AS (
         |  SELECT doc_id, CASE WHEN (n_bg - n_dg) * $RepDupMult <= n_bg
         |    THEN 1 ELSE 0 END AS rep_pass
         |  FROM (
         |    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bg,
         |      CAST(COUNT(1) AS BIGINT) AS n_dg
         |    FROM (SELECT doc_id, g, COUNT(1) AS n
         |          FROM (SELECT doc_id,
         |                  unnest(list_transform(range(1, len(toks)),
         |                    i -> toks[i] || ' ' || toks[i+1])) AS g
         |                FROM dtk)
         |          GROUP BY 1, 2)
         |    GROUP BY 1)),
         |rk AS (
         |  SELECT a.ppl_mbits AS v, ROW_NUMBER() OVER (ORDER BY a.ppl_mbits) AS rn,
         |    COUNT(1) OVER () AS n
         |  FROM agg a
         |  WHERE a.doc_id % GREATEST($KnRefMod,
         |      (SELECT COUNT(1) FROM documents) // $KnRefTarget) = 0
         |    AND a.ppl_mbits IS NOT NULL),
         |th AS (
         |  SELECT MAX(CASE WHEN rn <= (n + 2) // 3 THEN v END) AS t1,
         |    MAX(CASE WHEN rn <= (2 * n + 2) // 3 THEN v END) AS t2
         |  FROM rk)
         |SELECT d.doc_id,
         |  CAST(gf.gopher_pass AS BIGINT) AS gopher_pass,
         |  CAST(COALESCE(rep.rep_pass, 1) AS BIGINT) AS rep_pass,
         |  a.ppl_mbits,
         |  CASE WHEN a.ppl_mbits IS NULL THEN 'na'
         |       WHEN a.ppl_mbits <= th.t1 THEN 'head'
         |       WHEN a.ppl_mbits <= th.t2 THEN 'middle'
         |       ELSE 'tail' END AS ppl_tier,
         |  CAST(CASE WHEN gf.gopher_pass = 1 AND COALESCE(rep.rep_pass, 1) = 1
         |      AND a.ppl_mbits IS NOT NULL AND a.ppl_mbits <= th.t2
         |    THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM documents d
         |JOIN gf USING (doc_id)
         |LEFT JOIN rep USING (doc_id)
         |LEFT JOIN agg a USING (doc_id)
         |CROSS JOIN th""".stripMargin,

    "txt_chunks" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |ch AS (
         |  SELECT doc_id, t.s AS start, toks[t.s : t.s + ${ChunkSize - 1}] AS chunk
         |  FROM tk, unnest(range(1, greatest(len(toks) - $ChunkOverlap, 1) + 1,
         |                        ${ChunkSize - ChunkOverlap})) AS t(s))
         |SELECT doc_id, CAST((start - 1) // ${ChunkSize - ChunkOverlap} AS BIGINT) AS chunk_id,
         |  array_to_string(chunk, ' ') AS chunk_text,
         |  CAST(len(chunk) AS BIGINT) AS n_chunk_tokens
         |FROM ch WHERE len(chunk) > 0""".stripMargin,

    "txt_pack" ->
      s"""WITH tok AS (
         |  SELECT lang AS part, doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cum AS (
         |  SELECT *, SUM(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM tok)
         |SELECT part, CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS pack_id,
         |  COUNT(1) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM cum GROUP BY part, pack_id""".stripMargin,

    "split_train_test" ->
      s"""SELECT doc_id,
         |  CASE WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT % ${HashMod} % 100 < 80 THEN 'train'
         |       WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT % ${HashMod} % 100 < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  source
        |FROM documents""".stripMargin
  )

  /** The confusion audit's oracle composes the committed txt_langid
    * derivation (same stopword profiles, same argmax) with the keyed
    * count + bounded per-true-language window; SUM OVER in DuckDB
    * widens to HUGEINT, so every derived count is cast back. */
  val oracle: Map[String, String] = oracleBase +
    ("txt_langid_confusion" ->
      s"""WITH p AS (${oracleBase("txt_langid")}),
         |g AS (SELECT labeled_lang, pred_lang, COUNT(*) AS n
         |      FROM p GROUP BY 1, 2)
         |SELECT labeled_lang, pred_lang, CAST(n AS BIGINT) AS n,
         |  CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS BIGINT) AS n_true,
         |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY labeled_lang)
         |    AS BIGINT) AS frac_ppm
         |FROM g""".stripMargin)
}

/** Committed inputs for `txt_bpe_encode` — the expected encodings in
  * the oracle were computed by an independent reference implementation
  * of the same merge table ([[graft.functions.BpeKernel.Merges]]). */
object BpeFixtures {
  val rows: Seq[(Int, String)] = Seq(
    (1, "the customer table joins a small batch"),
    (2, "Filter ORDER BY key hash value"),
    (3, "unseen zebra qq"),
    (4, "  merge   sorted vectors  "),
    (5, ""),
    (6, "customercustomer linelinedata"))
}
