package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, cents}
import TextOps.{tokens, HashMod}

/** Corpus-curation operators a production training-data pipeline runs
  * between raw ingest and tokenization: repetition-based quality
  * signals (the Gopher/C4 family), PII redaction, deterministic
  * stratified sampling, and ordered-funnel analysis over event logs.
  *
  * Scale shapes: repetition stats are two keyed aggregations (token
  * and bigram counts partial-aggregate map-side before any shuffle);
  * PII redaction and sampling are pure column expressions (single
  * scan, zero shuffle); the funnel is per-stage keyed joins on
  * user_id. No UDFs, no collects.
  */
object CurationOps {

  // ------------------------------------------------ observed metrics

  /** The corpus health counters both observe variants collect: row
    * count, empty-text count, null-lang count, total chars. */
  private def healthMetrics(textCol: String): Seq[Column] = Seq(
    count(lit(1)).as("n_docs"),
    count(when(length(trim(col(textCol))) === 0, 1)).as("n_empty_text"),
    count(when(col("lang").isNull, 1)).as("n_null_lang"),
    sum(length(col(textCol))).cast("long").as("total_chars"))

  /** Attach single-pass corpus health counters to a BATCH curation
    * frame via `Dataset.observe` (Catalyst CollectMetrics). The
    * metrics ride the SAME scan that produces `df`'s output — at
    * 100 TB that is the difference between "data-quality dashboard for
    * free" and a second full pass over the corpus. Read the values
    * from the returned [[org.apache.spark.sql.Observation]] after any
    * action on the frame. (Observation handles are batch-only in
    * Spark — use [[observedHealthStream]] on a stream.) */
  def observedHealth(docs: DataFrame, textCol: String = "text")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("corpus_health")
    (docs.observe(obs, healthMetrics(textCol).head,
      healthMetrics(textCol).tail: _*), obs)
  }

  /** Streaming variant: same counters through the named-observation
    * overload (the only one streams support); each microbatch's values
    * surface as `StreamingQueryProgress.observedMetrics("corpus_health")`
    * — per-batch ingest health without a second stateful operator. */
  def observedHealthStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.observe("corpus_health", healthMetrics(textCol).head,
      healthMetrics(textCol).tail: _*)

  // ------------------------------------------------- repetition stats

  /** Word bigrams of a token array ("a b", "b c", ...). */
  private def bigrams(w: Column): Column =
    when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1), i =>
        concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Gopher-style repetition signals per document:
    * `top_tok_n` / `top_bigram_n` — occurrences of the most frequent
    * token / bigram; `dup_bigram_frac` — fraction of bigram slots that
    * repeat an earlier bigram; `top_bigram_frac` — fraction of tokens
    * covered by the most frequent bigram. High values flag the
    * boilerplate / TEMPLATE / keyword-stuffing documents every corpus
    * filter drops before training. */
  def repetitionStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col(textCol)).as("w"))
    val uni = base.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(sum("n").as("n_tokens"),
        count(lit(1)).as("n_distinct_toks"), max("n").as("top_tok_n"))
    val bi = base.select(col("doc_id"), explode(bigrams(col("w"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(sum("n").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"), max("n").as("top_bigram_n"))
    docs.select("doc_id")
      .join(uni, Seq("doc_id"), "left")
      .join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct_toks"), lit(0L)).as("n_distinct_toks"),
        coalesce(col("top_tok_n"), lit(0L)).as("top_tok_n"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") > 0,
          (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
            col("n_bigrams").cast("double")).otherwise(0.0))
      .withColumn("top_bigram_frac",
        when(col("n_tokens") > 0,
          (col("top_bigram_n") * 2L).cast("double") /
            col("n_tokens").cast("double")).otherwise(0.0))
  }

  // ------------------------------------------------------ PII redaction

  /** RE2-and-Java-compatible patterns (no backreferences / lookaround,
    * so Spark and DuckDB compile them identically). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Scrub emails → `<EMAIL>`, IPv4s → `<IP>`, NNN-NNNN phones →
    * `<PHONE>` (in that fixed order — IPs before phones so a dotted
    * quad can never be half-eaten as a phone), and count each class
    * on the ORIGINAL text so counts are order-independent. */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_ips", regexp_count(col(textCol), lit(Ipv4Re)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRe)))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))

  // ------------------------------------------- deterministic sampling

  /** Per-stratum keep-threshold out of 10,000 — purchase kept fully,
    * high-volume views downsampled hard (the usual event-log shape). */
  val SampleThresholds: Seq[(String, Long)] =
    Seq("view" -> 500L, "click" -> 2000L, "signup" -> 5000L,
      "error" -> 1000L, "purchase" -> 10000L)

  /** Deterministic bucket in [0, 10000): md5 of a salted key, like
    * [[TextOps]] split_train_test — stable across engines, runs,
    * partitionings, and scale (a row's fate never depends on what
    * other rows exist, unlike rand()- or reservoir-based sampling). */
  private def bucket10k(key: Column, salt: String = "smp:"): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % HashMod % 10000L

  // ------------------------------------------------- source mixing

  /** Per-language sampling rate for the training mixture: >1 =
    * up-sample (repeat whole epochs + a hash-selected fractional
    * remainder), <1 = down-sample, 1 = pass through. The shape every
    * LLM data recipe needs ("books ×2.4 epochs, low-resource web
    * ×0.25"). */
  val MixRates: Seq[(String, Double)] =
    Seq("en" -> 2.4, "zh" -> 1.5, "de" -> 1.0, "fr" -> 0.6, "es" -> 0.25)

  /** Deterministic epoch-style mixture materialization: each doc is
    * emitted `floor(rate)` times, plus once more iff its salted hash
    * bucket falls under the fractional remainder — so the realized
    * mixture converges to the target rates, every copy is reproducible
    * (retry/backfill-stable, independent of partitioning and of what
    * other rows exist), and a doc's copies carry a 1..n epoch index the
    * downstream shuffler can fold into its ordering key.
    *
    * Shape at scale: entirely map-side — no join, no aggregation, no
    * shuffle (plan pins x0). The explode multiplies bytes by the
    * mixture factor and nothing else; at 100 TB the output is written
    * straight back out at input parallelism. */
  def mixUpsample(docs: DataFrame, groupCol: String = "lang",
      rates: Seq[(String, Double)] = MixRates): DataFrame = {
    val rate = rates.tail.foldLeft(
      when(col(groupCol) === rates.head._1, lit(rates.head._2))) {
      case (acc, (k, v)) => acc.when(col(groupCol) === k, lit(v))
    }.otherwise(lit(1.0))
    // integer basis-points arithmetic for the fractional threshold:
    // round(rate*10000) - floor(rate)*10000 is exact in both engines
    val whole = floor(rate).cast("long")
    val fracThr = round(rate * 10000).cast("long") - whole * lit(10000L)
    docs
      .withColumn("n_copies", whole +
        when(bucket10k(col("doc_id"), "mix:") < fracThr, 1L).otherwise(0L))
      .filter(col("n_copies") >= 1) // also guards descending sequence(1, 0)
      .select(col("doc_id"), col(groupCol), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  // -------------------------------------------- token-budget mixture

  /** Per-language share of the global token budget (fractions sum to
    * 1) — the other half of the mixture story: [[mixUpsample]] fixes
    * epoch RATES, this fixes absolute token COUNTS ("the run trains on
    * 10 B tokens, half of them English"). */
  val MixWeights: Seq[(String, Double)] =
    Seq("en" -> 0.50, "de" -> 0.15, "fr" -> 0.15, "es" -> 0.10, "zh" -> 0.10)

  /** Driver-query global budget — sized so every stratum genuinely
    * truncates at the sf0.01 gate (corpus ≈ 27 k tokens there). */
  val MixBudgetTokens = 10000L

  /** Stratum sub-sharding for the per-language windows below.
    * Language cardinality is tiny and real corpora are dominated by
    * one language, so a window partitioned by `lang` alone would
    * funnel the dominant stratum into ONE task's spill-sort at scale.
    * Because the ordering key `pri` is a uniform hash in
    * [0, HashMod), RANGE-bucketing it into [[MixStripes]] stripes
    * keeps the global (pri, doc_id) order stripe-major: every doc in
    * stripe s precedes every doc in stripe s+1 (pri ties land in the
    * same stripe), so a per-(lang, stripe) window plus the per-stripe
    * prefix offsets — a tiny (nLang·nStripes)-row agg windowed
    * in-plan and broadcast back — reconstructs the EXACT global
    * running sums/positions while each sort task handles ~1/stripes
    * of the stratum. At 100 TB raise MixStripes (any value yields
    * identical output — spec-pinned); the committed hashes are
    * stripe-count-invariant by the range-bucket argument above. */
  val MixStripes = 64

  /** `pri` → stripe (range bucket; monotone in pri). */
  private def stripeCol(stripes: Int): Column =
    expr(s"pri div ${(TextOps.HashMod + stripes - 1) / stripes}L")
      .cast("int")

  /** Token-budget mixture selection: per language, take documents in
    * deterministic hash order until that language's share of the
    * global token budget is exhausted. Greedy prefix rule: a doc is
    * kept iff the tokens BEFORE it are still under budget, so the
    * boundary-crossing doc is included and a stratum is never
    * under-filled (overshoot ≤ one document).
    *
    * Shape at scale: the window runs over a NARROW projection —
    * (lang, priority-hash, n_tokens), ~24 bytes/doc — so the exchange
    * never moves document text no matter how large the corpus rows
    * are; selected ids then join back to the full rows if the caller
    * needs them. Per-stratum ordering is the inherently sequential
    * part of any quota sampler, but it is NOT single-task: the window
    * partitions by (lang, stripe) with [[MixStripes]] range buckets
    * of the hash order, and the exact global prefix sums come back
    * via the broadcast per-stripe offsets (see [[MixStripes]]) — so
    * the dominant language sorts in parallel across its stripes. The
    * narrow projection is localCheckpoint'd so the offsets agg and
    * the window pay the tokenize scan once. */
  def mixTokenBudget(docs: DataFrame, budget: Long = MixBudgetTokens,
      weights: Seq[(String, Double)] = MixWeights,
      stripes: Int = MixStripes): DataFrame = {
    val budgets = weights.map { case (k, f) => (k, Math.round(f * budget)) }
    val langBudget = budgets.tail.foldLeft(
      when(col("lang") === budgets.head._1, lit(budgets.head._2))) {
      case (acc, (k, v)) => acc.when(col("lang") === k, lit(v))
    }.otherwise(lit(0L)) // unlisted strata are excluded entirely
    val proj = docs.select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        TextOps.strHash(concat(lit("budget:"), col("doc_id").cast("string")))
          .as("pri"))
      .withColumn("stripe", stripeCol(stripes))
      .localCheckpoint(eager = false)
    // per-(lang, stripe) token mass → exclusive prefix over stripes:
    // a tiny (nLang·nStripes)-row frame windowed in-plan, broadcast back
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("stripe")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = proj.groupBy("lang", "stripe")
      .agg(sum("n_tokens").as("st_tokens"))
      .withColumn("off_tokens", coalesce(sum("st_tokens").over(wOff), lit(0L)))
      .select(col("lang"), col("stripe"), col("off_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "stripe").orderBy(col("pri").asc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    proj
      .withColumn("cum_local", coalesce(sum("n_tokens").over(w), lit(0L)))
      .join(broadcast(offsets), Seq("lang", "stripe"))
      .withColumn("cum_before", col("cum_local") + col("off_tokens"))
      .filter(col("cum_before") < langBudget)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_before"))
  }

  /** Stride-scheduling virtual-time scale: vtime = (src_pos+1) ·
    * (10¹² div w_ppm). 10¹² keeps strides exact for any ppm weight
    * (min stride 10⁶ at w = 1.0) while (src_pos+1)·stride stays in
    * int64 up to ~9.2·10⁶·w_ppm docs PER SOURCE — 9.2·10¹¹ at the
    * 10 % weight, beyond any real per-source corpus. */
  val StrideScale = 1000000000000L

  /** Deterministic WEIGHTED-FAIR interleave — the global training-
    * stream ORDER for a multi-source mixture, as stride scheduling /
    * WFQ virtual time (Waldspurger & Weihl 1995; Demers et al. 1989):
    * doc at per-source position p (dense, salted-hash order — the
    * i.i.d.-like stream discipline) is emitted at
    * vtime = (p+1) · (10¹² div w_ppm), so reading in vtime order
    * interleaves sources at rates ∝ their ppm weights with O(1)
    * deviation — the property epoch training wants from "sample
    * source d with probability w_d" WITHOUT any RNG state: every
    * doc's slot is a pure function of (its id, its source's weight),
    * reproducible across retries, partitionings, and scale.
    *
    * Emits the ORDER KEY, not a global rank: a loader sorts its own
    * shard partition by (vtime, lang, doc_id) — the tie-break makes
    * the global order total — so no global sort ever runs here; the
    * one exchange is the per-source position window over a narrow
    * (lang, pri, id) projection, exactly [[mixTokenBudget]]'s shape —
    * including its (lang, stripe) sub-sharding: the dense per-source
    * position is a per-stripe row_number plus the broadcast
    * per-stripe count offsets (see [[MixStripes]]), so the dominant
    * source never funnels into one sort task. Unlisted sources get
    * weight 0 and are excluded (the token-budget convention). */
  def mixInterleave(docs: DataFrame,
      weights: Seq[(String, Double)] = MixWeights,
      stripes: Int = MixStripes): DataFrame = {
    val ppm = weights.map { case (k, f) => (k, Math.round(f * 1000000L)) }
    val wCol = ppm.tail.foldLeft(
      when(col("lang") === ppm.head._1, lit(ppm.head._2))) {
      case (acc, (k, v)) => acc.when(col("lang") === k, lit(v))
    }.otherwise(lit(0L))
    val proj = docs.select(col("doc_id"), col("lang"),
        TextOps.strHash(concat(lit("ilv:"), col("doc_id").cast("string")))
          .as("pri"))
      .withColumn("w_ppm", wCol)
      .filter(col("w_ppm") > 0L)
      .withColumn("stripe", stripeCol(stripes))
      .localCheckpoint(eager = false)
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("stripe")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = proj.groupBy("lang", "stripe")
      .agg(count(lit(1)).as("st_n"))
      .withColumn("off_n", coalesce(sum("st_n").over(wOff), lit(0L)))
      .select(col("lang"), col("stripe"), col("off_n"))
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "stripe").orderBy(col("pri").asc, col("doc_id").asc)
    proj
      .withColumn("loc_pos", row_number().over(part).cast("long") - 1L)
      .join(broadcast(offsets), Seq("lang", "stripe"))
      .withColumn("src_pos", col("off_n") + col("loc_pos"))
      .select(col("doc_id"), col("lang"), col("src_pos"), col("w_ppm"),
        expr(s"(src_pos + 1) * (${StrideScale}L div w_ppm)").as("vtime"))
  }

  /** DATA-CONSTRAINED epoch planning (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models"): given a token
    * budget of `budgetMult` × the corpus and a repetition cap of
    * `maxEpochs` (their ~4-epoch "repeating is almost as good as new
    * data" knee), allocate training tokens per domain. Target weights
    * are a τ = ½ temperature mixture (w_d ∝ T_d², ppm-quantized) —
    * the shape that OVERsamples large domains, so the epoch cap
    * genuinely binds on them; capped domains' surplus is redistributed
    * to uncapped domains proportional to their available tokens in a
    * second waterfall round, then re-capped. All arithmetic exact
    * integer (truncating div both engines): weight_ppm =
    * (T_d²·10⁶) div ΣT², round-1 alloc = min((B·w) div 10⁶, E·T_d)
    * computed DIV-FIRST (the naive B·w product overflows int64 once
    * B exceeds ~9.2·10¹² — a 100 TB corpus at budgetMult=4 is
    * ~4·10¹⁴ tokens), leftover = B − Σ, round-2 add = (leftover·T_d)
    * div ΣT_uncapped with the product widened to DECIMAL(38)/HUGEINT.
    * Floor-division residue stays deliberately unallocated.
    *
    * Exactness bound: T_d²·10⁶ needs T_d < 3·10⁶ tokens per domain to
    * stay in int64 — fine here because the τ-weight DERIVATION is the
    * demo stand-in; a production planner takes weight_ppm as an input
    * column (from mix_temperature / mix_doremi, both already ppm).
    * Downstream of the weights, div-first round 1 holds to B < 2⁶³
    * tokens and round 2 is exact in DECIMAL(38), so 100 TB allocates
    * exactly.
    *
    * Shape at scale: ONE corpus scan into a source-keyed token-count
    * agg (map-side combine); every subsequent step operates on the
    * domain table (tens of rows), reused via lazy localCheckpoint so
    * the waterfall's three passes over it cannot re-trigger the scan.
    * The two totals rides are tiny single-row broadcasts. */
  val EpochBudgetMult = 4L
  val EpochMax = 4L

  /** The two-round waterfall shared by [[epochPlan]] and
    * [[annealPlan]] — `budgetOf` maps the corpus's total token mass to
    * the phase budget (identity×mult for the single-phase planner; a
    * precomputed constant for each anneal phase). */
  private def epochWaterfall(docs: DataFrame, maxEpochs: Long,
      budgetOf: Long => Long): DataFrame =
    waterfallOnPer(docs.groupBy("source")
      .agg(sum(size(tokens(col("text"))).cast("long")).as("avail")),
      maxEpochs, budgetOf)

  /** The waterfall proper, over a PRECOMPUTED (source, avail) table —
    * so [[annealPlan]] can feed both phases from one corpus scan. */
  private def waterfallOnPer(perRaw: DataFrame, maxEpochs: Long,
      budgetOf: Long => Long): DataFrame = {
    val per = perRaw.localCheckpoint(eager = false)
    // waterfall scalars collect driver-side (ΣT, ΣT², Σa1, ΣT_uncapped
    // are single rows — the bm25/perceptron train-then-apply pattern;
    // a 1-row crossJoin would constant-fold into a nested-loop join,
    // which the plan audit rightly rejects)
    val tot = per.agg(sum("avail"), sum(col("avail") * col("avail"))).first()
    val tTotal = Option(tot.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val tSq = math.max(
      Option(tot.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L), 1L)
    val budget = budgetOf(tTotal)
    // round-1 alloc DIV-FIRST: (B div 10⁶)·w + ((B mod 10⁶)·w) div 10⁶
    // ≡ (B·w) div 10⁶ exactly (B·w = (q·10⁶+r)·w and q·w·10⁶ divides
    // evenly), but the largest intermediate is max(q·w, r·w) ≤
    // max(B, 10⁶)·10⁶ — in int64 for budgets up to ~9.2·10¹² · 10⁶
    // tokens, vs the naive product overflowing at B ≈ 9.2·10¹²
    // (a 100 TB corpus at budgetMult=4 is ~4·10¹⁴ tokens)
    val bQ = budget / 1000000L
    val bR = budget % 1000000L
    val r1 = per
      .withColumn("weight_ppm", expr(s"(avail * avail * 1000000) div ${tSq}L"))
      .withColumn("cap", col("avail") * maxEpochs)
      .withColumn("a1",
        least(expr(s"${bQ}L * weight_ppm + (${bR}L * weight_ppm) div 1000000"),
          col("cap")))
      .localCheckpoint(eager = false)
    val l = r1.agg(sum("a1"),
      sum(when(col("a1") < col("cap"), col("avail")).otherwise(0L))).first()
    val leftover =
      budget - Option(l.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val tUnc = math.max(
      Option(l.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L), 1L)
    // round-2 spread: leftover·avail can reach ~B·T ≈ 10²⁹ at 100 TB,
    // so the product widens to DECIMAL(38,0) (= DuckDB HUGEINT in the
    // oracle CTEs); `div` truncates identically in both engines and
    // the quotient ≤ leftover is back in int64
    r1.withColumn("a2", least(
        col("a1") + when(col("a1") < col("cap"),
          expr(s"CAST((CAST(${leftover}L AS DECIMAL(38,0)) * avail)" +
            s" div ${tUnc}L AS BIGINT)")).otherwise(0L),
        col("cap")))
      .select(col("source"), col("avail").as("avail_tokens"),
        col("weight_ppm"), col("a2").as("alloc_tokens"),
        expr("(a2 * 1000000) div greatest(avail, 1)").as("epochs_ppm"),
        (col("a2") === col("cap")).as("capped"))
  }

  def epochPlan(docs: DataFrame, budgetMult: Long = EpochBudgetMult,
      maxEpochs: Long = EpochMax): DataFrame =
    epochWaterfall(docs, maxEpochs, _ * budgetMult)

  /** UniMax parameters for the driver query (shared with the oracle
    * SQL). budgetMult=2 with a 3-epoch cap genuinely splits the
    * synthetic corpus: the small languages cap out and their surplus
    * waterfalls onto the large ones. */
  val UnimaxBudgetMult = 2L
  val UnimaxEpochs = 3L
  /** Fixed redistribution rounds — the waterfall converges in at most
    * one round per language that caps plus one capless round, so 6
    * covers any corpus with ≤5 capping languages; extra rounds are
    * no-ops (share 0 / all capped). Fixed so the oracle unrolls the
    * identical CTE chain. */
  val UnimaxRounds = 6

  /** UNIMAX language sampling (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): allocate a token budget UNIFORMLY across
    * languages — not by corpus share, not by temperature — subject to
    * a per-language repetition cap of `maxEpochs` epochs; a capped
    * language's undistributable share is re-spread uniformly over the
    * still-uncapped languages, round by round, until the budget is
    * exhausted or everyone caps. The fairness complement of the
    * proportional family ([[epochPlan]]'s τ=½ temperature waterfall,
    * mix_temperature, DoReMi): head languages stop eating the budget
    * and tail languages get exactly as many tokens as repetition
    * tolerance allows.
    *
    * All arithmetic exact integer: per-round share = remaining div
    * n_uncapped (truncating both engines), caps are avail·maxEpochs.
    * No squared-count weights anywhere, so nothing overflows int64
    * below a 2⁶²-token corpus. The ≤`rounds`·n_langs tokens of floor
    * residue stay deliberately unallocated (the epochWaterfall
    * discipline).
    *
    * Shape at scale: ONE corpus scan into a lang-keyed token agg
    * (map-side combine, localCheckpoint'd); every round is a driver
    * scalar pair (Σalloc, #uncapped) + a narrow projection over the
    * tens-of-rows language table — the train-then-apply pattern, no
    * corpus re-scan, no window anywhere. */
  def mixUnimax(docs: DataFrame, budgetMult: Long = UnimaxBudgetMult,
      maxEpochs: Long = UnimaxEpochs, rounds: Int = UnimaxRounds): DataFrame = {
    val per = docs.groupBy("lang")
      .agg(sum(size(tokens(col("text"))).cast("long")).as("avail"))
      .localCheckpoint(eager = false)
    val tTotal = Option(per.agg(sum("avail")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val budget = tTotal * budgetMult
    var cur = per.withColumn("cap", col("avail") * maxEpochs)
      .withColumn("alloc", lit(0L))
    for (_ <- 1 to rounds) {
      cur = cur.localCheckpoint(eager = false)
      val row = cur.agg(sum("alloc"),
        sum(when(col("alloc") < col("cap"), 1L).otherwise(0L))).first()
      val spent = Option(row.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val nUnc = math.max(
        Option(row.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L), 1L)
      val share = (budget - spent) / nUnc
      cur = cur.withColumn("alloc",
        when(col("alloc") < col("cap"),
          least(col("alloc") + lit(share), col("cap")))
          .otherwise(col("alloc")))
    }
    // surface the undistributed remainder instead of leaving it
    // implicit: ≤ rounds·n_langs tokens of floor residue is the
    // documented discipline, but a corpus where MORE than rounds−1
    // languages cap would leave real budget stranded — the residual
    // column makes that visible (and oracle-checked), and the log
    // names the fix
    val fin = cur.localCheckpoint(eager = false)
    val fr = fin.agg(sum("alloc"), count(lit(1)), sum("cap")).first()
    val spentF = Option(fr.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val sumCap = Option(fr.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val residual = budget - spentF
    // two distinct residual causes, two distinct remedies: budget
    // beyond Σcap is surplus no round count can place (raise
    // maxEpochs or shrink the budget); otherwise a residual past the
    // floor-residue bound means the waterfall ran out of rounds
    if (residual > rounds.toLong * math.max(fr.getLong(1), 1L)) {
      if (spentF >= sumCap)
        curLog.warn(s"mixUnimax: $residual tokens undistributed — the " +
          s"budget exceeds total epoch-cap capacity ($sumCap); raise " +
          "maxEpochs or lower the budget (rounds cannot place these)")
      else
        curLog.warn(s"mixUnimax: $residual tokens undistributed after " +
          s"$rounds rounds (more than floor residue) — more languages " +
          "capped than rounds-1; raise `rounds` for this corpus")
    }
    fin.select(col("lang"), col("avail").as("avail_tokens"),
      col("cap").as("cap_tokens"), col("alloc").as("alloc_tokens"),
      expr("(alloc * 1000000) div greatest(avail, 1)").as("epochs_ppm"),
      (col("alloc") === col("cap")).as("capped"),
      lit(residual).as("residual_tokens"))
  }

  private lazy val curLog =
    org.slf4j.LoggerFactory.getLogger("graft.ops.CurationOps")

  /** Materialize the UniMax plan into an epoch-expanded corpus — the
    * [[epochMaterialize]] copy rule keyed by LANGUAGE: every document
    * gets `floor(epochs_ppm / 1e6)` whole copies, and a deterministic
    * md5-bucket draw ("unimax:" salt, so the fractional selections are
    * independent of the source-epoch family's) grants one more to the
    * fractional-epoch share. Shape at scale: the plan is a tens-of-rows
    * broadcast onto one corpus scan; the explode emits copies without a
    * shuffle; a doc's fate is a pure function of content (repartition-
    * invariant, spec-pinned via the shared rule). */
  def mixUnimaxMaterialize(docs: DataFrame,
      budgetMult: Long = UnimaxBudgetMult,
      maxEpochs: Long = UnimaxEpochs): DataFrame = {
    val plan = mixUnimax(docs, budgetMult, maxEpochs)
      .select(col("lang"), col("epochs_ppm"))
    docs.join(broadcast(plan), "lang")
      .withColumn("n_copies",
        expr("epochs_ppm div 1000000") +
          when(bucket10k(col("doc_id"), "unimax:") <
            expr("(epochs_ppm % 1000000) div 100"), 1L).otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  /** Anneal-phase share of the token budget, in ppm (10 %). */
  val AnnealFracPpm = 100000L

  /** Two-phase ANNEALING schedule — the modern pretraining practice
    * (the Llama-3 / MiniCPM "annealing" stage: spend the last ~10 %
    * of the token budget on quality-gated data, upsampled): phase 1
    * runs the [[epochWaterfall]] over the FULL corpus with budget
    * B−B₂; phase 2 re-runs it over only the documents passing the
    * Gopher gate (the SHARED [[TextOps.gopherFlags]] rules — the
    * card/monitor/ensemble derivation, so the anneal subset can never
    * disagree with the quality surfaces) with budget B₂ =
    * (B div 10⁶)·frac_ppm — the div-first form keeps the product in
    * int64 at any corpus scale, losing <10⁶ tokens of budget to
    * rounding. The repetition cap applies per phase, so anneal-phase
    * upsampling of the (smaller) quality subset is bounded at the
    * same ~4-epoch knee.
    *
    * Shape: ONE corpus scan — a (source, gopher_pass)-keyed token agg
    * (map-side combine, localCheckpoint'd) — feeds tFull, both phase
    * budgets, and both per-source waterfalls; everything downstream
    * operates on tens-of-rows frames and driver scalars. */
  def annealPlan(docs: DataFrame, budgetMult: Long = EpochBudgetMult,
      maxEpochs: Long = EpochMax,
      fracPpm: Long = AnnealFracPpm): DataFrame = {
    // ONE corpus scan: the (source, gopher_pass)-keyed token agg
    // (the shared gopherFlags derivation riding the same tokenize)
    // feeds tFull, the phase-1 per-source table (both pass values),
    // and the phase-2 keeper table (pass = true rows) — the waterfalls
    // then run entirely on tens-of-rows frames
    val bySrcPass = TextOps.gopherFlags(docs, "text")
      .groupBy(col("source"),
        (col("r_words") && col("r_wlen") && col("r_stop") &&
          col("r_punct")).as("pass"))
      .agg(sum("n_tok").as("avail"))
      .localCheckpoint(eager = false)
    val tFull = Option(bySrcPass.agg(sum("avail")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val b = tFull * budgetMult
    val b2 = (b / 1000000L) * fracPpm
    val perAll = bySrcPass.groupBy("source").agg(sum("avail").as("avail"))
    val perKeep = bySrcPass.filter(col("pass"))
      .select(col("source"), col("avail"))
    waterfallOnPer(perAll, maxEpochs, _ => b - b2)
      .withColumn("phase", lit(1L))
      .unionByName(
        waterfallOnPer(perKeep, maxEpochs, _ => b2)
          .withColumn("phase", lit(2L)))
      .select(col("phase"), col("source"), col("avail_tokens"),
        col("weight_ppm"), col("alloc_tokens"), col("epochs_ppm"),
        col("capped"))
  }

  /** EPOCH MATERIALIZATION — [[epochPlan]]'s allocation turned into an
    * actual repeated-document stream: each domain's epochs_ppm becomes
    * per-doc copy counts via the [[mixUpsample]] discipline (whole
    * epochs for everyone + a hash-selected fractional remainder, so a
    * doc's fate is a pure function of its id — partitioning-, retry-
    * and scale-independent). The two stages compose as ONE plan: the
    * domain table (tens of rows) broadcasts onto the corpus scan, the
    * copy explode is narrow, and nothing shuffles at corpus volume —
    * the planner's one source-keyed agg is the only exchange.
    *
    * Fractional rule in exact integer basis points: frac_bp =
    * (epochs_ppm mod 10⁶) div 100, select iff bucket10k(doc) <
    * frac_bp — E[extra copies per domain] = frac · n_docs, making the
    * materialized token mass ≈ alloc_tokens (spec-measured). */
  def epochMaterialize(docs: DataFrame, budgetMult: Long = EpochBudgetMult,
      maxEpochs: Long = EpochMax): DataFrame = {
    val plan = epochPlan(docs, budgetMult, maxEpochs)
      .select(col("source"), col("epochs_ppm"))
    docs.join(broadcast(plan), "source")
      .withColumn("n_copies",
        expr("epochs_ppm div 1000000") +
          when(bucket10k(col("doc_id"), "epoch:") <
            expr("(epochs_ppm % 1000000) div 100"), 1L).otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  // ----------------------------------------------- export sharding

  /** Deterministic training-export sharding: shard = hash(doc_id) mod
    * nShards, position = dense rank within the shard by the same hash,
    * cum_bytes = running byte offset — everything a shard writer needs
    * to emit `shard-00007-of-00016` files with fixed-size rolling
    * splits, reproducibly (a doc's shard/position/offset is a pure
    * function of the corpus content, never of partitioning, retries,
    * or execution order — the property that makes a 100 TB export
    * resumable mid-way).
    *
    * Shape at scale: one hash exchange on `shard` + an in-partition
    * sort — NO global sort (the per-shard orders are independent), and
    * like [[mixTokenBudget]] the shuffle carries only (id, hash,
    * n_chars). The hash-derived order IS the global shuffle step of a
    * training pipeline: consecutive docs in a shard are unrelated,
    * so sequential readers see an i.i.d.-like stream. */
  /** Sentinel: resolve nShards from the corpus size ([[autoShards]]).
    * The gate-preserving floor is 16 — the committed `% 16` oracle
    * hashes are the RESOLVED value at every test scale. */
  val AutoShards = 0

  /** Doc-count target per shard: ~2¹⁸ docs ≈ 0.5–1 GB of text — the
    * rolling-file size a training loader wants. */
  val AutoShardDocs = 262144L

  /** Count-driven shard default (the autoCentroids discipline): one
    * metadata-cheap count() action — parquet answers count(*) from
    * footer metadata — so at 100 TB the export fans out to
    * corpus-size-proportional shards (~N/2¹⁸) instead of a caller's
    * guess, while every test corpus resolves to the floor of 16. */
  private def autoShardsFromCount(n: Long): Int =
    math.max(16L, (n + AutoShardDocs - 1) / AutoShardDocs).toInt

  def autoShards(docs: DataFrame): Int = autoShardsFromCount(docs.count())

  private def resolveShards(docs: DataFrame, nShards: Int): Int =
    if (nShards == AutoShards) autoShards(docs) else nShards

  /** The Feistel exports need BOTH the shard count (corpus count) and
    * the permutation domain (max doc_id) — ONE agg(count, max) driver
    * action answers both, so a frame with an expensive lineage (e.g.
    * curate_export_manifest's CC→split→keeper chain) executes once for
    * the scalars instead of once per scalar. */
  private def shardsAndMax(docs: DataFrame, nShards: Int): (Int, Long) = {
    val r = docs.agg(count(lit(1)).as("n"), max("doc_id").as("m")).first()
    val maxId = if (r.isNullAt(1)) 0L else r.getLong(1)
    val nSh = if (nShards == AutoShards) autoShardsFromCount(r.getLong(0))
      else nShards
    (nSh, maxId)
  }

  def exportShards(docs: DataFrame, nShards: Int = AutoShards): DataFrame = {
    val nSh = resolveShards(docs, nShards)
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("pri").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("n_chars"),
        TextOps.strHash(concat(lit("shard:"), col("doc_id").cast("string")))
          .as("pri"))
      .withColumn("shard", (col("pri") % nSh).cast("int"))
      .withColumn("pos", row_number().over(part).cast("long"))
      .withColumn("cum_bytes",
        sum("n_chars").over(part.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("doc_id"), col("shard"), col("pos"), col("cum_bytes"))
  }

  /** Feistel-network global shuffle — [[exportShards]]' hash ordering
    * made a PROVABLE BIJECTION: a 4-round balanced Feistel permutation
    * over the 2w-bit domain covering max(doc_id) (w half-bits,
    * cycle-walk-free because the domain is fixed by the id span, not
    * the row count). Where the md5-priority order needs a doc_id
    * tie-break (hash collisions exist), a Feistel value is unique by
    * construction — the format-preserving-encryption trick production
    * shuffles use so "position" can be a pure function of the id.
    *
    * Everything is bounded int64 arithmetic (round function
    * F(r,c) = (((r+c) mod M)·A + c) mod M with M = 2³¹−1, A = 48271 —
    * the MINSTD mixer; all intermediates < 2⁴⁷) so the oracle replays
    * it verbatim, and the w/mask parameters derive from ONE metadata-
    * answerable max() action, never a per-row dependency.
    *
    * Scale shape: the permutation itself is a pure narrow projection
    * (whole-stage-codegen'd bit arithmetic — x0); the only exchange is
    * the hash partition by shard, and the per-shard position windows
    * sort W/nShards keys each, independent and parallel — no global
    * sort at any size. Consecutive docs in a shard are unrelated
    * (avalanche over 4 rounds), giving sequential readers the
    * i.i.d.-like stream epoch training wants, reproducibly. */
  def feistelShuffle(docs: DataFrame, nShards: Int = AutoShards): DataFrame = {
    val (nSh, maxId) = shardsAndMax(docs, nShards)
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("perm").asc)
    docs.select(col("doc_id"), feistelPerm(maxId).as("perm"))
      .withColumn("shard", (col("perm") % nSh).cast("int"))
      .withColumn("pos", row_number().over(part).cast("long"))
  }

  /** Packed-sequence training export — the loader-facing manifest that
    * composes [[feistelShuffle]]'s global bijection with
    * [[TextOps.packDocs]]'s greedy fixed-budget rule as ONE plan: docs
    * land in `nShards` independent shards in Feistel order (i.i.d.-like
    * stream, reproducible), and within a shard consecutive docs pack
    * into `budget`-token training sequences — each doc gets its
    * (shard, seq_id, offset), exactly what a sequence-packing loader
    * needs to materialize fixed-length batches without padding waste
    * (a doc straddling a boundary starts at `offset` and spills into
    * the next sequence — the loader's split is `seq_id·budget +
    * offset` arithmetic, no re-scan). Invariant: `seq_id·budget +
    * offset = cum_tokens_before(doc within shard)` — spec-pinned.
    *
    * Shape at scale: permutation + token count are one narrow
    * zero-shuffle scan; the single exchange is the shard hash
    * partition; per-shard running sums are independent in-partition
    * windows over W/nShards keys — never a global sort, same contract
    * as [[exportShards]]. */
  def exportPackedSequences(docs: DataFrame, nShards: Int = AutoShards,
      budget: Long = 512L): DataFrame = {
    val (nSh, maxId) = shardsAndMax(docs, nShards)
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("perm").asc)
    docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        feistelPerm(maxId).as("perm"))
      .withColumn("shard", (col("perm") % nSh).cast("int"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(
        part.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        expr(s"cum_before div $budget").as("seq_id"),
        (col("cum_before") % budget).as("offset"))
  }

  /** Budget grid [[packEfficiency]] evaluates — the context lengths a
    * training run actually chooses between. */
  val PackBudgets = Seq(128L, 256L, 512L, 1024L)

  /** Sequence-budget SIZING table — the measurement that picks
    * [[exportPackedSequences]]' budget: for each candidate context
    * length, the sequence count, capacity, tail waste (the packed
    * stream's only padding: each shard's final partial sequence —
    * waste_ppm = (capacity − used)·10⁶ div capacity), and the number
    * of documents STRADDLING a sequence boundary (docs split across
    * training sequences lose cross-boundary attention — the
    * quality-vs-waste tradeoff axis the budget choice actually
    * trades: bigger budgets waste more tail tokens per shard but
    * split fewer documents... and vice versa; this table makes both
    * sides of that tradeoff a measurement).
    *
    * ONE corpus scan: the Feistel + cum-token window is computed once
    * (cum_before is budget-independent), then the |budgets|×docs
    * explode runs over the NARROW 3-column frame (shard, n_tokens,
    * cum_before — ~24 bytes/doc, never text), rolled up per
    * (budget, shard) with map-side combine and then per budget —
    * |budgets| output rows. */
  def packEfficiency(docs: DataFrame, nShards: Int = AutoShards,
      budgets: Seq[Long] = PackBudgets): DataFrame = {
    val (nSh, maxId) = shardsAndMax(docs, nShards)
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("perm").asc)
    val packed = docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        feistelPerm(maxId).as("perm"))
      .withColumn("shard", (col("perm") % nSh).cast("int"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(
        part.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
    packed
      .select(col("shard"), col("n_tokens"), col("cum_before"),
        explode(typedLit(budgets)).as("budget"))
      .groupBy("budget", "shard")
      .agg(sum("n_tokens").as("toks"),
        sum(when(col("n_tokens") > 0L &&
          expr("(cum_before + n_tokens - 1) div budget") >
            expr("cum_before div budget"), 1L).otherwise(0L))
          .as("n_straddle"))
      .groupBy("budget")
      .agg(sum(expr("(toks + budget - 1) div budget")).as("n_seqs"),
        sum("toks").as("used_tokens"),
        sum("n_straddle").as("n_straddle"))
      .select(col("budget"), col("n_seqs"),
        (col("n_seqs") * col("budget")).as("capacity_tokens"),
        col("used_tokens"),
        expr("((n_seqs * budget - used_tokens) * 1000000)" +
          " div greatest(n_seqs * budget, 1)").as("waste_ppm"),
        col("n_straddle"))
  }

  /** One metadata-answerable max() action fixing the Feistel domain. */
  private def maxDocId(docs: DataFrame): Long =
    Option(docs.agg(max("doc_id")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

  /** The [[feistelShuffle]] permutation as a pure narrow Column over
    * `doc_id` — shared with [[curateCurriculum]] so both queries run
    * the IDENTICAL bijection (and both replay via [[feistelCtes]]). */
  private def feistelPerm(maxId: Long): Column = {
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxId, 1L))
    val w = math.max(4, (bitlen + 1) / 2)
    val mask = (1L << w) - 1L
    val M = 2147483647L
    val A = 48271L
    var l: Column = shiftright(col("doc_id"), w)
    var r: Column = col("doc_id").bitwiseAND(lit(mask))
    for (c <- FeistelKeys) {
      val f = (((r + lit(c)) % M) * A + c) % M
      val nr = l.bitwiseXOR(f.bitwiseAND(lit(mask)))
      l = r
      r = nr
    }
    shiftleft(l, w).bitwiseOR(r)
  }

  /** Curriculum sub-shards per difficulty band for
    * [[curateCurriculum]] — 8 at the gate; production sizes this to
    * the cluster (the [[exportShards]] discipline). */
  val CurriculumShards = 8

  /** CURRICULUM-ORDERED training export — the data-ordering stage of
    * curriculum learning (Bengio et al. 2009, as applied to LLM
    * pretraining data: schedule documents easy → hard, but keep the
    * stream inside each difficulty stage i.i.d.-like). Difficulty is
    * the exact-integer token entropy ([[TextOps.tokenEntropy]]'s
    * one-pass native kernel — low-entropy templated text first,
    * high-entropy prose last), banded by ABSOLUTE bits-per-token
    * (band = clamp(ent_mbits div 1000, 0, 3) — a narrow scale-free
    * rule, deliberately NOT an equi-depth ntile, which would need a
    * global sort); within a band, order is the [[feistelShuffle]]
    * bijection (provably collision-free, so positions are a pure
    * function of content ids — reproducible across retries and
    * partitionings). A training loader reads bands ascending,
    * sub-shards within a band in parallel.
    *
    * Shape at scale: difficulty + permutation are ONE narrow
    * zero-shuffle corpus scan (entropy kernel + codegen'd Feistel bit
    * arithmetic); the only exchange is the hash partition by
    * (band, shard), and each per-(band, shard) position window sorts
    * W/(4·nShards) keys independently — never a global sort. */
  def curateCurriculum(docs: DataFrame,
      nShards: Int = CurriculumShards): DataFrame = {
    val part = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "shard").orderBy(col("perm").asc)
    docs.select(col("doc_id"),
        graft.functions.TextNative.entropy_stats(col("text")).as("s"),
        feistelPerm(maxDocId(docs)).as("perm"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), element_at(col("s"), 3).as("ent_mbits"),
        col("perm"))
      .withColumn("band", least(lit(3L),
        greatest(lit(0L), expr("ent_mbits div 1000"))).cast("int"))
      .withColumn("shard", (col("perm") % nShards).cast("int"))
      .withColumn("pos", row_number().over(part).cast("long"))
      .select(col("doc_id"), col("ent_mbits"), col("band"), col("shard"),
        col("pos"))
  }

  /** Per-round Feistel constants (arbitrary fixed odd salts < 2²⁰ so
    * every intermediate stays overflow-free in BOTH engines — DuckDB
    * BIGINT errors on overflow rather than wrapping). */
  val FeistelKeys = Seq(40503L, 654435L, 86028L, 25117L)

  /** The verbatim SQL replay of [[feistelShuffle]]'s permutation as a
    * source-parameterized CTE chain (p, f0..f4, pm) — `src` must
    * expose `doc_id`; ends WITHOUT a trailing comma. Shared by the
    * standalone `export_shuffle` oracle and the capstone manifest
    * composition. */
  private[graft] def feistelCtes(src: String): String = {
    val M = 2147483647L
    val A = 48271L
    def roundCte(i: Int, c: Long): String =
      s"""f$i AS (
         |  SELECT doc_id, r AS l,
         |    xor(l, ((((r + $c) % $M) * $A + $c) % $M) & ((1::BIGINT << p.w) - 1)) AS r
         |  FROM f${i - 1}, p)"""
    val rounds = FeistelKeys.zipWithIndex
      .map { case (c, i) => roundCte(i + 1, c) }.mkString(",\n")
    s"""p AS (
       |  SELECT GREATEST(4, (length(bin(GREATEST(MAX(doc_id), 1))) + 1) // 2)
       |    AS w
       |  FROM $src),
       |f0 AS (
       |  SELECT doc_id, doc_id >> p.w AS l,
       |    doc_id & ((1::BIGINT << p.w) - 1) AS r
       |  FROM $src, p),
       |$rounds,
       |pm AS (SELECT doc_id, (l << p.w) | r AS perm FROM f4, p)""".stripMargin
  }

  /** Temperature-based mixture reweighting (the multilingual-LM
    * sampling rule: q_l ∝ p_l^(1/T), here T = 2) — up-weights
    * low-resource groups and down-weights dominant ones while
    * preserving the total token budget: rate_l = (√n_l / Σ√n_m) ·
    * (Σn_m / n_l), so Σ rate_l·n_l = Σ n_m exactly.
    *
    * Determinism discipline: T = 2 is hardcoded BECAUSE its power
    * function is sqrt — IEEE-754 requires sqrt correctly rounded
    * (pow is not), so both engines compute the identical double; the
    * √n_l values are then snapped to exact integers (round ×1e6) and
    * summed as BIGINTs (float summation order can never differ), and
    * every subsequent step — the rate's two IEEE divisions, the
    * floor/round split into whole epochs + fractional basis points,
    * and the per-doc salted-hash fractional draw — is the same exact
    * machinery as [[mixUpsample]]. Per-group realized copies converge
    * to rate_l·n_docs_l and every doc's fate is retry/partition-
    * independent.
    *
    * Shape at scale: one corpus scan for per-doc token counts, one
    * tiny per-group aggregate (|groups| rows carries the whole rate
    * computation; the unpartitioned window runs on |groups| rows, not
    * the corpus), a broadcast join of the rates back onto the doc
    * scan, and one keyed agg for the realized counts. */
  def mixTemperature(docs: DataFrame, groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val w = WindowUtil.boundedGlobal(col("g")).rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val perDoc = docs.select(col(groupCol).as("g"), col("doc_id"),
      size(tokens(col(textCol))).cast("long").as("n_tok"))
    val rates = perDoc.groupBy("g")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .withColumn("s_u",
        round(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
      .withColumn("rate",
        (col("s_u").cast("double") / sum(col("s_u")).over(w).cast("double")) *
          (sum(col("n_tokens")).over(w).cast("double") /
            col("n_tokens").cast("double")))
      .withColumn("whole", floor(col("rate")).cast("long"))
      .withColumn("frac_bp",
        round(col("rate") * 10000).cast("long") - col("whole") * lit(10000L))
    val realized = perDoc
      .join(broadcast(rates.select(col("g"), col("whole"), col("frac_bp"))), "g")
      .withColumn("n_copies", col("whole") +
        when(bucket10k(col("doc_id"), "temp:") < col("frac_bp"), 1L)
          .otherwise(0L))
      .groupBy("g").agg(sum("n_copies").as("n_out"))
    rates.join(realized, "g")
      .select(col("g").as(groupCol), col("n_docs"), col("n_tokens"),
        col("s_u"), round(col("rate"), 6).as("rate_r6"), col("n_out"))
  }

  // ------------------------------------------------- item co-occurrence

  /** Item co-occurrence over a (user_id, item) interaction table:
    * pairs of items sharing ≥ minUsers users. The quadratic hazard is
    * the per-user self-join fanout, so each user's item list is CAPPED
    * at the capN most frequent first (keyed window) — per-user work is
    * then ≤ C(capN, 2) pairs no matter how hot a power user is, the
    * bound a production co-click pipeline enforces (ScaleProfile
    * measures the capped curve staying flat while the uncapped one
    * grows ~k² in items-per-user). */
  def itemCooccur(userItem: DataFrame, capN: Int = 20,
      minUsers: Long = 3L): DataFrame = {
    val ui = userItem.groupBy("user_id", "item").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n").desc, col("item").asc)
    val capped = ui.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= capN).select("user_id", "item")
    val l = capped.withColumnRenamed("item", "i1")
    val r = capped.withColumnRenamed("item", "i2")
    // Each (user_id, item) is unique after the pre-aggregation above, so
    // every (user, i1, i2) triple out of the self-join is too: a plain
    // count is the same number as COUNT(DISTINCT user_id) minus the
    // extra dedup pass on the hottest aggregation of the operator.
    l.join(r, "user_id").filter(col("i1") < col("i2"))
      .groupBy("i1", "i2").agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minUsers)
  }

  // ------------------------------------------------------------- DSIR

  /** DSIR hash space / selection width for the driver query (shared
    * with the oracle SQL). 64 buckets keep the weight table a 64-entry
    * broadcast array at ANY corpus size; production DSIR uses 10k–1M
    * buckets — the plan shape is identical, only the array grows. */
  val DsirBuckets = 64
  val DsirKeep = 200
  val DsirTargetLang = "en"

  /** Portable hashed-unigram bucket: low bits of the word's md5 — the
    * same engine-agnostic derivation every hashed op here uses. */
  private def dsirBucket(w: Column): Column =
    conv(substring(md5(w), 1, 4), 16, 10).cast("long") % DsirBuckets

  /** Data selection via hashed n-gram importance weights — the DSIR
    * shape (Xie et al., NeurIPS 2023): estimate target vs raw unigram
    * bucket distributions, weight every document by how target-like
    * its token mix is, keep the top slice. Here target = the
    * [[DsirTargetLang]] documents (the "looks like the high-quality
    * distribution" proxy), raw = the whole corpus.
    *
    * Re-derived in EXACT integer arithmetic (the [[TextOps]]
    * lm_surprise / BM25 stance): the paper's per-bucket log-ratio
    * becomes the Laplace-smoothed probability RATIO in ppm —
    * `w_b = ((1+tgt_b)·(rawTot+B)·1e6) div ((1+raw_b)·(tgtTot+B))` —
    * monotone per bucket, and the per-doc score Σ count_{d,b}·w_b is a
    * bit-exact BIGINT immune to float summation order and libm log
    * rounding (products stay < 2^62 through ~sf1-scale corpora; a
    * 100 TB run rescales the two totals or widens to 128-bit).
    *
    * Scale shape: ONE token-explode aggregation keyed on the 64-value
    * bucket (map-side partials collapse it to B rows per partition —
    * at 100 TB the shuffle carries B rows × partitions, not tokens);
    * the totals window runs on the B-row frame; the weight table
    * broadcasts as a single 64-element array row and SCORING is a pure
    * narrow expression over the corpus scan — zero shuffle, ending in
    * a TakeOrdered top-[[DsirKeep]]. */
  def dsirSelect(docs: DataFrame, targetLang: String = DsirTargetLang,
      keep: Int = DsirKeep, textCol: String = "text"): DataFrame = {
    val b = DsirBuckets
    val bc = docs
      .select(col("lang"), explode(tokens(col(textCol))).as("w"))
      .groupBy(dsirBucket(col("w")).as("b"))
      .agg(count(lit(1)).as("raw_c"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("tgt_c"))
    // totals over the ≤B-row weight frame — bounded by construction,
    // never by data (boundedGlobal pins that invariant in the plan)
    val W = org.apache.spark.sql.expressions.Window
    val wTot = WindowUtil.boundedGlobal(col("b"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val wts = bc
      .withColumn("raw_tot", sum(col("raw_c")).over(wTot))
      .withColumn("tgt_tot", sum(col("tgt_c")).over(wTot))
      .withColumn("w", expr(
        s"((1 + tgt_c) * (raw_tot + $b) * 1000000) div ((1 + raw_c) * (tgt_tot + $b))"))
    // complete 64-entry array: buckets no word hashed to get the
    // zero-count smoothed weight
    val warrRow = wts
      .agg(map_from_entries(collect_list(struct(col("b"), col("w")))).as("wm"),
        first(col("raw_tot")).as("rt"), first(col("tgt_tot")).as("tt"))
      .select(transform(sequence(lit(0), lit(b - 1)), i =>
        coalesce(element_at(col("wm"), i.cast("long")),
          expr(s"((rt + $b) * 1000000) div (tt + $b)"))).as("warr"))
    docs
      .select(col("doc_id"), col("lang"), tokens(col(textCol)).as("toks"))
      .crossJoin(broadcast(warrRow))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("score", aggregate(col("toks"), lit(0L), (acc, w) =>
        acc + element_at(col("warr"), (dsirBucket(w) + 1).cast("int"))))
      .withColumn("avg_w_ppm", expr("score div n_tok"))
      .orderBy(col("avg_w_ppm").desc, col("doc_id").asc)
      .limit(keep)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("score"),
        col("avg_w_ppm"))
  }

  // ----------------------------------------------- pipeline capstone

  /** The whole curation pass as ONE declarative plan — the composition
    * a production corpus actually runs, end to end in a single query
    * so Catalyst sees (and can globally optimize) every stage:
    *  1. exact dedup: keep the lowest doc_id per normalized content
    *     hash (one window over the hash — no self-join);
    *  2. span-level dedup on the SURVIVORS ([[DedupOps.spanRemove]]):
    *     shared spans are re-derived on the deduped corpus, the
    *     Lee-et-al ordering (exact copies must not defend their own
    *     spans);
    *  3. quality gate: docs keeping ≥ `minCleanToks` clean tokens;
    *  4. per-language rollup: doc count, clean-token total, mean
    *     removal ppm (integer div — exact).
    * Every stage is keyed/narrow exactly as its standalone operator;
    * composing them adds no new shuffle beyond the final k-row rollup:
    * `lang` rides [[DedupOps.spanRemove]]'s passthrough instead of a
    * re-join, and spanRemove's localCheckpoint'd token frame means the
    * corpus (and the upstream dedup window) is computed ONCE — the
    * three downstream consumers read the executor-local blocks
    * (fixture: x6, one parquet scan, three ExistingRDD reads; the
    * un-materialized form re-ran scan+window per consumer — x11, six
    * parquet scans). */
  def curatePipeline(docs: DataFrame, minCleanToks: Long = 10L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(lower(trim(col("text"))))).orderBy(col("doc_id"))
    val keep = docs
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    DedupOps.spanRemove(keep, passthrough = Seq("lang"))
      .withColumn("clean_toks", col("n_toks") - col("n_removed"))
      .filter(col("clean_toks") >= minCleanToks)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("clean_toks")).as("total_clean_tokens"),
        expr("sum(removed_ppm) div count(1)").as("mean_removed_ppm"))
  }

  private[ops] def curatePipelineSql(minCleanToks: Long): String =
    s"""WITH keep AS (
       |  SELECT doc_id, lang, text FROM documents
       |  QUALIFY ROW_NUMBER() OVER (
       |    PARTITION BY md5(lower(trim(text))) ORDER BY doc_id ASC) = 1),
       |${DedupOps.spanRemoveCtes("keep")},
       |cleaned AS (
       |  SELECT doc_id, n_toks,
       |    (n_toks - len(kz))::BIGINT AS n_removed,
       |    ((n_toks - len(kz)) * 1000000 // GREATEST(n_toks, 1))::BIGINT
       |      AS removed_ppm
       |  FROM kept)
       |SELECT k.lang,
       |  COUNT(*)::BIGINT AS n_docs,
       |  CAST(SUM(c.n_toks - c.n_removed) AS BIGINT) AS total_clean_tokens,
       |  CAST(SUM(c.removed_ppm) // COUNT(*) AS BIGINT) AS mean_removed_ppm
       |FROM cleaned c JOIN keep k ON c.doc_id = k.doc_id
       |WHERE c.n_toks - c.n_removed >= $minCleanToks
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------- queries

  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "txt_repetition" -> ((s, d) => repetitionStats(t(s, d, "documents"))),

    "mix_upsample" -> ((s, d) => mixUpsample(t(s, d, "documents"))),

    "curate_dsir_select" -> ((s, d) => dsirSelect(t(s, d, "documents"))),

    "mix_token_budget" -> ((s, d) => mixTokenBudget(t(s, d, "documents"))),

    "mix_temperature" -> ((s, d) => mixTemperature(t(s, d, "documents"))),

    "mix_epoch_plan" -> ((s, d) => epochPlan(t(s, d, "documents"))),

    "mix_unimax" -> ((s, d) => mixUnimax(t(s, d, "documents"))),

    "mix_unimax_materialize" ->
      ((s, d) => mixUnimaxMaterialize(t(s, d, "documents"))),

    "mix_epoch_materialize" -> ((s, d) => epochMaterialize(t(s, d, "documents"))),

    "mix_interleave" -> ((s, d) => mixInterleave(t(s, d, "documents"))),

    "mix_anneal_plan" -> ((s, d) => annealPlan(t(s, d, "documents"))),

    "export_shards" -> ((s, d) => exportShards(t(s, d, "documents"))),

    "export_shuffle" -> ((s, d) => feistelShuffle(t(s, d, "documents"))),

    "export_packed_sequences" -> ((s, d) =>
      exportPackedSequences(t(s, d, "documents"))),

    "export_pack_efficiency" -> ((s, d) =>
      packEfficiency(t(s, d, "documents"))),

    "curate_curriculum" -> ((s, d) => curateCurriculum(t(s, d, "documents"))),

    "curate_pipeline" -> ((s, d) => curatePipeline(t(s, d, "documents"))),

    // The synthetic corpus carries no real PII, so the query derives a
    // contact line from row data (email/phone/IP with nonzero matches
    // guaranteed), prepends it, and redacts — proving the scrub and
    // the counters against the oracle on every row.
    "pii_redact" -> ((s, d) => {
      val contact = concat(
        lit("contact user"), col("doc_id").cast("string"),
        lit("@"), col("source"), lit(".net tel 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" ip 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".7 "), col("text"))
      redactPii(t(s, d, "documents").withColumn("synth", contact), "synth")
        .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
          col("n_ips").cast("long").as("n_ips"),
          col("n_phones").cast("long").as("n_phones"), col("redacted"))
    }),

    "sample_stratified" -> ((s, d) => {
      val thr = SampleThresholds.tail.foldLeft(
        when(col("event_type") === SampleThresholds.head._1,
          lit(SampleThresholds.head._2))) { case (acc, (k, v)) =>
        acc.when(col("event_type") === k, lit(v))
      }.otherwise(lit(0L))
      t(s, d, "events")
        .withColumn("keep", bucket10k(col("event_id")) < thr)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("keep"), cents(col("value"))).otherwise(0L))
            .as("sampled_value_c"))
    }),

    // The end-to-end corpus materializer: compose exact-dedup keeper
    // selection, language filter, token-length band, and the
    // repetition cap into ONE query whose output IS the curated
    // corpus — the shape a real pipeline ships to tokenization.
    // Thresholds chosen to genuinely split the synthetic corpus
    // (median n_tokens 56, p90 dup_bigram_frac 0.065).
    "curate_keep" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(lower(trim(col("text"))))).orderBy(col("doc_id").asc)
      val keepers = docs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      keepers.join(repetitionStats(docs), "doc_id")
        .filter(col("lang") === "en" &&
          col("n_tokens").between(30, 100) &&
          col("dup_bigram_frac") < 0.05)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("dup_bigram_frac"))
    }),

    // Ordered funnel: users who viewed, then clicked strictly after
    // their first view, then purchased strictly after that click.
    "event_funnel" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min("us").as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("us") > col("t2"))
        .groupBy("user_id").agg(min("us").as("t3"))
      def stage(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      stage(v, "1_view").unionByName(stage(c, "2_click_after_view"))
        .unionByName(stage(p, "3_purchase_after_click"))
    }),

    // Per-domain cap (web-corpus domain balancing): keep at most 10
    // docs per source, chosen by a deterministic uniform priority —
    // a keyed window over the source partition, never a global sort.
    // At 100 TB the partition key is the domain, cardinality millions,
    // each group small; hot domains are exactly what the cap bounds.
    "curate_domain_cap" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy(col("pri").asc, col("doc_id").asc)
      t(s, d, "documents")
        .withColumn("pri",
          TextOps.strHash(concat(lit("cap:"), col("doc_id").cast("string"))))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("doc_id"), col("source"), col("rk"))
    }),

    // Exact-k uniform sample: ORDER BY deterministic hash LIMIT k
    // plans as TakeOrderedAndProject — per-partition top-k then a
    // driver merge of k-row partials, the distributed reservoir
    // (no global sort, no rand() nondeterminism under retries).
    "sample_uniform_k" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("pri",
          TextOps.strHash(concat(lit("unif:"), col("doc_id").cast("string"))))
        .orderBy(col("pri").asc, col("doc_id").asc)
        .limit(100)
        .select(col("doc_id"), col("source"), col("lang"))),

    // Cohort retention: users grouped by first-seen week, distinct
    // actives per (cohort, week offset). Two keyed aggs + one keyed
    // join on user_id — the week matrix never materializes wide.
    "event_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
      val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort"), expr("datediff(wk, cohort) div 7").as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_users"))
    }),

    // Weighted sample without replacement (Efraimidis–Spirakis): each
    // row races with priority -ln(u)/w (u = deterministic hash uniform,
    // w = n_chars), smallest k win — longer docs proportionally more
    // likely, yet every row's fate is a pure function of its own key.
    // Same TakeOrderedAndProject shape as sample_uniform_k; priority
    // rounded to 9 dp so the ln ulp can't flip the cross-engine cut.
    // Zero-weight rows are FILTERED, not divided: w=0 means priority=∞
    // (never sampled) in ES semantics, and an unfiltered n_chars=0 doc
    // would ANSI-crash the divide; the oracle carries the same WHERE.
    "sample_weighted" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("n_chars") > 0)
        .withColumn("u",
          (TextOps.strHash(concat(lit("wgt:"), col("doc_id").cast("string"))) + 1L)
            .cast("double") / lit((TextOps.HashMod + 1L).toDouble))
        .withColumn("priority", round(-log(col("u")) / col("n_chars"), 9))
        .orderBy(col("priority").asc, col("doc_id").asc)
        .limit(100)
        .select(col("doc_id"), col("source"), col("n_chars"), col("priority"))),

    // Item co-occurrence (the collaborative-filtering / related-items
    // primitive) over the event log — see [[itemCooccur]].
    "event_item_cooccur" -> ((s, d) =>
      itemCooccur(t(s, d, "events")
        .withColumn("item", get_json_object(col("props"), "$.k").cast("long"))
        .select("user_id", "item")))
  )

  /** [[epochPlan]]'s waterfall as a reusable CTE chain ending at `r2`
    * (source, avail, weight_ppm, cap, a2) — shared by the plan oracle
    * and the materializer oracle so the two can never desync. */
  private def epochPlanCtes: String =
    s"""per AS (
       |  SELECT source, CAST(SUM(len($sqlToks)) AS BIGINT) AS avail
       |  FROM documents GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(avail) AS BIGINT) AS t_total,
       |    CAST(SUM(avail * avail) AS BIGINT) AS t_sq
       |  FROM per),
       |r1 AS (
       |  SELECT source, avail,
       |    t_total * $EpochBudgetMult AS budget,
       |    (avail * avail * 1000000) // t_sq AS weight_ppm,
       |    avail * $EpochMax AS cap
       |  FROM per, tot),
       |r1b AS (
       |  SELECT *, LEAST((budget // 1000000) * weight_ppm
       |      + ((budget % 1000000) * weight_ppm) // 1000000, cap) AS a1
       |  FROM r1),
       |l AS (
       |  SELECT CAST(SUM(a1) AS BIGINT) AS sum_a1,
       |    CAST(SUM(CASE WHEN a1 < cap THEN avail ELSE 0 END) AS BIGINT)
       |      AS t_unc
       |  FROM r1b),
       |r2 AS (
       |  SELECT source, avail, weight_ppm, cap,
       |    LEAST(a1 + CASE WHEN a1 < cap
       |      THEN CAST((CAST(budget - sum_a1 AS HUGEINT) * avail)
       |        // GREATEST(t_unc, 1) AS BIGINT)
       |      ELSE 0 END, cap) AS a2
       |  FROM r1b, l)""".stripMargin

  private val sqlToks =
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x != '')"

  /** The [[mixUnimax]] round chain (per → tot → a0 → `rounds`
    * unrolled uniform-share waterfall rounds, each a scalar
    * (spent, n_uncapped) CTE + a projection — exactly the driver
    * loop), ending in `a<rounds>` — shared by the plan and
    * materialize oracles. */
  private def unimaxPlanCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""s$r AS (
         |  SELECT CAST(SUM(alloc) AS BIGINT) AS spent,
         |    GREATEST(CAST(SUM(CASE WHEN alloc < cap THEN 1 ELSE 0 END)
         |      AS BIGINT), 1) AS n_unc
         |  FROM a${r - 1}),
         |a$r AS (
         |  SELECT lang, avail, cap,
         |    CASE WHEN alloc < cap
         |      THEN LEAST(alloc + (t.budget - s.spent) // s.n_unc, cap)
         |      ELSE alloc END AS alloc
         |  FROM a${r - 1}, s$r s, tot t)""".stripMargin
    }.mkString(",\n")
    s"""per AS (
       |  SELECT lang, CAST(SUM(len($sqlToks)) AS BIGINT) AS avail
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(avail) AS BIGINT) * $UnimaxBudgetMult
       |        AS budget FROM per),
       |a0 AS (SELECT lang, avail, avail * $UnimaxEpochs AS cap,
       |       CAST(0 AS BIGINT) AS alloc FROM per),
       |$roundCtes""".stripMargin
  }

  /** DuckDB replay of [[mixUnimax]]. */
  private def unimaxOracle(rounds: Int): String =
    s"""WITH ${unimaxPlanCtes(rounds)},
       |sfin AS (SELECT CAST(SUM(alloc) AS BIGINT) AS spent FROM a$rounds)
       |SELECT lang, avail AS avail_tokens, cap AS cap_tokens,
       |  alloc AS alloc_tokens,
       |  (alloc * 1000000) // GREATEST(avail, 1) AS epochs_ppm,
       |  (alloc = cap) AS capped,
       |  t.budget - sfin.spent AS residual_tokens
       |FROM a$rounds, sfin, tot t""".stripMargin

  /** DuckDB replay of [[mixUnimaxMaterialize]] — the plan chain, then
    * the epochMaterialize copy rule keyed by lang ("unimax:" salt). */
  private def unimaxMaterializeOracle(rounds: Int): String =
    s"""WITH ${unimaxPlanCtes(rounds)},
       |eppm AS (
       |  SELECT lang, (alloc * 1000000) // GREATEST(avail, 1) AS epochs_ppm
       |  FROM a$rounds),
       |cnt AS (
       |  SELECT d.doc_id, d.lang,
       |    CAST(len($sqlToks) AS BIGINT) AS n_tokens,
       |    epochs_ppm // 1000000 +
       |    (CASE WHEN ('0x' || substr(md5('unimax:' || d.doc_id::VARCHAR),
       |        1, 15))::BIGINT % $HashMod % 10000
       |        < (epochs_ppm % 1000000) // 100
       |     THEN 1 ELSE 0 END) AS n_copies
       |  FROM documents d JOIN eppm USING (lang))
       |SELECT doc_id, lang, n_tokens, n_copies, t.c AS copy
       |FROM cnt, unnest(range(1, n_copies + 1)) AS t(c)
       |WHERE n_copies >= 1""".stripMargin

  /** Prefix-parameterized replay of [[epochWaterfall]] — shared by the
    * anneal oracle's two phases (`$budgetSql` is a scalar subquery). */
  private def waterfallCtes(px: String, docsRel: String,
      budgetSql: String): String =
    s"""${px}per AS (
       |  SELECT source, CAST(SUM(len($sqlToks)) AS BIGINT) AS avail
       |  FROM $docsRel GROUP BY 1),
       |${px}tot AS (
       |  SELECT CAST(SUM(avail) AS BIGINT) AS t_total,
       |    CAST(SUM(avail * avail) AS BIGINT) AS t_sq
       |  FROM ${px}per),
       |${px}r1 AS (
       |  SELECT source, avail,
       |    $budgetSql AS budget,
       |    (avail * avail * 1000000) // t_sq AS weight_ppm,
       |    avail * $EpochMax AS cap
       |  FROM ${px}per, ${px}tot),
       |${px}r1b AS (
       |  SELECT *, LEAST((budget // 1000000) * weight_ppm
       |      + ((budget % 1000000) * weight_ppm) // 1000000, cap) AS a1
       |  FROM ${px}r1),
       |${px}l AS (
       |  SELECT CAST(SUM(a1) AS BIGINT) AS sum_a1,
       |    CAST(SUM(CASE WHEN a1 < cap THEN avail ELSE 0 END) AS BIGINT)
       |      AS t_unc
       |  FROM ${px}r1b),
       |${px}r2 AS (
       |  SELECT source, avail, weight_ppm, cap,
       |    LEAST(a1 + CASE WHEN a1 < cap
       |      THEN CAST((CAST(budget - sum_a1 AS HUGEINT) * avail)
       |        // GREATEST(t_unc, 1) AS BIGINT)
       |      ELSE 0 END, cap) AS a2
       |  FROM ${px}r1b, ${px}l)""".stripMargin

  private val sqlMixRateCase =
    MixRates.map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")

  private val sqlMixBudgetCase =
    MixWeights.map { case (k, f) =>
      s"WHEN '$k' THEN ${Math.round(f * MixBudgetTokens)}"
    }.mkString(" ")

  private val sqlMixPpmCase =
    MixWeights.map { case (k, f) =>
      s"WHEN '$k' THEN ${Math.round(f * 1000000L)}"
    }.mkString(" ")

  /** DuckDB replay of the full DSIR pipeline: bucket counts, smoothed
    * ppm importance weights, 64-entry weight array, per-doc integer
    * score, top-[[DsirKeep]] selection. The window totals CAST to
    * BIGINT (DuckDB windowed SUM over ints widens to HUGEINT). */
  private def dsirOracle: String = {
    val b = DsirBuckets
    val bkt = (w: String) => s"('0x' || substr(md5($w), 1, 4))::BIGINT % $b"
    s"""WITH tk AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents),
       |wrd AS (SELECT lang, unnest(toks) AS w FROM tk),
       |bc AS (
       |  SELECT ${bkt("w")} AS b, CAST(COUNT(1) AS BIGINT) AS raw_c,
       |    CAST(COUNT(1) FILTER (WHERE lang = '$DsirTargetLang') AS BIGINT) AS tgt_c
       |  FROM wrd GROUP BY 1),
       |wt AS (
       |  SELECT b,
       |    CAST(SUM(raw_c) OVER () AS BIGINT) AS raw_tot,
       |    CAST(SUM(tgt_c) OVER () AS BIGINT) AS tgt_tot,
       |    raw_c, tgt_c
       |  FROM bc),
       |wts AS (
       |  SELECT b,
       |    CAST(((1 + tgt_c) * (raw_tot + $b) * 1000000)
       |      // ((1 + raw_c) * (tgt_tot + $b)) AS BIGINT) AS w,
       |    raw_tot, tgt_tot
       |  FROM wt),
       |warr AS (
       |  SELECT list(coalesce(wts.w,
       |      CAST(((t.raw_tot + $b) * 1000000) // (t.tgt_tot + $b) AS BIGINT))
       |    ORDER BY bb.b) AS warr
       |  FROM (SELECT unnest(range(0, $b)) AS b) bb
       |  LEFT JOIN wts ON bb.b = wts.b
       |  CROSS JOIN (SELECT raw_tot, tgt_tot FROM wt LIMIT 1) t),
       |scored AS (
       |  SELECT tk.doc_id, tk.lang, CAST(len(tk.toks) AS BIGINT) AS n_tok,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(tk.toks, w -> warr.warr[${bkt("w")} + 1])),
       |      (a, x) -> a + x) AS score
       |  FROM tk CROSS JOIN warr
       |  WHERE len(tk.toks) > 0)
       |SELECT doc_id, lang, n_tok, CAST(score AS BIGINT) AS score,
       |  CAST(score // n_tok AS BIGINT) AS avg_w_ppm
       |FROM scored
       |ORDER BY avg_w_ppm DESC, doc_id ASC LIMIT $DsirKeep""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "curate_pipeline" -> curatePipelineSql(10L),
    "curate_dsir_select" -> dsirOracle,

    "mix_upsample" ->
      s"""WITH rated AS (
         |  SELECT doc_id, lang,
         |    (CASE lang $sqlMixRateCase ELSE 1.0 END) AS rate,
         |    ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      % $HashMod % 10000 AS b
         |  FROM documents),
         |cnt AS (
         |  SELECT doc_id, lang,
         |    CAST(floor(rate) AS BIGINT) +
         |    (CASE WHEN b < CAST(round(rate * 10000) AS BIGINT)
         |                    - CAST(floor(rate) AS BIGINT) * 10000
         |          THEN 1 ELSE 0 END) AS n_copies
         |  FROM rated)
         |SELECT doc_id, lang, n_copies, t.c AS copy
         |FROM cnt, unnest(range(1, n_copies + 1)) AS t(c)
         |WHERE n_copies >= 1""".stripMargin,

    "mix_token_budget" ->
      s"""WITH meta AS (
         |  SELECT doc_id, lang,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tokens,
         |    ('0x' || substr(md5('budget:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      % $HashMod AS pri
         |  FROM documents)
         |SELECT doc_id, lang, n_tokens, cum_before FROM (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY pri ASC, doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS cum_before
         |  FROM meta) s
         |WHERE cum_before < (CASE lang $sqlMixBudgetCase ELSE 0 END)""".stripMargin,

    // epochPlan: exact-integer two-round waterfall replay — τ=½ ppm
    // weights, per-round LEAST against the epoch cap, truncating divs
    "mix_epoch_plan" ->
      s"""WITH $epochPlanCtes
         |SELECT source, avail AS avail_tokens, weight_ppm,
         |  a2 AS alloc_tokens,
         |  (a2 * 1000000) // GREATEST(avail, 1) AS epochs_ppm,
         |  (a2 = cap) AS capped
         |FROM r2""".stripMargin,

    "mix_unimax" -> unimaxOracle(UnimaxRounds),
    "mix_unimax_materialize" -> unimaxMaterializeOracle(UnimaxRounds),

    // epochMaterialize: the same waterfall CTEs feeding the
    // mix_upsample copy rule (whole epochs + md5-bucket fractional)
    "mix_epoch_materialize" ->
      s"""WITH $epochPlanCtes,
         |eppm AS (
         |  SELECT source, (a2 * 1000000) // GREATEST(avail, 1) AS epochs_ppm
         |  FROM r2),
         |cnt AS (
         |  SELECT d.doc_id, d.source,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tokens,
         |    epochs_ppm // 1000000 +
         |    (CASE WHEN ('0x' || substr(md5('epoch:' || d.doc_id::VARCHAR),
         |        1, 15))::BIGINT % $HashMod % 10000
         |        < (epochs_ppm % 1000000) // 100
         |     THEN 1 ELSE 0 END) AS n_copies
         |  FROM documents d JOIN eppm USING (source))
         |SELECT doc_id, source, n_tokens, n_copies, t.c AS copy
         |FROM cnt, unnest(range(1, n_copies + 1)) AS t(c)
         |WHERE n_copies >= 1""".stripMargin,

    "mix_temperature" ->
      s"""WITH tk AS (
         |  SELECT lang, doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |pl AS (
         |  SELECT lang, COUNT(1) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |  FROM tk GROUP BY 1),
         |r0 AS (
         |  SELECT lang, n_docs, n_tokens,
         |    CAST(round(sqrt(n_tokens::DOUBLE) * 1e6) AS BIGINT) AS s_u
         |  FROM pl),
         |r2 AS (
         |  SELECT lang, n_docs, n_tokens, s_u, rate,
         |    CAST(floor(rate) AS BIGINT) AS whole,
         |    CAST(round(rate * 10000) AS BIGINT)
         |      - CAST(floor(rate) AS BIGINT) * 10000 AS frac_bp
         |  FROM (
         |    SELECT *,
         |      (s_u::DOUBLE / (CAST(SUM(s_u) OVER () AS BIGINT))::DOUBLE) *
         |      ((CAST(SUM(n_tokens) OVER () AS BIGINT))::DOUBLE / n_tokens::DOUBLE)
         |        AS rate
         |    FROM r0) s),
         |cp AS (
         |  SELECT tk.lang,
         |    CAST(SUM(r2.whole + (CASE WHEN
         |      ('0x' || substr(md5('temp:' || tk.doc_id::VARCHAR), 1, 15))::BIGINT
         |        % $HashMod % 10000 < r2.frac_bp
         |      THEN 1 ELSE 0 END)) AS BIGINT) AS n_out
         |  FROM tk JOIN r2 USING (lang) GROUP BY 1)
         |SELECT r2.lang, r2.n_docs, r2.n_tokens, r2.s_u,
         |  round(r2.rate, 6) AS rate_r6, cp.n_out
         |FROM r2 JOIN cp USING (lang)""".stripMargin,

    // Verbatim replay of the 4-round Feistel: w from the same
    // max(doc_id) bit length (params CTE — a one-row cross join), each
    // round one CTE; aliases never shadow within a SELECT, so `r AS l,
    // xor(l, …) AS r` reads the PRIOR round's columns in both the CTE
    // chain here and the Column fold in the engine.
    "export_shuffle" ->
      s"""WITH ${feistelCtes("documents")}
         |SELECT doc_id, perm, CAST(perm % 16 AS INT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY perm % 16 ORDER BY perm ASC)
         |    AS BIGINT) AS pos
         |FROM pm""".stripMargin,

    // exportPackedSequences: the same Feistel chain + per-shard
    // running token sums, split into (seq_id, offset) by the budget
    "export_packed_sequences" ->
      s"""WITH ${feistelCtes("documents")},
         |m AS (
         |  SELECT d.doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens,
         |    pm.perm
         |  FROM documents d JOIN pm USING (doc_id)),
         |s AS (
         |  SELECT doc_id, n_tokens, CAST(perm % 16 AS INT) AS shard,
         |    COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY perm % 16
         |      ORDER BY perm ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS cum_before
         |  FROM m)
         |SELECT doc_id, n_tokens, shard,
         |  cum_before // 512 AS seq_id, cum_before % 512 AS offset
         |FROM s""".stripMargin,

    // packEfficiency: the packed-sequences cum-window once, then the
    // budget grid over the narrow frame — ceil-div sequence counts,
    // tail waste in ppm, boundary-straddle counts
    "export_pack_efficiency" ->
      s"""WITH ${feistelCtes("documents")},
         |m AS (
         |  SELECT d.doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens,
         |    pm.perm
         |  FROM documents d JOIN pm USING (doc_id)),
         |s AS (
         |  SELECT doc_id, n_tokens, CAST(perm % 16 AS INT) AS shard,
         |    COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY perm % 16
         |      ORDER BY perm ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS cum_before
         |  FROM m),
         |b AS (SELECT unnest([${PackBudgets.mkString(", ")}]::BIGINT[]) AS budget),
         |ps AS (
         |  SELECT b.budget, s.shard, CAST(SUM(s.n_tokens) AS BIGINT) AS toks,
         |    CAST(SUM(CASE WHEN s.n_tokens > 0 AND
         |      (s.cum_before + s.n_tokens - 1) // b.budget
         |        > s.cum_before // b.budget
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
         |  FROM s, b GROUP BY 1, 2)
         |SELECT budget,
         |  CAST(SUM((toks + budget - 1) // budget) AS BIGINT) AS n_seqs,
         |  CAST(SUM((toks + budget - 1) // budget) * budget AS BIGINT)
         |    AS capacity_tokens,
         |  CAST(SUM(toks) AS BIGINT) AS used_tokens,
         |  CAST(((SUM((toks + budget - 1) // budget) * budget - SUM(toks))
         |      * 1000000)
         |    // GREATEST(SUM((toks + budget - 1) // budget) * budget, 1)
         |    AS BIGINT) AS waste_ppm,
         |  CAST(SUM(n_straddle) AS BIGINT) AS n_straddle
         |FROM ps GROUP BY 1""".stripMargin,

    // annealPlan: full-corpus budget split (div-first b2), the Gopher
    // keep rules (stream_quality_keep's bodies) carve the phase-2
    // subset, then the waterfall replay once per phase
    "mix_anneal_plan" ->
      s"""WITH fb AS (
         |  SELECT CAST(SUM(len($sqlToks)) AS BIGINT) * $EpochBudgetMult AS b
         |  FROM documents),
         |ph AS (SELECT b, (b // 1000000) * $AnnealFracPpm AS b2 FROM fb),
         |keep AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      len($sqlToks) AS n_tok,
         |      list_reduce(list_prepend(0::BIGINT,
         |        list_transform($sqlToks, x -> CAST(length(x) AS BIGINT))),
         |        (a, b) -> a + b) AS sum_wlen,
         |      len(list_filter($sqlToks,
         |        x -> list_contains(['the','and','of','to','is'], x)))
         |        AS n_stop,
         |      len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         |      length(text) AS n_chars
         |    FROM documents)
         |  WHERE n_tok >= 5 AND n_tok <= 100000
         |    AND sum_wlen >= n_tok * 3 AND sum_wlen <= n_tok * 10
         |    AND n_stop >= 1 AND n_punct * 10 <= n_chars),
         |d2 AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
         |${waterfallCtes("p1_", "documents", "(SELECT b - b2 FROM ph)")},
         |${waterfallCtes("p2_", "d2", "(SELECT b2 FROM ph)")}
         |SELECT 1::BIGINT AS phase, source, avail AS avail_tokens,
         |  weight_ppm, a2 AS alloc_tokens,
         |  (a2 * 1000000) // GREATEST(avail, 1) AS epochs_ppm,
         |  (a2 = cap) AS capped
         |FROM p1_r2
         |UNION ALL
         |SELECT 2::BIGINT, source, avail, weight_ppm, a2,
         |  (a2 * 1000000) // GREATEST(avail, 1), (a2 = cap)
         |FROM p2_r2""".stripMargin,

    // mixInterleave: per-source dense hash-order positions, stride
    // = 10^12 div w_ppm, vtime = (pos+1)*stride — exact integers
    "mix_interleave" ->
      s"""WITH meta AS (
         |  SELECT doc_id, lang,
         |    ('0x' || substr(md5('ilv:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      % $HashMod AS pri,
         |    (CASE lang $sqlMixPpmCase ELSE 0 END)::BIGINT AS w_ppm
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, lang, w_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY pri ASC, doc_id ASC) - 1 AS BIGINT) AS src_pos
         |  FROM meta WHERE w_ppm > 0)
         |SELECT doc_id, lang, src_pos, w_ppm,
         |  CAST((src_pos + 1) * ($StrideScale // w_ppm) AS BIGINT) AS vtime
         |FROM pos""".stripMargin,

    // curateCurriculum: the txt_entropy CTEs (difficulty) joined to the
    // Feistel permutation (intra-band order), banded by absolute
    // bits-per-token, positions per (band, shard)
    "curate_curriculum" ->
      s"""WITH cnt AS (
         |  SELECT doc_id, tok, COUNT(1) AS n
         |  FROM (SELECT doc_id, unnest($sqlToks) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n * ${TextOps.sqlL2M("n")}) AS BIGINT) AS s_nl
         |  FROM cnt GROUP BY 1),
         |ent AS (
         |  SELECT doc_id,
         |    CAST((n_tokens * ${TextOps.sqlL2M("n_tokens")} - s_nl) // n_tokens
         |      AS BIGINT) AS ent_mbits
         |  FROM per),
         |${feistelCtes("documents")},
         |j AS (
         |  SELECT e.doc_id, e.ent_mbits,
         |    CAST(LEAST(3, GREATEST(0, e.ent_mbits // 1000)) AS INT) AS band,
         |    CAST(pm.perm % $CurriculumShards AS INT) AS shard, pm.perm AS perm
         |  FROM ent e JOIN pm ON pm.doc_id = e.doc_id)
         |SELECT doc_id, ent_mbits, band, shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY band, shard ORDER BY perm ASC)
         |    AS BIGINT) AS pos
         |FROM j""".stripMargin,

    "export_shards" ->
      s"""WITH meta AS (
         |  SELECT doc_id, n_chars,
         |    ('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      % $HashMod AS pri
         |  FROM documents)
         |SELECT doc_id, CAST(pri % 16 AS INT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY pri % 16
         |    ORDER BY pri ASC, doc_id ASC) AS BIGINT) AS pos,
         |  CAST(SUM(n_chars) OVER (PARTITION BY pri % 16
         |    ORDER BY pri ASC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_bytes
         |FROM meta""".stripMargin,

    "txt_repetition" ->
      s"""WITH base AS (SELECT doc_id, $sqlToks AS w FROM documents),
         |uni AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens, COUNT(1) AS n_distinct_toks,
         |    MAX(n) AS top_tok_n
         |  FROM (SELECT doc_id, tok, COUNT(1) AS n
         |        FROM (SELECT doc_id, unnest(w) AS tok FROM base)
         |        GROUP BY 1, 2)
         |  GROUP BY 1),
         |bi AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams, COUNT(1) AS n_distinct_bigrams,
         |    MAX(n) AS top_bigram_n
         |  FROM (SELECT doc_id, g, COUNT(1) AS n
         |        FROM (SELECT doc_id,
         |                unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
         |              FROM base)
         |        GROUP BY 1, 2)
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(u.n_tokens, 0) AS n_tokens,
         |  COALESCE(u.n_distinct_toks, 0) AS n_distinct_toks,
         |  COALESCE(u.top_tok_n, 0) AS top_tok_n,
         |  COALESCE(b.n_bigrams, 0) AS n_bigrams,
         |  COALESCE(b.n_distinct_bigrams, 0) AS n_distinct_bigrams,
         |  COALESCE(b.top_bigram_n, 0) AS top_bigram_n,
         |  CASE WHEN COALESCE(b.n_bigrams, 0) > 0
         |    THEN (b.n_bigrams - b.n_distinct_bigrams)::DOUBLE / b.n_bigrams::DOUBLE
         |    ELSE 0.0 END AS dup_bigram_frac,
         |  CASE WHEN COALESCE(u.n_tokens, 0) > 0
         |    THEN (COALESCE(b.top_bigram_n, 0) * 2)::DOUBLE / u.n_tokens::DOUBLE
         |    ELSE 0.0 END AS top_bigram_frac
         |FROM documents d
         |LEFT JOIN uni u USING (doc_id)
         |LEFT JOIN bi b USING (doc_id)""".stripMargin,

    "pii_redact" ->
      s"""WITH synth AS (
         |  SELECT doc_id,
         |    'contact user' || doc_id::VARCHAR || '@' || source || '.net tel 555-' ||
         |    lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' ip 10.0.' ||
         |    (doc_id % 256)::VARCHAR || '.7 ' || text AS s
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(s, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(s, '$Ipv4Re')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(s, '$PhoneRe')) AS BIGINT) AS n_phones,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(s, '$EmailRe', '<EMAIL>', 'g'),
         |      '$Ipv4Re', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS redacted
         |FROM synth""".stripMargin,

    "sample_stratified" -> {
      val thrCase = SampleThresholds
        .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
      s"""SELECT event_type, COUNT(1) AS n_total,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(SUM(CASE WHEN keep THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sampled_value_c
         |FROM (
         |  SELECT event_type, value,
         |    ('0x' || substr(md5('smp:' || event_id::VARCHAR), 1, 15))::BIGINT
         |      % $HashMod % 10000
         |      < (CASE event_type $thrCase ELSE 0 END) AS keep
         |  FROM events)
         |GROUP BY event_type""".stripMargin
    },

    "curate_keep" ->
      s"""WITH base AS (SELECT doc_id, $sqlToks AS w FROM documents),
         |uni AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens
         |  FROM (SELECT doc_id, tok, COUNT(1) AS n
         |        FROM (SELECT doc_id, unnest(w) AS tok FROM base)
         |        GROUP BY 1, 2)
         |  GROUP BY 1),
         |bi AS (
         |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         |    COUNT(1) AS n_distinct_bigrams
         |  FROM (SELECT doc_id, g, COUNT(1) AS n
         |        FROM (SELECT doc_id,
         |                unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
         |              FROM base)
         |        GROUP BY 1, 2)
         |  GROUP BY 1),
         |keepers AS (
         |  SELECT doc_id, lang, source FROM documents
         |  QUALIFY ROW_NUMBER() OVER (
         |    PARTITION BY md5(lower(trim(text))) ORDER BY doc_id ASC) = 1)
         |SELECT k.doc_id, k.source,
         |  COALESCE(u.n_tokens, 0) AS n_tokens,
         |  CASE WHEN COALESCE(b.n_bigrams, 0) > 0
         |    THEN (b.n_bigrams - b.n_distinct_bigrams)::DOUBLE / b.n_bigrams::DOUBLE
         |    ELSE 0.0 END AS dup_bigram_frac
         |FROM keepers k
         |LEFT JOIN uni u USING (doc_id)
         |LEFT JOIN bi b USING (doc_id)
         |WHERE k.lang = 'en'
         |  AND COALESCE(u.n_tokens, 0) BETWEEN 30 AND 100
         |  AND (CASE WHEN COALESCE(b.n_bigrams, 0) > 0
         |    THEN (b.n_bigrams - b.n_distinct_bigrams)::DOUBLE / b.n_bigrams::DOUBLE
         |    ELSE 0.0 END) < 0.05""".stripMargin,

    "event_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
        |  JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e
        |  JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2 GROUP BY 1)
        |SELECT '1_view' AS stage, COUNT(1) AS n_users FROM v
        |UNION ALL
        |SELECT '2_click_after_view', COUNT(1) FROM c
        |UNION ALL
        |SELECT '3_purchase_after_click', COUNT(1) FROM p""".stripMargin,

    "curate_domain_cap" ->
      s"""SELECT doc_id, source, rk FROM (
         |  SELECT doc_id, source, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY source
         |    ORDER BY ('0x' || substr(md5('cap:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      % $HashMod ASC, doc_id ASC) AS BIGINT) AS rk
         |  FROM documents)
         |WHERE rk <= 10""".stripMargin,

    "sample_uniform_k" ->
      s"""SELECT doc_id, source, lang FROM documents
         |ORDER BY ('0x' || substr(md5('unif:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |  % $HashMod ASC, doc_id ASC
         |LIMIT 100""".stripMargin,

    "event_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |cohort AS (SELECT user_id, MIN(wk) AS cohort FROM ev GROUP BY 1)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |  CAST((wk - cohort) // 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY cohort, week_offset""".stripMargin,

    "sample_weighted" ->
      s"""SELECT doc_id, source, n_chars, priority FROM (
         |  SELECT doc_id, source, n_chars,
         |    ROUND(-ln(
         |      (('0x' || substr(md5('wgt:' || doc_id::VARCHAR), 1, 15))::BIGINT
         |        % $HashMod + 1)::DOUBLE / ${TextOps.HashMod + 1L}.0)
         |      / n_chars, 9) AS priority
         |  FROM documents
         |  WHERE n_chars > 0)
         |ORDER BY priority ASC, doc_id ASC
         |LIMIT 100""".stripMargin,

    "event_item_cooccur" ->
      """WITH ui AS (
        |  SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    COUNT(1) AS n
        |  FROM events GROUP BY 1, 2),
        |capped AS (
        |  SELECT user_id, item FROM ui
        |  QUALIFY ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY n DESC, item ASC) <= 20)
        |SELECT a.item AS i1, b.item AS i2,
        |  CAST(COUNT(1) AS BIGINT) AS n_users
        |FROM capped a JOIN capped b
        |  ON a.user_id = b.user_id AND a.item < b.item
        |GROUP BY 1, 2
        |HAVING COUNT(1) >= 3""".stripMargin
  )
}
