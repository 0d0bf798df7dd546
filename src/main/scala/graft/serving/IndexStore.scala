package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{DedupOps, SimilarityOps, TextOps}
import graft.ops.SimilarityOps.{definedNrm, norm}

/** PHYSICAL serving-index artifacts — the offline half of the
  * offline/online split, made real: `serve_index_build` scores a cell
  * layout, this WRITES it (and the attribution family's band/shingle
  * tables) to storage so the online serves read a prebuilt index
  * instead of re-deriving corpus-sized state inside every query.
  *
  * Why it matters at 100 TB: Structured Streaming re-executes the
  * static side of a stream-static join EVERY micro-batch. A serve
  * whose static side is "assign the raw corpus to cells" therefore
  * pays a full corpus scan + kernel pass per micro-batch, even though
  * the join volume is only the probed cells. Persisting the
  * assignment PARTITIONED BY CELL turns that into: read only the
  * partitions this batch probes — the probed-cid literal filter
  * becomes a parquet PartitionFilter (spec-pinned), so a micro-batch's
  * IO is |probed cells|/K of the index, not the corpus.
  *
  * GENERATIONS (round 14): every artifact lives under a numbered
  * generation directory `dir/g<N>/<table>` with a zero-byte
  * `dir/manifest-<N>.json` committed AFTER the generation's tables
  * are fully written. Readers resolve the CURRENT generation by
  * listing manifests and taking the highest N — a new manifest
  * appears atomically (create + close), so a cold load during a
  * rebuild or compaction always sees a complete generation: either
  * the old one (manifest not yet committed) or the new one (committed
  * ⇒ tables finished). This replaces the earlier staged-directory
  * renames, which had a window between `rename(t→t_old)` and
  * `rename(t_compacting→t)` where the live path did not exist for a
  * cold reader, and whose unchecked rename results could strand the
  * index with no consistent copy on a half-failed swap. A failed
  * generation write now simply throws before its manifest exists —
  * the previous generation stays current and intact, and the orphaned
  * `g<N+1>` directory is overwritten by the next attempt.
  *
  * READER grace period (round 15): a commit retains the newest
  * [[GenRetain]] committed generations and GC's only older ones plus
  * manifest-less orphans — the snapshot-retention knob every table
  * format exposes. A WARM reader (an [[AnnIndex]]/[[KnnIndex]] loaded
  * before a compaction, still serving lazy DataFrames) therefore
  * keeps its parquet files through the next commit; it loses them
  * only if it outlives a SECOND commit — the documented reader
  * contract (re-resolve per micro-batch via [[GenCached]] to never
  * fall behind).
  *
  * WRITER coordination: generation writes are single-writer by
  * contract, and [[nextGenRoot]] enforces it BEFORE any directory
  * mutation — an `intent-N` claim file created with overwrite=false,
  * so of two racing writers that resolved the same next generation
  * the loser fails before it can delete or overwrite anything of the
  * winner's (the commit-time-only manifest check, kept as a second
  * layer, detected the collision but could not prevent that damage).
  * A crashed writer's stale claim fails the next attempt loudly;
  * [[clearStaleIntent]] is the admin recovery path.
  *
  * Layouts (all plain parquet, loadable with explicit schemas so no
  * inference step can drift a type):
  *  - ANN:  `dir/centroids` (cid, c_emb, c_nrm — K rows) and
  *          `dir/assign` (n_id, n_emb, n_nrm) partitioned by `cid`
  *          — [[graft.streaming.StreamAnnServe.assignCorpus]]'s
  *          output, exactly (parquet roundtrips float/double values
  *          bit-exactly, so a serve from the artifact reproduces the
  *          in-plan serve row for row; StreamAnnServeSpec pins it).
  *  - Attribution: `dir/bands` (t_id, band, key) partitioned by
  *          `pb = band·B + hash(key) mod B` (the band-bucket layout —
  *          a query's band keys prune to their colliding buckets) and
  *          `dir/shingles` (t_id, t_shs) partitioned by
  *          `tb = hash(t_id) mod B` (candidate t_ids prune the rerank
  *          side the same way).
  *  - Text: `dir/postings` (term, doc_id, dl, tf) partitioned by
  *          `tb = hash(term) mod B` (dl denormalized onto the posting
  *          so scoring never joins a corpus-sized doc-length table),
  *          `dir/terms` (term, df, idf_milli) under the same
  *          bucketing, and `dir/stats` (n_docs, n_tokens — one row):
  *          everything [[graft.ops.TextOps.bm25TopDocs]] derives per
  *          query, precomputed once.
  */
object IndexStore {

  /** Scratch root for driver-query artifacts — keyed by sf dir so
    * concurrent scale factors never cross; overwritten per build (the
    * Coverage.rtDir convention: oracles read the parquet TRUTH, never
    * this path, so its location is free to vary per machine). */
  def scratchDir(sfDir: String, what: String): String =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_serving/" +
      s"${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}/$what"

  /** Per-process build-once guard: a production index is built by an
    * offline job and SERVED many times — the serving queries model
    * that by ensuring the artifact once per JVM and serving from it
    * thereafter (so a bench's repeat runs measure SERVING, with the
    * build cost measured separately by `serve_index_write`, which
    * always writes). Rebuilds are explicit: call the write* method. */
  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def once(dir: String)(build: => Unit): Unit =
    if (!built.contains(dir)) synchronized {
      if (!built.contains(dir)) { build; built.add(dir) }
    }

  // ------------------------------------------- generation manifests

  private val ManifestRe = "manifest-(\\d+)\\.json".r

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** The artifact's current generation: highest committed manifest
    * number, or None for an empty/legacy directory. */
  def currentGen(spark: SparkSession, dir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else f.listStatus(p).iterator.flatMap(s => s.getPath.getName match {
      case ManifestRe(n) => Some(n.toInt)
      case _ => None
    }).reduceOption(_ max _)
  }

  /** A table's path within a RESOLVED generation (None = the
    * pre-generation flat layout, kept loadable for artifacts written
    * by older builds). Loads/appends/compactions resolve
    * [[currentGen]] ONCE and derive every table path from that one
    * snapshot — resolving per table would let a concurrent commit
    * land between two resolutions and hand the reader a torn
    * mixed-generation index (gen-N centroids with gen-N+1
    * assignments), the exact failure the manifest scheme exists to
    * prevent. */
  private def tableDirAt(dir: String, gen: Option[Int],
      table: String): String =
    gen.map(g => s"$dir/g$g/$table").getOrElse(s"$dir/$table")

  /** Resolve a SINGLE table's current path — for callers (specs,
    * tools) inspecting one table; multi-table loads go through one
    * [[currentGen]] + [[tableDirAt]] snapshot instead. */
  def tableDir(spark: SparkSession, dir: String, table: String): String =
    tableDirAt(dir, currentGen(spark, dir), table)

  /** Committed generations retained after a commit — the reader grace
    * period (see the object doc): 2 keeps the previous generation
    * alive for warm readers that loaded it before the commit; they
    * must re-resolve (one manifest list — [[GenCached]]) before a
    * SECOND commit lands. */
  val GenRetain = 2

  /** Commit a generation: create its manifest (atomic appearance —
    * readers list manifests, and a created file is either absent or
    * complete; overwrite=false, a second detection layer behind the
    * [[nextGenRoot]] intent claim), then GC everything in the
    * artifact directory outside the newest [[GenRetain]] committed
    * generations — older generations and their manifests, this
    * generation's now-consumed intent file, manifest-less orphans of
    * failed attempts, and a superseded pre-generation flat layout
    * (the directory is wholly owned by IndexStore: writers create
    * it). */
  private def commitGen(spark: SparkSession, dir: String, gen: Int): Unit = {
    val f = fs(spark, dir)
    val out = f.create(
      new org.apache.hadoop.fs.Path(s"$dir/manifest-$gen.json"), false)
    out.write(s"""{"gen":$gen}""".getBytes("UTF-8"))
    out.close()
    val committed = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .iterator.flatMap(_.getPath.getName match {
        case ManifestRe(n) => Some(n.toInt)
        case _ => None
      }).toSeq.sorted.takeRight(GenRetain)
    val keep = committed.flatMap(g => Seq(s"g$g", s"manifest-$g.json")).toSet
    f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filterNot(s => keep(s.getPath.getName))
      .foreach(s => f.delete(s.getPath, true))
  }

  /** Start the NEXT generation: CLAIM it, then return its root path
    * (cleared of any orphan left by a failed earlier attempt — an
    * orphan has no manifest, so no reader ever resolved it).
    *
    * The claim is an `intent-N` file created with overwrite=false
    * BEFORE anything in the directory is touched, so a racing writer
    * that resolved the same next generation fails HERE — before it
    * can delete the winner's in-progress root or clobber its tables
    * (the r15 ADVICE hole: the old commit-time-only check detected
    * the collision but could not prevent the damage). After claiming
    * we re-check that no manifest for this generation appeared (a
    * racer that committed between our [[currentGen]] read and the
    * claim has already had its intent GC'd by [[commitGen]], so the
    * claim alone would not catch it) and back off, releasing the
    * claim. [[commitGen]]'s GC consumes the intent on success.
    *
    * Crash recovery: a writer that died between claim and commit
    * leaves a stale intent that fails the next attempt loudly; the
    * operator (who knows no writer is live — single-writer remains
    * the contract ACROSS artifacts' admin plane) clears it with
    * [[clearStaleIntent]]. Fail-stop over silent takeover: an
    * automatic takeover could not distinguish a crashed writer from
    * a slow live one. */
  private def nextGenRoot(spark: SparkSession, dir: String): (Int, String) = {
    val gen = currentGen(spark, dir).map(_ + 1).getOrElse(0)
    val root = s"$dir/g$gen"
    val f = fs(spark, dir)
    val intent = new org.apache.hadoop.fs.Path(s"$dir/intent-$gen")
    try f.create(intent, false).close()
    catch { case _: java.io.IOException => throw new IllegalStateException(
      s"generation $gen of $dir is claimed by another writer " +
      "(or a crashed one: clearStaleIntent) — refusing to touch it") }
    if (f.exists(new org.apache.hadoop.fs.Path(s"$dir/manifest-$gen.json"))) {
      f.delete(intent, false)
      throw new IllegalStateException(
        s"generation $gen of $dir was committed by a racing writer " +
        "while this one was resolving — re-resolve and retry")
    }
    f.delete(new org.apache.hadoop.fs.Path(root), true)
    (gen, root)
  }

  /** Admin-plane crash recovery: drop stale `intent-N` claims left by
    * a writer that died between [[nextGenRoot]] and [[commitGen]].
    * Call ONLY when no writer is live on `dir` (see [[nextGenRoot]]'s
    * fail-stop rationale). */
  def clearStaleIntent(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (f.exists(p)) f.listStatus(p)
      .filter(_.getPath.getName.matches("intent-\\d+"))
      .foreach(s => f.delete(s.getPath, false))
  }

  /** A generation-tracking index cache for long-running serves: [[get]]
    * re-resolves [[currentGen]] plus the generation's tombstone file
    * count (one manifest list + one bounded tree walk of the tiny
    * tombstone table — cheap) and reloads through the gen-pinned
    * loader ONLY when either moved, so a streaming serve calling it
    * at every micro-batch boundary picks up a mid-stream commit OR a
    * mid-stream DELETE by the next batch while paying nothing when
    * the artifact is quiet. The loader receives the resolved gen and
    * must derive every table path from it (the [[tableDirAt]]
    * resolve-once discipline). */
  final class GenCached[T](spark: SparkSession, dir: String,
      load: Option[Int] => T) {
    private var cached: Option[((Option[Int], Long), T)] = None
    def get(): T = synchronized {
      val gen = currentGen(spark, dir)
      val key = (gen, tombStamp(spark, dir, gen))
      cached match {
        case Some((k, idx)) if k == key => idx
        case _ =>
          val idx = load(gen)
          cached = Some((key, idx))
          idx
      }
    }
  }

  /** Change stamp of a generation's tombstone table (−1 = none):
    * deletes only ever ADD files, so the file count is a monotone,
    * clock-free edit counter. */
  private def tombStamp(spark: SparkSession, dir: String,
      gen: Option[Int]): Long = {
    val p = new org.apache.hadoop.fs.Path(tableDirAt(dir, gen, "tombstones"))
    val f = fs(spark, dir)
    if (!f.exists(p)) -1L else f.getContentSummary(p).getFileCount
  }

  // ------------------------------------------------------- tombstones

  /** DELETE lifecycle (round 15) — the artifact operation every real
    * training-data pipeline needs constantly: decontamination and
    * takedown must remove docs/vectors from ALREADY-BUILT serving
    * indexes without a full rebuild. Three phases:
    *
    *  1. [[deleteAnn]]/[[deleteKnn]]/[[deleteText]] append the ids to
    *     an id-bucketed `tombstones` table INSIDE the current
    *     generation (directory-additive, like the appends — a
    *     concurrent reader of the generation keeps a consistent view;
    *     the delete is visible from the next load on).
    *  2. Every load MASKS: one broadcast anti-join against the
    *     tombstone ids on the served tables (deletion sets are
    *     takedown/decontamination lists — bounded, never
    *     corpus-sized). The mask composes with the serve-side
    *     ProbePrune partition pruning: the anti-join sits above the
    *     scan, so the probed-bucket literal filters still push down
    *     to parquet PartitionFilters (spec-pinned). For the GRAPH,
    *     edges are masked in BOTH directions (src and dst — the
    *     back-edge mirror is what made deleted nodes findable) and
    *     the driver-side entry points are filtered, so a deleted node
    *     is neither returned nor routed through; connectivity THROUGH
    *     a deleted node is lost until the next rebuild, the strict
    *     removal semantics a takedown requires.
    *  3. The next compaction ([[compactAnn]]/[[compactKnn]]) applies
    *     the mask PHYSICALLY — the rewritten generation contains
    *     neither the deleted rows nor a tombstone table. For the text
    *     index the physical drop is the [[writeText]] rebuild; until
    *     then postings are masked at load and the df/idf/corpus stats
    *     serve stale (the deleted-docs-visible-in-stats behavior
    *     every lexical index has between compactions, documented).
    *
    * Deleting a vector that seeded the FROZEN structure (a
    * centroid-sample or entry-point id) removes the servable ROW but
    * not the derived structure — centroid vectors are trained
    * aggregates, retained until the next rebuild, exactly like a
    * model trained before the takedown. Re-inserting a deleted id
    * requires a compaction first (the tombstone wins over a later
    * append until physically dropped — documented). */
  private val TombBuckets = 32

  private val tombSchema = StructType(Seq(
    StructField("n_id", LongType),
    StructField("db", IntegerType)))

  private def writeTombstones(ids: DataFrame, dir: String,
      idCol: String): Unit = {
    val spark = ids.sparkSession
    val gen = currentGen(spark, dir)
    ids.select(col(idCol).cast("long").as("n_id")).distinct()
      .withColumn("db", pmod(xxhash64(col("n_id")), lit(TombBuckets)).cast("int"))
      .repartition(col("db"))
      .write.mode("append").partitionBy("db")
      .parquet(tableDirAt(dir, gen, "tombstones"))
  }

  /** The generation's tombstone id table, if any deletes happened.
    * Deduped HERE, at the single accessor: [[writeTombstones]] dedupes
    * only within one call, so repeated/overlapping delete calls (a
    * retried takedown batch) accumulate duplicate n_id rows in the
    * append-mode table, and a raw join against them would count one
    * row per duplicate (compactText's nDeleted, hence n_docs and
    * every idf_milli — the r15 ADVICE finding). */
  private def tombstonesAt(spark: SparkSession, dir: String,
      gen: Option[Int]): Option[DataFrame] = {
    val path = tableDirAt(dir, gen, "tombstones")
    if (!fs(spark, dir).exists(new org.apache.hadoop.fs.Path(path))) None
    // localCheckpoint: a load masks 3-4 tables against this frame, and
    // each mask builds its own broadcast — without the checkpoint every
    // broadcast re-runs the scan + the dedupe exchange (r16 profile:
    // the r15 dedupe fix re-executed 4x per delete-lifecycle load);
    // with it the tiny deduped id set materializes once
    else Some(spark.read.schema(tombSchema).parquet(path)
      .select("n_id").distinct().localCheckpoint(eager = false))
  }

  /** Mask `df` against the tombstones (broadcast anti-join on the
    * bounded deletion set); identity when no deletes happened, so an
    * undeleted artifact's plans are byte-identical to pre-round-15. */
  private def maskDeleted(df: DataFrame, idCol: String,
      tomb: Option[DataFrame]): DataFrame =
    tomb.fold(df)(t => df.join(
      broadcast(t.withColumnRenamed("n_id", idCol)), Seq(idCol), "left_anti"))

  /** Tombstone vectors in the ANN artifact — masked from every load
    * from now on, physically dropped at the next [[compactAnn]]. */
  def deleteAnn(ids: DataFrame, dir: String): Unit =
    writeTombstones(ids, dir, "vec_id")

  /** Tombstone nodes in the graph artifact — nodes, both edge
    * directions, and entry points masked from every load, physically
    * dropped at the next [[compactKnn]]. */
  def deleteKnn(ids: DataFrame, dir: String): Unit =
    writeTombstones(ids, dir, "vec_id")

  /** Tombstone documents in the text artifact — postings masked from
    * every load; df/idf/stats serve stale until the next
    * [[compactText]] or [[writeText]] rebuild (see the tombstone doc
    * above). */
  def deleteText(ids: DataFrame, dir: String): Unit =
    writeTombstones(ids, dir, "doc_id")

  /** Tombstone train documents in the attribution artifact — band and
    * shingle rows masked from every load (takedown: the doc stops
    * appearing as an attribution match), physically dropped at the
    * next [[writeAttr]] rebuild. */
  def deleteAttr(ids: DataFrame, dir: String): Unit =
    writeTombstones(ids, dir, "doc_id")

  def ensureAnn(corpus: DataFrame, dir: String,
      nCentroids: Int = SimilarityOps.IvfCentroids): Unit =
    once(dir)(writeAnn(corpus, dir, nCentroids))

  def ensureAttr(train: DataFrame, dir: String,
      textCol: String = "text"): Unit =
    once(dir)(writeAttr(train, dir, textCol))

  def ensureText(docs: DataFrame, dir: String,
      textCol: String = "text"): Unit =
    once(dir)(writeText(docs, dir, textCol))

  // ------------------------------------------------------------- ANN

  /** A loaded ANN serving index: the driver-constant coarse quantizer
    * (K·dim floats — the index-build artifact, never corpus-sized)
    * plus the cell-partitioned corpus assignment frame. */
  final case class AnnIndex(centroids: Seq[(Long, Seq[Float])],
      assign: DataFrame)

  /** Build + persist the IVF serving index: first-K centroids (the
    * batch family's convention) and the corpus cell assignment,
    * partitioned by cid. One corpus scan for the assignment (the
    * narrow cell_probe projection — no argmax shuffle), one bounded
    * scan for the K centroids. */
  def writeAnn(corpus: DataFrame, dir: String,
      nCentroids: Int = SimilarityOps.IvfCentroids): Unit = {
    val spark = corpus.sparkSession
    val (gen, root) = nextGenRoot(spark, dir)
    corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
        norm(col("embedding")).as("c_nrm"))
      .filter(definedNrm(col("c_nrm")))
      .write.mode("overwrite").parquet(s"$root/centroids")
    val cents = loadCentroidsAt(spark, s"$root/centroids")
    // repartition on the partition column before the partitioned write:
    // without it every task writes a file into every cell dir (tasks x
    // cells files — at 1000 executors x O(sqrt N) cells that is a
    // small-file explosion); with it each cell's rows land in one task
    // (cells = the parallelism knob, O(sqrt N) under autoCentroids)
    graft.streaming.StreamAnnServe.assignCorpus(corpus, cents)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$root/assign")
    commitGen(spark, dir, gen)
  }

  /** INCREMENTAL artifact maintenance — the physical form of
    * `serve_index_append`'s delta manifest: assign ONLY the
    * newly-arrived vectors against the artifact's FROZEN centroids
    * (the ingest path between retrains; a full [[writeAnn]] would
    * re-scan the whole corpus) and append their rows into the same
    * cid-partitioned layout. Parquet partitioned appends are
    * directory-additive, so existing cell files are untouched and a
    * concurrent serve keeps reading a consistent index; the appended
    * rows land in their probed cells' partitions and are served by
    * the very next [[graft.streaming.StreamAnnServe.serveTopK]] call
    * with zero serve-side changes (spec-pinned: append ≡ rebuild). */
  def appendAnn(newVecs: DataFrame, dir: String): Unit = {
    val spark = newVecs.sparkSession
    val gen = currentGen(spark, dir)
    val cents = loadCentroidsAt(spark, tableDirAt(dir, gen, "centroids"))
    graft.streaming.StreamAnnServe.assignCorpus(newVecs, cents)
      .repartition(col("cid"))
      .write.mode("append").partitionBy("cid")
      .parquet(tableDirAt(dir, gen, "assign"))
  }

  /** Compact an appended assignment: every [[appendAnn]] adds one file
    * set per touched cell, so between retrains a hot ingest path
    * accumulates small files per cell (the LSM-ish read-amplification
    * problem every partitioned store has). Rewrites each cell's rows
    * into a single file set in a NEW GENERATION, committed by its
    * manifest (see the object doc) — a cold load at ANY point during
    * compaction resolves a complete generation, old until the commit,
    * new after (spec-pinned via `midCompaction`, a test seam invoked
    * after the new generation is written but before its manifest
    * exists). Row content is untouched — serve-before ≡ serve-after
    * is spec-pinned. */
  def compactAnn(spark: SparkSession, dir: String,
      midCompaction: () => Unit = () => ()): Unit = {
    val cur = currentGen(spark, dir)
    val (gen, root) = nextGenRoot(spark, dir)
    // tombstoned rows are dropped PHYSICALLY here: the rewritten
    // generation carries neither them nor a tombstone table
    maskDeleted(
      spark.read.schema(annAssignSchema)
        .parquet(tableDirAt(dir, cur, "assign")),
      "n_id", tombstonesAt(spark, dir, cur))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$root/assign")
    spark.read.parquet(tableDirAt(dir, cur, "centroids"))
      .write.mode("overwrite").parquet(s"$root/centroids")
    midCompaction()
    commitGen(spark, dir, gen)
  }

  private def loadCentroidsAt(spark: SparkSession,
      path: String): Seq[(Long, Seq[Float])] =
    spark.read.parquet(path)
      .orderBy("cid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq

  private val annAssignSchema = StructType(Seq(
    StructField("n_id", LongType),
    StructField("n_emb", ArrayType(FloatType)),
    StructField("n_nrm", DoubleType),
    StructField("cid", LongType)))

  def loadAnn(spark: SparkSession, dir: String): AnnIndex =
    loadAnnAt(spark, dir, currentGen(spark, dir))

  /** Gen-pinned load — for callers that resolved [[currentGen]] once
    * and must keep every read/write on that snapshot ([[GenCached]],
    * the append paths). */
  private[graft] def loadAnnAt(spark: SparkSession, dir: String,
      gen: Option[Int]): AnnIndex =
    AnnIndex(
      loadCentroidsAt(spark, tableDirAt(dir, gen, "centroids")),
      maskDeleted(
        spark.read.schema(annAssignSchema)
          .parquet(tableDirAt(dir, gen, "assign")),
        "n_id", tombstonesAt(spark, dir, gen)))

  // ----------------------------------------------------- attribution

  /** Band-bucket fanout for the attribution artifacts: with
    * [[graft.ops.DedupOps.bandKeys]]' 2 bands this yields 2·B
    * `pb` partitions and B `tb` partitions. At 100 TB raise B — the
    * layout knob, invariant to results. */
  val AttrBuckets = 32

  private[graft] def pbCol(band: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (band.cast("long") * AttrBuckets + pmod(xxhash64(key), lit(AttrBuckets)))
      .cast("int")

  private[graft] def tbCol(
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(id), lit(AttrBuckets)).cast("int")

  final case class AttrIndex(bands: DataFrame, shingles: DataFrame)

  /** Build + persist the attribution serving index: the train band
    * table bucketed by (band, key-hash) and the train shingle arrays
    * bucketed by doc-id hash — the two stream-static sides
    * [[graft.streaming.StreamAttribution]] previously re-derived from
    * raw train text every micro-batch. Two corpus scans, paid once at
    * build time. */
  def writeAttr(train: DataFrame, dir: String,
      textCol: String = "text"): Unit = {
    val spark = train.sparkSession
    val (gen, root) = nextGenRoot(spark, dir)
    // repartition on the partition column first (see writeAnn): one
    // file set per bucket instead of tasks x buckets; AttrBuckets is
    // the write-parallelism knob at scale.
    // Shingles FIRST, bands derived from the READ-BACK shingle table
    // (r16 optimization, guide §1.2): the minhash lanes are a pure
    // function of the shingle-hash set the artifact stores anyway, so
    // the corpus text is scanned + shingle-hashed ONCE instead of
    // twice per build (bit-identical band rows — MinHashSigFromHashes,
    // spec-pinned in AttrLifecycleSpec).
    train.select(col("doc_id").as("t_id"),
        DedupOps.shingleHashes(col(textCol)).as("t_shs"))
      .withColumn("tb", tbCol(col("t_id")))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$root/shingles")
    DedupOps.bandKeysFromShingles(
        spark.read.schema(attrShinglesSchema).parquet(s"$root/shingles"),
        "t_id", "t_shs")
      .select(col("doc_id").as("t_id"), col("band"), col("key"))
      .withColumn("pb", pbCol(col("band"), col("key")))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("pb").parquet(s"$root/bands")
    commitGen(spark, dir, gen)
  }

  /** INCREMENTAL attribution maintenance (round 16 — completing the
    * family's lifecycle): band and shingle rows are PER-DOC derivable
    * (minhash signatures depend on nothing but the doc's own text),
    * so ingest appends them directory-additively into the current
    * generation's bucketed layouts — and unlike the ANN/text appends
    * there is NO stale-stats window: append ≡ rebuild exactly, row
    * for row (spec-pinned). */
  def appendAttr(newTrain: DataFrame, dir: String,
      textCol: String = "text"): Unit = {
    val spark = newTrain.sparkSession
    val gen = currentGen(spark, dir)
    // one text scan for the batch: shingle + minhash lanes in one
    // kernel pass, bands derived from the in-flight shingle rows
    // (the writeAttr discipline; localCheckpoint so the second write
    // reuses the delta instead of re-scanning the text)
    val shs = newTrain.select(col("doc_id").as("t_id"),
        DedupOps.shingleHashes(col(textCol)).as("t_shs"))
      .localCheckpoint(eager = false)
    shs.withColumn("tb", tbCol(col("t_id")))
      .repartition(col("tb"))
      .write.mode("append").partitionBy("tb")
      .parquet(tableDirAt(dir, gen, "shingles"))
    DedupOps.bandKeysFromShingles(shs, "t_id", "t_shs")
      .select(col("doc_id").as("t_id"), col("band"), col("key"))
      .withColumn("pb", pbCol(col("band"), col("key")))
      .repartition(col("pb"))
      .write.mode("append").partitionBy("pb")
      .parquet(tableDirAt(dir, gen, "bands"))
  }

  /** Compact the attribution artifact after takedowns: physically
    * drop tombstoned train docs from BOTH the band postings and the
    * shingle tables (previously the one family whose tombstones
    * accumulated until a full [[writeAttr]] rebuild), each (pb/tb)
    * bucket rewritten into one file set, committed as a new
    * generation. Spec-pinned: compact-after-delete ≡
    * writeAttr(truth-minus-deleted), row for row across both
    * tables. */
  def compactAttr(spark: SparkSession, dir: String,
      midCompaction: () => Unit = () => ()): Unit = {
    val cur = currentGen(spark, dir)
    val tomb = tombstonesAt(spark, dir, cur)
    val bands = maskDeleted(
      spark.read.schema(attrBandsSchema)
        .parquet(tableDirAt(dir, cur, "bands")),
      "t_id", tomb)
    val shingles = maskDeleted(
      spark.read.schema(attrShinglesSchema)
        .parquet(tableDirAt(dir, cur, "shingles")),
      "t_id", tomb)
    val (gen, root) = nextGenRoot(spark, dir)
    bands.drop("pb").withColumn("pb", pbCol(col("band"), col("key")))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("pb").parquet(s"$root/bands")
    shingles.drop("tb").withColumn("tb", tbCol(col("t_id")))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$root/shingles")
    midCompaction()
    commitGen(spark, dir, gen)
  }

  private val attrBandsSchema = StructType(Seq(
    StructField("t_id", LongType),
    StructField("band", IntegerType),
    StructField("key", StringType),
    StructField("pb", IntegerType)))

  private val attrShinglesSchema = StructType(Seq(
    StructField("t_id", LongType),
    StructField("t_shs", ArrayType(LongType)),
    StructField("tb", IntegerType)))

  def loadAttr(spark: SparkSession, dir: String): AttrIndex =
    loadAttrAt(spark, dir, currentGen(spark, dir))

  private[graft] def loadAttrAt(spark: SparkSession, dir: String,
      gen: Option[Int]): AttrIndex = {
    val tomb = tombstonesAt(spark, dir, gen)
    AttrIndex(
      maskDeleted(
        spark.read.schema(attrBandsSchema)
          .parquet(tableDirAt(dir, gen, "bands")),
        "t_id", tomb),
      maskDeleted(
        spark.read.schema(attrShinglesSchema)
          .parquet(tableDirAt(dir, gen, "shingles")),
        "t_id", tomb))
  }

  // ------------------------------------------------------------ text

  /** Term-hash bucket fanout for the text (BM25) artifact. */
  val TextBuckets = 32

  final case class TextIndex(postings: DataFrame, terms: DataFrame,
      nDocs: Long, nTokens: Long)

  /** Build + persist the lexical serving index: the (term, doc, tf,
    * dl) postings bucketed by term hash (dl denormalized onto the
    * posting so scoring never joins a corpus-sized doc-length table),
    * the per-term stats (df + the exact integer BM25 idf_milli —
    * [[graft.ops.TextOps.textIndexBuild]]'s formula, so index and
    * live query can never disagree on a term weight), and the corpus
    * totals. The explode reaches the first shuffle already keyed
    * (term, doc_id) with map-side combine, so corpus token volume is
    * paid exactly once (the textIndexBuild shape); the term stats are
    * a vocabulary-sized rollup of that same keyed agg. */
  def writeText(docs: DataFrame, dir: String,
      textCol: String = "text"): Unit = {
    val nDocs = docs.count()
    val (gen, root) = nextGenRoot(spark(docs), dir)
    val tk = docs.select(col("doc_id"),
      graft.ops.TextOps.tokens(col(textCol)).as("toks"))
    tk.select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("tb", tbTermCol(col("term")))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$root/postings")
    val posts = spark(docs).read.schema(textPostingsSchema)
      .parquet(s"$root/postings")
    posts.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"),
        expr(s"((2 * ${nDocs}L - 2 * df + 1) * 1000) div (2 * df + 1)")
          .as("idf_milli"))
      .withColumn("tb", tbTermCol(col("term")))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$root/terms")
    // stats from the READ-BACK postings, not a third tokenize pass of
    // the corpus (r16 optimization, guide §1.2): n_docs is the count
    // already taken above, and Σtf over postings IS the token count —
    // every token contributes exactly one to exactly one posting's tf
    // (compactText computes n_tokens the same way; bit-identical)
    posts.agg(coalesce(sum("tf"), lit(0L)).cast("long").as("n_tokens"))
      .select(lit(nDocs).cast("long").as("n_docs"), col("n_tokens"))
      .write.mode("overwrite").parquet(s"$root/stats")
    commitGen(spark(docs), dir, gen)
  }

  /** INCREMENTAL lexical maintenance (round 16 — the text family's
    * missing lifecycle stage): new docs' postings are derivable
    * per-doc, so ingest appends them directory-additively into the
    * current generation's tb-partitioned postings table — the
    * [[appendAnn]] precedent — plus ONE delta row in the stats table
    * (n_docs/n_tokens of the batch), which the summed stats read
    * keeps exact across appends (avgdl never drifts). Term stats
    * follow the frozen-centroid contract: `terms` (df, idf_milli) is
    * NOT touched and serves STALE — a new-only term scores 0 idf, an
    * old term's idf reflects the pre-append corpus — until the next
    * [[compactText]] (which recomputes both exactly from the merged
    * postings) or [[writeText]] rebuild. A streaming serve
    * ([[graft.streaming.StreamBm25Serve.serveStreamFrom]]) picks that
    * recomputed generation up at its next micro-batch boundary via
    * [[GenCached]]. Spec-pinned: compact-after-append ≡
    * writeText(old ∪ delta), row for row across postings, terms AND
    * stats. */
  def appendText(newDocs: DataFrame, dir: String,
      textCol: String = "text"): Unit = {
    val nNew = newDocs.count()
    val gen = currentGen(spark(newDocs), dir)
    val tk = newDocs.select(col("doc_id"),
      graft.ops.TextOps.tokens(col(textCol)).as("toks"))
    tk.select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("tb", tbTermCol(col("term")))
      .repartition(col("tb"))
      .write.mode("append").partitionBy("tb")
      .parquet(tableDirAt(dir, gen, "postings"))
    tk.agg(lit(nNew).cast("long").as("n_docs"),
        coalesce(sum(size(col("toks"))), lit(0L)).cast("long")
          .as("n_tokens"))
      .write.mode("append").parquet(tableDirAt(dir, gen, "stats"))
  }

  /** Compact the text artifact after deletes: drop tombstoned docs'
    * postings PHYSICALLY and recompute the derived tables exactly as
    * [[writeText]] would — per-term df from the surviving postings,
    * idf_milli with the adjusted corpus size, n_docs = old n_docs
    * minus the distinct tombstoned ids PRESENT in the old postings
    * (a token-less doc is invisible to the index and can never be
    * served, so a tombstone for one leaves n_docs unchanged — the
    * documented epsilon), n_tokens = Σ tf over survivors. Removes the
    * stale-stats window the mask-only serve carries; committed as a
    * new generation like every compaction here. Spec-pinned:
    * compact-after-delete ≡ writeText(truth-minus-deleted), row for
    * row across terms AND stats. */
  def compactText(spark: SparkSession, dir: String,
      midCompaction: () => Unit = () => ()): Unit = {
    val cur = currentGen(spark, dir)
    val tomb = tombstonesAt(spark, dir, cur)
    val oldPosts = spark.read.schema(textPostingsSchema)
      .parquet(tableDirAt(dir, cur, "postings"))
    // summed: base row + one delta row per appendText (see loadTextAt)
    val st = spark.read.parquet(tableDirAt(dir, cur, "stats"))
      .agg(coalesce(sum("n_docs"), lit(0L)).cast("long")).first()
    val nDeleted = tomb.fold(0L)(t => oldPosts.select("doc_id").distinct()
      .join(broadcast(t.withColumnRenamed("n_id", "doc_id")), "doc_id")
      .count())
    val nDocs = st.getLong(0) - nDeleted
    val posts = maskDeleted(oldPosts, "doc_id", tomb)
      .localCheckpoint(eager = false)
    val (gen, root) = nextGenRoot(spark, dir)
    posts.drop("tb").withColumn("tb", tbTermCol(col("term")))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$root/postings")
    posts.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"),
        expr(s"((2 * ${nDocs}L - 2 * df + 1) * 1000) div (2 * df + 1)")
          .as("idf_milli"))
      .withColumn("tb", tbTermCol(col("term")))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$root/terms")
    posts.agg(coalesce(sum("tf"), lit(0L)).cast("long").as("n_tokens"))
      .select(lit(nDocs).cast("long").as("n_docs"), col("n_tokens"))
      .write.mode("overwrite").parquet(s"$root/stats")
    midCompaction()
    commitGen(spark, dir, gen)
  }

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  private[graft] def tbTermCol(
      term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(term), lit(TextBuckets)).cast("int")

  private val textPostingsSchema = StructType(Seq(
    StructField("term", StringType),
    StructField("doc_id", LongType),
    StructField("dl", LongType),
    StructField("tf", LongType),
    StructField("tb", IntegerType)))

  private val textTermsSchema = StructType(Seq(
    StructField("term", StringType),
    StructField("df", LongType),
    StructField("idf_milli", LongType),
    StructField("tb", IntegerType)))

  def loadText(spark: SparkSession, dir: String): TextIndex =
    loadTextAt(spark, dir, currentGen(spark, dir))

  private[graft] def loadTextAt(spark: SparkSession, dir: String,
      gen: Option[Int]): TextIndex = {
    // stats SUM over rows: [[appendText]] adds one delta row per
    // append (directory-additive), so n_docs/n_tokens — hence avgdl —
    // stay exact across appends while df/idf stay frozen
    val st = spark.read.parquet(tableDirAt(dir, gen, "stats"))
      .agg(coalesce(sum("n_docs"), lit(0L)).cast("long"),
        coalesce(sum("n_tokens"), lit(0L)).cast("long")).first()
    // postings masked; df/idf serve stale until the next compactText
    // or writeText rebuild (see the tombstone doc)
    TextIndex(
      maskDeleted(
        spark.read.schema(textPostingsSchema)
          .parquet(tableDirAt(dir, gen, "postings")),
        "doc_id", tombstonesAt(spark, dir, gen)),
      spark.read.schema(textTermsSchema)
        .parquet(tableDirAt(dir, gen, "terms")),
      st.getLong(0), st.getLong(1))
  }

  // ------------------------------------------------------- kNN graph

  /** Bucket fanout for the graph artifacts (edges by src hash, node
    * vectors by node hash). At 100 TB raise it — the layout knob,
    * invariant to results. */
  val KnnBuckets = 32

  private[graft] def nodeBucket(
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(id), lit(KnnBuckets)).cast("int")

  /** A loaded graph serving index: the driver-constant entry-point
    * vectors (the same first-K corpus vectors [[graft.ops
    * .SimilarityOps.knnGraph]] uses as coarse centroids — K·dim
    * floats, never corpus-sized), the src-bucketed edge table, and
    * the node-bucketed vector-lookup table (the id → vector row store
    * every production graph index keeps next to its adjacency
    * lists). */
  final case class KnnIndex(entries: Seq[(Long, Seq[Float])],
      edges: DataFrame, nodes: DataFrame)

  def ensureKnn(corpus: DataFrame, dir: String): Unit =
    once(dir)(writeKnn(corpus, dir))

  /** Build + persist the graph serving index: the [[graft.ops
    * .SimilarityOps.knnGraph]] edges partitioned by `sb =
    * hash(src) mod B` (a search frontier's out-edge lookups prune to
    * the frontier's buckets), the corpus vectors partitioned by
    * `nb = hash(node) mod B` (frontier scoring reads only the
    * frontier's buckets), and the auto-sized first-K entry vectors.
    * The edge build is the one corpus-scale job; both serving tables
    * repartition on their bucket column before the partitioned write
    * (the [[writeAnn]] small-file discipline). */
  def writeKnn(corpus: DataFrame, dir: String): Unit = {
    val spark = corpus.sparkSession
    val kCent = SimilarityOps.autoCentroids(corpus.count())
    val (gen, root) = nextGenRoot(spark, dir)
    corpus.filter(col("vec_id") < kCent)
      .select(col("vec_id").as("node"), col("embedding").as("e_emb"),
        norm(col("embedding")).as("e_nrm"))
      .filter(definedNrm(col("e_nrm")))
      .write.mode("overwrite").parquet(s"$root/entries")
    SimilarityOps.knnGraph(corpus, SimilarityOps.KnnK, kCent,
        SimilarityOps.KnnProbes)
      .select(col("src"), col("dst"), nodeBucket(col("src")).as("sb"))
      .repartition(col("sb"))
      .write.mode("overwrite").partitionBy("sb").parquet(s"$root/edges")
    corpus
      .select(col("vec_id").as("node"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_nrm"))
      .filter(definedNrm(col("n_nrm")))
      .withColumn("nb", nodeBucket(col("node")))
      .repartition(col("nb"))
      .write.mode("overwrite").partitionBy("nb").parquet(s"$root/nodes")
    commitGen(spark, dir, gen)
  }

  /** INCREMENTAL graph maintenance — BATCH NSW insertion
    * (search-then-connect): each new vector's out-edges are its graph
    * search top-[[graft.ops.SimilarityOps.KnnK]] against the EXISTING
    * artifact (the serve path itself, so insert cost = serve cost:
    * O(hops·beam·degree) per vector, never a corpus rebuild), and
    * every new edge is mirrored as a BACK-edge so future searches can
    * reach the inserted nodes — the bidirectional linking every NSW
    * store does on insert.
    *
    * Deliberate batch trade-off vs SEQUENTIAL NSW insertion: the
    * whole batch searches the pre-append artifact, so no edge ever
    * links two vectors of the SAME batch (sequential insertion would
    * link later vectors to earlier ones). Near-duplicate pairs
    * arriving in one batch are therefore mutually invisible until the
    * next [[writeKnn]] rebuild, a compaction, or a SLICED append —
    * the `slices` overload above implements the sub-batch split
    * (round 15), and the spec plants a same-batch near-dup pair to
    * pin both behaviors. The findability test measures the slices=1
    * form honestly (appended nodes reachable through back-edges, not
    * through batch-mates).
    * In exchange the whole batch is ONE bulk search — |batch|
    * independent serves, embarrassingly parallel — instead of a
    * sequential chain of index mutations, which is the only shape
    * that works for a 1000-executor bulk ingest. Old-node degrees
    * grow past KnnK between rebuilds (real graph stores prune on a
    * schedule; [[compactKnn]] is that prune). Parquet partitioned
    * appends are directory-additive, so a concurrent serve keeps
    * reading a consistent index. */
  /** [[appendKnn]]'s SLICED insert mode: the batch is split into
    * `slices` md5-hash sub-batches, inserted sequentially — each
    * slice searches the artifact AS OF the previous slice (a fresh
    * generation-pinned load per slice, reading the directory-additive
    * appends), so near-duplicate pairs arriving in ONE batch become
    * mutually linked as long as they land in different slices
    * (P = 1 − 1/slices per pair; spec-pinned with a planted pair).
    * Cost: `slices` independent bulk searches over progressively
    * larger artifacts instead of one — each slice is still
    * embarrassingly parallel internally, so the 1000-executor ingest
    * shape survives; the knob trades intra-batch linkage for a
    * `slices`-deep sequential chain (measured delta in the spec).
    * slices = 1 is the r14 behavior: one bulk search, batch-mates
    * never link until the next rebuild/compaction. */
  def appendKnn(newVecs: DataFrame, dir: String, slices: Int): Unit =
    if (slices <= 1) appendKnn(newVecs, dir)
    else (0 until slices).foreach { s =>
      appendKnn(newVecs.filter(
        TextOps.strHash(concat(lit("knnslice:"),
          col("vec_id").cast("string"))).mod(lit(slices.toLong)) === s),
        dir)
    }

  def appendKnn(newVecs: DataFrame, dir: String): Unit = {
    val spark = newVecs.sparkSession
    // resolve the generation ONCE; load paths and write paths both
    // derive from this snapshot (the tableDirAt discipline — a
    // compaction committing between two resolutions would otherwise
    // write the appended edges into a different generation than the
    // one searched, silently losing the append)
    val gen = currentGen(spark, dir)
    val idx = loadKnnAt(spark, dir, gen)
    // checkpointed: the mirror union would otherwise re-run the search
    val newEdges = graft.streaming.StreamGraphServe.serveTopK(
        newVecs.select(col("vec_id"), col("embedding")), idx,
        k = SimilarityOps.KnnK)
      .select(col("q_id").as("src"), col("n_id").as("dst"))
      .localCheckpoint(eager = false)
    newEdges.unionByName(
        newEdges.select(col("dst").as("src"), col("src").as("dst")))
      .select(col("src"), col("dst"), nodeBucket(col("src")).as("sb"))
      .repartition(col("sb"))
      .write.mode("append").partitionBy("sb")
      .parquet(tableDirAt(dir, gen, "edges"))
    newVecs
      .select(col("vec_id").as("node"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_nrm"))
      .filter(definedNrm(col("n_nrm")))
      .withColumn("nb", nodeBucket(col("node")))
      .repartition(col("nb"))
      .write.mode("append").partitionBy("nb")
      .parquet(tableDirAt(dir, gen, "nodes"))
  }

  /** Scheduled graph maintenance — the degree prune every NSW store
    * runs: [[appendKnn]]'s back-edges grow old-node out-degrees past
    * [[graft.ops.SimilarityOps.KnnK]] and add one file set per touched
    * bucket; this rewrites the edge table keeping each src's top-KnnK
    * out-edges by exact cosine ((sim DESC, dst ASC), the knnGraph
    * tie-break) and lands each bucket in a single file set, in a NEW
    * GENERATION committed by its manifest like [[compactAnn]] so a
    * cold load at any point resolves a complete generation (the
    * `midCompaction` seam is spec-pinned). Pruning is the deliberate
    * accuracy trade of the maintenance schedule: a back-edge survives
    * iff the inserted node ranks within its neighbor's top-KnnK —
    * exactly the retention rule a fresh [[writeKnn]] rebuild would
    * apply. The node store is content-identical, rewritten only for
    * file-count hygiene. */
  def compactKnn(spark: SparkSession, dir: String,
      midCompaction: () => Unit = () => ()): Unit = {
    val cur = currentGen(spark, dir)
    val tomb = tombstonesAt(spark, dir, cur)
    // tombstoned nodes drop PHYSICALLY here; their edges (both
    // directions) vanish through the rescore's inner joins against
    // the masked node store, and the entry rewrite filters them too —
    // the new generation carries no tombstone table
    val nodes = maskDeleted(
      spark.read.schema(knnNodesSchema)
        .parquet(tableDirAt(dir, cur, "nodes")),
      "node", tomb)
    val edges = spark.read.schema(knnEdgesSchema)
      .parquet(tableDirAt(dir, cur, "edges"))
    val (gen, root) = nextGenRoot(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("sim").desc, col("dst").asc)
    edges.select("src", "dst").distinct()
      .join(nodes.select(col("node").as("src"), col("n_emb").as("s_emb"),
        col("n_nrm").as("s_nrm")), "src")
      .join(nodes.select(col("node").as("dst"), col("n_emb").as("d_emb"),
        col("n_nrm").as("d_nrm")), "dst")
      .withColumn("sim", graft.ops.SimilarityOps.dot(col("s_emb"), col("d_emb"))
        / (col("s_nrm") * col("d_nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SimilarityOps.KnnK)
      .select(col("src"), col("dst"), nodeBucket(col("src")).as("sb"))
      .repartition(col("sb"))
      .write.mode("overwrite").partitionBy("sb")
      .parquet(s"$root/edges")
    nodes.drop("nb").withColumn("nb", nodeBucket(col("node")))
      .repartition(col("nb"))
      .write.mode("overwrite").partitionBy("nb")
      .parquet(s"$root/nodes")
    maskDeleted(spark.read.parquet(tableDirAt(dir, cur, "entries")),
        "node", tomb)
      .write.mode("overwrite").parquet(s"$root/entries")
    midCompaction()
    commitGen(spark, dir, gen)
  }

  // ------------------------------------------------ layered kNN graph

  /** A loaded LAYERED graph serving index (HNSW shape, round 15):
    * `entries` = the top layer's members plus the first-
    * [[graft.ops.SimilarityOps.LayerEntryK]] fallback vectors WITH
    * their embeddings (a bounded table scored distributively per
    * batch — never driver-collected, because its size is governed by
    * the depth knob, not guaranteed small); `edges` = per-layer
    * MIRRORED kNN edges at the layered degree
    * [[graft.ops.SimilarityOps.LayerK]], partitioned by (layer, sb)
    * so a hop reads exactly its layer's frontier buckets; `nodes` =
    * the nb-bucketed vector store ([[writeKnn]]'s layout); `layers` =
    * the artifact's RECORDED depth ([[graft.ops.SimilarityOps
    * .autoLayers]] at write time, frozen until a rebuild — the
    * frozen-centroid contract), which every serve and append reads
    * back instead of assuming a compile-time constant. */
  final case class LayeredIndex(entries: DataFrame, edges: DataFrame,
      nodes: DataFrame, layers: Int)

  def ensureKnnLayered(corpus: DataFrame, dir: String): Unit =
    once(dir)(writeKnnLayered(corpus, dir))

  /** Build + persist the layered graph index: one [[graft.ops
    * .SimilarityOps.knnGraph]] build per layer over the md5-sampled
    * member sets (layer 0 = the corpus; E[|layer ℓ|] = N/16^ℓ),
    * mirrored (both directions — the NSW linking rule; degree ≤
    * 2·LayerK), all layers in ONE (layer, sb)-partitioned table.
    * Layer-0 dominates the build cost; the upper layers are
    * geometrically cheaper. Generation-manifest committed like every
    * artifact here.
    *
    * DEPTH is resolved count-driven at write time ([[graft.ops
    * .SimilarityOps.autoLayers]] — default; pass `layers` to pin) and
    * RECORDED in the artifact's one-row `lmeta` table: appends,
    * compactions, and serves read it back, so the entry scan stays
    * bounded by [[graft.ops.SimilarityOps.LayerEntryBudget]] however
    * large the corpus the artifact was built over. */
  def writeKnnLayered(corpus: DataFrame, dir: String,
      layers: Int = SimilarityOps.AutoLayers): Unit = {
    val spark = corpus.sparkSession
    // ONE aggregation job yields the corpus count (depth resolution)
    // AND every layer's member count (each layer's autoCentroids K):
    // previously 1 + (nLayers+1) separate count() scans of the corpus
    // per build (r16 optimization; counts are bit-identical, so the
    // resolved depth and per-layer K — hence the artifact — are too)
    val cnts = SimilarityOps.layerCounts(corpus.select("vec_id"), 12)
    val nLayers = if (layers >= 0) layers
      else SimilarityOps.autoLayers(cnts(0))
    val (gen, root) = nextGenRoot(spark, dir)
    (0 to nLayers).map { l =>
        val members = if (l == 0) corpus
          else corpus.filter(SimilarityOps.layerMemberPred(l))
        // pinned depths beyond the precomputed range (never hit by
        // autoLayers — 16^12 rows) fall back to knnGraph's own count
        val kCent = if (l < cnts.length)
          SimilarityOps.autoCentroids(cnts(l)) else SimilarityOps.AutoCentroids
        SimilarityOps.mirroredEdges(SimilarityOps.knnGraph(
            members, SimilarityOps.LayerK, nCentroids = kCent))
          .select(lit(l).as("layer"), col("src"), col("dst"),
            nodeBucket(col("src")).as("sb"))
      }.reduce(_ unionByName _)
      .repartition(col("layer"), col("sb"))
      .write.mode("overwrite").partitionBy("layer", "sb")
      .parquet(s"$root/ledges")
    writeLayerMeta(spark, s"$root/lmeta", nLayers)
    corpus
      .filter(SimilarityOps.layerMemberPred(nLayers)
        || col("vec_id") < SimilarityOps.LayerEntryK)
      .select(col("vec_id").as("node"), col("embedding").as("e_emb"),
        norm(col("embedding")).as("e_nrm"))
      .filter(definedNrm(col("e_nrm")))
      .write.mode("overwrite").parquet(s"$root/lentries")
    corpus
      .select(col("vec_id").as("node"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_nrm"))
      .filter(definedNrm(col("n_nrm")))
      .withColumn("nb", nodeBucket(col("node")))
      .repartition(col("nb"))
      .write.mode("overwrite").partitionBy("nb").parquet(s"$root/lnodes")
    commitGen(spark, dir, gen)
  }

  /** INCREMENTAL layered-graph maintenance — HNSW insertion with the
    * engine's hash-derived level rule (see [[graft.streaming
    * .StreamGraphServe.layeredInsertEdges]]): each new vector joins
    * every layer its md5 level reaches (append and rebuild agree on
    * levels by construction — no random-level state to persist), its
    * per-layer out-edges are the descent's own scored candidates
    * (insert cost = serve cost), every edge is mirrored (the NSW
    * back-link), and a new TOP-layer member also lands in the entry
    * table — future searches enter through it, exactly like a
    * rebuild would. Directory-additive parquet appends throughout;
    * resolve-once generation discipline. */
  def appendKnnLayered(newVecs: DataFrame, dir: String): Unit = {
    val spark = newVecs.sparkSession
    val gen = currentGen(spark, dir)
    val idx = loadKnnLayeredAt(spark, dir, gen)
    // AutoLayers resolves to the artifact's recorded depth — the
    // insert descends exactly the layers the build stacked
    val perLayer = graft.streaming.StreamGraphServe
      .layeredInsertEdges(newVecs, idx)
    perLayer.toSeq.sortBy(_._1).map { case (l, e) =>
        val ed = e.localCheckpoint(eager = false)
        ed.unionByName(
            ed.select(col("dst").as("src"), col("src").as("dst")))
          .select(lit(l).as("layer"), col("src"), col("dst"),
            nodeBucket(col("src")).as("sb"))
      }.reduce(_ unionByName _)
      .repartition(col("layer"), col("sb"))
      .write.mode("append").partitionBy("layer", "sb")
      .parquet(tableDirAt(dir, gen, "ledges"))
    newVecs
      .select(col("vec_id").as("node"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_nrm"))
      .filter(definedNrm(col("n_nrm")))
      .withColumn("nb", nodeBucket(col("node")))
      .repartition(col("nb"))
      .write.mode("append").partitionBy("nb")
      .parquet(tableDirAt(dir, gen, "lnodes"))
    newVecs
      .filter(SimilarityOps.layerMemberPred(idx.layers))
      .select(col("vec_id").as("node"), col("embedding").as("e_emb"),
        norm(col("embedding")).as("e_nrm"))
      .filter(definedNrm(col("e_nrm")))
      .write.mode("append")
      .parquet(tableDirAt(dir, gen, "lentries"))
  }

  /** Scheduled layered-graph maintenance — the per-layer degree prune:
    * rewrites the edge table keeping each (layer, src)'s top-
    * [[graft.ops.SimilarityOps.LayerK]] out-edges by exact cosine
    * ((sim DESC, dst ASC)), lands each (layer, sb) partition in one
    * file set, drops tombstoned rows physically (nodes, both edge
    * directions through the rescore's inner joins, entries), all in a
    * NEW generation committed by its manifest. Pruning the mirrored
    * write edges (out-degree ≤ 2·LayerK) back to LayerK is the NSW
    * degree bound every production store schedules; some reverse
    * links drop — the deliberate maintenance trade, oracled. */
  def compactKnnLayered(spark: SparkSession, dir: String,
      midCompaction: () => Unit = () => ()): Unit = {
    val cur = currentGen(spark, dir)
    val depth = readLayerMeta(spark, tableDirAt(dir, cur, "lmeta"))
    val tomb = tombstonesAt(spark, dir, cur)
    val nodes = maskDeleted(
      spark.read.schema(knnNodesSchema)
        .parquet(tableDirAt(dir, cur, "lnodes")),
      "node", tomb)
    val edges = spark.read.schema(layeredEdgesSchema)
      .parquet(tableDirAt(dir, cur, "ledges"))
    val entries = maskDeleted(
      spark.read.schema(layeredEntriesSchema)
        .parquet(tableDirAt(dir, cur, "lentries")),
      "node", tomb)
    val (gen, root) = nextGenRoot(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("layer", "src").orderBy(col("sim").desc, col("dst").asc)
    edges.select("layer", "src", "dst").distinct()
      .join(nodes.select(col("node").as("src"), col("n_emb").as("s_emb"),
        col("n_nrm").as("s_nrm")), "src")
      .join(nodes.select(col("node").as("dst"), col("n_emb").as("d_emb"),
        col("n_nrm").as("d_nrm")), "dst")
      .withColumn("sim",
        graft.ops.SimilarityOps.dot(col("s_emb"), col("d_emb"))
          / (col("s_nrm") * col("d_nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SimilarityOps.LayerK)
      .select(col("layer"), col("src"), col("dst"),
        nodeBucket(col("src")).as("sb"))
      .repartition(col("layer"), col("sb"))
      .write.mode("overwrite").partitionBy("layer", "sb")
      .parquet(s"$root/ledges")
    nodes.drop("nb").withColumn("nb", nodeBucket(col("node")))
      .repartition(col("nb"))
      .write.mode("overwrite").partitionBy("nb").parquet(s"$root/lnodes")
    entries.write.mode("overwrite").parquet(s"$root/lentries")
    // depth is frozen at write time (the frozen-centroid contract):
    // compaction carries the recorded depth through unchanged
    writeLayerMeta(spark, s"$root/lmeta", depth)
    midCompaction()
    commitGen(spark, dir, gen)
  }

  /** The layered artifact's recorded depth — a tiny JSON side file
    * written straight through the filesystem (the manifest-file
    * discipline), NOT a Spark job: the r16 profile showed the one-row
    * parquet form costing a full write job at build time plus a read
    * job on EVERY layered load (~0.5 s + ~0.15 s per lifecycle stage
    * at the bench scale, pure orchestration). Any engine can read a
    * one-line JSON. Legacy artifacts: a parquet `lmeta` DIRECTORY from
    * older builds is still read; absent both, the pre-round-16
    * constant. */
  private def writeLayerMeta(spark: SparkSession, path: String,
      layers: Int): Unit = {
    val f = fs(spark, path)
    val out = f.create(new org.apache.hadoop.fs.Path(path + ".json"), true)
    out.write(s"""{"layers":$layers}""".getBytes("UTF-8"))
    out.close()
  }

  private val LayersRe = """\{"layers":(\d+)\}""".r

  private def readLayerMeta(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    val json = new org.apache.hadoop.fs.Path(path + ".json")
    if (f.exists(json)) {
      val in = f.open(json)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      s.trim match {
        case LayersRe(n) => n.toInt
        case _ => throw new IllegalStateException(
          s"unreadable layer meta at $json: $s")
      }
    }
    else if (f.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.parquet(path).first().getInt(0)
    else SimilarityOps.GraphLayers
  }

  private val layeredEdgesSchema = StructType(Seq(
    StructField("src", LongType),
    StructField("dst", LongType),
    StructField("layer", IntegerType),
    StructField("sb", IntegerType)))

  private val layeredEntriesSchema = StructType(Seq(
    StructField("node", LongType),
    StructField("e_emb", ArrayType(FloatType)),
    StructField("e_nrm", DoubleType)))

  def loadKnnLayered(spark: SparkSession, dir: String): LayeredIndex =
    loadKnnLayeredAt(spark, dir, currentGen(spark, dir))

  private[graft] def loadKnnLayeredAt(spark: SparkSession, dir: String,
      gen: Option[Int]): LayeredIndex = {
    val tomb = tombstonesAt(spark, dir, gen)
    LayeredIndex(
      maskDeleted(
        spark.read.schema(layeredEntriesSchema)
          .parquet(tableDirAt(dir, gen, "lentries")),
        "node", tomb),
      maskDeleted(maskDeleted(
          spark.read.schema(layeredEdgesSchema)
            .parquet(tableDirAt(dir, gen, "ledges")),
          "src", tomb), "dst", tomb),
      maskDeleted(
        spark.read.schema(knnNodesSchema)
          .parquet(tableDirAt(dir, gen, "lnodes")),
        "node", tomb),
      readLayerMeta(spark, tableDirAt(dir, gen, "lmeta")))
  }

  private val knnEdgesSchema = StructType(Seq(
    StructField("src", LongType),
    StructField("dst", LongType),
    StructField("sb", IntegerType)))

  private val knnNodesSchema = StructType(Seq(
    StructField("node", LongType),
    StructField("n_emb", ArrayType(FloatType)),
    StructField("n_nrm", DoubleType),
    StructField("nb", IntegerType)))

  def loadKnn(spark: SparkSession, dir: String): KnnIndex =
    loadKnnAt(spark, dir, currentGen(spark, dir))

  private[graft] def loadKnnAt(spark: SparkSession, dir: String,
      gen: Option[Int]): KnnIndex = {
    val tomb = tombstonesAt(spark, dir, gen)
    KnnIndex(
      maskDeleted(spark.read.parquet(tableDirAt(dir, gen, "entries")),
          "node", tomb)
        .orderBy("node").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq,
      maskDeleted(maskDeleted(
          spark.read.schema(knnEdgesSchema)
            .parquet(tableDirAt(dir, gen, "edges")),
          "src", tomb), "dst", tomb),
      maskDeleted(
        spark.read.schema(knnNodesSchema)
          .parquet(tableDirAt(dir, gen, "nodes")),
        "node", tomb))
  }
}
