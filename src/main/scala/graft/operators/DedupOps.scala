package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.text.{PyText, TextKernels, Tokenizer}

/** Exact and URL dedup — the simple shuffling dedup operators. */
object ExactDedup {

  /** Exact-text dedup via hash groupBy: annotate each row with the
    * surviving doc id (min id per identical text) and a keep flag.
    * Collision-safe two-level key: group on the 64-bit text hash, compare
    * full text within hash groups. */
  /** Scale shape (round 6): the [[DupCandidates]] prefilter shuffles ONLY
    * the 8-byte text hash to find hashes occurring more than once — on a
    * mostly-unique web corpus the full TEXT column then never rides any
    * exchange OR broadcast: candidate rows broadcast-semi-join against
    * the (small, hash-only) duplicated-hash set, the min-id representative
    * is computed over candidates alone and joined back within the
    * candidate subset (both sides small; AQE picks the strategy — no
    * payload is ever hint-broadcast), and the non-candidate majority is
    * split off with the REUSED broadcast as a left-anti probe, each row
    * its own survivor with no join at all. Result-identical: a
    * corpus-unique hash's row is the single member of its (hash, text)
    * group, i.e. its own min-id representative. groupBy-min keeps the
    * hot-text safety (map-side partial agg absorbs mass-duplicated
    * boilerplate; a Window.partitionBy would sort the whole hot group on
    * one reducer). Cost: the input lineage is scanned three times (count,
    * semi, anti) instead of twice. `prefilterDupKeys = false` restores
    * the r5 single-pass groupBy(hash, text) + join-back shape. Round 7:
    * the mass-dup escape is no longer only a manual flag — the prefilter
    * goes through [[DupCandidates.guardedDupKeys]], which sizes the
    * duplicated-hash set at runtime (one key-only count action over a
    * persisted aggregate, so the semi and anti probes reuse one
    * computation) and falls back to the single-pass shape by itself when
    * the set would not fit a broadcast. */
  def apply(df: DataFrame, idCol: String, textCol: String,
            prefilterDupKeys: Boolean = true): DataFrame = {
    val hashed = df.withColumn("__th", xxhash64(col(textCol)))
    def singlePass(): DataFrame = {
      val reps = hashed.groupBy(col("__th"), col(textCol).as("__tt"))
        .agg(min(col(idCol)).as("exact_dup_rep"))
      hashed
        .join(reps, hashed("__th") <=> reps("__th") && col(textCol) <=> col("__tt"))
        .drop(reps("__th")).drop("__tt")
    }
    val guarded: Option[DataFrame] =
      if (prefilterDupKeys)
        DupCandidates.guardedDupKeys(hashed.select("__th"), Seq("__th"),
          "exactdedup.dupth").keys
      else None
    val annotated = guarded match {
      case Some(dupTh) =>
        val cand = hashed.join(broadcast(dupTh), Seq("__th"), "left_semi")
        val reps = cand
          .select(col("__th"), col(textCol).as("__tt"), col(idCol).as("__cid"))
          .groupBy(col("__th"), col("__tt"))
          .agg(min(col("__cid")).as("exact_dup_rep"))
        val candAnnot = cand
          // null-safe keys: rows with null text must survive the join (a
          // plain === would silently drop them)
          .join(reps, cand("__th") <=> reps("__th") && col(textCol) <=> col("__tt"))
          .drop(reps("__th")).drop("__tt")
        val rest = hashed.join(broadcast(dupTh), Seq("__th"), "left_anti")
          .withColumn("exact_dup_rep", col(idCol))
        candAnnot.unionByName(rest)
      case None => singlePass()
    }
    annotated
      // null text is UNKNOWN content, not identical content — pass such rows
      // through as their own survivors instead of deduping them against
      // each other (which would silently drop all but one)
      .withColumn("exact_dup_rep",
        when(col(textCol).isNull, col(idCol))
          .otherwise(coalesce(col("exact_dup_rep"), col(idCol))))
      .withColumn("exact_keep", col("exact_dup_rep") === col(idCol))
      .drop("__th")
  }
}

/** dedup/url_dedup.py:45-62 — keep the highest-priority row per normalized
  * url; ties break to the smallest id (the reference keeps the first in
  * heap order; ours is deterministic under any partitioning). */
object UrlDedup {
  /** Default url normalizer (url_dedup.py's `url_normalizer` seam): strip
    * scheme, query/fragment, trailing slash; lowercase the host. */
  def normalizeUrl(url: String): String = {
    if (url == null) return null
    var u = url
    val scheme = u.indexOf("://")
    if (scheme >= 0) u = u.substring(scheme + 3)
    val cut = u.indexWhere(c => c == '?' || c == '#')
    if (cut >= 0) u = u.substring(0, cut)
    u = u.stripSuffix("/")
    val slash = u.indexOf('/')
    if (slash >= 0) u.substring(0, slash).toLowerCase(java.util.Locale.ROOT) + u.substring(slash)
    else u.toLowerCase(java.util.Locale.ROOT)
  }

  private val normalizeUdf = udf(normalizeUrl _)

  /** Scale shape: a hot normalized url (mass-crawled page) would make a
    * Window.partitionBy sort its whole group on one reducer; the groupBy
    * min-struct aggregates map-side and the join back is AQE-skew-splittable.
    * Priority must be numeric (the reference's is an int). */
  def apply(df: DataFrame, urlCol: String, idCol: String, priorityCol: String,
            normalize: Boolean = false, prefilterDupKeys: Boolean = true): DataFrame =
    applyWithKey(df, if (normalize) normalizeUdf(col(urlCol)) else col(urlCol),
      idCol, priorityCol, prefilterDupKeys = prefilterDupKeys)

  /** url_normalizer seam (url_dedup.py's UrlDedupConfig.url_normalizer is an
    * arbitrary callable): dedup on a caller-supplied key expression. */
  def applyWithNormalizer(df: DataFrame, urlCol: String, idCol: String,
                          priorityCol: String, normalizer: String => String): DataFrame = {
    val nUdf = udf(normalizer)
    applyWithKey(df, nUdf(col(urlCol)), idCol, priorityCol)
  }

  private def applyWithKey(df: DataFrame, keyCol: Column, idCol: String,
                           priorityCol: String, keepKey: Boolean = false,
                           prefilterDupKeys: Boolean = true): DataFrame = {
    val keyed = df.withColumn("__ukey", keyCol)
    // DupCandidates prefilter (same argument as ExactDedup): a key+count
    // pass finds urls occurring more than once, the best-priority
    // representative is computed over those candidates only, and every
    // unique url is its own survivor through the LEFT join's coalesce —
    // the unique majority never rides the best-of exchange, and the
    // join-back side shrinks to the dup groups. Round 7: runtime-guarded —
    // when the duplicated-url set would not fit a broadcast the guard
    // hands back None and this call degrades to the single-pass shape
    // instead of OOMing inside the default config.
    val guarded: Option[DataFrame] =
      if (prefilterDupKeys)
        DupCandidates.guardedDupKeys(keyed.select("__ukey"), Seq("__ukey"),
          "urldedup.dupkeys").keys
      else None
    val prefilterActive = guarded.isDefined
    val cand = guarded match {
      case Some(dk) =>
        keyed.select(col("__ukey"), col(priorityCol), col(idCol))
          .join(broadcast(dk), Seq("__ukey"), "left_semi")
      case None => keyed
    }
    // min over (priority-is-null, -priority, id) = highest non-null priority,
    // nulls last (matching the old orderBy(desc) semantics), ties to the
    // smallest id. Negation assumes a sane numeric priority (the reference's
    // is a small int); Long.MinValue priorities are out of contract.
    val best = cand.groupBy("__ukey")
      .agg(min(struct(col(priorityCol).isNull.as("pn"),
        (-col(priorityCol)).as("np"), col(idCol).as("bid"))).as("__b"))
      .select(col("__ukey").as("__bkey"), col("__b.bid").as("url_dup_rep"))
    keyed
      // null-safe key join: null-url rows keep flowing through the operator.
      // With the prefilter, best holds one (dup url, winner id) row per
      // duplicated url group — at most guardedDupKeys' nDupKeys rows of
      // key-sized payload, so the hint stays within the (now
      // runtime-enforced) DupCandidates broadcast contract and the corpus
      // side never shuffles for this join
      .join(if (prefilterActive) broadcast(best) else best,
        col("__ukey") <=> col("__bkey"),
        if (prefilterActive) "left" else "inner")
      // a null url is an unknown page, not THE SAME page — pass through;
      // prefiltered-out unique urls are their own survivors
      .withColumn("url_dup_rep",
        when(col("__ukey").isNull, col(idCol))
          .otherwise(coalesce(col("url_dup_rep"), col(idCol))))
      .withColumn("url_keep", col("url_dup_rep") === col(idCol))
      .drop((if (keepKey) Seq("__bkey") else Seq("__ukey", "__bkey")): _*)
  }

  /** UrlDedup against a PRE-BUILT url index (url_dedup.py index_folder):
    * every corpus doc whose (normalized) url appears in the index is
    * dropped — the index entry always wins (is_from_index ordering). With
    * onlyDedupInIndex=false the within-corpus best-priority rule applies
    * on top; with true (the reference default) corpus-vs-corpus
    * duplicates are NOT deduped. */
  def withIndex(df: DataFrame, urlCol: String, idCol: String, priorityCol: String,
                indexDf: DataFrame, indexUrlCol: String,
                normalize: Boolean = false,
                onlyDedupInIndex: Boolean = true): DataFrame = {
    val key: Column => Column =
      if (normalize) normalizeUdf(_) else identity
    val idxKeys = indexDf.select(key(col(indexUrlCol)).as("__ikey"))
      .where(col("__ikey").isNotNull).distinct()
    // normalize ONCE: both branches reuse keyed's __ukey (self-assignment
    // inside applyWithKey is a no-op column reference)
    val keyed = df.withColumn("__ukey", key(col(urlCol)))
    val base =
      if (onlyDedupInIndex)
        // no corpus-vs-corpus dedup: every doc is its own representative
        keyed.withColumn("url_dup_rep", col(idCol))
          .withColumn("url_keep", lit(true))
      else
        applyWithKey(keyed, col("__ukey"), idCol, priorityCol, keepKey = true)
    base
      .join(idxKeys, col("__ukey") <=> col("__ikey"), "left")
      .withColumn("url_keep", col("url_keep") && col("__ikey").isNull)
      .drop("__ukey", "__ikey")
  }
}

/** Sentence-level dedup (dedup/sentence_dedup.py): hash every window of
  * `nSentences` consecutive units (lines by default ≙ split_sentences=False;
  * set splitSentences=true for the reference's default sentence mode, using
  * the deterministic Tokenizer.sentenceSpans splitter in place of its
  * nltk/spaCy model — documented approximation); the hash input is the
  * simplify_text'd window (sentence_dedup.py:137-143); the first occurrence
  * (min doc id, then min window idx) survives, every later occurrence marks
  * a span [idx, idx+n) for removal; docs shrink to their kept units and are
  * dropped when left with <minDocWords words or <minNumSentences units.
  * Sentence-mode rewrite mirrors remove_dup_sentences
  * (sentence_dedup.py:329-379): each kept unit carries the inter-sentence
  * whitespace since the previous span end, the pieces are joined with ""
  * and the result is lstrip'd; line mode joins with "\n" as before.
  *
  * Spark shape: explode → groupBy(hash) shuffle → per-doc span removal.
  */
final case class SentenceDedupConfig(
    nSentences: Int = 3,
    minDocWords: Int = 50,
    minNumSentences: Int = 3,
    splitSentences: Boolean = false,
    /** sentence_dedup.py:48 min_words_to_remove_span: a removed span whose
      * word count falls below this is restored instead of cut. The
      * reference's loop only ever records a span's FIRST unit (the
      * `elif not removed_span` guard), so both the word count and the
      * restoration cover just that first line/sentence — mirrored
      * exactly. 0 disables. */
    minWordsToRemoveSpan: Int = 0,
    /** HashConfig (utils/hashing.py:12-30): precision 32 halves signature
      * width at 100 TB scale; sha1 matches the fork's configured hashes. */
    hashPrecision: Int = 64,
    hashFc: String = "xxhash",
    /** Round-6 duplicate-candidate prefilter (see corpusDups): ON keeps
      * the unique-hash majority out of the first-wins exchange via an
      * 8-byte count pass + broadcast semi-join (+ a sigs persist for the
      * extra consumption). OFF by default, measured honestly at 2M on a
      * quiet host: 27.7 s / 1,321 MB ON vs 26.1 s / 1,483 MB OFF — the
      * sig rows are already slim (hash, doc, sent) and the first-wins agg
      * is map-side partial, so the prefilter saves only ~16% exchange
      * while paying an extra pass + a dup-set broadcast; unlike
      * ExactDedup (whose payload is the full text, 143× cut) the trade
      * never crosses over. Turn ON only when the duplicated-window share
      * is tiny AND the cluster is exchange-bound. */
    prefilterDupHashes: Boolean = false)

object SentenceDedup {

  private def windowHashesUdf(cfg: SentenceDedupConfig) = {
    val n = cfg.nSentences
    val splitSent = cfg.splitSentences
    val hashFn = Hashes.forConfig(cfg.hashPrecision, cfg.hashFc)
    udf { text: String =>
      val sents =
        if (text == null) Array.empty[String] // null text: no windows, not an NPE
        else if (splitSent) Tokenizer.sentences(text)
        else PyText.splitLines(text)
      if (sents.length < n) Array.empty[(Int, Long)]
      else {
        val simplified = sents.map(TextKernels.simplifyText)
        (0 to sents.length - n).iterator.flatMap { i =>
          val joined = simplified.slice(i, i + n).mkString(" ")
          if (PyText.pyStrip(joined).isEmpty) None
          else Some((i, hashFn(joined)))
        }.toArray
      }
    }
  }

  private def sigsOf(df: DataFrame, idCol: String, textCol: String,
                     cfg: SentenceDedupConfig): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(windowHashesUdf(cfg)(col(textCol))).as("w"))
      .select(col("__doc"), col("w._1").as("__sent"), col("w._2").as("__hash"))

  /** (id, text) → (id, text rewritten, sentence_dedup_keep, removed_sentences) */
  def apply(df: DataFrame, idCol: String, textCol: String,
            cfg: SentenceDedupConfig = SentenceDedupConfig())
           (implicit spark: SparkSession): DataFrame = {
    // with the prefilter, the slim sigs projection is consumed four times
    // (count pass, semi probe, first-wins agg, join-back) — persist it so
    // the heavy window-hash UDF (simplify + tokenize + hash every n-unit
    // window) runs once, the same multi-consumption hazard withIndex's
    // loose mode already persists for
    val sigs0 = sigsOf(df, idCol, textCol, cfg)
    val sigs =
      if (cfg.prefilterDupHashes)
        CacheRegistry.swapRotating("sentencededup.sigs",
          sigs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else sigs0
    val dups = corpusDups(sigs, cfg.prefilterDupHashes)
      .groupBy("__doc")
      .agg(sort_array(collect_list(col("__sent"))).as("__dupSents"))
    finish(df, idCol, textCol, cfg, dups)
  }

  /** First occurrence per hash wins; all others are duplicate spans.
    * Scale shape: groupBy-min + join-back instead of a row_number window —
    * a ubiquitous boilerplate window (one hash, millions of rows) is
    * absorbed by map-side partial aggregation, and the join back gets AQE
    * skew-splitting; WindowExec would sort the whole hot group on one
    * reducer with no mitigation. Round 6 adds the duplicate-candidate
    * prefilter (same identity argument as ExactSubstrDedup): an 8-byte
    * hash+count pass finds duplicated window hashes, candidates
    * broadcast-semi-join against that small set, and the min/join-back
    * pair runs over candidates only — a corpus-unique hash's single row
    * is its own first occurrence and the `!= __first` cut discards it
    * regardless, so the fat (hash, doc, sent) rows of the unique majority
    * never ride the min exchange or the join. */
  private def corpusDups(sigs: DataFrame, prefilter: Boolean): DataFrame = {
    // runtime-guarded (round 7): even with the non-default flag ON, a
    // mass-dup corpus whose duplicated-window-hash set exceeds the
    // broadcast budget degrades to the unprefiltered shape instead of
    // OOMing the driver
    val guarded: Option[DataFrame] =
      if (prefilter)
        DupCandidates.guardedDupKeys(sigs.select("__hash"), Seq("__hash"),
          "sentencededup.duphashes").keys
      else None
    val prefilterActive = guarded.isDefined
    val cand = guarded match {
      case Some(dk) => sigs.join(broadcast(dk), Seq("__hash"), "left_semi")
      case None => sigs
    }
    val firsts = cand.groupBy("__hash")
      .agg(min(struct(col("__doc"), col("__sent"))).as("__first"))
    cand
      // prefiltered: firsts is one row per DUPLICATED hash — broadcast it
      // so the candidate rows skip a sort-merge exchange for the join-back
      .join(if (prefilterActive) broadcast(firsts) else firsts, Seq("__hash"))
      .where(struct(col("__doc"), col("__sent")) =!= col("__first"))
      .select("__hash", "__doc", "__sent")
  }

  /** SentenceDedup against a PRE-BUILT index corpus (sentence_dedup.py
    * index_folder + only_dedup_in_index): a corpus window matching ANY
    * index window is a duplicate span — every corpus occurrence is
    * removed, since the index entry always "comes first" (HashSig sorting,
    * sentence_dedup.py:57,275-281). With onlyDedupInIndex=false the
    * within-corpus first-wins rule applies on top, like the reference's
    * `or not self.config.only_dedup_in_index` arm. */
  def withIndex(df: DataFrame, idCol: String, textCol: String,
                indexDf: DataFrame, indexTextCol: String,
                cfg: SentenceDedupConfig = SentenceDedupConfig(),
                onlyDedupInIndex: Boolean = true)
               (implicit spark: SparkSession): DataFrame = {
    // loose mode consumes the corpus window hashes THREE times (index
    // probe, first-wins agg, join-back) — persist the slim sigs projection
    // so the hashing UDF runs once, same pattern as SimHashDedup
    val sigs0 = sigsOf(df, idCol, textCol, cfg)
    val sigs =
      if (onlyDedupInIndex) sigs0
      // (the actual .persist was missing here through r6 — swapRotating
      // only does unpersist bookkeeping; review-caught)
      else CacheRegistry.swapRotating("sentencededup.indexsigs",
        sigs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val indexHashes = indexDf
      .where(col(indexTextCol).isNotNull) // null index rows: skip, not NPE
      .select(explode(windowHashesUdf(cfg)(col(indexTextCol))).as("w"))
      .select(col("w._2").as("__hash")).distinct()
    val fromIndex = sigs.join(indexHashes, Seq("__hash"), "left_semi")
    val dupRows =
      if (onlyDedupInIndex) fromIndex
      else fromIndex.select("__hash", "__doc", "__sent")
        .union(corpusDups(sigs, cfg.prefilterDupHashes)).distinct()
    val dups = dupRows.groupBy("__doc")
      .agg(sort_array(collect_list(col("__sent"))).as("__dupSents"))
    finish(df, idCol, textCol, cfg, dups)
  }

  private def finish(df: DataFrame, idCol: String, textCol: String,
                     cfg: SentenceDedupConfig, dups: DataFrame): DataFrame = {
    val n = cfg.nSentences
    val splitSent = cfg.splitSentences

    val minWordsSpan = cfg.minWordsToRemoveSpan
    val rewrite = udf { (text0: String, dupSents0: Seq[Int]) =>
      // materialize once: Spark's Seq deserializer can hand a LINEAR
      // sequence, and dupSents is random-accessed in the unit loop below —
      // a mass-duplicated doc (thousands of dup windows) would go quadratic
      val dupSents: Array[Int] = if (dupSents0 == null) Array.empty else dupSents0.toArray
      // a null-text row never has dup windows, so the __touched guard keeps
      // its original value — but the udf is still evaluated and must not NPE
      val text = if (text0 == null) "" else text0
      // min_words_to_remove_span restore (sentence_dedup.py:341-372): the
      // reference records only a removed span's FIRST unit (its
      // `elif not removed_span` guard), so the word check and restoration
      // both cover just that unit — mirrored exactly
      def restore(kept: scala.collection.mutable.ArrayBuffer[String],
                  pending: Option[String]): Unit =
        pending.foreach { first =>
          if (minWordsSpan > 0 && Tokenizer.words(first).length < minWordsSpan)
            kept += first
        }
      if (splitSent) {
        // sentence mode: span-based rewrite (remove_dup_sentences,
        // sentence_dedup.py:329-379) — kept units include the raw
        // inter-sentence whitespace since the previous span end, joined
        // with "" and lstrip'd
        val spans = Tokenizer.sentenceSpans(text)
        val kept = scala.collection.mutable.ArrayBuffer.empty[String]
        var di = 0
        var dropUntil = 0
        var lastS = 0
        var pending: Option[String] = None
        for (idx <- spans.indices) {
          if (di < dupSents.length && dupSents(di) == idx) {
            dropUntil = idx + n
            di += 1
          }
          val unit = text.substring(lastS, spans(idx)._2)
          if (idx >= dropUntil) {
            restore(kept, pending); pending = None
            kept += unit
          } else if (pending.isEmpty) pending = Some(unit)
          lastS = spans(idx)._2
        }
        restore(kept, pending)
        (PyText.pyLStrip(kept.mkString("")), spans.length - kept.length)
      } else {
        val sents = PyText.splitLines(text)
        val kept = scala.collection.mutable.ArrayBuffer.empty[String]
        var di = 0
        var dropUntil = 0
        var pending: Option[String] = None
        for (idx <- sents.indices) {
          if (di < dupSents.length && dupSents(di) == idx) {
            dropUntil = idx + n
            di += 1
          }
          if (idx >= dropUntil) {
            restore(kept, pending); pending = None
            kept += sents(idx)
          } else if (pending.isEmpty) pending = Some(sents(idx))
        }
        restore(kept, pending)
        // sentence_dedup.py:377-378: merge_char.join(...).lstrip() in BOTH
        // modes — line mode lstrips too
        (PyText.pyLStrip(kept.mkString("\n")), sents.length - kept.length)
      }
    }

    // docs with NO duplicate windows are never rewritten at all (the
    // reference only calls remove_dup_sentences for docs present in the
    // dups index) — this matters because the rewrite is not an identity on
    // texts with leading/trailing whitespace (sentence mode trims spans;
    // line mode drops a trailing newline through split/join)
    val joined = df
      .join(dups.withColumnRenamed("__doc", idCol), Seq(idCol), "left")
      .withColumn("__touched", col("__dupSents").isNotNull)
      .withColumn("__r", rewrite(col(textCol),
        coalesce(col("__dupSents"), array().cast("array<int>"))))
      .withColumn("__newText",
        when(col("__touched"), col("__r._1")).otherwise(col(textCol)))
      .withColumn("removed_sentences",
        when(col("__touched"), col("__r._2")).otherwise(lit(0)))

    val wordCount = udf { t: String => if (t == null) 0 else Tokenizer.words(t).length }
    // the keep rule counts SENTENCES regardless of dedup mode
    // (sentence_dedup.py:437-438 calls split_into_sentences
    // unconditionally, even when the dedup units were lines)
    val sentCount = udf { t: String => if (t == null) 0 else Tokenizer.sentences(t).length }

    // reference keep rule (sentence_dedup.py:424-441): (no change OR both
    // minimum thresholds) AND filtered text non-empty — the non-empty guard
    // applies to BOTH branches (an empty doc is dropped even when untouched).
    // Null text = no units at all: dropped like the empty doc (the ===/=!=
    // comparisons would otherwise yield a NULL keep flag, not a boolean)
    joined
      .withColumn("sentence_dedup_keep",
        when(col("__newText").isNull, lit(false)).otherwise(
          ((col("__newText") === col(textCol)) ||
           ((lit(cfg.minDocWords) <= 0 || wordCount(col("__newText")) >= cfg.minDocWords) &&
            (lit(cfg.minNumSentences) <= 0 || sentCount(col("__newText")) >= cfg.minNumSentences))) &&
          col("__newText") =!= ""))
      .withColumn(textCol, col("__newText"))
      .drop("__dupSents", "__touched", "__r", "__newText")
  }
}

/** SimHash near-dup: 64-bit charge/discharge fingerprint over word
  * features; near-duplicates = hamming distance ≤ k, found at scale by
  * banding the fingerprint into (k+1) segments (pigeonhole: any pair within
  * distance k shares at least one exact segment) and verifying candidates. */
object SimHashDedup {

  def simhash64(text: String): Long = {
    val words = Tokenizer.words(TextKernels.simplifyText(text))
    if (words.isEmpty) return 0L
    val v = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = Hashes.xxhash64(words(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (v(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val simhashUdf = udf(simhash64 _)

  /** Annotate (simhash, simhash_cluster, simhash_keep) for pairs within
    * `maxHamming`. Banding gives exact recall for distance ≤ maxHamming. */
  def apply(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3)
           (implicit spark: SparkSession): DataFrame = {
    val bands = maxHamming + 1
    val bandBits = 64 / bands
    // the per-doc simhash UDF (simplify + tokenize + 64-bin charge/discharge)
    // is the expensive narrow pass — compute it ONCE into a persisted slim
    // (id, simhash) projection for the candidate-generation flow, which
    // consumes it three times (reps groupBy, exact-edge probe, banding).
    // Rotating key: building a second SimHashDedup before materializing the
    // first must not evict the first's cache (deferred-consumer hazard).
    val withSim = CacheRegistry.swapRotating("simhash.sim",
      df.select(col(idCol), simhashUdf(col(textCol)).as("simhash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // Identical fingerprints are distance-0 duplicates by definition:
    // collapse each simhash value to a min-id representative FIRST and emit
    // exact star edges, then band-join only DISTINCT fingerprints. Without
    // this, a hot band key (mass-duplicated text, or near-empty texts all
    // hashing to simhash 0) makes the self-join output O(group²) rows
    // *before* the hamming filter can drop anything — AQE redistributes but
    // cannot shrink that volume. Mirrors Similarity.cosineNearDupes'
    // exact-collapse. Connectivity (and thus min-id cluster labels) is
    // unchanged: star-to-rep connects exactly what the full clique did.
    val reps = withSim.groupBy("simhash").agg(min(col(idCol)).as("__rep"))
    val exactEdges = withSim.join(reps, Seq("simhash"))
      .where(col(idCol) =!= col("__rep"))
      .select(col(idCol).as("doc"), col("__rep").as("rep"))

    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        col("simhash").bitwiseAND(
          lit(((1L << bandBits) - 1) << (b * bandBits))).as("key"))
    }
    // Candidate pairs via a self-join on the band key (NOT collect_list +
    // double explode, which births O(group²) rows out of one array row and
    // OOMs on a hot band). A sort-merge self-join streams both sides and
    // AQE skew-split applies; `a.doc < b.doc` halves the pair volume and
    // dedups (a,b)/(b,a).
    val banded = reps
      .select(col("__rep").as("doc"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
    val repEdges = banded.as("a")
      .join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc") < col("b.doc"))
      .where(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= maxHamming)
      .select(col("b.doc").as("doc"), col("a.doc").as("rep"))
      .distinct()

    val comps = MinhashDedup.components(exactEdges.union(repEdges))
    // annotate via a per-row withColumn (NOT a join on id): a join would
    // change the row contract — null ids silently vanish from an inner
    // equi-join and duplicate ids multiply output rows. One extra UDF pass
    // here keeps per-row semantics; candidate generation above still reads
    // the cached projection (2 total UDF passes vs 3 before the cache).
    df.withColumn("simhash", simhashUdf(col(textCol)))
      .join(comps.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .withColumn("simhash_cluster", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
      .withColumn("simhash_keep", col("simhash_cluster") === col(idCol))
  }
}

/** Exact n-gram Jaccard similarity between candidate pairs (the verify
  * step after any LSH candidate generation). */
object NgramJaccard {
  def jaccard(a: String, b: String, n: Int = 5): Double = {
    val sa = TextKernels.getNGrams(Tokenizer.words(TextKernels.simplifyText(a)), n).toSet
    val sb = TextKernels.getNGrams(Tokenizer.words(TextKernels.simplifyText(b)), n).toSet
    if (sa.isEmpty && sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  def jaccardUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: String, b: String) => jaccard(a, b, n) }
}
