package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-6 duplicate-candidate prefilter, shared by the dedup family
  * (ExactDedup, UrlDedup, SentenceDedup, ExactSubstrDedup, lshTopK).
  *
  * First-occurrence / best-of-group dedup only ever needs the rows whose
  * key occurs MORE THAN ONCE: a key-unique row is the single member of its
  * group — its own representative — so it can be assigned locally and must
  * never ride the group-by/join exchanges. `dupKeys` shuffles ONLY the key
  * (+ an 8-byte partial count, map-side combined, hash-agg — no sort) and
  * `filterToDupKeys` broadcast-LEFT-SEMI-joins the input against that
  * small set.
  *
  * Scale contract: the distinct duplicated-key set must fit a broadcast
  * (the `broadcast` hint deliberately bypasses autoBroadcastJoinThreshold).
  * Every caller exposes an escape flag for mass-dup corpora where it would
  * not; size the decision on the KEY set (keys are 8-64 bytes here), never
  * on group payloads — payload columns must not be broadcast through this
  * helper. */
private[graft] object DupCandidates {

  /** Distinct keys of `df` occurring more than once. Map-side partial
    * aggregation absorbs hot keys before the exchange, so a key shared by
    * millions of rows costs one combiner cell per map task, not a skewed
    * reducer. */
  def dupKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).drop("__n")

  /** `df` restricted to rows whose key occurs more than once, via a
    * broadcast left-semi join (the broadcast is the point: an unhinted
    * semi would shuffle the very table this prefilter exists to keep
    * local). Recomputes `df`'s lineage a second time unless the caller
    * persisted it — cheap when the lineage is a scan + projection, worth
    * a persist when it is a heavy UDF explode (see SentenceDedup). */
  def filterToDupKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.join(broadcast(dupKeys(df, keyCols)), keyCols, "left_semi")
}
