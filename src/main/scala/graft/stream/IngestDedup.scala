package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-flight exact deduplication for a streaming ingest path — the
  * streaming twin of graft.ext.Dedup.dedupExact, for pipelines that want
  * duplicates dropped before they ever land in the bronze table.
  *
  * Keyed on the content digest, NOT the payload: state per entry is one
  * 32-char digest, and the digest is also what the batch dedup family
  * groups on, so stream- and batch-deduped corpora agree.
  *
  * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) is the
  * scale-critical choice: plain streaming dropDuplicates keeps EVERY key
  * ever seen — unbounded state on an unbounded corpus — while the
  * within-watermark form evicts an entry once the watermark passes its
  * event time + delay. The contract is correspondingly windowed: a
  * duplicate arriving within the horizon is dropped; one arriving after
  * the horizon is re-admitted (and left for the batch exact-dedup pass to
  * fold — the standard stream+batch split of a dedup pipeline).
  */
object IngestDedup {

  /** docs(tsCol TIMESTAMP, text STRING, …) → same rows minus in-horizon
    * exact duplicates, with the digest column kept for downstream joins. */
  def exactWithinWatermark(docs: DataFrame, tsCol: String,
                           horizon: String): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("digest")
}
