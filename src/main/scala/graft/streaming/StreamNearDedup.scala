package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.llm.TextDedup

/** One (doc, band) arrival keyed by its LSH bucket (band:bandkey). */
case class BandedDoc(bucket: String, doc_id: Long)

/** A band collision between an arriving doc and an already-indexed one —
  * a NEAR-dup candidate pair awaiting exact verification. */
case class NearDupCandidate(doc_id: Long, matched_id: Long)

/** Streaming NEAR-dup rejection at ingest — the stream face of the
  * engine's flagship batch dedup (q27 banded MinHash) and the 100 TB
  * ingest-side shape of incremental dedup (q76): as documents arrive,
  * each is banded with the EXACT q27 hash family
  * ([[graft.llm.TextDedup.perDocBands]] — same 32 affine minhashes, same
  * 8 band keys, bit-identical to the batch index) and checked against a
  * keyed state store of previously-indexed band buckets. A collision
  * emits a candidate pair on arrival; exact Jaccard verification then
  * runs candidate-bounded per micro-batch ([[verdicts]], the same
  * `jaccardVerified` law q76 applies). The corpus-side band index lives
  * where it belongs at scale: sharded across executors in RocksDB keyed
  * state, not in a driver table and not re-joined per batch.
  *
  * Semantics are ONE-SIDED by micro-batch, mirroring q76's
  * incoming-vs-existing discipline: within a batch, arrivals match only
  * state from PRIOR batches (the snapshot is read before any append), so
  * same-batch mutual near-dups are not paired — those are the backfill
  * dedup's job (q26/q27), exactly as in production where the ingest gate
  * guards the already-deduped corpus.
  *
  * Bounded state, two ways (the classic streaming-dedup scale law, same
  * as [[StreamDedup]]):
  *  - `retention` puts a TTL on every bucket's member list: a near-dup
  *    arriving after the window is admitted as novel — dedup-within-
  *    window, state bounded forever;
  *  - `bucketCap` stops indexing a bucket past its cap. A bucket
  *    attracting thousands of members is a boilerplate/degenerate
  *    bucket, the same pathology the batch side bounds with df-capped
  *    candidates (q157) and bucket caps (q51); arrivals beyond the cap
  *    still emit candidates against the capped members, they just stop
  *    growing the index.
  */
object StreamNearDedup {

  /** Per-bucket membership state: arrivals pair against the PRIOR-batch
    * snapshot, then join the index (up to `bucketCap`). Arrival order
    * inside a batch is made deterministic (distinct + sorted) — shuffle
    * iterator order is not. */
  class BandBucketProcessor(ttl: TTLConfig, bucketCap: Int)
      extends StatefulProcessor[String, BandedDoc, NearDupCandidate] {

    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members", Encoders.scalaLong, ttl)

    override def handleInputRows(
        key: String,
        rows: Iterator[BandedDoc],
        timers: TimerValues): Iterator[NearDupCandidate] = {
      val existing = members.get().toArray
      val arrivals = rows.map(_.doc_id).toSeq.distinct.sorted
      val out = for { d <- arrivals; e <- existing }
        yield NearDupCandidate(d, e)
      val room = bucketCap - existing.length
      if (room > 0 && arrivals.nonEmpty)
        members.appendList(arrivals.take(room).toArray)
      out.iterator
    }
  }

  /** Wire the band-bucket processor onto a streaming frame with
    * (doc_id, text) columns; emits one [[NearDupCandidate]] per band
    * collision (a pair colliding in several bands appears several times —
    * verification dedups, as q76's candidate step does).
    *
    * TimeMode follows `retention` exactly as [[StreamDedup.novelDocs]]
    * documents: TTL state needs ProcessingTime; no retention →
    * TimeMode.None so AvailableNow backfills drain. */
  def candidates(spark: SparkSession, docs: DataFrame,
                 retention: Option[Duration] = None,
                 bucketCap: Int = 1 << 16): Dataset[NearDupCandidate] = {
    import spark.implicits._
    val ttl = retention.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode =
      if (retention.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    TextDedup.perDocBands(docs)
      .select(concat_ws(":", col("band"), col("bkey")).as("bucket"),
        col("doc_id").cast("long").as("doc_id"))
      .as[BandedDoc]
      .groupByKey(_.bucket)
      .transformWithState(new BandBucketProcessor(ttl, bucketCap),
        timeMode, OutputMode.Append())
  }

  /** Exact-Jaccard verdicts over streamed candidates — the q76 output
    * contract ((doc_id, n_matches, is_new) per incoming doc): candidate
    * pairs dedup across bands, verify against the corpus shingle frame
    * with the SAME `jaccardVerified` law the batch operator uses, and
    * every incoming doc gets a row (no candidates → is_new, including
    * sub-[[TextDedup.MinhashK]]-word docs that emit no bands). In
    * production this runs inside foreachBatch on each micro-batch's
    * (tiny, candidate-bounded) output; the parity spec runs it over the
    * drained sink. */
  def verdicts(streamedCandidates: DataFrame, corpus: DataFrame,
               incoming: DataFrame, minJaccard: Double = 0.8): DataFrame = {
    val sh = graft.core.Caches.scratch(
      TextDedup.shingles(corpus, TextDedup.MinhashK))
    val cand = streamedCandidates
      .select(col("doc_id").as("doc_in"), col("matched_id").as("doc_ex"))
      .distinct()
    val matches = TextDedup.jaccardVerified(cand, sh, minJaccard)
      .groupBy(col("doc_in")).agg(count(lit(1)).as("nm"))
    incoming.select(col("doc_id"))
      .join(matches.withColumnRenamed("doc_in", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nm"), lit(0L)).as("n_matches"),
        col("nm").isNull.as("is_new"))
      .orderBy(col("doc_id").asc)
  }
}
