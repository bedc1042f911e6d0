package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming document dedup — the incremental counterpart of the batch
  * d1/d7 operators: documents arrive on a stream and each is decided
  * (keep / duplicate-of) against everything seen so far, without
  * reprocessing the corpus.
  *
  *  - EXACT: key the stream by content fingerprint; per-key state is just
  *    the first doc_id. The keeper for a fingerprint is decided once and
  *    never changes, so decisions are stable across micro-batches.
  *  - NEAR-DUP (SimHash): the batch pigeonhole trick streamified — each
  *    doc's 32-bit fingerprint splits into four 8-bit blocks; any pair
  *    within Hamming distance ≤ 3 shares at least one block, so keying
  *    the stream by (block_idx, block_value) routes every candidate pair
  *    through SOME common state partition. Per-bucket state holds the
  *    (doc_id, simhash) pairs seen in that bucket; a new doc emits one
  *    decision row after exact Hamming verification against the bucket.
  *    A doc matching in several buckets emits several candidate rows —
  *    downstream takes min(match_id) per doc, exactly like the batch
  *    pair-frame.
  *
  * Scale: state is partitioned by bucket across executors; bucket
  * cardinality (4 × 256 for 8-bit blocks) bounds skew for uniform
  * hashes; production swaps in the RocksDB state store and a TTL via
  * GroupStateTimeout when the dedup horizon is bounded.
  */
object StreamingDedup {

  case class Doc(doc_id: Long, text: String)
  case class DedupDecision(doc_id: Long, keep: Boolean, dup_of: Option[Long])
  case class NearDup(doc_id: Long, match_id: Long, hamming: Int)

  /** Exact streaming dedup: first doc per fingerprint wins, forever. */
  def exactDecisions(docs: Dataset[Doc],
                     fingerprint: String => String): Dataset[DedupDecision] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => fingerprint(d.text))
      .flatMapGroupsWithState[Long, DedupDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Doc], state: GroupState[Long]) =>
          // order within the batch by doc_id so the keeper is deterministic
          val ordered = rows.toSeq.sortBy(_.doc_id)
          val out = scala.collection.mutable.ListBuffer.empty[DedupDecision]
          var keeper: Option[Long] = state.getOption
          ordered.foreach { d =>
            keeper match {
              case None =>
                keeper = Some(d.doc_id)
                out += DedupDecision(d.doc_id, keep = true, None)
              case Some(k) =>
                out += DedupDecision(d.doc_id, keep = false, Some(k))
            }
          }
          keeper.foreach(state.update)
          out.iterator
      }
  }

  case class NearDupJ(doc_id: Long, match_id: Long, jaccard: Double)
  /** One band-bucket's memory: the docs that have hashed into it, with
    * their shingle sets for exact verification. */
  case class BucketDoc(doc_id: Long, shingles: Array[Long])

  /** Streaming MinHash-LSH near-dup dedup — the incremental counterpart
    * of the batch d3 pipeline, and (with `initialIndex`) of the
    * cross-snapshot d10: each arriving document is shingled, signed, and
    * fanned out to its LSH band buckets map-side; per-bucket keyed state
    * holds the (doc_id, shingle set) of every earlier doc in the bucket,
    * and a new doc emits one exact-Jaccard-verified pair row per earlier
    * near-dup. The kernels are [[graft.dedup.MinHash.Scalar]] — pinned
    * value-identical to the batch Column kernels — so streaming decisions
    * equal batch decisions on the same data.
    *
    * `initialIndex`: rows of a prior snapshot's [[graft.dedup.MinHash
    * .snapshotIndex]] (id, sharr, band, band_hash) loaded as the state's
    * initial contents — the streaming form of "dedup today's batch
    * against the stored index": the snapshot text is never re-read, and
    * stream docs also dedup against EACH OTHER incrementally (the batch
    * d10 does not — restrict downstream to match_id ∈ snapshot when d10
    * semantics are wanted).
    *
    * Scale: state is sharded by (band, band_hash) — cardinality is
    * corpus-sized but each bucket is small for healthy band widths;
    * shingle sets in state cost what the batch verification join reads
    * per candidate. Production: RocksDB state store + GroupStateTimeout
    * TTL when the dedup horizon is bounded. A doc matching in several
    * buckets emits the pair once per shared bucket — downstream
    * `distinct`, exactly like the batch candidate frame before verify. */
  def minhashCandidates(docs: Dataset[Doc], n: Int = 2, threshold: Double = 0.7,
                        initialIndex: Option[Dataset[(Long, Array[Long], Int, Long)]] = None)
      : Dataset[NearDupJ] = {
    import docs.sparkSession.implicits._
    import graft.dedup.MinHash.Scalar
    val keyed = docs.flatMap { d =>
      val sh = Scalar.hashedShingles(d.text, n)
      Scalar.bandKeys(Scalar.signature(sh)).map { case (b, mix) =>
        (b.toLong << 32 | mix, d.doc_id, sh)
      }
    }
    val grouped = keyed.groupByKey(_._1)
    def step(key: Long, rows: Iterator[(Long, Long, Array[Long])],
             state: GroupState[List[BucketDoc]]): Iterator[NearDupJ] = {
      val ordered = rows.map { case (_, id, sh) => BucketDoc(id, sh) }
        .toSeq.sortBy(_.doc_id)
      var seen = state.getOption.getOrElse(Nil)
      val out = scala.collection.mutable.ListBuffer.empty[NearDupJ]
      ordered.foreach { d =>
        seen.foreach { p =>
          if (p.doc_id != d.doc_id) {
            val j = Scalar.jaccard(d.shingles, p.shingles)
            if (j >= threshold)
              out += NearDupJ(d.doc_id, p.doc_id,
                BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
        seen = d :: seen
      }
      state.update(seen)
      out.iterator
    }
    initialIndex match {
      case None =>
        grouped.flatMapGroupsWithState[List[BucketDoc], NearDupJ](
          OutputMode.Append(), GroupStateTimeout.NoTimeout())(step _)
      case Some(idx) =>
        val init = idx.map { case (id, sh, b, mix) =>
            (b.toLong << 32 | mix, BucketDoc(id, sh))
          }
          .groupByKey(_._1)
          .mapValues(_._2)
          .mapGroups((k, vs) => (k, vs.toList.sortBy(_.doc_id)))
          .groupByKey(_._1).mapValues(_._2)
        grouped.flatMapGroupsWithState[List[BucketDoc], NearDupJ](
          OutputMode.Append(), GroupStateTimeout.NoTimeout(), init)(step _)
    }
  }

  case class Vec(vec_id: Long, embedding: Array[Float])
  case class NearVec(vec_id: Long, match_id: Long, sim: Double)
  /** One SRP bucket's memory: vectors (as doubles) with precomputed
    * squared norms. */
  case class BucketVec(vec_id: Long, v: Array[Double], nsq: Double)

  /** Streaming embedding near-dup detection — the incremental twin of the
    * batch SRP pair scan ([[graft.similarity.Cosine.srpPairs]] / x3):
    * each arriving vector is bucketed by the sign bits of the SAME
    * deterministic hyperplane projections the batch operator uses
    * (identical constants ⇒ identical buckets ⇒ identical candidate
    * semantics), and cosine-verified against the vectors already in its
    * bucket. Emits one pair row per (new, earlier) near-dup.
    *
    * Determinism: projections and cosines fold left-to-right in double,
    * exactly like the batch `dot_product` kernel, so the spec can assert
    * streaming ≡ batch down to the similarity values. Scale: state is
    * sharded by bucket (2^nPlanes keys; add planes as the corpus grows —
    * same knob as batch SRP); per-bucket state holds the bucket's
    * vectors, which is what the batch join reads per candidate too. */
  def srpCandidates(vecs: Dataset[Vec], threshold: Double,
                    nPlanes: Int, dim: Int): Dataset[NearVec] = {
    import vecs.sparkSession.implicits._
    val planes: Array[Array[Double]] =
      graft.similarity.Cosine.hyperplanes(nPlanes, dim).map(_.toArray).toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length && i < b.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // Batch srpPairs drops malformed vectors (zip_with yields null on a
    // length mismatch); skip them here too so parity holds on bad input.
    val keyed = vecs.flatMap { r =>
      if (r.embedding.length != dim) None
      else {
        val v = r.embedding.map(_.toDouble)
        var bucket = 0L
        planes.zipWithIndex.foreach { case (h, i) =>
          if (dot(v, h) > 0) bucket |= (1L << i)
        }
        Some((bucket, r.vec_id, v))
      }
    }
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[List[BucketVec], NearVec](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Array[Double])],
         state: GroupState[List[BucketVec]]) =>
          val ordered = rows.map { case (_, id, v) => BucketVec(id, v, dot(v, v)) }
            .toSeq.sortBy(_.vec_id)
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[NearVec]
          ordered.foreach { d =>
            seen.foreach { p =>
              if (p.vec_id != d.vec_id) {
                val denom = math.sqrt(d.nsq) * math.sqrt(p.nsq)
                if (denom != 0.0) {
                  val sim = dot(d.v, p.v) / denom
                  if (sim >= threshold)
                    out += NearVec(d.vec_id, p.vec_id,
                      BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                        .toDouble)
                }
              }
            }
            seen = d :: seen
          }
          state.update(seen)
          out.iterator
      }
  }

  /** SimHash near-dup candidates over the stream: one row per
    * (new doc, earlier doc) pair within `maxDist`, verified by exact
    * Hamming distance inside the bucket state. */
  def nearDupCandidates(docs: Dataset[Doc], simhash: String => Long,
                        maxDist: Int = 3): Dataset[NearDup] = {
    import docs.sparkSession.implicits._
    require(maxDist <= 3, "4 blocks of 8 bits are lossless only for dist <= 3")
    val withHash = docs.map(d => (d.doc_id, simhash(d.text)))
    // fan each doc out to its 4 block buckets — map-side, before the
    // state shuffle; bucket key packs (block index, block value)
    val keyed = withHash.flatMap { case (id, h) =>
      (0 until 4).map(b => (b << 8 | ((h >> (8 * b)) & 0xff).toInt, id, h))
    }
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long)], NearDup](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[(Int, Long, Long)], state: GroupState[List[(Long, Long)]]) =>
          val ordered = rows.map { case (_, id, h) => (id, h) }.toSeq.sortBy(_._1)
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[NearDup]
          ordered.foreach { case (id, h) =>
            seen.foreach { case (pid, ph) =>
              val dist = java.lang.Long.bitCount(h ^ ph)
              if (pid != id && dist <= maxDist) out += NearDup(id, pid, dist)
            }
            seen = (id, h) :: seen
          }
          state.update(seen)
          out.iterator
      }
  }

  case class BlockDecision(doc_id: Long, block_idx: Long, keep: Boolean)

  /** Streaming paragraph dedup — the incremental twin of the batch c8/c9
    * block operators ([[graft.text.TextAnalysis.blockDedup]] /
    * `blockDedupAgainst`): each arriving document is cut into
    * non-overlapping `blockSize`-token blocks MAP-SIDE (the tokenizer and
    * the block count formula replicate the batch `chunkWindows` exactly —
    * [[graft.dedup.MinHash.Scalar.tokens]] is the spec-pinned Spark-parity
    * kernel), the stream is keyed by the block TEXT, and per-key state
    * remembers the first (doc_id, block_idx) to claim it — so a block
    * repeating anything seen earlier in the stream emits keep=false,
    * forever, across micro-batches and restarts.
    *
    * `initialKeys`: the block strings of a prior snapshot's
    * [[graft.text.TextAnalysis.blockIndex]] (string-key form) loaded as
    * initial state — the streaming form of c9: stream blocks dedup against
    * the stored snapshot AND each other without re-reading snapshot text.
    *
    * Output is one decision row per block; reassembly (concat of kept
    * blocks per doc) is a per-sink groupBy, exactly the batch tail.
    * Scale: state is sharded by block text (one small entry per distinct
    * block); production swaps the RocksDB store + TTL horizon as with the
    * other streaming twins. */
  def blockDecisions(docs: Dataset[Doc], blockSize: Int,
                     initialKeys: Option[Dataset[String]] = None)
      : Dataset[BlockDecision] = {
    import docs.sparkSession.implicits._
    require(blockSize > 0, "need a positive block size")
    val keyed = docs.flatMap { d =>
      val toks = graft.dedup.MinHash.Scalar.tokens(d.text)
      // chunkWindows' count: greatest(ceil((n - size) / size), 0) + 1
      val nChunks = math.max(
        math.ceil((toks.length - blockSize).toDouble / blockSize).toLong, 0L) + 1
      (0L until nChunks).map { i =>
        val from = (i * blockSize).toInt
        (toks.slice(from, from + blockSize).mkString(" "), d.doc_id, i)
      }
    }
    def step(key: String, rows: Iterator[(String, Long, Long)],
             state: GroupState[(Long, Long)]): Iterator[BlockDecision] = {
      val ordered = rows.map { case (_, id, idx) => (id, idx) }.toSeq.sorted
      val out = scala.collection.mutable.ListBuffer.empty[BlockDecision]
      var first = state.getOption
      ordered.foreach { case (id, idx) =>
        first match {
          case None =>
            first = Some((id, idx))
            out += BlockDecision(id, idx, keep = true)
          case Some(_) =>
            out += BlockDecision(id, idx, keep = false)
        }
      }
      first.foreach(state.update)
      out.iterator
    }
    val grouped = keyed.groupByKey(_._1)
    initialKeys match {
      case None =>
        grouped.flatMapGroupsWithState[(Long, Long), BlockDecision](
          OutputMode.Append(), GroupStateTimeout.NoTimeout())(step _)
      case Some(keys) =>
        // sentinel claimant: any stream occurrence of a seeded key loses
        val init = keys.distinct().groupByKey(identity)
          .mapValues(_ => (Long.MinValue, Long.MinValue))
        grouped.flatMapGroupsWithState[(Long, Long), BlockDecision](
          OutputMode.Append(), GroupStateTimeout.NoTimeout(), init)(step _)
    }
  }
}
