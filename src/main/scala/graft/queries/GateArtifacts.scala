package graft.queries

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared stored-artifact memos for the gate packs (the pairs08
  * convention, centralized): each artifact is a pure function of
  * (session, data dir), written once per key and re-read by every
  * consumer — parquet-backed, so the harnesses' between-query cache
  * resets cannot kill it. Map-keyed (NOT single-slot) so a process
  * interleaving gates across data dirs (sf0.01 and sf1 checks
  * alternating) reuses every artifact instead of rebuilding on each
  * alternation — and hosting them here keeps the packs decoupled
  * (r1/r7/r8 in TextQueries and r2/r3 in SimilarityQueries share the
  * BM25 artifact without reaching into each other). */
private[queries] object GateArtifacts {

  private val memos =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), String]()

  // session → monotone UUID: identityHashCode can collide across live
  // sessions (or recur after GC, serving one session an artifact built
  // by another); a weak map hands each session a genuinely unique key
  // without pinning the session itself in memory
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  private def sessionId(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  private def memo(kind: String, s: SparkSession, dir: String)(
      build: String => Unit): String =
    memos.computeIfAbsent((kind, sessionId(s), dir), { _ =>
      val p = java.nio.file.Files.createTempDirectory(s"graft_$kind")
      try {
        build(p.toString)
        p.toString
      } catch {
        case e: Throwable =>
          // a half-built artifact must not survive to be memoized or
          // mistaken for a servable layout by a later open
          // the cleanup must never mask the BUILD failure: walk-stream
          // iteration surfaces I/O errors as UncheckedIOException (not
          // IOException), so swallow every non-fatal cleanup error and
          // always rethrow the original
          try {
            import scala.jdk.CollectionConverters._
            val walk = java.nio.file.Files.walk(p)
            try walk.iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.deleteIfExists(_))
            finally walk.close()
          } catch { case scala.util.control.NonFatal(_) => () }
          throw e
      }
    })

  /** The full-corpus BM25 serving artifact (term-bucketed postings tree
    * + pinned modulus): r1/r7 search or tombstone it, r8 probes it
    * pruned, r2/r3 read it for their lexical ranked lists. The
    * buildIndex postings cache is released once the parquet write has
    * materialized it (caller-owned-cache contract). */
  def bm25IndexDir(s: SparkSession, dir: String): String =
    memo("bm25idx", s, dir) { p =>
      val idx = graft.text.Bm25.buildIndex(Tables.documents(s, dir),
        "doc_id", "text")
      graft.text.Bm25.writeIndex(idx, p)
      idx.postings.unpersist()
    }

  /** r4's OLD-SNAPSHOT index (t7 buckets < 80): the increment gate's
    * stored state — in production the prior snapshot's index is a
    * persisted artifact the daily batch folds into, never an inline
    * rebuild (the r1/r7/r8 artifact argument applied to the append
    * gate; Bm25IndexSpec pins the parquet round trip score-identical). */
  def bm25OldIndexDir(s: SparkSession, dir: String): String =
    memo("bm25old", s, dir) { p =>
      val docs = Tables.documents(s, dir)
      val idx = graft.text.Bm25.buildIndex(
        docs.filter(graft.text.TextAnalysis.splitBucket(col("doc_id")) < 80),
        "doc_id", "text")
      graft.text.Bm25.writeIndex(idx, p)
      idx.postings.unpersist()
    }

  /** c13b's persisted DSIR model — training once per (session, dir) is
    * exactly the production cadence the gate models. */
  def dsirModelDir(s: SparkSession, dir: String): String =
    memo("dsirm", s, dir) { p =>
      graft.text.Dsir.writeModel(Tables.documents(s, dir), "doc_id", "text",
        "source", "src0", p)
    }

  /** x22's persisted IVF index (per-cell partition tree + commit
    * sidecar) over the sorted-fold centroids. */
  def ivfIndexDir(s: SparkSession, dir: String): String =
    memo("ivfidx", s, dir) { p =>
      val emb = Tables.embeddings(s, dir)
      graft.similarity.Cosine.writeIvfIndex(
        emb.select(col("vec_id"), col("embedding")),
        emb.select(col("vec_id"), col("label")),
        graft.similarity.Cosine.cellCentroidsSorted(emb, "label", "embedding"),
        "vec_id", "embedding", "label", p)
    }

  /** x25's persisted SQ8 artifact (pinned stats + plain codes +
    * pbucket-partitioned raw vectors + fingerprint sidecar). */
  def sq8IndexDir(s: SparkSession, dir: String): String =
    memo("sq8idx", s, dir) { p =>
      graft.similarity.Cosine.writeSq8Index(Tables.embeddings(s, dir),
        "vec_id", "embedding", 64, p)
    }

  /** x24b's ROTATED prefix artifact: prefix-16 in the second-moment
    * eigenbasis (trained from the corpus, pinned with a rotation
    * fingerprint sidecar), full vectors raw for the exact rerank. */
  def rotatedPrefixDir(s: SparkSession, dir: String): String =
    memo("protidx", s, dir) { p =>
      graft.similarity.Cosine.writeRotatedPrefixIndex(
        Tables.embeddings(s, dir), "vec_id", "embedding", 16, p)
      ()
    }

  /** x26/x27's persisted PQ/IVFADC tier (broadcastable codebook +
    * cell-partitioned codes + pbucket-partitioned raw vectors + commit
    * sidecar), trained with the sorted-fold codebook so the oracle
    * replays it bit-for-bit (the x14 convention). */
  def pqIndexDir(s: SparkSession, dir: String): String =
    memo("pqidx", s, dir) { p =>
      val emb = Tables.embeddings(s, dir)
      graft.similarity.Cosine.writePqIndex(emb,
        emb.select(col("vec_id"), col("label")), "vec_id", "embedding",
        "label", p,
        centroidFn = graft.similarity.Cosine.cellCentroidsSorted,
        centroids = Some(graft.similarity.Cosine.cellCentroidsSorted(
          emb, "label", "embedding")))
    }

  /** x27b's TRAINED PQ tier: per-subspace k-means codebooks
    * (writeTrainedPqIndex, 4 Lloyd rounds from the deterministic SRP
    * init, sorted-fold centroid step so the whole trainer is
    * bit-reproducible) — the acceptance-matrix row that prices TRAINING
    * against x27's hash quantizer at the same 4 B/vector. */
  def trainedPqIndexDir(s: SparkSession, dir: String): String =
    memo("pqtidx", s, dir) { p =>
      val emb = Tables.embeddings(s, dir)
      graft.similarity.Cosine.writeTrainedPqIndex(emb,
        emb.select(col("vec_id"), col("label")), "vec_id", "embedding",
        "label", p, iters = 4,
        centroidFn = graft.similarity.Cosine.cellCentroidsSorted)
    }

  /** x29's stored BINARY-QUANTIZED tier: sign-bit words (8 B/vector at
    * dim=64) + pbucket raw vectors under the bq_config commit sidecar —
    * parameter-free, so the oracle replays it with no stash. */
  def bqIndexDir(s: SparkSession, dir: String): String =
    memo("bqidx", s, dir) { p =>
      graft.similarity.Cosine.writeBqIndex(Tables.embeddings(s, dir),
        "vec_id", "embedding", 64, p)
    }

  /** x28c's RESIDUAL IVFADC tier — the full Jégou composition: coarse
    * cells TRAINED by k-means (16 cells, deterministic hash-bucket init,
    * 3 Lloyd rounds — x28b measured that the data-free label cells buy
    * probe recall only ~linearly in cells read) and the product
    * quantizer coding residuals x − q₁(x) against that coarse geometry
    * (writeResidualPqIndex, 4 PQ Lloyd rounds). Sorted-fold centroid
    * steps throughout so the oracle replays the stored centroids and
    * book bit-for-bit from their stashed literals. */
  def residualPqIndexDir(s: SparkSession, dir: String): String =
    memo("pqridx", s, dir) { p =>
      val C = graft.similarity.Cosine
      val emb = Tables.embeddings(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val init = emb.select(col("vec_id"), col("embedding"),
          pmod(xxhash64(col("vec_id")), lit(16)).as("icell"))
        val asg = C.lloydIterations(init, "vec_id", "embedding", "icell",
          3, C.cellCentroidsSorted)
        // final centroid table = the one the final assignment minimizes
        // against, recomputed from the LAST round's cells so the stored
        // (centroids, cells) pair satisfies cells = nearest(centroids)
        val cents = C.cellCentroidsSorted(
          asg.select(col("vec_id"), col("assigned_cell").as("cell"))
            .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
            .select(col("cell"), col("embedding")),
          "cell", "embedding")
        val cells = C.assignToCentroids(emb, "vec_id", "embedding",
            cents, "cell")
          .select(col("vec_id"), col("assigned_cell").as("cell"))
        C.writeResidualPqIndex(emb, cells, "vec_id", "embedding", "cell",
          cents, p, iters = 4, centroidFn = C.cellCentroidsSorted)
      } finally emb.unpersist()
    }
}
