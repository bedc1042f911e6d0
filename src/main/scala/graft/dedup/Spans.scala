package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-SPAN detection — exact substring deduplication at sub-document
  * granularity, after Lee et al. 2021 ("Deduplicating Training Data Makes
  * Language Models Better", ExactSubstr): any k-token window whose text
  * occurs more than once ANYWHERE in the corpus (same doc included) marks a
  * duplicated span `[pos, pos+k)`; overlapping or adjacent spans merge into
  * maximal removal regions per document. Complements the whole-document
  * family (`d1` exact, MinHash/SimHash near-dup): those decide which DOCS
  * to drop, this finds which PARTS of kept docs are boilerplate.
  *
  * Plan shape, scale notes (100 TB):
  *  - tokenize + shingle is map-side (one generator per doc, no shuffle);
  *  - repeated-shingle detection is ONE hash aggregation keyed by the
  *    shingle, and the join back is co-partitioned on the same key — AQE
  *    handles the skewed hot shingles; no all-pairs stage anywhere;
  *  - span merging is a per-document window (sort bounded by doc length),
  *    partitioned on doc_id — embarrassingly parallel.
  *  At corpus scale the shingle key is `xxhash64(shingle)` — a 64-bit
  *  fingerprint drops shuffle width ~10×, with the identical plan.
  *  Collision odds are 2⁻⁶⁴ per PAIR; by the birthday bound a 100 TB
  *  corpus (~10¹² distinct shingles) expects ~n²/2⁶⁵ ≈ tens of thousands
  *  of colliding pairs, each falsely marking two unrelated k-token
  *  windows as duplicated — a ~10⁻⁸ false-positive span fraction,
  *  negligible for dedup purposes. That is the DEFAULT
  *  (`hashedKeys = true`); the
  *  string-key form remains for the external oracle gate, and
  *  `SpansSpec` pins the two row-identical.
  *  Reference corpus ops context: `sc_crawler`'s dedup surface is
  *  row-level (A9/A11); this operator is part of the training-data
  *  extension family.
  */
object Spans {

  /** The dedup key for a shingle: its 64-bit xxhash64 fingerprint (the
    * scale default — shuffle width independent of shingle text length) or
    * the string itself (oracle-parity path). */
  private def shingleKey(shingle: Column, hashed: Boolean): Column =
    if (hashed) xxhash64(shingle) else shingle

  /** One row per document that contains at least one duplicated span:
    * `(idCol, n_dup_spans, dup_tokens, total_tokens, dup_ratio)`.
    * Tokens are whitespace-split; empty tokens drop (so the position
    * space is contiguous and oracle-reproducible). */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, hashedKeys: Boolean = true): DataFrame = {
    val toks = docs.select(col(idCol),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("toks"))
      .withColumn("total_tokens", size(col("toks")).cast("long"))
    // shingle starts: one generator row per position 0..n-k, text built by
    // slicing the token array — no second pass over the document
    val sh = toks.filter(col("total_tokens") >= k)
      .select(col(idCol), col("total_tokens"), col("toks"),
        explode(sequence(lit(0), (col("total_tokens") - k).cast("int"))).as("pos"))
      .withColumn("skey", shingleKey(
        concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(k))), hashedKeys))
      .drop("toks")
    // a shingle seen twice anywhere (cross- OR within-doc) is duplicated
    val dup = sh.groupBy(col("skey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("skey"))
    // co-partitioned equi-join back on the same key the count shuffled on
    val starts = sh.join(dup, Seq("skey"))
      .select(col(idCol), col("total_tokens"), col("pos"))
    // gaps-and-islands: spans all have length k, so sorted starts merge
    // while each start is within k of its predecessor (adjacent included)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val isl = starts
      .withColumn("brk",
        when(lag(col("pos"), 1).over(w).isNull, 1)
          .when(col("pos") > lag(col("pos"), 1).over(w) + k, 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
    val spans = isl.groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + k).as("e"),
        first(col("total_tokens")).as("total_tokens"))
    spans.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s")).as("dup_tokens"),
        first(col("total_tokens")).as("total_tokens"))
      .withColumn("dup_ratio",
        round(col("dup_tokens") / col("total_tokens").cast("double"), 4))
  }

  /** The cut step of ExactSubstr dedup: every token covered by a merged
    * duplicated span is removed and the document re-assembled from the
    * surviving tokens (single-space joined — the tokenizer already
    * collapsed whitespace, so this is idempotent). ALL input docs come
    * back, clean docs unchanged modulo whitespace normalization:
    * `(idCol, clean_text, n_kept, n_removed)`.
    *
    * Plan shape: spans per doc collapse to ONE array row
    * (`collect_list` bounded by doc_len/k entries — safe state), join
    * back to the corpus on the id (co-partitioned with the span
    * window's own partitioning), and the cut itself is a map-side
    * higher-order `filter` over the token array — no per-token shuffle,
    * no UDF. */
  def cleanText(docs: DataFrame, idCol: String, textCol: String,
                k: Int, hashedKeys: Boolean = true): DataFrame = {
    val spans = spanList(docs, idCol, textCol, k, hashedKeys)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    docs
      .select(col(idCol),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("toks"))
      .join(spans, Seq(idCol), "left")
      .withColumn("kept",
        when(col("spans").isNull, col("toks"))
          .otherwise(filter(col("toks"), (t, i) =>
            !exists(col("spans"),
              s => i >= s("span_start") && i < s("span_end")))))
      .select(col(idCol),
        concat_ws(" ", col("kept")).as("clean_text"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"))
  }

  /** The maximal merged spans themselves — `(idCol, span_start, span_end)`
    * with `span_end` exclusive; the substrate a cleaning pass cuts. */
  def spanList(docs: DataFrame, idCol: String, textCol: String,
               k: Int, hashedKeys: Boolean = true): DataFrame = {
    val toks = docs.select(col(idCol),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("toks"))
      .withColumn("n", size(col("toks")))
    val sh = toks.filter(col("n") >= k)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), (col("n") - k).cast("int"))).as("pos"))
      .withColumn("skey", shingleKey(
        concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(k))), hashedKeys))
      .drop("toks")
    val dup = sh.groupBy(col("skey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select(col("skey"))
    val starts = sh.join(dup, Seq("skey")).select(col(idCol), col("pos"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    starts
      .withColumn("brk",
        when(lag(col("pos"), 1).over(w).isNull, 1)
          .when(col("pos") > lag(col("pos"), 1).over(w) + k, 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + k).as("span_end"))
      .drop("island")
  }
}
