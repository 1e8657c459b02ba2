package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators — the corpus-preparation layer a
  * large-scale LLM data pipeline runs after ingestion/dedup: dataset
  * splits, stratified downsampling, repetition-based quality filtering
  * (Gopher-style), PII redaction, token-budget sharding, and eval-set
  * decontamination. All are deterministic (hash-keyed, no RNG) so runs
  * are reproducible and oracle-checkable, and every plan is a
  * shuffle-minimal shape that survives a 100 TB corpus:
  *
  *  - splits/redaction are pure projections (zero shuffles);
  *  - sampling/repetition are single hash-aggregation chains with
  *    map-side partial aggregation;
  *  - token packing is the classic two-level prefix sum (per-bucket
  *    windows in parallel + one tiny window over bucket totals) instead
  *    of a single-partition global window;
  *  - decontamination broadcast-semi-joins the tiny eval shingle set
  *    BEFORE any shuffle, so only matching rows ever move.
  *
  * Tokenization matches `TextAnalysis.tokenStats` (q31): split on a
  * single space after lower+trim — one convention across the text
  * family so metrics compose.
  */
object TrainingData {

  private def toks(c: Column): Column = split(lower(trim(c)), " ")

  /** Hex-uniform per-doc key: first 2 hex chars of md5 of the id — 256
    * equal-probability buckets, portable across engines (md5 is the
    * same everywhere; no engine-specific hash). */
  private def hashKey(id: Column): Column =
    substring(md5(id.cast("string")), 1, 2)

  /** Deterministic train/val/test split (~80/10/10) by content-free id
    * hash. A pure projection: no shuffle, no RNG state, stable under
    * re-runs and appends — the property a training pipeline needs so a
    * document never migrates between splits when the corpus grows.
    * Thresholds are hex-string compares over the 256-bucket key:
    * 'cd' = 205/256 ≈ 80.1%, 'e6' = 230/256 ≈ 89.8%. */
  def hashSplit(docs: DataFrame): DataFrame = {
    val k = hashKey(col("doc_id"))
    docs.select(col("doc_id"),
        when(k < "cd", "train").when(k < "e6", "val").otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified downsampling: keep at most `n` docs per
    * stratum (`by` column), chosen by hash order — a reproducible
    * "reservoir" that needs no RNG and picks the same docs on every
    * run. One shuffle (window on the stratum key). At 100 TB the row
    * numbering stays safe: rows within a stratum spread across tasks
    * only at the window stage, and quota strata are by construction
    * the GROUP side (languages, sources — thousands, not billions);
    * a pathologically hot stratum can pre-filter on a hash-threshold
    * estimate before the window, which this operator's hash ordering
    * makes consistent. */
  def quotaSample(docs: DataFrame, by: String, n: Int): DataFrame = {
    val w = Window.partitionBy(by)
      .orderBy(hashKey(col("doc_id")).asc, col("doc_id").asc)
    docs.select(col(by), col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= n)
      .select(by, "doc_id")
      .orderBy(col(by), col("doc_id"))
  }

  /** Gopher-style repetition metrics per document (Rae et al. 2021,
    * "Scaling Language Models" §A1.1: fraction of duplicated n-grams /
    * fraction taken by the most frequent n-gram). Bigrams as FLAT ROWS
    * (posexplode + lead — the text family's codegen-friendly shape; no
    * interpreted array HOFs), then one two-level hash aggregation:
    * (doc, bigram) counts with map-side combine, then per-doc totals.
    * `dup_frac` = fraction of bigram occurrences beyond their first;
    * `top_frac` = share of the single most repeated bigram; `keep` is
    * the filter verdict at the given threshold. */
  def repetitionFilter(docs: DataFrame, dupThreshold: Double): DataFrame = {
    val tok = docs
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "w")))
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val bi = tok
      .withColumn("w2", lead(col("w"), 1).over(wDoc))
      .where(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w2")).as("bg"))
    bi.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
      .select(col("doc_id"),
        col("n_bigrams"),
        ((col("n_bigrams") - col("n_distinct")) / col("n_bigrams")).as("dup_frac"),
        (col("top_count") / col("n_bigrams")).as("top_frac"))
      .withColumn("keep", col("dup_frac") < dupThreshold)
      .orderBy("doc_id")
  }

  /** PII redaction: replace email addresses and phone numbers with
    * placeholder tags and count what was removed. A pure projection —
    * regexp_replace/regexp_extract_all are codegen'd builtins, zero
    * shuffles, linear over the corpus. The regexes stay within the
    * POSIX-class subset both Java and RE2 dialects share. `text` is
    * expected to already carry the contact strings (the driver query
    * synthesizes them deterministically from testdata). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  def piiRedact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("redacted"),
        // group 0 = whole match: the patterns deliberately carry no
        // capture groups (Spark's 2-arg form defaults to group 1 and
        // rejects group-free patterns under ANSI)
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))).as("n_phones"))
      .orderBy("doc_id")

  /** Token-budget sharding: assign docs (in stable doc_id order) to
    * consecutive training shards of ~`budget` tokens — the sequence-
    * packing precursor. The global running sum is computed as a
    * TWO-LEVEL prefix sum so no stage ever sees the corpus in one
    * partition: (1) per-bucket cumulative windows run in parallel
    * (bucket = doc_id range, preserving global order); (2) ONE
    * unpartitioned window runs over the tiny bucket-totals frame
    * (corpus/bucketRows rows — e.g. 10⁹ docs / 2¹⁶ ≈ 15 k rows); (3)
    * offsets broadcast-join back. The repo's unpartitioned-window rule
    * (aggregates only) holds: step 2's frame IS an aggregate. */
  def tokenPack(docs: DataFrame, budget: Long, bucketRows: Long = 1 << 16): DataFrame = {
    val base = docs.select(col("doc_id"),
      size(toks(col("text"))).as("n_tok"),
      expr(s"doc_id div ${bucketRows}L").as("bucket"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = base.withColumn("cum_in", sum(col("n_tok")).over(wIn))
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("bucket").agg(sum(col("n_tok")).as("btot"))
      .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .select("bucket", "off")
    intra.join(broadcast(offsets), Seq("bucket"))
      // `div` (exact long division) rather than floor(a/b): the running
      // sum exceeds 2^53 tokens on a 100 TB corpus, where the double
      // round-trip would misplace shard boundaries
      .select(col("doc_id"), col("n_tok"),
        expr(s"(off + cum_in - n_tok) div ${budget}L").as("shard"))
      .orderBy("doc_id")
  }

  /** Eval-set decontamination: flag corpus documents sharing word
    * `n`-gram shingles with a (small) eval/benchmark set — the overlap
    * check every training pipeline runs before a model sees the data
    * (Brown et al. 2020 §C use 13-gram overlap; testdata docs are
    * short, so the driver query uses 3-grams). Shape for scale: the
    * eval side is distinct-shingled and BROADCAST; corpus shingle rows
    * are semi-joined against it BEFORE any shuffle, so the only
    * shuffled rows are actual hits (tiny); one final per-doc
    * count-distinct. Emits (doc_id, n_overlap) for docs with at least
    * `minOverlap` shared shingles. */
  def decontaminate(corpus: DataFrame, eval: DataFrame,
                    n: Int = 3, minOverlap: Int = 1): DataFrame = {
    def shingles(df: DataFrame): DataFrame = {
      val tok = df.select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "w")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val withNext = (1 until n).foldLeft(tok) { (d, i) =>
        d.withColumn(s"w$i", lead(col("w"), i).over(w))
      }
      withNext.where(col(s"w${n - 1}").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", (col("w") +: (1 until n).map(i => col(s"w$i"))): _*).as("sh"))
    }
    val evalSet = shingles(eval).select("sh").distinct()
    shingles(corpus)
      .join(broadcast(evalSet), Seq("sh")) // semi shape: count-distinct below dedups
      .groupBy("doc_id")
      .agg(countDistinct(col("sh")).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
      .orderBy("doc_id")
  }
}
