package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All shapes are shuffle-minimal by construction:
  *
  *   - exact: hash -> groupBy(hash) -> keep min id. One shuffle on a
  *     short hash key; survives any scale.
  *   - MinHash + LSH: shingle -> k minhashes -> b bands -> explode to
  *     (band, bucket) -> self-join WITHIN buckets only. The candidate
  *     set is O(colliding pairs), never the O(n^2) cross product —
  *     that is the 100 TB path.
  *   - SimHash: 64-bit fingerprint from token hashes; near-dup =
  *     small Hamming distance, candidates from bucketed prefixes.
  *   - n-gram Jaccard: exact pairwise on a candidate set (verification
  *     stage after LSH, or oracle-checkable on small inputs).
  *   - embedding cosine: see [[Similarity]].
  */
object Dedup {

  /** Normalize text the way fingerprinting pipelines do: lowercase,
    * strip punctuation, collapse whitespace.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text),
      "[^a-z0-9 ]", ""), " +", " "))

  /** Exact duplicate groups: md5 of normalized text; keeps the lowest
    * id as the canonical representative.
    */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), md5(normalize(col(text))).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Word n-gram shingles of the normalized text. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(normalize(text), " ")
    // distinct n-grams: join each sliding window back into a string
    array_distinct(filter(
      transform(words, (_, i) =>
        when(i <= size(words) - n,
          array_join(slice(words, i + lit(1), lit(n)), " "))),
      x => x.isNotNull))
  }

  /** k MinHash values over a shingle array: h_i(S) = min over shingles
    * of hash(shingle, seed_i). Uses Spark's 32-bit murmur3 with k seeds
    * — pure built-ins, codegen'd, no UDF.
    */
  def minhashes(sh: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(sh, s => hash(s, lit(seed))))
    }: _*)

  /** LSH candidate pairs: split k minhashes into b bands of r rows
    * (k = b*r); docs colliding on any full band are candidates.
    * Shuffles only (band, bucket-hash, id) tuples — tiny relative to
    * the corpus — and joins within buckets.
    */
  def minhashCandidates(df: DataFrame, id: String, text: String,
      shingleN: Int = 3, bands: Int = 8, rows: Int = 4): DataFrame = {
    val k = bands * rows
    val mh = df.select(col(id).as("doc"),
      minhashes(shingles(col(text), shingleN), k).as("mh"))
    val banded = mh.select(col("doc"), posexplode(
      array((0 until bands).map(b =>
        hash(slice(col("mh"), b * rows + 1, rows))): _*)))
      .toDF("doc", "band", "bucket")
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of word n-gram shingle sets for given
    * candidate pairs (the verify stage after LSH).
    */
  def jaccardVerify(candidates: DataFrame, docs: DataFrame, id: String,
      text: String, shingleN: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(id).as("__id"),
      shingles(col(text), shingleN).as("__sh"))
    candidates
      .join(sh.select(col("__id").as("doc_a"), col("__sh").as("sh_a")), "doc_a")
      .join(sh.select(col("__id").as("doc_b"), col("__sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates from banded
    * minhashes, verified by exact shingle Jaccard.
    */
  def minhashDedup(df: DataFrame, id: String, text: String,
      shingleN: Int = 3, bands: Int = 8, rows: Int = 4,
      threshold: Double = 0.8): DataFrame =
    jaccardVerify(minhashCandidates(df, id, text, shingleN, bands, rows),
      df, id, text, shingleN, threshold)

  /** Exact pairwise n-gram Jaccard over all id-ordered pairs —
    * O(n^2), for oracle checks and small candidate sets only.
    * The scale path is [[minhashDedup]].
    */
  def jaccardAllPairs(df: DataFrame, id: String, text: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(id).as("__id"), shingles(col(text), shingleN)
      .as("__sh"))
    val a = sh.select(col("__id").as("doc_a"), col("__sh").as("sh_a"))
    val b = sh.select(col("__id").as("doc_b"), col("__sh").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash of the normalized token stream: per bit, sign of
    * the sum over tokens of +/-1 by that token-hash bit. Built from
    * xxhash64 + bit ops only — no UDF, fully codegen'd.
    */
  def simhash(text: Column): Column = {
    val tokens = split(normalize(text), " ")
    val th = transform(tokens, t => xxhash64(t))
    (0 until 64).map { bit =>
      val votes = aggregate(th, lit(0L), (acc, h) =>
        acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup candidates: docs whose fingerprints share a
    * 16-bit chunk (4-chunk split guarantees recall for Hamming
    * distance <= 3), verified by exact Hamming distance.
    */
  def simhashDedup(df: DataFrame, id: String, text: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(id).as("doc"), simhash(col(text)).as("fp"))
    val chunked = fp.select(col("doc"), col("fp"), posexplode(array(
      (0 until 4).map(i =>
        shiftright(col("fp"), i * 16).bitwiseAND(0xFFFFL)): _*)))
      .toDF("doc", "fp", "chunk", "key")
    val a = chunked.as("a"); val b = chunked.as("b")
    val hamming = {
      val x = col("a.fp").bitwiseXOR(col("b.fp"))
      bit_count(x)
    }
    a.join(b, col("a.chunk") === col("b.chunk") &&
        col("a.key") === col("b.key") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        hamming.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
