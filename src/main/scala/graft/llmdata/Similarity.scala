package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force cosine is the exactness baseline (one broadcast of the
  * query, a codegen'd zip_with dot product, a top-k — no shuffle of
  * the corpus). The scale path is LSH bucketing (random hyperplanes)
  * or IVF (coarse k-means cells): probe only matching buckets, so the
  * scored set shrinks by orders of magnitude at 100 TB.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double
    * precision (matches DuckDB's list_cosine_similarity).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x =>
      x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x =>
      x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Brute-force top-k nearest neighbors of one query vector:
    * broadcast literal query, score every row, take k. Exact.
    */
  def bruteForceTopK(df: DataFrame, id: String, vec: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    df.select(col(id),
        cosine(col(vec), q).as("similarity"))
      .orderBy(col("similarity").desc, col(id).asc)
      .limit(k)
  }

  /** All near-duplicate embedding pairs above a cosine threshold —
    * exact O(n^2) scoring; oracle-checkable. For scale use
    * [[lshNeighbors]].
    */
  def cosinePairs(df: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(id).as("id_a"), col(vec).as("va"))
    val b = df.select(col(id).as("id_b"), col(vec).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("similarity", cosine(col("va"), col("vb")))
      .where(col("similarity") >= threshold)
      .select(col("id_a"), col("id_b"), col("similarity"))
  }

  /** Deterministic pseudo-random hyperplanes: component h of plane p is
    * a hash-derived value in [-1, 1). Seeded, reproducible, no
    * driver-side RNG state.
    */
  private def plane(p: Int, dim: Int): Column =
    array((0 until dim).map { i =>
      (hash(lit(p * 7919 + i), lit(42)).cast("double") / lit(Int.MaxValue.toDouble))
    }: _*)

  /** Random-hyperplane LSH signature: bit p = sign of dot(v, plane_p).
    * Vectors in the same bucket (same nBits-bit signature) are
    * near-angle candidates.
    */
  def lshSignature(vec: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { p =>
      val dot = aggregate(zip_with(vec, plane(p, dim), (x, y) =>
        x.cast("double") * y), lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed near-neighbor pairs: candidates from equal
    * signatures, verified by exact cosine. The self-join key is the
    * signature — shuffle is proportional to bucket sizes, not n^2.
    */
  def lshNeighbors(df: DataFrame, id: String, vec: String, dim: Int,
      nBits: Int, threshold: Double): DataFrame = {
    val sig = df.select(col(id).as("__id"), col(vec).as("__v"),
      lshSignature(col(vec), dim, nBits).as("__sig"))
    val a = sig.select(col("__id").as("id_a"), col("__v").as("va"),
      col("__sig").as("sig"))
    val b = sig.select(col("__id").as("id_b"), col("__v").as("vb"),
      col("__sig").as("sig"))
    a.join(b, Seq("sig")).where(col("id_a") < col("id_b"))
      .withColumn("similarity", cosine(col("va"), col("vb")))
      .where(col("similarity") >= threshold)
      .select(col("id_a"), col("id_b"), col("similarity"))
  }

  /** IVF-style ANN: assign every vector to its nearest of `nCells`
    * hash-seeded centroid directions (coarse quantization), then
    * score the query only against its own cell (single-probe) —
    * the classic inverted-file trade of recall for a cells-fold scan
    * reduction.
    */
  def ivfTopK(df: DataFrame, id: String, vec: String, dim: Int,
      nCells: Int, query: Array[Float], k: Int): DataFrame = {
    def cellOf(v: Column): Column =
      greatest((0 until nCells).map { c =>
        struct(aggregate(zip_with(v, plane(c, dim), (x, y) =>
          x.cast("double") * y), lit(0.0), (acc, x) => acc + x).as("dot"),
          lit(c).as("cell"))
      }: _*).getField("cell")
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val qCell = cellOf(q)
    df.withColumn("__cell", cellOf(col(vec)))
      .where(col("__cell") === qCell)
      .select(col(id), cosine(col(vec), q).as("similarity"))
      .orderBy(col("similarity").desc, col(id).asc)
      .limit(k)
  }
}
