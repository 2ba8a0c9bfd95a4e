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
    * precision (matches DuckDB's list_cosine_similarity: one
    * sequential left-to-right pass). Backed by the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression — higher-order
    * array functions would interpret one expression tree per element
    * in the pairwise-join hot path.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Brute-force top-k nearest neighbors of one query vector:
    * broadcast literal query, score every row, take k. Exact.
    */
  def bruteForceTopK(df: DataFrame, id: String, vec: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = array(query.toIndexedSeq.map(v => lit(v.toDouble)): _*)
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

  /** Deterministic pseudo-random hyperplanes: component i of plane p
    * derived from murmur3 of (p, i) — seeded, reproducible, no RNG
    * state, computed driver-side once and closed over by the UDF.
    */
  private def planes(dim: Int, nBits: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (p, i) =>
      scala.util.hashing.MurmurHash3
        .caseClassHash((p * 7919 + i, 42)).toDouble / Int.MaxValue
    }

  /** Random-hyperplane LSH signature: bit p = sign of dot(v, plane_p).
    * Vectors in the same bucket (same nBits-bit signature) are
    * near-angle candidates. Tight-loop UDF over the broadcast plane
    * matrix (interpreted higher-order exprs would cost ~dim*nBits
    * tree-walks per row).
    */
  def lshSignature(vec: Column, dim: Int, nBits: Int): Column = {
    val ps = planes(dim, nBits)
    val f = udf { (v: Seq[Float]) =>
      var sig = 0L
      var p = 0
      while (p < ps.length) {
        val plane = ps(p)
        var dot = 0.0; var i = 0
        val n = math.min(v.length, plane.length)
        while (i < n) { dot += v(i) * plane(i); i += 1 }
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
    f(vec.cast("array<float>"))
  }

  /** LSH-bucketed near-neighbor pairs: candidates from equal
    * signatures, verified by exact cosine. The self-join key is the
    * signature — shuffle is proportional to bucket sizes, not n^2.
    */
  def lshNeighbors(df: DataFrame, id: String, vec: String, dim: Int,
      nBits: Int, threshold: Double): DataFrame = {
    val sig = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(id).as("__id"), col(vec).as("__v"),
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
    val cells = planes(dim, nCells)
    def cellOfLocal(v: Seq[Float]): Int = {
      var best = 0; var bestDot = Double.MinValue
      var c = 0
      while (c < cells.length) {
        val plane = cells(c)
        var dot = 0.0; var i = 0
        val n = math.min(v.length, plane.length)
        while (i < n) { dot += v(i) * plane(i); i += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
        c += 1
      }
      best
    }
    val cellUdf = udf { (v: Seq[Float]) => cellOfLocal(v) }
    val qCell = cellOfLocal(query.toSeq)
    val q = array(query.toIndexedSeq.map(v => lit(v.toDouble)): _*)
    df.withColumn("__cell", cellUdf(col(vec).cast("array<float>")))
      .where(col("__cell") === qCell) // single-probe cell pruning
      .select(col(id), cosine(col(vec), q).as("similarity"))
      .orderBy(col("similarity").desc, col(id).asc)
      .limit(k)
  }
}
