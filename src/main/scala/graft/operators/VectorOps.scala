package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float] vectors).
  *
  * Scale design (100 TB): the brute-force path is probe-set × corpus with the
  * probe side broadcast; the scale path is LSH-bucketed ANN — vectors are
  * assigned an 8-bit random-hyperplane bucket per-row (HOF, no shuffle) and
  * the join shuffles on the bucket key only. Hyperplanes are integer-valued
  * and dot products are computed over 1e-3-quantized components so bucket
  * assignment is exactly deterministic across engines and task retries.
  */
object VectorOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Double-precision cosine between two float-array columns, via the
    * native codegen'd Catalyst expression (graft_cosine) — no Row boxing,
    * stays inside whole-stage codegen in the pair-join hot path. The
    * accumulation order matches the DuckDB oracle expression exactly. */
  private def cosCol(s: SparkSession, a: String, b: String) = {
    graft.functions.expressions.CosineSimilarity.register(s)
    expr(s"graft_cosine($a, $b)")
  }

  /** 8-bit random-hyperplane bucket over quantized components (exact int
    * arithmetic). plane(j,d) = ((j*37 + d*101) % 19) - 9. */
  private val bucketExpr: String =
    """aggregate(sequence(0, 7), 0L, (acc, j) ->
      |  acc + CASE WHEN aggregate(sequence(0, size(embedding) - 1), 0L,
      |                  (s, d) -> s + cast(round(cast(embedding[d] as double) * 1000, 0) as bigint)
      |                            * (((j * 37 + d * 101) % 19) - 9)) > 0
      |             THEN shiftleft(cast(1 as bigint), cast(j as int)) ELSE 0L END)""".stripMargin

  /** Brute-force cosine top-5 for a probe subset (vec_id % 100 == 0). */
  private def q33(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val scored = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", round(cosCol(s, "pe", "embedding"), 6))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("probe_id", "rk", "vec_id", "cos")
      .orderBy("probe_id", "rk")
  }

  /** LSH-bucketed ANN: top-1 within the probe's hyperplane bucket. */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      .withColumn("bucket", expr(bucketExpr))
    val probes = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("bucket"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    probes.join(emb, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", round(cosCol(s, "pe", "embedding"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("probe_id", "bucket", "vec_id", "cos")
      .orderBy("probe_id")
  }

  /** Embedding-norm statistics per label (+ bucket occupancy skew check). */
  private def q35(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .withColumn("norm", expr(
        "sqrt(aggregate(embedding, 0D, (s, x) -> s + cast(x as double) * cast(x as double)))"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(min("norm"), 6).as("min_norm"),
        round(max("norm"), 6).as("max_norm"),
        round(avg("norm"), 4).as("avg_norm"))
      .orderBy("label")

  /** Embedding-cosine near-duplicate dedup: pairs within the same LSH
    * bucket with cosine >= 0.99 → drop the higher vec_id; kept per label. */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("bucket", expr(bucketExpr))
    val losers = emb.as("x").join(emb.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", cosCol(s, "x.embedding", "y.embedding"))
      .filter(col("cos") >= 0.99)
      .select(col("y.vec_id").as("vec_id")).distinct()
    emb.join(losers, Seq("vec_id"), "left_anti")
      .groupBy("label").agg(count(lit(1)).as("n_kept"))
      .orderBy("label")
  }

  /** IVF-style ANN (the task's named scale path alongside LSH): k-means
    * coarse quantizer (MLlib, seeded) partitions the corpus into cells;
    * each probe searches only its own cell — at 100 TB the shuffle is on
    * the cell id and each task scans one inverted list. Rows-only (k-means
    * isn't DuckDB-expressible); deterministic via fixed seed. */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val toVec = udf { (a: Seq[Float]) =>
      org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray)
    }
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("features", toVec(col("embedding")))
      .persist()
    val model = new KMeans().setK(16).setSeed(42).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(emb)
    val assigned = model.transform(emb).select(col("vec_id"), col("embedding"), col("cell"))
    val probes = assigned.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("cell"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    val out = probes.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", round(cosCol(s, "pe", "embedding"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("probe_id"), col("rk").cast("long").as("rk"), col("vec_id"), col("cos"))
      .orderBy("probe_id", "rk")
    val materialized = out.collect()
    emb.unpersist()
    s.createDataFrame(s.sparkContext.parallelize(materialized.toIndexedSeq, 1), out.schema)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_ann_ivf" -> (q77 _),
    "q33_cosine_topk" -> (q33 _),
    "q34_ann_lsh_bucket" -> (q34 _),
    "q35_embedding_stats" -> (q35 _),
    "q36_embedding_neardup" -> (q36 _)
  )

  private val cosSql =
    """list_aggregate([CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE) for i in range(len(a.embedding))], 'sum')
      | / sqrt(list_aggregate([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in a.embedding], 'sum')
      |        * list_aggregate([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in b.embedding], 'sum'))""".stripMargin

  // The outer CAST matters: DuckDB's list_aggregate 'sum' over BIGINTs
  // returns HUGEINT (int128), which downstream consumers (pandas, hash
  // comparators) widen to float64 — "240.0" vs Spark's 240. Pin to BIGINT.
  private val bucketSql =
    """CAST(list_aggregate([CASE WHEN list_aggregate(
      |    [CAST(round(CAST(embedding[d+1] AS DOUBLE) * 1000) AS BIGINT) * (((j * 37 + d * 101) % 19) - 9)
      |     for d in range(len(embedding))], 'sum') > 0
      |  THEN (CAST(1 AS BIGINT) << j) ELSE 0 END for j in range(8)], 'sum') AS BIGINT)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q33_cosine_topk" ->
      s"""WITH sc AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS vec_id, round($cosSql, 6) AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id % 100 = 0 AND a.vec_id <> b.vec_id),
         |r AS (SELECT probe_id, vec_id, cos,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk FROM sc)
         |SELECT probe_id, rk, vec_id, cos FROM r WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "q34_ann_lsh_bucket" ->
      s"""WITH e AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |j AS (SELECT a.vec_id AS probe_id, a.bucket, b.vec_id AS vec_id, round($cosSql, 6) AS cos
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id % 100 = 0 AND a.vec_id <> b.vec_id),
         |r AS (SELECT probe_id, bucket, vec_id, cos,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk FROM j)
         |SELECT probe_id, bucket, vec_id, cos FROM r WHERE rk = 1 ORDER BY probe_id""".stripMargin,
    "q35_embedding_stats" ->
      """WITH n AS (SELECT label,
        |  sqrt(list_aggregate([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in embedding], 'sum')) AS norm
        | FROM embeddings)
        |SELECT label, count(*) AS n, round(min(norm),6) AS min_norm,
        | round(max(norm),6) AS max_norm, round(avg(norm),4) AS avg_norm
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, label, embedding, $bucketSql AS bucket FROM embeddings),
         |losers AS (SELECT DISTINCT b.vec_id AS vec_id
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE $cosSql >= 0.99)
         |SELECT label, count(*) AS n_kept FROM e
         |WHERE vec_id NOT IN (SELECT vec_id FROM losers)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
