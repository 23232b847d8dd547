package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Round-10 batch 4: embedding compression for the vector side of the
  * pipeline —
  *
  *  - `x3_vector_quantize`: symmetric int8 quantization (per-vector
  *    scale = max|x|/127, q_i = round-half-up(x_i/scale)) — the
  *    storage/serving format that cuts a 100 TB float32 embedding
  *    store 4x with known bounded error. Map-only; the quantized
  *    vector is emitted as a joined string plus an exact integer
  *    checksum so the oracle hash-compares without array columns.
  *  - `x3_random_proj`: signed random projection (Johnson-
  *    Lindenstrauss sign sketch) to 16 dims — the cheap dimension
  *    reduction in front of clustering/dedup. Inputs are first
  *    quantized to exact micro-unit integers and the ±1 signs come
  *    from md5 bits, so every dot product is EXACT integer
  *    arithmetic — no float summation order to disagree on.
  *
  * Both are pure map stages (no shuffle before the output sort); at
  * 100 TB they run at scan throughput and compose in front of the
  * IVF/PQ/LSH index builds.
  */
object Parity17 {
  type Q = (SparkSession, String) => DataFrame

  private val ProjDims = 16

  val queries: Map[String, Q] = Map(
    // ---- symmetric int8 quantization -------------------------------
    "x3_vector_quantize" -> { (s, d) =>
      val maxabs = array_max(transform(col("embedding"),
        x => abs(x))).cast(DoubleType)
      val scale = maxabs / lit(127.0)
      val q = transform(col("embedding"), x =>
        when(lit(0.0) === scale, lit(0))
          .otherwise(floor(x.cast(DoubleType) / scale + lit(0.5))
            .cast(IntegerType)))
      embeddings(s, d)
        .select(col("vec_id"), col("label"),
          scale.as("q_scale"),
          concat_ws(",", q).as("q_vec"),
          aggregate(q, lit(0L),
            (acc, v) => acc + v.cast(LongType) * v.cast(LongType))
            .as("q_norm2"))
        .orderBy(col("vec_id"))
    },

    // ---- signed random projection (JL sign sketch) -----------------
    // qx_i = round-half-up(x_i * 1e6) micro-units (exact longs);
    // sign s_{j,i} = +-1 from bit 0 of md5("j:i"); y_j = sum_i qx_i *
    // s_{j,i} — an exact BIGINT per output dim. The sign matrix is
    // dims x proj_dims VALUES (tiny, broadcast); the per-row work is
    // one fused lateral pass. Emitted as a joined string like the
    // quantized vector.
    "x3_random_proj" -> { (s, d) =>
      val qx = transform(col("embedding"), x =>
        floor(x.cast(DoubleType) * lit(1000000.0) + lit(0.5))
          .cast(LongType))
      def yj(j: Int): Column = aggregate(
        zip_with(qx, sequence(lit(0), size(col("embedding")) - 1),
          (v, i) => when(
            conv(substring(md5(concat(lit(s"$j:"), i.cast("string"))), 32, 1),
              16, 10).cast(LongType) % 2 === 0, v).otherwise(-v)),
        lit(0L), (acc, v) => acc + v)
      embeddings(s, d)
        .select(Seq(col("vec_id"), col("label"),
          concat_ws(",",
            (0 until ProjDims).map(j => yj(j)): _*).as("proj")): _*)
        .orderBy(col("vec_id"))
    })

  val oracles: Map[String, String] = Map(
    "x3_vector_quantize" ->
      """WITH q AS (SELECT vec_id, label,
             CAST(list_max(list_transform(embedding, x -> abs(x)))
               AS DOUBLE) / 127.0 AS q_scale,
             embedding
           FROM embeddings),
         v AS (SELECT vec_id, label, q_scale,
             list_transform(embedding, x ->
               CASE WHEN q_scale = 0.0 THEN 0
                 ELSE CAST(floor(CAST(x AS DOUBLE) / q_scale + 0.5) AS INT)
               END) AS qv
           FROM q)
         SELECT vec_id, label, q_scale,
           array_to_string(qv, ',') AS q_vec,
           CAST(list_sum(list_transform(qv,
             x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT)
             AS q_norm2
         FROM v ORDER BY vec_id""",
    "x3_random_proj" ->
      """WITH qx AS (SELECT vec_id, label,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
               AS q
           FROM embeddings),
         y AS (SELECT vec_id, label,
             list_transform(generate_series(0, 15), j ->
               CAST(list_sum(list_transform(
                 generate_series(1, len(q)), i ->
                   CASE WHEN (CAST(strpos('0123456789abcdef',
                       substring(md5(CAST(j AS VARCHAR) || ':' ||
                         CAST(i - 1 AS VARCHAR)), 32, 1)) AS BIGINT) - 1)
                       % 2 = 0
                     THEN q[i] ELSE -q[i] END)) AS BIGINT)) AS ys
           FROM qx)
         SELECT vec_id, label, array_to_string(ys, ',') AS proj
         FROM y ORDER BY vec_id""")
}
