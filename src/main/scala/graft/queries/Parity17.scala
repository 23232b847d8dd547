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

    // ---- end-to-end embedding cluster dedup ------------------------
    // The production semantic-dedup operator COMPOSED from the
    // verified pieces: exact blocked cosine pairs (the x3_neardup
    // machinery) -> connected components (the x2_cc machinery) ->
    // keep-min-per-cluster with membership stats. Chains a~b~c
    // collapse into one cluster even when a and c are not directly
    // similar — the property one-round pairwise dedup misses. The
    // cluster-stats frame is components-sized (<= n vectors, usually
    // tiny) so the join-back broadcasts under AQE.
    "x3_embed_cluster_dedup" -> { (s, d) =>
      import graft.ops.{Connect, Similarity}
      val pairs = Similarity.cosinePairsBlocked(embeddings(s, d),
        tau = 0.3, blockCol = "label")
      val comp = Connect.connectedComponents(pairs, "id_a", "id_b")
      val base = embeddings(s, d).select(col("vec_id"))
        .join(comp, col("vec_id") === col("id"), "left_outer")
        .select(col("vec_id"),
          coalesce(col("comp"), col("vec_id")).as("comp"))
      val sz = base.groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("keeper"))
      base.join(sz, Seq("comp"))
        .select(col("vec_id"), col("comp"), col("n_members"),
          when(col("vec_id") === col("keeper"), 1L).otherwise(0L)
            .as("is_keeper"))
        .orderBy(col("vec_id"))
    },

    // ---- signed random projection (JL sign sketch) -----------------
    // qx_i = round-half-up(x_i * 1e6) micro-units (exact longs);
    // sign s_{j,i} = ± from the parity of hex digit j+1 of md5(i).
    // The sign matrix depends ONLY on (j, i) — it is a fixed seed
    // matrix, so it folds to a driver-side literal mask array (bit j
    // of masks[i]): ZERO runtime hashing, the per-row work is pure
    // codegen'd integer arithmetic (measured 6.2 s -> sub-second at
    // sf0.1 vs the md5-per-(element, dim) formulation). The oracle
    // recomputes the same parities from md5 directly, pinning the
    // literal against an independent derivation. y_j is an exact
    // BIGINT — no float summation order to disagree on.
    "x3_random_proj" -> { (s, d) =>
      val qx = transform(col("embedding"), x =>
        floor(x.cast(DoubleType) * lit(1000000.0) + lit(0.5))
          .cast(LongType))
      // masks(i): bit j set when hex digit j+1 of md5(i.toString) is
      // ODD (sign -1); matches the oracle's strpos parity expression
      val md = java.security.MessageDigest.getInstance("MD5")
      val masks: Seq[Long] = (0 until 4096).map { i =>
        val hex = md.digest(i.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (0 until ProjDims).foldLeft(0L) { (m, j) =>
          val digit = Character.digit(hex.charAt(j), 16)
          if ((digit & 1) == 1) m | (1L << j) else m
        }
      }
      val masksCol = typedLit(masks)
      def yj(j: Int): Column = aggregate(
        zip_with(qx, sequence(lit(0), size(col("embedding")) - 1),
          (v, i) => when(
            shiftright(element_at(masksCol, (i + 1).cast("int")), j)
              .bitwiseAND(lit(1L)) === 0L, v).otherwise(-v)),
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
    "x3_embed_cluster_dedup" ->
      """WITH RECURSIVE ex AS (SELECT vec_id, label,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
             generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
         dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum(a.x * b.x) AS d
           FROM ex a JOIN ex b
             ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
           GROUP BY a.vec_id, b.vec_id),
         pairs AS (SELECT id_a, id_b FROM dots
           JOIN n2 na ON dots.id_a = na.vec_id
           JOIN n2 nb ON dots.id_b = nb.vec_id
           WHERE CAST(CAST(d AS DOUBLE) /
             (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             AS DOUBLE) >= 0.3),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         nodes AS (SELECT DISTINCT a AS id FROM edges),
         reach(id, lbl) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
         comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
         base AS (SELECT e.vec_id, coalesce(c.comp, e.vec_id) AS comp
           FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id),
         sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members,
             min(vec_id) AS keeper
           FROM base GROUP BY comp)
         SELECT b.vec_id, b.comp, sz.n_members,
           CAST(CASE WHEN b.vec_id = sz.keeper THEN 1 ELSE 0 END AS BIGINT)
             AS is_keeper
         FROM base b JOIN sz USING (comp)
         ORDER BY b.vec_id""",
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
                   -- sign = parity of hex digit j+1 of md5(i-1): the
                   -- independent derivation of the Spark side's
                   -- driver-folded literal mask array
                   CASE WHEN (CAST(strpos('0123456789abcdef',
                       substring(md5(CAST(i - 1 AS VARCHAR)), j + 1, 1))
                       AS BIGINT) - 1) % 2 = 0
                     THEN q[i] ELSE -q[i] END)) AS BIGINT)) AS ys
           FROM qx)
         SELECT vec_id, label, array_to_string(ys, ',') AS proj
         FROM y ORDER BY vec_id""")
}
