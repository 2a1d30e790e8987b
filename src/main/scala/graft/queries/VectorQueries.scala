package graft.queries

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search surface over the embeddings fixture
  * (vec_id, embedding: array<float>, label).
  *
  * All similarity math uses integer-quantized embeddings (see
  * Similarity) so every dot product is exact and order-independent —
  * identical in Spark and DuckDB, and reproducible under any shuffle
  * order at cluster scale.
  */
object VectorQueries {

  val queries: Map[String, Q] = Map(
    // brute-force cosine top-k: broadcast 5 query vectors over the corpus
    "q48_ann_bruteforce" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), "vec_id", k = 5)
        .orderBy("q_id", "rnk")
    }),

    // LSH bucketed candidates: 6 deterministic hyperplanes -> 64 buckets
    "q49_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshCandidates(e, e.where(col("vec_id") < 5), "vec_id",
        nPlanes = 6, dims = 64)
        .orderBy("q_id", "vec_id")
    }),

    // IVF probe over the fixture (no SQL oracle — k-means cells aren't
    // practical to replicate in SQL; correctness = IvfSpec's recall
    // tests on clustered data; driver records the rows-only check)
    "q61_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val model = graft.ops.Ivf.fit(e, "vec_id", nLists = 4, iterations = 1)
      graft.ops.Ivf.search(e, e.where(col("vec_id") < 5), "vec_id",
          model, k = 5, nProbe = 2)
        .orderBy("q_id", "rnk")
    }),

    // full-corpus embedding near-dup via LSH buckets: pairwise cosine
    // only WITHIN a bucket (1/2^p of all pairs) — the unsampled scale
    // path complementing q50's sampled exact sweep
    "q76_embed_neardup_lsh" -> ((s, dir) => {
      val planes = Similarity.planeWeights(6, 64)
      val c = Similarity.withQuantized(t(s, dir, "embeddings"), "embedding")
        .withColumn("bucket", Similarity.lshBucket(col("ei"), planes))
      val a = c.select(col("vec_id").as("id_a"), col("ei").as("ea"),
        col("nn").as("na"), col("bucket"))
      val b = c.select(col("vec_id").as("id_b"), col("ei").as("eb"),
        col("nn").as("nb"), col("bucket").as("bucket_b"))
      a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
        .withColumn("sim_micro",
          Similarity.cosineMicro(Similarity.dotLong(col("ea"), col("eb")),
            col("na"), col("nb")))
        .where(col("sim_micro") >= 300000)
        .select("id_a", "id_b", "sim_micro")
        .orderBy("id_a", "id_b")
    }),

    // embedding near-dup pairs over a 10% sample (quadratic stage is
    // sampled; the scale path for full-corpus near-dup is LSH, q49)
    "q50_embed_neardup" -> ((s, dir) => {
      val sample = Similarity.withQuantized(
        t(s, dir, "embeddings").where(col("vec_id") % 10 === 0), "embedding")
      val a = sample.select(col("vec_id").as("id_a"), col("ei").as("ea"), col("nn").as("na"))
      val b = sample.select(col("vec_id").as("id_b"), col("ei").as("eb"), col("nn").as("nb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("sim_micro",
          Similarity.cosineMicro(Similarity.dotLong(col("ea"), col("eb")),
            col("na"), col("nb")))
        .where(col("sim_micro") >= 300000)
        .select("id_a", "id_b", "sim_micro")
        .orderBy("id_a", "id_b")
    }))

  private val quantCte =
    """e AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS ei
         FROM embeddings),
       flat AS (SELECT vec_id, generate_subscripts(ei, 1) AS i, unnest(ei) AS v FROM e),
       norms AS (SELECT vec_id, SUM(v*v) AS nn FROM flat GROUP BY 1)"""

  val oracles: Map[String, String] = Map(
    "q48_ann_bruteforce" ->
      s"""WITH $quantCte,
         dots AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id, SUM(q.v * c.v) AS dot
                  FROM flat q JOIN flat c ON q.i = c.i
                    AND q.vec_id < 5 AND c.vec_id <> q.vec_id
                  GROUP BY 1, 2),
         sims AS (SELECT q_id, d.vec_id,
                    CAST(round(CAST(dot AS DOUBLE) /
                      (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE)))
                      * 1000000) AS BIGINT) AS sim_micro
                  FROM dots d JOIN norms nq ON nq.vec_id = d.q_id
                    JOIN norms nc ON nc.vec_id = d.vec_id)
         SELECT q_id, rnk, vec_id, sim_micro FROM (
           SELECT q_id, vec_id, sim_micro,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sim_micro DESC, vec_id) AS BIGINT) AS rnk
           FROM sims)
         WHERE rnk <= 5 ORDER BY q_id, rnk""",
    "q49_ann_lsh" ->
      s"""WITH $quantCte,
         planes AS (SELECT p, d,
                      ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 4))::BIGINT
                        - 32768 AS wt
                    FROM (SELECT unnest(range(0, 6)) AS p),
                         (SELECT unnest(range(0, 64)) AS d)),
         dots AS (SELECT f.vec_id, pl.p, SUM(f.v * pl.wt) AS dp
                  FROM flat f JOIN planes pl ON pl.d = f.i - 1
                  GROUP BY 1, 2),
         bucket AS (SELECT vec_id,
                      CAST(SUM(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS b
                    FROM dots GROUP BY 1)
         SELECT q.vec_id AS q_id, c.vec_id AS vec_id
         FROM bucket q JOIN bucket c ON q.b = c.b
           AND q.vec_id < 5 AND c.vec_id <> q.vec_id
         ORDER BY q_id, vec_id""",
    "q76_embed_neardup_lsh" ->
      s"""WITH $quantCte,
         planes AS (SELECT p, d,
                      ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 4))::BIGINT
                        - 32768 AS wt
                    FROM (SELECT unnest(range(0, 6)) AS p),
                         (SELECT unnest(range(0, 64)) AS d)),
         pdots AS (SELECT f.vec_id, pl.p, SUM(f.v * pl.wt) AS dp
                   FROM flat f JOIN planes pl ON pl.d = f.i - 1
                   GROUP BY 1, 2),
         bucket AS (SELECT vec_id,
                      CAST(SUM(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS b
                    FROM pdots GROUP BY 1),
         cand AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b
                  FROM bucket a JOIN bucket b2 ON a.b = b2.b AND a.vec_id < b2.vec_id),
         dots AS (SELECT c.id_a, c.id_b, SUM(fa.v * fb.v) AS dot
                  FROM cand c JOIN flat fa ON fa.vec_id = c.id_a
                    JOIN flat fb ON fb.vec_id = c.id_b AND fb.i = fa.i
                  GROUP BY 1, 2),
         sims AS (SELECT id_a, id_b,
                    CAST(round(CAST(dot AS DOUBLE) /
                      (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
                      * 1000000) AS BIGINT) AS sim_micro
                  FROM dots JOIN norms na ON na.vec_id = id_a
                    JOIN norms nb ON nb.vec_id = id_b)
         SELECT id_a, id_b, sim_micro FROM sims
         WHERE sim_micro >= 300000 ORDER BY id_a, id_b""",
    "q50_embed_neardup" ->
      """WITH e AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS ei
           FROM embeddings WHERE vec_id % 10 = 0),
         flat AS (SELECT vec_id, generate_subscripts(ei, 1) AS i, unnest(ei) AS v FROM e),
         norms AS (SELECT vec_id, SUM(v*v) AS nn FROM flat GROUP BY 1),
         dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.v * b.v) AS dot
                  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
                  GROUP BY 1, 2),
         sims AS (SELECT id_a, id_b,
                    CAST(round(CAST(dot AS DOUBLE) /
                      (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
                      * 1000000) AS BIGINT) AS sim_micro
                  FROM dots JOIN norms na ON na.vec_id = id_a
                    JOIN norms nb ON nb.vec_id = id_b)
         SELECT id_a, id_b, sim_micro FROM sims
         WHERE sim_micro >= 300000 ORDER BY id_a, id_b""")
}
