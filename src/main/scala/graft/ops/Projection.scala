package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection with a Rademacher (±1)
  * matrix, the cheap dimensionality-reduction step in front of a
  * clustering or coarse-ANN pass: k inner products per row against
  * ±1 sign rows, no stored projection matrix at all.
  *
  * The sign of matrix entry (i, j) is derived from pure integer
  * arithmetic on the indices — `(i*2654435761 + j*40503) % 97 % 2` —
  * so the "matrix" is a formula both engines evaluate identically
  * (bit-replicable in SQL, no PRNG state, no driver materialization)
  * and Achlioptas' database-friendly ±1 construction applies: the JL
  * distance-preservation guarantee only needs sub-Gaussian entries,
  * not true randomness of high quality.
  *
  * Projections are left in integer micro-units (inputs are the
  * 1e6-quantized embeddings; the canonical 1/sqrt(k) JL scaling is a
  * constant factor that preserves every ordering and ratio, so it is
  * applied only when a caller needs calibrated distances).
  *
  * Plan shape: the whole projection is one narrow, codegen'd
  * `transform`/`aggregate` over each row's array — ZERO Exchange, no
  * join, nothing collected. At 100 TB this is a map-only pass that
  * rides whatever partitioning the corpus already has.
  */
object Projection {

  /** Adds `proj` (array of k exact-integer projections, 1-based sign
    * indices) next to `idCol`, through the native codegen'd
    * [[graft.functions.RademacherProject]] loop (the HOF spelling of
    * the same formula is [[rademacherHof]], kept as the
    * parity/readability reference — interpreted lambdas cost ~10x).
    */
  def rademacher(e: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"projection width must be >= 1 (got $k)")
    Similarity.withQuantized(e, "embedding")
      .select(col(idCol),
        graft.functions.RademacherProject.project(col("ei"), k).as("proj"))
  }

  /** The same projection as built-in higher-order functions — the
    * formula the SQL oracle replays verbatim; spec-pinned equal to
    * the native path.
    */
  private[graft] def rademacherHof(e: DataFrame, idCol: String, k: Int): DataFrame =
    Similarity.withQuantized(e, "embedding")
      .select(col(idCol), expr(
        s"""transform(sequence(1, $k), j ->
              aggregate(sequence(1, size(ei)), 0L, (acc, i) ->
                acc + ei[i-1] * (CASE WHEN (i * 2654435761 + j * 40503) % 97 % 2 = 0
                  THEN 1 ELSE -1 END)))""").as("proj"))
}
