package graft

import graft.ops.AnnEval

class AnnEvalSpec extends SparkSpec {
  import spark.implicits._

  test("recall@k: hits, floor milli, starved queries surface with zero") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // q1: 3 exact neighbors
      (2L, 20L), (2L, 21L), (2L, 22L), // q2
      (3L, 30L), (3L, 31L), (3L, 32L)) // q3: absent from approx entirely
      .toDF("q_id", "vec_id")
    val approx = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // perfect
      (2L, 20L), (2L, 99L), (2L, 98L)) // 1 of 3
      .toDF("q_id", "vec_id")

    val byQ = AnnEval.recallAtK(approx, exact, "q_id", "vec_id", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(byQ(1L) == ((3L, 3L, 1000L)))
    assert(byQ(2L) == ((3L, 1L, 333L))) // floor(1000/3)
    assert(byQ(3L) == ((3L, 0L, 0L)), "starved query must not vanish")
  }
}
