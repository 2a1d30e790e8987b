package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's type-compatibility cast layer (O-4/O-5):
  * `castColumns` (reference utils/dataframe_operations.py:15-50) driven
  * by type-directed column selection (`get_cols_with_datatype`,
  * reference utils/rdbms_operations.py:155-194).
  *
  * In Spark the "which columns have DDL type X" half is a pure
  * driver-side metadata scan over `df.schema`, and the cast half is a
  * single projection — all columns cast in one `select`, one codegen
  * stage, instead of the reference's four sequential whole-DataFrame
  * passes per chunk.
  */
object CompatCasts {

  /** Names of columns whose current type satisfies `pred` (O-5). */
  def colsWithType(df: DataFrame)(pred: DataType => Boolean): Seq[String] =
    df.schema.fields.toIndexedSeq.collect { case f if pred(f.dataType) => f.name }

  /** Cast the named columns to `to`, leaving others untouched (O-4).
    * Single projection: N casts fuse into one whole-stage-codegen pass.
    */
  def castColumns(df: DataFrame, cols: Seq[String], to: DataType): DataFrame = {
    val target = cols.toSet
    df.select(df.columns.toIndexedSeq.map { c =>
      if (target(c)) col(c).cast(to).as(c) else col(c)
    }: _*)
  }

  /** The reference's full compat pass over one chunk
    * (utils/rdbms_operations.py:230-233), as one projection:
    *  - bit/boolean -> int16   (dataframe_operations.py:28)
    *  - tinyint(byte) -> int16 (dataframe_operations.py:32)
    *  - float -> decimal if a target scale is declared; the
    *    reference's `'None'` -> Decimal('NaN') becomes SQL NULL
    *    (deviation documented in SURVEY.md §7.3 — Spark decimals
    *    have no NaN)
    *  - date-typed columns stay DateType (the reference round-trips
    *    through datetime64; Spark needs no such round-trip)
    */
  def referenceCompatPass(df: DataFrame,
                          decimalTargets: Map[String, DecimalType] = Map.empty)
      : DataFrame =
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      val c = col(f.name)
      val out = f.dataType match {
        case BooleanType | ByteType => c.cast(ShortType)
        case _ if decimalTargets.contains(f.name) =>
          c.cast(decimalTargets(f.name))
        case _ => c
      }
      out.as(f.name)
    }: _*)
}
