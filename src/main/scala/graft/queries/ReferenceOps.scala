package graft.queries

import graft.ops.{Audit, SchemaOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's own operator surface (SURVEY.md §2.1, O-4..O-9)
  * exercised as oracle-checkable queries over the fixtures.
  */
object ReferenceOps {

  val queries: Map[String, Q] = Map(
    // O-4 cast matrix (reference utils/dataframe_operations.py:15-50).
    // The decimal/float32 casts are the operator under test; the final
    // projection widens them to double so the driver's hasher sees one
    // canonical numeric rendering (the q01/q37 convention).
    "q25_cast_matrix" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_linenumber").cast(ShortType).as("ln_i16"),
        col("l_quantity").cast(DecimalType(12, 2)).as("qty_dec"),
        col("l_quantity").cast(IntegerType).cast(LongType).as("qty_int"),
        col("l_shipdate").cast(DateType).as("ship_date"),
        col("l_orderkey").cast(StringType).as("key_str"),
        (col("l_quantity") > 25).cast(ShortType).as("gt25_i16"),
        col("l_extendedprice").cast(FloatType).as("price_f32"))
        .withColumn("qty_dec", col("qty_dec").cast(DoubleType))
        .withColumn("price_f32", col("price_f32").cast(DoubleType))
        // (l_orderkey, l_linenumber) non-unique in fixture: total order
        .orderBy("l_orderkey", "ln_i16", "qty_dec", "ship_date", "price_f32")
    }),

    // O-6 audit columns (fixed ts for oracle determinism; the live
    // default is current_timestamp ms-truncated, see Audit.addAuditColumns)
    "q26_audit_columns" -> ((s, dir) => {
      Audit.addAuditColumns(t(s, dir, "nation"),
          ts = lit("2024-06-01 00:00:00").cast(TimestampType))
        .select(col("n_nationkey"), col("n_name"),
          col("updatedby"), col("updated_utc_ts"), col("runid"))
        .orderBy("n_nationkey")
    }),

    // O-8 row hash: md5("(" + concat_ws(",", nulls->'') + ")")
    "q27_row_hash" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      Audit.addRowHash(t(s, dir, "lineitem").select(cols.map(col): _*), cols)
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // O-9 name normalization (lower, ' '->'_', strip '-', '__'->'_')
    "q28_normalize_names" -> ((s, dir) => {
      val ugly = t(s, dir, "part").select(
        col("p_partkey").as("P PartKey"),
        col("p_name").as("P-Name"),
        col("p_retailprice").as("Retail  Price"))
      SchemaOps.normalizeNames(ugly).orderBy("p_partkey")
    }),

    // O-7 schema enforcement: project-to-target-order with casts
    "q29_schema_enforce" -> ((s, dir) => {
      val target = StructType(Seq(
        StructField("o_orderkey", StringType),
        StructField("o_totalprice", DecimalType(18, 2)),
        StructField("o_orderdate", DateType),
        StructField("o_orderstatus", StringType)))
      SchemaOps.enforce(t(s, dir, "orders"), target)
        // widen the enforced DECIMAL(18,2) to double for hash-stable output
        .withColumn("o_totalprice", col("o_totalprice").cast(DoubleType))
        .orderBy(col("o_orderkey").cast(LongType))
    }))

  val oracles: Map[String, String] = Map(
    "q25_cast_matrix" ->
      """SELECT l_orderkey, CAST(l_linenumber AS SMALLINT) AS ln_i16,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_dec,
         CAST(CAST(l_quantity AS INTEGER) AS BIGINT) AS qty_int,
         CAST(l_shipdate AS DATE) AS ship_date,
         CAST(l_orderkey AS VARCHAR) AS key_str,
         CAST(l_quantity > 25 AS SMALLINT) AS gt25_i16,
         CAST(CAST(l_extendedprice AS FLOAT4) AS DOUBLE) AS price_f32
         FROM lineitem ORDER BY l_orderkey, ln_i16, qty_dec, ship_date, price_f32""",
    "q26_audit_columns" ->
      """SELECT n_nationkey, n_name, 'redshiftadmin' AS updatedby,
         TIMESTAMP '2024-06-01 00:00:00' AS updated_utc_ts,
         CAST(-1 AS BIGINT) AS runid
         FROM nation ORDER BY n_nationkey""",
    "q27_row_hash" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
         md5('(' || concat_ws(',',
           coalesce(CAST(l_orderkey AS VARCHAR), ''),
           coalesce(CAST(l_linenumber AS VARCHAR), ''),
           coalesce(l_returnflag, ''),
           coalesce(l_linestatus, '')) || ')') AS row_hash_code
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q28_normalize_names" ->
      """SELECT p_partkey, p_name AS pname, p_retailprice AS retail_price
         FROM part ORDER BY p_partkey""",
    "q29_schema_enforce" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
         CAST(o_orderdate AS DATE) AS o_orderdate, o_orderstatus
         FROM orders ORDER BY CAST(o_orderkey AS BIGINT)""")
}
