package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Regen-proofing for the driver fixtures: the expected schema of every
  * fixture table, checked up front so a driver-side regeneration that
  * changes an encoding produces ONE diagnostic naming table+column+got+want
  * instead of 19 scattered DATATYPE_MISMATCH failures downstream (round 8:
  * events.ts flipped from legacy nanos-long to timestamp[us] and 13 queries
  * broke with unrelated-looking errors).
  *
  * Columns with multiple historically-shipped encodings list every
  * acceptable Spark read-side type; the loaders (e.g. [[Tables.events]])
  * are responsible for normalizing them. Timestamps may arrive as
  * TimestampType (tz-annotated parquet) or TimestampNTZType (plain
  * timestamp[us]) or LongType (TIMESTAMP(NANOS) under the SPARK-40819
  * legacy flag) — all three are listed where they have actually shipped.
  */
object FixtureContract {

  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType, LongType)

  /** table → (column → acceptable read-side types, in order). */
  val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> Set[DataType](IntegerType),
      "r_name" -> Set[DataType](StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set[DataType](IntegerType),
      "n_name" -> Set[DataType](StringType),
      "n_regionkey" -> Set[DataType](IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set[DataType](LongType),
      "c_name" -> Set[DataType](StringType),
      "c_nationkey" -> Set[DataType](IntegerType),
      "c_acctbal" -> Set[DataType](DoubleType),
      "c_mktsegment" -> Set[DataType](StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set[DataType](LongType),
      "s_name" -> Set[DataType](StringType),
      "s_nationkey" -> Set[DataType](IntegerType),
      "s_acctbal" -> Set[DataType](DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set[DataType](LongType),
      "p_name" -> Set[DataType](StringType),
      "p_brand" -> Set[DataType](StringType),
      "p_type" -> Set[DataType](StringType),
      "p_size" -> Set[DataType](IntegerType),
      "p_retailprice" -> Set[DataType](DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set[DataType](LongType),
      "o_custkey" -> Set[DataType](LongType),
      "o_orderstatus" -> Set[DataType](StringType),
      "o_totalprice" -> Set[DataType](DoubleType),
      "o_orderdate" -> ts,
      "o_orderpriority" -> Set[DataType](StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set[DataType](LongType),
      "l_partkey" -> Set[DataType](LongType),
      "l_suppkey" -> Set[DataType](LongType),
      "l_linenumber" -> Set[DataType](IntegerType),
      "l_quantity" -> Set[DataType](DoubleType),
      "l_extendedprice" -> Set[DataType](DoubleType),
      "l_discount" -> Set[DataType](DoubleType),
      "l_tax" -> Set[DataType](DoubleType),
      "l_returnflag" -> Set[DataType](StringType),
      "l_linestatus" -> Set[DataType](StringType),
      "l_shipdate" -> ts),
    "events" -> Seq(
      "event_id" -> Set[DataType](LongType),
      "ts" -> ts,
      "user_id" -> Set[DataType](LongType),
      "event_type" -> Set[DataType](StringType),
      "value" -> Set[DataType](DoubleType),
      "props" -> Set[DataType](StringType)),
    "documents" -> Seq(
      "doc_id" -> Set[DataType](LongType),
      "text" -> Set[DataType](StringType),
      "lang" -> Set[DataType](StringType),
      "source" -> Set[DataType](StringType),
      "n_chars" -> Set[DataType](LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set[DataType](LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false)),
      "label" -> Set[DataType](IntegerType)))

  /** Check one table's read schema against the contract. Returns one
    * diagnostic line per violation, empty when conformant. Footer-only read
    * — no data scan. */
  def checkTable(spark: SparkSession, sfDir: String, table: String,
      cols: Seq[(String, Set[DataType])]): Seq[String] = {
    val actual =
      try spark.read.parquet(s"$sfDir/$table.parquet").schema
      catch { case e: Throwable =>
        return Seq(s"fixture contract: table=$table unreadable at $sfDir (${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)})")
      }
    val byName = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = cols.collect { case (c, _) if !byName.contains(c) =>
      s"fixture contract: table=$table column=$c MISSING (got columns: ${actual.fieldNames.mkString(",")})"
    }
    val mismatched = cols.collect {
      case (c, want) if byName.contains(c) && !want.contains(byName(c)) =>
        s"fixture contract: table=$table column=$c got=${byName(c).simpleString} want one of {${want.map(_.simpleString).mkString(", ")}}"
    }
    missing ++ mismatched
  }

  /** Check every fixture table; returns all diagnostics (empty = clean). */
  def check(spark: SparkSession, sfDir: String): Seq[String] =
    expected.flatMap { case (t, cols) => checkTable(spark, sfDir, t, cols) }
}
