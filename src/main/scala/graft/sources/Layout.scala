package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{hash, lit, pmod}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The table's partition layout, persisted as ONE spec string (the
  * catalog's `_graft_partition_col` file and every `partitionCol`
  * parameter on the TxTable write path):
  *
  *   - `col`            — identity: one directory per column value
  *   - `bucket(N,col)`  — hash buckets: `pmod(murmur3(col), N)`, one
  *                        directory per bucket id
  *
  * Identity keeps low-cardinality layouts human-addressable (partition
  * ops, metadata DELETE, per-partition CDC). Buckets are the
  * high-cardinality complement: a join key like `custkey` can never
  * partition by value at 100 TB, but 256 hash buckets give
  * storage-partitioned joins the same zero-shuffle plan with bounded
  * partition count. The bucket function is Spark's own Murmur3
  * (`functions.hash`, seed 42) — the write path uses the Column form
  * below and the SQL catalog exposes the identical scalar function for
  * Spark's key-grouped planning, so the two can never disagree.
  *
  * The spec string grammar is append-only: an unrecognized spec parses
  * as an identity column (the pre-bucket behavior, so every existing
  * manifest and layout file keeps its meaning).
  */
private[graft] object Layout {

  /** Directory name used for bucket partitions in manifest entries and
    * on disk (`_bucket=7`). Underscore-prefixed so it can never
    * collide with a data column that exists in the schema (identity
    * layouts use the real column name).
    */
  val BucketPartName = "_bucket"

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r

  sealed trait Kind {
    /** The data column the layout derives from. */
    def col: String
    /** Partition-directory name (`col` or `_bucket`). */
    def partName: String
    /** Type of the partition value in manifest entry strings. */
    def partType(schema: StructType): DataType
  }
  final case class Identity(col: String) extends Kind {
    def partName: String = col
    def partType(schema: StructType): DataType = schema(col).dataType
  }
  final case class Bucket(n: Int, col: String) extends Kind {
    def partName: String = BucketPartName
    def partType(schema: StructType): DataType = IntegerType
  }

  def parse(spec: String): Kind = spec match {
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case c => Identity(c)
  }

  /** The partition-directory value as a Column over `df` — the ONE
    * write-side definition of the layout function.
    */
  def dirColumn(df: DataFrame, spec: String): Column = parse(spec) match {
    case Identity(c) => df(c)
    case Bucket(n, c) => pmod(hash(df(c)), lit(n))
  }
}
