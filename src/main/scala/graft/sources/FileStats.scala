package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Per-file column statistics for [[TxTable]] data skipping — the
  * Iceberg/Delta commit-time stats pattern (reference workload:
  * …/Integration/SSIS/Practice markdown describes range-partitioned
  * incremental loads whose queries carry tight key ranges): at commit
  * time read each new parquet FOOTER (metadata only, no data pages),
  * merge min/max/nullCount per top-level primitive column across row
  * groups, and store the result in the file's manifest entry. A
  * filtered read ([[TxTable.readWhere]]) then drops files whose stats
  * PROVE the predicate selects nothing from them — before Spark ever
  * lists or opens a file.
  *
  * Safety invariant — pruning is correctness-neutral by construction:
  * every decision is "drop only when stats prove emptiness"; a column
  * with no stats (legacy manifest line, unsupported physical type, a
  * row group with missing statistics, NaN bounds) keeps the file, and
  * the full predicate is re-applied by Spark on whatever survives.
  * Stats only ever REMOVE work.
  *
  * At 100 TB: footers are read once per file at commit time (the only
  * moment the file is already in the writer's hands), never on the
  * read path; a selective predicate on a range-clustered column turns
  * a full-table scan plan into exactly the matching files' scan. The
  * driver-side footer loop is bounded by the files of ONE commit, not
  * by table size; a giant initial import can parallelize the loop via
  * `spark.parallelize(files)` without changing the manifest format.
  */
object FileStats {

  /** Canonical-string bounds; None = unknown (never prune on it).
    * `nulls` / `rows` use -1 as "unknown".
    */
  final case class ColStats(min: Option[String], max: Option[String], nulls: Long)

  final case class Stats(rows: Long, cols: Map[String, ColStats])

  val Empty: Stats = Stats(-1L, Map.empty)

  /** Stats are collected for at most this many leading top-level
    * primitive columns (Iceberg's default bound) so manifest lines
    * stay metadata-sized on wide tables.
    */
  val MaxStatsCols = 32

  /** String bounds longer than this are truncated: a truncated MIN
    * (prefix) is still a valid lower bound; a truncated MAX is not a
    * valid upper bound, so it is dropped instead.
    */
  val MaxStringLen = 64

  // ---------------------------------------------------------------
  // Footer extraction
  // ---------------------------------------------------------------

  /** Read one parquet file's footer and merge its row groups' column
    * statistics. Unsupported or stats-less columns are simply absent
    * from the result (= never pruned on).
    */
  def forFile(conf: Configuration, file: Path): Stats = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // (name → per-row-group domain stats); Option.empty poison marks
      // a column any row group lacks stats for
      val merged = scala.collection.mutable.Map.empty[String, Option[(Dom, Dom, Long)]]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val path = c.getPath.toArray
        if (path.length == 1) { // top-level primitives only — no nested
          val name = path(0)
          val chunk = chunkStats(c.getPrimitiveType, c.getStatistics)
          merged.get(name) match {
            case None => merged(name) = chunk
            case Some(prev) =>
              merged(name) = for {
                (pMin, pMax, pN) <- prev; (cMin, cMax, cN) <- chunk
              } yield (Dom.min(pMin, cMin), Dom.max(pMax, cMax), pN + cN)
          }
        }
      }
      val order = reader.getFooter.getFileMetaData.getSchema.getFields.asScala
        .map(_.getName).zipWithIndex.toMap
      val cols = merged.toSeq
        .collect { case (n, Some((mn, mx, nulls))) => n -> (mn, mx, nulls) }
        .sortBy { case (n, _) => order.getOrElse(n, Int.MaxValue) }
        .take(MaxStatsCols)
        .map { case (n, (mn, mx, nulls)) =>
          n -> ColStats(mn.canonical, mx.canonicalUpper, nulls)
        }.toMap
      Stats(rows, cols)
    } finally reader.close()
  }

  /** One column chunk's (min, max, nullCount) in comparison domain,
    * or None when the chunk cannot contribute sound bounds.
    */
  private def chunkStats(
      t: PrimitiveType,
      s: org.apache.parquet.column.statistics.Statistics[_]): Option[(Dom, Dom, Long)] = {
    if (s == null || s.isEmpty || s.isNumNullsSet == false) return None
    val nulls = s.getNumNulls
    if (!s.hasNonNullValue) {
      // all-null chunk: bounds vacuous — represent as an empty range
      // that never widens the merge (use null domain sentinels)
      return Some((Dom.PosInf, Dom.NegInf, nulls))
    }
    val logical = t.getLogicalTypeAnnotation
    Try {
      (t.getPrimitiveTypeName, logical) match {
        case (PrimitiveTypeName.INT32, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          val sc = d.getScale
          Some((Dom.Num(BigDecimal(s.genericGetMin.asInstanceOf[Integer].toLong, sc)),
            Dom.Num(BigDecimal(s.genericGetMax.asInstanceOf[Integer].toLong, sc)), nulls))
        case (PrimitiveTypeName.INT64, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          val sc = d.getScale
          Some((Dom.Num(BigDecimal(s.genericGetMin.asInstanceOf[java.lang.Long].toLong, sc)),
            Dom.Num(BigDecimal(s.genericGetMax.asInstanceOf[java.lang.Long].toLong, sc)), nulls))
        case (PrimitiveTypeName.INT64, ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
          // normalize to MICROS — Catalyst's internal timestamp unit
          val f = ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
            case LogicalTypeAnnotation.TimeUnit.MICROS => 1L
            case _ => return None // NANOS: lossy division is unsound for bounds
          }
          Some((Dom.Num(BigDecimal(s.genericGetMin.asInstanceOf[java.lang.Long] * f)),
            Dom.Num(BigDecimal(s.genericGetMax.asInstanceOf[java.lang.Long] * f)), nulls))
        case (PrimitiveTypeName.INT32, _) => // plain ints + DATE (days)
          Some((Dom.Num(BigDecimal(s.genericGetMin.asInstanceOf[Integer].toInt)),
            Dom.Num(BigDecimal(s.genericGetMax.asInstanceOf[Integer].toInt)), nulls))
        case (PrimitiveTypeName.INT64, _) =>
          Some((Dom.Num(BigDecimal(s.genericGetMin.asInstanceOf[java.lang.Long].toLong)),
            Dom.Num(BigDecimal(s.genericGetMax.asInstanceOf[java.lang.Long].toLong)), nulls))
        case (PrimitiveTypeName.FLOAT, _) =>
          val (mn, mx) = (s.genericGetMin.asInstanceOf[java.lang.Float].toFloat,
            s.genericGetMax.asInstanceOf[java.lang.Float].toFloat)
          if (mn.isNaN || mx.isNaN) None
          else Some((Dom.Num(BigDecimal.decimal(mn)), Dom.Num(BigDecimal.decimal(mx)), nulls))
        case (PrimitiveTypeName.DOUBLE, _) =>
          val (mn, mx) = (s.genericGetMin.asInstanceOf[java.lang.Double].toDouble,
            s.genericGetMax.asInstanceOf[java.lang.Double].toDouble)
          if (mn.isNaN || mx.isNaN) None
          else Some((Dom.Num(BigDecimal(mn)), Dom.Num(BigDecimal(mx)), nulls))
        case (PrimitiveTypeName.BOOLEAN, _) =>
          Some((Dom.Num(if (s.genericGetMin.asInstanceOf[java.lang.Boolean]) 1 else 0),
            Dom.Num(if (s.genericGetMax.asInstanceOf[java.lang.Boolean]) 1 else 0), nulls))
        case (PrimitiveTypeName.BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
          Some((Dom.Str(s.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8),
            Dom.Str(s.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8), nulls))
        case _ => None // INT96, FLBA decimals, raw binary: no sound bounds
      }
    }.toOption.flatten
  }

  // ---------------------------------------------------------------
  // Comparison domain
  // ---------------------------------------------------------------

  /** Values compare either numerically (ints, floats, decimals, and
    * date-days / timestamp-micros in Catalyst's internal units) or as
    * strings in UNSIGNED UTF-8 BYTE order — the order Spark's
    * `UTF8String` comparisons and parquet's UTF8 column statistics
    * both use. Comparing in UTF-16 code-unit order instead would be
    * UNSOUND: the two orders disagree on supplementary characters
    * (U+FFFF sorts above U+10000 in UTF-16 but below it in UTF-8), so
    * a file could be pruned that Spark's own `<` would select from.
    */
  private[sources] sealed trait Dom {
    def canonical: Option[String] = this match {
      case Dom.Num(v) => Some(v.bigDecimal.stripTrailingZeros.toPlainString)
      // a code-point-boundary prefix is a UTF-8 BYTE prefix, so it
      // stays a valid lower bound (never split a surrogate pair: the
      // unpaired half would re-encode as U+FFFD and change the order)
      case Dom.Str(v) =>
        val cut = if (v.length > MaxStringLen &&
          Character.isHighSurrogate(v.charAt(MaxStringLen - 1))) MaxStringLen - 1
        else MaxStringLen
        Some(v.take(cut))
      case _ => None
    }
    /** Upper bounds cannot be prefix-truncated (a prefix sorts LOWER). */
    def canonicalUpper: Option[String] = this match {
      case Dom.Str(v) if v.length > MaxStringLen => None
      case other => other.canonical
    }
  }
  private[sources] object Dom {
    final case class Num(v: BigDecimal) extends Dom
    final case class Str(v: String) extends Dom
    /** Sentinels for all-null chunks: an empty range that never
      * widens a merge (PosInf never wins a min, NegInf never a max).
      */
    case object PosInf extends Dom
    case object NegInf extends Dom

    private def utf8Lt(x: String, y: String): Boolean = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val ai = a(i) & 0xff; val bi = b(i) & 0xff
        if (ai != bi) return ai < bi
        i += 1
      }
      a.length < b.length
    }

    def lt(a: Dom, b: Dom): Boolean = (a, b) match {
      case (NegInf, _) | (_, PosInf) => true
      case (PosInf, _) | (_, NegInf) => false
      case (Num(x), Num(y)) => x < y
      case (Str(x), Str(y)) => utf8Lt(x, y)
      case _ => false // mixed domains never compare
    }
    def min(a: Dom, b: Dom): Dom = if (lt(b, a)) b else a
    def max(a: Dom, b: Dom): Dom = if (lt(a, b)) b else a
  }

  // ---------------------------------------------------------------
  // Manifest encoding:  rows=N;col=min,max,nulls;...   (URL-escaped)
  // ---------------------------------------------------------------

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

  def encode(st: Stats): String = {
    val cols = st.cols.toSeq.sortBy(_._1).map { case (n, c) =>
      s"${enc(n)}=${c.min.map(enc).getOrElse("")},${c.max.map(enc).getOrElse("")},${c.nulls}"
    }
    (s"rows=${st.rows}" +: cols).mkString(";")
  }

  /** Inverse of [[encode]]; any malformed field degrades to "unknown"
    * (never prune), never to an error — a manifest must stay readable.
    */
  def decode(s: String): Stats = {
    if (s.isEmpty) return Empty
    val parts = s.split(";", -1).toSeq
    val rows = parts.headOption.filter(_.startsWith("rows="))
      .flatMap(p => Try(p.stripPrefix("rows=").toLong).toOption).getOrElse(-1L)
    val cols = parts.drop(1).flatMap { p =>
      Try {
        val Array(n, rest) = p.split("=", 2)
        val Array(mn, mx, nulls) = rest.split(",", 3)
        dec(n) -> ColStats(
          Option(mn).filter(_.nonEmpty).map(dec),
          Option(mx).filter(_.nonEmpty).map(dec),
          Try(nulls.toLong).getOrElse(-1L))
      }.toOption
    }.toMap
    Stats(rows, cols)
  }

  // ---------------------------------------------------------------
  // Predicate → skip decision
  // ---------------------------------------------------------------

  /** Resolve + constant-fold `cond` against the table schema so the
    * skip rules see Catalyst comparison nodes. The Spark 4 Column DSL
    * builds UNRESOLVED nodes (`col("k") === 5L` is
    * `UnresolvedFunction("=")`, not `EqualTo`), so the predicate is
    * analyzed the same way a real filter would be — which also turns
    * foldable subtrees (`to_timestamp(lit(…))`, arithmetic over
    * literals) into plain Literals the bounds can compare against.
    * Run ONCE per read, not per file.
    */
  def normalize(
      spark: org.apache.spark.sql.SparkSession,
      schema: StructType, cond: Column): Expression = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val analyzed = empty.filter(cond).queryExecution.analyzed
    val e = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(org.apache.spark.sql.GraftColumnBridge.expression(cond))
    // RuntimeReplaceable nodes (to_timestamp, to_date, …) only become
    // evaluable after the optimizer's ReplaceExpressions — apply the
    // same rewrite so their foldable forms fold to Literals below
    fold(e.transformUp { case r: RuntimeReplaceable => r.replacement })
  }

  private def fold(e: Expression): Expression =
    if (e.foldable)
      Try(Literal.create(e.eval(null), e.dataType)).getOrElse(e)
    else e.mapChildren(fold)

  /** True when `stats` PROVES the ([[normalize]]d) predicate matches
    * no row of the file. Evaluates the AND-conjuncts of the shape
    * `col (=|<|>|<=|>=|<=>|IN) literal` / `col IS [NOT] NULL`;
    * anything else (OR at top level, casts around the column,
    * expressions over columns) contributes nothing — the file is kept
    * and Spark's own filter decides row-by-row.
    */
  def provesEmpty(cond: Expression, schema: StructType, encoded: String): Boolean = {
    val stats = decode(encoded)
    if (stats.cols.isEmpty && stats.rows < 0) return false
    conjuncts(cond).exists(c => conjunctProvesEmpty(c, schema, stats))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** A literal in the comparison domain of the column it is compared
    * to; None = not a supported literal/domain pairing.
    */
  private def litDom(e: Expression, colType: DataType): Option[Dom] = e match {
    case Literal(null, _) => None
    case Literal(v, dt) =>
      (dt, colType) match {
        case (_: NumericType | DateType | TimestampType | TimestampNTZType | BooleanType,
              _: NumericType | DateType | TimestampType | TimestampNTZType | BooleanType) =>
          Some(Dom.Num(v match {
            case b: Boolean => if (b) BigDecimal(1) else BigDecimal(0)
            case b: Byte => BigDecimal(b.toInt)
            case s: Short => BigDecimal(s.toInt)
            case i: Int => BigDecimal(i)       // also DATE days
            case l: Long => BigDecimal(l)      // also TIMESTAMP micros
            case f: Float => BigDecimal.decimal(f)
            case d: Double => BigDecimal(d)
            case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal
            case other => return None
          }))
        case (_: StringType, _: StringType) =>
          Some(Dom.Str(v.toString)) // UTF8String.toString
        case _ => None // cross-domain comparison: let Spark cast at runtime
      }
    case _ => None
  }

  private def colStats(
      name: String, schema: StructType, stats: Stats): Option[(ColStats, DataType)] =
    schema.fields.find(_.name == name).flatMap(f =>
      stats.cols.get(name).map(cs => (cs, f.dataType)))

  private def bound(s: Option[String], dt: DataType): Option[Dom] = s.flatMap { v =>
    dt match {
      case StringType => Some(Dom.Str(v))
      case _: NumericType | DateType | TimestampType | TimestampNTZType | BooleanType =>
        Try(Dom.Num(BigDecimal(v))).toOption
      case _ => None
    }
  }

  private def conjunctProvesEmpty(
      e: Expression, schema: StructType, stats: Stats): Boolean = {
    import Dom.lt
    def withStats(a: Expression)(f: (ColStats, DataType) => Boolean): Boolean =
      attrName(a).flatMap(colStats(_, schema, stats))
        .exists { case (cs, dt) => f(cs, dt) }
    def outOfRange(a: Expression, l: Expression): Boolean = withStats(a) { (cs, dt) =>
      litDom(l, dt).exists { v =>
        bound(cs.min, dt).exists(mn => lt(v, mn)) ||
          bound(cs.max, dt).exists(mx => lt(mx, v))
      }
    }
    e match {
      case EqualTo(a, l: Literal) => outOfRange(a, l)
      case EqualTo(l: Literal, a) => outOfRange(a, l)
      case EqualNullSafe(a, l @ Literal(v, _)) =>
        if (v == null) withStats(a)((cs, _) => cs.nulls == 0)
        else outOfRange(a, l)
      case EqualNullSafe(l @ Literal(v, _), a) =>
        if (v == null) withStats(a)((cs, _) => cs.nulls == 0)
        else outOfRange(a, l)
      // col > v: empty when max <= v  ⇔  not (v < max)
      case GreaterThan(a, l: Literal) => withStats(a) { (cs, dt) =>
        litDom(l, dt).exists(v => bound(cs.max, dt).exists(mx => !lt(v, mx)))
      }
      case GreaterThan(l: Literal, a) => conjunctProvesEmpty(LessThan(a, l), schema, stats)
      case GreaterThanOrEqual(a, l: Literal) => withStats(a) { (cs, dt) =>
        litDom(l, dt).exists(v => bound(cs.max, dt).exists(mx => lt(mx, v)))
      }
      case GreaterThanOrEqual(l: Literal, a) =>
        conjunctProvesEmpty(LessThanOrEqual(a, l), schema, stats)
      case LessThan(a, l: Literal) => withStats(a) { (cs, dt) =>
        litDom(l, dt).exists(v => bound(cs.min, dt).exists(mn => !lt(mn, v)))
      }
      case LessThan(l: Literal, a) => conjunctProvesEmpty(GreaterThan(a, l), schema, stats)
      case LessThanOrEqual(a, l: Literal) => withStats(a) { (cs, dt) =>
        litDom(l, dt).exists(v => bound(cs.min, dt).exists(mn => lt(v, mn)))
      }
      case LessThanOrEqual(l: Literal, a) =>
        conjunctProvesEmpty(GreaterThanOrEqual(a, l), schema, stats)
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        withStats(a) { (cs, dt) =>
          val doms = vs.map(litDom(_, dt))
          doms.forall(_.isDefined) && doms.flatten.forall { v =>
            bound(cs.min, dt).exists(mn => lt(v, mn)) ||
              bound(cs.max, dt).exists(mx => lt(mx, v))
          }
        }
      case IsNull(a) => withStats(a)((cs, _) => cs.nulls == 0)
      case IsNotNull(a) => withStats(a)((cs, _) =>
        stats.rows >= 0 && cs.nulls == stats.rows)
      case _ => false
    }
  }
}
