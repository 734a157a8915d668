package graft.lake

import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Between, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics for manifest-level FILE SKIPPING — the
  * Iceberg/Delta data-skipping analog (Iceberg spec "Manifests: column
  * bounds"; public knowledge, no code derived).
  *
  * At publish time [[LakeTable]] harvests min/max for the table's KEY
  * columns from each parquet FOOTER (metadata already being opened for row
  * counts — zero extra I/O) and records them on the manifest's file entries.
  * At read time [[LakeTable#readWhere]] extracts conjunctive range
  * predicates on key columns and drops whole files whose bounds disprove
  * them — before Spark ever lists, opens, or schedules them.
  *
  * WHY KEY COLUMNS ONLY (for files in DIRTY buckets) — LWW soundness:
  * merge-on-read resolves each key's winner with a window over all of the
  * key's rows. Skipping a file on a MUTABLE column's bounds could hide a
  * key's newest version while an older version (with a different value for
  * that column) survives in a kept file and wins the window — a silently
  * stale read. Key columns are immutable per key (every version of a key
  * carries identical key values), so a file whose key bounds disprove the
  * predicate contains NO row of any matching key, and for every matching
  * key ALL of its rows — including tombstones — are in kept files. Rows of
  * non-matching keys that happen to survive a partially-pruned window are
  * removed by re-applying the full predicate after resolution.
  *
  * CLEAN-BUCKET LEMMA — why ANY column's bounds prune soundly in a bucket
  * with no delta files: compaction writes exactly one physical row per key
  * into the bucket's base files (the LWW winner, tombstone winners
  * included), and a key's rows can never live outside its hash bucket. So
  * in a clean bucket there IS no competing version a skip could hide: every
  * stored row is final, the read path is a plain scan + residual filter
  * (no resolution window), and dropping a file whose bounds disprove the
  * predicate removes only rows the residual filter would reject. The
  * moment a delta lands in the bucket this lemma stops applying — pruning
  * reverts to key columns only for that bucket until the next compaction.
  * Accordingly the harvest records ALL mappable top-level columns for BASE
  * files (the compaction rewrite has every footer open anyway) and key
  * columns only for delta files; the prune gate checks bucket cleanliness
  * per scan against the live snapshot. This is what makes the most common
  * transcript scan — a `ts` range window — file-skip on a mostly-compacted
  * table without touching the key-immutability argument.
  *
  * CONSERVATISM: a file is skipped only when harvested bounds PROVE no row
  * can match. Files without stats (pre-stats manifests, footer stats absent
  * or >4 KB so parquet omitted them, unmappable physical types, >256-char
  * string bounds) are always kept; conjuncts that aren't a supported
  * comparison of one key column against literals are ignored for pruning
  * (the residual filter still applies them). Parquet's row-group footer
  * stats are exact — truncation is disabled by default
  * (`parquet.statistics.truncate.length` = MAX_VALUE) and the publish path
  * pins it, because a truncated max would understate bounds and break the
  * skip proof.
  *
  * Canonical encoding (manifest is line-oriented text): integral, date and
  * timestamp-micros values as decimal longs; float/double as decimal;
  * booleans as true/false; strings raw (percent-escaped for the manifest's
  * separators) and compared in UNSIGNED UTF-8 byte order via [[UTF8String]]
  * — the same total order parquet's UTF8 comparator used to compute the
  * bounds, NOT Java's UTF-16 `String.compareTo` (they disagree above the
  * BMP, which would make pruning unsound for supplementary-plane keys).
  */
private[graft] object FileStats {

  // ------------------------------------------------------- manifest encoding

  /** Percent-escape the manifest's structural chars (%, tab, newline, CR,
    * `,`, `;`, `=`) — values are otherwise stored raw.
    */
  def enc(s: String): String =
    if (!s.exists(c => c == '%' || c == '\t' || c == '\n' || c == '\r' || c == ',' || c == ';' || c == '='))
      s
    else {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case c @ ('%' | '\t' | '\n' | '\r' | ',' | ';' | '=') =>
          sb.append('%').append("%02X".format(c.toInt))
        case c => sb.append(c)
      }
      sb.toString
    }

  def dec(s: String): String =
    if (!s.contains('%')) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '%' && i + 2 < s.length) {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }

  /** Serialize per-column bounds for a manifest `fstats=` line:
    * `col=min,max;...`, percent-encoded, columns sorted for determinism.
    * Inverse of [[decStats]].
    */
  def encStats(stats: Map[String, (String, String)]): String =
    stats.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
      s"${enc(c)}=${enc(lo)},${enc(hi)}"
    }.mkString(";")

  def decStats(blob: String): Map[String, (String, String)] =
    blob.split(';').iterator.map { kv =>
      val eq = kv.indexOf('=')
      val c = dec(kv.substring(0, eq))
      val Array(lo, hi) = kv.substring(eq + 1).split(",", 2)
      c -> (dec(lo), dec(hi))
    }.toMap

  // ------------------------------------------------------- footer harvesting

  /** Min/max per requested column across all row groups of one footer.
    * A column is omitted (conservative: the file is never skipped on it)
    * unless EVERY row group carries usable, mappable stats for it.
    */
  def fromFooter(footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      statCols: Seq[String]): Map[String, (String, String)] = {
    import scala.jdk.CollectionConverters._
    val blocks = footer.getBlocks.asScala.toSeq
    if (blocks.isEmpty) return Map.empty
    statCols.flatMap(c => harvest(blocks, c).map(c -> _)).toMap
  }

  /** Every top-level primitive column of the footer's schema except
    * `exclude` — the stat-column set for CLEAN-bucket (base-file) harvesting,
    * where bounds on ANY column prune soundly (see the clean-bucket lemma in
    * the object scaladoc). Nested/repeated fields are skipped (harvest only
    * maps single-segment paths).
    */
  def allStatCols(footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      exclude: Set[String]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    footer.getFileMetaData.getSchema.getFields.asScala.toSeq
      .filter(_.isPrimitive).map(_.getName).filterNot(exclude)
  }

  private def harvest(blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
      name: String): Option[(String, String)] = {
    import scala.jdk.CollectionConverters._
    var minV: AnyRef = null
    var maxV: AnyRef = null
    var cmp: java.util.Comparator[AnyRef] = null
    var canon: AnyRef => Option[String] = null
    blocks.foreach { b =>
      b.getColumns.asScala.find(c => c.getPath.size == 1 && c.getPath.toDotString == name) match {
        case None => return None // column absent from a row group: unknown
        case Some(ch) =>
          val st: Statistics[_] = ch.getStatistics
          if (st == null || st.isEmpty) return None // stats not recorded: unknown
          if (st.hasNonNullValue) {
            if (cmp == null) {
              cmp = st.comparator().asInstanceOf[java.util.Comparator[AnyRef]]
              canon = canonFor(st.`type`())
              if (canon == null) return None // unmappable physical type
            }
            val mn = st.genericGetMin.asInstanceOf[AnyRef]
            val mx = st.genericGetMax.asInstanceOf[AnyRef]
            if (minV == null || cmp.compare(mn, minV) < 0) minV = mn
            if (maxV == null || cmp.compare(mx, maxV) > 0) maxV = mx
          }
        // an all-null row group records no min/max; its rows match no range
        // predicate, so it contributes nothing to the bounds — safe to skip
      }
    }
    if (minV == null) None
    else for { lo <- canon(minV); hi <- canon(maxV) } yield (lo, hi)
  }

  /** Physical-value → canonical-string mapping for one parquet primitive
    * type; null when the type has no sound canonical mapping (decimals —
    * scale lives in the annotation; INT96; non-micros timestamps whose unit
    * disagrees with Catalyst's internal micros).
    */
  private def canonFor(pt: PrimitiveType): AnyRef => Option[String] = {
    import PrimitiveType.PrimitiveTypeName._
    val ann = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case INT32 | INT64 => ann match {
        case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => null
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit != LogicalTypeAnnotation.TimeUnit.MICROS => null
        case _ => v => Some(v.asInstanceOf[Number].longValue.toString)
      }
      case FLOAT | DOUBLE => v => Some(v.asInstanceOf[Number].doubleValue.toString)
      case BOOLEAN => v => Some(v.toString)
      case BINARY if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        v => {
          val s = v.asInstanceOf[Binary].toStringUsingUTF8
          if (s.length > 256) None else Some(s) // unbounded keys would bloat the manifest
        }
      case _ => null
    }
  }

  // ------------------------------------------------------- predicate pruning

  /** One usable conjunct: a comparison of key column `col` against
    * literal(s), evaluable against a file's (min, max) bounds. `litType`
    * is the LITERAL's Catalyst type (pre-analysis — may be narrower than
    * the column's); comparisons that can't be mapped soundly across the
    * two types keep the file.
    */
  sealed trait Constraint { def col: String }
  final case class Range(col: String, op: String, value: Any, litType: DataType) extends Constraint
  final case class InSet(col: String, values: Seq[(Any, DataType)]) extends Constraint

  /** Compiled boolean skeleton of a predicate, evaluated per file against
    * its bounds. Disproof composes: an AND is disproven when EITHER side
    * is, an OR only when BOTH sides are, and an unsupported leaf (non-key
    * column, expression, subquery) is NEVER disproven — so arbitrary
    * predicates degrade gracefully toward "keep the file" and the residual
    * filter defines semantics.
    */
  sealed trait Pred
  case object Unknown extends Pred
  final case class Leaf(c: Constraint) extends Pred
  final case class AndP(l: Pred, r: Pred) extends Pred
  final case class OrP(l: Pred, r: Pred) extends Pred

  /** True when `p` contains at least one usable constraint that could ever
    * disprove anything (an OR with an Unknown side can't).
    */
  def usable(p: Pred): Boolean = p match {
    case Unknown => false
    case Leaf(_) => true
    case AndP(l, r) => usable(l) || usable(r)
    case OrP(l, r) => usable(l) && usable(r)
  }

  /** Constraints REQUIRED by every row matching `p` — the top-level AND
    * path's leaves (an OR requires neither branch). These feed bucket
    * pinning: equality on the full distribution key must hold for every
    * matching row to pin the scan to one bucket.
    */
  def topConjuncts(p: Pred): Seq[Constraint] = p match {
    case AndP(l, r) => topConjuncts(l) ++ topConjuncts(r)
    case Leaf(c) => Seq(c)
    case _ => Nil
  }

  /** True when file bounds `stats` PROVE no row of the file satisfies `p`. */
  def disproven(stats: Map[String, (String, String)], p: Pred,
      keyTypes: Map[String, DataType]): Boolean = p match {
    case Unknown => false
    case Leaf(c) => disprovesLeaf(stats, c, keyTypes)
    case AndP(l, r) => disproven(stats, l, keyTypes) || disproven(stats, r, keyTypes)
    case OrP(l, r) => disproven(stats, l, keyTypes) && disproven(stats, r, keyTypes)
  }

  /** Conjunct view of [[compile]] — the usable top-level constraints.
    * (Disjunctions are handled by [[disproven]] over the compiled tree;
    * this flat view exists for conjunction-only callers and tests.)
    */
  def constraints(pred: Expression, keyTypes: Map[String, DataType]): Seq[Constraint] =
    topConjuncts(compile(pred, keyTypes))

  /** Compile a predicate into its skippability skeleton: supported leaves
    * are `keyCol (=|<|<=|>|>=|<=>|IN) literal(s)` with the column on
    * either side, the column resolving case-insensitively to a key column
    * of Catalyst type `keyTypes(col)`; AND/OR structure is preserved;
    * everything else becomes [[Unknown]] and is enforced only by the
    * residual filter.
    */
  def compile(pred: Expression, keyTypes: Map[String, DataType]): Pred = {
    // Column→Expression conversion in Spark 4 yields UNRESOLVED function
    // nodes named after the SQL operator ('`>`('k, 5), 'and(...), 'in(...))
    // rather than the resolved Catalyst comparison classes; match both
    // shapes so the extractor works on raw Column predicates and on
    // already-analyzed expressions alike.
    object Fn {
      def unapply(e: Expression): Option[(String, Seq[Expression])] = e match {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.nameParts.length == 1 && !f.isDistinct && f.filter.isEmpty =>
          Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT), f.arguments))
        case _ => None
      }
    }
    def attr(e: Expression): Option[String] = e match {
      case a: AttributeReference => keyTypes.keys.find(_.equalsIgnoreCase(a.name))
      case u: UnresolvedAttribute if u.nameParts.length == 1 =>
        keyTypes.keys.find(_.equalsIgnoreCase(u.nameParts.head))
      case _ => None
    }
    def lit(e: Expression): Option[(Any, DataType)] = e match {
      case Literal(v, dt) if v != null => Some((v, dt))
      case _ => None
    }
    def binary(c: Option[String], v: Option[(Any, DataType)], op: String): Option[Constraint] =
      for { cc <- c; (vv, dt) <- v } yield Range(cc, op, vv, dt)
    val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=", "=" -> "=")
    def comparison(op: String, a: Expression, l: Expression): Option[Constraint] =
      binary(attr(a), lit(l), op).orElse(binary(attr(l), lit(a), flip(op)))
    def inSet(a: Expression, vs: Seq[Expression]): Option[Constraint] =
      if (vs.isEmpty || !vs.forall(_.isInstanceOf[Literal])) None
      else attr(a).flatMap { c =>
        val lits = vs.map(_.asInstanceOf[Literal]).map(l => (l.value, l.dataType))
        if (lits.exists(_._1 == null)) None else Some(InSet(c, lits))
      }
    def leaf(e: Expression): Option[Constraint] = e match {
      case EqualTo(a, l) => comparison("=", a, l)
      case EqualNullSafe(a, l) => comparison("=", a, l)
      case LessThan(a, l) => comparison("<", a, l)
      case LessThanOrEqual(a, l) => comparison("<=", a, l)
      case GreaterThan(a, l) => comparison(">", a, l)
      case GreaterThanOrEqual(a, l) => comparison(">=", a, l)
      case In(a, vs) => inSet(a, vs)
      case Fn("=" | "==" | "<=>", Seq(a, l)) => comparison("=", a, l)
      case Fn("<", Seq(a, l)) => comparison("<", a, l)
      case Fn("<=", Seq(a, l)) => comparison("<=", a, l)
      case Fn(">", Seq(a, l)) => comparison(">", a, l)
      case Fn(">=", Seq(a, l)) => comparison(">=", a, l)
      case Fn("in", args) if args.length >= 2 => inSet(args.head, args.tail)
      case _ => None
    }
    // BETWEEN desugars to >= AND <= — but only in the Column DSL. The SQL
    // parser leaves it as UnresolvedFunction('between') and the analyzer
    // resolves it to the RuntimeReplaceable Between node, so both shapes
    // must compile here or a bare `ts BETWEEN ...` window (the most common
    // ops-CLI predicate) silently prunes nothing. Each side degrades to
    // Unknown independently (AndP with one usable side still disproves).
    def between(a: Expression, lo: Expression, hi: Expression): Pred =
      AndP(comparison(">=", a, lo).map(Leaf.apply).getOrElse(Unknown),
        comparison("<=", a, hi).map(Leaf.apply).getOrElse(Unknown))
    def go(e: Expression): Pred = e match {
      case And(l, r) => AndP(go(l), go(r))
      case Fn("and", Seq(l, r)) => AndP(go(l), go(r))
      case Or(l, r) => OrP(go(l), go(r))
      case Fn("or", Seq(l, r)) => OrP(go(l), go(r))
      case b: Between => between(b.input, b.lower, b.upper)
      case Fn("between", Seq(a, lo, hi)) => between(a, lo, hi)
      case other => leaf(other).map(Leaf.apply).getOrElse(Unknown)
    }
    go(pred)
  }

  /** True when file bounds `stats` PROVE no row of the file satisfies every
    * constraint — i.e. the file can be skipped. Missing bounds for a
    * constrained column keep the file. A comparison that fails to map the
    * literal into the column's canonical domain keeps the file.
    */
  def provablyEmpty(stats: Map[String, (String, String)],
      constraintsOnFile: Seq[Constraint], keyTypes: Map[String, DataType]): Boolean =
    constraintsOnFile.exists(disprovesLeaf(stats, _, keyTypes))

  private def disprovesLeaf(stats: Map[String, (String, String)],
      c: Constraint, keyTypes: Map[String, DataType]): Boolean =
      stats.get(c.col) match {
        case None => false
        case Some((lo, hi)) =>
          val dt = keyTypes(c.col)
          c match {
            case Range(_, op, v, lt) =>
              cmp(v, lt, lo, dt).zip(cmp(v, lt, hi, dt)).exists { case (vsLo, vsHi) =>
                op match {
                  case "=" => vsLo < 0 || vsHi > 0 // v outside [lo, hi]
                  case "<" => vsLo <= 0 // nothing below v: min >= v
                  case "<=" => vsLo < 0 // min > v
                  case ">" => vsHi >= 0 // nothing above v: max <= v
                  case ">=" => vsHi > 0 // max < v
                }
              }
            case InSet(_, vs) =>
              // skippable iff EVERY candidate value is outside [lo, hi]
              vs.forall { case (v, lt) =>
                cmp(v, lt, lo, dt).zip(cmp(v, lt, hi, dt))
                  .exists { case (vsLo, vsHi) => vsLo < 0 || vsHi > 0 }
              }
          }
      }

  private val integralTypes: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)

  /** Compare a Catalyst literal (internal value `v` of type `lt`) against a
    * canonical bound string of a column of type `dt`; None = the pair has
    * no sound common domain (keep the file). Soundness requires agreeing
    * with how Spark's analyzer would coerce the comparison:
    *  - integral lit vs integral col → widened integral (exact as long);
    *  - numeric lit vs float/double col → the analyzer casts to double; a
    *    long literal beyond 2^53 can't round-trip exactly, so it's refused;
    *  - fractional lit vs integral col → the analyzer casts the COLUMN to
    *    double, so a long-domain compare would misprune — refused;
    *  - date/timestamp only against the IDENTICAL type (cross-type
    *    coercions change the unit);
    *  - strings in unsigned UTF-8 byte order (parquet's comparator).
    * Sign of the result: negative ⇒ literal < bound.
    */
  private def cmp(v: Any, lt: DataType, bound: String, dt: DataType): Option[Int] =
    try dt match {
      case _ if integralTypes(dt) && integralTypes(lt) =>
        Some(java.lang.Long.compare(v.asInstanceOf[Number].longValue, bound.toLong))
      case DateType | TimestampType | TimestampNTZType if lt == dt =>
        Some(java.lang.Long.compare(v.asInstanceOf[Number].longValue, bound.toLong))
      case FloatType | DoubleType =>
        val d = v match {
          case n: java.lang.Long if math.abs(n) > (1L << 53) => return None
          case n: Number if integralTypes(lt) || lt == FloatType || lt == DoubleType => n.doubleValue
          case _ => return None
        }
        // ±0.0 normalizes (`+ 0.0` maps -0.0 → 0.0) on BOTH sides: Spark
        // treats -0.0 = 0.0 as TRUE, but Double.compare orders -0.0 < 0.0 —
        // and a bound of 0.0 written by a parquet implementation that does
        // not widen min to -0.0 would otherwise wrongly skip a `= -0.0`
        // predicate. NaN: Double.compare orders NaN largest, which matches
        // BOTH Spark's ordering and parquet-mr's writer-side stats ordering
        // (the assumption the whole float branch rests on).
        Some(java.lang.Double.compare(d + 0.0d, bound.toDouble + 0.0d))
      case StringType if lt == StringType =>
        val l = v match {
          case u: UTF8String => u
          case s: String => UTF8String.fromString(s)
          case _ => return None
        }
        // UTF8String.compareTo is unsigned byte order — parquet's UTF8 comparator
        Some(l.compareTo(UTF8String.fromString(bound)))
      case BooleanType if lt == BooleanType =>
        Some(java.lang.Boolean.compare(v.asInstanceOf[Boolean], bound.toBoolean))
      case _ => None
    } catch { case _: NumberFormatException | _: ClassCastException => None }
}
