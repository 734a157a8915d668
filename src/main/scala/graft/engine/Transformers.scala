package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's five record-level transformers as Catalyst column
  * expressions (go-datax `docs/TRANSFORMER.md`; configured per job under
  * `job.content[].transformer`, e.g.
  * `test-data/config-transformer-combined.json:30-48`).
  *
  * Reference semantics preserved:
  *  - transformers run in configuration order (chain);
  *  - a transformer producing null filters the record out
  *    (`docs/TRANSFORMER.md` "如果任何Transformer返回null，记录被过滤掉");
  *  - `dx_filter` KEEPS records satisfying the predicate; its `like` /
  *    `not like` operators take REGEX patterns (the reference's own test
  *    config uses `"93418fd.*"`, `test-data/config-transformer-filter.json`);
  *  - `dx_substr` start is 0-based (Spark's `substring` is 1-based);
  *  - columns are addressed by position in the reference (`columnIndex`);
  *    we accept a name or a position.
  *
  * All five compile to built-in codegen'd functions — no UDFs, so they stay
  * inside WholeStageCodegen and Catalyst can push the `dx_filter` predicate
  * into the scan.
  */
object Transformers {

  sealed trait Transform { def columnIndex: Either[Int, String] }

  /** Keep records where `col <op> value`; ops: > < = != >= <= like notlike. */
  final case class DxFilter(columnIndex: Either[Int, String], op: String, value: String)
      extends Transform

  /** substring(col, start0, length) — 0-based start. */
  final case class DxSubstr(columnIndex: Either[Int, String], start: Int, length: Int)
      extends Transform

  /** Regex find/replace (all occurrences). */
  final case class DxReplace(columnIndex: Either[Int, String], pattern: String, replacement: String)
      extends Transform

  /** Pad to `length` with `pad` on `side` ("left"|"right"). */
  final case class DxPad(columnIndex: Either[Int, String], side: String, length: Int, pad: String)
      extends Transform

  /** md5 | sha1 | sha256 hex digest of the column. */
  final case class DxDigest(columnIndex: Either[Int, String], algo: String)
      extends Transform

  private def resolve(df: DataFrame, ref: Either[Int, String]): String = ref match {
    case Left(i) =>
      require(i >= 0 && i < df.columns.length, s"columnIndex $i out of range")
      df.columns(i)
    case Right(name) => name
  }

  /** The predicate of a dx_filter as a Column (usable standalone). */
  def filterPredicate(c: Column, op: String, value: String): Column = op match {
    case ">" => c > value
    case "<" => c < value
    case "=" => c === value
    case "!=" => c =!= value
    case ">=" => c >= value
    case "<=" => c <= value
    case "like" => c.rlike(value)
    case "not like" | "notlike" => !c.rlike(value)
    case other => throw new IllegalArgumentException(s"dx_filter op '$other'")
  }

  /** Apply one transformer; column-rewriting transformers enforce the
    * filter-null contract (null result drops the record).
    */
  def applyOne(df: DataFrame, t: Transform): DataFrame = t match {
    case DxFilter(ci, op, v) =>
      df.filter(filterPredicate(col(resolve(df, ci)), op, v))
    case DxSubstr(ci, start, len) =>
      val name = resolve(df, ci)
      df.withColumn(name, substring(col(name), start + 1, len))
        .filter(col(name).isNotNull)
    case DxReplace(ci, pat, rep) =>
      val name = resolve(df, ci)
      df.withColumn(name, regexp_replace(col(name), pat, rep))
        .filter(col(name).isNotNull)
    case DxPad(ci, side, len, pad) =>
      val name = resolve(df, ci)
      val padded = side.toLowerCase match {
        case "left" => lpad(col(name), len, pad)
        case "right" => rpad(col(name), len, pad)
        case other => throw new IllegalArgumentException(s"dx_pad side '$other'")
      }
      df.withColumn(name, padded).filter(col(name).isNotNull)
    case DxDigest(ci, algo) =>
      val name = resolve(df, ci)
      val digested = algo.toLowerCase match {
        case "md5" => md5(col(name).cast("string"))
        case "sha1" => sha1(col(name).cast("string"))
        case "sha256" => sha2(col(name).cast("string"), 256)
        case other => throw new IllegalArgumentException(s"dx_digest algo '$other'")
      }
      df.withColumn(name, digested).filter(col(name).isNotNull)
  }

  /** Apply a chain in configuration order. */
  def chain(df: DataFrame, ts: Seq[Transform]): DataFrame =
    ts.foldLeft(df)(applyOne)
}
