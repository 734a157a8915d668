package graft.core

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core data model for the CDC/ingest engine.
  *
  * The reference engine's fundamental abstraction is a positional, schemaless
  * `Record` of 6-typed `Column`s (go-datax `common/element/record.go:9-16`,
  * `column.go:9-19`). Spark is schema-first, so we resolve the schema at plan
  * time instead and use typed case classes + Encoders throughout.
  */
object Model {

  /** One turn of a multi-turn conversation transcript — the lake-table row
    * (BASELINE input_hint). `(conv_id, turn_idx)` is the primary key; `tool`
    * is nullable and is also the additive schema-evolution column (early
    * change events omit it entirely).
    */
  final case class Turn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: Option[String],
      ts: Timestamp)

  /** A binlog/WAL-shaped change event on `(conv_id, turn_idx)` keys.
    *
    * `op` is `I`/`U`/`D` (insert/update/delete — I and U are both upserts,
    * mirroring the reference's last-writer-wins PK upsert,
    * `common/database/rdbms/writer/common.go:556-616`). `lsn` is the log
    * sequence number: the last-writer-wins tiebreak is
    * `row_number() over (partition by key order by lsn desc, ts desc) = 1`.
    * Payload columns are null for `D`.
    */
  final case class ChangeEvent(
      op: String,
      lsn: Long,
      ts: Timestamp,
      conv_id: String,
      turn_idx: Int,
      role: Option[String],
      text: Option[String],
      tool: Option[String])

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** Change-event schema, full (with the late-arriving `tool` column). */
  val changeEventSchema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true)))

  /** Change-event schema as emitted before the `tool` column existed
    * (additive schema evolution is resolved at merge time).
    */
  val changeEventSchemaV1: StructType =
    StructType(changeEventSchema.fields.filterNot(_.name == "tool"))

  /** Transcript (lake table) public schema. */
  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  /** Key columns of the transcript table. */
  val keyCols: Seq[String] = Seq("conv_id", "turn_idx")
}
