package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The elasticsearchwriter's `_bulk` protocol, Spark-shaped
  * (`elasticsearch_writer.go:846-962` doBatchWrite): each record becomes an
  * action METADATA line plus (except delete) a DOCUMENT line, batches are
  * newline-joined into one bulk body, and the response is scanned for
  * PER-ITEM errors even when the HTTP call succeeds
  * (`executeBulkRequest:1415-1462`).
  *
  * Payload construction is pure Catalyst (`to_json` over structs — codegen'd,
  * no UDFs): `to_json` drops null fields by default, which is exactly the
  * reference's `marshalWithoutNull`/`removeNullValues` behavior
  * (`:1395-1413`), and optional metadata (_id, routing, version) drops out
  * of the action line the same way when its column is null. Rows whose
  * canonical `op` column is 'D' become delete actions (the CDC flow's
  * delete records, `isDeleteRecord`).
  *
  * The HTTP transport is pluggable (`post`): the sandbox has no network, so
  * specs bind a recording fake; production binds any HTTP client. Batches
  * ride [[BatchedExec]] — per-partition, bounded retry, no driver collect.
  */
object EsBulk {

  /** actionType index|create|update (`ActionType`, `:36-41`); update wraps
    * the doc as `{"doc": ..., "doc_as_upsert": true}` (`:908-924`);
    * `esVersion < 7` adds `_type` to every action (`:879-907`).
    */
  final case class Config(
      index: String,
      actionType: String = "index",
      idCol: Option[String] = None,
      routingCol: Option[String] = None,
      versionCol: Option[String] = None,
      indexType: String = "_doc",
      esVersion: Int = 7,
      /** enableWriteNull: serialize null fields instead of dropping them */
      writeNull: Boolean = false)

  /** Metadata/control columns never serialized into the document body. */
  private val metaCols = Set("op", "lsn")

  /** One output string column `value`: the action line, plus `\n` + doc line
    * for non-delete actions — the exact frame `_bulk` consumes.
    */
  def payloadLines(df: DataFrame, cfg: Config): DataFrame = {
    require(Set("index", "create", "update").contains(cfg.actionType),
      s"actionType '${cfg.actionType}' (index|create|update)")
    require(cfg.actionType != "update" || cfg.idCol.nonEmpty,
      "update needs an id column") // :752 hasID check
    val payload = df.columns.filterNot(c => metaCols.contains(c.toLowerCase)).toSeq
    val hasOp = df.columns.exists(_.equalsIgnoreCase("op"))
    // change-event input can carry op='D' rows, and a delete action without
    // _id is rejected per item by ES — fail at plan time, not per batch
    require(!hasOp || cfg.idCol.nonEmpty,
      "change-event input (op column) needs an id column for delete actions")

    def metaStruct(withId: Boolean, forUpdate: Boolean): Column = {
      val id = cfg.idCol.map(c => col(c).cast("string")).getOrElse(lit(null).cast("string"))
      val fields = Seq(lit(cfg.index).as("_index")) ++
        (if (withId) Seq(id.as("_id")) else Seq(lit(null).cast("string").as("_id"))) ++
        (if (cfg.esVersion < 7) Seq(lit(cfg.indexType).as("_type")) else Nil) ++
        cfg.routingCol.map(c => col(c).cast("string").as("routing")).toSeq ++
        // version rides with version_type=external, never on update (:930-933)
        (if (forUpdate) Nil
         else cfg.versionCol.toSeq.flatMap(c => Seq(
           col(c).cast("long").as("version"),
           when(col(c).isNotNull, lit("external")).as("version_type"))))
      struct(fields: _*)
    }

    // metadata lines ALWAYS drop null fields (`{"index":{"_id":null}}` is a
    // bulk-item error) — explicit here so the session-level
    // spark.sql.jsonGenerator.ignoreNullFields default cannot leak in;
    // cfg.writeNull only governs the DOCUMENT body below
    val metaOpts = Map("ignoreNullFields" -> "true")
    val actionLine = to_json(struct(metaStruct(withId = cfg.idCol.nonEmpty,
      forUpdate = cfg.actionType == "update").as(cfg.actionType)), metaOpts)
    val deleteLine = to_json(
      struct(metaStruct(withId = true, forUpdate = false).as("delete")), metaOpts)

    val docStruct = struct(payload.map(col): _*)
    val jsonOpts = Map("ignoreNullFields" -> (!cfg.writeNull).toString)
    val docJson = to_json(docStruct, jsonOpts)
    val docLine =
      if (cfg.actionType == "update")
        // {"doc": {...}, "doc_as_upsert": true} (:920-924)
        to_json(struct(docStruct.as("doc"), lit(true).as("doc_as_upsert")), jsonOpts)
      else docJson

    val isDelete = if (hasOp) col("op") === "D" else lit(false)
    df.select(
      when(isDelete, deleteLine)
        .otherwise(concat(actionLine, lit("\n"), docLine))
        .as("value"))
  }

  /** Scan a bulk response body for per-item errors — the contract that a
    * 200 response can still carry failed items (`:1446-1462`).
    */
  def scanErrors(responseJson: String): Seq[String] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(responseJson)
    if (root == null || !root.path("errors").asBoolean(false)) Nil
    else {
      import scala.jdk.CollectionConverters._
      root.path("items").elements().asScala.flatMap { item =>
        item.fields().asScala.flatMap { e =>
          Option(e.getValue.get("error")).map(err => s"${e.getKey}: ${err.toString}")
        }
      }.toSeq
    }
  }

  final class BulkItemsFailed(errors: Seq[String])
    extends RuntimeException(s"${errors.length} bulk item(s) failed: ${errors.take(3).mkString("; ")}")

  /** Execute the bulk write: frames → `batchSize`-line bodies → `post` →
    * per-item error scan. `post` takes the bulk body and returns the
    * response body; it runs on executors and must be serializable.
    * `ignoreItemErrors` = the reference's ignoreParseError pass-through.
    */
  def write(df: DataFrame, cfg: Config, batchSize: Int = 1024,
      ignoreItemErrors: Boolean = false,
      retry: BatchedExec.RetryPolicy = BatchedExec.RetryPolicy())(
      post: String => String): Unit = {
    val lines = payloadLines(df, cfg)
    BatchedExec.foreachBatch(lines, batchSize, retry) { batch =>
      val body = batch.map(_.getString(0)).mkString("", "\n", "\n")
      val errors = scanErrors(post(body))
      if (errors.nonEmpty && !ignoreItemErrors) throw new BulkItemsFailed(errors)
    }
  }
}
