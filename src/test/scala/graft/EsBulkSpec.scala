package graft

import org.apache.spark.sql.functions._

import graft.engine.{BatchedExec, EsBulk}

/** Shared executor-visible recorder for the bulk transport fake (local mode
  * = one JVM).
  */
object EsBulkSpecState {
  val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = bodies.clear()
}

/** Elasticsearch `_bulk` payload generation: golden action+doc lines per
  * actionType, null dropping, version routing, delete actions, and the
  * per-item response error scan (`elasticsearch_writer.go:846-962,1415-1462`).
  */
class EsBulkSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alice", Some(30L)),
    (2L, "bob", None)).toDF("id", "name", "age")

  test("index action: golden metadata + doc lines, nulls dropped") {
    val lines = EsBulk.payloadLines(docs,
      EsBulk.Config(index = "users", actionType = "index", idCol = Some("id")))
      .as[String].collect().sorted
    assert(lines(0) ===
      """{"index":{"_index":"users","_id":"1"}}""" + "\n" +
        """{"id":1,"name":"alice","age":30}""")
    // null age dropped from the doc (marshalWithoutNull default)
    assert(lines(1) ===
      """{"index":{"_index":"users","_id":"2"}}""" + "\n" +
        """{"id":2,"name":"bob"}""")
  }

  test("create without id, es6 _type, writeNull keeps nulls") {
    val lines = EsBulk.payloadLines(docs.filter($"id" === 2),
      EsBulk.Config(index = "i", actionType = "create", esVersion = 6,
        indexType = "t", writeNull = true)).as[String].collect()
    assert(lines.head ===
      """{"create":{"_index":"i","_type":"t"}}""" + "\n" +
        """{"id":2,"name":"bob","age":null}""")
  }

  test("metadata lines drop null fields regardless of the session jsonGenerator default") {
    // a session configured with ignoreNullFields=false must not leak
    // {"_id":null} into action metadata (ES rejects the bulk item) — only
    // the DOCUMENT body follows writeNull
    val prior = spark.conf.getOption("spark.sql.jsonGenerator.ignoreNullFields")
    spark.conf.set("spark.sql.jsonGenerator.ignoreNullFields", "false")
    try {
      val lines = EsBulk.payloadLines(docs.filter($"id" === 2),
        EsBulk.Config(index = "i", actionType = "create", writeNull = true))
        .as[String].collect()
      assert(lines.head ===
        """{"create":{"_index":"i"}}""" + "\n" +
          """{"id":2,"name":"bob","age":null}""")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.jsonGenerator.ignoreNullFields", v)
      case None => spark.conf.unset("spark.sql.jsonGenerator.ignoreNullFields")
    }
  }

  test("update wraps doc_as_upsert and never carries version") {
    val lines = EsBulk.payloadLines(docs.filter($"id" === 1),
      EsBulk.Config(index = "i", actionType = "update", idCol = Some("id"),
        versionCol = Some("age"))).as[String].collect()
    assert(lines.head ===
      """{"update":{"_index":"i","_id":"1"}}""" + "\n" +
        """{"doc":{"id":1,"name":"alice","age":30},"doc_as_upsert":true}""")
    // update without an id is rejected (hasID check, :752)
    intercept[IllegalArgumentException] {
      EsBulk.payloadLines(docs, EsBulk.Config(index = "i", actionType = "update"))
    }
  }

  test("version rides as external on index; op='D' rows become delete actions") {
    val cdc = Seq((1L, "alice", 5L, "U"), (2L, "bob", 6L, "D"))
      .toDF("id", "name", "ver", "op")
    val lines = EsBulk.payloadLines(cdc,
      EsBulk.Config(index = "i", idCol = Some("id"), versionCol = Some("ver")))
      .as[String].collect().sorted
    assert(lines(1) ===
      """{"index":{"_index":"i","_id":"1","version":5,"version_type":"external"}}""" + "\n" +
        """{"id":1,"name":"alice","ver":5}""")
    // delete: single metadata line, no doc body (:945-947)
    assert(lines(0) ===
      """{"delete":{"_index":"i","_id":"2","version":6,"version_type":"external"}}""")
  }

  test("response scan surfaces per-item errors behind a 200") {
    val resp = """{"took":3,"errors":true,"items":[
      {"index":{"_index":"i","_id":"1","status":201}},
      {"index":{"_index":"i","_id":"2","status":400,
        "error":{"type":"mapper_parsing_exception","reason":"bad"}}}]}"""
    val errs = EsBulk.scanErrors(resp)
    assert(errs.length === 1)
    assert(errs.head.contains("mapper_parsing_exception"))
    assert(EsBulk.scanErrors("""{"took":1,"errors":false,"items":[]}""") === Nil)
  }

  test("write: batched bodies through the transport, item errors throw") {
    EsBulkSpecState.reset()
    EsBulk.write(docs, EsBulk.Config(index = "i", idCol = Some("id")),
      batchSize = 1) { body =>
      EsBulkSpecState.bodies.add(body)
      """{"errors":false,"items":[]}"""
    }
    import scala.jdk.CollectionConverters._
    val bodies = EsBulkSpecState.bodies.asScala.toSeq
    assert(bodies.length === 2) // batchSize 1 → one body per record
    assert(bodies.forall(_.endsWith("\n"))) // bulk bodies are newline-terminated
    // per-item failure propagates (no retry sleep: transport succeeded)
    val ex = intercept[org.apache.spark.SparkException] {
      EsBulk.write(docs, EsBulk.Config(index = "i", idCol = Some("id")),
        batchSize = 10, retry = BatchedExec.RetryPolicy(retryTimes = 0)) { _ =>
        """{"errors":true,"items":[{"index":{"error":{"reason":"boom"}}}]}"""
      }
    }
    assert(ex.getMessage.contains("bulk item") || Option(ex.getCause).exists(
      _.getMessage.contains("attempts")))
  }
}
