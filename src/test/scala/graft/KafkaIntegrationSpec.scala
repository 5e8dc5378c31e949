package graft

import org.apache.spark.sql.functions._

/** Integration scaffold for the source factory's kafka branch
  * (Streams.eventsSource, format = "kafka").
  *
  * The spark-sql-kafka connector and a broker are not available in the
  * offline sandbox, so the integration test is gated on
  * `GRAFT_KAFKA_BOOTSTRAP` (host:port of a reachable broker; topic via
  * `GRAFT_KAFKA_TOPIC`, default `graft-events`) and cancels cleanly when
  * unset. A networked deployment proves the branch with NO code changes:
  *
  *   GRAFT_KAFKA_BOOTSTRAP=localhost:9092 sbt "testOnly graft.KafkaIntegrationSpec"
  *
  * against any broker (an embedded/testcontainers single-node broker is
  * enough — the branch only needs `kafka.bootstrap.servers` + `subscribe`),
  * with JSON events payloads matching Streams.eventsSchema on the topic.
  *
  * What IS asserted offline: the branch is wired through the real kafka
  * DataSource lookup — without the connector jar it must fail with
  * Spark's data-source-not-found error (not silently fall back), pinning
  * that the factory reaches the classpath boundary, nothing less.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
  private val topic = sys.env.getOrElse("GRAFT_KAFKA_TOPIC", "graft-events")

  test("kafka branch reaches the DataSource lookup (offline: clear failure)") {
    assume(bootstrap.isEmpty, "broker configured — covered by the live test")
    val err = intercept[Exception] {
      graft.streaming.Streams.eventsSource(spark, "kafka",
        options = Map("kafka.bootstrap.servers" -> "localhost:9092",
          "subscribe" -> topic))
    }
    val msg = s"${err.getClass.getName}: ${err.getMessage}"
    assert(msg.toLowerCase.contains("kafka"),
      s"expected the kafka DataSource lookup to be the failure point: $msg")
  }

  test("kafka events round-trip through the factory (live broker only)") {
    assume(bootstrap.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=host:port (and optionally " +
        "GRAFT_KAFKA_TOPIC) to run the live integration test")
    val src = graft.streaming.Streams.eventsSource(spark, "kafka",
      options = Map("kafka.bootstrap.servers" -> bootstrap.get,
        "subscribe" -> topic, "startingOffsets" -> "earliest"))
    val q = src.groupBy("event_type").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("kafka_events_it").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM kafka_events_it").collect()
      assert(rows.nonEmpty, "expected at least one event on the topic")
      assert(rows.forall(_.getLong(1) > 0))
    } finally q.stop()
  }
}
