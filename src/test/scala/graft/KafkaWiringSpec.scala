package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.{Sinks, Sources}

/** B1/A1 execution check, as far as a broker-less, connector-less sandbox
  * allows: the spark-sql-kafka connector is a DEPLOY-TIME jar
  * (README "Kafka deployment"), so `.load()`/`.start()` cannot complete
  * here — but everything up to provider lookup can and must be proven:
  *
  *  - the writer/reader object carries format `kafka`, the reference's
  *    exact options, append mode, and the single to_json `value` column
  *    (asserted structurally via the writer's own state);
  *  - both paths, when started, fail AT DataSource.lookupDataSource
  *    naming the kafka provider — i.e. the full wiring executes to the
  *    one boundary this environment cannot cross, not before it.
  */
class KafkaWiringSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  // The classic DataStreamWriter keeps its pre-start state in private
  // fields (source/extraOptions/outputMode/ds) — reflection is the only
  // way to observe an un-started writer, and is pinned to the Spark 4.1
  // classic class this build compiles against.
  private def field[A](obj: AnyRef, name: String): A = {
    val f = obj.getClass.getDeclaredField(name)
    f.setAccessible(true)
    f.get(obj).asInstanceOf[A]
  }

  test("kafkaSink writer carries format=kafka, reference options, append mode") {
    val input = MemoryStream[String]
    val w = Sinks.kafkaSink(input.toDF().select(col("value").as("json_str")),
      bootstrap = "broker:9092", topic = "upstox_orderflow",
      checkpoint = "/tmp/graft_ck")
    assert(field[String](w, "source") === "kafka")
    val opts = field[Map[String, String]](w, "extraOptions")
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    assert(opts("topic") === "upstox_orderflow")
    assert(opts("checkpointLocation") === "/tmp/graft_ck")
    assert(field[AnyRef](w, "outputMode").toString.equalsIgnoreCase("append"))
  }

  test("kafkaSink projects the whole row into the single to_json value column") {
    val input = MemoryStream[(Int, String)]
    val w = Sinks.kafkaSink(input.toDF().toDF("a", "b"), "b:9092", "t", "/tmp/ck2")
    val ds = field[org.apache.spark.sql.Dataset[_]](w, "ds")
    assert(ds.schema.fieldNames.toSeq === Seq("value"))
    assert(ds.schema.head.dataType.typeName === "string")
  }

  test("kafka source and sink reach provider resolution, naming the kafka provider") {
    val srcErr = intercept[Exception] {
      Sources.kafka(spark, Sources.kafkaTickOptions("broker:9092", "upstox_ticks"))
    }
    assert(srcErr.getMessage.toLowerCase.contains("kafka"),
           s"source failed before provider lookup: $srcErr")

    val input = MemoryStream[String]
    val sinkErr = intercept[Exception] {
      Sinks.kafkaSink(input.toDF().select(col("value").as("json_str")),
          "broker:9092", "t",
          java.nio.file.Files.createTempDirectory("graft_kafka_ck").toString)
        .start()
    }
    assert(sinkErr.getMessage.toLowerCase.contains("kafka"),
           s"sink failed before provider lookup: $sinkErr")
  }
}
