package graft.lambda

import org.scalatest.funsuite.AnyFunSuite

class LambdaProtocolSpec extends AnyFunSuite {
  import Protocol._

  private val task = TaskSpec(
    jobNumber = 1,
    phase = Phase.Map,
    binId = 7,
    intermediateBins = 64,
    splits = Seq(
      InputSplit("s3://bucket/input/part-0", 0L, 104857599L),
      InputSplit("s3://bucket/input/part-0", 104857600L, 128000000L)),
    fileSystemType = FsS3,
    workingLocation = "s3://bucket/work",
    cleanup = true)

  test("task spec round-trips through the wire format") {
    val back = taskFromJson(toJson(task))
    assert(back == task)
    assert(back.splits.head.size == 104857600L)
  }

  test("wire format uses corral's exact field names (task.go:16-33)") {
    val json = toJson(task)
    for (f <- Seq("JobNumber", "Phase", "BinID", "IntermediateBins",
        "Splits", "Filename", "StartOffset", "EndOffset",
        "FileSystemType", "WorkingLocation", "Cleanup"))
      assert(json.contains("\"" + f + "\""), s"missing field $f in $json")
  }

  test("decodes a Go-marshaled payload (golden)") {
    // exactly what Go's json.Marshal(task{...}) emits for a reduce task
    val golden =
      """{"JobNumber":0,"Phase":1,"BinID":3,"IntermediateBins":0,""" +
        """"Splits":null,"FileSystemType":1,"WorkingLocation":"s3://b/w","Cleanup":false}"""
    val t = taskFromJson(golden)
    assert(t.phase == Phase.Reduce && t.binId == 3 && t.splits.isEmpty &&
      t.fileSystemType == FsS3 && !t.cleanup)
  }

  test("task result round-trips and matches lambda.go:38-46's shape") {
    val r = TaskResult(bytesRead = 123456789L, bytesWritten = 987654321L)
    assert(resultFromJson(toJson(r)) == r)
    assert(toJson(r) == """{"BytesRead":123456789,"BytesWritten":987654321}""")
  }

  test("cluster manager is discovered via the SPI and dispatches on lambda://") {
    import scala.jdk.CollectionConverters._
    // the SPI trait is private[spark] to Scala sources; load reflectively
    // (exactly what Spark's own getClusterManager does via ServiceLoader)
    val spi = Class.forName("org.apache.spark.scheduler.ExternalClusterManager")
    val loader = java.util.ServiceLoader.load(spi).asScala
    val cm = loader.collectFirst { case m: LambdaClusterManager => m }
    assert(cm.isDefined, "LambdaClusterManager not registered in META-INF/services")
    assert(cm.get.canCreate("lambda://wordcount-fn"))
    assert(!cm.get.canCreate("local[4]"))
    assert(!cm.get.canCreate("spark://host:7077"))
    assert(LambdaClusterManager.functionName("lambda://wordcount-fn") == "wordcount-fn")
  }

  test("result payload unquotes the Go-runtime wire form (lambda.go:88-99)") {
    // the Go Lambda runtime marshals the handler's `string` return, so
    // the wire bytes are a QUOTED JSON string — exactly what
    // json.Marshal produces for prepareResult's output
    val wire = "\"{\\\"BytesRead\\\":123,\\\"BytesWritten\\\":456}\""
    assert(Protocol.resultFromWire(wire) == Protocol.TaskResult(123L, 456L))
    // bare JSON (a non-Go function, or a local path) parses too
    assert(Protocol.resultFromWire("""{"BytesRead":1,"BytesWritten":2}""") ==
      Protocol.TaskResult(1L, 2L))
    // malformed wire bytes fail loud (parse error), not silently zero
    intercept[Exception](Protocol.resultFromWire("\"oops"))
  }

  test("a named function without a control plane fails fast (F20 path)") {
    // any non-local-sim function resolves through self-deploy; with no
    // control plane configured that must fail loud, naming both the
    // missing key and the local-sim alternative
    val e = intercept[IllegalArgumentException](
      FaasDeploy.clientFor(new org.apache.spark.SparkConf(false), "fn"))
    assert(e.getMessage.contains(FaasDeploy.ControlPlaneDirKey))
    assert(e.getMessage.contains("local-sim"))
    assert(e.getMessage.contains("LAMBDA.md"))
  }
}
