package graft.lambda

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Serialized unit-of-work protocol for a disaggregated (FaaS) executor
  * backend — corral's Lambda task wire format
  * (`/root/reference/task.go:16-33`, `/root/reference/lambda.go:100-145`)
  * re-expressed as the payload a Spark-on-Lambda cluster manager would
  * exchange with function invocations (design: LAMBDA.md). The JSON
  * field names match Go's `json.Marshal` of the reference structs
  * exactly, so payloads interoperate with a corral-deployed function.
  */
object Protocol {

  sealed abstract class Phase(val id: Int)
  object Phase {
    case object Map extends Phase(0)     // reference task.go:12 MapPhase
    case object Reduce extends Phase(1)  // reference task.go:13 ReducePhase
    def of(id: Int): Phase = id match {
      case 0 => Map
      case 1 => Reduce
      case other => throw new IllegalArgumentException(s"unknown phase: $other")
    }
  }

  /** Contiguous chunk of an input file; offsets inclusive
    * (`/root/reference/split.go:15-19`). */
  final case class InputSplit(filename: String, startOffset: Long, endOffset: Long) {
    def size: Long = endOffset - startOffset + 1
  }

  /** FileSystemType enum (`corfs/filesys.go:12-15`): 0=Local, 1=S3. */
  val FsLocal = 0
  val FsS3 = 1

  final case class TaskSpec(
      jobNumber: Int,
      phase: Phase,
      binId: Long,
      intermediateBins: Long,
      splits: Seq[InputSplit],
      fileSystemType: Int,
      workingLocation: String,
      cleanup: Boolean)

  /** Per-task byte counters returned by the executor
    * (`/root/reference/task.go:30-33`). */
  final case class TaskResult(bytesRead: Long, bytesWritten: Long)

  /** Launch payload for one executor lease — the graft extension to the
    * wire protocol (LAMBDA.md §2's inversion: Spark leases *executors*
    * from the FaaS, where corral ships one *task* per invoke). Field
    * names follow the same Go `json.Marshal` convention as [[TaskSpec]]
    * so a shared function entrypoint can dispatch on payload shape
    * during a corral→graft cutover. */
  final case class ExecutorLease(
      appId: String,
      executorId: String,
      driverUrl: String,
      cores: Int,
      memoryMb: Int,
      leaseSeconds: Int)

  // -- wire encode/decode (Go json.Marshal field names) -----------------

  def toJson(t: TaskSpec): String = JsonMethods.compact(JsonMethods.render(
    JObject(
      "JobNumber" -> JInt(t.jobNumber),
      "Phase" -> JInt(t.phase.id),
      "BinID" -> JInt(BigInt(t.binId)),
      "IntermediateBins" -> JInt(BigInt(t.intermediateBins)),
      "Splits" -> JArray(t.splits.toList.map(s => JObject(
        "Filename" -> JString(s.filename),
        "StartOffset" -> JInt(BigInt(s.startOffset)),
        "EndOffset" -> JInt(BigInt(s.endOffset))))),
      "FileSystemType" -> JInt(t.fileSystemType),
      "WorkingLocation" -> JString(t.workingLocation),
      "Cleanup" -> JBool(t.cleanup))))

  def toJson(r: TaskResult): String = JsonMethods.compact(JsonMethods.render(
    JObject(
      "BytesRead" -> JInt(BigInt(r.bytesRead)),
      "BytesWritten" -> JInt(BigInt(r.bytesWritten)))))

  private def long(v: JValue, field: String): Long = v \ field match {
    case JInt(n) => n.longValue
    case other => throw new IllegalArgumentException(s"bad $field: $other")
  }

  private def str(v: JValue, field: String): String = v \ field match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"bad $field: $other")
  }

  def taskFromJson(json: String): TaskSpec = {
    val v = JsonMethods.parse(json)
    TaskSpec(
      jobNumber = long(v, "JobNumber").toInt,
      phase = Phase.of(long(v, "Phase").toInt),
      binId = long(v, "BinID"),
      intermediateBins = long(v, "IntermediateBins"),
      splits = (v \ "Splits") match {
        case JArray(xs) => xs.map(s =>
          InputSplit(str(s, "Filename"), long(s, "StartOffset"), long(s, "EndOffset")))
        case JNull | JNothing => Nil
        case other => throw new IllegalArgumentException(s"bad Splits: $other")
      },
      fileSystemType = long(v, "FileSystemType").toInt,
      workingLocation = str(v, "WorkingLocation"),
      cleanup = (v \ "Cleanup") == JBool(true))
  }

  def resultFromJson(json: String): TaskResult = {
    val v = JsonMethods.parse(json)
    TaskResult(long(v, "BytesRead"), long(v, "BytesWritten"))
  }

  /** Result payload as it actually arrives OFF THE WIRE from a
    * corral-deployed function: the Go Lambda runtime JSON-marshals the
    * handler's `string` return value, so the bytes are a QUOTED JSON
    * string that the reference unquotes before unmarshalling
    * (`loadTaskResult` + `strconv.Unquote`,
    * `/root/reference/lambda.go:88-99`). Accepts both the quoted wire
    * form and bare JSON, so a graft driver reads either engine's
    * function during a cutover. */
  def resultFromWire(payload: String): TaskResult = {
    val trimmed = payload.trim
    val inner =
      if (trimmed.startsWith("\"")) JsonMethods.parse(trimmed) match {
        case JString(s) => s
        case other => throw new IllegalArgumentException(s"bad wire payload: $other")
      }
      else trimmed
    resultFromJson(inner)
  }

  def toJson(l: ExecutorLease): String = JsonMethods.compact(JsonMethods.render(
    JObject(
      "AppID" -> JString(l.appId),
      "ExecutorID" -> JString(l.executorId),
      "DriverURL" -> JString(l.driverUrl),
      "Cores" -> JInt(l.cores),
      "MemoryMB" -> JInt(l.memoryMb),
      "LeaseSeconds" -> JInt(l.leaseSeconds))))

  def leaseFromJson(json: String): ExecutorLease = {
    val v = JsonMethods.parse(json)
    ExecutorLease(
      appId = str(v, "AppID"),
      executorId = str(v, "ExecutorID"),
      driverUrl = str(v, "DriverURL"),
      cores = long(v, "Cores").toInt,
      memoryMb = long(v, "MemoryMB").toInt,
      leaseSeconds = long(v, "LeaseSeconds").toInt)
  }
}
