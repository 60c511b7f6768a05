package graft.lambda;

import org.apache.spark.SparkContext;
import org.apache.spark.scheduler.ExternalClusterManager;
import org.apache.spark.scheduler.SchedulerBackend;
import org.apache.spark.scheduler.TaskScheduler;
import org.apache.spark.scheduler.TaskSchedulerImpl;

/**
 * Skeleton of the "Spark on Lambda" custom resource manager (the
 * north-star execution story; full design in LAMBDA.md). Registered via
 * META-INF/services, so {@code --master lambda://<function-name>} is
 * discovered by Spark's ExternalClusterManager SPI.
 *
 * What is real here: master-URL dispatch, task scheduling (Spark's own
 * TaskSchedulerImpl — the component corral hand-rolls as its driver
 * loop, /root/reference/driver.go:129-193), and the task wire protocol
 * ({@link Protocol}). What is intentionally absent in this sandbox: the
 * SchedulerBackend that invokes a FaaS endpoint to launch executors —
 * it requires an AWS/FaaS control plane this environment doesn't have,
 * so it fails fast with a pointer to the design doc rather than
 * pretending. LAMBDA.md 4 specifies its contract (invoke function ->
 * executor dials back -> 15-minute lease decommission -> object-store
 * shuffle), and the protocol payloads it would exchange are the tested
 * types in {@link Protocol}.
 *
 * (Java rather than Scala: the SPI is private[spark] at the Scala
 * level but public in bytecode; implementing it from Java keeps this
 * out-of-tree, the same approach external cluster managers use.)
 */
public final class LambdaClusterManager implements ExternalClusterManager {

  public static final String SCHEME = "lambda://";

  @Override
  public boolean canCreate(String masterURL) {
    return masterURL != null && masterURL.startsWith(SCHEME);
  }

  @Override
  public TaskScheduler createTaskScheduler(SparkContext sc, String masterURL) {
    return new TaskSchedulerImpl(sc);
  }

  @Override
  public SchedulerBackend createSchedulerBackend(
      SparkContext sc, String masterURL, TaskScheduler scheduler) {
    throw new UnsupportedOperationException(
        "lambda:// scheduler backend requires a FaaS endpoint; see LAMBDA.md 4 "
            + "(function name: " + functionName(masterURL) + ")");
  }

  @Override
  public void initialize(TaskScheduler scheduler, SchedulerBackend backend) {
    ((TaskSchedulerImpl) scheduler).initialize(backend);
  }

  /** lambda://my-function => my-function (reference driver flag
   * lambdaFunctionName, /root/reference/driver.go:237). */
  public static String functionName(String masterURL) {
    return masterURL.substring(SCHEME.length());
  }
}
