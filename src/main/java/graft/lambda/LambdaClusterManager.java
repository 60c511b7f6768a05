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
 * loop, /root/reference/driver.go:129-193), the task wire protocol
 * ({@link Protocol}), and the scheduler backend
 * (org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend)
 * that leases executors from a FaaS endpoint through the
 * {@link FaasClient} seam. {@code lambda://local-sim} runs against the
 * in-sandbox simulator ({@link LocalProcessFaasClient}: one fresh JVM
 * process per invocation, hosting an executor that dials back to the
 * driver — LAMBDA.md 4's lease contract end to end). Any other function
 * name resolves through the F20 self-deploy path ({@link FaasDeploy}):
 * the driver deploys its own code package to the configured control
 * plane on start (corral's deploy-on-start, /root/reference/driver.go:185-187)
 * and every invocation runs the DEPLOYED package rather than the
 * driver's classpath; without a configured control plane it fails fast
 * with a pointer to the design doc rather than pretending.
 *
 * (Java rather than Scala: the SPI is private[spark] at the Scala
 * level but public in bytecode; implementing it from Java keeps this
 * out-of-tree, the same approach external cluster managers use.)
 */
public final class LambdaClusterManager implements ExternalClusterManager {

  public static final String SCHEME = "lambda://";

  /** Function name running the local FaaS simulator (one JVM process
   * per invocation) instead of a remote endpoint. */
  public static final String LOCAL_SIM = "local-sim";

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
    String function = functionName(masterURL);
    if (LOCAL_SIM.equals(function)) {
      return new org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend(
          (TaskSchedulerImpl) scheduler, sc, function, new LocalProcessFaasClient());
    }
    // A named function resolves against a deployed package through the
    // control-plane seam (F20: deploy-on-start like corral's run(),
    // /root/reference/driver.go:185-187) — invocations then execute the
    // DEPLOYED code, not the driver's classpath. Fails loud (inside
    // clientFor) when no control plane is configured.
    return new org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend(
        (TaskSchedulerImpl) scheduler, sc, function,
        FaasDeploy.clientFor(sc.getConf(), function));
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
