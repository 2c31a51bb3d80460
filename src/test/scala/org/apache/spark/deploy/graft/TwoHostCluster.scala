package org.apache.spark.deploy.graft

import org.apache.spark.{SparkConf, SparkContext}
import org.apache.spark.deploy.master.Master
import org.apache.spark.deploy.worker.Worker
import org.apache.spark.rpc.RpcEnv
import org.apache.spark.scheduler.ExecutorDecommissionInfo
import org.apache.spark.scheduler.cluster.CoarseGrainedSchedulerBackend

/** Test-only standalone cluster: one master + two workers in this JVM,
  * each worker bound to a DISTINCT loopback address (127.0.0.1 and
  * 127.0.0.2), each launching a real executor JVM as a child process.
  *
  * Why not `local-cluster[2,...]`: its workers all register under ONE
  * hostname, and the scheduler refuses to place a speculative attempt
  * on a host that already runs an attempt of the same task
  * (TaskSetManager.hasAttemptOnHost guards the speculative dequeue), so
  * under local-cluster a speculative copy can never launch at all. Two
  * distinct loopback hosts make speculation actually schedulable while
  * staying inside one machine. Lives under org.apache.spark.deploy
  * because Master/Worker.startRpcEnvAndEndpoint are private[deploy] —
  * the same bridge pattern as org.apache.spark.shuffle.graft.
  */
object TwoHostCluster {
  private var envs: Seq[RpcEnv] = Nil

  /** Starts master + 2 one-executor workers; returns the master URL. */
  def start(conf: SparkConf, coresPerWorker: Int, memPerWorkerMb: Int,
            workDirRoot: String): String = {
    require(envs.isEmpty, "cluster already running")
    val clusterConf = conf.clone()
      .set("spark.shuffle.service.enabled", "false")
      .set("spark.master.rest.enabled", "false")
    // the tuple's second element is the bound WEB UI port; the master
    // URL uses the RPC env's own bound port (same as LocalSparkCluster)
    val (masterEnv, _, _) =
      Master.startRpcEnvAndEndpoint("127.0.0.1", 0, 0, clusterConf)
    val masterUrl = s"spark://127.0.0.1:${masterEnv.address.port}"
    val workers = Seq("127.0.0.1", "127.0.0.2").zipWithIndex.map { case (host, i) =>
      Worker.startRpcEnvAndEndpoint(host, 0, 0, coresPerWorker, memPerWorkerMb,
        Array(masterUrl), s"$workDirRoot/worker${i + 1}", Some(i + 1),
        clusterConf, None)
    }
    envs = masterEnv +: workers
    masterUrl
  }

  /** Gracefully decommissions one executor (the driver-triggered spot-
    * preemption-with-notice path): the executor stops accepting tasks,
    * migrates its shuffle/RDD blocks to peers, and exits on its own.
    * `decommissionExecutor` is private[spark]; this bridge is why the
    * object lives under org.apache.spark. */
  def decommissionExecutor(sc: SparkContext, executorId: String): Boolean =
    sc.schedulerBackend.asInstanceOf[CoarseGrainedSchedulerBackend]
      .decommissionExecutor(
        executorId, ExecutorDecommissionInfo("test spot-preemption notice"),
        adjustTargetNumExecutors = false)

  def stop(): Unit = {
    // workers first so they kill their executor child processes
    envs.drop(1).foreach(_.shutdown())
    envs.take(1).foreach(_.shutdown())
    envs.foreach(_.awaitTermination())
    envs = Nil
  }
}
