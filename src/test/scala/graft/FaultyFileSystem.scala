package graft

import java.io.IOException
import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}
import org.apache.spark.TaskContext

/** A Hadoop `FileSystem` for the `faulty://` scheme that delegates to
  * the local filesystem but throws on every input-file `open()` made by
  * a FIRST task attempt. Registered test-only (TaskRetrySpec) via
  * `fs.faulty.impl`; a query pointed at `faulty:///root/testdata/...`
  * runs its completely unmodified plan, except that every task that
  * reads input dies once with an injected IOException and is re-run by
  * the scheduler (`local[4,4]` ⇒ spark.task.maxFailures=4).
  *
  * Driver-side calls (file listing, footer schema inference) have no
  * TaskContext and pass through untouched — only genuine task attempts
  * are failed, which is exactly the production event being simulated:
  * executor loss / preemption / fetch-side IO errors on a 1000-executor
  * cluster, where first-attempt failure is routine and the engine's
  * contract is that the retried attempt leaves the RESULT bit-identical.
  */
class FaultyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: URI = URI.create("faulty:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0) {
      FaultyFileSystem.injected.incrementAndGet()
      throw new IOException(
        s"graft injected fault: first-attempt open of $f " +
          s"(stage=${tc.stageId()} partition=${tc.partitionId()})")
    }
    super.open(f, bufferSize)
  }
}

object FaultyFileSystem {
  /** Total injected first-attempt failures (local mode: executors share
    * this JVM, so a plain static counter observes every throw). */
  val injected = new AtomicLong(0L)
}
