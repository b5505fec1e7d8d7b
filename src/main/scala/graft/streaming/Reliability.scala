package graft.streaming

import java.io.IOException
import java.util.concurrent.TimeoutException

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's reliability semantics (SURVEY.md §2.6), re-expressed
  * as a thin layer around sources/sinks — NOT as operators. This module
  * is the reference's value proposition ported to Spark's execution
  * model:
  *
  *  - E2 error classification (temporary vs unrecoverable),
  *    AkkaEnrichmentPipeline.scala:170, FuturesProcessor.scala:76;
  *  - E4 bounded retry combinator, FuturesProcessor.scala:88-106;
  *  - E8 error-as-value stage results,
  *    ErrorHandlingRxEnrichmentPipeline.scala:25-28 — fallible logic
  *    evaluates to a `(value, error)` pair so per-row failures can
  *    never kill the stream (the fix for the reference's documented
  *    fail-fast bug, SimpleRxEnrichmentPipeline.scala:12-15 / E7);
  *  - E6 DLQ routing: split on the error column, main sink + dead
  *    letter sink, both written in the same micro-batch;
  *  - ack/nack (S4/K3): checkpoint offset commit IS the ack — a batch
  *    that fails is replayed wholesale (at-least-once, duplicates
  *    acceptable per README.md:13-17), which is the reference's E5
  *    whole-message retry at batch granularity.
  */
object Reliability {
  /** E2: temporary failures are worth retrying; everything else goes
    * to the DLQ. Mirrors `isTemporaryFailure`. */
  def isTemporary(e: Throwable): Boolean = e match {
    case _: IOException | _: TimeoutException => true
    case _ => false
  }

  /** E4: bounded retry with fixed backoff; short-circuits on
    * unrecoverable errors. Driver-side — retries happen at the
    * action/sink level, never inside an expression. */
  def retry[T](times: Int, backoffMs: Long = 0L)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if isTemporary(e) && attempt < times - 1 =>
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Error-column schema: `STRUCT<clazz, msg, temporary>`, null = ok. */
  val ErrorCol = "error"

  /** E8 result shape: value XOR error, as nullable struct fields. */
  final case class StageError(clazz: String, msg: String, temporary: Boolean)
  final case class StageResult(value: String, error: StageError)

  /** E8: lift a fallible scalar function into an error-as-value UDF
    * producing `STRUCT<value, error STRUCT<clazz,msg,temporary>>`.
    * Used only where logic is genuinely fallible/external — pure
    * enrichment stays as native columns. */
  def fallible(f: String => String): Column => Column = {
    val u = udf { (s: String) =>
      try StageResult(f(s), null)
      catch {
        case e: Throwable =>
          StageResult(null,
            StageError(e.getClass.getName, String.valueOf(e.getMessage),
              isTemporary(e)))
      }
    }
    (c: Column) => u(c)
  }

  /** E3/E4 at row granularity: like [[fallible]] but temporary
    * failures are retried in place up to `attempts` times (the
    * reference's bounded-retry combinator applied per message);
    * unrecoverable failures short-circuit to the error channel. */
  def fallibleWithRetry(f: String => String, attempts: Int)
      : Column => Column = {
    val u = udf { (s: String) =>
      var left = attempts
      var out: StageResult = null
      while (out == null && left > 0) {
        left -= 1
        try out = StageResult(f(s), null)
        catch {
          case e: Throwable if isTemporary(e) && left > 0 => // retry
          case e: Throwable =>
            out = StageResult(null,
              StageError(e.getClass.getName, String.valueOf(e.getMessage),
                isTemporary(e)))
        }
      }
      out
    }
    (c: Column) => u(c)
  }

  /** Daemon pool for [[withTimeout]] — one per JVM (driver or
    * executor), never blocks JVM exit. BOUNDED at 256 threads: a
    * non-interruptible hung call strands its thread for the duration
    * of the hang, and an unbounded pool would let a sustained outage
    * strand one thread per row. When saturated, submission fails fast
    * and is surfaced as a (temporary) timeout, so the retry/DLQ policy
    * applies instead of the executor drowning in threads. */
  private lazy val timeoutPool: java.util.concurrent.ExecutorService = {
    import java.util.concurrent._
    new ThreadPoolExecutor(0, 256, 30L, TimeUnit.SECONDS,
      new SynchronousQueue[Runnable](),
      (r: Runnable) => {
        val t = new Thread(r, "graft-timeout")
        t.setDaemon(true)
        t
      })
  }

  /** E9: per-attempt timeout. Runs `f` on a daemon thread and throws
    * [[TimeoutException]] — classified temporary by [[isTemporary]],
    * so the retry/DLQ policy applies — once `timeoutMs` elapses; the
    * hung attempt is interrupted and abandoned instead of hanging the
    * task forever. Mirrors the reference's per-request
    * `requestTimeout` (AkkaPipelineActors.scala:68); the overall
    * budget (AkkaEnrichmentPipeline.scala:172) is the same wrapper
    * around a whole retry loop, e.g.
    * `withTimeout(60000)(retry(3)(withTimeout(5000)(call)))`. */
  def withTimeout[T](timeoutMs: Long)(f: => T): T = {
    val fut =
      try timeoutPool.submit(new java.util.concurrent.Callable[T] {
        def call(): T = f
      })
      catch {
        case _: java.util.concurrent.RejectedExecutionException =>
          // pool saturated by stranded hung calls — same contract as a
          // timed-out attempt: temporary, retryable, stream survives
          throw new TimeoutException("timeout pool saturated (256 in flight)")
      }
    try fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        fut.cancel(true)
        throw new TimeoutException(s"attempt exceeded ${timeoutMs} ms")
      case e: java.util.concurrent.ExecutionException =>
        throw e.getCause
    }
  }

  /** E9+E8+E4 composed: a fallible external call with a per-attempt
    * timeout, bounded retry on temporary failures (timeouts included),
    * error-as-value result. The full reference reliability stack for
    * one stage. */
  def fallibleWithTimeout(f: String => String, timeoutMs: Long,
      attempts: Int = 1): Column => Column =
    fallibleWithRetry(s => withTimeout(timeoutMs)(f(s)), attempts)

  /** E6: split a DataFrame carrying an error column into (ok, dlq). */
  def split(df: DataFrame, errorCol: String = ErrorCol)
      : (DataFrame, DataFrame) =
    (df.filter(col(errorCol).isNull), df.filter(col(errorCol).isNotNull))

  /** One-pass delivery accounting: tag the pre-split frame with an
    * `Observation` so the ok/dead-lettered/total counts come back as a
    * side effect of the SAME action that writes the batch — the
    * reference's per-message ack/nack ledger
    * (AkkaPipelineActors.scala:144-168) re-expressed without a second
    * scan (at 100 TB, counting with `.count()` after the write doubles
    * the read). Usage: split the returned frame, run the sink action,
    * then read `obs.get` ("n_ok", "n_dlq", "n_total"). */
  def observedSplit(df: DataFrame, errorCol: String = ErrorCol)
      : (DataFrame, DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val tagged = df.observe(obs,
      count(when(col(errorCol).isNull, 1)).as("n_ok"),
      count(when(col(errorCol).isNotNull, 1)).as("n_dlq"),
      count(lit(1)).as("n_total"))
    val (ok, dlq) = split(tagged, errorCol)
    (ok, dlq, obs)
  }

  /** Merge per-stage error columns, first error wins — the reference's
    * `merge(res1, res2)` (ErrorHandlingRxEnrichmentPipeline.scala:31-36,
    * J4) as a single `coalesce`. */
  def mergeErrors(errs: Column*): Column = coalesce(errs: _*)
}
