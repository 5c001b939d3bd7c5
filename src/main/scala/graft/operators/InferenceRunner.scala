package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Spark-native reimplementation of the reference's inference harness
  * (inference/run_inference.py:1-756): build a query per document, submit
  * with bounded concurrency, write results through per-rank CHUNKED
  * checkpoint files, and on rerun resume by replaying completed chunks
  * instead of re-querying the model.
  *
  * The actual model call is a seam (`InferenceClient`): the reference
  * targets OpenAI-compatible vLLM/SGLang endpoints, which need GPUs and
  * network — both absent here — so the shipped client is a clearly-marked
  * deterministic STUB. Everything Spark-side (per-partition chunking,
  * bounded concurrency, resume-from-checkpoint, error capture) is real and
  * tested; swap the stub for an HTTP client without touching the runner.
  */
trait InferenceClient extends Serializable {
  /** Right(completion) or Left(error message) — mirrors
    * InferenceSuccess/InferenceError (run_inference.py:37-63). */
  def generate(prompt: String): Either[String, String]
}

/** STUB — not a model. Deterministic transform so the distributed plumbing
  * is testable offline. */
final class StubInferenceClient extends InferenceClient {
  def generate(prompt: String): Either[String, String] =
    Right(s"echo:${prompt.take(64)}:${prompt.length}")
}

final case class InferenceRunnerConfig(
    recordsPerChunk: Int = 6000, // run_inference.py:192
    maxConcurrent: Int = 4)      // bounded in-flight queries per rank

object InferenceRunner {

  private final case class Result(id: String, output: String, error: String)

  /** One line per completed doc: all three fields base64 (ids are
    * free-form strings — a raw id containing a tab or newline would
    * corrupt the line and silently drop the doc from replay). */
  private def encodeLine(r: Result): String = {
    val b64 = java.util.Base64.getEncoder
    Seq(r.id, r.output, r.error)
      .map(v => b64.encodeToString(v.getBytes("UTF-8"))).mkString("\t")
  }

  private def decodeLine(l: String): Option[Result] = {
    val parts = l.split("\t", -1)
    if (parts.length != 3) return None
    val b64 = java.util.Base64.getDecoder
    try Some(Result(
      new String(b64.decode(parts(0)), "UTF-8"),
      new String(b64.decode(parts(1)), "UTF-8"),
      new String(b64.decode(parts(2)), "UTF-8")))
    catch { case _: IllegalArgumentException => None }
  }

  /** Run inference over (idCol, promptCol): returns (id, inference_output,
    * inference_error) rows. Completed chunks under
    * `checkpointDir/<partition>/chunk_<k>.done` are replayed without
    * touching the client; only unfinished docs are queried, and their
    * results append to new chunks. The partitioning must be deterministic
    * between runs for resume to apply (same contract as the reference's
    * rank files). */
  def run(df: DataFrame, idCol: String, promptCol: String,
          client: InferenceClient, checkpointDir: String,
          cfg: InferenceRunnerConfig = InferenceRunnerConfig()): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.TaskContext
    val rpc = cfg.recordsPerChunk
    val conc = math.max(1, cfg.maxConcurrent)

    val out = df
      .select(col(idCol).cast("string"), col(promptCol).cast("string"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val rankDir = new java.io.File(checkpointDir, f"$pid%05d")
        rankDir.mkdirs()

        // 1. replay completed chunks (parse_existing_checkpoints)
        val done = scala.collection.mutable.LinkedHashMap.empty[String, Result]
        val chunkFiles = Option(rankDir.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.matches("chunk_\\d+\\.done")).sortBy(_.getName)
        for (f <- chunkFiles;
             l <- java.nio.file.Files.readAllLines(f.toPath).toArray(Array.empty[String]);
             r <- decodeLine(l))
          done.put(r.id, r)
        var nextChunk = chunkFiles.length

        // 2. query only unfinished docs, bounded concurrency, chunked
        // writes — emitted LAZILY per chunk so heap stays O(recordsPerChunk)
        // regardless of partition size (the reference harness targets
        // millions of docs per rank; chunking exists for exactly this)
        val pending = it.filterNot { case (id, _) => done.contains(id) }
        // per-rank telemetry (≙ run_inference.py:390,466-500): lifetime +
        // recent rates and queue gauges, logged once per chunk commit
        val metrics = new MetricsKeeper()
        val queues = new QueueSizesKeeper()
        val freshIt: Iterator[Result] = pending.grouped(rpc).flatMap { group =>
          queues.changeQueues(Map("waiting_requests" -> group.size.toLong))
          // a small pool per chunk (negligible next to model-call latency)
          // avoids holding a pool open across lazy iterator consumption
          val pool = java.util.concurrent.Executors.newFixedThreadPool(conc)
          val results =
            try {
              val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
              val futures = group.map { case (id, prompt) =>
                scala.concurrent.Future {
                  // a client that THROWS (network timeout, bad response) is
                  // captured per-doc like the reference's InferenceError —
                  // it must not kill the task and re-query the whole chunk
                  try client.generate(prompt) match {
                    case Right(o) => Result(id, o, "")
                    case Left(e) => Result(id, "", e)
                  } catch {
                    case scala.util.control.NonFatal(e) =>
                      Result(id, "", s"${e.getClass.getSimpleName}: ${e.getMessage}")
                  }
                }(ec)
              }
              futures.map(f =>
                scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
            } finally pool.shutdown()
          // chunk commit: write .tmp, ATOMIC_MOVE to .done — a crashed rank
          // leaves no half-counted chunk, and a failed move fails LOUDLY
          // instead of silently re-querying the chunk on every resume
          val tmp = new java.io.File(rankDir, f"chunk_$nextChunk%05d.tmp")
          java.nio.file.Files.write(tmp.toPath,
            results.map(encodeLine).mkString("", "\n", "\n").getBytes("UTF-8"))
          java.nio.file.Files.move(tmp.toPath,
            new java.io.File(rankDir, f"chunk_$nextChunk%05d.done").toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          nextChunk += 1
          // the client returns no token usage (that's HTTP-response shape);
          // docs + output chars are the honest equivalents of the
          // reference's tokens_input/tokens_output counters
          metrics.addMetrics(
            "docs_completed" -> results.count(_.error.isEmpty).toLong,
            "docs_errored" -> results.count(_.error.nonEmpty).toLong,
            "chars_output" -> results.map(_.output.length.toLong).sum)
          queues.changeQueues(Map("waiting_requests" -> -group.size.toLong))
          Console.err.println(
            s"[graft.InferenceRunner rank=$pid chunk=${nextChunk - 1}]\n$metrics")
          results
        }

        (done.valuesIterator ++ freshIt).map(r => (r.id, r.output, r.error))
      }(Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING))

    out.toDF(idCol, "inference_output", "inference_error")
  }
}
