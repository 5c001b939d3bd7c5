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

  /** One line per completed doc: id \t base64(output) \t base64(error) —
    * newline-free by construction so the checkpoint is append-safe. */
  private def encodeLine(r: Result): String = {
    val b64 = java.util.Base64.getEncoder
    s"${r.id}\t${b64.encodeToString(r.output.getBytes("UTF-8"))}\t" +
      b64.encodeToString(r.error.getBytes("UTF-8"))
  }

  private def decodeLine(l: String): Option[Result] = {
    val parts = l.split("\t", -1)
    if (parts.length != 3) return None
    val b64 = java.util.Base64.getDecoder
    try Some(Result(parts(0),
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

        // 2. query only unfinished docs, bounded concurrency, chunked writes
        val pending = it.filterNot { case (id, _) => done.contains(id) }
        val fresh = scala.collection.mutable.ArrayBuffer.empty[Result]
        val pool = java.util.concurrent.Executors.newFixedThreadPool(conc)
        try {
          val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
          for (group <- pending.grouped(rpc)) {
            val futures = group.map { case (id, prompt) =>
              scala.concurrent.Future {
                client.generate(prompt) match {
                  case Right(o) => Result(id, o, "")
                  case Left(e) => Result(id, "", e)
                }
              }(ec)
            }
            val results = futures.map(f =>
              scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
            // chunk commit: write to .tmp then rename to .done (atomic on
            // local/posix fs) — a crashed rank leaves no half-counted chunk
            val tmp = new java.io.File(rankDir, f"chunk_$nextChunk%05d.tmp")
            java.nio.file.Files.write(tmp.toPath,
              results.map(encodeLine).mkString("", "\n", "\n").getBytes("UTF-8"))
            tmp.renameTo(new java.io.File(rankDir, f"chunk_$nextChunk%05d.done"))
            nextChunk += 1
            fresh ++= results
          }
        } finally pool.shutdown()

        (done.valuesIterator ++ fresh.iterator).map(r => (r.id, r.output, r.error))
      }(Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING))

    out.toDF(idCol, "inference_output", "inference_error")
  }
}
