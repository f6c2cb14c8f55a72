package graft.ingest

import scala.util.control.NonFatal

/** One orchestration stage: a name and a thunk. Mirrors one Airflow
  * task in the reference's DAG chain. */
final case class Stage(name: String, run: () => Unit)

final case class StageResult(name: String, status: String, attempts: Int, error: Option[String])

/** In-process sequential orchestrator (SURVEY §2.7 C8; reference
  * parent_dag.py:21-44 parent → ingestion → transforms chain,
  * retries=1 per task per pyspark_dag.py/bq_dag.py default_args).
  *
  * Stages run strictly in order — the reference's DAG is a straight
  * chain (init → ingest hospitals → bronze → silver → gold), so a
  * Seq is the whole dependency graph. Each stage gets `retries`
  * re-attempts; a stage that exhausts them halts the run (downstream
  * stages are skipped, as Airflow would skip downstream tasks).
  */
object PipelineRunner {

  def run(stages: Seq[Stage], logger: PipelineLogger, retries: Int = 1): Seq[StageResult] = {
    val results = Vector.newBuilder[StageResult]
    var halted = false
    for (stage <- stages) {
      if (halted) {
        results += StageResult(stage.name, "SKIPPED", 0, None)
      } else {
        var attempt = 0
        var done = false
        var lastErr: Option[String] = None
        while (!done && attempt <= retries) {
          attempt += 1
          try {
            logger.info(s"Stage started (attempt $attempt)", stage.name)
            stage.run()
            logger.success("Stage completed", stage.name)
            done = true
          } catch {
            case NonFatal(e) =>
              lastErr = Some(e.toString)
              logger.error("Stage failed", stage.name, "", e.toString)
          }
        }
        if (done) results += StageResult(stage.name, "SUCCESS", attempt, None)
        else {
          results += StageResult(stage.name, "FAILED", attempt, lastErr)
          halted = true
        }
      }
    }
    logger.flush()
    results.result()
  }
}
