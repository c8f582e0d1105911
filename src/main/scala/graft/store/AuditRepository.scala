package graft.store

import graft.pipeline.JobStep

/** Driver-side CSV audit sinks — the reference's JobStepRepository and
  * ErrorRepository (diamond/store/JobStepRepository.scala:15-38,
  * diamond/store/ErrorRepository.scala:16-39; row shapes
  * diamond/models/JobStep.scala:9-15, Errors.scala:11-16).
  *
  * These persist run audit, not data: a handful of rows per pipeline run,
  * written with java.nio like [[FeatureRepository]]. The timestamp is the
  * caller's `processTime` (the library's deterministic process-time
  * threading, SURVEY §7.1) rather than a wall clock read at save time. */
object AuditRepository {
  private def esc(s: String) =
    if (s.contains(",") || s.contains("\"") || s.contains("\n"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def write(path: String, lines: Seq[String]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes("UTF-8"))

  private def read(path: String): Seq[Seq[String]] =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
      .split("\n").toSeq.drop(1).filter(_.nonEmpty)
      .map(FeatureRepository.splitLine)

  /** Save a pipeline run's [[JobStep]] audit. Row shape mirrors the
    * reference's `stepName, status, ts, message`. */
  def saveSteps(path: String, steps: Seq[JobStep], processTime: String): Unit =
    write(path, "stepName,status,ts,message" +:
      steps.map(s => Seq(esc(s.name),
        if (s.ok) "completed" else "failed",
        processTime, esc(s.detail)).mkString(",")))

  def loadSteps(path: String): Seq[(String, String, String, String)] =
    read(path).map(c => (c(0), c(1), c(2), c.lift(3).getOrElse("")))

  /** One quarantined row: which step rejected it, why, and the row's
    * string rendering (reference TransformationError carried the Row). */
  case class RowError(stepName: String, errorType: String, message: String,
      row: Seq[String])

  /** Save quarantined-row errors. Row shape mirrors the reference's
    * `stepName, ts, errorType, message, <row values…>`. */
  def saveErrors(path: String, errors: Seq[RowError], processTime: String): Unit =
    write(path, "stepName,ts,errorType,message,row" +:
      errors.map(e => (Seq(esc(e.stepName), processTime, esc(e.errorType),
        esc(e.message)) ++ e.row.map(esc)).mkString(",")))

  def loadErrors(path: String): Seq[RowError] =
    read(path).map(c =>
      RowError(c(0), c(2), c(3), c.drop(4)))
}
