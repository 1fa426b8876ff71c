package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}

/** Poison-row handling (SURVEY.md §2.10 error-handling row). The
  * reference logs-and-skips per-row upsert failures ("Continuing…",
  * stream.rs:81-131); the Spark restatement keeps the skip semantics
  * but makes the skipped rows a first-class OUTPUT: a per-row transform
  * that may throw is wrapped in Try inside one mapPartitions pass, and
  * the result forks into the clean dataset and a quarantine dataset
  * carrying the original row plus the error — nothing is silently
  * dropped, failures are queryable, and a replay job can re-drive the
  * quarantine table after a fix.
  *
  * One pass, no driver involvement; cache/persist the [[tryMap]] result
  * before reading both forks or the transform runs twice. */
object Quarantine {

  final case class Result[T, U](ok: Option[U], raw: Option[T], error: Option[String])

  /** Apply `f` per row, capturing throws instead of failing the task. */
  def tryMap[T, U](ds: Dataset[T], f: T => U)(
      implicit e: Encoder[Result[T, U]]): Dataset[Result[T, U]] =
    ds.mapPartitions(_.map { t =>
      try Result[T, U](Some(f(t)), None, None)
      catch {
        case scala.util.control.NonFatal(ex) =>
          Result[T, U](None, Some(t), Some(s"${ex.getClass.getSimpleName}: ${ex.getMessage}"))
      }
    })

  /** The clean fork. */
  def ok[T, U](r: Dataset[Result[T, U]])(implicit e: Encoder[U]): Dataset[U] =
    r.filter((x: Result[T, U]) => x.ok.isDefined).map(_.ok.get)

  /** The quarantine fork: (original row, error message). */
  def quarantined[T, U](r: Dataset[Result[T, U]])(
      implicit e: Encoder[(T, String)]): Dataset[(T, String)] =
    r.filter((x: Result[T, U]) => x.error.isDefined).map(x => (x.raw.get, x.error.get))
}
