package graft.load

import java.sql.SQLException

/** Typed integrity-error contract of the sink — the reference maps driver
  * integrity errors to typed exceptions by pgcode
  * (`core/insert.py:34-73`: `IntegrityError` -> duplicate-insert /
  * foreign-key error). SQLState class 23 is the SQL-STANDARD integrity
  * class, shared by PostgreSQL and Derby: 23505 = unique violation,
  * 23503 = foreign-key violation — so one mapping serves both the
  * production and the test dialect.
  */
sealed abstract class SinkIntegrityException(
    val table: String, msg: String, cause: SQLException)
  extends RuntimeException(msg, cause)

/** A row violated a unique constraint OTHER than the merge's conflict
  * target (the natural-key constraint is conflict-skipped by design).
  */
final class UniqueViolationException(table: String, cause: SQLException)
  extends SinkIntegrityException(table,
    s"unique-constraint violation loading '$table': ${cause.getMessage}", cause)

/** A child row references a parent key absent from the target table —
  * the load order or key-map remap is wrong.
  */
final class ForeignKeyViolationException(table: String, cause: SQLException)
  extends SinkIntegrityException(table,
    s"foreign-key violation loading '$table': ${cause.getMessage}", cause)

/** Any other class-23 integrity error (not-null, check constraint, ...). */
final class IntegrityViolationException(table: String, cause: SQLException)
  extends SinkIntegrityException(table,
    s"integrity violation loading '$table': ${cause.getMessage}", cause)

object SinkIntegrityException {

  private def sqlExceptions(t: Throwable): Iterator[SQLException] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .collect { case s: SQLException => s }
      // a SQLException also chains peers via getNextException
      .flatMap(s => Iterator.iterate(s)(_.getNextException).takeWhile(_ != null))

  /** Run `body`, translating any SQLState-23xxx failure (direct, wrapped by
    * Spark's executor-side task failure, or chained via getNextException)
    * into the typed exception contract. Non-integrity errors pass through.
    */
  def translate[T](table: String)(body: => T): T =
    try body catch {
      case e: Throwable =>
        val integrity = sqlExceptions(e)
          .find(s => Option(s.getSQLState).exists(_.startsWith("23")))
        integrity match {
          case Some(s) if s.getSQLState == "23505" =>
            throw new UniqueViolationException(table, s)
          case Some(s) if s.getSQLState == "23503" =>
            throw new ForeignKeyViolationException(table, s)
          case Some(s) =>
            throw new IntegrityViolationException(table, s)
          case None => throw e
        }
    }
}
