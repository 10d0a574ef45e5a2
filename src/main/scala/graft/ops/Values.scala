package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** The reference's expression IR: four value kinds plus NULL, lowered to SQL
  * text in `sql_value` (reference `lib/etl/loading.rb:101-132`). Here the same
  * ADT lowers to a Catalyst [[Column]], so Catalyst constant-folds literals and
  * codegens expressions instead of splicing strings.
  */
sealed trait ValueSpec

object ValueSpec {

  /** Column reference, optionally table-qualified (`sta.col`) — reference
    * `loading.rb:112-118`. The qualifier resolves against a DataFrame alias.
    */
  final case class ColRef(name: String, table: Option[String] = None) extends ValueSpec

  /** Quoted string literal — reference `loading.rb:120-121`. */
  final case class Str(value: String) extends ValueSpec

  /** Numeric literal spliced verbatim — reference `loading.rb:122`. */
  final case class Num(value: Double) extends ValueSpec

  /** Raw SQL expression spliced verbatim — reference `loading.rb:123`.
    * Parsed by Catalyst's SQL parser, not string-spliced into a statement.
    */
  final case class Sql(sql: String) extends ValueSpec

  /** Date literal in the reference's `STR_TO_DATE(v,'%d.%m.%Y')` encoding —
    * reference `loading.rb:125-126`. MySQL `%d.%m.%Y` == Spark `d.M.yyyy`.
    */
  final case class DateLit(value: String, format: String = "d.M.yyyy") extends ValueSpec

  /** SQL NULL — reference `loading.rb:110-111`. Carries a concrete type
    * because columnar sinks (parquet) cannot store the untyped NULL the
    * reference's textual SQL could.
    */
  final case class Null(dataType: DataType = StringType) extends ValueSpec

  /** Lower a ValueSpec to a Catalyst Column. */
  def toColumn(v: ValueSpec): Column = v match {
    case ColRef(n, Some(t)) => col(s"$t.$n")
    case ColRef(n, None)    => col(n)
    case Str(s)             => lit(s)
    case Num(n)             => if (n == n.floor && !n.isInfinite) lit(n.toLong) else lit(n)
    case Sql(s)             => expr(s)
    case DateLit(s, f)      => to_date(lit(s), f)
    case Null(dt)           => lit(null).cast(dt)
  }

  /** Convenience implicit-free constructors for mapping literals. */
  def col_(name: String): ValueSpec                 = ColRef(name)
  def qcol(table: String, name: String): ValueSpec  = ColRef(name, Some(table))
}
