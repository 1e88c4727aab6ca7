package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Artificial-time-token ("ATT") functions.
 *
 * The reference implements these as Python UDFs (F1–F5 in SURVEY §2.9;
 * /root/reference/src/cehrbert_data/decorators/patient_event_decorator_base.py:93-152,
 * vectorized copy at utils/spark_utils.py:956-959). A Python UDF breaks
 * whole-stage codegen and pays a serialization round-trip per batch; here each
 * token is a pure `Column` expression (`when`/`floor`/`ceil`/`concat`), so it
 * inlines into codegen and costs nothing extra at 100 TB.
 *
 * Exact boundary semantics preserved:
 *  - cehrBert: d<0 → "W-1"; d<28 → "W"+floor(d/7); d<360 → "M"+floor(d/30); else "LT"
 *  - day:      d<1080 → "D"+d else "LT"
 *  - week:     d<1080 → "W"+floor(d/7) else "LT"
 *  - month:    d<1080 → "M"+floor(d/30) else "LT"
 *  - mix:      d<=7 → "D"+d; d<=30 → "W"+ceil(d/7); d<=360 → "M"+ceil(d/30); else "LT"
 */
object TimeTokens {

  /** ATT type ADT — reference AttType enum + get_att_function dispatch
    * (patient_event_decorator_base.py:155-170). */
  sealed trait AttType
  object AttType {
    case object CehrBert extends AttType
    case object Day extends AttType
    case object Week extends AttType
    case object Month extends AttType
    case object Mix extends AttType
    case object None extends AttType

    def fromName(s: String): AttType = s.toLowerCase match {
      case "cehr_bert" | "cehrbert" => CehrBert
      case "day"                    => Day
      case "week"                   => Week
      case "month"                  => Month
      case "mix"                    => Mix
      case "none"                   => None
      case other => throw new IllegalArgumentException(s"unknown att type: $other")
    }
  }

  private def num(c: Column): Column = c.cast("long")
  /** Reference token functions return None for a missing delta
    * (patient_event_decorator_base.py:94-95 etc.); a bare when-chain would
    * fall through to the "LT" otherwise on null instead. */
  private def nullGuard(d: Column, expr: Column): Column =
    when(d.isNull, lit(null).cast("string")).otherwise(expr)
  private def tok(prefix: String, n: Column): Column =
    concat(lit(prefix), n.cast("long").cast("string"))

  /** F1 `time_token_func` (patient_event_decorator_base.py:93-102). */
  def cehrBertToken(days: Column): Column = {
    val d = num(days)
    nullGuard(d, when(d < 0, lit("W-1"))
      .when(d < 28, tok("W", floor(d / 7)))
      .when(d < 360, tok("M", floor(d / 30)))
      .otherwise(lit("LT")))
  }

  /** F2 `time_day_token` (:105-110). */
  def dayToken(days: Column): Column = {
    val d = num(days)
    nullGuard(d, when(d < 1080, tok("D", d)).otherwise(lit("LT")))
  }

  /** F3 `time_week_token` (:113-118). */
  def weekToken(days: Column): Column = {
    val d = num(days)
    nullGuard(d, when(d < 1080, tok("W", floor(d / 7))).otherwise(lit("LT")))
  }

  /** F4 `time_month_token` (:121-126). */
  def monthToken(days: Column): Column = {
    val d = num(days)
    nullGuard(d, when(d < 1080, tok("M", floor(d / 30))).otherwise(lit("LT")))
  }

  /** F5 `time_mix_token` (:129-152). */
  def mixToken(days: Column): Column = {
    val d = num(days)
    nullGuard(d, when(d <= 7, tok("D", d))
      .when(d <= 30, tok("W", ceil(d.cast("double") / 7)))
      .when(d <= 360, tok("M", ceil(d.cast("double") / 30)))
      .otherwise(lit("LT")))
  }

  /** F6 dispatch (:155-170). */
  def token(att: AttType, days: Column): Column = att match {
    case AttType.CehrBert => cehrBertToken(days)
    case AttType.Day      => dayToken(days)
    case AttType.Week     => weekToken(days)
    case AttType.Month    => monthToken(days)
    case AttType.Mix      => mixToken(days)
    case AttType.None     => lit(null).cast("string")
  }

  /** Inpatient hour-gap token "i-H<n>" (artificial_time_token_decorator.py:320-323). */
  def hourToken(hours: Column): Column = tok("i-H", num(hours))

  /** Inpatient day-att prefix "i-" + token (artificial_time_token_decorator.py:352,385). */
  def inpatientToken(att: AttType, days: Column): Column =
    concat(lit("i-"), token(att, days))
}
