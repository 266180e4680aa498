package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-anonymity monitor — the per-window twin of
  * [[graft.operators.Privacy.classProfile]], in the StreamCountMin
  * bit-identical family: a class's size is an order-free integer sum
  * and its l-diversity is the cardinality of an order-free set union,
  * so the closed-window class rows are BIT-IDENTICAL to the batch
  * profile over the same window's rows regardless of trigger
  * interleaving, retries, or arrival order (StreamPrivacySpec pins
  * stream ≡ batch). This is the release gate a streaming ingest runs:
  * the window cannot ship until the watermark closes it, and the
  * emitted rows say exactly which QI classes are below k.
  *
  * State per (window, QI class) is ONE counter plus the distinct
  * sensitive-value set — bounded by the sensitive attribute's domain
  * (an enum in every release-gate schema; a high-cardinality
  * "sensitive" column is a modeling error upstream, and the cap makes
  * it loud rather than unbounded).
  */
object StreamPrivacy {

  /** Sensitive-domain guard: distinct sensitive values per class are
    * capped; crossing the cap throws rather than growing state. */
  val MAX_SENSITIVE_DOMAIN = 1024

  final case class Keyed(ts: Timestamp, qi: String, sensitive: String)
  final case class ClassState(n: Long, sens: Set[String])
  final case class ClassRow(window_start: Timestamp,
      window_end: Timestamp, qi: String, class_size: Long, class_l: Long)

  /** Emits each tumbling window's (qi, class_size, class_l) rows once
    * the watermark passes the window end — the exact columns
    * Privacy.classProfile computes in batch.
    */
  def classProfile(records: Dataset[Keyed], windowSeconds: Long,
      watermarkDelay: String)(
      implicit spark: SparkSession): Dataset[ClassRow] = {
    import spark.implicits._
    require(windowSeconds > 0)
    val winMs = windowSeconds * 1000L
    records
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => (Math.floorDiv(r.ts.getTime, winMs) * winMs, r.qi))
      .flatMapGroupsWithState[ClassState, ClassRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((winStart, qi), batch, state: GroupState[ClassState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClassRow(new Timestamp(winStart),
              new Timestamp(winStart + winMs), qi, s.n, s.sens.size.toLong))
          } else {
            var n = state.getOption.map(_.n).getOrElse(0L)
            var sens = state.getOption.map(_.sens).getOrElse(Set.empty[String])
            batch.foreach { r =>
              n += 1
              sens += r.sensitive
              require(sens.size <= MAX_SENSITIVE_DOMAIN,
                s"sensitive domain for class '$qi' exceeded " +
                  s"$MAX_SENSITIVE_DOMAIN distinct values — not an enum")
            }
            state.update(ClassState(n, sens))
            state.setTimeoutTimestamp(winStart + winMs)
            Iterator.empty
          }
      }
  }
}
