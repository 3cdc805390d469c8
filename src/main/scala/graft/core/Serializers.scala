package graft.core

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `Serializer` typeclass (reference `Serializer.scala:24-34`:
  * `T → Array[Byte]`, with identity-on-bytes and charset-encoded-string
  * instances) re-expressed as Catalyst column builders: serialization is a
  * codegen'd expression over the row, not a per-element closure, so it runs
  * inside whole-stage codegen on the executors.
  */
object Serializers {

  /** Charset-encoded string payload (reference `Serializer.scala:33`). */
  def stringPayload(c: Column, charset: Charset = StandardCharsets.UTF_8): Column =
    encode(c, charset.name())

  /** Whole-row JSON payload — the engine's default `Serializer[Row]`. */
  def jsonPayload(cols: Column*): Column =
    encode(to_json(struct(cols: _*)), "UTF-8")

  /** Frame a payload by appending the record separator
    * (reference `firehose.scala:59`: `Serializer[T].apply(x) ++ separator`).
    */
  def framed(payload: Column, separator: Array[Byte]): Column =
    concat(payload, lit(separator))

  /** Convenience: serialize + frame a whole row in one expression. */
  def framedRow(separator: Array[Byte], cols: Column*): Column =
    framed(jsonPayload(cols: _*), separator)
}
