package graft.core

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** Metadata describing a delivery stream (the engine's analog of
  * `DeliveryStreamDescription`). */
final case class StreamInfo(
    name: String,
    destination: String,
    encrypted: Boolean,
    tags: Map[String, String])

/** Delivery-stream control plane — the engine's mirror of the reference's
  * Firehose control-plane surface (reference `Firehose.scala:36-56`:
  * create/delete/describe/list, tags, encryption toggle, destination
  * update), with the reference's 404→`None` semantics
  * (`ErrorUtils.scala:28-33`) expressed as `Option`-returning operations.
  *
  * Thread-safe in-memory registry: on a cluster this state would live in the
  * metastore (`spark.catalog` table properties); locally a concurrent map
  * keeps the semantics exact and testable.
  */
final class DeliveryCatalog {

  private val streams = new ConcurrentHashMap[String, StreamInfo]()

  /** R10: create; error if it already exists (Firehose semantics). */
  def createStream(name: String, destination: String = "direct"): StreamInfo = {
    val info = StreamInfo(name, destination, encrypted = false, tags = Map.empty)
    val prev = streams.putIfAbsent(name, info)
    require(prev == null, s"delivery stream already exists: $name")
    info
  }

  /** R11: delete; 404→None. */
  def deleteStream(name: String): Option[StreamInfo] =
    Option(streams.remove(name))

  /** R12: describe; 404→None. */
  def describeStream(name: String): Option[StreamInfo] =
    Option(streams.get(name))

  /** R13: list stream names (sorted for determinism). */
  def listStreams(): Seq[String] = streams.keySet().asScala.toSeq.sorted

  /** R14: list tags; 404→None. */
  def listTags(name: String): Option[Map[String, String]] =
    describeStream(name).map(_.tags)

  /** R15: set tags; 404→None. */
  def tag(name: String, tags: Map[String, String]): Option[StreamInfo] =
    update(name)(i => i.copy(tags = i.tags ++ tags))

  /** R15: remove tags by key; 404→None. */
  def untag(name: String, keys: Seq[String]): Option[StreamInfo] =
    update(name)(i => i.copy(tags = i.tags -- keys))

  /** R16: encryption toggles; 404→None. */
  def startStreamEncryption(name: String): Option[StreamInfo] =
    update(name)(_.copy(encrypted = true))
  def stopStreamEncryption(name: String): Option[StreamInfo] =
    update(name)(_.copy(encrypted = false))

  /** R17: repoint the destination; 404→None. */
  def updateDestination(name: String, destination: String): Option[StreamInfo] =
    update(name)(_.copy(destination = destination))

  /** R9 (`streamAsResource`, reference `FirehoseOps.scala:32-40`): bracketed
    * lifecycle — create on acquire, always delete on release (release 404
    * tolerated). */
  def withStream[A](name: String, destination: String = "direct")(
      use: StreamInfo => A): A = {
    val info = createStream(name, destination)
    try use(info)
    finally deleteStream(name)
  }

  private def update(name: String)(f: StreamInfo => StreamInfo): Option[StreamInfo] =
    Option(streams.computeIfPresent(name, (_, v) => f(v)))
}
