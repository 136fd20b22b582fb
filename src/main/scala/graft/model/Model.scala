package graft.model

/** Core data model of the engine: the four ADFS state tables as case
  * classes, the version/tombstone algebra, and datanode id packing.
  *
  * Schemas mirror the reference's annotated row classes:
  *  - file:     adfs-hdfs A/file/File.java:30-58
  *  - block:    A/block/Block.java:30-44
  *  - datanode: A/datanode/Datanode.java:30-57
  *  - lease:    A/lease/Lease.java:12-18
  * (paths per SURVEY.md aliases). All integral columns are Long here —
  * uniform 64-bit avoids cross-engine type drift in the differential
  * oracle while preserving semantics.
  */
final case class FileRow(
    id: Long, parentId: Long, name: String, length: Long,
    blockSize: Long, replication: Long, atime: Long, mtime: Long,
    owner: Long, leaseHolder: Option[String], leaseRecoveryTime: Long,
    version: Long) {
  /** length == -1 marks a directory (File.java:144-146). */
  def isDir: Boolean = length == -1L
  /** non-null leaseHolder marks a file under construction (File.java:148-150). */
  def isUnderConstruction: Boolean = leaseHolder.isDefined
}

final case class BlockRow(
    id: Long, datanodeId: Long, length: Long, generationStamp: Long,
    fileId: Long, fileIndex: Long, version: Long) {
  /** length == -1 marks a replica still being written. */
  def isUnderConstruction: Boolean = length == -1L
}

final case class DatanodeRow(
    id: Long, name: String, storageId: String, ipcPort: Long,
    infoPort: Long, capacity: Long, dfsUsed: Long, remaining: Long,
    lastUpdated: Long, xceiverCount: Long, location: String,
    adminState: String, version: Long)

final case class LeaseRow(holder: String, time: Long, version: Long)

/** Version/tombstone algebra
  * (A/distributed/DistributedDataRepositoryBaseOnTable.java:316-330,438-451):
  * positive version = live row, negative = tombstone; abs(version) is the
  * total order used for idempotent latest-wins replay. Pure, property-tested.
  */
object Versions {
  def isLive(v: Long): Boolean = v > 0L
  def tombstone(v: Long): Long = -math.abs(v)
  def order(v: Long): Long = math.abs(v)
  /** Apply `incoming` over `current` iff it is at least as new —
    * insertDirectly/deleteDirectly replay rule (:438-470). */
  def wins(current: Long, incoming: Long): Boolean =
    order(incoming) >= order(current)
}

/** Datanode id packing: id = ip<<32 | port
  * (A/util/IpAddress.java:111-118, A/datanode/Datanode.java:166-172). */
object DatanodeId {
  def pack(ip: String, port: Int): Long = {
    val segs = ip.split('.')
    require(segs.length == 4, s"bad ipv4: $ip")
    val ipInt = segs.foldLeft(0L)((acc, s) => (acc << 8) | (s.toInt & 0xffL))
    (ipInt << 32) | (port & 0xffffffffL)
  }
  def ip(id: Long): String = {
    val ipInt = id >>> 32
    Seq(24, 16, 8, 0).map(sh => (ipInt >> sh) & 0xffL).mkString(".")
  }
  def port(id: Long): Int = (id & 0xffffffffL).toInt
}

/** Lease expiry limits (H/org/apache/hadoop/hdfs/protocol/FSConstants.java:39-40). */
object LeaseLimits {
  val SoftMs: Long = 60L * 1000
  val HardMs: Long = 3600L * 1000
}
