package graft.formats

import java.io.{FileInputStream, FileOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import ProtoSchema.PSchemaSet

/** Protobuf schema registry (reference: src/proto_index.rs +
  * src/config.rs). Mirrors the reference's operations:
  *
  *  - `add(schema, base)`: copy a .proto into `<data>/proto/…`
  *    preserving the base-relative path (proto_index.rs:10-28;
  *    namespacing doc/protobuf.md:12-34);
  *  - descriptor compilation over every .proto under `proto/` with an
  *    mtime-keyed cache — recompile iff any .proto is newer than the cache
  *    (proto_index.rs:41, 75-94). Where the reference shells out to
  *    `protoc` (proto_index.rs:54-61), graft compiles in-process with
  *    ProtoSchema.parse — no subprocess boundary on a cluster;
  *  - base-dir override via GRAFT_SYSTEM_DIR (reference RQ_SYSTEM_DIR,
  *    config.rs:14-36).
  */
final class ProtoRegistry(baseDir: Path) {

  def this() = this(ProtoRegistry.defaultDir)

  private val protoDir = baseDir.resolve("proto")
  private val cacheFile = baseDir.resolve("descriptor-cache.bin")

  /** Copy `schema` into the registry, preserving its path relative to
    * `base` (default: just the file name).
    */
  def add(schema: Path, base: Option[Path] = None): Path = {
    val rel = base match {
      case Some(b) => b.toAbsolutePath.relativize(schema.toAbsolutePath)
      case None => schema.getFileName
    }
    val target = protoDir.resolve(rel.toString)
    Files.createDirectories(target.getParent)
    Files.copy(schema, target, StandardCopyOption.REPLACE_EXISTING)
    target
  }

  private def protoFiles(): Vector[Path] =
    if (!Files.isDirectory(protoDir)) Vector.empty
    else Files.walk(protoDir).iterator.asScala
      .filter(p => p.toString.endsWith(".proto") && Files.isRegularFile(p))
      .toVector.sortBy(_.toString)

  private def stale(): Boolean = {
    if (!Files.exists(cacheFile)) true
    else {
      val cacheM = Files.getLastModifiedTime(cacheFile).toMillis
      protoFiles().exists(p =>
        Files.getLastModifiedTime(p).toMillis > cacheM)
    }
  }

  /** Compiled descriptors for every registered .proto, recompiled only
    * when stale (proto_index.rs:75-94).
    */
  def descriptors(): PSchemaSet = {
    if (!stale()) {
      val in = new ObjectInputStream(new FileInputStream(cacheFile.toFile))
      try return in.readObject().asInstanceOf[PSchemaSet]
      catch { case _: Exception => () } // fall through to recompile
      finally in.close()
    }
    val compiled = protoFiles()
      .map(p => ProtoSchema.parse(Files.readString(p)))
      .foldLeft(PSchemaSet.empty)(_ merge _)
    Files.createDirectories(baseDir)
    val out = new ObjectOutputStream(new FileOutputStream(cacheFile.toFile))
    try out.writeObject(compiled) finally out.close()
    compiled
  }

  /** Decode one message (the `-p .pkg.Msg` entry point, §3.2). */
  def decodeMessage(bytes: Array[Byte], fqNameWithDot: String): Value =
    ProtoWire.decode(bytes, fqNameWithDot, descriptors())
}

object ProtoRegistry {
  /** The ONE registry-dir resolution, shared by the `protobuf add`
    * writer (Cli.configDir) and the `-p` decode path — previously the
    * decode path skipped the `graft.system.dir` test override, so the
    * two ends of the tutorial flow (`rq protobuf add` → `rq -p`) could
    * silently resolve different registries under test. Order: JVM
    * test override, then GRAFT_SYSTEM_DIR (reference RQ_SYSTEM_DIR
    * parity, config.rs:14-36), then ~/.graft.
    */
  def defaultDir: Path = Paths.get(
    sys.props.get("graft.system.dir")
      .orElse(sys.env.get("GRAFT_SYSTEM_DIR"))
      .getOrElse(sys.props.getOrElse("user.home", "/tmp") + "/.graft"))
}
