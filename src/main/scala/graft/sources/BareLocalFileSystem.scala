package graft.sources

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem with POSIX permission maintenance disabled —
  * a LOCAL-DEPLOYMENT conf, not a default (round-17 verdict #5).
  *
  * Why it exists: on a local filesystem without libhadoop, Hadoop's
  * `RawLocalFileSystem.setPermission` shells out (`fork`+`exec chmod`)
  * once per created file/directory; the sf1 streaming-capstone CPU
  * profile attributed ~22% of wall to exactly these forks (SCALE.md
  * round 17) — pure environmental overhead: single-user bench/dev
  * checkpoint directories carry no permission semantics, and cluster
  * deployments use HDFS/object-store committers where this class never
  * engages. Opt in with:
  *
  *   spark.hadoop.fs.file.impl=graft.sources.BareLocalFileSystem
  *
  * Semantics: only `setPermission` is a no-op (files keep the process
  * umask); everything else — atomic rename, checksum files, listing,
  * deletion — is stock [[LocalFileSystem]], so exactly-once sink
  * guarantees (which rest on rename/overwrite, never on modes) are
  * untouched. The A/B datum and the keeper-identity green run that
  * gate shipping this conf are recorded in SCALE.md round 18.
  */
class BareLocalFileSystem extends LocalFileSystem(new NoChmodRawLocalFileSystem)

/** [[RawLocalFileSystem]] minus the per-file `chmod` fork. */
class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
