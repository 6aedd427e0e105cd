package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** [[org.apache.hadoop.fs.RawLocalFileSystem]] whose `setPermission`
  * uses java.nio instead of forking a `chmod` subprocess.
  *
  * Without the native-hadoop library (absent in this container),
  * RawLocalFileSystem falls back to `Shell.execCommand("chmod", …)`
  * for EVERY file create and EVERY `mkdirs` — including the ones the
  * output committer performs per staged file.  Stack sampling of the
  * round-17 bench put ~16% of active executor samples inside that
  * fork (ProcessImpl.forkAndExec under RawLocalFileSystem
  * .setPermission), serialized through every layout write of the
  * manifested-lifecycle queries.  `Files.setPosixFilePermissions` is
  * the same chmod as a few syscalls.
  *
  * Semantics: identical permission bits for owner/group/other rwx
  * (the only bits a local bench touches); sticky/setuid fall back to
  * the shell path, as does any non-POSIX store.  Local-mode sessions
  * opt in via `spark.hadoop.fs.file.impl`; cluster deployments on
  * HDFS/S3 never see this class.
  */
class NioLocalFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import java.nio.file.attribute.PosixFilePermission._

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val m = permission.toShort.toInt
    if ((m & ~Integer.parseInt("777", 8)) != 0) {
      // sticky/setuid/setgid: keep Hadoop's exact behavior
      super.setPermission(p, permission)
      return
    }
    try {
      val perms = new java.util.HashSet[java.nio.file.attribute.PosixFilePermission]()
      if ((m & Integer.parseInt("400", 8)) != 0) perms.add(OWNER_READ)
      if ((m & Integer.parseInt("200", 8)) != 0) perms.add(OWNER_WRITE)
      if ((m & Integer.parseInt("100", 8)) != 0) perms.add(OWNER_EXECUTE)
      if ((m & Integer.parseInt("040", 8)) != 0) perms.add(GROUP_READ)
      if ((m & Integer.parseInt("020", 8)) != 0) perms.add(GROUP_WRITE)
      if ((m & Integer.parseInt("010", 8)) != 0) perms.add(GROUP_EXECUTE)
      if ((m & Integer.parseInt("004", 8)) != 0) perms.add(OTHERS_READ)
      if ((m & Integer.parseInt("002", 8)) != 0) perms.add(OTHERS_WRITE)
      if ((m & Integer.parseInt("001", 8)) != 0) perms.add(OTHERS_EXECUTE)
      java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, perms)
    } catch {
      // non-POSIX store, missing file race, … — Hadoop's shell path
      // defines the error semantics; defer to it
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }
}
