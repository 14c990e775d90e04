package graft

import org.apache.hadoop.fs.Path

/** A local filesystem that simulates a raw object store's rename: a
  * COPY+DELETE that silently OVERWRITES the destination — rename never
  * fails because the target exists, so the rename-CAS version-slot claim
  * loses its one-winner guarantee. Exclusive create (`create(path,
  * overwrite = false)`) stays atomic, matching real object stores'
  * conditional-put primitive — exactly the asymmetry [[graft.operators
  * .LockedCas]] is designed for. Registered under the `clobber:` scheme
  * by the specs that use it.
  */
class ClobberFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "clobber"
  override def getUri: java.net.URI = java.net.URI.create("clobber:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst) && !getFileStatus(dst).isDirectory) delete(dst, false)
    super.rename(src, dst)
  }
}
