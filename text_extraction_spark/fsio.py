"""Filesystem seam for the A18/A19 manifest + commit protocol (round-2
fix: the round-1 protocol used os.listdir/os.rename — correct on this
sandbox but driver-local-POSIX only; on a real cluster the driver's
local filesystem is NOT the table's filesystem).

All manifest/commit I/O now routes through the Hadoop FileSystem API via
the session JVM (`spark._jvm`) — the same abstraction every Spark
committer uses, so `file:/...`, `hdfs://...`, `s3a://...` paths all
resolve to the cluster's configured filesystem with no further change.

Commit-point semantics (unchanged from round 1): a bucket is visible iff
its directory rename completed AND a committed manifest row exists.
* On HDFS the dir rename is atomic; the manifest file create is atomic.
* On object stores (s3a) "rename" is copy+delete, NOT atomic — which is
  exactly why the MANIFEST ROW, not the rename, is the commit point: a
  half-copied bucket dir without its manifest row is invisible to
  readers and is overwritten by the replay (pipeline.extract_corpus
  dst-exists branch). Each manifest batch is one whole file created
  once (object PUT is per-key atomic), named with run_id + uuid so
  concurrent writers never collide.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class FS:
    """Thin py4j wrapper over org.apache.hadoop.fs.FileSystem, scoped to
    one base URI's filesystem. Every method takes full path strings."""

    def __init__(self, spark: SparkSession, base: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._io_utils = jvm.org.apache.commons.io.IOUtils  # ships with Spark
        self._fs = self._Path(base).getFileSystem(spark._jsc.hadoopConfiguration())

    # ---- predicates / listing

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def is_dir(self, path: str) -> bool:
        p = self._Path(path)
        return bool(self._fs.exists(p)) and bool(self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        """Child NAMES (not full paths), sorted; [] if path is absent."""
        p = self._Path(path)
        if not self._fs.exists(p):
            return []
        return sorted(st.getPath().getName() for st in self._fs.listStatus(p))

    # ---- mutation

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def rename(self, src: str, dst: str) -> bool:
        """Plain Hadoop rename. NOTE: if dst exists as a directory,
        Hadoop moves src INSIDE it — callers must delete dst first
        (pipeline's replay branch does)."""
        return bool(self._fs.rename(self._Path(src), self._Path(dst)))

    def delete(self, path: str, recursive: bool = True) -> bool:
        return bool(self._fs.delete(self._Path(path), recursive))

    # ---- small-file text I/O (manifest records — never data files)

    def read_text(self, path: str) -> str:
        # py4j passes byte[] BY VALUE, so a read-into-buffer loop never
        # sees the JVM-side writes — drain the stream JVM-side instead
        stream = self._fs.open(self._Path(path))
        try:
            return self._io_utils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def read_text_or_empty(self, path: str) -> str:
        """read_text, but a file deleted between listing and open reads
        as empty instead of raising — the compaction race (round-6
        ADVICE): a peer compaction deletes files it has already folded
        into its own snapshot, so their rows are never lost."""
        try:
            return self.read_text(path)
        except Exception:  # noqa: BLE001 — py4j wraps FileNotFoundException
            if self.exists(path):  # real I/O error on a live file
                raise
            return ""

    def write_text_atomic(self, path: str, text: str, tmp_suffix: str) -> None:
        """Create-then-rename: readers see the whole file or nothing on
        rename-atomic filesystems; on object stores the create itself is
        a single atomic PUT and the rename is a per-key copy — either
        way no partial content is observable under the final name."""
        tmp = path + tmp_suffix
        stream = self._fs.create(self._Path(tmp), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
            stream.hflush()
        finally:
            stream.close()
        if not self.rename(tmp, path):
            self.delete(tmp, recursive=False)
            raise IOError(f"manifest rename failed: {tmp} -> {path}")
