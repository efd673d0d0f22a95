"""Filesystem abstraction for chunk/checkpoint/commit-log I/O.

The reference writes through Azure Data Lake clients with
upload-``overwrite=false`` as its atomicity primitive
(``/root/reference/demo/avroidl2parquet.fsx:340-351``; optimistic Delta commit
``README.md:608-701``). This module is the engine's analog: every executor- or
driver-side byte that is not a Spark DataFrame read/write goes through a
:class:`FsIO` resolved from the output URI via ``pyarrow.fs`` — a plain path
gives ``LocalFileSystem``, ``s3://`` / ``hdfs://`` / ``gs://`` URIs resolve to
the matching store — so the encode pipeline runs unchanged on real cluster
storage instead of silently scattering files across executor-local disks.

Atomicity model (two modes, picked per filesystem):

* **rename-capable** (POSIX/HDFS): publish = write to a temp key + atomic
  ``move``; exclusive-create (the commit log's optimistic lock) = local
  ``O_CREAT|O_EXCL``.
* **write-once keys** (object stores — no atomic rename): data/checkpoint
  files are written directly to their final key. This is safe because (a)
  object stores expose only complete objects (a PUT is all-or-nothing), and
  (b) readers are gated: resume trusts only part ids with a checkpoint
  marker, and downstream readers trust only files referenced by the commit
  log. Exclusive-create degrades to check-then-write — the same conditional
  semantics real Delta LogStores implement per store (S3 conditional PUT,
  ABFS ETags); a lost race re-reads the log and retries, so duplicates still
  cannot be committed.
"""

from __future__ import annotations

import os
import posixpath

import pyarrow.fs as pafs


class FsIO:
    """Thin path-rooted wrapper over a ``pyarrow.fs.FileSystem``.

    Picklable (pyarrow filesystems support pickle), so one instance can be
    captured by the grouped-map encode kernel and used executor-side.
    """

    def __init__(self, fs: pafs.FileSystem, base: str,
                 atomic_rename: bool | None = None):
        self.fs = fs
        self.base = base.rstrip("/")
        if atomic_rename is None:
            atomic_rename = isinstance(fs, pafs.LocalFileSystem)
        self.atomic_rename = atomic_rename
        # O_EXCL exclusive-create only exists on the real local filesystem
        self.local_excl = isinstance(fs, pafs.LocalFileSystem)

    @classmethod
    def resolve(cls, base: str, fs: pafs.FileSystem | None = None,
                atomic_rename: bool | None = None) -> "FsIO":
        if fs is not None:
            return cls(fs, base, atomic_rename)
        if "://" in base:
            fs, root = pafs.FileSystem.from_uri(base)
            return cls(fs, root, atomic_rename)
        return cls(pafs.LocalFileSystem(), os.path.abspath(base), atomic_rename)

    # ------------------------------------------------------------- paths

    def join(self, *parts: str) -> str:
        return posixpath.join(self.base, *parts)

    # ------------------------------------------------------------ queries

    def _info(self, path: str) -> pafs.FileInfo:
        return self.fs.get_file_info(path)

    def isdir(self, path: str) -> bool:
        return self._info(path).type == pafs.FileType.Directory

    def exists(self, path: str) -> bool:
        return self._info(path).type != pafs.FileType.NotFound

    def listdir(self, path: str) -> list[str]:
        """Basenames of entries directly under ``path`` ([] if absent)."""
        if not self.isdir(path):
            return []
        sel = pafs.FileSelector(path, recursive=False, allow_not_found=True)
        return sorted(posixpath.basename(fi.path) for fi in self.fs.get_file_info(sel))

    def size(self, path: str) -> int:
        return self._info(path).size

    def mtime_ms(self, path: str) -> int:
        mtime = self._info(path).mtime
        return int(mtime.timestamp() * 1000) if mtime is not None else 0

    # ------------------------------------------------------------- reads

    def read_bytes(self, path: str) -> bytes:
        with self.fs.open_input_stream(path) as f:
            return f.read()

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode()

    def open_input_file(self, path: str):
        """Random-access input file (what ``pyarrow.parquet`` wants)."""
        return self.fs.open_input_file(path)

    # ------------------------------------------------------------- writes

    def makedirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def write_bytes(self, path: str, data: bytes) -> None:
        with self.fs.open_output_stream(path) as f:
            f.write(data)

    def publish_bytes(self, path: str, data: bytes, attempt_tag: str) -> None:
        """Publish a whole file at its final key.

        Rename-capable: write ``path.tmp-<tag>`` then atomic move. Write-once:
        direct PUT (complete-object visibility + gated readers, see module
        docstring)."""
        if not self.atomic_rename:
            self.write_bytes(path, data)
            return
        tmp = f"{path}.tmp-{attempt_tag}"
        self.write_bytes(tmp, data)
        self.fs.move(tmp, path)

    def publish_parquet(self, table, path: str, attempt_tag: str,
                        **write_kwargs) -> tuple[int, str]:
        """Publish a pyarrow Table as parquet at its final key (same
        publication semantics as :meth:`publish_bytes`). Returns
        ``(size, sha256_hex)`` so the caller can record file integrity
        without anyone ever re-reading the file (the commit log builds its
        ``add`` entries from these).

        Serialization goes into a native ``pa.BufferOutputStream`` and the
        store write is ONE native call. Routing parquet serialization through
        a Python file object instead is 10-100x slower inside forked pyspark
        workers (each C++→Python write callback fights the worker's GIL;
        measured 86s vs 6.6s for 96x9.5MB files) — do not "optimize" this
        back to a streaming tee. Memory cost is one serialized file held in
        RAM, bounded by the chunker's rows/values caps."""
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        sink = pa.BufferOutputStream()
        pq.write_table(table, sink, **write_kwargs)
        buf = sink.getvalue()
        sha = hashlib.sha256(memoryview(buf)).hexdigest()
        target = f"{path}.tmp-{attempt_tag}" if self.atomic_rename else path
        with self.fs.open_output_stream(target) as f:
            f.write(buf)
        if self.atomic_rename:
            self.fs.move(target, path)
        return buf.size, sha

    def create_exclusive(self, path: str, data: bytes) -> bool:
        """Create ``path`` iff absent; False if it already exists.

        The commit log's optimistic lock (the reference's
        upload-with-overwrite=false). Local: kernel-atomic ``O_EXCL``.
        Elsewhere: check-then-write (per-store conditional-PUT semantics are a
        deployment concern; the caller's re-read-and-retry loop keeps the
        exactly-once invariant either way)."""
        if self.local_excl:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)
            return True
        if self.exists(path):
            return False
        self.write_bytes(path, data)
        return True


class ObjectStoreLikeHandler(pafs.FileSystemHandler):
    """``LocalFileSystem`` delegate that behaves like an object store for
    local testing: ``move`` raises (object stores have no atomic rename),
    ``open_append_stream`` raises, and every call pays a latency tick.
    Wrap in ``pafs.PyFileSystem`` and hand to ``FsIO(..,
    atomic_rename=False)`` to exercise the write-once-key publication path
    end-to-end without a real store. Lives in the package (not tests) so the
    encode kernel closure that captures it unpickles on executors.
    """

    LATENCY = 0.002

    def __init__(self):
        self._fs = pafs.LocalFileSystem()

    def _tick(self):
        import time

        time.sleep(self.LATENCY)

    def get_type_name(self):
        return "object-store-like"

    def __eq__(self, other):
        return isinstance(other, ObjectStoreLikeHandler)

    def __ne__(self, other):
        return not self.__eq__(other)

    def get_file_info(self, paths):
        self._tick()
        return self._fs.get_file_info(paths)

    def get_file_info_selector(self, selector):
        self._tick()
        return self._fs.get_file_info(selector)

    def create_dir(self, path, recursive):
        self._tick()
        self._fs.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._tick()
        self._fs.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._tick()
        self._fs.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError

    def delete_file(self, path):
        self._tick()
        self._fs.delete_file(path)

    def move(self, src, dest):
        raise OSError("object stores have no atomic rename")

    def copy_file(self, src, dest):
        self._tick()
        self._fs.copy_file(src, dest)

    def open_input_stream(self, path):
        self._tick()
        return self._fs.open_input_stream(path)

    def open_input_file(self, path):
        self._tick()
        return self._fs.open_input_file(path)

    def open_output_stream(self, path, metadata):
        self._tick()
        return self._fs.open_output_stream(path)

    def open_append_stream(self, path, metadata):
        raise NotImplementedError("object stores cannot append")

    def normalize_path(self, path):
        return self._fs.normalize_path(path)


def object_store_like_io(base: str) -> FsIO:
    """An :class:`FsIO` over the object-store-semantics adapter."""
    return FsIO(pafs.PyFileSystem(ObjectStoreLikeHandler()), base, atomic_rename=False)
