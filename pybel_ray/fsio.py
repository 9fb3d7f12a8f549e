"""Filesystem abstraction for the shard sink — local POSIX or ``pyarrow.fs``.

The compile sink (:class:`~pybel_ray.stages.parse_stage.ParseDocumentsToDir`,
:class:`~pybel_ray.pipeline.CheckpointedCompile`) originally assumed a POSIX
shared filesystem: atomicity came from write-to-temp + ``os.replace`` and the
resume manifest was an appended ``manifest.jsonl``.  Neither primitive exists
on an object store (S3/GCS have no atomic rename and no append), so every
sink path is now routed through this module with TWO commit protocols:

* ``fs is None`` (plain local path) — the original protocol, unchanged:
  temp file + ``os.replace`` (atomic on POSIX), ``manifest.jsonl`` append.
* ``fs`` is a ``pyarrow.fs.FileSystem`` (from a URI like ``s3://…`` or an
  explicit instance) — **write-then-manifest-commit**: each Parquet part is
  streamed DIRECTLY to its final, deterministic name (object-store PUTs are
  atomic at close — a partially-uploaded object is never visible, and a
  retried task overwrites the same key, so rename adds nothing); durability
  is then committed by writing ONE small manifest object per shard
  (``manifest/shard=<id>.json``).  A shard counts as done only once its
  manifest object exists; resume re-runs any shard without one, clearing its
  part prefix first (part names depend on input block boundaries, so a
  crashed attempt under different parallelism could otherwise leave stale
  parts alongside the new ones).

The same protocol runs against ``pyarrow.fs.SubTreeFileSystem`` over a local
directory, which is how the parity tests exercise the object-store branch
without network access.

No reference analog: the reference engine persists via single-process pickle
I/O (ref ``io/nodelink.py``, ``manager/cache_manager.py``); a multi-node
sink protocol is Ray-architecture territory.
"""

from __future__ import annotations

import json
import os
import posixpath
from typing import List, Optional, Tuple

import pyarrow as pa

__all__ = [
    "parse_target",
    "join",
    "ensure_dir",
    "write_parquet_atomic",
    "write_text_atomic",
    "read_text",
    "exists",
    "is_dir",
    "delete_dir",
    "list_files",
]


def parse_target(path: str, filesystem=None) -> Tuple[Optional[object], str]:
    """Resolve an output target to ``(fs, fs_path)``.

    ``fs`` is ``None`` for a plain local path (the fast POSIX branch) and a
    ``pyarrow.fs.FileSystem`` otherwise.  Accepts an explicit ``filesystem``
    (e.g. ``SubTreeFileSystem`` in tests) or a URI (``s3://…``, ``gs://…``,
    ``file:///…`` — ``file://`` URIs collapse back to the local branch).
    """
    if filesystem is not None:
        return filesystem, path
    if "://" in str(path):
        from pyarrow import fs as pafs

        fs, fs_path = pafs.FileSystem.from_uri(path)
        if isinstance(fs, pafs.LocalFileSystem):
            return None, fs_path
        return fs, fs_path
    return None, path


def join(fs, base: str, *parts: str) -> str:
    """Path join under the target filesystem's conventions."""
    if fs is None:
        return os.path.join(base, *parts)
    return posixpath.join(base, *parts)


def ensure_dir(fs, path: str) -> None:
    if fs is None:
        os.makedirs(path, exist_ok=True)
    else:
        fs.create_dir(path, recursive=True)


def write_parquet_atomic(fs, table: pa.Table, path: str, **write_kwargs) -> None:
    """Write a Parquet part so readers never observe a partial file.

    Local: temp + ``os.replace``.  Remote: direct stream to the final name
    (atomic-at-close PUT; deterministic names make retries overwrite, never
    duplicate — the caller's manifest write is the durability commit).
    """
    import pyarrow.parquet as pq

    if fs is None:
        tmp = path + ".tmp"
        pq.write_table(table, tmp, **write_kwargs)
        os.replace(tmp, path)
        return
    with fs.open_output_stream(path) as out:
        pq.write_table(table, out, **write_kwargs)


def write_text_atomic(fs, path: str, text: str) -> None:
    """Atomically publish a small text object (a manifest commit)."""
    if fs is None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return
    with fs.open_output_stream(path) as out:
        out.write(text.encode("utf8"))


def read_text(fs, path: str) -> str:
    if fs is None:
        with open(path) as f:
            return f.read()
    with fs.open_input_stream(path) as f:
        return f.read().decode("utf8")


def exists(fs, path: str) -> bool:
    if fs is None:
        return os.path.exists(path)
    from pyarrow import fs as pafs

    return fs.get_file_info(path).type != pafs.FileType.NotFound


def is_dir(fs, path: str) -> bool:
    if fs is None:
        return os.path.isdir(path)
    from pyarrow import fs as pafs

    return fs.get_file_info(path).type == pafs.FileType.Directory


def delete_dir(fs, path: str) -> None:
    """Remove a directory (or object prefix) if present."""
    if fs is None:
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        return
    from pyarrow import fs as pafs

    if fs.get_file_info(path).type != pafs.FileType.NotFound:
        fs.delete_dir(path)


def list_files(fs, path: str) -> List[str]:
    """Base names of files directly under ``path`` ([] if absent)."""
    if fs is None:
        if not os.path.isdir(path):
            return []
        return sorted(
            n for n in os.listdir(path)
            if os.path.isfile(os.path.join(path, n))
        )
    from pyarrow import fs as pafs

    if fs.get_file_info(path).type == pafs.FileType.NotFound:
        return []
    sel = pafs.FileSelector(path, recursive=False)
    return sorted(
        posixpath.basename(info.path)
        for info in fs.get_file_info(sel)
        if info.type == pafs.FileType.File
    )


def read_manifest_dir(fs, path: str) -> dict:
    """Load ``shard=<id>.json`` manifest objects into {shard_id: entry}."""
    done = {}
    for name in list_files(fs, path):
        if not (name.startswith("shard=") and name.endswith(".json")):
            continue
        entry = json.loads(read_text(fs, join(fs, path, name)))
        done[int(entry["shard_id"])] = entry
    return done
