"""FileIO seam for the lake-table format (SURVEY §4.4).

Every filesystem touch the table format performs goes through this one
small interface, so the local-FS implementation below can be swapped for an
object-store one (S3/GCS via atomic-rename-emulation or a catalog CAS)
without changing format/merge logic — the same seam Apache Iceberg's
``FileIO`` + commit-catalog split provides.

The interface is deliberately tiny: the format needs atomic pointer swap,
exclusive (compare-and-swap) metadata creation, list/move/read, and Parquet
footer access.  Nothing else in the engine touches the filesystem directly
(enforced by tests/test_policy_lint.py::test_format_uses_fileio_seam).
"""

from __future__ import annotations

import os
import shutil
import uuid


class CommitConflictError(RuntimeError):
    """Another committer created the next metadata version first."""


class FileIO:
    """Abstract filesystem operations used by LakeTable."""

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text_atomic(self, path: str, text: str) -> None:
        """Durably replace ``path`` with ``text`` (readers see old or new)."""
        raise NotImplementedError

    def write_text_exclusive(self, path: str, text: str) -> None:
        """Create ``path`` with ``text``; raise CommitConflictError if it
        already exists.  This is the optimistic-concurrency primitive: two
        committers racing to the same next version cannot both win."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def remove_tree(self, path: str) -> None:
        raise NotImplementedError

    def remove_file(self, path: str) -> None:
        raise NotImplementedError

    def list_files(self, root: str) -> list[str]:
        """All file paths under ``root`` (recursive), relative to it."""
        raise NotImplementedError

    def parquet_metadata(self, path: str):
        """Parquet footer metadata (pyarrow) — for manifest stats harvest."""
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX implementation: atomicity via fsync + rename."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def write_text_exclusive(self, path: str, text: str) -> None:
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        except FileExistsError as e:
            raise CommitConflictError(
                f"metadata version already exists: {path}"
            ) from e
        try:
            with os.fdopen(fd, "w") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
        except BaseException:
            # never leave a half-written version file claiming the slot
            try:
                os.unlink(path)
            except OSError:
                pass
            raise

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def remove_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def remove_file(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def list_files(self, root: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                out.append(os.path.relpath(os.path.join(dirpath, fn), root))
        return sorted(out)

    def parquet_metadata(self, path: str):
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata
