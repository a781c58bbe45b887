"""Hadoop FileSystem helpers shared by the in-place compactors.

``maintenance.compact`` and ``maintenance.compact_band_store`` both end
with the same dance: write the rewritten dataset to a ``.tmp`` sibling,
move the live directory aside, re-check that nothing was appended while
the rewrite ran, swap the tmp copy in, and roll the original back on any
failure. Doing that through Python's ``os.rename``/``shutil`` only works
on a local filesystem — a 100 TB compaction runs on HDFS/S3/abfss, so
everything here goes through the JVM's ``org.apache.hadoop.fs.FileSystem``
(the same API Spark's own committers use; rename is atomic on HDFS and
the best available primitive on object stores).

Reference has no counterpart (SSIS delegates table maintenance to SQL
Server) — NEW per SURVEY §2.12's lakehouse-maintenance family.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class, root Path) for ``path`` under the
    session's Hadoop configuration — local / HDFS / object stores all
    resolve through the same call."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    root = hpath(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, root


def list_data_files(fs, root, suffix: str = ".parquet") -> dict[str, int]:
    """Recursive ``suffix`` data-file listing as {root-relative path:
    size}. Keys are relative to ``root`` — NOT absolute — so the same
    content listed before and after the directory is renamed aside
    compares equal, while a partition move (same file name, different
    ``_band=``/partition dir) still reads as a change."""
    base = fs.makeQualified(root).toUri().getPath().rstrip("/") + "/"
    it = fs.listFiles(root, True)
    out: dict[str, int] = {}
    while it.hasNext():
        st = it.next()
        name = st.getPath().toUri().getPath()
        if name.endswith(suffix):
            rel = name[len(base):] if name.startswith(base) else name
            out[rel] = st.getLen()
    return out


def count_data_files(fs, root, suffix: str = ".parquet") -> int:
    it = fs.listFiles(root, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


def swap_compacted(
    spark: SparkSession,
    path: str,
    tmp: str,
    snapshot: dict[str, int] | None,
    label: str = "compact",
) -> None:
    """Swap the rewritten copy at ``tmp`` into ``path`` with rollback.

    SINGLE-WRITER maintenance step (schedule after the appends that own
    the dataset, never concurrently) — but the guard is real, not
    assumed: if ``snapshot`` (the data-file listing taken BEFORE the
    rewrite read resolved its file index) no longer matches the live
    directory once it has been moved aside, a concurrent append slipped
    in and its rows are NOT in the compacted copy. The original is
    restored untouched and the call raises instead of silently dropping
    that batch. Between the two renames there is a brief window where
    ``path`` does not exist, so concurrent READERS should also run
    outside the maintenance slot. Raises IOError on any failed step;
    ``path`` always holds a complete dataset afterwards (the original on
    failure, the compacted copy on success).
    """
    fs, hpath, root = hadoop_fs(spark, path)
    back_str = path.rstrip("/") + f"._{label}_old"
    back = hpath(back_str)
    if fs.exists(back):
        fs.delete(back, True)
    move_aside(fs, root, back, label, path)
    if snapshot is not None and list_data_files(fs, back) != snapshot:
        # the compacted copy is missing the appended rows — worthless;
        # delete it BEFORE attempting the rollback so a rollback failure
        # can't leak a dataset-sized tmp directory
        fs.delete(hpath(tmp), True)
        _rollback(
            fs, back, root, label, path, back_str,
            reason=f"{label}: {path} changed during compaction "
                   "(concurrent append?)",
        )
        raise IOError(
            f"{label}: {path} changed during compaction (concurrent "
            "append?); original dataset restored — rerun when no writer "
            "is active"
        )
    try:
        # some FileSystem impls (RawLocalFileSystem) THROW on a missing
        # source instead of returning false — roll back either way
        swapped = fs.rename(hpath(tmp), root)
    except Exception as exc:
        _rollback(fs, back, root, label, path, back_str,
                  reason=f"{label}: swap into {path} failed")
        raise IOError(
            f"{label}: could not swap {tmp} into {path}; "
            "original dataset restored"
        ) from exc
    if not swapped:
        _rollback(fs, back, root, label, path, back_str,
                  reason=f"{label}: swap into {path} failed")
        raise IOError(
            f"{label}: could not swap {tmp} into {path}; "
            "original dataset restored"
        )
    fs.delete(back, True)


def move_aside(fs, root, back, label: str, path: str) -> None:
    """Rename the live dataset to its ``._<label>_old`` slot and stamp
    the move-aside's modification time to NOW (best-effort ``setTimes``;
    some object-store FileSystems don't support it). The stamp matters:
    rename preserves the inode's mtime, so a move-aside created seconds
    ago would otherwise carry the dataset's last-write time — and
    ``maintenance.vacuum``'s age guard would treat a fresh failed-swap
    move-aside (possibly the ONLY copy of the data after a rollback
    failure) as weeks-old garbage (round-10 self-review)."""
    if not fs.rename(root, back):
        raise IOError(f"{label}: could not move {path} aside")
    try:
        import time as _time

        fs.setTimes(back, int(_time.time() * 1000), -1)
    except Exception:
        # unsupported on this FileSystem — vacuum's dry-run default and
        # the operator's own age guard remain the safety layers
        pass


def _rollback(fs, back, root, label: str, path: str, back_str: str,
              reason: str | None = None) -> None:
    """Restore the moved-aside original to ``root`` — CHECKED. A swap
    failure's error message claims 'original dataset restored', so the
    rollback rename must not be assumed to succeed (e.g. a concurrent
    writer recreated ``path`` after the move-aside): if it fails or the
    restored directory is not there afterwards, raise an error that
    carries the ORIGINAL failure (``reason`` — a concurrent-append guard
    trip reads very differently from a failed swap) and names the
    ``._<label>_old`` location where the original dataset actually
    resides instead of the misleading restored claim (round-9 verdict
    item 5 / ADVICE; reason parameterization round-10 self-review)."""
    why = reason or f"{label}: swap into {path} failed"
    try:
        ok = bool(fs.rename(back, root)) and fs.exists(root)
    except Exception as exc:
        raise IOError(
            f"{why} — AND the rollback rename failed: the original "
            f"dataset was NOT restored; it resides intact at {back_str}; "
            f"move it back to {path} manually"
        ) from exc
    if not ok:
        raise IOError(
            f"{why} — AND the rollback rename failed (something "
            f"recreated {path}?): the original dataset was NOT restored; "
            f"it resides intact at {back_str}; move it back to {path} "
            f"manually"
        )
