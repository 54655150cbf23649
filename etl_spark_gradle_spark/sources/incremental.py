"""Incremental file ingestion: process only files no previous
SUCCESSFUL run has seen.

Beyond-reference capability (the reference re-reads its full source
every run — ``extractor/S3Extractor.scala:30-78`` has no file-level
state): the batch equivalent of Structured Streaming's file source /
Databricks Auto Loader discovery, for pipelines that run on a schedule
against a landing directory that only grows. At 100 TB the difference
is the whole game — a nightly run reads the night's arrivals, not the
lake.

Protocol (two-phase, crash-safe):

1. **Extract** lists the directory's data files through the Hadoop
   FileSystem API (so the same code walks local disk, HDFS, or s3a://
   — whatever filesystems are on the classpath), diffs against
   ``<stateDir>/processed.json``, reads ONLY the new-or-changed files
   (a file is "changed" when its size or mtime moved — landing areas
   that rewrite files get the new version reprocessed), and stages the
   batch as ``<stateDir>/pending.json``. Nothing is marked processed
   yet.
2. **Commit** happens in the PIPELINE EXECUTOR, only after the sink
   action SUCCEEDED: pending merges into processed atomically
   (write-temp + rename). A crash or failed run leaves processed.json
   untouched, so the next run re-discovers the same batch —
   at-least-once delivery; pair with an append/upsert sink (or an
   idempotent overwrite-by-partition) exactly as with any
   at-least-once source. ``pending.json`` is advisory debris after a
   crash and is simply overwritten next run.

Scale notes: listing is driver-side metadata I/O (one RPC per ~1000
files on object stores via the Hadoop listFiles iterator), the state
file carries (path, size, mtime) per SEEN file — kilobytes per
thousand files; the data read is a normal pruned/pushed-down scan of
just the batch paths. An empty batch short-circuits to a zero-row
frame with the directory's schema, so scheduled runs with no arrivals
cost one schema probe, not a scan.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from etl_spark_gradle_spark.plans.config import (
    ConfigError,
    SourceConfig,
    ValidationResult,
)
from etl_spark_gradle_spark.sources.extractors import (
    _FILE_FORMATS,
    _BaseExtractor,
    extract_file,
)

__all__ = ["IncrementalFileExtractor", "list_data_files"]

_STATE_VERSION = 1


def list_data_files(spark: SparkSession, path: str) -> list[dict]:
    """Recursive data-file listing via the Hadoop FileSystem API:
    ``[{path, size, mtime}]``, hidden files (``_``/``.`` prefixes —
    _SUCCESS markers, _spark_metadata, .crc) excluded at every depth.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise ConfigError(f"file_incremental path does not exist: {path}")
    out: list[dict] = []
    root = fs.makeQualified(jpath).toString().rstrip("/")
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith(("_", ".")):
            continue
        # a hidden ancestor directory hides its files too — but only
        # BELOW the listing root (a root the caller explicitly named
        # may itself be dot-prefixed, e.g. a .scratch workspace)
        parent, hidden = p.getParent(), False
        while parent is not None and parent.toString().rstrip("/") != root:
            if parent.getName().startswith(("_", ".")):
                hidden = True
                break
            parent = parent.getParent()
        if hidden:
            continue
        out.append(
            {
                "path": p.toString(),
                "size": int(st.getLen()),
                "mtime": int(st.getModificationTime()),
            }
        )
    out.sort(key=lambda f: f["path"])
    return out


def _read_json(path: str) -> dict | None:
    try:
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    except FileNotFoundError:
        return None
    except (json.JSONDecodeError, OSError):
        return None  # torn write from a crash: treated as absent


def _write_json_atomic(path: str, payload: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".state-")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(payload, f)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


class IncrementalFileExtractor(_BaseExtractor):
    """Source type ``file_incremental``: ``path``, ``format`` (same
    surface as ``file``), plus ``stateDir`` (required — where
    processed.json/pending.json live; local or NFS path, one per
    pipeline+source)."""

    def validate(self, config: SourceConfig) -> ValidationResult:
        errors = []
        if not config.options.get("path"):
            errors.append("file_incremental source requires 'path'")
        if not config.options.get("stateDir"):
            errors.append("file_incremental source requires 'stateDir'")
        fmt = config.options.get("format", "parquet").lower()
        if fmt not in _FILE_FORMATS:
            errors.append(f"unsupported format: {fmt}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    @staticmethod
    def _paths(config: SourceConfig) -> tuple[str, str]:
        state_dir = config.options["stateDir"]
        return (
            os.path.join(state_dir, "processed.json"),
            os.path.join(state_dir, "pending.json"),
        )

    def _read(self, config: SourceConfig, spark: SparkSession) -> DataFrame:
        processed_path, pending_path = self._paths(config)
        state = _read_json(processed_path) or {"version": _STATE_VERSION, "files": {}}
        seen = state.get("files", {})
        listing = list_data_files(spark, config.options["path"])
        batch = [
            f
            for f in listing
            if f["path"] not in seen
            or seen[f["path"]].get("size") != f["size"]
            or seen[f["path"]].get("mtime") != f["mtime"]
        ]
        _write_json_atomic(
            pending_path, {"version": _STATE_VERSION, "files": batch}
        )
        reader_opts = {
            k: v for k, v in config.options.items() if k != "stateDir"
        }
        if not batch:
            if not listing and not config.options.get("schema"):
                # a landing dir that has never held a data file cannot
                # be schema-probed — Spark's "Unable to infer schema"
                # would fail what should be a clean zero-row first run
                # (review finding); an explicit DDL schema removes the
                # inference and with it this restriction
                raise ConfigError(
                    "file_incremental: landing path has no data files yet "
                    f"({config.options['path']}) — provide an explicit "
                    "'schema' DDL so empty first runs can emit a typed "
                    "zero-row frame"
                )
            # schema-only probe of the full directory; zero-row frame
            return extract_file(spark, reader_opts).limit(0)
        return extract_file(
            spark, reader_opts, paths_override=[f["path"] for f in batch]
        )

    def commit_processed(self, config: SourceConfig) -> int:
        """Called by the executor AFTER a successful sink action: merge
        the staged pending batch into processed.json (atomic replace)
        and return how many files were committed. Without this call —
        failed run, crash, or a pre-commit kill — processed.json is
        untouched and the batch re-discovers next run."""
        processed_path, pending_path = self._paths(config)
        pending = _read_json(pending_path)
        if pending is None:
            return 0
        state = _read_json(processed_path) or {"version": _STATE_VERSION, "files": {}}
        files = state.setdefault("files", {})
        for f in pending.get("files", []):
            files[f["path"]] = {"size": f["size"], "mtime": f["mtime"]}
        _write_json_atomic(processed_path, state)
        try:
            os.unlink(pending_path)
        except OSError:
            pass
        return len(pending.get("files", []))

    def source_identifier(self, config: SourceConfig) -> str:
        return config.options.get("path", "unknown")
