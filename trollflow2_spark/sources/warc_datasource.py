"""WARC as a first-class Spark datasource: ``spark.read.format("warc")``.

Spark 4's Python DataSource API lets the crawl intake register like
parquet does, instead of the two-step ``binaryFile`` + ``mapInPandas``
composition (`sources/warc.py::read_warc` — still available; both
routes share :func:`parse_warc_bytes`, so they cannot drift).

What the datasource adds over the composition:

- **Partition planning** is explicit: one input partition per WARC
  file, listed driver-side through ``pyarrow.fs`` (local and object
  stores alike), so a 10k-file crawl plans 10k independent tasks with
  no whole-file manifest materializing anywhere.
- **No binary-row detour**: ``binaryFile`` materializes each file as a
  row in a DataFrame before the parse kernel sees it; the datasource
  streams file bytes straight into the parser inside the task.
- The registered format composes with everything downstream
  (``.format("warc").load(...).filter(...)`` — Catalyst treats it as a
  scan with the declared schema).

Registration is one call per session::

    from trollflow2_spark.sources.warc_datasource import register_warc
    register_warc(spark)
    df = spark.read.format("warc").load("/crawl/*.warc.gz")
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from trollflow2_spark.sources.warc import (
    WARC_RECORD_SCHEMA,
    parse_warc_bytes,
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str, src: str) -> None:
        self.path = path
        self.src = src  # original load uri: executor-side fs re-resolve


_GLOB_CHARS = "*?["


def _components_match(path: str, pattern: str) -> bool:
    """Glob match component-by-component, so ``*`` never crosses a
    ``/`` (``/crawl/2024-*/x.warc.gz`` matches one directory level, not
    arbitrarily deep trees; ``**`` is not supported)."""
    import fnmatch

    pc = [c for c in path.split("/") if c]
    gc = [c for c in pattern.split("/") if c]
    return len(pc) == len(gc) and all(
        fnmatch.fnmatch(a, b) for a, b in zip(pc, gc)
    )


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        import json

        paths: list[str] = []
        multi = options.get("paths")
        if multi:
            try:
                parsed = json.loads(multi)
            except (TypeError, ValueError):
                parsed = None
            if not isinstance(parsed, list) or not all(
                isinstance(p, str) for p in parsed
            ):
                raise ValueError(
                    "warc datasource: 'paths' must be a JSON list of "
                    f"strings, got {multi!r}"
                )
            paths.extend(parsed)
        single = options.get("path")
        if single:
            paths.append(single)
        if not paths:
            raise ValueError("warc datasource needs a load path")
        self._paths = paths

    @staticmethod
    def _list_one(src: str) -> list[str]:
        # driver-side listing only — paths, not bytes
        from pyarrow import fs as pafs

        filesystem, root = pafs.FileSystem.from_uri(src)
        if any(ch in root for ch in _GLOB_CHARS):
            # glob anywhere in the path: walk from the deepest
            # non-glob ancestor and match the full relative path, so
            # patterns like /crawl/2024-*/part.warc.gz work too
            parts = root.split("/")
            base_parts = []
            for part in parts:
                if any(ch in part for ch in _GLOB_CHARS):
                    break
                base_parts.append(part)
            base = "/".join(base_parts) or "/"
            sel = pafs.FileSelector(base, recursive=True)
            return [
                info.path
                for info in filesystem.get_file_info(sel)
                if info.is_file and _components_match(info.path, root)
            ]
        info = filesystem.get_file_info(root)
        if info.type == pafs.FileType.Directory:
            sel = pafs.FileSelector(root, recursive=True)
            return [
                i.path for i in filesystem.get_file_info(sel) if i.is_file
            ]
        return [root]

    def partitions(self):
        out = []
        for src in self._paths:
            out.extend(
                _WarcFilePartition(p, src)
                for p in sorted(self._list_one(src))
            )
        if not out:
            raise FileNotFoundError(
                f"warc datasource: no files match {self._paths!r}"
            )
        return out

    def read(self, partition):
        from pyarrow import fs as pafs

        # re-resolve the filesystem executor-side (partitions must stay
        # picklable; a FileSystem handle is not)
        filesystem, _ = pafs.FileSystem.from_uri(partition.src)
        with filesystem.open_input_stream(partition.path) as fh:
            blob = fh.read()
        fields = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for rec in parse_warc_bytes(blob, partition.path):
            yield tuple(rec[name] for name in fields)


class WarcDataSource(DataSource):
    """``format("warc")``: one row per WARC record, schema
    :data:`WARC_RECORD_SCHEMA`."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_RECORD_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _WarcReader(self.options)


def register_warc(spark) -> None:
    """Register the ``warc`` format on this session (idempotent)."""
    spark.dataSource.register(WarcDataSource)
