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
    def __init__(self, path: str) -> None:
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warc datasource needs a load path")
        self._path = path

    def partitions(self):
        # driver-side listing only — paths, not bytes
        from pyarrow import fs as pafs

        filesystem, root = pafs.FileSystem.from_uri(self._path)
        if "*" in root or "?" in root:
            # glob: list the parent and filter by the pattern
            import fnmatch
            import posixpath

            parent = posixpath.dirname(root)
            pattern = posixpath.basename(root)
            sel = pafs.FileSelector(parent, recursive=False)
            names = [
                info.path
                for info in filesystem.get_file_info(sel)
                if info.is_file
                and fnmatch.fnmatch(posixpath.basename(info.path), pattern)
            ]
        else:
            info = filesystem.get_file_info(root)
            if info.type == pafs.FileType.Directory:
                sel = pafs.FileSelector(root, recursive=True)
                names = [
                    i.path
                    for i in filesystem.get_file_info(sel)
                    if i.is_file
                ]
            else:
                names = [root]
        if not names:
            raise FileNotFoundError(
                f"warc datasource: no files match {self._path!r}"
            )
        return [_WarcFilePartition(p) for p in sorted(names)]

    def read(self, partition):
        from pyarrow import fs as pafs

        # re-resolve the filesystem executor-side (partitions must stay
        # picklable; a FileSystem handle is not)
        filesystem, _ = pafs.FileSystem.from_uri(self._path)
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
