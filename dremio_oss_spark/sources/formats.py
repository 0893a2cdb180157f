"""Format registry: one reader per supported file format.

Reference: dremio-oss `exec/store/dfs/FormatCreator.java:42,110-123`
(format plugin registration table) with per-format readers
(`exec/store/easy/text/TextFormatPlugin.java:54` CSV family,
`exec/store/easy/json/JSONRecordReader.java:71` JSON,
`exec/store/parquet/UnifiedParquetReader.java:91` parquet,
`exec/store/easy/arrow/ArrowFormatPlugin.java:40` Arrow IPC).

Spark-first: parquet/json/csv/orc are `spark.read.format(...)` — Catalyst
gets pushdown/pruning for free.  Arrow IPC files aren't a built-in Spark
source; they're read via pyarrow and handed to Spark as an Arrow-backed
DataFrame (zero-copy into the JVM via createDataFrame's Arrow path).
Arrow files in the reference are small job-result artifacts, not lake
data, so a driver-side read is the honest scale story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class FormatRegistry:
    """Maps format name -> reader callable (FormatCreator.java:110-123)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._readers = {
            "parquet": self._read_spark("parquet"),
            "json": self._read_json,
            "csv": self._read_delimited(","),
            "tsv": self._read_delimited("\t"),
            "psv": self._read_delimited("|"),
            "txt": self._read_delimited("\n"),
            "orc": self._read_spark("orc"),
            "arrow": self._read_arrow,
            "xlsx": self._read_excel,
            "xls": self._read_excel,
        }

    def formats(self) -> list[str]:
        return sorted(self._readers)

    def read(self, path: str, fmt: str, schema: str | None = None, **opts) -> DataFrame:
        if fmt not in self._readers:
            raise ValueError(f"unknown format {fmt!r}; known: {self.formats()}")
        return self._readers[fmt](path, schema=schema, **opts)

    def _read_spark(self, fmt: str):
        def _r(path: str, schema: str | None = None, **opts) -> DataFrame:
            r = self.spark.read.format(fmt).options(**opts)
            if schema:
                r = r.schema(schema)
            return r.load(path)

        return _r

    def _read_json(self, path: str, schema: str | None = None, **opts) -> DataFrame:
        r = self.spark.read.options(**opts)
        if schema:
            r = r.schema(schema)
        return r.json(path)

    def _read_delimited(self, sep: str):
        def _r(path: str, schema: str | None = None, **opts) -> DataFrame:
            opts.setdefault("header", "true")
            r = self.spark.read.options(sep=sep, **opts)
            if schema:
                r = r.schema(schema)
            else:
                r = r.option("inferSchema", "true")
            return r.csv(path)

        return _r

    def _read_excel(self, path: str, schema: str | None = None, **opts) -> DataFrame:
        """Excel (ExcelRecordReader.java): pandas/openpyxl-backed — gated
        on the library being present (not in this container)."""
        try:
            import openpyxl  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "xlsx/xls reads need openpyxl (or spark-excel on a real "
                "cluster); not available in this environment"
            ) from e
        import pandas as pd

        return self.spark.createDataFrame(pd.read_excel(path, **opts))

    def _read_arrow(self, path: str, schema: str | None = None, **opts) -> DataFrame:
        import pyarrow as pa
        import pyarrow.ipc as ipc

        with pa.memory_map(path, "r") as src:
            try:
                table = ipc.open_file(src).read_all()
            except pa.ArrowInvalid:
                src.seek(0)
                table = ipc.open_stream(src).read_all()
        return self.spark.createDataFrame(table.to_pandas())
