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
from ..localframe import meta_df


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
            "txt": self._read_text,
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

    def _read_text(self, path: str, schema: str | None = None,
                   **opts) -> DataFrame:
        """Line-per-row text: EVERY line is a row (the reference's txt
        format) — the delimited reader's header=true default silently
        consumed the first line as a column name."""
        df = self.spark.read.options(**opts).text(path)
        if schema:
            from pyspark.sql import functions as F
            from pyspark.sql.types import StructType

            target = StructType.fromDDL(schema)
            df = df.select(*[
                F.col("value").cast(f.dataType).alias(f.name)
                for f in target.fields[:1]])
        return df

    def _read_excel(self, path: str, schema: str | None = None, **opts) -> DataFrame:
        """Excel (ExcelRecordReader.java, `exec/store/easy/excel/`).

        .xlsx is OOXML — a zip of XML parts — so the reader parses it
        with the stdlib (zipfile + ElementTree): shared strings, the
        first worksheet's rows, A1-style column refs, header row as
        column names, numeric cells as doubles.  Legacy binary .xls
        parses through the pure-python BIFF8 reader (`xls_biff.py`,
        [MS-CFB] + [MS-XLS]) — both formats, like the reference's
        ExcelRecordReader.
        """
        if path.lower().endswith(".xls"):
            from .xls_biff import read_xls_rows

            rows = read_xls_rows(path, sheet=opts.get("sheet"))
        else:
            rows = _parse_xlsx(path, sheet=opts.get("sheet"))
        if not rows:
            raise ValueError(f"empty worksheet in {path}")
        header = [str(c) if c is not None else f"_c{i}"
                  for i, c in enumerate(rows[0])]
        width = len(header)
        data = [
            tuple((r + [None] * width)[:width]) for r in rows[1:]
        ]
        def _cell(v):
            if v is None:
                return None
            if isinstance(v, float) and v.is_integer():
                # "1.0" fails cast(... as int) under ANSI; integral
                # numerics render as integers so user schemas cast
                return str(int(v))
            return str(v)

        sdf = meta_df(self.spark, 
            [tuple(_cell(v) for v in r) for r in data],
            ", ".join(f"`{h}` string" for h in header),
        )
        if schema:
            from pyspark.sql import functions as F
            from pyspark.sql.types import StructType

            target = StructType.fromDDL(schema)
            sdf = sdf.select(
                *[F.col(f.name).cast(f.dataType) for f in target.fields]
            )
        return sdf

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


def _parse_xlsx(path: str, sheet: str | None = None) -> list[list]:
    """Minimal OOXML spreadsheet parser (ECMA-376): returns the rows of
    one worksheet as python values (str for shared/inline strings,
    float for numbers, bool for booleans, None for empty cells)."""
    import re as _re
    import xml.etree.ElementTree as ET
    import zipfile

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        sheet_files = sorted(
            n for n in names
            if _re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        # resolve through the r:id RELATIONSHIPS (the spec's mapping):
        # sorting filenames breaks at 10+ sheets (sheet10 < sheet2) and
        # whenever sheets were reordered/deleted in Excel
        RNS = ("{http://schemas.openxmlformats.org/officeDocument/"
               "2006/relationships}")
        rid_to_file: dict[str, str] = {}
        rels_name = "xl/_rels/workbook.xml.rels"
        if rels_name in names:
            for rel in ET.fromstring(z.read(rels_name)):
                tgt = rel.get("Target") or ""
                rid_to_file[rel.get("Id")] = (
                    "xl/" + tgt.lstrip("/") if not tgt.startswith("xl/")
                    else tgt)
        target = sheet_files[0]
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        ordered = list(wb.iter(f"{NS}sheet"))
        if ordered:
            first = rid_to_file.get(ordered[0].get(f"{RNS}id"))
            if first in names:
                target = first
        if sheet is not None:  # resolve by sheet name
            for i, sh in enumerate(ordered):
                if sh.get("name") == sheet:
                    cand = rid_to_file.get(sh.get(f"{RNS}id"))
                    target = (cand if cand in names
                              else sheet_files[i])
                    break
            else:
                raise ValueError(f"no sheet named {sheet!r} in {path}")
        root = ET.fromstring(z.read(target))
        out: list[list] = []
        for row in root.iter(f"{NS}row"):
            vals: list = []
            for c in row.findall(f"{NS}c"):
                ref = c.get("r") or ""
                col_letters = "".join(ch for ch in ref if ch.isalpha())
                idx = 0
                for ch in col_letters:
                    idx = idx * 26 + (ord(ch) - 64)
                idx = max(idx - 1, len(vals))
                while len(vals) < idx:
                    vals.append(None)  # gap cells
                t = c.get("t", "n")
                v_el = c.find(f"{NS}v")
                is_el = c.find(f"{NS}is")
                if t == "s" and v_el is not None:
                    vals.append(shared[int(v_el.text)])
                elif t == "inlineStr" and is_el is not None:
                    vals.append(
                        "".join(x.text or "" for x in is_el.iter(f"{NS}t"))
                    )
                elif t == "b" and v_el is not None:
                    vals.append(v_el.text == "1")
                elif v_el is not None and v_el.text is not None:
                    # t="str" is the CACHED STRING FORMULA RESULT type
                    # (OOXML 18.18.11) — float()ing it crashed on any
                    # text-producing formula
                    vals.append(float(v_el.text) if t == "n"
                                else v_el.text)
                else:
                    vals.append(None)
            out.append(vals)
        return out
