"""Home space + file uploads — a user's personal area where an
uploaded CSV/XLSX/JSON becomes a queryable dataset.

Reference behavior (spec only): ``dac/backend/.../resource/
HomeResource.java`` — ``upload_start/{path}`` (:219) stages the raw
bytes, ``file_preview_unsaved`` (:326) previews them under candidate
format settings, ``upload_finish`` (:277) promotes the staged file
into the home space, ``file_format`` GET/PUT (:448-463) read/update
the format config, ``upload_cancel`` (:267) and ``DELETE file`` (:427)
clean up.

Spark-first adaptation: on promote, the staged file is read once with
the CONFIGURED format options and materialized as parquet under the
home root, which is registered as a named dir source (``home.<name>``
in SQL).  The reference instead re-reads the original file with stored
format settings on every query; materializing at promote time gives
every later scan typed columnar data + pushdown for free, and a
format-settings change (PUT file_format) simply re-materializes from
the kept original.  Uploads are UI-sized (one file), but the parquet
conversion still goes through Spark so a large upload distributes.
"""

from __future__ import annotations

import os
import re
import shutil
import threading

_IDENT = re.compile(r"[A-Za-z_]\w*$")

# FileFormat.type (file.proto / FileFormat subclasses) → reader fmt
_FORMAT_EXT = {"Text": "csv", "JSON": "json", "Parquet": "parquet",
               "Excel": "xlsx", "XLS": "xls", "Arrow": "arrow"}


def _default_format(extension: str) -> dict:
    ext = (extension or "").lstrip(".").lower()
    if ext in ("csv", "tsv", "psv", "txt"):
        sep = {"csv": ",", "tsv": "\t", "psv": "|",
               "txt": ","}[ext]
        return {"type": "Text", "fieldDelimiter": sep,
                "lineDelimiter": "\n", "quote": '"', "escape": '"',
                "comment": "#", "extractHeader": True,
                "skipFirstLine": False}
    if ext == "json":
        return {"type": "JSON"}
    if ext in ("xlsx", "xls"):
        return {"type": "Excel", "extractHeader": True,
                "hasMergedCells": False}
    if ext == "parquet":
        return {"type": "Parquet"}
    return {"type": "Unknown", "extension": ext}


class HomeService:
    """One home container over a directory (the reference's
    ``@{user}`` space).  SQL namespace: ``<source_name>.<dataset>``."""

    def __init__(self, engine, root: str | None = None,
                 source_name: str = "home"):
        self.engine = engine
        self.source_name = source_name
        if root is None:
            import tempfile

            root = tempfile.mkdtemp(prefix="dremio_home_")
        self.root = root
        # dot-prefixed: fails the dir-source identifier regex, so the
        # staging/keep areas can NEVER list as datasets and no legal
        # upload name (identifiers only) can collide with them
        self.staging = os.path.join(root, ".staging")
        self.uploads = os.path.join(root, ".uploads")
        os.makedirs(self.staging, exist_ok=True)
        os.makedirs(self.uploads, exist_ok=True)
        self._formats: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._registered = False

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def _check_name(name: str) -> str:
        stem = os.path.splitext(name)[0]
        if not _IDENT.match(stem):
            raise ValueError(
                f"dataset name must be an identifier, got {stem!r}")
        return stem

    def _ensure_source(self) -> None:
        # register the home dir as a queryable source on first promote
        # (.staging/.uploads are dot-prefixed, so the identifier-only
        # dir-source lister skips them even when they hold parquet)
        if not self._registered:
            self.engine.create_dir_source(self.source_name, self.root)
            self._registered = True

    def _reader_args(self, fmt: dict) -> tuple[str, dict]:
        kind = fmt.get("type", "Text")
        if kind == "Text":
            opts = {"sep": fmt.get("fieldDelimiter", ","),
                    "header": str(bool(fmt.get("extractHeader",
                                                True))).lower(),
                    "quote": fmt.get("quote", '"'),
                    "escape": fmt.get("escape", '"'),
                    "comment": fmt.get("comment", "#")}
            if fmt.get("skipFirstLine"):
                # reference Text option: drop line 1 w/o using it as a
                # header; Spark models that only via header consumption
                opts["header"] = "true"
            return "csv", opts
        if kind == "JSON":
            return "json", {}
        if kind in ("Excel", "XLS"):
            ext = "xls" if kind == "XLS" else "xlsx"
            opts = {}
            if fmt.get("sheetName"):
                opts["sheetName"] = fmt["sheetName"]
            return ext, opts
        if kind == "Parquet":
            return "parquet", {}
        raise ValueError(f"unsupported file format type: {kind}")

    def _read_staged(self, path: str, fmt: dict):
        from .sources.formats import FormatRegistry

        rf, opts = self._reader_args(fmt)
        if rf == "csv":
            # FormatRegistry's delimited readers fix the separator per
            # format name; go through csv with explicit options
            r = (self.engine.spark.read.options(inferSchema="true",
                                                **opts))
            return r.csv(path)
        return FormatRegistry(self.engine.spark).read(path, rf, **opts)

    # -- upload flow (HomeResource.java:219-330) ------------------------------
    def upload_start(self, name: str, data: bytes,
                     extension: str | None = None) -> dict:
        stem = self._check_name(name)
        ext = (extension or os.path.splitext(name)[1].lstrip(".")
               or "csv").lower()
        # the extension is client-supplied (?extension= query param):
        # anything but a bare alnum token ('/', '..', whitespace)
        # could point the staged write outside .staging or strand
        # junk files _staged_path can never resolve — refuse it like
        # _check_name refuses non-identifier stems
        if not re.fullmatch(r"[a-z0-9]{1,8}", ext):
            raise ValueError(
                f"file extension must be alphanumeric, got {ext!r}")
        staged = os.path.join(self.staging, f"{stem}.{ext}")
        with open(staged, "wb") as f:
            f.write(data)
        return {"name": f"{stem}.{ext}", "id": f"file/{stem}",
                "filePath": staged, "isStaged": True,
                "fileFormat": _default_format(ext)}

    def _staged_path(self, name: str) -> str:
        stem = self._check_name(name)
        for fn in os.listdir(self.staging):
            if os.path.splitext(fn)[0] == stem:
                return os.path.join(self.staging, fn)
        raise FileNotFoundError(f"no staged upload named {name}")

    def file_preview_unsaved(self, name: str, fmt: dict | None,
                             limit: int = 50) -> dict:
        from .server.rest import _json_cell

        staged = self._staged_path(name)
        fmt = fmt or _default_format(os.path.splitext(staged)[1])
        df = self._read_staged(staged, fmt).limit(int(limit))
        rows = df.collect()
        return {"returnedRowCount": len(rows),
                "columns": [{"name": f.name,
                             "type": f.dataType.simpleString()}
                            for f in df.schema.fields],
                "rows": [[_json_cell(v) for v in r] for r in rows]}

    def upload_finish(self, name: str, fmt: dict | None = None) -> dict:
        stem = self._check_name(name)
        staged = self._staged_path(name)
        fmt = fmt or _default_format(os.path.splitext(staged)[1])
        with self._lock:
            df = self._read_staged(staged, fmt)
            target = os.path.join(self.root, stem)
            df.write.mode("overwrite").parquet(target)
            # keep the original for later format-settings changes
            kept = os.path.join(self.uploads, os.path.basename(staged))
            shutil.move(staged, kept)
            self._formats[stem] = fmt
            self._ensure_source()
        return {"name": stem, "id": f"file/{stem}",
                "sqlPath": f"{self.source_name}.{stem}",
                "isStaged": False, "fileFormat": fmt}

    def upload_cancel(self, name: str) -> None:
        try:
            os.remove(self._staged_path(name))
        except FileNotFoundError:
            pass

    # -- format settings (HomeResource.java:448-483) ---------------------------
    def get_format(self, name: str) -> dict:
        stem = self._check_name(name)
        fmt = self._formats.get(stem)
        if fmt is None:
            raise FileNotFoundError(f"no home dataset {name}")
        return {"fileFormat": fmt, "id": f"file/{stem}"}

    def save_format(self, name: str, fmt: dict) -> dict:
        """PUT file_format re-materializes from the kept original."""
        stem = self._check_name(name)
        original = None
        for fn in os.listdir(self.uploads):
            if os.path.splitext(fn)[0] == stem:
                original = os.path.join(self.uploads, fn)
                break
        if original is None:
            raise FileNotFoundError(f"no home dataset {name}")
        with self._lock:
            df = self._read_staged(original, fmt)
            df.write.mode("overwrite").parquet(
                os.path.join(self.root, stem))
            self._formats[stem] = fmt
        return {"fileFormat": fmt, "id": f"file/{stem}"}

    # -- listing / delete -------------------------------------------------------
    def list_home(self) -> dict:
        datasets = sorted(self._formats)
        return {"id": f"home/{self.source_name}",
                "name": f"@{self.source_name}",
                "children": [
                    {"name": d, "type": "FILE",
                     "id": f"file/{d}",
                     "sqlPath": f"{self.source_name}.{d}",
                     "fileFormat": self._formats[d]}
                    for d in datasets]}

    def delete_file(self, name: str) -> None:
        stem = self._check_name(name)
        if stem not in self._formats:
            raise FileNotFoundError(f"no home dataset {name}")
        with self._lock:
            self._formats.pop(stem, None)
            shutil.rmtree(os.path.join(self.root, stem),
                          ignore_errors=True)
            for fn in os.listdir(self.uploads):
                if os.path.splitext(fn)[0] == stem:
                    os.remove(os.path.join(self.uploads, fn))
