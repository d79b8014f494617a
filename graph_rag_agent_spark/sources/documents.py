"""Directory document readers (SURVEY §2 S2-S4) — distributed.

The reference walks a directory driver-side and parses every file
sequentially into (filename, content) tuples
(/root/reference/processor/file_reader.py:36-79). At 100 TB that
loop IS the job, so here the scan is Spark's ``binaryFile`` source —
a real DataSource with partitioned listing, predicate-pushdown on
path/length, and streaming-compatible semantics — and parsing runs
as one Arrow-batched mapInPandas pass.

Parity contract (file_reader.py):
  - PDF  (:190-213): per-page extract_text, pages joined by "\n\n";
    an unreadable page contributes the placeholder
    "[第 N 页无法读取]\n\n"; an unreadable file yields
    "[无法读取PDF文件内容: <err>]".
  - DOCX (:219-229): paragraph texts joined by "\n"; failure yields
    "[无法读取Word文档内容: <err>]" (reference prints the message and
    returns the bracket placeholder — same degrade-don't-crash shape).
  - DOC  (:231-330): ladder of win32com → textract; every rung
    unavailable → the failure placeholder. Sandbox has neither, so
    the gated parser reports unavailable and rows degrade the same
    way.
  - TXT/MD (:181-188, 255-263): utf-8 with errors='replace'.

The binary parsers (pypdf / python-docx) are import-gated exactly
like extras/codecs: ``load_parsers()`` returns what is installed plus
an actionable missing-map; absent parsers produce the reference's
failure placeholder per row instead of poisoning executors. Tests
inject deterministic fake parsers, so the Spark plumbing (scan,
extension routing, Arrow batching, placeholder semantics) is fully
exercised without the libraries.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENT_SCHEMA = "path string, file_name string, extension string, content string"

TEXT_EXTENSIONS = {".txt", ".md"}
BINARY_EXTENSIONS = {".pdf", ".docx", ".doc"}
SUPPORTED_EXTENSIONS = TEXT_EXTENSIONS | BINARY_EXTENSIONS


def read_binary_documents(
    spark: SparkSession,
    directory: str,
    extensions: list[str] | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Directory → (path, modificationTime, length, content) via the
    ``binaryFile`` source. The extension filter happens in the SCAN
    (pathGlobFilter when a single extension is asked for, a path
    predicate otherwise) so unwanted bytes are never read."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    exts = [e.lower() for e in (extensions or sorted(SUPPORTED_EXTENSIONS))]
    if len(exts) == 1:
        # case-insensitive glob ("*.pdf" -> "*.[pP][dD][fF]") so the
        # single-extension fast path admits exactly the same files as
        # the lowercased-path predicate below
        glob = "*" + "".join(
            f"[{ch}{ch.upper()}]" if ch.isalpha() else ch for ch in exts[0]
        )
        reader = reader.option("pathGlobFilter", glob)
        df = reader.load(directory)
    else:
        df = reader.load(directory)
        cond = None
        for e in exts:
            c = F.lower(F.col("path")).endswith(e)
            cond = c if cond is None else (cond | c)
        df = df.where(cond)
    return df


def load_parsers() -> tuple[dict, dict]:
    """→ (parsers, missing): per-extension ``bytes → str`` callables
    for every installed parsing library, and {extension: reason} for
    the rest. Driver-side probe, mirroring extras.codecs.load_decoders."""
    parsers: dict = {}
    missing: dict = {}

    try:
        import io

        try:
            from pypdf import PdfReader  # modern name
        except ImportError:
            from PyPDF2 import PdfReader  # reference's import (file_reader.py:4)

        def parse_pdf(payload: bytes) -> str:
            reader = PdfReader(io.BytesIO(payload))
            text = ""
            for page_num in range(len(reader.pages)):
                try:
                    page_text = reader.pages[page_num].extract_text() or ""
                    text += page_text + "\n\n"
                except Exception:
                    text += f"[第 {page_num + 1} 页无法读取]\n\n"
            return text

        parsers[".pdf"] = parse_pdf
    except Exception as e:  # noqa: BLE001 — any import/native failure
        missing[".pdf"] = f"{type(e).__name__}: {e} (pip install pypdf)"

    try:
        import io

        from docx import Document

        def parse_docx(payload: bytes) -> str:
            doc = Document(io.BytesIO(payload))
            return "\n".join(p.text for p in doc.paragraphs)

        parsers[".docx"] = parse_docx
    except Exception as e:  # noqa: BLE001
        missing[".docx"] = f"{type(e).__name__}: {e} (pip install python-docx)"

    # .doc: the reference's win32com/textract ladder has no sandbox
    # rung; always reported missing here (extras integration point)
    missing[".doc"] = "no .doc parser available (reference ladder: win32com → textract)"
    return parsers, missing


def _extension(path: str) -> str:
    return os.path.splitext(path)[1].lower()


_FAILURE_PLACEHOLDER = {
    ".pdf": "[无法读取PDF文件内容: {err}]",
    ".docx": "[无法读取Word文档内容: {err}]",
    ".doc": "[无法读取Word文档内容: {err}]",
}


def document_text(
    binary_df: DataFrame,
    parsers: dict[str, Callable[[bytes], str]] | None = None,
) -> DataFrame:
    """(path, content: binary) → (path, file_name, extension, content:
    string): the reference's read_files tuple list as a DataFrame.

    One mapInPandas pass; TXT/MD decode with utf-8 errors='replace'
    (file_reader.py:181-188), binary formats route to ``parsers``
    (default: whatever load_parsers found installed). A row whose
    parser is absent or raises gets the reference's bracket
    placeholder — parse failures degrade per-file, they never fail
    the job (file_reader.py returns the placeholder string on every
    exception path)."""
    if parsers is None:
        parsers, _ = load_parsers()
    injected = dict(parsers)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_path, out_name, out_ext, out_text = [], [], [], []
            for path, payload in zip(pdf["path"], pdf["content"]):
                ext = _extension(path)
                if ext in TEXT_EXTENSIONS:
                    text = bytes(payload).decode("utf-8", errors="replace")
                else:
                    parser = injected.get(ext)
                    if parser is None:
                        text = _FAILURE_PLACEHOLDER.get(
                            ext, "[无法读取文件内容: {err}]"
                        ).format(err=f"no parser for {ext}")
                    else:
                        try:
                            text = parser(bytes(payload))
                        except Exception as e:  # noqa: BLE001 — per-file degrade
                            text = _FAILURE_PLACEHOLDER.get(
                                ext, "[无法读取文件内容: {err}]"
                            ).format(err=str(e))
                out_path.append(path)
                out_name.append(os.path.basename(path))
                out_ext.append(ext)
                out_text.append(text)
            yield pd.DataFrame(
                {
                    "path": out_path,
                    "file_name": out_name,
                    "extension": out_ext,
                    "content": out_text,
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        parse, schema=DOCUMENT_SCHEMA
    )


def read_document_directory(
    spark: SparkSession,
    directory: str,
    extensions: list[str] | None = None,
    recursive: bool = True,
    parsers: dict[str, Callable[[bytes], str]] | None = None,
) -> DataFrame:
    """read_files (file_reader.py:36-79) end-to-end: scan + parse."""
    return document_text(
        read_binary_documents(spark, directory, extensions, recursive),
        parsers=parsers,
    )
