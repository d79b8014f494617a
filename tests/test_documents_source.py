"""Distributed directory document readers (S2/S3/S4 plumbing)."""

from __future__ import annotations

import os

from graph_rag_agent_spark.sources.documents import (
    SUPPORTED_EXTENSIONS,
    document_text,
    load_parsers,
    read_binary_documents,
    read_document_directory,
)


def _write(root, rel, payload: bytes):
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(payload)
    return path


def test_binary_scan_routes_and_filters(spark, tmp_path):
    root = str(tmp_path)
    _write(root, "a.txt", "hello txt".encode())
    _write(root, "sub/b.md", "# md heading".encode())
    _write(root, "c.pdf", b"%FAKEPDF|page one|page two")
    _write(root, "skip.bin", b"\x00\x01")

    df = read_binary_documents(spark, root)
    paths = {os.path.basename(r["path"]) for r in df.select("path").collect()}
    assert paths == {"a.txt", "b.md", "c.pdf"}  # recursive, .bin filtered

    only_pdf = read_binary_documents(spark, root, extensions=[".pdf"])
    assert {os.path.basename(r["path"]) for r in only_pdf.collect()} == {"c.pdf"}

    flat = read_binary_documents(spark, root, recursive=False)
    assert {
        os.path.basename(r["path"]) for r in flat.select("path").collect()
    } == {"a.txt", "c.pdf"}


def test_document_text_parses_and_degrades_per_file(spark, tmp_path):
    """Injected fake parsers exercise the full routing/Arrow path; a
    missing or failing parser degrades to the reference's bracket
    placeholder for THAT file only (file_reader.py:190-213)."""
    root = str(tmp_path)
    _write(root, "a.txt", "hello txt".encode())
    _write(root, "c.pdf", b"%FAKEPDF|page one|page two")
    _write(root, "d.docx", b"FAKEDOCX:para1;para2")
    _write(root, "legacy.doc", b"OLDWORD")
    _write(root, "broken.pdf", b"not a pdf at all")

    def fake_pdf(payload: bytes) -> str:
        if not payload.startswith(b"%FAKEPDF"):
            raise ValueError("bad magic")
        pages = payload.decode().split("|")[1:]
        return "".join(p + "\n\n" for p in pages)

    def fake_docx(payload: bytes) -> str:
        return "\n".join(payload.decode().split(":", 1)[1].split(";"))

    out = {
        r["file_name"]: r["content"]
        for r in document_text(
            read_binary_documents(spark, root),
            parsers={".pdf": fake_pdf, ".docx": fake_docx},
        ).collect()
    }
    assert out["a.txt"] == "hello txt"
    assert out["c.pdf"] == "page one\n\npage two\n\n"  # \n\n page join
    assert out["d.docx"] == "para1\npara2"  # \n paragraph join
    assert out["legacy.doc"].startswith("[无法读取Word文档内容:")  # no parser
    assert out["broken.pdf"].startswith("[无法读取PDF文件内容:")  # parser raised

    # end-to-end wrapper returns the same rows
    out2 = read_document_directory(
        spark, root, parsers={".pdf": fake_pdf, ".docx": fake_docx}
    )
    assert out2.count() == 5


def test_load_parsers_reports_actionable_missing(spark):
    parsers, missing = load_parsers()
    # whatever is installed must cover SUPPORTED binary extensions
    assert set(parsers) | set(missing) >= {".pdf", ".docx", ".doc"}
    for ext, reason in missing.items():
        assert reason and ext in SUPPORTED_EXTENSIONS


class TestLoadTranscripts:
    """load_transcripts — the prod input seam (Iceberg table name or
    parquet path) normalizes anything column-compatible to TRANSCRIPTS."""

    def _write_fixture(self, spark, tmp_path):
        # turn_idx arrives as long (a bare parquet file's default) and
        # with an extra column — both must normalize away
        df = spark.createDataFrame(
            [("c1", 0, "user", "hi", None, None, "junk")],
            "conv_id string, turn_idx long, role string, text string,"
            " tool string, ts timestamp, extra string",
        )
        path = str(tmp_path / "transcripts")
        df.write.parquet(path)
        return path

    @staticmethod
    def _name_types(schema):
        # nullability is advisory after cast; names + types are the contract
        return [(f.name, f.dataType) for f in schema.fields]

    def test_path_source_normalizes_schema(self, spark, tmp_path):
        from graph_rag_agent_spark import schemas
        from graph_rag_agent_spark.sources.transcripts import load_transcripts

        out = load_transcripts(spark, self._write_fixture(spark, tmp_path))
        assert self._name_types(out.schema) == self._name_types(schemas.TRANSCRIPTS)
        assert out.count() == 1

    def test_table_source(self, spark, tmp_path):
        from graph_rag_agent_spark import schemas
        from graph_rag_agent_spark.sources.transcripts import load_transcripts

        spark.read.parquet(self._write_fixture(spark, tmp_path)).createOrReplaceTempView(
            "transcripts_v"
        )
        out = load_transcripts(spark, "transcripts_v")
        assert self._name_types(out.schema) == self._name_types(schemas.TRANSCRIPTS)
        assert out.first()["conv_id"] == "c1"

    def test_missing_required_column_fails_fast(self, spark, tmp_path):
        import pytest as _pytest

        from graph_rag_agent_spark.sources.transcripts import load_transcripts

        path = str(tmp_path / "bad")
        spark.createDataFrame(
            [("c1",)], "conv_id string"
        ).write.parquet(path)
        with _pytest.raises(ValueError, match="turn_idx"):
            load_transcripts(spark, path)

    def test_missing_optional_columns_null_filled(self, spark, tmp_path):
        from graph_rag_agent_spark import schemas
        from graph_rag_agent_spark.sources.transcripts import load_transcripts

        path = str(tmp_path / "minimal")
        spark.createDataFrame(
            [("c1", 0, "hello")], "conv_id string, turn_idx int, text string"
        ).write.parquet(path)
        out = load_transcripts(spark, path)
        assert self._name_types(out.schema) == self._name_types(schemas.TRANSCRIPTS)
        row = out.first()
        assert row["role"] is None and row["tool"] is None and row["ts"] is None

    def test_uncastable_column_type_fails_fast(self, spark, tmp_path):
        import pytest as _pytest

        from graph_rag_agent_spark.sources.transcripts import load_transcripts

        path = str(tmp_path / "badtype")
        spark.createDataFrame(
            [("c1", 0, ["not", "a", "string"])],
            "conv_id string, turn_idx int, text array<string>",
        ).write.parquet(path)
        with _pytest.raises(ValueError, match="text"):
            load_transcripts(spark, path)
