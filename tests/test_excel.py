"""Excel scan/sink (S3/K1) via the stdlib XLSX codec: byte-level roundtrip,
reader compatibility shapes (shared strings), sanitization end-to-end, and
the distributed multi-file scan."""

import zipfile

import pytest

from series_correction_project_updated_spark.functions.xlsx import (
    col_letter,
    decode_xlsx,
    encode_xlsx,
)
from series_correction_project_updated_spark.sources.excel import (
    read_excel_files,
    write_excel_safely,
)


def test_col_letters():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_xlsx_roundtrip_types():
    rows = [
        ["name", "value", "flag", "note"],
        ["alpha", 1.5, True, "hello <world> & 'quotes'"],
        ["beta", -2.0, False, None],
        [None, 0.125, None, "  spaces kept  "],
    ]
    name, back = decode_xlsx(encode_xlsx(rows, "Report"))
    assert name == "Report"
    assert back[0] == rows[0]
    assert back[1] == ["alpha", 1.5, True, "hello <world> & 'quotes'"]
    assert back[2][:3] == ["beta", -2.0, False]
    assert back[3] == [None, 0.125, None, "  spaces kept  "]


def test_xlsx_is_valid_zip_package():
    payload = encode_xlsx([["a"], ["1"]])
    with zipfile.ZipFile(__import__("io").BytesIO(payload)) as z:
        names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names


def test_reader_supports_shared_strings():
    # hand-build a workbook that uses the sharedStrings table (t="s"),
    # the layout openpyxl/Excel produce, which our writer does not emit
    import io
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>2.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        f'<sst xmlns="{ns}" count="1" uniqueCount="1"><si><t>hdr</t></si></sst>'
    )
    wb = f'<workbook xmlns="{ns}"><sheets><sheet name="S" sheetId="1"/></sheets></workbook>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", shared)
    name, rows = decode_xlsx(buf.getvalue())
    assert name == "S" and rows == [["hdr", 2.5]]


def test_write_excel_safely_sanitizes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "=HYPERLINK(evil)"), (2, "+SUM(1)"), (3, "'=already"), (4, "plain")],
        "id long, cell string",
    )
    out = str(tmp_path / "report.xlsx")
    n = write_excel_safely(df.orderBy("id"), out, "Report")
    assert n == 4
    _name, rows = decode_xlsx(open(out, "rb").read())
    cells = [r[1] for r in rows[1:]]
    assert cells == ["'=HYPERLINK(evil)", "'+SUM(1)", "'=already", "plain"]


def test_write_excel_safely_rejects_bad_sheet_and_bulk(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "x")
    with pytest.raises(ValueError, match="invalid characters"):
        write_excel_safely(df, str(tmp_path / "a.xlsx"), "bad/name")
    with pytest.raises(ValueError, match="refusing to write"):
        write_excel_safely(df, str(tmp_path / "b.xlsx"), "S", max_rows=3)


def test_distributed_excel_scan(spark, tmp_path):
    for i in range(3):
        rows = [["Time (Seconds)", "Value 1", "Value 2"]] + [
            [float(j), float(10 * i + j), "bad" if j == 2 else float(j) / 2]
            for j in range(4)
        ]
        with open(tmp_path / f"sensor_{i}.xlsx", "wb") as f:
            f.write(encode_xlsx(rows, f"S{i}"))
    df = read_excel_files(spark, str(tmp_path / "*.xlsx"))
    got = df.toPandas().sort_values(["source_file", "Time (Seconds)"]).reset_index(drop=True)
    assert len(got) == 12
    assert list(got.columns) == ["source_file", "Time (Seconds)", "Value 1", "Value 2"]
    assert got["source_file"].nunique() == 3
    # 'bad' coerced to null, numbers preserved
    assert got["Value 2"].isna().sum() == 3
    assert got[got["Time (Seconds)"] == 3.0]["Value 1"].tolist() == [3.0, 13.0, 23.0]


def test_sheet_name_with_quotes_roundtrips():
    """Excel permits double quotes in sheet names; the workbook.xml attribute
    must escape them or the package is corrupt (ADVICE r2)."""
    from series_correction_project_updated_spark.functions.xlsx import (
        decode_xlsx,
        encode_xlsx,
    )

    name, rows = decode_xlsx(encode_xlsx([["a", 1.0]], 'Q "raw" & <check>'))
    assert name == 'Q "raw" & <check>'
    assert rows == [["a", 1.0]]


def test_excel_scan_via_file_uri_glob(spark, tmp_path):
    """The schema peek goes through binaryFile (Hadoop FileSystem), so a
    `file:` URI glob — which driver-local glob.glob cannot resolve — works
    (r2 verdict #7)."""
    import glob as _g

    from series_correction_project_updated_spark.functions.xlsx import encode_xlsx
    from series_correction_project_updated_spark.sources.excel import read_excel_files

    for i in range(2):
        (tmp_path / f"wb{i}.xlsx").write_bytes(
            encode_xlsx([["t", "value"], [float(i), 10.0 + i]], "S")
        )
    uri_glob = f"file:{tmp_path}/*.xlsx"
    assert _g.glob(uri_glob) == []  # local glob can't see the URI form
    out = read_excel_files(spark, uri_glob).toPandas().sort_values("t")
    assert list(out.columns) == ["source_file", "t", "value"]
    assert out["value"].tolist() == [10.0, 11.0]
