"""Minimal dependency-free XLSX codec (stdlib zipfile + ElementTree only).

Closes the reference's Excel surface (S3 scan / K1 sink — openpyxl-based,
scripts/spreadsheet_safety.py:335-338, export_comparison_sheets.py:180-188)
without any Excel library: XLSX is a ZIP of XML parts, and the subset the
reference actually uses — one sheet of typed cells with a header row — needs
four fixed parts plus a worksheet. Strings are written INLINE (``t=
"inlineStr"``) so no sharedStrings part is needed; the reader additionally
understands ``t="s"`` (shared strings), ``t="str"``/``t="b"`` and plain
numeric cells so externally-produced files load too.

Encoding/decoding is plain bytes↔rows — Spark-agnostic on purpose; the
distributed plumbing lives in ``sources/excel.py``.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def col_letter(idx: int) -> str:
    """0-based column index → A1-style letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def encode_xlsx(rows: list[list], sheet_name: str = "Sheet1") -> bytes:
    """rows (first row = header; cells str/int/float/bool/None) → xlsx bytes."""
    cells_xml: list[str] = ["<sheetData>"]
    for r, row in enumerate(rows, start=1):
        cells_xml.append(f'<row r="{r}">')
        for c, val in enumerate(row):
            ref = f"{col_letter(c)}{r}"
            if val is None:
                continue
            if isinstance(val, bool):
                cells_xml.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells_xml.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                s = escape(str(val))
                cells_xml.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{s}</t></is></c>'
                )
        cells_xml.append("</row>")
    cells_xml.append("</sheetData>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}">' + "".join(cells_xml) + "</worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_REL_NS}"><sheets>'
        # attribute context: escape() alone leaves double quotes intact and a
        # name like 'Q "raw"' (legal in Excel) would corrupt workbook.xml
        f'<sheet name="{escape(sheet_name, {chr(34): "&quot;"})}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(letters: str) -> int:
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def decode_xlsx(payload: bytes) -> tuple[str, list[list]]:
    """xlsx bytes → (sheet_name, rows). Cells come back as str | float |
    bool | None; ragged rows are padded with None to the widest row."""
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{{{_NS}}}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS}}}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheet_el = wb.find(f"{{{_NS}}}sheets/{{{_NS}}}sheet")
        sheet_name = sheet_el.get("name", "Sheet1") if sheet_el is not None else "Sheet1"
        sheet_path = next(
            n for n in names if n.startswith("xl/worksheets/") and n.endswith(".xml")
        )
        ws = ET.fromstring(z.read(sheet_path))

    rows: list[list] = []
    for row_el in ws.iter(f"{{{_NS}}}row"):
        row: list = []
        for c_el in row_el.findall(f"{{{_NS}}}c"):
            ref = c_el.get("r", "")
            m = _CELL_REF_RE.match(ref)
            col = _col_index(m.group(1)) if m else len(row)
            while len(row) < col:
                row.append(None)
            t = c_el.get("t", "n")
            if t == "inlineStr":
                val = "".join(
                    el.text or "" for el in c_el.iter(f"{{{_NS}}}t")
                )
            else:
                v_el = c_el.find(f"{{{_NS}}}v")
                raw = v_el.text if v_el is not None else None
                if raw is None:
                    val = None
                elif t == "s":
                    val = shared[int(raw)]
                elif t == "b":
                    val = raw == "1"
                elif t == "str":
                    val = raw
                else:
                    val = float(raw)
            row.append(val)
        rows.append(row)
    width = max((len(r) for r in rows), default=0)
    for r in rows:
        r.extend([None] * (width - len(r)))
    return sheet_name, rows
