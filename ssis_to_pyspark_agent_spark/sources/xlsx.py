"""Minimal stdlib .xlsx reader (no jars, no third-party deps).

An .xlsx file is a zip of XML parts; a tabular sheet needs only three:
``xl/workbook.xml`` (sheet name -> sheet index), ``xl/sharedStrings.xml``
(the string pool), ``xl/worksheets/sheetN.xml`` (cells). That subset —
inline/shared strings, numbers, booleans — covers what SSIS's Excel
Source reads (reference enhanced_json_mapper.py:62-69 delegates to the
crealytics jar for the same job).

Driver-side by design: spreadsheets are bounded artifacts (the format
caps at ~1M rows); the parsed rows land in a DataFrame and everything
downstream is distributed. Not a path for big data — that's parquet.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")


def _col_index(cell_ref: str) -> int:
    """'C7' -> 2 (zero-based column)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Minimal stdlib .xlsx writer (inverse of :func:`read_xlsx`).

    Strings go as inline strings (no shared-string pool needed), bools as
    't="b"', numbers as untyped cells. Floats are written with ``repr``
    (shortest round-trip form), so read-back through a declared schema is
    value-exact. Bounded by design — the format caps at ~1M rows; callers
    (sink.excel) enforce the cap before collecting."""
    from xml.sax.saxutils import escape

    def cell(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            # OOXML numeric <v> cannot hold nan/inf — real Excel reports
            # a corrupt workbook. Emit an empty cell (how Excel itself
            # represents a blank) instead of repr(nan).
            if isinstance(v, float) and (v != v or v in (
                float("inf"), float("-inf")
            )):
                return ""
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(v))}</t></is></c>")

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(ord("A") + r) + out
        return out

    body = "".join(
        f'<row r="{ri + 1}">'
        + "".join(cell(f"{col_ref(ci)}{ri + 1}", v) for ci, v in enumerate(row))
        + "</row>"
        for ri, row in enumerate(rows)
    )
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg_rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    ct_ns = "http://schemas.openxmlformats.org/package/2006/content-types"
    sheet_xml = (f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
                 f"<sheetData>{body}</sheetData></worksheet>")
    # attribute context: quotes must be escaped too (escape() alone only
    # covers &<> — a sheet name with '"' would corrupt the workbook XML)
    sheet_attr = escape(sheet_name, {'"': "&quot;"})
    workbook = (f'<?xml version="1.0"?><workbook xmlns="{ns}" '
                f'xmlns:r="{rel_ns}"><sheets>'
                f'<sheet name="{sheet_attr}" sheetId="1" '
                f'r:id="rId1"/></sheets></workbook>')
    wb_rels = (f'<?xml version="1.0"?><Relationships xmlns="{pkg_rel_ns}">'
               f'<Relationship Id="rId1" Type="{rel_ns}/worksheet" '
               f'Target="worksheets/sheet1.xml"/></Relationships>')
    pkg_rels = (f'<?xml version="1.0"?><Relationships xmlns="{pkg_rel_ns}">'
                f'<Relationship Id="rId1" '
                f'Type="{rel_ns}/officeDocument" '
                f'Target="xl/workbook.xml"/></Relationships>')
    content_types = (
        f'<?xml version="1.0"?><Types xmlns="{ct_ns}">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="'
        'application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", pkg_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def read_xlsx(path: str, sheet: str | None = None) -> list[list]:
    """Rows of python values (str/float/bool/None) from one sheet."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = wb.findall(f"{_NS}sheets/{_NS}sheet")
        if sheet is None:
            target = sheets[0]
        else:
            target = next(s for s in sheets if s.get("name") == sheet)
        # resolve the relationship id to the worksheet part
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid = target.get(f"{_REL_NS}id")
        rel = next(
            r for r in rels
            if r.get("Id") == rid
        )
        # rel Target is usually relative to xl/ ('worksheets/sheet1.xml')
        # but some writers emit absolute ('/xl/worksheets/sheet1.xml')
        target = rel.get("Target")
        part = target.lstrip("/") if target.startswith("/") else "xl/" + target

        ws = ET.fromstring(z.read(part))
        rows: list[list] = []
        for row_el in ws.find(f"{_NS}sheetData").findall(f"{_NS}row"):
            row: list = []
            for c in row_el.findall(f"{_NS}c"):
                idx = _col_index(c.get("r", "A1"))
                while len(row) < idx:
                    row.append(None)
                ctype = c.get("t", "n")
                v_el = c.find(f"{_NS}v")
                is_el = c.find(f"{_NS}is")
                if ctype == "s" and v_el is not None:
                    val = shared[int(v_el.text)]
                elif ctype == "inlineStr" and is_el is not None:
                    val = "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                elif ctype == "b" and v_el is not None:
                    val = v_el.text == "1"
                elif v_el is not None and v_el.text is not None:
                    val = float(v_el.text)
                else:
                    val = None
                row.append(val)
            rows.append(row)
        width = max((len(r) for r in rows), default=0)
        return [r + [None] * (width - len(r)) for r in rows]
