"""Minimal from-scratch .xlsx writer (S2, /root/reference/README.md:2
"outputs a clean, standardized Excel file").

An .xlsx file is a ZIP of a few fixed XML parts plus one sheet XML
(ECMA-376 / ISO 29500, public spec). No third-party library is needed
for a single-sheet untyped export: numbers are written as numeric
cells, everything else as inline strings. Readable by Excel,
LibreOffice, pandas.read_excel(engine="openpyxl"), and duckdb's
spreadsheet reader.

Scale note: a spreadsheet is a driver-side convenience sink for SMALL
results (bounded by the caller), never a distributed output format —
the scale sink is partitioned parquet (pipelines/flagship.py).
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

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

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


import re as _re

# Control chars are ILLEGAL in XML 1.0 even when entity-escaped; OOXML
# encodes them as _xHHHH_ (and escapes literal _xHHHH_ sequences in the
# input as _x005F_xHHHH_ so decoding is unambiguous). \r is included
# although legal XML: parsers normalize it to \n (XML line-ending
# rules), so only the encoded form round-trips — Excel does the same.
_XML_ILLEGAL_RX = _re.compile(r"[\x00-\x08\x0b-\x1f]")
_OOXML_LITERAL_RX = _re.compile(r"_(?=x[0-9A-Fa-f]{4}_)")
_OOXML_DECODE_RX = _re.compile(r"_x([0-9A-Fa-f]{4})_")


def _ooxml_encode(s: str) -> str:
    s = _OOXML_LITERAL_RX.sub("_x005F_", s)
    return _XML_ILLEGAL_RX.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def _ooxml_decode(s: str) -> str:
    return _OOXML_DECODE_RX.sub(lambda m: chr(int(m.group(1), 16)), s)


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
            value = str(value)  # NaN/inf: not representable as numeric cells
        else:
            return f'<c r="{ref}"><v>{value!r}</v></c>'
    s = escape(_ooxml_encode(str(value)))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{s}</t></is></c>'


def write_xlsx(path: str, header: list[str], rows: list[list]) -> str:
    """Write one sheet with a header row + data rows; returns `path`."""
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
             "<sheetData>"]
    for r, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
        cells = "".join(_cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row))
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    sheet_xml = "".join(parts)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return path


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """Minimal reader for round-trip tests: parses sheet1's inline
    strings / numeric / bool cells back into (header, rows)."""
    import re as _re
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    grid: list[list] = []
    for row_el in root.findall(".//m:row", ns):
        row: list = []
        for c in row_el.findall("m:c", ns):
            ref = c.attrib.get("r", "")
            col = 0
            for ch in _re.match(r"[A-Z]+", ref).group(0):
                col = col * 26 + (ord(ch) - ord("A") + 1)
            col -= 1
            while len(row) < col:
                row.append(None)
            kind = c.attrib.get("t", "n")
            if kind == "inlineStr":
                t_el = c.find("m:is/m:t", ns)
                row.append(_ooxml_decode(t_el.text or "") if t_el is not None else "")
            else:
                v_el = c.find("m:v", ns)
                raw = v_el.text if v_el is not None else None
                if raw is None:
                    row.append(None)
                elif kind == "b":
                    row.append(raw == "1")
                else:
                    row.append(int(raw) if _re.fullmatch(r"-?\d+", raw) else float(raw))
        grid.append(row)
    header = [str(v) for v in (grid[0] if grid else [])]
    return header, grid[1:]
