#!/usr/bin/env python3
"""Dev-only generator for the .xlsx test fixtures (no openpyxl — hand-built
OOXML so the fixture bytes are reviewable from this script). Run from the
repo root:

    python3 dev/make_xlsx_fixture.py

Writes src/test/resources/fixtures/supplier_sheets.xlsx (the S2 multi-sheet
shape: two data sheets with differing columns plus one all-empty sheet that
the reader must drop) and xlsx_edge.xlsx (sparse rows/cells, inline strings,
rich-text shared strings — parser edge cases)."""
import zipfile

CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
{sheet_overrides}
</Types>"""

ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
<Relationship Id="rIdSS" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def col_letter(i):
    s = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def build(path, sheets, shared, raw_sheet_xml=None):
    """sheets: [(name, rows)] where a cell is ("s", idx) shared-string,
    ("n", "123.4") number, ("skip",) omitted cell, or None for empty."""
    raw_sheet_xml = raw_sheet_xml or {}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets)))
        z.writestr("[Content_Types].xml", CT.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", ROOT_RELS)
        z.writestr("xl/workbook.xml", WB.format(sheets="".join(
            f'<sheet name="{name}" sheetId="{i+1}" r:id="rId{i+1}"/>'
            for i, (name, _) in enumerate(sheets))))
        z.writestr("xl/_rels/workbook.xml.rels", WB_RELS.format(rels="\n".join(
            f'<Relationship Id="rId{i+1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(sheets)))))
        z.writestr("xl/sharedStrings.xml",
                   '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                   f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
                   + "".join(shared) + "</sst>")
        for i, (name, rows) in enumerate(sheets):
            if name in raw_sheet_xml:
                xml = raw_sheet_xml[name]
            else:
                body = []
                for ri, row in enumerate(rows, start=1):
                    cells = []
                    for ci, cell in enumerate(row):
                        if cell is None or cell == ("skip",):
                            continue
                        ref = f"{col_letter(ci)}{ri}"
                        kind, val = cell
                        if kind == "s":
                            cells.append(f'<c r="{ref}" t="s"><v>{val}</v></c>')
                        else:
                            cells.append(f'<c r="{ref}"><v>{val}</v></c>')
                    body.append(f'<row r="{ri}">' + "".join(cells) + "</row>")
                xml = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                       '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                       "<sheetData>" + "".join(body) + "</sheetData></worksheet>")
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", xml)


FIX = "src/test/resources/fixtures"

# --- supplier_sheets.xlsx: the q46 S2 shape ------------------------------
shared = ["<si><t>code</t></si>", "<si><t>amount</t></si>",
          "<si><t>note</t></si>", "<si><t>A1</t></si>", "<si><t>A2</t></si>",
          "<si><t>B1</t></si>", "<si><t>extra</t></si>"]
build(f"{FIX}/supplier_sheets.xlsx", [
    ("Sheet1", [[("s", 0), ("s", 1)],
                [("s", 3), ("n", "10")],
                [("s", 4), ("n", "20")]]),
    ("Sheet2", [[("s", 0), ("s", 1), ("s", 2)],
                [("s", 5), ("n", "30"), ("s", 6)]]),
    ("Empty",  [[]]),
], shared)

# --- xlsx_many/: multi-workbook glob (q66) -------------------------------
# Workbook A repeats the q46 shape. Workbook B also has a sheet named
# "Sheet1" but with the column order REVERSED (amount, code) plus its own
# extra sheet — per-(file, sheet) header keying is observable: rows must
# land under the right names, never under workbook A's header.
import os
os.makedirs(f"{FIX}/xlsx_many", exist_ok=True)
build(f"{FIX}/xlsx_many/supplier_a.xlsx", [
    ("Sheet1", [[("s", 0), ("s", 1)],
                [("s", 3), ("n", "10")],
                [("s", 4), ("n", "20")]]),
    ("Sheet2", [[("s", 0), ("s", 1), ("s", 2)],
                [("s", 5), ("n", "30"), ("s", 6)]]),
    ("Empty",  [[]]),
], shared)
shared_b = ["<si><t>amount</t></si>", "<si><t>code</t></si>",
            "<si><t>C1</t></si>", "<si><t>C2</t></si>",
            "<si><t>qty</t></si>", "<si><t>D1</t></si>"]
build(f"{FIX}/xlsx_many/supplier_b.xlsx", [
    ("Sheet1", [[("s", 0), ("s", 1)],          # amount, code — reversed!
                [("n", "40"), ("s", 2)],
                [("n", "50"), ("s", 3)]]),
    ("Other",  [[("s", 1), ("s", 4)],          # code, qty
                [("s", 5), ("n", "7")]]),
], shared_b)

# --- ole2_fake.xlsx: a lying extension (S3 magic-bytes sniff) ------------
# OLE2 compound-file signature + padding: a legacy .xls renamed .xlsx must
# land in the reject channel, not die in a zip stack trace.
with open(f"{FIX}/ole2_fake.xlsx", "wb") as f:
    f.write(bytes([0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1]))
    f.write(b"\x00" * 504)

# --- xlsx_edge.xlsx: parser edge cases -----------------------------------
# sparse rows (row 2 missing), sparse cells (C before gap), inline string,
# rich-text shared string split into runs
edge_shared = ["<si><r><t>ri</t></r><r><t>ch</t></r></si>"]
edge_sheet1 = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    "<sheetData>"
    '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1"><v>7</v></c></row>'
    '<row r="3"><c r="B3" t="inlineStr"><is><t>inline text</t></is></c></row>'
    "</sheetData></worksheet>")
build(f"{FIX}/xlsx_edge.xlsx", [("Edge", [])], edge_shared,
      raw_sheet_xml={"Edge": edge_sheet1})

# --- xlsx_empty_header.xlsx: zero-cell header row ------------------------
# Sheet "NoHdr": row 1 is ABSENT from the XML, so the header row gap-fills
# to zero cells while data rows exist below it — the reader must DROP the
# sheet (the driver-era tolerance), not die in map_from_arrays on a
# zero-length name array. Sheet "Good" is normal so the union still
# yields rows from the same workbook.
nohdr_xml = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    "<sheetData>"
    '<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>11</v></c></row>'
    '<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3"><v>22</v></c></row>'
    "</sheetData></worksheet>")
build(f"{FIX}/xlsx_empty_header.xlsx", [
    ("NoHdr", []),
    ("Good", [[("s", 0), ("s", 1)],
              [("s", 5), ("n", "99")]]),
], shared, raw_sheet_xml={"NoHdr": nohdr_xml})

print("wrote", f"{FIX}/supplier_sheets.xlsx", f"{FIX}/xlsx_edge.xlsx",
      "and", f"{FIX}/xlsx_empty_header.xlsx")
