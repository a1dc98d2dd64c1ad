"""Dependency-free .xlsx reader (io/xlsx.py) + wheel-table xlsx path.

Generates real OOXML zip structures in the test (sharedStrings, inline
strings, numbers, blank cells) and checks the reader against the same data
through the csv path of ``ops.ov_metrics.read_wheel_table``."""

import csv
import zipfile

from mertools_tpu.io.xlsx import read_xlsx_records, read_xlsx_rows
from mertools_tpu.ops.ov_metrics import read_wheel_table

_CT = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_WB_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="/xl/worksheets/sheet1.xml"/>
</Relationships>"""


def _make_xlsx(path, rows, strings):
    """rows: list of list of (cell_ref, xml) already rendered."""
    sst = ('<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
           'org/spreadsheetml/2006/main">' +
           "".join(f"<si><t>{s}</t></si>" for s in strings) + "</sst>")
    body = ""
    for i, cells in enumerate(rows):
        body += f'<row r="{i + 1}">' + "".join(cells) + "</row>"
    ws = ('<?xml version="1.0"?><worksheet xmlns="http://schemas.'
          'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
          + body + "</sheetData></worksheet>")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", ws)


def _s(ref, si):
    return f'<c r="{ref}" t="s"><v>{si}</v></c>'


def _n(ref, v):
    return f'<c r="{ref}"><v>{v}</v></c>'


def test_read_xlsx_cell_types(tmp_path):
    p = str(tmp_path / "t.xlsx")
    strings = ["name", "score", "label", "anger"]
    rows = [
        [_s("A1", 0), _s("B1", 1), _s("C1", 2)],
        [_s("A2", 3), _n("B2", 2.5), '<c r="C2" t="inlineStr">'
                                     "<is><t>joy</t></is></c>"],
        # sparse row: only column C present
        [_n("C3", 7)],
    ]
    _make_xlsx(p, rows, strings)
    recs = read_xlsx_records(p)
    assert recs[0] == {"name": "anger", "score": 2.5, "label": "joy"}
    assert recs[1] == {"name": None, "score": None, "label": 7}
    assert read_xlsx_rows(p)[0] == ["name", "score", "label"]


def test_wheel_table_xlsx_matches_csv(tmp_path):
    # level1/level2/level3 with forward-filled blanks (wheel.py layout)
    data = [("joy", "cheerful", "amused"),
            ("", "", "delighted"),
            ("", "content", "pleased"),
            ("anger", "rage", "furious")]
    csv_path = str(tmp_path / "wheel1.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["level1", "level2", "level3"])
        w.writerows(data)

    strings = ["level1", "level2", "level3"]
    rows = [[_s("A1", 0), _s("B1", 1), _s("C1", 2)]]
    for i, (a, b, c) in enumerate(data):
        cells = []
        for col, val in zip("ABC", (a, b, c)):
            if val:
                strings.append(val)
                cells.append(_s(f"{col}{i + 2}", len(strings) - 1))
        rows.append(cells)
    xlsx_path = str(tmp_path / "wheel1.xlsx")
    _make_xlsx(xlsx_path, rows, strings)

    assert read_wheel_table(xlsx_path) == read_wheel_table(csv_path)
    wheel = read_wheel_table(xlsx_path)
    assert wheel["joy"]["cheerful"] == ["amused", "delighted"]
    assert wheel["joy"]["content"] == ["pleased"]
    assert wheel["anger"]["rage"] == ["furious"]
