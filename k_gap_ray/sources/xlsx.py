"""Excel (.xlsx) export for small result tables — stdlib only.

Parity target: the reference's notebook export surface
(`docs/components/jupyter.md:575-585`), which is
``df.to_excel('/data/export.xlsx', index=False)`` over a query
result.  This sandbox has no openpyxl/xlsxwriter, and the operation
is inherently a SMALL-RESULT sink (a human opens the file), so we
emit the minimal Office Open XML package directly with ``zipfile``:

    [Content_Types].xml      content-type map
    _rels/.rels              package -> workbook relationship
    xl/workbook.xml          one-sheet workbook
    xl/_rels/workbook.xml.rels
    xl/worksheets/sheet1.xml header row + data rows

Numbers (int/float, non-NaN) become numeric cells; everything else
becomes an inline string (no shared-string table — simpler, and for
export-sized results the size difference is irrelevant).  Nulls become
empty cells.

Scale note: this is deliberately a DRIVER-SIDE sink for human-sized
exports (the cap asserts that).  Big-data output goes through the
partitioned parquet writers in ops/materialize.py; this module is the
last hop after a LIMIT / aggregate, exactly like the reference's
notebook ``to_excel`` call.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

MAX_EXPORT_ROWS = 1_048_575  # xlsx sheet limit minus header row

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
    '</Types>')

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/>'
    '</Relationships>')

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/>'
    '</Relationships>')


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" '
        'r:id="rId1"/></sheets></workbook>')


def _col_letter(i: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell(ref: str, v) -> str:
    if v is None:
        return f'<c r="{ref}"/>'
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        if v != v:  # NaN
            return f'<c r="{ref}"/>'
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f'{escape(str(v))}</t></is></c>')


def _to_records(data) -> tuple[list[str], list[list]]:
    """Accept pandas DataFrame, pyarrow Table, or small ray Dataset."""
    import pandas as pd
    import pyarrow as pa

    if hasattr(data, "to_pandas") and not isinstance(
            data, (pd.DataFrame, pa.Table)):
        data = data.to_pandas()  # ray Dataset (small result by contract)
    if isinstance(data, pa.Table):
        cols = data.column_names
        pydata = [data.column(c).to_pylist() for c in cols]
        rows = [[pydata[j][i] for j in range(len(cols))]
                for i in range(data.num_rows)]
        return cols, rows
    cols = [str(c) for c in data.columns]
    rows = [[None if v is pd.NaT or (isinstance(v, float) and v != v)
             else v for v in rec]
            for rec in data.itertuples(index=False, name=None)]
    return cols, rows


def write_xlsx(data, path: str, sheet_name: str = "Sheet1") -> int:
    """Write a small table to ``path`` as a one-sheet .xlsx.

    Returns the number of data rows written.  Header row = column
    names.  Raises if the result exceeds the sheet's row capacity —
    that is the signal you wanted a parquet sink, not Excel.
    """
    cols, rows = _to_records(data)
    if len(rows) > MAX_EXPORT_ROWS:
        raise ValueError(
            f"{len(rows)} rows exceed xlsx capacity ({MAX_EXPORT_ROWS}); "
            "use a parquet/CSV sink for big results")
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    header = "".join(_cell(f"{_col_letter(j)}1", c)
                     for j, c in enumerate(cols))
    parts.append(f'<row r="1">{header}</row>')
    for i, rec in enumerate(rows, start=2):
        body = "".join(_cell(f"{_col_letter(j)}{i}", v)
                       for j, v in enumerate(rec))
        parts.append(f'<row r="{i}">{body}</row>')
    parts.append("</sheetData></worksheet>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", "".join(parts))
    return len(rows)


def read_xlsx(path: str):
    """Read back a sheet written by :func:`write_xlsx` into a pandas
    DataFrame (numbers stay numeric, inline strings stay strings).
    Exists so round-trip tests — and users without Excel — can verify
    exports; it only supports the subset this module writes."""
    import xml.etree.ElementTree as ET

    import pandas as pd

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    raw_rows: list[list] = []
    for row in root.iter(f"{ns}row"):
        vals = []
        for c in row.iter(f"{ns}c"):
            t = c.get("t")
            if t == "inlineStr":
                el = c.find(f"{ns}is/{ns}t")
                vals.append("" if el is None else (el.text or ""))
            else:
                v = c.find(f"{ns}v")
                if v is None or v.text is None:
                    vals.append(None)
                elif t == "b":
                    vals.append(bool(int(v.text)))
                else:
                    num = float(v.text)
                    vals.append(int(num) if num.is_integer() and
                                "." not in v.text else num)
        raw_rows.append(vals)
    if not raw_rows:
        return pd.DataFrame()
    header, data = raw_rows[0], raw_rows[1:]
    # dtype=object: keep exact cell values (pandas would otherwise
    # coerce an int column containing a null to float64)
    return pd.DataFrame(data, columns=header, dtype=object)
