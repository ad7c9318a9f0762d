"""Fixed-width line-item extraction (payload family ``fixedwidth_table``).

Re-expresses ``mancini-beverage-invoice/invoice.py``:

* grid synthesis M6 — the reference recovers a cell grid from 14 explicit
  vertical line positions (invoice.py:42); payloads here are fixed-width
  text with the same column-boundary semantics, sliced at
  ``fixtures.payloads.FIXED_BOUNDS`` (13 columns),
* column projection F8 — drop columns [2, 5, 7] (invoice.py:138),
* length-predicate row drops F7 — drop rows where len(col1) < 2,
  len(col4) < 2 or >= 7 (invoice.py:141-143),
* scrubs X13 — strip, ``\\|`` removal everywhere, non-digit strip on
  numeric columns 0/1/3 for data rows, ``;`` removal on column 3
  (invoice.py:146-150). The reference keeps the header as row 0 and
  scrubs only ``df.loc[1:]``; we keep that split: header row preserved,
  data rows scrubbed.

Output columns (FIXTURES.md §2.6): loc, num, cases, size, description,
price, disc, price2, deposit_total, total.
"""

from __future__ import annotations

import re

from ..fixtures.payloads import FIXED_BOUNDS

_DROP = (2, 5, 7)  # invoice.py:138
_PIPE = re.compile(r"\|")
_NON_DIGIT = re.compile(r"\D")

OUT_COLUMNS = [
    "loc", "num", "cases", "size", "description",
    "price", "disc", "price2", "deposit_total", "total",
]


def _slice_row(line: str) -> list[str]:
    return [
        line[FIXED_BOUNDS[i] : FIXED_BOUNDS[i + 1]]
        for i in range(len(FIXED_BOUNDS) - 1)
    ]


def extract(payload: str) -> dict:
    lines = [ln for ln in payload.split("\n") if ln != ""]
    if not lines:
        return {"extracted_text": "", "spans": [], "records": [], "parse_errors": 0}
    grid = [_slice_row(ln) for ln in lines]

    records: list[dict] = []
    for i, row in enumerate(grid):
        c1 = row[1].strip()
        c4 = row[4].strip()
        # F7 (invoice.py:141-143); header row 0 passes in the reference
        # because its cells are wide labels.
        if len(c1) < 2 or len(c4) < 2 or len(c4) >= 7:
            continue
        # F8 column drop (invoice.py:138)
        cells = [c for j, c in enumerate(row) if j not in _DROP]
        # X13 scrubs (invoice.py:146-150). The reference addresses pandas
        # column LABELS 0/1/3 after the drop of [2,5,7]; label 3 is
        # position 2 (cases) in the compacted row.
        cells = [_PIPE.sub("", c.strip()) for c in cells]
        if i > 0:  # df.loc[1:] — data rows only
            cells[0] = _NON_DIGIT.sub("", cells[0])
            cells[1] = _NON_DIGIT.sub("", cells[1])
            cells[2] = _NON_DIGIT.sub("", cells[2])
        cells[2] = cells[2].replace(";", "")
        rec = dict(zip(OUT_COLUMNS, cells))
        rec["is_header"] = i == 0
        records.append(rec)
    return {
        "extracted_text": "\n".join(lines),
        "spans": [],
        "records": records,
        "parse_errors": 0,
    }
