"""Custom Python Data Source (Spark 4 DataSource API): distributed
worksheet-grid reader.

The reference ingests spreadsheet worksheets one at a time on the
driver (etl/extract.py:15-29 — fetch grid, repair header, build rows).
That shape caps ingest at one worksheet + one process. This source is
the executor-side version: a DIRECTORY of exported grid files (CSV
landing, one file per worksheet) becomes one Spark scan with one input
partition per file — each task repairs its own file's header and emits
canonical columns, so a 10k-worksheet backfill ingests with 10k-way
parallelism instead of a driver loop.

Registered via ``spark.dataSource.register(SheetGridDataSource)`` and
read with ``spark.read.format("sheetgrid")`` — the same plugin surface
any Spark-native source uses, which is the point: grid repair becomes a
*scan*, not a driver preprocess, and everything downstream (pruning,
the shaping transforms, integrity splits) composes unchanged.

Schema policy: grids are stringly-typed and their physical headers
drift (the reference's repair/fuzzy-rename problem), so the caller
declares the CANONICAL columns it wants (``columns`` option); each
file's cells are matched by repaired-header name and missing columns
land as NULL — the same guarantee `grid_to_df(ensure_columns=...)`
gives driver-side. Typing happens downstream via
`grid.infer_column_types` / explicit casts, as everywhere else.
"""

from __future__ import annotations

import csv
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .grid import repair_header

ROW_IDX = "_row_idx"
SHEET_COL = "_sheet"


class SheetGridDataSource(DataSource):
    """``spark.read.format("sheetgrid")`` — options:

    - ``path``: directory containing ``*.csv`` grid exports (required);
    - ``columns``: comma-separated canonical column names (required);
    - ``header_row``: 1-based row holding the header (default 2 — the
      reference's cursos/estudiantes layout; 3 for matriculas, 6 for
      pagos).
    """

    @classmethod
    def name(cls) -> str:
        return "sheetgrid"

    def schema(self) -> str:
        cols = _columns_option(self.options)
        fields = [f"`{SHEET_COL}` string", f"`{ROW_IDX}` bigint"]
        fields += [f"`{c}` string" for c in cols]
        return ", ".join(fields)

    def reader(self, schema) -> "SheetGridReader":
        return SheetGridReader(self.options)


def _columns_option(options: dict) -> list[str]:
    raw = options.get("columns")
    if not raw:
        raise ValueError("sheetgrid source requires a 'columns' option")
    cols = [c.strip() for c in raw.split(",") if c.strip()]
    if not cols:
        raise ValueError("sheetgrid 'columns' option is empty")
    return cols


class SheetGridReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sheetgrid source requires a 'path' option")
        self.columns = _columns_option(options)
        self.header_row = int(options.get("header_row", 2))

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per worksheet file — the planner schedules one
        # task each; a 10k-file backfill is a 10k-task scan
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".csv")
        )
        if not files:
            raise ValueError(f"sheetgrid: no .csv files under {self.path!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # runs on the executor: this task owns exactly one file
        fpath = partition.value
        sheet = os.path.splitext(os.path.basename(fpath))[0]
        with open(fpath, newline="", encoding="utf-8") as fh:
            grid = list(csv.reader(fh))
        if len(grid) < self.header_row:
            raise ValueError(
                f"sheetgrid: {fpath} has {len(grid)} rows; header expected "
                f"at row {self.header_row}"
            )
        header = repair_header([str(c) for c in grid[self.header_row - 1]])
        # canonical-column → physical position in THIS file (None if absent)
        pos = {c: (header.index(c) if c in header else None) for c in self.columns}
        for i, raw in enumerate(grid[self.header_row :]):
            cells = [
                (str(c) if c not in (None, "") else None) for c in raw[: len(header)]
            ]
            cells += [None] * (len(header) - len(cells))
            if all(v is None for v in cells):
                continue  # F5: all-empty-row drop, same as grid_to_df
            yield (
                sheet,
                i,
                *(cells[p] if p is not None else None for p in pos.values()),
            )
