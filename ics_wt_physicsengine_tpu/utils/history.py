"""
Historical data logging sinks for the serving loops.

The reference lists historical logging as future work twice: CSV-style
logging (reference README.md:441-447) and "Historical data logging
(Parquet format)" on the Phase 3 roadmap (reference README.md:443). The
orchestrator's ``--log-csv`` covers the first; ``ParquetHistoryLogger``
(``--log-parquet``) covers the second: a streaming columnar sink that
flushes fixed-size row groups through ``pyarrow.parquet.ParquetWriter``,
so a long-running plant writes bounded memory and the file is valid after
every flush.
"""

from __future__ import annotations

from typing import Dict, List, Optional


class ParquetHistoryLogger:
    """Streaming Parquet sink: buffer rows, flush row groups of
    ``rows_per_group``, finalize on close. One fixed schema derived from
    ``fields`` (all float64 except listed ``int_fields``)."""

    def __init__(self, path: str, fields: List[str],
                 int_fields: Optional[List[str]] = None,
                 rows_per_group: int = 256):
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "--log-parquet needs pyarrow (unavailable); use --log-csv"
            ) from e
        self._pa = pa
        ints = set(int_fields or ())
        self.fields = list(fields)
        self._schema = pa.schema(
            [(f, pa.int64() if f in ints else pa.float64())
             for f in self.fields])
        self._writer = pq.ParquetWriter(path, self._schema)
        self._rows_per_group = int(rows_per_group)
        self._buffer: List[Dict] = []
        self.path = path

    def log(self, row: Dict) -> None:
        self._buffer.append(row)
        if len(self._buffer) >= self._rows_per_group:
            self._flush()

    def _flush(self) -> None:
        if not self._buffer:
            return
        cols = {f: [r.get(f) for r in self._buffer] for f in self.fields}
        self._writer.write_table(
            self._pa.table(cols, schema=self._schema))
        self._buffer.clear()

    def close(self) -> None:
        self._flush()
        self._writer.close()
