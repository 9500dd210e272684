"""Sources / sinks (reference ``io.py``).

The reference's three CSV ingest paths — eager pandas, 10k-row chunked
load, SQLite-CLI ``.import`` (``/root/reference/pandasql/io.py:12-66``) —
exist only because a single process must avoid holding a big file in
memory. ``spark.read.csv`` subsumes all three: the scan is split into
partitions, schema inference samples the file, and spill is native.
"""

from .io import (
    read_csv,
    read_json,
    read_numpy,
    read_orc,
    read_parquet,
    read_pickle,
    read_binary_files,
    write_compacted,
)

__all__ = [
    "read_binary_files",
    "read_csv",
    "read_json",
    "read_numpy",
    "read_orc",
    "read_parquet",
    "read_pickle",
    "write_compacted",
]
