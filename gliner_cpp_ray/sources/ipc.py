"""Arrow IPC (Feather v2) sink + source for Ray Data.

Ray Data ships CSV/JSON/Parquet IO but no Arrow-IPC file format.  IPC
is the zero-parse interchange format (the on-disk bytes ARE Arrow
buffers), so a sink/source pair is cheap and useful for handing blocks
to non-Parquet consumers (Arrow Flight, DuckDB ``read_ipc``, pandas
``read_feather``).

Both directions stay streaming:

* ``write_ipc(ds, out_dir)`` — each map task serializes ITS OWN block
  to one ``.arrow`` file and emits a one-row manifest (path, rows);
  consuming the returned manifest dataset materializes the writes.
  No driver-side collect, any block size.
* ``read_ipc(paths)`` — ``read_binary_files`` distributes the file
  list; each map task decodes its files back to Arrow tables.  A
  whole file decodes as one batch, so write-side block sizing governs
  read-side batch sizing.

Multi-node note: paths must live on storage every node sees (object
store, NFS); a node-local ``/tmp`` only works single-node.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.ipc as pipc


def write_ipc(ds, out_dir: str):
    """Write each block of ``ds`` as one Arrow IPC file under
    ``out_dir``; returns the (path, rows) manifest dataset — consume it
    (e.g. ``.to_pandas()``) to force the writes."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64())}
            )
        path = os.path.join(out_dir, f"{uuid.uuid4().hex}.arrow")
        with pipc.new_file(path, t.schema) as writer:
            writer.write_table(t)
        return pa.table(
            {"path": pa.array([path], pa.string()),
             "rows": pa.array([t.num_rows], pa.int64())}
        )

    return ds.map_batches(write_block, batch_format="pyarrow")


def read_ipc(paths):
    """Read ``.arrow`` IPC files (a directory or explicit path list)
    back as a Dataset; one file decodes as one Arrow batch."""
    import ray.data as rd

    def decode(t: pa.Table) -> pa.Table:
        tables = []
        for buf in t.column("bytes"):
            with pipc.open_file(pa.BufferReader(buf.as_py())) as reader:
                tables.append(reader.read_all())
        return pa.concat_tables(tables)

    return rd.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow"
    )
