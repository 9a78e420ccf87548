"""Zone-map file pruning and schema-evolution reads over parquet sinks.

Two read-side capabilities a long-lived partitioned store needs:

- **Zone-map pruned read**: parquet footers already carry per-column
  min/max statistics; when the sink is written clustered on a column
  (the crawl sink clusters on round/shard, an events sink on time), a
  range query should open ONLY the files whose [min, max] intersects
  the range. The metadata pass is itself distributed (one footer read
  per task, light (file, min, max, rows) rows back) so 10^5-file
  directories never serialize footer IO on the driver; the data pass
  then reads just the surviving files WITH the row-level filter pushed
  down for exactness at the file edges.

- **Schema-evolution read**: a sink written over months gains columns
  (the frontier gained ``unchanged_count`` in round 3). ``read_evolved``
  reads heterogeneous part files one-per-task and harmonizes every
  batch to a target schema — missing columns become typed nulls,
  present columns are safely cast, order is fixed — so downstream
  operators see ONE schema without rewriting history.

Both compose with stages/compact.py: compaction preserves footers'
usefulness only if groups are packed from contiguously-clustered files,
which first-fit-decreasing over sorted names approximates for
time-stemmed sinks.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _paths(dir_or_paths) -> list[str]:
    if isinstance(dir_or_paths, str):
        from ..stages.compact import live_files

        return live_files(dir_or_paths)
    return sorted(dir_or_paths)


def file_zone_map(dir_or_paths, col: str):
    """Distributed footer scan: one row per file with the column's
    min/max/rows pulled from parquet metadata ONLY (no data pages are
    read). Returns a small pandas DataFrame (file, vmin, vmax, n_rows);
    files lacking statistics for the column get vmin=vmax=None and are
    never pruned (safe default)."""
    import ray.data

    files = _paths(dir_or_paths)

    def footer(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for f in b["file"]:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            vmin = vmax = None
            n = md.num_rows
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                vmin = st.min if vmin is None else min(vmin, st.min)
                vmax = st.max if vmax is None else max(vmax, st.max)
            if not ok:
                vmin = vmax = None
            out.append((f, vmin, vmax, n))
        return pd.DataFrame(out, columns=["file", "vmin", "vmax", "n_rows"])

    if not files:
        return pd.DataFrame(columns=["file", "vmin", "vmax", "n_rows"])
    return (ray.data.from_items([{"file": f} for f in files])
            .map_batches(footer, batch_format="pandas", batch_size=64)
            .to_pandas())


def pruned_read(dir_or_paths, col: str, lo, hi, columns=None):
    """Range read with file-level zone-map pruning + row-level filter
    pushdown: open only files whose [min, max] intersects [lo, hi],
    then filter rows exactly (inclusive bounds). Returns (Dataset,
    stats) where stats reports files_total / files_read — the measure
    of how much IO the clustering saved."""
    import pyarrow.compute as pc
    import ray.data

    zm = file_zone_map(dir_or_paths, col)
    # stats-less files are never pruned; compare only rows that HAVE
    # stats (an all-None column arrives object-dtype, and a vectorized
    # `None >= lo` would raise before the no_stats mask could shortcut)
    no_stats = zm["vmin"].isna()
    hit = no_stats.copy()
    ok = ~no_stats
    if ok.any():
        hit[ok] = ((zm.loc[ok, "vmax"] >= lo)
                   & (zm.loc[ok, "vmin"] <= hi))
    keep = zm.loc[hit, "file"].tolist()
    stats = {"files_total": len(zm), "files_read": len(keep)}
    flt = (pc.field(col) >= lo) & (pc.field(col) <= hi)
    if not keep:
        first = _paths(dir_or_paths)[0]
        empty = pq.read_schema(first).empty_table()
        if columns:
            empty = empty.select(columns)
        return ray.data.from_arrow(empty), stats
    ds = ray.data.read_parquet(keep, filter=flt, columns=columns)
    return ds, stats


def _spread_bits32(x: "np.ndarray") -> "np.ndarray":
    """Interleave a zero bit after every bit of a 32-bit int (Morton
    spread, the standard magic-mask ladder) -> uint64."""
    import numpy as np

    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def zorder_key(a, b, a_min, a_max, b_min, b_max) -> "np.ndarray":
    """64-bit Morton (Z-order) key of two numeric columns, each
    min-max-normalized to 32 bits. Normalization is float64 — fine for
    LAYOUT (clustering quality), never for correctness: readers always
    re-filter rows exactly, the key only decides which file a row lands
    in."""
    import numpy as np

    def norm(v, lo, hi):
        v = np.asarray(v, dtype=np.float64)
        span = max(float(hi) - float(lo), 1.0)
        return np.clip((v - float(lo)) / span * 0xFFFFFFFF,
                       0, 0xFFFFFFFF).astype(np.uint64)

    return (_spread_bits32(norm(a, a_min, a_max))
            | (_spread_bits32(norm(b, b_min, b_max)) << np.uint64(1)))


def write_zordered(ds, col_a: str, col_b: str, out_dir: str) -> dict:
    """Z-order-clustered write: one stats pass for the two columns'
    min/max (tiny partial rows), a map-side Morton key, a sort on the
    key (range partitioning -> spatially-local files), key dropped at
    write. After this, ``pruned_read`` on EITHER column skips files —
    the multi-dimensional layout a single-column sort can't give.
    Returns the computed bounds {a_min, a_max, b_min, b_max} so callers
    deriving range predicates don't re-scan for them."""
    import numpy as np

    mm = ds.map_batches(
        lambda b: pd.DataFrame({
            "a_min": [b[col_a].min()], "a_max": [b[col_a].max()],
            "b_min": [b[col_b].min()], "b_max": [b[col_b].max()]}),
        batch_format="pandas").to_pandas()
    a_min, a_max = mm["a_min"].min(), mm["a_max"].max()
    b_min, b_max = mm["b_min"].min(), mm["b_max"].max()

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # uint64 keys sort wrong as pandas int64; shift to signed order-
        # preserving int64 (subtract 2^63 via xor of the sign bit)
        zk = zorder_key(b[col_a].to_numpy(), b[col_b].to_numpy(),
                        a_min, a_max, b_min, b_max)
        b["_zkey"] = (zk ^ np.uint64(1 << 63)).view(np.int64)
        return b

    (ds.map_batches(add_key, batch_format="pandas")
       .sort("_zkey")
       .drop_columns(["_zkey"])
       .write_parquet(out_dir))
    return {"a_min": a_min, "a_max": a_max,
            "b_min": b_min, "b_max": b_max}


def read_evolved(dir_or_paths, target_schema: pa.Schema):
    """Read part files with HETEROGENEOUS schemas into one Dataset of
    ``target_schema``: one file per task; per batch, missing columns
    are appended as typed nulls, present ones safe-cast, order fixed.
    Extra columns not in the target are dropped (read-time projection).
    """
    import ray.data

    files = _paths(dir_or_paths)
    names = target_schema.names

    def harmonize(b: pd.DataFrame) -> pa.Table:
        out = []
        for f in b["file"]:
            t = pq.read_table(f)
            cols = []
            for name in names:
                typ = target_schema.field(name).type
                if name in t.column_names:
                    cols.append(t[name].cast(typ))
                else:
                    cols.append(pa.nulls(t.num_rows, type=typ))
            out.append(pa.Table.from_arrays(cols, names=names))
        return pa.concat_tables(out)

    if not files:
        return ray.data.from_arrow(target_schema.empty_table())
    return (ray.data.from_items([{"file": f} for f in files])
            .map_batches(harmonize, batch_format="pandas", batch_size=1))
