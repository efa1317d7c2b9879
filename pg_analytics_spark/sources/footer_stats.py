"""Shared parquet-footer min/max walk for the native lakehouse writers.

Both the Delta writer (add-action ``stats`` JSON) and the Iceberg
writer (Appendix-D ``lower_bounds``/``upper_bounds``) need per-column
[min, max] over all row groups of a freshly-written file; only the
output ENCODING differs.  One walk, two encoders.
"""

from __future__ import annotations


def footer_minmax(path: str) -> tuple[dict[str, tuple], int]:
    """({column: (lo, hi)}, num_rows) from a parquet footer.

    A column appears only when EVERY row group carries usable min/max
    statistics (a partial bound is not a bound).  Raises on an
    unreadable footer — callers choose whether stats are optional."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    col_idx: dict[str, int] = {}
    if md.num_row_groups:
        rg0 = md.row_group(0)
        for i in range(rg0.num_columns):
            col_idx[rg0.column(i).path_in_schema] = i
    out: dict[str, tuple] = {}
    for name, ci in col_idx.items():
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok and lo is not None:
            out[name] = (lo, hi)
    return out, md.num_rows
