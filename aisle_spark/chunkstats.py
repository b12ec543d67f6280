"""Per-chunk (page-level) statistics: the engine's analog of the parquet
page index that aisle's second pruning granularity consumes
(/root/reference/src/prune/page.rs:71-137, src/prune/cmp.rs:216-270,
src/prune/eval.rs:66-176).

Each 4096-row block stores, per scalar column, min/max/null-count arrays
over fixed ROW_CHUNK-row chunks. Block-level stats prune whole blocks via
Catalyst; these arrays refine INSIDE the reader: before decoding anything,
``chunk_keep`` evaluates the same Kleene tri-state the manifest filter
uses — but vectorized in numpy over the chunk arrays — and a block whose
every chunk is definitely-false is skipped without touching a single
payload byte (the reference's page-index cut rows-read 79.5%,
/root/reference/benches/df_compare/README.md:43).

Soundness invariants match filterspec's:
  f[i] True  => no row in chunk i evaluates TRUE   (prunable)
  t[i] True  => no row in chunk i evaluates FALSE  (Not-prunable dual)
All-null chunks set both (every row is NULL). Unsupported leaves return
(False, False) = Unknown — never a wrong skip.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

ROW_CHUNK = 512

_EPOCH = _dt.datetime(1970, 1, 1)
_EPOCH_DATE = _dt.date(1970, 1, 1)


def n_chunks(n_rows: int) -> int:
    return (n_rows + ROW_CHUNK - 1) // ROW_CHUNK


# ---------------------------------------------------------------------------
# encode side: per-chunk stat arrays for one column
# ---------------------------------------------------------------------------


def chunk_stats_int(vals: np.ndarray, valid: np.ndarray | None, n: int) -> dict:
    """Per-chunk min/max/nulls for an int-kind column. ``vals`` holds the
    NON-NULL values in row order; ``valid`` the row validity (None = all
    valid). All reduceat/add — no per-row Python."""
    k = n_chunks(n)
    mins = np.zeros(k, dtype=np.int64)
    maxs = np.zeros(k, dtype=np.int64)
    nulls = np.zeros(k, dtype=np.int32)
    if valid is None:
        starts = np.arange(k, dtype=np.int64) * ROW_CHUNK
        if vals.size:
            v64 = vals.astype(np.int64, copy=False)
            mins[:] = np.minimum.reduceat(v64, starts)
            maxs[:] = np.maximum.reduceat(v64, starts)
    else:
        # nulls per chunk; non-null values land in their row's chunk
        starts = np.arange(k, dtype=np.int64) * ROW_CHUNK
        nulls[:] = np.add.reduceat((~valid).astype(np.int32), starts)
        if vals.size:
            v64 = vals.astype(np.int64, copy=False)
            rows = np.flatnonzero(valid)
            ci = rows // ROW_CHUNK
            # reduceat over the run boundaries of ci (sorted by construction)
            bstarts = np.flatnonzero(np.concatenate(([True], ci[1:] != ci[:-1])))
            present = ci[bstarts]
            mins[present] = np.minimum.reduceat(v64, bstarts)
            maxs[present] = np.maximum.reduceat(v64, bstarts)
    return {"min": mins.tolist(), "max": maxs.tolist(), "nulls": nulls.tolist()}


def chunk_stats_float(vals: np.ndarray, valid: np.ndarray | None, n: int) -> dict:
    """Float chunk stats under Spark's total order: max records NaN when
    the chunk contains one (same rule as block-level _float_min_max)."""
    k = n_chunks(n)
    mins = np.zeros(k, dtype=np.float64)
    maxs = np.zeros(k, dtype=np.float64)
    nulls = np.zeros(k, dtype=np.int32)
    full = np.full(n, np.nan, dtype=np.float64)
    if valid is None:
        full[: vals.size] = vals
    else:
        starts = np.arange(k, dtype=np.int64) * ROW_CHUNK
        nulls[:] = np.add.reduceat((~valid).astype(np.int32), starts)
        full[valid] = vals
    for i in range(k):
        lo, hi = i * ROW_CHUNK, min((i + 1) * ROW_CHUNK, n)
        seg = full[lo:hi]
        if valid is not None:
            seg = seg[valid[lo:hi]]
        if not seg.size:
            continue
        nonnan = seg[~np.isnan(seg)]
        mins[i] = float(nonnan.min()) if nonnan.size else np.nan
        maxs[i] = np.nan if nonnan.size < seg.size else float(nonnan.max())
    return {"min": mins.tolist(), "max": maxs.tolist(), "nulls": nulls.tolist()}


def chunk_stats_string(arr: pa.Array, n: int) -> dict:
    """String chunk stats via pyarrow min_max per slice (<= 8 slices per
    block — a bounded loop over chunks, never over rows). Long values are
    stored as sound bounds (prefix min / successor max), same discipline
    as the block-level stats."""
    import pyarrow.compute as pc

    from aisle_spark.filterspec import truncate_stat_max, truncate_stat_min

    k = n_chunks(n)
    mins: list[str | None] = []
    maxs: list[str | None] = []
    nulls = []
    for i in range(k):
        lo = i * ROW_CHUNK
        sl = arr.slice(lo, min(ROW_CHUNK, n - lo))
        nulls.append(sl.null_count)
        if sl.null_count == len(sl):
            mins.append(None)
            maxs.append(None)
        else:
            mm = pc.min_max(sl)
            mins.append(truncate_stat_min(mm["min"].as_py()))
            maxs.append(truncate_stat_max(mm["max"].as_py()))
    return {"min": mins, "max": maxs, "nulls": nulls}


# ---------------------------------------------------------------------------
# query side: Kleene tri-state over the chunk arrays
# ---------------------------------------------------------------------------


def _lit_num(v, spec_obj):
    """Predicate literal -> the numeric domain the chunk arrays use, or
    None unless the literal's Python type EXACTLY matches the column's
    stat domain (then the leaf is Unknown — conservative, never a wrong
    skip). Truncating coercion must never happen here (ADVICE r2 high):
    ``int(3.5)`` on an int column, or a datetime literal converted to µs
    against date32 stats stored in DAYS, turns Unknown into a wrong
    definitely-false and silently drops matching rows."""
    import decimal as _decimal

    kind = spec_obj.kind
    if kind == "decimal":
        if isinstance(v, bool) or not isinstance(v, (int, _decimal.Decimal)):
            return None
        unscaled = _decimal.Decimal(v).scaleb(spec_obj.arrow_type.scale)
        if unscaled != int(unscaled):  # more precision than the column
            return None
        return int(unscaled)
    if kind == "float":
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        return float(v)
    if kind == "timestamp":
        if not isinstance(v, _dt.datetime):
            return None
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        d = v - _EPOCH  # exact integer µs — float total_seconds() rounds
        return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
    if kind == "duration":
        if not isinstance(v, _dt.timedelta):
            return None
        return (v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds
    if kind == "int":
        import pyarrow as _pa

        if _pa.types.is_date(spec_obj.arrow_type):
            # date32 stats are DAYS; datetime (a date SUBCLASS) carries
            # time-of-day and belongs to a different comparison domain
            if isinstance(v, _dt.datetime) or not isinstance(v, _dt.date):
                return None
            return (v - _EPOCH_DATE).days
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, int):
            return v
        if isinstance(v, float) and v.is_integer() and abs(v) <= 2.0**62:
            return int(v)  # integral float: the int comparison is exact
        return None
    return None


def _leaf_arrays(row: dict, c: str):
    mn = row.get(f"{c}__chunk_min")
    mx = row.get(f"{c}__chunk_max")
    nl = row.get(f"{c}__chunk_nulls")
    if mn is None or mx is None or nl is None:
        return None
    return mn, mx, np.asarray(nl, dtype=np.int64)


def _chunk_lens(n: int) -> np.ndarray:
    k = n_chunks(n)
    lens = np.full(k, ROW_CHUNK, dtype=np.int64)
    if n % ROW_CHUNK:
        lens[-1] = n % ROW_CHUNK
    return lens


def _cmp_tri(op: str, mn, mx, all_null, no_nulls, v, is_float: bool):
    """Vectorized chunk tri for one comparison; mn/mx are numpy arrays
    (float64 for float columns — NaN max follows Spark total order, where
    NaN > everything, so comparisons must special-case it)."""
    if is_float:
        nan_max = np.isnan(mx)
        nan_min = np.isnan(mn)  # all values NaN
        # Spark total order: NaN greater than all reals, NaN == NaN
        if np.isnan(v):
            gt_v = np.zeros_like(mx, dtype=bool)  # nothing exceeds NaN
            max_lt_v = ~nan_max  # any real max < NaN
            min_gt_v = np.zeros_like(mn, dtype=bool)
            eq_possible = nan_max  # only NaN equals NaN
            if op == "eq":
                f = ~eq_possible
                t = nan_min & no_nulls
            elif op == "ne":
                f = nan_min & no_nulls
                t = ~eq_possible & no_nulls
            elif op == "lt":  # x < NaN: true for all reals
                f = nan_min
                t = ~nan_max & no_nulls
            elif op == "le":
                f = np.zeros_like(mx, dtype=bool)
                t = no_nulls
            elif op == "gt":  # x > NaN: never
                f = np.ones_like(mx, dtype=bool)
                t = np.zeros_like(mx, dtype=bool)
            elif op == "ge":  # x >= NaN: only NaN
                f = ~nan_max
                t = nan_min & no_nulls
            else:  # pragma: no cover
                raise ValueError(op)
            return t, f
        # real literal; effective max for ordering is +inf when NaN present
        emax = np.where(nan_max, np.inf, mx)
        emin = np.where(nan_min, np.inf, mn)  # all-NaN chunk: min also "NaN"
        mn, mx = emin, emax
    if op == "eq":
        f = (mn > v) | (mx < v)
        t = (mn == v) & (mx == v) & no_nulls
    elif op == "ne":
        f = (mn == v) & (mx == v) & no_nulls
        t = ((mn > v) | (mx < v)) & no_nulls
    elif op == "lt":
        f = mn >= v
        t = (mx < v) & no_nulls
    elif op == "le":
        f = mn > v
        t = (mx <= v) & no_nulls
    elif op == "gt":
        f = mx <= v
        t = (mn > v) & no_nulls
    elif op == "ge":
        f = mx < v
        t = (mn >= v) & no_nulls
    else:  # pragma: no cover
        raise ValueError(op)
    f = f | all_null
    t = t | all_null  # all rows NULL: no row FALSE either
    return t, f


def _tri(spec, row: dict, kinds, n: int):
    """Returns (t, f) bool arrays over chunks; Kleene connectives."""
    from aisle_spark import filterspec as fs

    k = n_chunks(n)
    unknown = (np.zeros(k, dtype=bool), np.zeros(k, dtype=bool))
    lens = _chunk_lens(n)

    if isinstance(spec, fs.And):
        ts, fss = zip(*(_tri(p, row, kinds, n) for p in spec.parts))
        return np.logical_and.reduce(ts), np.logical_or.reduce(fss)
    if isinstance(spec, fs.Or):
        ts, fss = zip(*(_tri(p, row, kinds, n) for p in spec.parts))
        return np.logical_or.reduce(ts), np.logical_and.reduce(fss)
    if isinstance(spec, fs.Not):
        t, f = _tri(spec.inner, row, kinds, n)
        return f, t
    if isinstance(spec, fs.AlwaysTrue):
        return np.ones(k, dtype=bool), np.zeros(k, dtype=bool)
    if isinstance(spec, fs.Between):
        return _tri(spec._parts(), row, kinds, n)
    if isinstance(spec, fs.IsNull):
        arrs = _leaf_arrays(row, spec.col)
        if arrs is None:
            return unknown
        _, _, nl = arrs
        t_null = nl == lens  # no row FALSE for "IS NULL"
        f_null = nl == 0
        return (f_null, t_null) if spec.negated else (t_null, f_null)
    if isinstance(spec, fs.InList):
        parts = [_tri(fs.Cmp(spec.col, "eq", v), row, kinds, n) for v in spec.values]
        if not parts:
            return np.zeros(k, dtype=bool), np.ones(k, dtype=bool)
        ts, fss = zip(*parts)
        return np.logical_or.reduce(ts), np.logical_and.reduce(fss)
    if isinstance(spec, fs.StartsWith):
        arrs = _leaf_arrays(row, spec.col)
        so = kinds.get(spec.col)
        if arrs is None or so is None or so.kind != "string":
            return unknown
        mn, mx, nl = arrs
        all_null = nl == lens
        no_nulls = nl == 0
        p = spec.prefix
        np_ = fs.next_prefix(p) if p else None
        t = np.zeros(k, dtype=bool)
        f = np.zeros(k, dtype=bool)
        for i in range(k):
            if all_null[i]:
                t[i] = f[i] = True
                continue
            lo_s, hi_s = mn[i], mx[i]
            if lo_s is None or hi_s is None:  # truncation overflow => Unknown
                continue
            if p == "":
                t[i] = no_nulls[i]
                continue
            fi = hi_s < p
            ti = (lo_s >= p) and no_nulls[i]
            if np_ is not None:
                fi = fi or (lo_s >= np_)
                ti = ti and (hi_s < np_)
            t[i], f[i] = ti, fi
        return t, f
    if isinstance(spec, fs.Cmp):
        spec_obj = kinds.get(spec.col)
        kind = spec_obj.kind if spec_obj is not None else None
        arrs = _leaf_arrays(row, spec.col)
        if arrs is None or spec_obj is None:
            return unknown
        mn, mx, nl = arrs
        all_null = nl == lens
        no_nulls = nl == 0
        if kind in ("string", "binary"):
            want = str if kind == "string" else bytes
            if spec.op not in fs.Cmp._SQL_OP or not isinstance(spec.value, want):
                return unknown
            t = np.zeros(k, dtype=bool)
            f = np.zeros(k, dtype=bool)
            for i in range(k):
                if all_null[i]:
                    t[i] = f[i] = True
                    continue
                if mn[i] is None or mx[i] is None:  # truncation overflow
                    continue
                ti, fi = _scalar_cmp(spec.op, mn[i], mx[i], no_nulls[i], spec.value)
                t[i], f[i] = ti, fi
            return t, f
        if kind in ("int", "timestamp", "duration", "float", "decimal"):
            v = _lit_num(spec.value, spec_obj)
            if v is None or isinstance(v, str):
                return unknown
            is_float = kind == "float"
            dt = np.float64 if is_float else np.int64
            return _cmp_tri(
                spec.op,
                np.asarray(mn, dtype=dt),
                np.asarray(mx, dtype=dt),
                all_null,
                no_nulls,
                float(v) if is_float else int(v),
                is_float,
            )
        return unknown
    return unknown


def _scalar_cmp(op: str, mn, mx, no_nulls: bool, v):
    if op == "eq":
        return (mn == v and mx == v and no_nulls), (mn > v or mx < v)
    if op == "ne":
        return ((mn > v or mx < v) and no_nulls), (mn == v and mx == v and no_nulls)
    if op == "lt":
        return (mx < v and no_nulls), mn >= v
    if op == "le":
        return (mx <= v and no_nulls), mn > v
    if op == "gt":
        return (mn > v and no_nulls), mx <= v
    if op == "ge":
        return (mn >= v and no_nulls), mx < v
    raise ValueError(op)  # pragma: no cover


def chunk_keep(spec, row: dict, kinds, n_rows: int) -> np.ndarray:
    """keep[i] = chunk i may contain a matching row (~f). ``kinds`` maps
    column name -> ColumnSpec. A block whose mask is all-False is skipped
    before any payload decode."""
    _, f = _tri(spec, row, kinds, n_rows)
    return ~f
