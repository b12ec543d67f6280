"""DuckDB-dialect rendering of the block-level ``keep()`` / ``not_true()``
evidence predicates — the same tri-state algebra filterspec builds as
Catalyst Columns, emitted as SQL that runs where no JVM exists: the Python
DataSource planning worker (datasource.py prunes committed files before
Spark schedules a single task) and any plain-Python many-files pruner (the
amortized ``Pruner`` entry point of the reference,
/root/reference/src/prune/api.rs, src/compile.rs compile_pruning_ir — here
the "compiled" artifact is a SQL string DuckDB vectorizes).

Soundness contract is identical to filterspec's: keep == NOT definitely-
false with Unknown ⇒ keep; ``not_true`` is the De Morgan dual used under
``Not``. Every NULL-stat path must collapse to keep. The two dialects are
DIFFERENTIALLY tested (tests/test_prune_sql.py): randomized predicate
trees over one encoded manifest must select the same block set through
Catalyst and through DuckDB, bit for bit.

Dialect notes (probed, not assumed):
* ``list_position(l, v)`` returns 0 when absent and ``l[0]`` is NULL, so
  ``kmin[list_position(keys, k)]`` is NULL exactly when Catalyst's
  ``element_at(map_from_arrays(keys, kmin), k)`` is.
* NaN orders greater than every value and ``NaN = NaN`` — same total
  order Spark uses.
* Spark-written manifests read timestamps as TIMESTAMP, pyarrow-written
  (direct-write path) as TIMESTAMPTZ; stat refs compared against datetime
  literals are wrapped in ``CAST(.. AS TIMESTAMP)`` which is the identity
  on the stored UTC instant under ``SET TimeZone='UTC'`` (callers must
  pin it — ``planning_connection()`` does).
* DayTimeInterval stats surface as BIGINT microseconds through BOTH
  writers, so timedelta literals render as integer microseconds.
"""

from __future__ import annotations

import datetime as _dt
import math

from aisle_spark.filterspec import (
    DEFAULT_OPTIONS,
    AlwaysTrue,
    And,
    ArrayAny,
    ArrayLen,
    Between,
    Cmp,
    InList,
    IsNull,
    Like,
    MapKeyCmp,
    Not,
    Or,
    PruneOptions,
    Regexp,
    Spec,
    StartsWith,
    _sql_lit,
    _utc_value,
    next_prefix,
)

_OPS = {"eq": "=", "ne": "<>", "lt": "<", "le": "<=", "gt": ">", "ge": ">="}


def _q(name: str) -> str:
    """Quoted identifier — nested leaves carry literal dots."""
    return '"' + name.replace('"', '""') + '"'


def _lit(v) -> str:
    """Stat-domain literal: timedeltas are the BIGINT microseconds the
    manifest stores, naive datetimes the UTC instant ``F.lit`` would
    produce (driver-process tz, same rule the rowmask path uses)."""
    if isinstance(v, _dt.timedelta):
        return str((v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds)
    if isinstance(v, _dt.datetime):
        u = _utc_value(v)
        return f"TIMESTAMP '{u.isoformat(sep=' ')}'"
    if isinstance(v, float):
        if math.isnan(v):
            return "'NaN'::DOUBLE"
        if math.isinf(v):
            return ("'Infinity'" if v > 0 else "'-Infinity'") + "::DOUBLE"
    return _sql_lit(v)


def _ref(col: str, suffix: str, value) -> str:
    """Stat-column reference, cast to the literal's comparison domain
    where the two manifest writers disagree (see module notes)."""
    r = _q(f"{col}{suffix}")
    if isinstance(value, _dt.datetime):
        return f"CAST({r} AS TIMESTAMP)"
    if isinstance(value, _dt.timedelta):
        return f"CAST({r} AS BIGINT)"
    return r


def _on(cmp: str, *operands: str) -> str:
    """cmp OR any(operand IS NULL) — missing stats keep the block."""
    parts = [f"({cmp})"] + [f"({o} IS NULL)" for o in operands]
    return "(" + " OR ".join(parts) + ")"


def _bloom_absent_sql(col: str, values: tuple) -> str:
    """Definite absence of EVERY value per the block bloom filter —
    mirrors filterspec._bloom_absent: NULL bloom ⇒ NULL probes ⇒
    COALESCE(…, FALSE): no evidence, not absence."""
    from aisle_spark.codecs.bloom import bloom_positions

    bl = _q(f"{col}__bloom")
    absents = []
    for v in values:
        key = v if isinstance(v, bytes) else v.encode("utf-8")
        probes = [
            f"((({bl}[{int(p >> 6) + 1}] >> {int(p & 63)}) & 1) = 1)"
            for p in bloom_positions(key).tolist()
        ]
        absents.append("(NOT (" + " AND ".join(probes) + "))")
    return "COALESCE(" + " AND ".join(absents) + ", FALSE)"


def _cmp_keep(spec: Cmp, opts: PruneOptions) -> str:
    c, op, v = spec.col, spec.op, spec.value
    smin, smax = _ref(c, "__min", v), _ref(c, "__max", v)
    nulls = _q(f"{c}__nulls")
    lv = _lit(v)
    if op == "eq":
        out = f"({_on(f'{smin} <= {lv}', smin)} AND {_on(f'{smax} >= {lv}', smax)})"
        if isinstance(v, (str, bytes)):
            if opts.use_dict:
                d = _q(f"{c}__dict")
                out = f"({out} AND {_on(f'list_contains({d}, {lv})', d)})"
            if opts.use_bloom:
                out = f"({out} AND (NOT {_bloom_absent_sql(c, (v,))}))"
        return out
    if op == "ne":
        return (
            f"({_on(f'{smin} <> {lv}', smin)} OR {_on(f'{smax} <> {lv}', smax)}"
            f" OR {_on(f'{nulls} <> 0', nulls)})"
        )
    bound = {"lt": f"{smin} < {lv}", "le": f"{smin} <= {lv}",
             "gt": f"{smax} > {lv}", "ge": f"{smax} >= {lv}"}[op]
    return _on(bound, smin if op in ("lt", "le") else smax)


def _cmp_not_true(spec: Cmp, opts: PruneOptions) -> str:
    c, op, v = spec.col, spec.op, spec.value
    smin, smax = _ref(c, "__min", v), _ref(c, "__max", v)
    nulls = _q(f"{c}__nulls")
    lv = _lit(v)
    has_nulls = _on(f"{nulls} <> 0", nulls)
    if op == "eq":
        return (
            f"({_on(f'{smin} <> {lv}', smin)} OR {_on(f'{smax} <> {lv}', smax)}"
            f" OR {has_nulls})"
        )
    if op == "ne":
        return (
            f"(({_on(f'{smin} <= {lv}', smin)} AND {_on(f'{smax} >= {lv}', smax)})"
            f" OR {has_nulls})"
        )
    bound = {"lt": f"{smax} >= {lv}", "le": f"{smax} > {lv}",
             "gt": f"{smin} <= {lv}", "ge": f"{smin} < {lv}"}[op]
    return f"({_on(bound, smax if op in ('lt', 'le') else smin)} OR {has_nulls})"


def _isnull_sides(spec: IsNull) -> tuple[str, str]:
    nulls = _q(f"{spec.col}__nulls")
    none = _on(f"{nulls} <> 0", nulls)           # some null exists? keep IS NULL
    not_all = _on(f"{nulls} <> CAST(n_rows AS BIGINT)", nulls)
    if spec.negated:  # IS NOT NULL
        return not_all, none
    return none, not_all


def _startswith_keep(spec: StartsWith) -> str:
    if spec.prefix == "":
        return "TRUE"
    smin, smax = _q(f"{spec.col}__min"), _q(f"{spec.col}__max")
    out = _on(f"{smax} >= {_lit(spec.prefix)}", smax)
    np_ = next_prefix(spec.prefix)
    if np_ is not None:
        out = f"({out} AND {_on(f'{smin} < {_lit(np_)}', smin)})"
    return out


def _startswith_not_true(spec: StartsWith) -> str:
    smin, smax = _q(f"{spec.col}__min"), _q(f"{spec.col}__max")
    nulls = _q(f"{spec.col}__nulls")
    has_nulls = _on(f"{nulls} <> 0", nulls)
    if spec.prefix == "":
        return has_nulls
    out = f"({_on(f'{smin} < {_lit(spec.prefix)}', smin)} OR {has_nulls})"
    np_ = next_prefix(spec.prefix)
    if np_ is not None:
        out = f"({out} OR {_on(f'{smax} >= {_lit(np_)}', smax)})"
    return out


def _inlist_keep(spec: InList, opts: PruneOptions) -> str:
    c = spec.col
    parts = []
    for v in spec.values:
        smin, smax = _ref(c, "__min", v), _ref(c, "__max", v)
        lv = _lit(v)
        parts.append(
            f"({_on(f'{smin} <= {lv}', smin)} AND {_on(f'{smax} >= {lv}', smax)})"
        )
    out = "(" + " OR ".join(parts) + ")"
    if spec.values and all(isinstance(v, (str, bytes)) for v in spec.values):
        if opts.use_dict:
            d = _q(f"{c}__dict")
            arr = "[" + ", ".join(_lit(v) for v in spec.values) + "]"
            out = f"({out} AND {_on(f'list_has_any({d}, {arr})', d)})"
        if opts.use_bloom:
            out = f"({out} AND (NOT {_bloom_absent_sql(c, tuple(spec.values))}))"
    return out


def _arrayany_keep(spec: ArrayAny) -> str:
    emin, emax = _ref(spec.col, "__elem_min", spec.value), _ref(
        spec.col, "__elem_max", spec.value
    )
    lv = _lit(spec.value)
    op = spec.op
    if op == "eq":
        return f"({_on(f'{emin} <= {lv}', emin)} AND {_on(f'{emax} >= {lv}', emax)})"
    if op == "ne":
        return f"({_on(f'{emin} <> {lv}', emin)} OR {_on(f'{emax} <> {lv}', emax)})"
    bound = {"lt": f"{emin} < {lv}", "le": f"{emin} <= {lv}",
             "gt": f"{emax} > {lv}", "ge": f"{emax} >= {lv}"}[op]
    return _on(bound, emin if op in ("lt", "le") else emax)


def _arraylen_sides(spec: ArrayLen) -> tuple[str, str]:
    c = spec.col
    smin, smax = _q(f"{c}__len_min"), _q(f"{c}__len_max")
    nulls = _q(f"{c}__nulls")
    lv = str(int(spec.value))
    op = spec.op
    has_nulls = _on(f"{nulls} <> 0", nulls)
    if op == "eq":
        keep = f"({_on(f'{smin} <= {lv}', smin)} AND {_on(f'{smax} >= {lv}', smax)})"
        nt = (
            f"({_on(f'{smin} <> {lv}', smin)} OR {_on(f'{smax} <> {lv}', smax)}"
            f" OR {has_nulls})"
        )
    elif op == "ne":
        keep = (
            f"({_on(f'{smin} <> {lv}', smin)} OR {_on(f'{smax} <> {lv}', smax)}"
            f" OR {_on(f'{nulls} <> 0', nulls)})"
        )
        nt = (
            f"(({_on(f'{smin} <= {lv}', smin)} AND {_on(f'{smax} >= {lv}', smax)})"
            f" OR {has_nulls})"
        )
    else:
        kb = {"lt": f"{smin} < {lv}", "le": f"{smin} <= {lv}",
              "gt": f"{smax} > {lv}", "ge": f"{smax} >= {lv}"}[op]
        nb = {"lt": f"{smax} >= {lv}", "le": f"{smax} > {lv}",
              "gt": f"{smin} <= {lv}", "ge": f"{smin} < {lv}"}[op]
        keep = _on(kb, smin if op in ("lt", "le") else smax)
        nt = f"({_on(nb, smax if op in ('lt', 'le') else smin)} OR {has_nulls})"
    return keep, nt


def _mapkey_keep(spec: MapKeyCmp) -> str:
    c = spec.col
    keys = _q(f"{c}__keys")
    klit = _lit(spec.key)
    pos = f"list_position({keys}, {klit})"
    kmin = f"({_q(f'{c}__kmin')}[{pos}])"
    kmax = f"({_q(f'{c}__kmax')}[{pos}])"
    lv = _lit(spec.value)
    out = _on(f"list_contains({keys}, {klit})", keys)
    op = spec.op
    if op == "eq":
        win = f"({_on(f'{kmin} <= {lv}', kmin)} AND {_on(f'{kmax} >= {lv}', kmax)})"
    elif op == "ne":
        win = f"({_on(f'{kmin} <> {lv}', kmin)} OR {_on(f'{kmax} <> {lv}', kmax)})"
    else:
        b = {"lt": f"{kmin} < {lv}", "le": f"{kmin} <= {lv}",
             "gt": f"{kmax} > {lv}", "ge": f"{kmax} >= {lv}"}[op]
        win = _on(b, kmin if op in ("lt", "le") else kmax)
    return f"({out} AND {win})"


def keep_sql(spec: Spec, opts: PruneOptions = DEFAULT_OPTIONS) -> str:
    """Block-evidence keep predicate, DuckDB dialect — row-for-row the
    same block set filterspec's ``keep()`` selects through Catalyst."""
    if isinstance(spec, And):
        return "(" + " AND ".join(keep_sql(p, opts) for p in spec.parts) + ")"
    if isinstance(spec, Or):
        return "(" + " OR ".join(keep_sql(p, opts) for p in spec.parts) + ")"
    if isinstance(spec, Not):
        return not_true_sql(spec.inner, opts)
    if isinstance(spec, AlwaysTrue):
        return "TRUE"
    if isinstance(spec, (Like, Regexp)):
        return "TRUE"
    if isinstance(spec, Between):
        return keep_sql(spec._parts(), opts)
    if isinstance(spec, Cmp):
        return _cmp_keep(spec, opts)
    if isinstance(spec, InList):
        return _inlist_keep(spec, opts)
    if isinstance(spec, IsNull):
        return _isnull_sides(spec)[0]
    if isinstance(spec, StartsWith):
        return _startswith_keep(spec)
    if isinstance(spec, ArrayAny):
        return _arrayany_keep(spec)
    if isinstance(spec, ArrayLen):
        return _arraylen_sides(spec)[0]
    if isinstance(spec, MapKeyCmp):
        return _mapkey_keep(spec)
    raise TypeError(f"no SQL keep rendering for {type(spec).__name__}")


def not_true_sql(spec: Spec, opts: PruneOptions = DEFAULT_OPTIONS) -> str:
    """De Morgan dual (NOT definitely-true), DuckDB dialect."""
    if isinstance(spec, And):
        return "(" + " OR ".join(not_true_sql(p, opts) for p in spec.parts) + ")"
    if isinstance(spec, Or):
        return "(" + " AND ".join(not_true_sql(p, opts) for p in spec.parts) + ")"
    if isinstance(spec, Not):
        return keep_sql(spec.inner, opts)
    if isinstance(spec, AlwaysTrue):
        return "FALSE"
    if isinstance(spec, (Like, Regexp)):
        return "TRUE"
    if isinstance(spec, Between):
        return not_true_sql(spec._parts(), opts)
    if isinstance(spec, Cmp):
        return _cmp_not_true(spec, opts)
    if isinstance(spec, InList):
        if not spec.values:
            return "TRUE"
        return (
            "("
            + " AND ".join(
                _cmp_not_true(Cmp(spec.col, "eq", v), opts) for v in spec.values
            )
            + ")"
        )
    if isinstance(spec, IsNull):
        return _isnull_sides(spec)[1]
    if isinstance(spec, StartsWith):
        return _startswith_not_true(spec)
    if isinstance(spec, (ArrayAny, MapKeyCmp)):
        return "TRUE"  # t-side never certain (empty lists / key-less rows)
    if isinstance(spec, ArrayLen):
        return _arraylen_sides(spec)[1]
    raise TypeError(f"no SQL not_true rendering for {type(spec).__name__}")
