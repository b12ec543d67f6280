"""Row-level predicate evaluation on decoded Arrow batches — the engine's
RowFilter (/root/reference/src/row_filter.rs:50-312): the same Spec AST
that prunes blocks and builds the Catalyst residual also evaluates inside
the decode UDF via pyarrow compute kernels (vectorized C++, Kleene
null semantics, final NULL -> False like SQL WHERE)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from aisle_spark.filterspec import (
    AlwaysTrue,
    And,
    Between,
    Cmp,
    InList,
    IsNull,
    Not,
    Or,
    Spec,
    StartsWith,
)

_CMP_KERNELS = {
    "eq": pc.equal,
    "ne": pc.not_equal,
    "lt": pc.less,
    "le": pc.less_equal,
    "gt": pc.greater,
    "ge": pc.greater_equal,
}


def _eval(spec: Spec, batch: pa.RecordBatch) -> pa.Array:
    if isinstance(spec, Cmp):
        c = batch.column(spec.col)
        return _CMP_KERNELS[spec.op](c, pa.scalar(spec.value, type=c.type))
    if isinstance(spec, Between):
        c = batch.column(spec.col)
        return pc.and_kleene(
            pc.greater_equal(c, pa.scalar(spec.low, type=c.type)),
            pc.less_equal(c, pa.scalar(spec.high, type=c.type)),
        )
    if isinstance(spec, InList):
        c = batch.column(spec.col)
        return pc.is_in(c, value_set=pa.array(list(spec.values), type=c.type))
    if isinstance(spec, IsNull):
        c = batch.column(spec.col)
        return pc.is_valid(c) if spec.negated else pc.is_null(c)
    if isinstance(spec, StartsWith):
        return pc.starts_with(batch.column(spec.col), pattern=spec.prefix)
    if isinstance(spec, And):
        out = _eval(spec.parts[0], batch)
        for p in spec.parts[1:]:
            out = pc.and_kleene(out, _eval(p, batch))
        return out
    if isinstance(spec, Or):
        out = _eval(spec.parts[0], batch)
        for p in spec.parts[1:]:
            out = pc.or_kleene(out, _eval(p, batch))
        return out
    if isinstance(spec, Not):
        return pc.invert(_eval(spec.inner, batch))
    if isinstance(spec, AlwaysTrue):
        return pa.array(np.ones(batch.num_rows, dtype=bool))
    raise TypeError(type(spec))  # pragma: no cover


def row_mask(spec: Spec, batch: pa.RecordBatch) -> np.ndarray:
    """Boolean numpy mask of rows satisfying ``spec`` (NULL -> False)."""
    out = _eval(spec, batch)
    if isinstance(out, pa.ChunkedArray):  # pragma: no cover
        out = out.combine_chunks()
    return (
        pc.fill_null(out, False).to_numpy(zero_copy_only=False).astype(bool)
    )
