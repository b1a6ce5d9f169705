"""Schema management: promotion (add nullable column, widen ints) and casting.

Mirrors the reference's idempotent schema-evolution tool
(/root/reference/cmd/update-schema/update.go:112-161): UpdateTable adds new
NULLABLE columns; here we additionally support lossless integer/float widening
declared by newer changelog segments. All lake columns are nullable (the
reference's RemoveRequired, /root/reference/schema/schema.go:101-136).
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

_INT_ORDER = {
    pa.int8(): 0,
    pa.int16(): 1,
    pa.int32(): 2,
    pa.int64(): 3,
}
_FLOAT_ORDER = {pa.float32(): 0, pa.float64(): 1}


def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Return the promoted type for two compatible types, else raise."""
    if a.equals(b):
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    if a in _INT_ORDER and b in _FLOAT_ORDER:
        return b
    if b in _INT_ORDER and a in _FLOAT_ORDER:
        return a
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(_widen(a.value_type, b.value_type))
    raise TypeError(f"incompatible schema evolution: {a} vs {b}")


def promote_schema(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """current ∪ incoming with widening; new columns appended nullable.

    Column drops are NOT evolution: a column missing from ``incoming`` stays
    in the promoted schema (reads fill null), exactly like the reference's
    add-only UpdateTable.
    """
    fields = []
    cur_names = set(current.names)
    for f in current:
        if f.name in incoming.names:
            inc = incoming.field(f.name)
            fields.append(pa.field(f.name, _widen(f.type, inc.type), nullable=True))
        else:
            fields.append(pa.field(f.name, f.type, nullable=True))
    for f in incoming:
        if f.name not in cur_names:
            fields.append(pa.field(f.name, f.type, nullable=True))
    return pa.schema(fields)


def promote_all(schemas: Iterable[pa.Schema]) -> pa.Schema:
    it = iter(schemas)
    out = next(it)
    for s in it:
        out = promote_schema(out, s)
    return out


def conform(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``target``: missing columns → null, ints widened.

    Used on the read path (old base/delta files written under an earlier
    schema version) and on the write path (segments that predate a column).
    Zero-copy when the table already matches.
    """
    if table.schema.equals(target):
        return table
    n = len(table)
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table[f.name]
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=target)


def schema_to_hex(schema: pa.Schema) -> str:
    h = schema.serialize().hex()
    return h.decode() if isinstance(h, bytes) else h


def schema_from_hex(hexstr: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(bytes.fromhex(hexstr)))
