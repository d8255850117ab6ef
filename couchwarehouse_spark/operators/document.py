"""Document-ETL kernel: flatten, schema discovery, conformance.

This is the reference's core product (SURVEY.md §1, §2.A R6/R7/R13):
every CouchDB document entering the warehouse is flattened to a wide
row, the first document of each type freezes the table schema, and
all later documents are conformed to it (extra fields dropped,
missing fields null-filled).

Semantics reproduced (cited for parity, no code copied):

* flatten — reference lib/flatten.js:25-50, expected values at
  reference test/flatten.js:28-39: nested objects become
  ``parent_child`` columns, arrays become JSON text, ``_id``/``_rev``
  are renamed ``id``/``rev``.
* schema discovery — reference lib/schema.js:4-14, expected map at
  reference test/schema.js:26-41: flatten, then map every value to
  JS ``typeof`` → exactly three logical types
  ``string | number | boolean``.
* conformance — reference lib/sqlite.js:87-92 (insert iterates the
  frozen schema's keys only) and test/run_evolve.js:53-69: extra
  fields silently dropped, missing fields become NULL.
* sequence extraction — reference index.js:30-32: ``'47-1abc2' → 47``.
* identifier sanitisation — reference lib/util.js:1-11: ``-`` stripped
  from database/docType names; split-mode table name is
  ``db_docType``.

Two lanes:

* **Pure-Python** (``flatten_doc`` / ``discover_schema``) — per-doc
  functions for schema bootstrap on the driver (only ever applied to
  the FIRST doc of a type, so they never touch the data path).
* **DataFrame** (``flatten_frame`` / ``conform_frame``) — projection
  builders that compile the same semantics into a single Catalyst
  ``select``; the 100 TB path. A flatten is just column aliasing +
  ``to_json`` — zero shuffle, fully codegen'd, pushdown-transparent.
"""

from __future__ import annotations

import json
import re
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Logical → Spark type, per the reference's 3-type system
# (reference lib/schema.js:9-11 via JS typeof; physical mappings at
# lib/sqlite.js:26-30 TEXT/REAL/INTEGER). Numbers are DoubleType
# because JS has only doubles.
LOGICAL_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def combine(prefix: str, key: str) -> str:
    """Join a column-name prefix and key with ``_`` (lib/flatten.js:7-9)."""
    return f"{prefix}_{key}" if prefix else key


def flatten_doc(doc: Mapping, prefix: str = "") -> dict:
    """Flatten one JSON document to a wide row (reference lib/flatten.js:25-50).

    * top level: ``_id`` → ``id``, ``_rev`` → ``rev``
    * nested dicts recurse with a ``parent_child`` prefix
    * lists are serialised to JSON text (compact separators — matching
      ``JSON.stringify``, lib/flatten.js:45)
    * ``None`` values are dropped (the reference treats JS ``null`` as
      an object — ``typeof null === 'object'`` — so the key vanishes
      during recursion; we mirror that deliberately)
    """
    out: dict = {}
    items = list(doc.items())
    if not prefix:
        renamed = []
        for k, v in items:
            if k == "_id":
                renamed.append(("id", v))
            elif k == "_rev":
                renamed.append(("rev", v))
            else:
                renamed.append((k, v))
        items = renamed
    for k, v in items:
        if isinstance(v, Mapping):
            out.update(flatten_doc(v, combine(prefix, k)))
        elif v is None:
            continue
        elif isinstance(v, (list, tuple)):
            out[combine(prefix, k)] = json.dumps(list(v), separators=(",", ":"))
        else:
            out[combine(prefix, k)] = v
    return out


def typeof(value) -> str:
    """JS ``typeof`` → the reference's 3 logical types (lib/schema.js:9-11)."""
    if isinstance(value, bool):  # bool before int: True is an int in Python
        return "boolean"
    if isinstance(value, (int, float)):
        return "number"
    return "string"


def discover_schema(doc: Mapping) -> dict[str, str]:
    """First-doc schema discovery (reference lib/schema.js:4-14).

    Flatten, then map each value to its logical type. The caller
    freezes the result per docType (first-writer-wins,
    reference index.js:55-68).
    """
    return {k: typeof(v) for k, v in flatten_doc(doc).items()}


def schema_to_struct(schema: Mapping[str, str]) -> T.StructType:
    """Logical schema dict → Spark StructType (all fields nullable)."""
    return T.StructType(
        [T.StructField(k, LOGICAL_TO_SPARK[v], True) for k, v in schema.items()]
    )


def generate_create_table_sql(
    table: str, schema: Mapping[str, str], reset: bool = False, using: str = "parquet"
) -> list[str]:
    """DDL generation (R10; reference lib/sqlite.js:23-52).

    Returns the ``[DROP?, CREATE IF NOT EXISTS]`` statement list for
    ``spark.sql``. ``id`` has no PRIMARY KEY (Spark tables are not
    constrained) — uniqueness is enforced by the latest-wins upsert
    (operators.upsert).
    """
    cols = ", ".join(
        f"`{k}` {LOGICAL_TO_SPARK[v].simpleString().upper()}" for k, v in schema.items()
    )
    stmts = []
    if reset:
        stmts.append(f"DROP TABLE IF EXISTS `{table}`")
    stmts.append(f"CREATE TABLE IF NOT EXISTS `{table}` ({cols}) USING {using}")
    return stmts


# --------------------------------------------------------------------------
# DataFrame lane
# --------------------------------------------------------------------------


def _flatten_fields(schema: T.StructType, parent: Column | None, prefix: str) -> list[Column]:
    cols: list[Column] = []
    for field in schema.fields:
        name = field.name
        if not prefix and name in ("_id", "_rev"):
            out_name = name[1:]  # _id → id, _rev → rev (lib/flatten.js:29-32)
        else:
            out_name = combine(prefix, name)
        child = parent[name] if parent is not None else F.col(f"`{name}`")
        if isinstance(field.dataType, T.StructType):
            cols.extend(_flatten_fields(field.dataType, child, out_name))
        elif isinstance(field.dataType, T.ArrayType):
            # Arrays → JSON text (lib/flatten.js:45). The typed lane
            # (keep_arrays=True path below) retains the ArrayType too.
            cols.append(F.to_json(child).alias(out_name))
        else:
            cols.append(child.alias(out_name))
    return cols


def flatten_frame(df: DataFrame) -> DataFrame:
    """Flatten nested struct columns into ``parent_child`` scalars (R6).

    One Catalyst projection — no UDF, no shuffle; struct field access
    compiles to a columnar read, so at 100 TB this costs exactly a
    parquet scan of the referenced leaves.
    """
    return df.select(_flatten_fields(df.schema, None, ""))


def conform_frame(
    df: DataFrame,
    schema: Mapping[str, str] | T.StructType,
    keep: list[str] | None = None,
) -> DataFrame:
    """Frozen-schema conformance projection (R13).

    Projects exactly the frozen schema's columns, in its order:
    columns the batch lacks become typed NULLs, extra columns are
    dropped — matching reference lib/sqlite.js:87-92 (insert iterates
    schema keys, binding missing values as NULL) as verified by
    reference test/run_evolve.js:53-69. Existing columns are
    ``try_cast`` to the frozen type: a doc that flips e.g.
    number→string lands as NULL in that column instead of poisoning
    the table — and, under Spark 4's default ANSI mode, instead of
    throwing CAST_INVALID_INPUT and wedging the stream on a single
    poison doc (the batch would replay and fail forever). ``keep``
    carries named passthrough columns (e.g. the change-seq) alongside
    the conformed schema.
    """
    struct = schema if isinstance(schema, T.StructType) else schema_to_struct(schema)
    have = set(df.columns)
    cols = [
        (
            F.col(f.name).try_cast(f.dataType)
            if f.name in have
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in struct.fields
    ]
    cols += [F.col(k) for k in (keep or []) if k in have]
    return df.select(cols)


# --------------------------------------------------------------------------
# Identifier / sequence helpers
# --------------------------------------------------------------------------


def sanitize_identifier(name: str) -> str:
    """Strip ``-`` from identifiers (R16; reference lib/util.js:1-3)."""
    return name.replace("-", "")


def usable_table_name(db_name: str, doc_type: str | None = None, split: bool = False) -> str:
    """Warehouse table name (reference lib/util.js:5-11).

    ``db`` normally; ``db_docType`` in split mode.
    """
    if split and doc_type:
        return f"{sanitize_identifier(db_name)}_{sanitize_identifier(doc_type)}"
    return sanitize_identifier(db_name)


_SEQ_RE = re.compile(r"-.*$")


def extract_seq_number(seq: str) -> int:
    """``'47-1abc2' → 47`` (R15; reference index.js:30-32)."""
    return int(_SEQ_RE.sub("", seq))


def seq_number_col(seq: Column | str) -> Column:
    """Column-lane equivalent of :func:`extract_seq_number`."""
    c = F.col(seq) if isinstance(seq, str) else seq
    return F.regexp_replace(c, "-.*$", "").cast("long")
