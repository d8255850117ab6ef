"""PostgreSQL / MySQL dialect-exact statement generation (S18).

The reference ships a whole driver per backend whose real content is
a handful of SQL statements — DDL from the discovered schema, an
upsert, a delete, and the ``couchwarehouse_checkpoints`` protocol
(reference lib/postgresql.js:28-57,60-126,131-148; lib/mysql.js:
44-75,78-141,146-162). This module generates those statements
byte-for-byte and drives them through any DBAPI-style connection, so
the egress logic is testable in-container against a recorded-statement
fake (the ``sinks.sqlite`` / fake-ES pattern) and runs unchanged
against a real server when one exists.

Dialect deltas, straight from the reference:

===========  =========================  ==========================
aspect       postgresql                 mysql
===========  =========================  ==========================
types        string→TEXT, number→REAL,  string→TEXT, number→FLOAT,
             boolean→BOOLEAN            boolean→TINYINT
id column    ``id TEXT PRIMARY KEY``    ``id VARCHAR(255) PRIMARY KEY``
             (lib/postgresql.js:41-44)  (TEXT can't be a MySQL PK;
                                        lib/mysql.js:56-61)
upsert       ``INSERT ... ON CONFLICT   ``REPLACE INTO ...``
             (id) DO UPDATE SET ...``   (lib/mysql.js:104)
             (lib/postgresql.js:91)
params       ``$1``..``$n``             ``?``
===========  =========================  ==========================

Scale note: like the reference (and ``sinks.sqlite``), statement
execution is row-at-a-time on the driver via ``toLocalIterator`` —
one partition resident at a time. That is the right topology for a
single-connection relational follower; the PARALLEL egress lane at
100 TB is ``sinks.jdbc`` (partitioned ``df.write.jdbc``), with this
module supplying the dialect DDL/upsert semantics the staging table
merge needs.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import DataFrame

CHECKPOINT_TABLE = "couchwarehouse_checkpoints"

_TYPE_MAPS = {
    # reference lib/postgresql.js:32-36
    "postgresql": {"string": "TEXT", "number": "REAL", "boolean": "BOOLEAN"},
    # reference lib/mysql.js:47-51
    "mysql": {"string": "TEXT", "number": "FLOAT", "boolean": "TINYINT"},
}


def create_table_sql(
    dialect: str, table: str, schema: Mapping[str, str], reset: bool = False
) -> list[str]:
    """The reference's ``generateCreateTableSQL``, dialect-exact
    (lib/postgresql.js:28-57, lib/mysql.js:44-75): one column per
    discovered field in schema order, ``id`` as the primary key —
    ``TEXT`` in PG, ``VARCHAR(255)`` in MySQL (TEXT cannot be an
    unprefixed MySQL key). ``reset`` prepends the DROP."""
    mapping = _TYPE_MAPS[dialect]
    cols = []
    for name, logical in schema.items():
        if dialect == "mysql" and name == "id":
            cols.append("id VARCHAR(255) PRIMARY KEY")
            continue
        col = f"{name} {mapping.get(logical, 'TEXT')}"
        if name == "id":
            col += " PRIMARY KEY"
        cols.append(col)
    stmts = []
    if reset:
        stmts.append(f"DROP TABLE IF EXISTS {table}")
    stmts.append(f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)})")
    return stmts


def upsert_sql(dialect: str, table: str, fields: list[str]) -> str:
    """The per-row upsert statement, byte-exact vs the reference.

    PG (lib/postgresql.js:82-91): ``INSERT ... VALUES ($1..$n) ON
    CONFLICT (id) DO UPDATE SET f1 = $1,... WHERE t.id = $n+1`` —
    note the reference binds the id AGAIN as the final parameter for
    the conflict-update predicate, so values = row values + [id].
    MySQL (lib/mysql.js:96-104): ``REPLACE INTO ... VALUES (?,..)``.
    """
    names = ",".join(fields)
    if dialect == "postgresql":
        placeholders = ",".join(f"${i + 1}" for i in range(len(fields)))
        pairs = ",".join(f"{f} = ${i + 1}" for i, f in enumerate(fields))
        return (
            f"INSERT INTO {table} ({names}) VALUES ({placeholders}) "
            f"ON CONFLICT (id) DO UPDATE SET {pairs} "
            f"WHERE {table}.id = ${len(fields) + 1}"
        )
    placeholders = ",".join("?" for _ in fields)
    return f"REPLACE INTO {table} ({names}) VALUES ({placeholders})"


def delete_sql(dialect: str, table: str) -> str:
    """lib/postgresql.js:92 / lib/mysql.js:105."""
    marker = "$1" if dialect == "postgresql" else "?"
    return f"DELETE FROM {table} WHERE id = {marker}"


def checkpoint_ddl(dialect: str) -> str:
    """Identical in both dialects (lib/postgresql.js:24,
    lib/mysql.js:42)."""
    return (
        f"CREATE TABLE IF NOT EXISTS {CHECKPOINT_TABLE} "
        "(id SERIAL PRIMARY KEY, tablename TEXT, seq TEXT)"
    )


def write_checkpoint_sql(dialect: str) -> str:
    """lib/postgresql.js:137 / lib/mysql.js:150."""
    markers = "$1,$2" if dialect == "postgresql" else "?,?"
    return f"INSERT INTO {CHECKPOINT_TABLE} (tablename,seq) VALUES ({markers})"


def get_checkpoint_sql(dialect: str) -> str:
    """lib/postgresql.js:141 / lib/mysql.js:156 — newest row wins."""
    marker = "$1" if dialect == "postgresql" else "?"
    return (
        f"SELECT seq FROM {CHECKPOINT_TABLE} WHERE tablename={marker} "
        "ORDER BY id DESC LIMIT 1"
    )


class DialectSink:
    """Drive the dialect statements through a DBAPI-style connection
    (``execute(sql, params)`` + ``commit()``) — the testable core of
    the reference's PG/MySQL drivers. A recorded-statement fake
    stands in for the server in-container; a psycopg/mysql connection
    slots in unchanged where one exists."""

    def __init__(self, con: Any, dialect: str):
        if dialect not in _TYPE_MAPS:
            raise ValueError(f"unknown dialect {dialect!r}")
        self.con = con
        self.dialect = dialect
        con.execute(checkpoint_ddl(dialect))
        con.commit()

    def create_table(
        self, table: str, schema: Mapping[str, str], reset: bool = False
    ) -> None:
        for stmt in create_table_sql(self.dialect, table, schema, reset=reset):
            self.con.execute(stmt)
        self.con.commit()

    def insert_bulk(
        self,
        table: str,
        df: DataFrame,
        schema: Mapping[str, str],
        key: str = "id",
        deleted_col: str | None = None,
    ) -> int:
        """Apply a conformed DataFrame as upserts; rows with
        ``deleted_col`` true become DELETE-by-id (lib/postgresql.js:
        104-112, lib/mysql.js:117-127). One transaction per call =
        one changes batch. Returns rows applied."""
        fields = list(schema)
        up = upsert_sql(self.dialect, table, fields)
        de = delete_sql(self.dialect, table)
        cols = [c for c in fields if c in df.columns]
        select = cols + ([deleted_col] if deleted_col else [])
        n = 0
        for row in df.select(*select).toLocalIterator():
            d = row.asDict()
            if deleted_col and d.get(deleted_col):
                self.con.execute(de, (d.get(key),))
            else:
                values = [d.get(f) for f in fields]
                if self.dialect == "postgresql":
                    # the trailing id parameter for the DO UPDATE
                    # predicate (lib/postgresql.js:98-101)
                    values.append(d.get(key))
                self.con.execute(up, tuple(values))
            n += 1
        self.con.commit()
        return n

    def write_checkpoint(self, tablename: str, seq: str) -> None:
        self.con.execute(write_checkpoint_sql(self.dialect), (tablename, seq))
        self.con.commit()

    def read_checkpoint(self, tablename: str) -> str | None:
        rows = self.con.execute(
            get_checkpoint_sql(self.dialect), (tablename,)
        ).fetchall()
        return rows[0][0] if rows else None
