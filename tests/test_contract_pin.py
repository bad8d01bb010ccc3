"""Pin the driver contract across the oracles/ package split (VERDICT r4
order #3): same query names in the same order, byte-identical oracle
SQL.  The hash was computed on the pre-split monolithic
__spark_entry__.py; any refactor that changes a name, the dict order,
or one byte of SQL fails here, not in the driver gate."""

from __future__ import annotations

import hashlib

import __spark_entry__ as E

PINNED = "2e0dd890adb0bd403996ed37113ba830411875af8ddc4c4df27bc274bc28b326"
N_QUERIES = 217


def _contract_hash() -> str:
    qs = list(E.queries().keys())
    osql = E.oracle_sql()
    h = hashlib.sha256()
    h.update(("\x00".join(qs)).encode())
    for name in sorted(osql):
        h.update(name.encode() + b"\x01" + osql[name].encode() + b"\x02")
    return h.hexdigest()


def test_contract_byte_identical():
    qs = E.queries()
    osql = E.oracle_sql()
    assert len(qs) == N_QUERIES and len(osql) == N_QUERIES
    assert set(qs) == set(osql)
    assert _contract_hash() == PINNED, (
        "driver contract changed: if intentional (new query / fixed "
        "oracle), update PINNED and N_QUERIES in this test"
    )


def test_entry_file_is_thin():
    # the split's other Done criterion: the contract file stays small
    import __spark_entry__

    with open(__spark_entry__.__file__) as f:
        n = sum(1 for _ in f)
    assert n < 2000, f"__spark_entry__.py is {n} lines; keep it under 2k"
