"""Driver-contract registry integrity — fast, no SparkSession.

Guards the invariants the driver's harness assumes: every query has a
unique name, every oracle belongs to a registered query, oracles are
non-trivial SQL over the pre-registered table views, and the contract
module exposes exactly the registry."""

import re

import __spark_entry__ as entry

TABLES = {"region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"}


def test_queries_and_oracles_align():
    q = entry.queries()
    o = entry.oracle_sql()
    assert q, "registry is empty"
    assert set(o) <= set(q), "oracle without a query"
    missing = set(q) - set(o)
    # rows-only entries are allowed but must be deliberate; today: none
    assert not missing, f"queries without oracles: {sorted(missing)}"


def test_all_queries_callable():
    for name, fn in entry.queries().items():
        assert callable(fn), name


def test_oracles_reference_known_tables():
    word = re.compile(r"\b(FROM|JOIN)\s+([a-zA-Z_][a-zA-Z0-9_]*)",
                      re.IGNORECASE)
    for name, sql in entry.oracle_sql().items():
        assert "SELECT" in sql.upper(), name
        refs = {m.group(2).lower() for m in word.finditer(sql)}
        # every oracle must touch at least one driver-registered view
        # (CTE names may also appear in refs — that's fine), or be a
        # procedural source replicated via VALUES / generate_series
        # (e.g. the Python DataSource connector's synthetic feed)
        assert (refs & TABLES or "VALUES" in sql.upper()
                or "GENERATE_SERIES" in sql.upper()), (
            f"{name}: oracle references no known table: {refs}")


def _final_select_items(sql: str):
    """Top-level select-list items of the FIRST depth-0 SELECT —
    the one that defines output column names (UNION branches after
    the first inherit its names; CTE bodies sit at depth>0) — split
    on depth-0 commas."""
    flat = " ".join(sql.split())
    depth, last = 0, None
    up = flat.upper()
    for m in re.finditer(r"[()]|SELECT|\bFROM\b", up):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif tok == "SELECT" and depth == 0:
            last = m.end()
            break
    if last is None:
        return []
    # select list runs to the first depth-0 FROM (or UNION — a
    # FROM-less first branch) after `last`
    depth = 0
    end = len(flat)
    for m in re.finditer(r"[()]|\bFROM\b|\bUNION\b", up[last:]):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            end = last + m.start()
            break
    items, buf, depth, in_str = [], [], 0, False
    for ch in flat[last:end]:
        if ch == "'":
            in_str = not in_str  # commas inside string literals don't split
        elif not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
        if ch == "," and depth == 0 and not in_str:
            items.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        items.append("".join(buf).strip())
    if items and items[0].upper().startswith("DISTINCT "):
        items[0] = items[0][len("DISTINCT "):]
    return items


def test_no_unaliased_computed_columns():
    """The driver compare sorts columns by NAME: an unaliased
    computed column like sum(l_quantity) would hash-mismatch between
    engines even with equal values. Every non-bare output column of
    the outermost SELECT must carry an AS alias."""
    bare = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")
    for name, sql in entry.oracle_sql().items():
        for item in _final_select_items(sql):
            if item == "*" or bare.match(item):
                continue
            assert re.search(r"\bAS\s+[A-Za-z_][A-Za-z0-9_]*$", item,
                             re.IGNORECASE), (
                f"{name}: unaliased computed column: {item!r}")
