"""Regex-based PII / toxicity scrubbing (north_rule addition; same shape as
the reference's normalizer chain /root/reference/text_normalizer.py:69-79 —
an ordered regexp_replace pipeline, fully inside Tungsten codegen).

Patterns are engine-portable (no \\p classes, no lookaround) so the exact
same pattern string runs in Spark (Java regex), DuckDB (RE2, 'g' flag) and
Python re — the scrubbed output must be byte-identical across all three
(BASELINE.json: "scrubbed caption ... equality per row").
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: emails first (they contain dots/digits), then IPs (dotted digits)
# before phones (dashed digits).
SCRUB_RULES: list[tuple[str, str, str]] = [
    # local part = full RFC-5321 special set, not just the common chars: a
    # scrubber must catch {weird}@example.com too (found by hypothesis —
    # tests/test_property_fuzz.py generates RFC-exotic locals). For PII,
    # over-matching is the safe direction.
    ("email", r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{3,4}\b", "<PHONE>"),
    ("toxicity", r"\b(frakk|blorgh|sneckduk|grawlix)\b", "<TOX>"),
]


def scrub_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for _name, pattern, repl in SCRUB_RULES:
        c = F.regexp_replace(c, pattern, repl)
    return c


def scrub_sql(expr: str) -> str:
    out = expr
    for _name, pattern, repl in SCRUB_RULES:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


# \b caveat: Java regex (Spark) treats \b as UNICODE word boundary even in
# default mode (ü is a word char), and Python's default matches that; RE2
# (DuckDB) uses ASCII \b. The engine + pandas oracle therefore agree on all
# input; the DuckDB SQL twin is exact on ASCII text (which covers the
# driver's tables) and diverges only when PII abuts a non-ASCII letter with
# no separator ("4ü") — RE2 has no lookaround, so this cannot be papered
# over portably. Found by tests/test_step_prefixes.py fuzz.
_COMPILED = [(re.compile(p), r) for _n, p, r in SCRUB_RULES]


def scrub_py(text: str) -> str:
    for rx, repl in _COMPILED:
        text = rx.sub(repl, text)
    return text
