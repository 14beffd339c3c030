"""Text normalization for dedup/tokenization.

Re-implements the semantics of the reference's cc_net normalizers
(/root/reference/text_normalizer.py:158-189: strip -> lowercase ->
digits->0 -> delete punctuation & control chars) two ways:

1. ``normalize_for_dedup_expr`` — pure built-in Column expressions
   (lower/trim/regexp_replace), stays inside Tungsten codegen. This is the
   pipeline hot path. The regex character classes are deliberately explicit
   (no engine-specific \\p{} shorthands) so the *identical* pattern runs in
   Java regex (Spark), RE2 (DuckDB oracle) and Python re (pandas oracle).
2. ``normalize_for_dedup_py`` — same transform in plain Python, shared by
   the single-node test oracle.

Unicode coverage: ASCII punctuation + the CJK/full-width/typographic marks
the reference maps at /root/reference/text_normalizer.py:10-56, plus
C0/C1 control chars (:69-79). NFD accent *stripping* (reference N2/N4) is
applied only on the tokenizer path (models.stub_tokenize), matching the
reference where normalize_for_dedup does NOT strip accents.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

DIGIT_PATTERN = "[0-9]"

# ASCII punct (regex-escaped where needed) + unicode punct the reference
# handles + C0/C1 controls, as ONE character class.
_UNICODE_PUNCT = (
    "，。、！？；：「」『』（）《》〈〉【】…—–‐·•"
    "“”‘’‚„‹›«»　﹏＿～｜＋＝＊％＃＠＆"
)
PUNCT_OR_CTRL_PATTERN = "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~" + _UNICODE_PUNCT + "\\x00-\\x1f\\x7f-\\x9f]"


# translate() is a single char-map pass (no regex engine) — measurably
# cheaper on the exploded-lines hot path. Semantics identical to the regex
# patterns above (same character sets); the DuckDB/python twins keep the
# regex form and the fuzz test asserts byte-equality across all three.
_PUNCT_CHARS = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~" + _UNICODE_PUNCT + "".join(
    chr(c) for c in list(range(0x00, 0x20)) + list(range(0x7F, 0xA0))
)


def normalize_for_dedup_expr(col: Column | str) -> Column:
    """strip -> lower -> digits->0 -> delete punct+control (reference N1).

    Deliberately NOT idempotent: trim runs FIRST (reference order), so
    deleting a trailing punctuation char can expose a space the trim never
    saw ('x ,' -> 'x '). Re-normalizing only strips that space. All three
    twins (Spark/DuckDB/python) share the quirk bit-identically — pinned by
    tests/test_property_fuzz.py::test_second_pass_only_trims."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.trim(c))
    c = F.translate(c, "123456789", "000000000")
    return F.translate(c, _PUNCT_CHARS, "")


def normalize_for_dedup_sql(expr: str) -> str:
    """Same transform as ANSI/DuckDB SQL text (for oracle_sql entries)."""
    return (
        f"regexp_replace(regexp_replace(lower(trim({expr})), "
        f"'{DIGIT_PATTERN}', '0', 'g'), "
        f"'{_sql_quote(PUNCT_OR_CTRL_PATTERN)}', '', 'g')"
    )


def _sql_quote(pattern: str) -> str:
    return pattern.replace("'", "''")


_DIGIT_RE = re.compile(DIGIT_PATTERN)
_PUNCT_RE = re.compile(PUNCT_OR_CTRL_PATTERN)


def normalize_for_dedup_py(line: str) -> str:
    """Python twin of normalize_for_dedup_expr (test oracle)."""
    # strip(' ') not strip(): SQL trim() removes spaces only — keep the
    # Python twin bit-identical to the Spark/DuckDB expression.
    line = line.strip(" ").lower()
    line = _DIGIT_RE.sub("0", line)
    return _PUNCT_RE.sub("", line)
