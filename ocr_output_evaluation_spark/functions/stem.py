"""Porter-lite suffix stripping as PURE codegen regexp chains (X142).

A documented, deterministic subset of Porter 1980's step-1 rules chosen
so BOTH engines can replay it byte-identically with their regex engines
(Java util.regex on the Spark side, RE2 in DuckDB — hence NO lookarounds
and no character-class subtraction, both RE2-unsupported):

    1. sses$  -> ss        (caresses -> caress)
    2. ies$   -> i         (ponies   -> poni)
    3. ([a-rt-z])s$ -> $1  (cats -> cat; keeps -ss and bare 's')
    4. ([a-z]{3,})ing$ -> stem   (running -> runn; >=3-char stem stays)
    5. ([a-z]{2,})ed$  -> stem   (plastered -> plaster)
    6. ([a-z]{2,})ly$  -> stem   (quickly -> quick)

Applied in this exact order to lowercase a-z tokens. This is NOT the
full Porter algorithm (no measure-based conditions, no step 2-5) — it
is the cheap normalizer used for vocabulary folding and collision
audits, where a deterministic total function matters more than
linguistic perfection. Reference analog: none — rebuild-only
(SURVEY §2.13)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (java_pattern, java_replacement, duck_pattern, duck_replacement)
_RULES = (
    (r"sses$", "ss", r"sses$", "ss"),
    (r"ies$", "i", r"ies$", "i"),
    (r"([a-rt-z])s$", "$1", r"([a-rt-z])s$", r"\1"),
    (r"([a-z]{3,})ing$", "$1", r"([a-z]{3,})ing$", r"\1"),
    (r"([a-z]{2,})ed$", "$1", r"([a-z]{2,})ed$", r"\1"),
    (r"([a-z]{2,})ly$", "$1", r"([a-z]{2,})ly$", r"\1"),
)


def porter_lite(c: Column | str) -> Column:
    """Stem one lowercase token column through the 6-rule chain."""
    col = F.col(c) if isinstance(c, str) else c
    for jpat, jrep, _, _ in _RULES:
        col = F.regexp_replace(col, jpat, jrep)
    return col


def porter_lite_sql(expr: str) -> str:
    """The DuckDB twin: same chain as nested regexp_replace calls."""
    for _, _, dpat, drep in _RULES:
        expr = f"regexp_replace({expr}, '{dpat}', '{drep}')"
    return expr


def porter_lite_py(tok: str) -> str:
    """Python mirror for tests (same rule order, Python re syntax)."""
    import re

    for jpat, jrep, _, _ in _RULES:
        tok = re.sub(jpat, jrep.replace("$1", r"\1"), tok)
    return tok
