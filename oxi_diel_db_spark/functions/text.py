"""Text-analysis function family (SURVEY.md §2.8 F10 + north-star text
operators): normalization, shingling, language-ID, quality scoring,
token counting, fingerprinting.

Design: everything is a Catalyst expression over arrays — no Python in
the hot path — so the operators scale to a 100 TB documents table and
stay hash-comparable with the DuckDB oracle (each Spark builder has a
SQL twin string used by queries/llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Normalization + tokens
# ---------------------------------------------------------------------------

_NONWORD = "[^a-z0-9]+"

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(c: Column) -> Column:
    """ASCII-only case folding via translate — deliberately NOT
    lower(): Unicode lowercasing is locale/engine-dependent (Java maps
    'İ' to i + combining dot U+0307, DuckDB does not — found by the
    adversarial sweep in tests/test_unicode_oracle.py), which silently
    splits tokens differently per engine. A hash-based dedup pipeline
    needs bit-reproducible normalization above linguistic nicety:
    A-Z fold, every non-ASCII codepoint is a separator in BOTH
    engines. Identical to lower() on ASCII corpora."""
    return F.translate(c, _ASCII_UPPER, _ASCII_LOWER)


def norm_words(text: Column | str) -> Column:
    """ascii-fold → split on non-[a-z0-9] runs → drop empties."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(ascii_lower(c), _NONWORD), lambda x: x != "")


SQL_NORM_WORDS = (
    "list_filter(string_split_regex("
    f"translate({{t}}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"
    ", '[^a-z0-9]+'), x -> x <> '')"
)


def shingles(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; empty array when len(words) < n."""
    idx = F.sequence(F.lit(0), F.size(words) - n)
    parts = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + k + 1) for k in range(n)]
    )
    return F.when(F.size(words) >= n, F.transform(idx, parts)).otherwise(
        F.array().cast("array<string>")
    )


def sql_shingles(words_col: str, n: int = 3) -> str:
    """DuckDB twin of shingles(); ``words_col`` must be a list column in
    scope (1-indexed lists, end-exclusive range)."""
    w = words_col
    joined = " || ' ' || ".join(f"{w}[i + {k}]" for k in range(n))
    return (
        f"list_transform(range(1, greatest(len({w}) - {n - 2}, 1)), i -> {joined})"
    )


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "a", "is"],
    "de": ["der", "die", "und", "das", "nicht", "ein", "ist"],
    "fr": ["le", "la", "et", "les", "des", "est", "une"],
    "es": ["el", "los", "las", "que", "y", "una", "por"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # tie-break priority


def lang_scores(words: Column) -> dict[str, Column]:
    """Per-language stopword hit counts over the distinct word set."""
    distinct = F.array_distinct(words)
    return {
        lang: F.size(F.array_intersect(distinct, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in STOPWORDS.items()
    }


def lang_id(words: Column) -> Column:
    """argmax over language scores, 'und' (undetermined) when all zero.
    Ties resolve in _LANG_ORDER — identical CASE chain in the SQL twin."""
    s = lang_scores(words)
    best = s[_LANG_ORDER[0]]
    for lang in _LANG_ORDER[1:]:
        best = F.greatest(best, s[lang])
    expr = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        expr = F.when((s[lang] == best) & (best > 0), lang).otherwise(expr)
    return expr


def sql_lang_id(words_expr: str) -> str:
    """DuckDB twin of lang_id()."""
    score = {
        lang: (
            f"len(list_intersect(list_distinct({words_expr}), "
            f"[{', '.join(repr(w) for w in sw)}]))"
        )
        for lang, sw in STOPWORDS.items()
    }
    best = f"greatest({', '.join(score[lang] for lang in _LANG_ORDER)})"
    chain = "'und'"
    for lang in reversed(_LANG_ORDER):
        chain = (
            f"CASE WHEN {score[lang]} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {chain} END"
        )
    return chain


# ---------------------------------------------------------------------------
# Quality scoring + token counting + fingerprints
# ---------------------------------------------------------------------------

# BPE-ish token pattern: letter runs, digit runs, single other non-space.
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
PUNCT_RE = "[.,;:!?]"


def token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    # idx=0 (whole match) — Spark's default idx is 1, DuckDB's is 0.
    # greatest(·, 0): with ansi off Spark's legacy size(NULL) is -1; a
    # NULL text must count 0 tokens, not -1 (a -1 silently corrupts
    # downstream packing budgets and length buckets).
    return F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)), F.lit(0)
    )


SQL_TOKEN_COUNT = (
    "COALESCE(len(regexp_extract_all({t}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')), 0)"
)


def ws_token_count(text: Column | str) -> Column:
    """Whitespace tokenization count (0 for NULL text — see
    token_count's legacy size(NULL) note)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.greatest(
        F.size(F.filter(F.split(c, "\\s+"), lambda x: x != "")), F.lit(0)
    )


SQL_WS_TOKEN_COUNT = (
    "COALESCE(len(list_filter(string_split_regex({t}, '\\s+'), x -> x <> '')), 0)"
)


def quality_score(text: Column | str) -> Column:
    """Deterministic doc-quality heuristic in [0, 1]:
    0.4·stopword-ratio + 0.3·alpha-ratio + 0.2·len-score + 0.1·(1-punct-ratio).
    All components are exact rationals over counts → cross-engine stable."""
    c = F.col(text) if isinstance(text, str) else text
    words = norm_words(c)
    # greatest(·, 0): legacy size(NULL) = -1 under ansi-off would leak a
    # NEGATIVE length term into the score for NULL text
    n_words = F.greatest(F.size(words), F.lit(0))
    all_stop = [w for sw in STOPWORDS.values() for w in sw]
    n_stop = F.size(
        F.filter(words, lambda x: x.isin(all_stop))
    )
    n_alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    n_chars = F.length(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    len_score = F.least(n_words / F.lit(100.0), F.lit(1.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = F.round(
        0.4 * stop_ratio + 0.3 * alpha_ratio + 0.2 * len_score + 0.1 * (1 - punct_ratio),
        6,
    )
    # NULL text is worst-quality by definition, not "no punctuation"
    return F.when(c.isNull(), F.lit(0.0)).otherwise(score)


def sql_quality_score(t: str) -> str:
    words = SQL_NORM_WORDS.format(t=t)
    all_stop = [w for sw in STOPWORDS.values() for w in sw]
    stop_list = ", ".join(repr(w) for w in all_stop)
    return f"""
    CASE WHEN {t} IS NULL THEN 0.0 ELSE
    ROUND(
      0.4 * (CASE WHEN len({words}) > 0
                  THEN len(list_filter({words}, x -> x IN ({stop_list}))) / len({words})
                  ELSE 0.0 END)
      + 0.3 * (CASE WHEN length({t}) > 0
                    THEN length(regexp_replace({t}, '[^a-zA-Z]', '', 'g')) / length({t})
                    ELSE 0.0 END)
      + 0.2 * least(len({words}) / 100.0, 1.0)
      + 0.1 * (1 - (CASE WHEN length({t}) > 0
                         THEN len(regexp_extract_all({t}, '[.,;:!?]')) / length({t})
                         ELSE 0.0 END)),
      6)
    END
    """


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    word set. Two docs with the same bag of words share a fingerprint."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(norm_words(c)))))


def sql_fingerprint(t: str) -> str:
    words = SQL_NORM_WORDS.format(t=t)
    # COALESCE: DuckDB's array_to_string([]) is NULL, Spark's concat_ws
    # is '' — an all-separator/empty doc must fingerprint md5('') in both
    return f"md5(COALESCE(array_to_string(list_sort(list_distinct({words})), ' '), ''))"


# PII redaction: category -> (pattern, replacement). RE2-and-Java-safe
# (no lookaround), applied in list order — EMAIL first so its local
# part can't be nibbled by the numeric patterns, SSN before PHONE so
# the narrower dashed shape wins. Reference scope: the standard
# training-corpus scrub set (emails, IPv4, SSN-shaped, phone-shaped).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[- .]\d{3}[- .]\d{4}\b", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace every PII_PATTERNS match with its tag. Pure JVM regex
    chain (4 regexp_replace nodes, whole-stage codegen) — no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category match counts (on the UNredacted text)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for name, pat, _ in PII_PATTERNS
    }


def sql_redact_pii(t: str) -> str:
    """DuckDB twin of redact_pii: same patterns, same order ('g' flag —
    DuckDB regexp_replace is single-match by default, Spark's global)."""
    expr = t
    for _, pat, tag in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{tag}', 'g')"
    return expr


def sql_pii_count(t: str, name: str) -> str:
    pat = next(p for n, p, _ in PII_PATTERNS if n == name)
    return f"len(regexp_extract_all({t}, '{pat}', 0))"
