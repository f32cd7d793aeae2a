"""Text-analysis column expressions for training-data pipelines
(SURVEY §2.12 X5/X6 + the text-analysis mandate): language ID, quality
scoring, token counting, fingerprinting.

Everything is built-in expressions (codegen'd, no UDFs). Heuristics are
deliberately simple and deterministic so the DuckDB oracle can mirror
them exactly; the structure (not the model quality) is the engine
capability.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword marker sets per language — the n-gram-heuristic skeleton
# of a langid model. Deterministic and SQL-mirrorable.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
}


def word_tokens(text: Column) -> Column:
    """SQL split semantics, deliberately: empty/whitespace-only text
    yields [''] (size 1), matching DuckDB's string_split_regex — the
    oracles, the x14 budget windows, and the Python rederivation tests
    all rely on this exact cross-engine agreement. Callers that need
    true-zero empty-doc counts should filter on trim(text) = ''."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_count(text: Column) -> Column:
    return F.size(word_tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: word pieces split on non-alphanumerics
    plus a 4-chars-per-token tail heuristic for long words —
    deterministic, expression-only."""
    words = word_tokens(text)
    return F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + 1 + F.floor(F.length(w) / 4).cast("int"))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation (quality signal)."""
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = word_tokens(text)
    markers = LANG_MARKERS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_score(text: Column, lang: str) -> Column:
    """Marker-hit count for one language."""
    toks = word_tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of marker hits (ties -> priority
    en > de > fr; 'und' = undetermined when no marker hits)."""
    en, de, fr = (lang_score(text, lang) for lang in ("en", "de", "fr"))
    return (F.when((en >= de) & (en >= fr) & (en > 0), "en")
            .when((de >= fr) & (de > 0), "de")
            .when(fr > 0, "fr")
            .otherwise("und"))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length sweet-spot + low punctuation
    + stopword presence. Mirrors the shape of published heuristic
    quality filters (length/punct/stopword ratios)."""
    n_chars = char_count(text)
    length_ok = F.when((n_chars >= 100) & (n_chars <= 5000), 1.0).otherwise(0.5)
    punct_ok = F.when(punct_ratio(text) <= 0.1, 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(text) >= 0.01, 1.0).otherwise(0.5)
    return (length_ok * punct_ok * stop_ok).alias("quality")


def md5_60(s: Column) -> Column:
    """Low 60 bits of md5 as a BIGINT — the cross-engine-portable hash
    family: bit-equal to DuckDB's ('0x'||substr(md5(s),1,15))::BIGINT
    for every string (pinned incl. unicode in tests/test_operators.py).
    Used wherever a hash must replay in the SQL oracle (x5d's
    fingerprint, x16's span-dedup windows); the production-speed
    alternative is xxhash64."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def rolling_fingerprint(text: Column, window: int = 8,
                        hash_family: str = "xxhash64") -> Column:
    """Document fingerprint: min of a per-window hash over character
    n-gram windows (a winnowing-style rolling-hash signature).

    ``hash_family`` picks the window hash (same convention as
    operators/dedup.py:simhash_fingerprints):
      - "xxhash64" (default): Spark's native JVM xxhash64 — the fast
        production path, not portable to other engines.
      - "md5": low 60 bits of md5, conv(substr(md5(g),1,15),16,10) —
        slower, but bit-equal to DuckDB's
        ('0x'||substr(md5(g),1,15))::BIGINT for every string (pinned
        incl. unicode in tests/test_operators.py), which is what lets
        the x5d registry query carry a value-level oracle: the whole
        min-over-windows pipeline replays in SQL as
        list_min(list_transform(generate_series(...), i -> hash)).
    Both engines use CHARACTER substring semantics, so multi-byte
    UTF-8 windows agree; texts shorter than ``window`` hash the whole
    text once; null text -> null fingerprint."""
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(
            f"unknown rolling_fingerprint hash_family: {hash_family!r}")
    n = F.greatest(F.length(text) - (window - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    if hash_family == "md5":
        def gram_hash(i):
            return md5_60(F.substr(text, i, F.lit(window)))
    else:
        def gram_hash(i):
            return F.xxhash64(F.substr(text, i, F.lit(window)))
    return F.array_min(F.transform(idx, gram_hash))


# PII patterns shared by the Spark expressions and the DuckDB oracle.
# Conservative, dialect-portable subset (Java regex and RE2 agree on
# every construct used: literal classes, {m,n}, \d, \b): emails, IPv4,
# and international-format phone numbers. Order matters — emails are
# redacted before phones so a digit-bearing local part can't be half
# eaten by the phone pattern.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace every email / IPv4 / +international phone occurrence
    with a typed placeholder token — the scrubbing pass a training-data
    pipeline runs before text ships. Pure chained regexp_replace:
    whole-stage codegen, no UDF, no Python."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII class (for audit reporting alongside
    the redaction itself).

    Each pattern is counted on the PROGRESSIVELY-REDACTED text — the
    same order redact_pii applies — so the counts equal what the
    redaction actually replaced. Counting every class on the raw text
    would double-count overlaps (e.g. '+123...@x.com' is one <EMAIL>
    replacement, but the phone pattern also matches its local part)."""
    cols = []
    cur = text
    for name, pat, token in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return cols
