"""Generation-time acceptance gate for the documents fixture — the
x2/x2g MinHash oracle-validity invariant as a callable unit (round-14,
VERDICT r13 ask #8).

x2's exact-Jaccard DuckDB oracle equals the LSH output only while the
fixture corpus is BIMODAL: every true near-dup pair sits far above the
8-band/r=4 detection knee and NOTHING falls in the [0.35, 0.5) shadow
zone just below the threshold, where a boundary pair could flip a
parity cell under tokenization drift. The fixture generator is
driver-owned (testdata is read-only here), so the repo lands the
invariant in the one form a generator can consume: this module —
import `assert_minhash_oracle_bimodal` after writing documents.parquet,
or run

    python tools/fixture_gate.py /root/testdata/sf0.01/documents.parquet

and a regeneration that would flip an x2/x2g parity cell fails AT THE
SOURCE with the invariant named, instead of surfacing rounds later as
an unexplained hash mismatch. tests/test_llm_queries.py pins the SAME
function against the shipped fixtures every round, and
test_fixture_gate_trips_on_shadow_zone_corpus proves the gate actually
fires on a synthetic violating corpus.
"""

from __future__ import annotations

import sys

# the exact-Jaccard pair scan over whitespace 3-grams — the same
# tokenization x2's oracle uses, so the gate measures the quantity the
# parity cell depends on
_PAIR_SQL = """
WITH toks AS (
    SELECT {id_col} AS id,
           string_split_regex(lower(trim({text_col})), '\\s+') AS l
    FROM {rel}
), grams AS (
    SELECT id, unnest(list_distinct(list_transform(
        range(1, greatest(len(l) - 2, 0) + 1),
        i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]))) AS g
    FROM toks
), sizes AS (
    SELECT id, COUNT(*) AS n_g FROM grams GROUP BY id
), inter AS (
    SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
    FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
    GROUP BY a.id, b.id
)
SELECT n_inter * 1.0 / (sa.n_g + sb.n_g - n_inter) AS j
FROM inter i
JOIN sizes sa ON i.id_a = sa.id
JOIN sizes sb ON i.id_b = sb.id
WHERE n_inter * 1.0 / (sa.n_g + sb.n_g - n_inter) >= {shadow_lo}
"""


def minhash_bimodality_report(parquet_path: str | None = None,
                              rows: list[tuple] | None = None,
                              shadow_lo: float = 0.35,
                              threshold: float = 0.5,
                              bands: int = 8, r: int = 4) -> dict:
    """Measure the invariant: all pairwise 3-gram Jaccards >= shadow_lo,
    the shadow-zone members [shadow_lo, threshold), and the union-bound
    P(any LSH miss) = sum over true pairs of (1 - j^r)^bands. Input is
    a documents parquet path OR in-memory (id, text) rows (the
    tripwire test's form)."""
    import duckdb

    con = duckdb.connect()
    if parquet_path is not None:
        rel = f"read_parquet('{parquet_path}')"
        id_col, text_col = "doc_id", "text"
    else:
        import pandas as pd
        con.register("__docs", pd.DataFrame(rows,
                                            columns=["doc_id", "text"]))
        rel, id_col, text_col = "__docs", "doc_id", "text"
    js = [row[0] for row in con.execute(_PAIR_SQL.format(
        rel=rel, id_col=id_col, text_col=text_col,
        shadow_lo=shadow_lo)).fetchall()]
    shadow = sorted(j for j in js if j < threshold)
    true_pairs = [j for j in js if j >= threshold]
    return {
        "n_pairs_at_or_above_shadow_lo": len(js),
        "n_true_pairs": len(true_pairs),
        "min_true_pair_j": min(true_pairs) if true_pairs else None,
        "shadow_pairs": shadow,
        "miss_bound": sum((1 - j ** r) ** bands for j in true_pairs),
    }


def assert_minhash_oracle_bimodal(parquet_path: str | None = None,
                                  rows: list[tuple] | None = None,
                                  max_miss_bound: float = 0.01,
                                  require_pairs: bool = True,
                                  **kw) -> dict:
    """The gate: raise AssertionError (with the invariant named) if the
    corpus has shadow-zone pairs, an unsafe LSH union bound, or — when
    require_pairs — no planted near-dups at all (a corpus without true
    pairs makes the x2 parity cell vacuous). Returns the report on
    success so generators can log it."""
    rep = minhash_bimodality_report(parquet_path=parquet_path,
                                    rows=rows, **kw)
    src = parquet_path or "<in-memory corpus>"
    # shadow first: it is the more specific failure (a shadow-only
    # corpus is ALSO pairless above threshold, but the actionable
    # defect is the boundary pair, not the missing plant)
    assert not rep["shadow_pairs"], (
        f"{src}: pairs in the shadow zone just below the LSH "
        f"threshold: {rep['shadow_pairs']} — boundary pairs make the "
        "x2/x2g exact-Jaccard oracle flip under tokenization drift; "
        "regenerate with pairs clear of the threshold")
    if require_pairs:
        assert rep["n_true_pairs"] > 0, (
            f"{src}: no planted near-dup pairs found — the x2 parity "
            "cell would be vacuous")
    assert rep["miss_bound"] < max_miss_bound, (
        f"{src}: union-bound P(any LSH miss) = "
        f"{rep['miss_bound']:.2e} >= {max_miss_bound} (min true pair "
        f"j = {rep['min_true_pair_j']}) — the exact-Jaccard oracle is "
        "no longer safely equal to the LSH output")
    return rep


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    for path in sys.argv[1:]:
        rep = assert_minhash_oracle_bimodal(parquet_path=path)
        print(f"OK {path}: {rep['n_true_pairs']} true pairs, "
              f"min j {rep['min_true_pair_j']:.4f}, "
              f"miss bound {rep['miss_bound']:.2e}, shadow zone empty")
