"""Cross-engine float-parity policy (Spark vs DuckDB oracle).

The driver compares order-insensitive value hashes, so float results
must be *bit-identical* across engines. Policy used throughout the
query registry:

1. **Integer domain when possible.** Durations stay in integer
   microseconds through aggregation (integer addition is exact and
   order-independent); divide once at the end. Money-like columns with
   fixed decimals (prices: 2, discounts/taxes: 2) are scaled to
   integers (x100) before SUM, so the aggregate is exact at any scale
   factor and shuffle order; a single final division yields the same
   double in every engine.
2. **Raw doubles for deterministic scalar math.** +,-,*,/ on the same
   inputs are IEEE-754-identical everywhere; per-row computed columns
   need no rounding.
3. **round(…, 6) only for unavoidable float accumulation** (sums of
   transcendental outputs like haversine or cosine similarity). Safe
   because the pre-round drift (~1e-12 rel) is far from the 5e-7
   rounding boundary for values that aren't exact decimals.
4. **Never round a float sum whose true value has >= 6 decimals** —
   at 600k rows the accumulated drift (~1e-5 abs) can straddle the
   rounding boundary. Rescale to integers instead (rule 1).
5. **Multi-step derived stats (stddev, avg) are spelled out as the
   same explicit formula over exact integer sums in both engines**, so
   engine-internal algorithm differences (Welford vs naive) can't leak.
6. **Comparisons/filters on floats use values both engines compute
   identically** (rules 1-2), so row membership never flickers at
   predicate boundaries.
7. **The integer rescale itself avoids F.round** (util.cents): Spark's
   Round on doubles leaves codegen for a per-value BigDecimal path, so
   the helper adds a sign-matched 0.5 and truncates — identical to
   HALF_UP for values within 1e-10 of an integer (which rule-1 inputs
   are by construction), and ~25% faster end-to-end on a Q1-shaped
   aggregate at 38M rows.
"""
