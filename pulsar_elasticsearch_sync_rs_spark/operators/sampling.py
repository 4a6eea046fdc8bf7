"""Training-corpus sampling operators (SURVEY.md §2.9 extension):
stratified sampling and weighted source mixing — the two knobs every
pretraining data recipe turns (per-source sampling rates / epoch
weights).

Scale shape: all narrow, shuffle-free passes — a per-row hash gate on
the stratum column, or a union of independently gated inputs; nothing
here moves data between partitions.

Two lanes:
- `stratified_sample` — Spark's seeded Bernoulli `sampleBy`
  (statistically independent draws; deterministic per seed+layout but
  not engine-portable → rows-only checks);
- `deterministic_stratified_sample` / `weighted_mix` — a CONTENT hash
  gate: keep iff the first 6 hex chars of `md5(id)` sort below the
  fraction's hex threshold. No RNG, reproducible across engines and
  partition layouts, so it IS oracle-checkable — the production choice
  when lineage reproducibility matters more than fresh randomness per
  run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GATE_SPACE = 16 ** 6  # 6 hex chars


def _frac_to_hex(p: float) -> str:
    """Fraction in (0,1) → zero-padded lowercase hex threshold over the
    6-char md5-prefix space; lexicographic compare ≡ numeric compare.
    p≥1 / p≤0 must NOT go through here (a 7-char threshold like
    '1000000' breaks the lexicographic ordering) — the gate
    special-cases them to constants."""
    n = max(0, min(_GATE_SPACE - 1, int(p * _GATE_SPACE)))
    return format(n, "06x")


def md5_gate(id_col: Column | str, p: float) -> Column:
    """True for ≈ fraction ``p`` of ids, by content hash (portable:
    Spark and DuckDB md5 agree byte-for-byte)."""
    if p >= 1.0:
        return F.lit(True)
    if p <= 0.0:
        return F.lit(False)
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, 6) < F.lit(_frac_to_hex(p))


MAX_STRATA = 10_000


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`df.sampleBy`): strata absent
    from ``fractions`` get ``default_fraction`` (0 = dropped — the
    usual 'only keep listed sources' recipe semantics).

    ``sampleBy`` needs the full per-stratum fraction map, so the
    stratum values are collected — guarded by ``MAX_STRATA``: pointing
    this at a high-cardinality column (a doc id, a URL) must raise a
    clear error, not OOM the driver. Beyond the cap, use
    :func:`deterministic_stratified_sample`, whose md5 gate never
    enumerates strata."""
    cap = (
        df.select(stratum_col).distinct().limit(MAX_STRATA + 1).collect()
    )
    if len(cap) > MAX_STRATA:
        raise ValueError(
            f"stratified_sample: column {stratum_col!r} has more than "
            f"{MAX_STRATA} distinct strata; driver-side fraction maps "
            "don't scale there — use deterministic_stratified_sample "
            "(hash gate, no stratum enumeration) instead"
        )
    all_strata = [r[0] for r in cap]
    full = {s: fractions.get(s, default_fraction) for s in all_strata}
    return df.sampleBy(stratum_col, fractions=full, seed=seed)


def deterministic_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Content-deterministic stratified sample via the md5 gate; strata
    not listed get ``default_fraction``."""
    keep = md5_gate(id_col, default_fraction)  # p=0 → threshold '000000' → False
    for s, p in fractions.items():
        keep = F.when(F.col(stratum_col) == s, md5_gate(id_col, p)).otherwise(keep)
    return df.filter(keep)


def weighted_mix(
    sources: list[tuple[DataFrame, float]],
    id_col: str,
    tag_col: str = "mix_source",
) -> DataFrame:
    """Weighted dataset mixing: deterministically subsample each source
    to its weight (md5 gate) and union, tagging provenance. Weights
    > 1.0 are clamped (upsampling/epoch repetition is a separate
    concern — repeat the union instead)."""
    parts = []
    for i, (src, w) in enumerate(sources):
        parts.append(
            src.filter(md5_gate(id_col, min(float(w), 1.0))).withColumn(
                tag_col, F.lit(f"src{i}")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
