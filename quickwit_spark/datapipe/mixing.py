"""Domain-mixture sampling — deterministic downsampling to a target
domain mix (the "data mixing" stage of a training-data pipeline;
public recipe: The Pile / DoReMi-style domain weights applied as
per-domain keep probabilities).

Given target weights w_d over a domain column (language, source,
crawl, …), the operator keeps the LARGEST corpus whose domain
composition matches the weights exactly in expectation:

    T      = min_d floor(n_d / w_d)      (the binding domain caps T)
    p_d    = w_d * T / n_d               (≤ 1; binding domain keeps ~all)
    keep   ⇔ u(key) < p_d                (u = deterministic per-doc hash)

Scale design (100 TB): one `groupBy(domain).count()` — a map-side
combined aggregation on a low-cardinality key — collected to the
driver (#domains rows), then the keep decision is a pure JVM column
predicate evaluated at scan speed via a literal `create_map` lookup:
NO join, NO shuffle, NO Python. Determinism: the per-doc uniform is
the engine-portable string hash of `key:seed` (datapipe/portable.py),
so reruns, retries, and the DuckDB correctness oracle all make the
identical per-row decision — sampling that survives task retries is
what makes the stage exactly-once at cluster scale.

No reference analog (`/root/reference` is a search engine); this
belongs to the LLM-training-data surface (SURVEY.md "LLM-data-pipeline
operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.portable import P31, perm_constants, portable_hash


def _uniform(key_col, seed: int):
    """Deterministic u ∈ [0, 1): portable hash of 'key:seed', then an
    affine mod-P31 mix. The mix matters: the polynomial string hash is
    locally LINEAR in the low digits, so consecutive numeric keys of
    equal length land in a narrow band of [0, P31) and a bare
    `hash/P31` uniform would keep all-or-none of them; multiplying by
    a large odd constant strides that band across the full range
    (full-period LCG step), which is what makes per-domain keep rates
    land near their target probability."""
    a, b = perm_constants(seed + 1)[seed]
    h = portable_hash(
        F.concat(key_col.cast("string"), F.lit(f":{seed}"))
    )
    mixed = (F.pmod(h, F.lit(P31)) * F.lit(a) + F.lit(b)) % F.lit(P31)
    return mixed.cast("double") / F.lit(float(P31))


def mixture_plan(
    df: DataFrame, weights: dict[str, float], domain_col: str = "lang"
) -> dict[str, dict]:
    """Driver-side plan: per-domain count, target weight, and keep
    probability. Weights are normalized; domains absent from `weights`
    get p=0 (dropped)."""
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    w = {d: v / total_w for d, v in weights.items()}
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).count().collect()
        if r[0] is not None
    }
    missing = [d for d in w if w[d] > 0 and counts.get(d, 0) == 0]
    if missing:
        raise ValueError(f"no rows for weighted domains: {missing}")
    T = min(counts[d] / w[d] for d in w if w[d] > 0)
    return {
        d: {
            "count": counts[d],
            "weight": w.get(d, 0.0),
            # rounded so an independent SQL engine computing the same
            # plan arithmetic lands on the identical threshold double
            "keep_prob": round(min(w.get(d, 0.0) * T / counts[d], 1.0), 9),
        }
        for d in counts
    }


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "lang",
    key: str = "doc_id",
    *,
    seed: int = 0,
    marks: bool = False,
) -> DataFrame:
    """Downsample to the target domain mixture. Default: returns the
    kept rows (input schema). `marks=True` instead returns every row
    as (key, domain, keep_prob, is_kept) for auditing/oracle checks."""
    plan = mixture_plan(df, weights, domain_col)
    # literal map lookup — evaluated per row at scan, no join
    kv = []
    for d, info in plan.items():
        kv += [F.lit(d), F.lit(info["keep_prob"])]
    pmap = F.create_map(*kv) if kv else F.create_map()
    p = F.coalesce(pmap[F.col(domain_col)], F.lit(0.0))
    kept = _uniform(F.col(key), seed) < p
    if marks:
        return df.select(
            key,
            F.col(domain_col).alias("domain"),
            F.round(p, 9).alias("keep_prob"),
            kept.alias("is_kept"),
        )
    return df.filter(kept)
