"""The composed web-corpus curation pipeline.

One call chaining the individual `datapipe` stages in the order the
public training-data pipelines run them (C4/Gopher/RefinedWeb-style):

1. URL dedup (when a `url` column is given) — cheapest filter first
2. PII redaction (transform — happens before any content hashing so
   identical pages with different injected identifiers still dedup)
2b. optional C4 line clean + page filters (`c4=True`; Raffel et al.
   2020 §2.2) — rewrites the text before any quality scoring
3. Gopher quality filter (+ optional CCNet-style LM perplexity bound
   via `max_perplexity` / `lm_train`, + optional trained linear
   classifier via `classifier_weights` — hard `classifier_threshold`
   or GPT-3 Pareto acceptance when the threshold is None)
4. Gopher repetition filter
5. exact content dedup (canonical row per identical text)
6. near-dup removal via MinHash-LSH + connected components
7. benchmark decontamination (when `benchmark` is given)
8. optional text surgery: corpus-wide paragraph dedup
   (`para_dedup=True`) and exact-substring span cuts
   (`span_window=N`) — both rewrite the text column in place

Every stage is the already-tested operator from its own module; this
composition adds stage gating, shared defaults, and an optional
per-stage row report. With `with_report=False` (the default) the whole
pipeline stays ONE lazy plan — no counts, no extra jobs — which is how
you'd run it over 100 TB; `with_report=True` triggers a count per
stage for auditing at sample scale. Exception: `mixture=...` needs the
per-domain counts to size its keep probabilities, so that one stage
runs a driver-side `groupBy(domain).count()` job at call time even
without a report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe import dedup as _dedup
from quickwit_spark.datapipe.decontam import decontaminate
from quickwit_spark.datapipe.gopher_quality import gopher_quality_filter
from quickwit_spark.datapipe.pii import redact_pii
from quickwit_spark.datapipe.repetition import repetition_filter
from quickwit_spark.datapipe.webpipe import url_dedup


def curate(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    *,
    redact: bool = True,
    c4: bool = False,
    c4_blocklist: tuple[str, ...] | None = None,
    quality_bounds: dict | None = None,
    repetition_thresholds: dict | None = None,
    near_dup: bool = True,
    near_dup_mode: str = "anchor",
    minhash_perms: int = 64,
    minhash_bands: int = 16,
    shingle_k: int = 3,
    benchmark: DataFrame | None = None,
    bench_text_col: str | None = None,
    decontam_n: int = 13,
    para_dedup: bool = False,
    span_window: int | None = None,
    max_perplexity: float | None = None,
    lm_train: DataFrame | None = None,
    classifier_weights=None,
    classifier_threshold: float | None = None,
    mixture: dict[str, float] | None = None,
    mixture_domain_col: str = "lang",
    mixture_seed: int = 0,
    persist_intermediate: bool = True,
    with_report: bool = False,
):
    """→ curated DataFrame (input schema, text redacted in place when
    `redact`), or (DataFrame, report) with `with_report=True` where
    report = [(stage, rows_after), ...] starting from ("input", n).

    `para_dedup` / `span_window` enable the text-SURGERY stages after
    the document-level passes: corpus-wide paragraph dedup
    (RefinedWeb) and exact-substring span cuts (Lee et al.,
    `span_window` tokens); both rewrite `text_col` in place.
    `mixture` (a domain→weight dict) appends a final deterministic
    downsample to that target mix over `mixture_domain_col`
    (datapipe/mixing.py), computed on the CLEANED corpus."""
    orig = df.columns
    report: list[tuple[str, int]] = []

    def note(stage: str, d: DataFrame) -> DataFrame:
        if with_report:
            report.append((stage, d.count()))
        return d

    out = note("input", df)
    if url_col is not None:
        marked = url_dedup(out, key, url_col=url_col)
        out = note(
            "url_dedup",
            marked.filter(~F.col("is_url_dup")).select(*orig),
        )
    if redact:
        red = redact_pii(out, text_col, out_col="_red", with_counts=False)
        out = note(
            "pii_redact",
            red.drop(text_col).withColumnRenamed("_red", text_col).select(*orig),
        )
    if c4:
        from quickwit_spark.datapipe.c4_filters import c4_filter

        out = note(
            "c4", c4_filter(out, text_col, blocklist=c4_blocklist)
        )
    out = note("quality", gopher_quality_filter(out, text_col, quality_bounds))
    if max_perplexity is not None:
        from quickwit_spark.datapipe.lm_quality import lm_perplexity

        scored = lm_perplexity(out, lm_train, key, text_col)
        out = note(
            "lm_quality",
            scored.filter(F.col("perplexity") <= max_perplexity).select(*orig),
        )
    if classifier_weights is not None:
        from quickwit_spark.datapipe.quality_classifier import quality_filter

        out = note(
            "classifier",
            quality_filter(
                out, classifier_weights, key, text_col,
                threshold=classifier_threshold,
            ).select(*orig),
        )
    out = note(
        "repetition", repetition_filter(out, text_col, repetition_thresholds)
    )
    exact = _dedup.exact_dedup(out, key, text_col)
    out = note(
        "exact_dedup", exact.filter(~F.col("is_duplicate")).select(*orig)
    )
    if persist_intermediate and (
        near_dup or benchmark is not None or para_dedup or span_window
    ):
        # every remaining stage consumes `out` in ≥2 jobs (candidate
        # generation / operator + the join back); persist the filtered
        # corpus so the filter chain isn't recomputed per consumer —
        # the stage-boundary materialization any 100 TB run would do
        # anyway (swap for a checkpoint/table write there). The cache
        # lives until the session ends or the caller clears it: a
        # long-lived app curating many corpora should either pass
        # persist_intermediate=False (accepting the recompute) or run
        # per-corpus sessions like jobs/curate_job.py does.
        out = out.persist()
    if near_dup:
        if near_dup_mode not in ("anchor", "pairs"):
            raise ValueError("near_dup_mode must be 'anchor' or 'pairs'")
        rows = max(minhash_perms // minhash_bands, 1)
        sigs = _dedup.minhash_signatures(
            out, key, text_col, k=shingle_k, num_perm=minhash_bands * rows
        )
        if near_dup_mode == "anchor":
            # O(bucket) star edges — connectivity-identical to the
            # O(bucket²) pair cliques (see minhash_lsh_edges), and the
            # default because a hot LSH bucket at corpus scale makes
            # the pair join quadratic
            pairs = _dedup.minhash_lsh_edges(
                sigs, key, bands=minhash_bands, rows=rows
            )
        else:
            pairs = _dedup.minhash_lsh_pairs(
                sigs, key, bands=minhash_bands, rows=rows
            ).select("key_a", "key_b")
        out = note("near_dup", _dedup.dedup_canonical(out, pairs, key=key))
    if benchmark is not None:
        out = note(
            "decontam",
            decontaminate(
                out, benchmark, key, text_col,
                bench_text_col=bench_text_col or text_col, n=decontam_n,
            ),
        )
    if para_dedup:
        rebuilt = _dedup.paragraph_dedup(out, key, text_col).select(
            key, F.col("text_dedup").alias("_t")
        )
        out = note(
            "para_dedup",
            out.drop(text_col).join(rebuilt, key)
            .withColumnRenamed("_t", text_col).select(*orig),
        )
    if span_window:
        from quickwit_spark.datapipe.span_dedup import duplicate_span_dedup

        cutd = duplicate_span_dedup(out, key, text_col, span_window).select(
            key, F.col("text_dedup").alias("_t")
        )
        out = note(
            "span_dedup",
            out.drop(text_col).join(cutd, key)
            .withColumnRenamed("_t", text_col).select(*orig),
        )
    if mixture:
        # final stage: downsample the CLEAN corpus to the target
        # domain mix (dedup/filters first — mixture ratios computed on
        # dirty data would drift once duplicates are removed). The
        # domain counts are a driver action, so the cleaned frame is
        # persisted for the count + keep double pass — unless the
        # caller opted out of caching entirely (persist_intermediate=
        # False documents "accepting the recompute").
        from quickwit_spark.datapipe.mixing import mixture_sample

        if persist_intermediate:
            out = out.persist()
        out = note(
            "mixture",
            mixture_sample(
                out, mixture, domain_col=mixture_domain_col, key=key,
                seed=mixture_seed,
            ),
        )
    return (out, report) if with_report else out
